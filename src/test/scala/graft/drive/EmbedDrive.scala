package graft.drive

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.VecMath.float_dot

/** Recall audit for the IVF-blocked embedNearDup: compares against the
  * exhaustive self-join at two scales; any missed pair = gate red. */
object EmbedDrive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", 16)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (sf <- Seq("sf0.01", "sf0.1")) {
      val e = graft.ops.Tables.embeddings(spark, s"/root/testdata/$sf")
        .select(col("vec_id"), col("embedding").as("__v"))
        .withColumn("__nrm", sqrt(float_dot(col("__v"), col("__v"))))
      val brute = e.as("a").join(e.as("b"), col("a.vec_id") < col("b.vec_id"))
        .withColumn("cos", round(
          float_dot(col("a.__v"), col("b.__v")) / col("a.__nrm") / col("b.__nrm"), 12))
        .filter(col("cos") >= 0.45)
        .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"), col("cos"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val ivf = graft.ops.SimilarityQueries.qEmbedNeardup(spark, s"/root/testdata/$sf")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      println(s"EMBED $sf brute=${brute.size} ivf=${ivf.size} missed=${(brute -- ivf).size} extra=${(ivf -- brute).size}")
    }
    spark.stop()
  }
}
