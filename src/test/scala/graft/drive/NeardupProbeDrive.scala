package graft.drive

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch timing probe for the q_embed_neardup drift flag: reports the
  * partition counts Spread.widen sees and stage-by-stage wall-clock of
  * embedNearDup at sf0.1. */
object NeardupProbeDrive {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val emb = graft.ops.Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding"))
    println(s"scan partitions: ${emb.rdd.getNumPartitions}; defaultParallelism: ${spark.sparkContext.defaultParallelism}")

    def time[T](name: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }
    // warmup
    emb.count()
    for (rep <- 1 to 3) {
      val cents = time("trainCentroids")(
        graft.ops.Ivf.trainCentroids(emb, "vec_id", "embedding", graft.ops.Ivf.Params()))
      println(s"  nlist=${cents.length}")
      val idx = graft.ops.Ivf.Index(cents, new Array[Double](cents.length))
      time("embedNearDup(rest)") {
        graft.api.Graft.embedNearDup(emb, "vec_id", "embedding", 0.45, idx)
          .write.format("noop").mode("overwrite").save()
      }
      time("full (as bench runs it)") {
        graft.ops.SimilarityQueries.qEmbedNeardup(spark, dir)
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
