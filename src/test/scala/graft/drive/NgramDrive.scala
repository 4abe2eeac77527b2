package graft.drive

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Completeness audit for the df-capped ngram candidate generation:
  * compares against the uncapped posting join at two scales. */
object NgramDrive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", 16)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (sf <- Seq("sf0.01", "sf0.1")) {
      val dir = s"/root/testdata/$sf"
      def run(cap: Int) = graft.ops.DedupQueries
        .ngramJaccardOn(graft.ops.Tables.documents(spark, dir), "doc_id", "text", 16, 0.7, cap)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val capped = run(8)
      val full = run(Int.MaxValue) // uncapped = plain inverted-index join
      println(s"NGRAM $sf capped=${capped.size} full=${full.size} missed=${(full -- capped).size}")
    }
    spark.stop()
  }
}
