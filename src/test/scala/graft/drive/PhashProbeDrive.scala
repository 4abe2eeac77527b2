package graft.drive

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off probe for the sf1 q_phash_dupes outlier: is the cost the
  * candidate explosion (band saturation), the verify, or legit output
  * size? Prints per-stage counts at the given fixture dir. */
object PhashProbeDrive {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "target/sf1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val ph = graft.ops.MultimodalQueries.qPhash(spark, dir).cache()
    val n = ph.count()
    val h = ph.select(col("phash_lo"), col("phash_hi")).distinct().count()
    val bandExprs = (0 until 8).map { j =>
      val src = if (j < 4) col("phash_lo") else col("phash_hi")
      shiftright(src, 8 * (j % 4)).bitwiseAND(lit(255L))
    }
    val bands = ph.select(col("doc_id"), posexplode(array(bandExprs: _*)))
      .toDF("doc_id", "band", "bv")
    val bucketSizes = bands.groupBy(col("band"), col("bv")).count()
    val cand = bucketSizes.agg(sum(col("count") * (col("count") - 1) / 2).cast("long")).head.getLong(0)
    val t0 = System.nanoTime()
    val out = graft.ops.MultimodalQueries.qPhashDupes(spark, dir).count()
    val sec = (System.nanoTime() - t0) / 1e9
    println(s"### docs=$n distinctHashes=$h candidatePairs=$cand outputPairs=$out querySec=$sec")
    spark.stop()
  }
}
