package graft.drive

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Timing evidence for IncrementalDecontam's per-batch cost claim: the
  * streaming admission step costs ∝ batch (Bloom prefilter map-side +
  * exact verify on survivors), flat across triggers — the store is
  * static, so unlike the dedup stores there is no history growth term
  * at all. Feeds an sf dir's documents (minus the synthetic benchmark
  * split, doc_id % 97 == 0) through admitBatch in equal batches and
  * prints per-batch wall-clock. Results land in BASELINE.md.
  * `sbt "Test/runMain graft.drive.DecontamStreamDrive /root/testdata/sf0.1 8"`. */
object DecontamStreamDrive {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val nBatches = if (args.length > 1) args(1).toInt else 8
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val docs = graft.ops.Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"))
    val bench = docs.filter(pmod(col("doc_id"), lit(97)) === 0)
    val train = docs.filter(pmod(col("doc_id"), lit(97)) =!= 0).cache()
    val n = train.count() // also materializes the cache

    val store = java.nio.file.Files.createTempDirectory("decontam-drive-").toString
    val t0 = System.nanoTime()
    graft.streaming.IncrementalDecontam.buildStore(bench, "text", store, n = 4, fpp = 0.01)
    println(f"store build: ${(System.nanoTime() - t0) / 1e9}%6.2f s " +
      f"(benchmark ${bench.count()} docs)")

    val per = n / nBatches + 1
    var admitted = 0L
    for (b <- 0 until nBatches) {
      val batch = train.filter(pmod(col("doc_id"), lit(nBatches.toLong)) === b)
      val t = System.nanoTime()
      val kept = graft.streaming.IncrementalDecontam
        .admitBatch(batch, "doc_id", "text", store).count()
      admitted += kept
      println(f"batch $b%2d: ${(System.nanoTime() - t) / 1e9}%6.2f s  " +
        f"(${batch.count()} in, $kept admitted)")
    }
    println(s"total admitted: $admitted of $n (batch size ~$per)")
    spark.stop()
  }
}
