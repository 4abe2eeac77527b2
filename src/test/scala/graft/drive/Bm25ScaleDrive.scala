package graft.drive

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Timing evidence for IncrementalBm25's per-batch cost claim:
  * admission cost tracks the BATCH (tokenize + the doc-bucket-pruned
  * seen-check + two appends), not the postings history, and query cost
  * tracks the query terms' posting lists, not the store's file count.
  * Streams the amplified documents table through the store in
  * fixed-size batches (history grows ~10× across the run while batches
  * stay constant), printing per-batch admit seconds, store size, and a
  * fixed 3-term search's latency at each trigger point. Results land
  * in BASELINE.md. */
object Bm25ScaleDrive {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "target/sf1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.streaming.IncrementalBm25

    val w = org.apache.spark.sql.expressions.Window.orderBy(col("doc_id"))
    val corpus = graft.ops.Tables.documents(spark, dir)
      .select((row_number().over(w) - 1).cast("long").as("doc_id"), col("text"))
      .localCheckpoint(true)
    val n = corpus.count()
    val batchSize = 5000L
    val store = java.nio.file.Files.createTempDirectory("bm25scale-").toString
    // mixed-frequency query: a stopword-common term, a mid term, a rare one
    val query = corpus.limit(1).select(col("text")).collect().head.getString(0)
      .split(" ").filter(_.nonEmpty).distinct.take(3).toSeq

    println(s"BM25SCALE dir=$dir n=$n batch=$batchSize query=${query.mkString(",")}")
    var k = 0L
    while (k * batchSize < n) {
      val batch = corpus.filter(col("doc_id") >= k * batchSize &&
        col("doc_id") < (k + 1) * batchSize)
      val histBefore = if (k == 0) 0L
        else IncrementalBm25.admittedDocs(spark, store).count()
      val t0 = System.nanoTime()
      IncrementalBm25.admitBatch(batch, "doc_id", "text", store).count()
      val admitSec = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      val top = IncrementalBm25.search(spark, store, query, 10).count()
      val searchSec = (System.nanoTime() - t1) / 1e9
      println(f"BM25SCALE batch=$k histDocs=$histBefore admitSec=$admitSec%.2f " +
        f"searchSec=$searchSec%.2f topRows=$top")
      k += 1
    }

    // naive alternative: full-corpus bm25Search over everything seen so
    // far at the same trigger points — cost grows with history
    for (k <- Seq(1L, 3L, 6L, 10L)) {
      val seen = corpus.filter(col("doc_id") < k * batchSize)
      val t0 = System.nanoTime()
      graft.api.Graft.bm25Search(seen, "doc_id", "text", query, 10).count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"BM25SCALE naive k=$k sec=$sec%.2f")
    }
    spark.stop()
  }
}
