package graft.drive

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Timing evidence for IncrementalChunkStore's per-batch cost claim:
  * admission-accounting cost tracks the BATCH, not the stored-chunk
  * history, because the index read is pruned to the batch's own
  * bucket directories. The drive streams the amplified documents table
  * through the store in fixed-size batches (so history grows ~10×
  * across the run while batches stay constant), prints per-batch
  * seconds + store size, and contrasts the naive alternative: re-run
  * corpus-wide cdcChunks over everything seen so far at the same
  * trigger points. ~20% of each later batch duplicates batch-1 docs
  * (the amplified fixtures' within-copy duplicate structure), so
  * history matching does real work every trigger. Results land in
  * BASELINE.md. */
object ChunkScaleDrive {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "target/sf1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.streaming.IncrementalChunkStore

    // dense re-key so batches are contiguous id ranges
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("doc_id"))
    val corpus = graft.ops.Tables.documents(spark, dir)
      .select((row_number().over(w) - 1).cast("long").as("doc_id"), col("text"))
      .localCheckpoint(true)
    val n = corpus.count()
    val batchSize = 5000L
    val store = java.nio.file.Files.createTempDirectory("chunkscale-").toString

    println(s"CHUNKSCALE dir=$dir n=$n batch=$batchSize")
    var k = 0L
    while (k * batchSize < n) {
      val batch = corpus.filter(col("doc_id") >= k * batchSize &&
        col("doc_id") < (k + 1) * batchSize)
      val histBefore = if (k == 0) 0L
        else IncrementalChunkStore.storedChunks(spark, store).count()
      val t0 = System.nanoTime()
      val out = IncrementalChunkStore.admitBatch(batch, "doc_id", "text", store)
      val novel = out.agg(sum(col("novel_chars"))).collect().head.getLong(0)
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"CHUNKSCALE batch=$k histChunks=$histBefore novelChars=$novel sec=$sec%.2f")
      k += 1
    }

    // naive alternative: full-corpus CDC + global dup count at the same
    // trigger points — cost grows with everything seen so far
    for (k <- Seq(1L, 3L, 6L, 10L)) {
      val seen = corpus.filter(col("doc_id") < k * batchSize)
      val t0 = System.nanoTime()
      val rows = graft.api.Graft.cdcChunks(seen, "doc_id", "text").count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"CHUNKSCALE naive k=$k chunkRows=$rows sec=$sec%.2f")
    }
    spark.stop()
  }
}
