package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming retrieval-index maintenance: a `foreachBatch` postings /
  * document-statistics updater whose queries return EXACTLY what the
  * batch [[graft.api.Graft.bm25Search]] returns over every document
  * admitted so far — ingest-time index maintenance for the RAG surface
  * (the batch side indexes a frozen corpus; this keeps the index
  * current as documents arrive).
  *
  * Designed for `foreachBatch`:
  * {{{
  *   docsStream.writeStream.foreachBatch { (batch, _) =>
  *     IncrementalBm25.admitBatch(batch, "doc_id", "text", storeDir)
  *     ()
  *   }.option("checkpointLocation", ck).start()
  * }}}
  *
  * Store layout under `storeDir` ([[AtomicStore]] crash contract, same
  * as [[IncrementalChunkStore]]):
  *  - `postings/` — (term, doc_id, tf), parquet, directory-partitioned
  *    by `bucket = pmod(xxhash64(term), TermBuckets)` so a query's
  *    read is pruned to its own terms' buckets;
  *  - `docstats/` — (doc_id, dl), partitioned by
  *    `dbucket = pmod(doc_id, DocBuckets)` so admission's seen-check
  *    reads only the batch's own doc buckets.
  *
  * Semantics: keep-FIRST per doc_id — a document is indexed the first
  * time its id is admitted; later arrivals of the same id (streaming
  * replays, re-crawls) are ignored, which is also what makes
  * at-least-once `foreachBatch` idempotent: a replayed batch finds all
  * its ids in `docstats` and appends nothing. Documents tokenizing to
  * zero terms are not admitted, mirroring the batch side (they carry
  * no dl row there either).
  *
  * Scale shape: per-batch cost ∝ batch + its doc buckets' stats (the
  * pruned anti-join), never the postings history; queries read the
  * query terms' posting buckets + the 2-column docstats table (one
  * aggregate scan for N/avgdl and a join for dl — the matched-docs
  * side is top-k-bound small, AQE broadcasts it). Scoring and top-k
  * are [[graft.api.Graft.bm25TopK]] — numerically the same code as the
  * batch path, so the equality the spec pins cannot drift. */
object IncrementalBm25 {

  /** Posting-list bucket fan-out (the [[IncrementalChunkStore.ChunkBuckets]]
    * sizing argument: enough directories that a query's pruned read
    * touches a small fraction, few enough that per-batch appends don't
    * spray tiny files). */
  val TermBuckets = 64
  /** Doc-stats bucket fan-out for the admission seen-check. */
  val DocBuckets = 64

  private def termBucket = pmod(xxhash64(col("term")), lit(TermBuckets.toLong)).cast("int")
  private def docBucket(c: String) = pmod(col(c), lit(DocBuckets.toLong)).cast("int")

  private[streaming] def recoverStore(spark: SparkSession, storeDir: String): Unit =
    AtomicStore.recover(spark, storeDir, Seq("postings", "docstats"))

  /** Admit one micro-batch: index every doc_id not yet in the store.
    * Returns per-doc accounting (id, dl, admitted) — `admitted = false`
    * rows are replays/re-crawls of already-indexed ids. Requires ids
    * unique WITHIN the batch (duplicate in-batch ids would race for
    * keep-first; callers dedup upstream — documents streams are keyed). */
  def admitBatch(batch: DataFrame, id: String, text: String,
                 storeDir: String): DataFrame = {
    val spark = batch.sparkSession
    recoverStore(spark, storeDir)
    val postingsPath = s"$storeDir/postings"
    val docstatsPath = s"$storeDir/docstats"

    val tf = batch
      .select(col(id).cast("long").as("doc_id"),
        explode(graft.api.Graft.tokens(coalesce(col(text), lit("")))).as("term"))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val dl = tf.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl"))
      .withColumn("dbucket", docBucket("doc_id"))
      .cache()

    // keep-first: ids already in the store are replays — the read is
    // pruned to the batch's own doc buckets (static partition filter)
    val fresh =
      if (AtomicStore.exists(spark, docstatsPath)) {
        val batchBuckets = dl.select(col("dbucket")).distinct()
          .collect().map(_.getInt(0)).toSeq // ≤ DocBuckets by construction
        val seen = spark.read.parquet(docstatsPath)
          .filter(col("dbucket").isin(batchBuckets.map(Int.box): _*))
          .select(col("doc_id"))
        dl.join(seen, Seq("doc_id"), "left_anti")
      } else dl
    // eager checkpoint: the append below must not feed back into the
    // plan that decided freshness on a recompute
    val freshIds = fresh.select(col("doc_id"), col("dl"), col("dbucket"))
      .localCheckpoint(true)

    freshIds.select(col("doc_id"), col("dl"), col("dbucket"))
      .repartition(col("dbucket"))
      .write.mode(SaveMode.Append).partitionBy("dbucket").parquet(docstatsPath)
    tf.join(freshIds.select(col("doc_id")), Seq("doc_id"))
      .select(col("term"), col("doc_id"), col("tf"))
      .withColumn("bucket", termBucket)
      .repartition(col("bucket"))
      .write.mode(SaveMode.Append).partitionBy("bucket").parquet(postingsPath)

    val out = dl.select(col("doc_id").as(id), col("dl"))
      .join(freshIds.select(col("doc_id").as(id), lit(true).as("admitted")), Seq(id), "left")
      .withColumn("admitted", coalesce(col("admitted"), lit(false)))
      .localCheckpoint(true)
    dl.unpersist()
    out
  }

  /** Every admitted doc id (store entry point — rolls a crashed
    * compaction forward first). */
  def admittedDocs(spark: SparkSession, storeDir: String): DataFrame = {
    recoverStore(spark, storeDir)
    if (AtomicStore.exists(spark, s"$storeDir/docstats"))
      spark.read.parquet(s"$storeDir/docstats").select(col("doc_id"))
    else spark.range(0).select(col("id").as("doc_id"))
  }

  /** BM25 top-k over everything admitted so far — identical output to
    * `Graft.bm25Search(admittedCorpus, ...)`: the statistics frames are
    * assembled from the store (postings read pruned to the query
    * terms' buckets) and handed to the SAME scoring/top-k core. */
  def search(spark: SparkSession, storeDir: String, queryTerms: Seq[String],
             k: Int = 10, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "search needs at least one query term")
    recoverStore(spark, storeDir)
    val docstatsPath = s"$storeDir/docstats"
    val postingsPath = s"$storeDir/postings"
    if (!AtomicStore.exists(spark, docstatsPath) ||
        !AtomicStore.exists(spark, postingsPath))
      return spark.range(0).select(col("id").as("doc_id"),
        lit(0.0).as("score"), col("id").as("rank"))
    val dl = spark.read.parquet(docstatsPath).select(col("doc_id"), col("dl"))
    val qBuckets = queryTerms
      .map(t => math.floorMod(TermHash.xx64(t), TermBuckets.toLong).toInt)
      .distinct
    val qtf = spark.read.parquet(postingsPath)
      .filter(col("bucket").isin(qBuckets.map(Int.box): _*))
      .filter(col("term").isin(queryTerms: _*))
      .select(col("term"), col("doc_id"), col("tf"))
    val dfreq = qtf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    graft.api.Graft.bm25TopK(qtf, dfreq, dl, "doc_id", k, k1, b)
  }

  /** Compact both subs to one file per non-empty bucket, clustered by
    * their read keys; crash-safe via [[AtomicStore.swapIn]]. */
  def compactStore(spark: SparkSession, storeDir: String): Unit = {
    recoverStore(spark, storeDir)
    AtomicStore.swapIn(spark, storeDir, "postings") { (live, tmp) =>
      spark.read.parquet(live)
        .select(col("term"), col("doc_id"), col("tf"), col("bucket")).distinct()
        .repartition(col("bucket"))
        .sortWithinPartitions(col("bucket"), col("term"), col("doc_id"))
        .write.partitionBy("bucket").parquet(tmp)
    }
    AtomicStore.swapIn(spark, storeDir, "docstats") { (live, tmp) =>
      spark.read.parquet(live)
        .select(col("doc_id"), col("dl"), col("dbucket")).distinct()
        .repartition(col("dbucket"))
        .sortWithinPartitions(col("dbucket"), col("doc_id"))
        .write.partitionBy("dbucket").parquet(tmp)
    }
  }
}

/** Driver-side xxhash64 of a UTF-8 string with Spark's seed (42) —
  * must equal `functions.xxhash64(col)` so the query-time bucket
  * pruning computes the same buckets the writer partitioned by. */
private[streaming] object TermHash {
  def xx64(s: String): Long = {
    val bytes = org.apache.spark.unsafe.types.UTF8String.fromString(s)
    org.apache.spark.sql.catalyst.expressions.XXH64
      .hashUnsafeBytes(bytes.getBaseObject, bytes.getBaseOffset, bytes.numBytes(), 42L)
  }
}
