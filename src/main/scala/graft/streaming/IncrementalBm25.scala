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
  *    by `bucket = pmod(xxhash64(term), fanout)` so a query's read is
  *    pruned to its own terms' buckets (fan-out starts at
  *    [[TermBuckets]], grows with store size per [[BucketFanout]],
  *    stamped in `postings/_fanout`);
  *  - `docstats/` — (doc_id, dl), partitioned by
  *    `dbucket = pmod(doc_id, fanout)` so admission's seen-check
  *    reads only the batch's own doc buckets (adaptive likewise,
  *    `docstats/_fanout`);
  *  - `stats/` — one (anchor, n, dlsum) delta row per admitted batch,
  *    so a query's corpus aggregate (N, avgdl) reads O(batches) tiny
  *    rows instead of scanning the full docstats history; compaction
  *    folds it back to one row.
  *
  * Semantics: keep-FIRST per doc_id — a document is indexed the first
  * time its id is admitted; later arrivals of the same id (streaming
  * replays, re-crawls) are ignored. Ids must be unique WITHIN a batch
  * (enforced loudly — in-batch duplicates would silently merge two
  * texts under one id). Documents tokenizing to zero terms are not
  * admitted, mirroring the batch side (no dl row there either).
  *
  * Crash contract (at-least-once `foreachBatch` is idempotent): the
  * three appends are ordered postings → stats → docstats, and
  * `docstats` is the COMMIT RECORD — only once it lands does a replay
  * see the batch's ids as already admitted. A crash between any two
  * appends leaves the batch uncommitted, so the replay re-appends
  * everything: the duplicate postings rows are EXACT duplicates
  * (collapsed by the read-side `distinct` and by compaction), and the
  * duplicate stats row carries the same `anchor` (the min fresh
  * doc_id — unique per fresh set because keep-first makes fresh sets
  * disjoint), so reads fold stats by anchor. Compaction additionally
  * garbage-collects rows whose ids never committed (crashed batches
  * that were never replayed) and RECONCILES the stats row from the
  * docstats commit record. Each individual append is assumed
  * job-commit atomic (Spark's committer makes a partial multi-file
  * commit a narrow window, not an impossibility); if one does land
  * partially, the damage is bounded to a stats-delta overcount that
  * the next compaction repairs — never lost documents.
  *
  * Scale shape: per-batch cost ∝ batch + its doc buckets' stats (the
  * pruned anti-join), never the postings history; queries read the
  * query terms' posting buckets, the candidates' docstats buckets
  * (runtime dbucket pruning), and the O(batches) stats rows — no read
  * scales with the full history. Scoring and top-k are
  * [[graft.api.Graft.bm25TopK]] — numerically the same code as the
  * batch path, so the equality the spec pins cannot drift. */
object IncrementalBm25 {

  /** STARTING posting-list bucket fan-out (the
    * [[IncrementalChunkStore.ChunkBuckets]] sizing argument: enough
    * directories that a query's pruned read touches a small fraction,
    * few enough that per-batch appends don't spray tiny files).
    * Size-adaptive like the band/chunk stores ([[BucketFanout]]):
    * grows 64 → 256 → 1024 at store byte thresholds via a crash-safe
    * re-bucketing, stamped in `postings/_fanout`; the read paths
    * ([[search]], [[statsCorpus]]) always bucket with the PERSISTED
    * fan-out, so a constant change can never desync probes from dirs. */
  val TermBuckets: Int = BucketFanout.Base
  /** STARTING doc-stats bucket fan-out for the admission seen-check
    * (adaptive likewise; stamped in `docstats/_fanout`). */
  val DocBuckets: Int = BucketFanout.Base

  /** Anchor of the folded stats row compaction writes (below any real
    * doc id, so it can never collide with a batch's min-fresh-id). */
  private val FoldedAnchor = Long.MinValue

  private def termBucket(fanout: Int) =
    pmod(xxhash64(col("term")), lit(fanout.toLong)).cast("int")
  private def docBucket(c: String, fanout: Int) =
    pmod(col(c), lit(fanout.toLong)).cast("int")

  /** The fan-outs the persisted indexes are bucketed at. */
  def postingsFanout(spark: SparkSession, storeDir: String): Int =
    BucketFanout.storeFanout(spark, s"$storeDir/postings")
  def docstatsFanout(spark: SparkSession, storeDir: String): Int =
    BucketFanout.storeFanout(spark, s"$storeDir/docstats", "dbucket")

  /** Pure re-bucket rewrites for the fan-out migrations (compaction's
    * distinct/GC is NOT folded in here — a migration must be a
    * layout-only change; at-least-once duplicates stay and the read
    * paths keep distinct-ing them). */
  private def postingsRewrite(spark: SparkSession, fanout: Int)(
      live: String, tmp: String): Unit = {
    spark.read.parquet(live)
      .select(col("term"), col("doc_id"), col("tf"))
      .withColumn("bucket", termBucket(fanout))
      .repartition(col("bucket"))
      .sortWithinPartitions(col("bucket"), col("term"), col("doc_id"))
      .write.partitionBy("bucket").parquet(tmp)
    BucketFanout.writeManifest(spark, tmp, fanout)
  }
  private def docstatsRewrite(spark: SparkSession, fanout: Int)(
      live: String, tmp: String): Unit = {
    spark.read.parquet(live)
      .select(col("doc_id"), col("dl"))
      .withColumn("dbucket", docBucket("doc_id", fanout))
      .repartition(col("dbucket"))
      .sortWithinPartitions(col("dbucket"), col("doc_id"))
      .write.partitionBy("dbucket").parquet(tmp)
    BucketFanout.writeManifest(spark, tmp, fanout)
  }

  private[streaming] def recoverStore(spark: SparkSession, storeDir: String): Unit =
    AtomicStore.recover(spark, storeDir, Seq("postings", "docstats", "stats"))

  /** Admit one micro-batch: index every doc_id not yet in the store.
    * Returns per-doc accounting (id, dl, admitted) — `admitted = false`
    * rows are replays/re-crawls of already-indexed ids. Ids must be
    * unique within the batch (fails loudly otherwise). */
  def admitBatch(batch: DataFrame, id: String, text: String,
                 storeDir: String): DataFrame =
    admitBatchImpl(batch, id, text, storeDir, crashAfter = 0)

  /** Test seam: `crashAfter` injects a crash after the Nth append
    * (1 = postings, 2 = stats) to exercise the commit-record ordering. */
  private[streaming] def admitBatchImpl(batch: DataFrame, id: String, text: String,
      storeDir: String, crashAfter: Int): DataFrame = {
    val spark = batch.sparkSession
    recoverStore(spark, storeDir)
    val postingsPath = s"$storeDir/postings"
    val docstatsPath = s"$storeDir/docstats"
    val statsPath = s"$storeDir/stats"

    // pin the batch once (round 18; IncrementalDedup rationale): the
    // uniqueness probe plus the tf materialization would otherwise
    // each re-read the streaming source
    val pinned = batch.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
    // loud in-batch duplicate-id guard: two rows sharing an id would
    // silently MERGE their texts under one doc (the tf groupBy spans both)
    Admission.requireUnique(pinned, "IncrementalBm25.admitBatch", id)

    bootstrapStats(spark, storeDir)
    val termFan = BucketFanout.reconcile(spark, storeDir, "postings")(
      postingsRewrite(spark, _))
    val docFan = BucketFanout.reconcile(spark, storeDir, "docstats", "dbucket")(
      docstatsRewrite(spark, _))

    // tf is cached too: it feeds BOTH the dl rollup and the postings
    // append — without the cache the tokenize + term-grain shuffle runs
    // twice per trigger
    val tf = pinned
      .select(col(id).cast("long").as("doc_id"),
        explode(graft.api.Graft.tokens(coalesce(col(text), lit("")))).as("term"))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
      .cache()
    val dl = tf.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl"))
      .withColumn("dbucket", docBucket("doc_id", docFan))
      .cache()

    // keep-first: ids already COMMITTED (present in docstats) are
    // replays — the read is pruned to the batch's own doc buckets
    val fresh =
      if (AtomicStore.exists(spark, docstatsPath)) {
        val batchBuckets = dl.select(col("dbucket")).distinct()
          .collect().map(_.getInt(0)).toSeq // ≤ DocBuckets by construction
        val seen = spark.read.parquet(docstatsPath)
          .filter(col("dbucket").isin(batchBuckets.map(Int.box): _*))
          .select(col("doc_id"))
        dl.join(seen, Seq("doc_id"), "left_anti")
      } else dl
    // eager checkpoint: the appends below must not feed back into the
    // plan that decided freshness on a recompute
    val freshIds = fresh.select(col("doc_id"), col("dl"), col("dbucket"))
      .localCheckpoint(true)
    val fr = freshIds
      .agg(min(col("doc_id")).as("a"), count(lit(1)).as("n"), sum(col("dl")).as("s"))
      .head()

    if (fr.getLong(1) > 0L) {
      // 1. postings — on a crash-then-replay these rows appear twice as
      //    EXACT duplicates; reads distinct them, compaction removes them
      tf.join(freshIds.select(col("doc_id")), Seq("doc_id"))
        .select(col("term"), col("doc_id"), col("tf"))
        .withColumn("bucket", termBucket(termFan))
        .repartition(col("bucket"))
        .write.mode(SaveMode.Append).partitionBy("bucket").parquet(postingsPath)
      BucketFanout.writeManifest(spark, postingsPath, termFan)
      if (crashAfter == 1) throw new InjectedCrash("after postings")
      // 2. stats delta — anchored by the min fresh id so a replayed
      //    duplicate folds away at read time
      import spark.implicits._
      Seq((fr.getLong(0), fr.getLong(1), fr.getLong(2))).toDF("anchor", "n", "dlsum")
        .coalesce(1).write.mode(SaveMode.Append).parquet(statsPath)
      if (crashAfter == 2) throw new InjectedCrash("after stats")
      // 3. docstats — the COMMIT RECORD: lands last, so an uncommitted
      //    batch is always fully re-appended by its replay
      freshIds.select(col("doc_id"), col("dl"), col("dbucket"))
        .repartition(col("dbucket"))
        .write.mode(SaveMode.Append).partitionBy("dbucket").parquet(docstatsPath)
      BucketFanout.writeManifest(spark, docstatsPath, docFan)
    }

    val out = dl.select(col("doc_id").as(id), col("dl"))
      .join(freshIds.select(col("doc_id").as(id), lit(true).as("admitted")), Seq(id), "left")
      .withColumn("admitted", coalesce(col("admitted"), lit(false)))
      .localCheckpoint(true)
    dl.unpersist()
    tf.unpersist()
    out
    } finally batch.unpersist()
  }

  /** One-time migration for stores written before the stats sub
    * existed: seed it with a single folded row from the docstats
    * history. Written via temp-dir + rename (the [[AtomicStore]]
    * pattern): a crash mid-write must not leave a partial stats/ that
    * later entries would trust as complete — that would silently
    * corrupt N/avgdl forever. */
  private def bootstrapStats(spark: SparkSession, storeDir: String): Unit = {
    val docstatsPath = s"$storeDir/docstats"
    val statsPath = s"$storeDir/stats"
    if (AtomicStore.exists(spark, docstatsPath) && !AtomicStore.exists(spark, statsPath)) {
      import spark.implicits._
      val r = spark.read.parquet(docstatsPath)
        .agg(count(lit(1)).as("n"), sum(col("dl")).as("s")).head()
      val tmp = s"$storeDir/__compact_stats"
      val fs = new org.apache.hadoop.fs.Path(storeDir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(tmp), true)
      Seq((FoldedAnchor, r.getLong(0), r.getLong(1))).toDF("anchor", "n", "dlsum")
        .coalesce(1).write.parquet(tmp)
      require(fs.rename(new org.apache.hadoop.fs.Path(tmp),
        new org.apache.hadoop.fs.Path(statsPath)), "bootstrapStats: rename failed")
    }
  }

  /** Corpus aggregate (N, Σdl) from the stats deltas: fold replayed
    * duplicates by anchor, check each anchor against the docstats
    * COMMIT RECORD, then sum — O(batches-since-compaction) rows, never
    * the docstats history.
    *
    * The commit check closes the r11 drift window: a batch that
    * crashed between its stats and docstats appends and was never (or
    * not yet) replayed leaves an ORPHAN delta whose anchor — the
    * batch's min fresh doc_id — never committed; summing it would
    * inflate N/avgdl for every search until replay or compaction.
    * Anchors are collected driver-side (bounded: compaction folds the
    * log to the single [[FoldedAnchor]] row, which is the committed
    * fold of docstats itself and passes unchecked) and the docstats
    * probe is pruned to the anchors' dbuckets with doc_id pushdown, so
    * the check never scans the full history. Residual corner, repaired
    * at compaction: if the orphan's doc is later re-crawled as a NEW
    * batch's min fresh id, the two deltas share an anchor and the
    * first() fold keeps an arbitrary one — bounded to that one batch's
    * (n, dlsum), and the reconcile-from-docstats compaction erases it. */
  private def statsCorpus(spark: SparkSession, storeDir: String): DataFrame = {
    val folded = spark.read.parquet(s"$storeDir/stats")
      .groupBy(col("anchor")).agg(first(col("n")).as("n"), first(col("dlsum")).as("dlsum"))
    val real = folded.filter(col("anchor") =!= FoldedAnchor)
    val anchors = real.select(col("anchor")).collect().map(_.getLong(0))
    val checked =
      if (anchors.isEmpty || !AtomicStore.exists(spark, s"$storeDir/docstats")) real
      else {
        val docFan = docstatsFanout(spark, storeDir)
        val dbuckets = anchors.map(a => math.floorMod(a, docFan.toLong).toInt).distinct
        val committed = spark.read.parquet(s"$storeDir/docstats")
          .filter(col("dbucket").isin(dbuckets.map(Int.box): _*))
          .filter(col("doc_id").isin(anchors.map(Long.box): _*))
          .select(col("doc_id").as("anchor"))
        real.join(committed, Seq("anchor"), "left_semi")
      }
    folded.filter(col("anchor") === FoldedAnchor).unionAll(checked)
      // coalesce: every delta being an orphan leaves zero rows to sum
      .agg(coalesce(sum(col("n")), lit(0L)).as("__n"),
        coalesce(sum(col("dlsum")), lit(0L)).as("__dlsum"))
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
    * assembled from the store (postings pruned to the query terms'
    * buckets, docstats pruned to the candidates' dbuckets, N/avgdl from
    * the O(batches) stats deltas) and handed to the SAME scoring/top-k
    * core. No read scales with the full docstats history. */
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
    val termFan = postingsFanout(spark, storeDir)
    val qBuckets = queryTerms
      .map(t => math.floorMod(TermHash.xx64(t), termFan.toLong).toInt)
      .distinct
    // distinct kills the exact-duplicate rows a crash-then-replay leaves
    val qtfRaw = spark.read.parquet(postingsPath)
      .filter(col("bucket").isin(qBuckets.map(Int.box): _*))
      .filter(col("term").isin(queryTerms: _*))
      .select(col("term"), col("doc_id"), col("tf"))
      .distinct()
    // dl read pruned to the candidates' dbuckets (bounded driver-side
    // collect, ≤ the docstats fan-out — the admitBatch pattern)
    val candBuckets = qtfRaw
      .select(docBucket("doc_id", docstatsFanout(spark, storeDir)).as("dbucket"))
      .distinct().collect().map(_.getInt(0)).toSeq
    if (candBuckets.isEmpty)
      return spark.range(0).select(col("id").as("doc_id"),
        lit(0.0).as("score"), col("id").as("rank"))
    val dl = spark.read.parquet(docstatsPath)
      .filter(col("dbucket").isin(candBuckets.map(Int.box): _*))
      .select(col("doc_id"), col("dl"))
    // drop postings of UNCOMMITTED docs (crashed batch not yet
    // replayed): docstats is the commit record, and the pruned dl
    // covers every candidate, so the semi-join is exact
    val qtf = qtfRaw.join(dl.select(col("doc_id")), Seq("doc_id"), "left_semi")
    val dfreq = qtf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val corpus =
      if (AtomicStore.exists(spark, s"$storeDir/stats")) statsCorpus(spark, storeDir)
      else spark.read.parquet(docstatsPath) // pre-stats store, one-time shape
        .agg(count(lit(1)).as("__n"), sum(col("dl")).as("__dlsum"))
    graft.api.Graft.bm25TopKPre(qtf, dfreq, dl, corpus, "doc_id", k, k1, b)
  }

  /** Compact all subs: postings/docstats to one file per non-empty
    * bucket, clustered by their read keys; stats RECONCILED to one row
    * recomputed from the docstats commit record (repairing any drift
    * the delta log picked up — see the in-line note). Also
    * garbage-collects rows of batches that crashed uncommitted and
    * were never replayed (ids absent from docstats). Crash-safe via
    * [[AtomicStore.swapIn]]. */
  /** Compaction policy ([[IncrementalDedup.maybeCompact]] semantics,
    * same single-operator contract): compact when EITHER index holds
    * more than `maxFilesPerBucket` files per occupied bucket; returns
    * true iff it compacted. */
  def maybeCompact(spark: SparkSession, storeDir: String,
      maxFilesPerBucket: Int = 32): Boolean = {
    recoverStore(spark, storeDir)
    val (pf, pd) = AtomicStore.filesPerDir(spark, s"$storeDir/postings", "bucket")
    val (df, dd) = AtomicStore.filesPerDir(spark, s"$storeDir/docstats", "dbucket")
    val over = (pd > 0L && pf > maxFilesPerBucket * pd) ||
      (dd > 0L && df > maxFilesPerBucket * dd)
    if (!over) return false
    compactStore(spark, storeDir)
    true
  }

  def compactStore(spark: SparkSession, storeDir: String): Unit = {
    recoverStore(spark, storeDir)
    val committed =
      if (AtomicStore.exists(spark, s"$storeDir/docstats"))
        spark.read.parquet(s"$storeDir/docstats").select(col("doc_id")).cache()
      else spark.range(0).select(col("id").as("doc_id"))
    val termFan =
      if (AtomicStore.exists(spark, s"$storeDir/postings"))
        BucketFanout.target(spark, s"$storeDir/postings")
      else TermBuckets
    AtomicStore.swapIn(spark, storeDir, "postings") { (live, tmp) =>
      spark.read.parquet(live)
        .select(col("term"), col("doc_id"), col("tf")).distinct()
        .join(committed, Seq("doc_id"), "left_semi")
        .withColumn("bucket", termBucket(termFan))
        .repartition(col("bucket"))
        .sortWithinPartitions(col("bucket"), col("term"), col("doc_id"))
        .write.partitionBy("bucket").parquet(tmp)
      BucketFanout.writeManifest(spark, tmp, termFan)
    }
    val docFan =
      if (AtomicStore.exists(spark, s"$storeDir/docstats"))
        BucketFanout.target(spark, s"$storeDir/docstats", "dbucket")
      else DocBuckets
    AtomicStore.swapIn(spark, storeDir, "docstats") { (live, tmp) =>
      spark.read.parquet(live)
        .select(col("doc_id"), col("dl")).distinct()
        .withColumn("dbucket", docBucket("doc_id", docFan))
        .repartition(col("dbucket"))
        .sortWithinPartitions(col("dbucket"), col("doc_id"))
        .write.partitionBy("dbucket").parquet(tmp)
      BucketFanout.writeManifest(spark, tmp, docFan)
    }
    // stats are RECONCILED, not folded: recompute the single row from
    // the (just-compacted) docstats commit record. Folding the deltas
    // would preserve any drift the deltas picked up — e.g. a docstats
    // job commit that landed PARTIALLY (non-atomic multi-file rename)
    // splits one fresh set between committed and replayed, and the
    // replay's second delta double-counts the committed part. Between
    // compactions that window is open (appends are assumed job-commit
    // atomic, the store-wide assumption); compaction closes it.
    AtomicStore.swapIn(spark, storeDir, "stats") { (_, tmp) =>
      spark.read.parquet(s"$storeDir/docstats")
        .agg(count(lit(1)).as("n"), coalesce(sum(col("dl")), lit(0L)).as("dlsum"))
        .select(lit(FoldedAnchor).as("anchor"), col("n"), col("dlsum"))
        .coalesce(1).write.parquet(tmp)
    }
    committed.unpersist()
  }

  /** Marker for the injected-crash test seam. */
  private[streaming] final class InjectedCrash(where: String)
    extends RuntimeException(s"injected crash $where")
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
