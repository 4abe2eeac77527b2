package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.DedupQueries

/** Streaming NEAR-duplicate dedup: admit each arriving micro-batch's
  * documents against the full history of previously-admitted documents
  * — the ingest-time shape of MinHash+LSH dedup, for pipelines that
  * cannot re-run corpus-wide dedup on every crawl drop.
  *
  * Designed for `foreachBatch`:
  * {{{
  *   docsStream.writeStream.foreachBatch { (batch, _) =>
  *     IncrementalDedup.admitBatch(batch, "doc_id", "text", 0.8, storeDir)
  *     ()
  *   }.option("checkpointLocation", ck).start()
  * }}}
  *
  * Store layout under `storeDir` (both plain parquet, append-only):
  *  - `docs/`  — admitted (doc_id, text), directory-partitioned by
  *    `dbucket = pmod(doc_id, fanout)` so the history verify fetches
  *    CANDIDATE texts from the candidates' own dbuckets instead of
  *    scanning the whole admitted table per trigger (stamped in
  *    `docs/_fanout`)
  *  - `bands/` — admitted LSH band rows (doc_id, band, bandhash),
  *    directory-partitioned by `bucket = pmod(bandhash, fanout)` where
  *    the fan-out starts at [[BandBuckets]] and grows with store size
  *    (see [[BucketFanout]]; the store's actual fan-out is stamped in
  *    `bands/_fanout`)
  *
  * Scale shape — per-batch cost is ∝ batch + candidates, NOT history:
  * the batch's band rows equi-join the PERSISTED band table (no
  * signature recomputation over history), and only candidate history
  * docs are re-shingled for the exact-Jaccard verify. The band index is
  * bucket-partitioned on a bandhash prefix, so each trigger reads ONLY
  * the directories for the batch's own buckets — static partition
  * pruning, an O(batch)-bounded subset of files, not an O(history)
  * scan. History grows append-only; the band table is the classic
  * disk-resident LSH index, so a 100 TB admitted corpus costs
  * (bands × docs) long-triples of storage and the per-batch join
  * shuffles only batch-sized band rows.
  *
  * Admission semantics (deterministic given batch boundaries):
  *  1. a new doc with a verified near-dup among ADMITTED history is
  *     rejected;
  *  2. survivors dedup within the batch — one canonical doc (min id)
  *     per within-batch duplicate cluster (connected components, so a
  *     chain a~b~c admits only a).
  * Micro-batch boundaries affect which witness rejects a doc — inherent
  * to any incremental dedup — but two admitted docs are NEVER verified
  * near-dups of each other, whatever the batching.
  *
  * foreachBatch is at-least-once: a replayed batch re-runs admission
  * against a store that already contains its admitted docs, so replayed
  * docs self-match (Jaccard 1.0 ≥ any threshold) and are rejected —
  * the store converges; readers should still `dropDuplicates(id)` for
  * the replay-during-append edge. */
object IncrementalDedup {

  /** STARTING bucket fan-out of the band index directory layout
    * (= [[BucketFanout.Base]]). 64 balances the per-trigger pruned
    * read against the dynamic-partition COMMIT cost every append pays
    * (super-linear in dir count — 40k-row append: 256 dirs ≈ 4-6 s,
    * 64 ≈ 1.1 s, 16 ≈ 0.5 s, BandWriteProbeDrive) on a SMALL store.
    * The fan-out is size-adaptive: it grows 64 → 256 → 1024 at the
    * [[BucketFanout]] byte thresholds via a crash-safe
    * [[AtomicStore.swapIn]] re-bucketing, because at a 100 TB admitted
    * corpus a fixed 64 makes each bucket ~1.5 TB and the per-trigger
    * read grows linearly with history again. The store's ACTUAL
    * fan-out is stamped in a `bands/_fanout` manifest (detected from
    * the occupied dirs for pre-manifest stores) and every batch
    * buckets with it — a constant/schedule change can never desync
    * probe buckets from persisted dir values. */
  val BandBuckets: Int = BucketFanout.Base

  private def exists(spark: SparkSession, path: String): Boolean =
    AtomicStore.exists(spark, path)

  private def bucketCol(fanout: Int) =
    pmod(col("bandhash"), lit(fanout.toLong)).cast("int")

  /** Whether the store at `path` has the `dirCol=` directory layout.
    * A store written before bucketing — flat parquet files at the
    * root — must NOT receive a partitioned append: the mixed layout
    * fails Spark's partition discovery ("Conflicting directory
    * structures") and bricks the store. */
  private def hasBucketDirs(spark: SparkSession, path: String,
      dirCol: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(p).exists(s => s.isDirectory && s.getPath.getName.startsWith(s"$dirCol="))
  }
  private def bandsBucketed(spark: SparkSession, bandsPath: String): Boolean =
    hasBucketDirs(spark, bandsPath, "bucket")

  /** The band-index scan a batch with band-rows in `buckets` performs:
    * a static `IN` filter on the partition directory column, so Spark
    * plans the read over only those buckets' files (visible as
    * `numFiles` in the scan metrics). `buckets` must be computed at the
    * store's own fan-out ([[storeFanout]]) — admitBatch reconciles
    * before probing. Exposed for the spec that pins the pruning.
    * Pre-bucketing stores (no `bucket` dir column) fall back to a full
    * scan with the bucket derived — correct, unpruned; `compactStore`
    * migrates them. */
  private[streaming] def bandIndexScan(spark: SparkSession, bandsPath: String,
      buckets: Seq[Int]): DataFrame = {
    val raw = spark.read.parquet(bandsPath)
    if (raw.columns.contains("bucket"))
      raw.filter(col("bucket").isin(buckets.map(Int.box): _*))
    else raw.withColumn("bucket", bucketCol(BucketFanout.storeFanout(spark, bandsPath)))
      .filter(col("bucket").isin(buckets.map(Int.box): _*))
  }

  /** The fan-out the persisted band index is bucketed at (manifest, or
    * occupied-dir detection for pre-manifest stores). Exposed for
    * specs/drives. */
  def storeFanout(spark: SparkSession, storeDir: String): Int =
    BucketFanout.storeFanout(spark, s"$storeDir/bands")

  /** Roll the store forward past a compaction crash ([[AtomicStore
    * .recover]] semantics); called by every store entry point. */
  private[streaming] def recoverStore(spark: SparkSession, storeDir: String): Unit =
    AtomicStore.recover(spark, storeDir, Seq("docs", "bands"))

  private def swapIn(spark: SparkSession, storeDir: String, sub: String)(
      rewrite: (String, String) => Unit): Unit =
    AtomicStore.swapIn(spark, storeDir, sub)(rewrite)

  /** The band-store rewrite at `fanout`: (re)bucket every row from its
    * own bandhash, one file per non-empty bucket, rows clustered by the
    * join keys, manifest stamped into the rewrite so it rides the swap.
    * Shared by [[compactStore]], the in-place migration a pre-bucketing
    * store gets on its first post-upgrade append, and the size-adaptive
    * fan-out growth. */
  private def bandsRewrite(spark: SparkSession, fanout: Int)(
      live: String, tmp: String): Unit = {
    spark.read.parquet(live)
      .withColumn("bucket", bucketCol(fanout))
      .repartition(col("bucket"))
      .sortWithinPartitions(col("bucket"), col("band"), col("bandhash"))
      .write.partitionBy("bucket").parquet(tmp)
    BucketFanout.writeManifest(spark, tmp, fanout)
  }

  /** Reconcile the persisted layout with the size schedule and return
    * the fan-out THIS batch must bucket with: migrates flat
    * (pre-bucketing) stores, grows the fan-out crash-safely when the
    * store crossed a [[BucketFanout]] threshold, and otherwise just
    * reads the store's stamped/detected fan-out. Monotonic — never
    * re-buckets downward. */
  private def reconcileFanout(spark: SparkSession, storeDir: String,
      bandsPath: String): Int = {
    // A pre-bucketing store (flat parquet at bands/ root) must be
    // migrated BEFORE any partitioned append: bucket= dirs next to flat
    // files fail Spark's partition discovery ("Conflicting directory
    // structures") on the next read — the store would be bricked.
    if (exists(spark, bandsPath) && !bandsBucketed(spark, bandsPath)) {
      val f = BucketFanout.target(spark, bandsPath)
      swapIn(spark, storeDir, "bands")(bandsRewrite(spark, f))
      return f
    }
    BucketFanout.reconcile(spark, storeDir, "bands")(bandsRewrite(spark, _))
  }

  private def docBucketCol(fanout: Int) =
    pmod(col("doc_id"), lit(fanout.toLong)).cast("int")

  /** The docs-store rewrite at `fanout`: bucket every admitted doc by
    * `dbucket = pmod(doc_id, fanout)`. The docs store is bucketed for
    * the same reason docstats is in [[IncrementalBm25]]: the history
    * verify re-shingles CANDIDATE docs only, and without a pruned
    * lookup that "candidates-only" join still SCANS the whole admitted
    * text table per trigger — measured ~95 MB/probe at sf1 (dominating
    * the probe's I/O and growing linearly with history; FanoutScaleDrive
    * round-17 found it). With the layout, the candidate fetch reads
    * only the candidates' own dbuckets. */
  private def docsRewrite(spark: SparkSession, fanout: Int)(
      live: String, tmp: String): Unit = {
    spark.read.parquet(live)
      .select(col("doc_id"), col("text"))
      .withColumn("dbucket", docBucketCol(fanout))
      .repartition(col("dbucket"))
      .sortWithinPartitions(col("dbucket"), col("doc_id"))
      .write.partitionBy("dbucket").parquet(tmp)
    BucketFanout.writeManifest(spark, tmp, fanout)
  }

  /** [[reconcileFanout]] for the docs store (dir column `dbucket`). */
  private def reconcileDocsFanout(spark: SparkSession, storeDir: String,
      docsPath: String): Int = {
    if (exists(spark, docsPath) && !hasBucketDirs(spark, docsPath, "dbucket")) {
      val f = BucketFanout.target(spark, docsPath, "dbucket")
      swapIn(spark, storeDir, "docs")(docsRewrite(spark, f))
      return f
    }
    BucketFanout.reconcile(spark, storeDir, "docs", "dbucket")(docsRewrite(spark, _))
  }

  /** Run one admission step; appends admitted docs + their band rows to
    * the store and returns the admitted (id, text) frame. */
  def admitBatch(batch: DataFrame, id: String, text: String,
      threshold: Double, storeDir: String): DataFrame = {
    val spark = batch.sparkSession
    def phase(s: String): Unit =
      spark.sparkContext.setJobDescription(s"admitBatch/$s")
    recoverStore(spark, storeDir)
    // Pin the batch ONCE: downstream it feeds four separate actions
    // (uniqueness probe, signature materialization, the survivors
    // semi-join, the admitted build), and an unpinned foreachBatch
    // frame re-plans from the STREAMING SOURCE per action — the sf10
    // planted run's per-trigger instrumentation read numInputRows =
    // 4× the trigger cap, i.e. every ingest byte fetched four times
    // (round 18). MEMORY_AND_DISK, not localCheckpoint: a 100 TB
    // trigger slice must be allowed to spill, and eager truncation is
    // unnecessary — only re-read avoidance is.
    val pinned = batch.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
    // two rows sharing an id would both survive within-batch
    // canonicalization (self-pairs are excluded) and double-append
    phase("requireUnique")
    Admission.requireUnique(pinned, "IncrementalDedup.admitBatch", id)
    val docsPath = s"$storeDir/docs"
    val bandsPath = s"$storeDir/bands"

    // Reconcile layout first: flat-store migration, size-adaptive
    // fan-out growth, pre-manifest detection — after this, `fanout` is
    // BOTH what the persisted dirs were bucketed with and what this
    // batch buckets with, so probe values always match dir values.
    phase("reconcile-fanout")
    val fanout = reconcileFanout(spark, storeDir, bandsPath)
    val docFanout = reconcileDocsFanout(spark, storeDir, docsPath)

    val newDocs = pinned.select(col(id).as("doc_id"), col(text).as("text"))
    // cached: reused for history verify AND the admitted band append, so
    // the CPU-bound signature kernel runs once per batch
    val newSigs = DedupQueries.signatures(newDocs, "doc_id", "text").cache()
    // also cached: the bucket-discovery collect below is its own action,
    // and bandsOf's posexplode would otherwise re-run for it before the
    // candidate join and the band append reuse the rows
    val newBands = DedupQueries.bandsOf(newSigs)
      .withColumn("bucket", bucketCol(fanout)).cache()

    // 1. history rejection: batch bands ⋈ persisted band index →
    //    candidate (new, seen) pairs → exact verify on shingles of the
    //    candidate subset only. The index read is pruned to the batch's
    //    own bucket directories (≤ fanout literals — bounded
    //    driver-side by construction, not by data size).
    val rejectedByHistory: DataFrame =
      if (exists(spark, bandsPath)) {
        phase("bucket-discovery")
        val batchBuckets = newBands.select(col("bucket")).distinct()
          .collect().map(_.getInt(0)).toSeq
        val seenBands = bandIndexScan(spark, bandsPath, batchBuckets)
          .select(col("doc_id").as("seen_id"), col("band"), col("bandhash"))
        val cand = newBands.join(seenBands, Seq("band", "bandhash"))
          .select(col("doc_id"), col("seen_id")).distinct()
          // candidates feed TWO consumers below (the dbucket discovery
          // collect and the verify join) — materialize once
          .localCheckpoint(true)
        // the candidate re-shingle reads ONLY the candidates' own
        // dbucket directories (bounded: ≤ docFanout literals), not the
        // whole admitted text table — the docs-store analog of the
        // band-index pruning (the unpruned join scanned all of docs/
        // per trigger, an O(history) read)
        val candBuckets = cand
          .select(pmod(col("seen_id"), lit(docFanout.toLong)).cast("int").as("b"))
          .distinct().collect().map(_.getInt(0)).toSeq
        val docsRaw = spark.read.parquet(docsPath)
        val docsPruned =
          if (docsRaw.columns.contains("dbucket"))
            docsRaw.filter(col("dbucket").isin(candBuckets.map(Int.box): _*))
          else docsRaw // pre-bucketing store mid-migration: full scan, correct
        val seenSh = DedupQueries.shingleFrame(
          docsPruned.select(col("doc_id"), col("text"))
            .join(cand.select(col("seen_id").as("doc_id")).distinct(), Seq("doc_id")),
          "doc_id", "text")
          .select(col("doc_id").as("seen_id"), col("sh").as("sh_seen"))
        cand
          .join(newSigs.select(col("doc_id"), col("sh")), Seq("doc_id"))
          .join(seenSh, Seq("seen_id"))
          .filter(DedupQueries.jaccardCol(col("sh"), col("sh_seen")) >= threshold)
          .select(col("doc_id")).distinct()
          // eager checkpoint of the (tiny) rejected-id frame: both the
          // within-batch pair probe and the admitted build consume
          // survivors, and without this each re-runs the whole history
          // verify (band scan + candidate re-shingle + jaccard)
          .localCheckpoint(true)
      } else spark.range(0).select(col("id").as("doc_id"))

    val survivors = newDocs.join(rejectedByHistory, Seq("doc_id"), "left_anti")

    // 2. within-batch canonicalization: near-dup pairs among survivors →
    //    connected clusters → keep the min id of each cluster. The
    //    pairs reuse the CACHED signatures/bands computed above —
    //    band hashes are a pure function of a doc's own signature, so
    //    restricting the cached rows to survivors is exactly
    //    minhashDupes(survivors) without a second kernel pass
    val sBands = newBands.join(survivors.select(col("doc_id")), Seq("doc_id"), "left_semi")
    // no .distinct() here: a pair colliding in several bands just
    // evaluates the (cheap, array-local) jaccard filter more than once
    // and dupClusters' own edges-distinct dedups — the distinct cost a
    // full exchange + AQE stage round per trigger for nothing
    val cands = sBands.as("x").join(sBands.as("y"),
        col("x.band") === col("y.band") &&
        col("x.bandhash") === col("y.bandhash") &&
        col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
    val pairs = cands
      .join(newSigs.select(col("doc_id"), col("sh").as("sh_a")),
        col("doc_a") === col("doc_id")).drop("doc_id")
      .join(newSigs.select(col("doc_id"), col("sh").as("sh_b")),
        col("doc_b") === col("doc_id")).drop("doc_id")
      .filter(DedupQueries.jaccardCol(col("sh_a"), col("sh_b")) >= threshold)
      .select(col("doc_a").as("id_a"), col("doc_b").as("id_b"))
    phase("within-batch-cc")
    val clusters = graft.api.Graft.dupClusters(pairs, "id_a", "id_b")
      .withColumnRenamed("id", "doc_id")
    // localCheckpoint (eager) truncates lineage BEFORE the store writes:
    // the admitted plan reads the store's current files, so a lazy
    // recompute after the appends below would see its own output
    phase("admitted-checkpoint")
    val admitted = survivors.join(clusters, Seq("doc_id"), "left")
      .filter(col("cluster_id").isNull || col("cluster_id") === col("doc_id"))
      .select(col("doc_id"), col("text"))
      .localCheckpoint(true)

    // The two store appends are independent (different subdirs, both
    // inputs eagerly materialized above) and each pays a
    // dynamic-partition COMMIT measured at ~1-1.7 s over 64 dirs —
    // the largest single stages of a trigger (r18 probe). Run them
    // CONCURRENTLY (guide §2.6): the commit constants overlap instead
    // of adding. Crash-ordering note: either append landing without
    // the other converges under replay exactly like the sequential
    // order did — docs-without-bands re-admits (exact-dup docs rows,
    // the documented dropDuplicates class), bands-without-docs finds
    // the band match but no text to verify against and re-admits
    // (exact-dup band rows, removed by compaction) — unlike the embed
    // store there is no over/under-bound asymmetry between the subs.
    // Job groups/descriptions are thread-local: set per thread.
    phase(null)
    val appendPool = java.util.concurrent.Executors.newFixedThreadPool(2)
    implicit val appendEc: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutorService(appendPool)
    val docsF = scala.concurrent.Future {
      phase("docs-append")
      admitted.withColumn("dbucket", docBucketCol(docFanout))
        .repartition(col("dbucket"))
        .write.mode(SaveMode.Append).partitionBy("dbucket").parquet(docsPath)
      BucketFanout.writeManifest(spark, docsPath, docFanout)
    }
    // repartition by bucket before the partitioned append: one file per
    // non-empty bucket per batch instead of tasks × buckets tiny files
    val bandsF = scala.concurrent.Future {
      phase("bands-append")
      newBands.join(admitted.select(col("doc_id")), Seq("doc_id"), "left_semi")
        .repartition(col("bucket"))
        .write.mode(SaveMode.Append).partitionBy("bucket").parquet(bandsPath)
      // stamp the fan-out the dirs were just written at (first append
      // creates the store; later appends overwrite with the same value)
      BucketFanout.writeManifest(spark, bandsPath, fanout)
    }
    try {
      import scala.concurrent.duration.Duration
      // await BOTH before propagating a failure (ADVICE r18): rethrowing
      // on the first failed future would leave the other append still
      // writing while the foreachBatch unwinds — the replay could then
      // overlap an in-flight append (convergent, but a concurrent writer
      // the sequential code never had)
      val outcomes = Seq(docsF, bandsF)
        .map(f => scala.util.Try(scala.concurrent.Await.result(f, Duration.Inf)))
      outcomes.foreach(_.get)
    } finally appendPool.shutdown()
    newBands.unpersist()
    newSigs.unpersist()
    phase(null)
    admitted
    } finally batch.unpersist()
  }

  /** The admitted corpus so far (empty frame if nothing admitted).
    * Rolls forward any crashed compaction first, so it is a store ENTRY
    * POINT under the single-operator contract: do not call concurrently
    * with a running [[compactStore]] (see its scaladoc for why). */
  def admittedDocs(spark: SparkSession, storeDir: String): DataFrame = {
    recoverStore(spark, storeDir)
    if (exists(spark, s"$storeDir/docs"))
      spark.read.parquet(s"$storeDir/docs").select(col("doc_id"), col("text"))
    else spark.range(0).select(col("id").as("doc_id"), lit("").as("text")).limit(0)
  }

  /** Compact the append-only store: every micro-batch appends its own
    * parquet files, so a long-running ingest accumulates
    * batches × partitions small files — the classic metadata killer at
    * scale. Rewrites docs/ and bands/ via a temp-dir + swap; a crash at
    * ANY point (mid-rewrite, between the two renames) is rolled forward
    * by [[recoverStore]] on the next store operation, so the live store
    * always serves the pre-compaction content until the swap completes.
    *
    * Single-OPERATOR contract: pause every other store entry point —
    * `admitBatch` AND the readers (`admittedDocs`) — while compacting,
    * like any parquet compaction. The readers are included because they
    * too call [[recoverStore]]: a reader racing an in-flight compaction
    * cannot tell "crashed" from "running" and would delete the
    * in-progress `__compact_*` rewrite or rename `__old_*` back inside
    * the two-rename window, failing the compaction's second rename.
    * (Crash-vs-running is undecidable from the filesystem alone — a
    * liveness marker left by a crash would instead disable recovery
    * forever — so the contract, not a marker, carries this.)
    *
    * Bands and docs keep (or, for a pre-bucketing store, acquire) their
    * bucket directory layouts at the size-scheduled fan-out, ending at
    * one file per non-empty bucket with rows clustered by the read
    * keys — so the per-batch pruned reads open exactly one file per
    * probed bucket. (`parts` is retained for source compatibility; the
    * docs rewrite is bucketed now, so it is ignored.) */
  /** Compaction POLICY for a long-running ingest: compact when the
    * append-only band index has accumulated more than
    * `maxFilesPerBucket` files per occupied bucket (each trigger
    * appends one file per non-empty bucket, so files/bucket ≈ triggers
    * since the last compaction — the small-files metadata tax grows
    * linearly with it). Returns true iff it compacted. Runs under the
    * same single-operator contract as [[compactStore]]: call it from
    * the ingest's OWN maintenance slot (e.g. every N triggers inside
    * foreachBatch, or a quiet window) — never concurrently with other
    * store entry points. Because [[compactStore]] rewrites at the
    * size-scheduled fan-out, a maintenance-window `maybeCompact` also
    * pre-pays any pending fan-out migration, so the next trigger's
    * reconcile is a no-op instead of a mid-trigger rewrite. */
  def maybeCompact(spark: SparkSession, storeDir: String,
      maxFilesPerBucket: Int = 32): Boolean = {
    recoverStore(spark, storeDir)
    val (files, dirs) = AtomicStore.filesPerDir(spark, s"$storeDir/bands", "bucket")
    if (dirs == 0L || files <= maxFilesPerBucket * dirs) return false
    compactStore(spark, storeDir)
    true
  }

  def compactStore(spark: SparkSession, storeDir: String, parts: Int = 16): Unit = {
    recoverStore(spark, storeDir) // clears any crashed prior compaction
    if (exists(spark, s"$storeDir/docs")) {
      val f = BucketFanout.target(spark, s"$storeDir/docs", "dbucket")
      swapIn(spark, storeDir, "docs")(docsRewrite(spark, f))
    }
    if (exists(spark, s"$storeDir/bands")) {
      val f = BucketFanout.target(spark, s"$storeDir/bands")
      swapIn(spark, storeDir, "bands")(bandsRewrite(spark, f))
    }
  }
}
