package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.VecMath.float_dot
import graft.ops.Ivf

/** Streaming EMBEDDING near-duplicate dedup: admit each arriving
  * micro-batch's vectors against the full history of previously-admitted
  * vectors — the ingest-time shape of IVF-blocked cosine dedup
  * ([[graft.api.Graft.embedNearDup]]), for pipelines that cannot re-run
  * corpus-wide dedup on every crawl drop. The embedding analog of
  * [[IncrementalDedup]]; same `foreachBatch` usage, same at-least-once
  * replay semantics (a replayed vector self-matches at cosine 1.0 and is
  * rejected).
  *
  * Store layout under `storeDir`:
  *  - `index/` — the [[graft.ops.Ivf.Index]] trained ONCE on the first
  *    batch ([[graft.ops.Ivf.save]] format) and amortized across every
  *    later batch: no per-trigger centroid training.
  *  - `vecs/`  — admitted (doc_id, vec, nrm, cell), directory-partitioned
  *    by `bucket = pmod(cell, fanout)`, append-only (fan-out starts at
  *    [[VecBuckets]], grows with store size per [[BucketFanout]],
  *    stamped in `vecs/_fanout`).
  *  - `radii/` — append-only (cell, radius) rows; the live per-cell
  *    radius is the MAX per cell, maintained by appending each admitted
  *    batch's home angles. Nlist-sized reads, never corpus-sized.
  *
  * Scale shape — per-batch cost is ∝ batch + candidates, NOT history:
  * the batch probes cells under the per-cell radius rule
  * ([[graft.ops.Ivf.assignWithinRadii]]) and equi-joins the PERSISTED
  * vector index on cell id; the read is pruned to the probed cells'
  * bucket directories (static partition pruning — an O(batch)-bounded
  * subset of files). No history vector is re-embedded, re-assigned, or
  * re-scanned outside the probed buckets.
  *
  * Completeness under a stale index: centroids never change after the
  * first batch, but the radius rule only needs `radii` to bound every
  * ADMITTED vector's home angle — maintained exactly by the per-batch
  * radii append. For any qualifying pair (new v, admitted b) with b
  * homed in cell c: θ(v,c) ≤ θ(v,b) + θ(b,c) ≤ acos(threshold) +
  * radius_c, so v always probes c. Drifting corpora inflate radii (more
  * probing, graceful degradation toward the distributed scan) — never
  * missed pairs, never a nested loop. */
object IncrementalEmbedDedup {

  /** STARTING bucket fan-out of the vector index directory layout
    * (same role as [[IncrementalDedup.BandBuckets]]): cells hash into
    * 64 directories, so a batch probing k cells reads ≤ min(k, fanout)
    * directories. Size-adaptive like the band/chunk stores
    * ([[BucketFanout]]): the fan-out grows 64 → 256 → 1024 at store
    * byte thresholds via a crash-safe re-bucketing, stamped in
    * `vecs/_fanout` — a fan-out above nlist simply converges to one
    * cell per directory, the pruned-read-optimal layout. */
  val VecBuckets: Int = BucketFanout.Base

  private def bucketCol(fanout: Int) = pmod(col("cell"), lit(fanout)).cast("int")

  /** The fan-out the persisted vector index is bucketed at. */
  def storeFanout(spark: SparkSession, storeDir: String): Int =
    BucketFanout.storeFanout(spark, s"$storeDir/vecs")

  /** The vector-index rewrite at `fanout`: re-bucket every row from its
    * own cell, cluster by cell, stamp the manifest. */
  private def vecsRewrite(spark: SparkSession, fanout: Int)(
      live: String, tmp: String): Unit = {
    spark.read.parquet(live)
      .withColumn("bucket", bucketCol(fanout))
      .repartition(col("bucket"))
      .sortWithinPartitions(col("bucket"), col("cell"))
      .write.partitionBy("bucket").parquet(tmp)
    BucketFanout.writeManifest(spark, tmp, fanout)
  }

  private def clamp(t: Double): Double = math.max(-1.0, math.min(1.0, t))

  /** The vector-index scan a batch probing cells in `buckets` performs:
    * a static `IN` filter on the partition directory column (visible as
    * `numFiles` in the scan metrics). Exposed for the spec that pins
    * the pruning. */
  private[streaming] def vecIndexScan(spark: SparkSession, vecsPath: String,
      buckets: Seq[Int]): DataFrame =
    spark.read.parquet(vecsPath)
      .filter(col("bucket").isin(buckets.map(Int.box): _*))

  /** Roll the store forward past a compaction crash ([[AtomicStore
    * .recover]] semantics); called by every store entry point. `index/`
    * is never swapped — it is written once, atomically enough via its
    * `_SUCCESS` marker (see [[indexReady]]). */
  private[streaming] def recoverStore(spark: SparkSession, storeDir: String): Unit =
    AtomicStore.recover(spark, storeDir, Seq("vecs", "radii"))

  /** The index bootstrap is complete only when the write committed: a
    * crash mid-save leaves a directory without `_SUCCESS`, and the
    * replayed first batch retrains over it (SaveMode.Overwrite clears
    * the partial output). */
  private def indexReady(spark: SparkSession, indexPath: String): Boolean =
    AtomicStore.exists(spark, s"$indexPath/_SUCCESS")

  /** Live per-cell radii over the ADMITTED corpus: max per cell over the
    * append-only radii rows. Nlist-sized collect — driver-safe by
    * construction. */
  private def liveRadii(spark: SparkSession, radiiPath: String, nlist: Int): Array[Double] = {
    val radii = new Array[Double](nlist)
    if (AtomicStore.exists(spark, radiiPath))
      spark.read.parquet(radiiPath)
        .groupBy(col("cell")).agg(max(col("radius")).as("r"))
        .collect().foreach(r => radii(r.getInt(0)) = r.getDouble(1))
    radii
  }

  /** Run one admission step; appends admitted vectors + their radii rows
    * to the store and returns the admitted (id, vec) frame.
    *
    * Admission semantics (deterministic given batch boundaries), exactly
    * [[IncrementalDedup.admitBatch]]'s with cosine ≥ threshold as the
    * near-dup relation:
    *  1. a new vector with a verified near-dup among ADMITTED history is
    *     rejected;
    *  2. survivors dedup within the batch — one canonical vector (min
    *     id) per within-batch duplicate cluster. */
  def admitBatch(batch: DataFrame, id: String, vec: String,
      threshold: Double, storeDir: String,
      ivf: Ivf.Params = Ivf.Params()): DataFrame = {
    val spark = batch.sparkSession
    recoverStore(spark, storeDir)
    // Pin the batch once: it feeds several separate actions below
    // (uniqueness probe, emptiness probe, home assignment, the radius
    // probe, the survivors anti-join), and an unpinned foreachBatch
    // frame re-plans from the STREAMING SOURCE per action — the sf10
    // planted run's per-trigger instrumentation read numInputRows at
    // ~3x the trigger cap (round 18; IncrementalDedup rationale).
    val pinned = batch.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
    // two rows sharing an id would both survive within-batch
    // canonicalization (self-pairs are excluded) and double-append
    Admission.requireUnique(pinned, "IncrementalEmbedDedup.admitBatch", id)
    val vecsPath = s"$storeDir/vecs"
    val radiiPath = s"$storeDir/radii"
    val indexPath = s"$storeDir/index"

    val newVecs = pinned.select(col(id).as("doc_id"), col(vec).as("vec"))
    if (newVecs.isEmpty) return newVecs
    val fanout = BucketFanout.reconcile(spark, storeDir, "vecs")(
      vecsRewrite(spark, _))

    // amortized index: trained once, on the first non-empty batch; all
    // radii live in radii/ (the saved radii are the train-time zeros)
    val index =
      if (indexReady(spark, indexPath)) Ivf.load(spark, indexPath)
      else {
        val centroids = Ivf.trainCentroids(newVecs, "doc_id", "vec", ivf)
        val ix = Ivf.Index(centroids, new Array[Double](centroids.length))
        Ivf.save(spark, indexPath, ix)
        ix
      }
    val maxPairRad = math.acos(clamp(threshold))

    // home assignment once per batch (map-only kernel); reused for the
    // admitted append below — localCheckpoint so it runs once
    val home = Ivf.assign(newVecs, "doc_id", "vec", index.centroids, 1)
      .select(col("doc_id"), col("vec"), col("nrm"), col("cell"), col("cell_angle"))
      .localCheckpoint(true)

    // 1. history rejection: radius-rule probe → equi-join the persisted
    //    vector index on cell, pruned to the probed buckets' directories
    //    (≤ VecBuckets literals — bounded driver-side by construction)
    val rejectedByHistory: DataFrame =
      if (AtomicStore.exists(spark, vecsPath)) {
        val radii = liveRadii(spark, radiiPath, index.nlist)
        // cached: the bucket-discovery collect is its own action and the
        // probe kernel would otherwise re-run before the candidate join
        val probed = Ivf.assignWithinRadii(
            newVecs, "doc_id", "vec", index.centroids, radii, maxPairRad)
          .select(col("doc_id"), col("vec").as("__v"), col("nrm"), col("cell"))
          .withColumn("bucket", bucketCol(fanout))
          .cache()
        val batchBuckets = probed.select(col("bucket")).distinct()
          .collect().map(_.getInt(0)).toSeq
        val hist = vecIndexScan(spark, vecsPath, batchBuckets)
          .select(col("vec").as("__hv"), col("nrm").as("__hnrm"), col("cell"))
        // no id-inequality filter: a replayed vector must self-match its
        // admitted copy (cosine 1.0 ≥ threshold) and be rejected
        val rejected = probed.join(hist, Seq("cell"))
          .filter(round(float_dot(col("__v"), col("__hv"))
            / col("nrm") / col("__hnrm"), 12) >= threshold)
          .select(col("doc_id")).distinct()
          .localCheckpoint(true) // materialize before unpersist
        probed.unpersist()
        rejected
      } else spark.range(0).select(col("id").as("doc_id"))

    val survivors = newVecs.join(rejectedByHistory, Seq("doc_id"), "left_anti")

    // 2. within-batch canonicalization: near-dup pairs among survivors
    //    (reusing the amortized centroids — the indexed overload measures
    //    the survivors' own radii, so probing stays complete) →
    //    connected clusters → keep the min id of each cluster
    val pairs = graft.api.Graft.embedNearDup(survivors, "doc_id", "vec", threshold, index)
    val clusters = graft.api.Graft.dupClusters(pairs, "id_a", "id_b")
      .withColumnRenamed("id", "doc_id")
    // localCheckpoint (eager) truncates lineage BEFORE the store writes:
    // the admitted plan reads the store's current files via the history
    // anti-join, so a lazy recompute after the appends below would see
    // its own output
    val admittedHome = home
      .join(survivors.join(clusters, Seq("doc_id"), "left")
        .filter(col("cluster_id").isNull || col("cluster_id") === col("doc_id"))
        .select(col("doc_id")), Seq("doc_id"), "left_semi")
      .withColumn("bucket", bucketCol(fanout))
      .localCheckpoint(true)

    // radii BEFORE vectors: a crash between the two appends must leave
    // radii as the OVER-bound side (rows whose vectors never landed only
    // cause extra probing; the reverse order could under-bound a cell's
    // radius and silently miss qualifying pairs on every later batch)
    admittedHome.groupBy(col("cell")).agg(max(col("cell_angle")).as("radius"))
      .coalesce(1)
      .write.mode(SaveMode.Append).parquet(radiiPath)
    // repartition by bucket before the partitioned append: one file per
    // non-empty bucket per batch instead of tasks × buckets tiny files
    admittedHome.select(col("doc_id"), col("vec"), col("nrm"), col("cell"), col("bucket"))
      .repartition(col("bucket"))
      .write.mode(SaveMode.Append).partitionBy("bucket").parquet(vecsPath)
    BucketFanout.writeManifest(spark, vecsPath, fanout)
    admittedHome.select(col("doc_id"), col("vec"))
    } finally batch.unpersist()
  }

  /** The admitted vectors so far (empty frame if nothing admitted).
    * A store ENTRY POINT under the single-operator contract (it calls
    * [[recoverStore]]): do not run concurrently with [[compactStore]]. */
  def admittedVecs(spark: SparkSession, storeDir: String): DataFrame = {
    recoverStore(spark, storeDir)
    if (AtomicStore.exists(spark, s"$storeDir/vecs"))
      spark.read.parquet(s"$storeDir/vecs").select(col("doc_id"), col("vec"))
    else spark.range(0).select(col("id").as("doc_id"),
      lit(null).cast("array<float>").as("vec"))
  }

  /** Compact the append-only store: vecs/ collapses to one file per
    * non-empty bucket (rows clustered by cell — the pruned-read-optimal
    * layout); radii/ collapses to one row per cell. Crash-safe via the
    * same temp-and-swap + roll-forward as [[IncrementalDedup
    * .compactStore]], and under the same single-operator contract
    * (writers AND readers paused — see that method's scaladoc). */
  /** Compaction policy ([[IncrementalDedup.maybeCompact]] semantics,
    * same single-operator contract): compact when the vector index
    * holds more than `maxFilesPerBucket` files per occupied bucket;
    * returns true iff it compacted. */
  def maybeCompact(spark: SparkSession, storeDir: String,
      maxFilesPerBucket: Int = 32): Boolean = {
    recoverStore(spark, storeDir)
    val (files, dirs) = AtomicStore.filesPerDir(spark, s"$storeDir/vecs", "bucket")
    if (dirs == 0L || files <= maxFilesPerBucket * dirs) return false
    compactStore(spark, storeDir)
    true
  }

  def compactStore(spark: SparkSession, storeDir: String): Unit = {
    recoverStore(spark, storeDir)
    if (AtomicStore.exists(spark, s"$storeDir/vecs")) {
      val f = BucketFanout.target(spark, s"$storeDir/vecs")
      AtomicStore.swapIn(spark, storeDir, "vecs")(vecsRewrite(spark, f))
    }
    AtomicStore.swapIn(spark, storeDir, "radii") { (live, tmp) =>
      spark.read.parquet(live)
        .groupBy(col("cell")).agg(max(col("radius")).as("radius"))
        .coalesce(1).write.parquet(tmp)
    }
  }
}
