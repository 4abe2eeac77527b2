package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

import graft.SparkTestBase
import graft.sources.FileStreamClient

/** Incremental (micro-batch) near-dup dedup against accumulated
  * history: admitted docs form the store; later arrivals that near-dup
  * ANY admitted doc are rejected — across batch boundaries, through a
  * real dis-source stream. */
class IncrementalDedupSpec extends SparkTestBase {

  // 20-word base docs; a near-dup appends one word (19 of 20 shared
  // 3-shingles ⇒ Jaccard 18/19 ≈ 0.95 ≥ 0.8), distinct docs share
  // nothing
  private val baseA = (1 to 20).map(i => s"a$i").mkString(" ")
  private val baseB = (1 to 20).map(i => s"b$i").mkString(" ")
  private val docs = Seq(
    1L -> baseA,            // batch 1: canonical A
    2L -> (baseA + " ax"),  // batch 1: within-batch dup of A → cluster keeper drops it
    3L -> baseB,            // batch 1: canonical B
    4L -> (baseA + " ay"),  // batch 2: history dup of A → rejected by store
    5L -> (1 to 20).map(i => s"c$i").mkString(" "), // batch 2: novel C
    6L -> (baseB + " by")   // batch 2: history dup of B → rejected by store
  )

  test("streamed batches admit one canonical doc per duplicate family, " +
      "rejecting later near-dups against the persisted store") {
    val root = Files.createTempDirectory("incdedup-")
    val client = new FileStreamClient(root)
    client.createStream("docs", 1) // one partition ⇒ deterministic batch split
    docs.foreach { case (id, text) =>
      client.append("docs", 0, null,
        s"""{"doc_id":$id,"text":"$text"}""".getBytes("UTF-8"))
    }
    val store = Files.createTempDirectory("incdedup-store-").toString

    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    val q = spark.readStream.format("dis")
      .option("client.root", root.toString).option("stream", "docs")
      .option("startingOffsets", "earliest")
      .option("maxRecordsPerTrigger", "3") // docs 1-3 then 4-6
      .load()
      .select(from_json(col("value").cast("string"), schema).as("d"))
      .select(col("d.*"))
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        IncrementalDedup.admitBatch(batch, "doc_id", "text", 0.8, store)
        ()
      }
      .option("checkpointLocation", Files.createTempDirectory("incdedup-ck-").toString)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(180000)

    val admitted = IncrementalDedup.admittedDocs(spark, store)
      .collect().map(_.getLong(0)).toSet
    assert(admitted === Set(1L, 3L, 5L),
      s"admitted $admitted — expected canonical A, B and novel C only")

    // invariant: no two ADMITTED docs are verified near-dups
    val admittedPairs = graft.api.Graft.minhashDupes(
      IncrementalDedup.admittedDocs(spark, store), "doc_id", "text", 0.8).count()
    assert(admittedPairs === 0L, "store contains a near-dup pair")

    // band index stays consistent with the docs store
    val bandDocs = spark.read.parquet(s"$store/bands")
      .select("doc_id").distinct().collect().map(_.getLong(0)).toSet
    assert(bandDocs === admitted, "band index out of sync with docs store")

    // a replayed batch is a no-op: every doc self-matches the store
    val replay = IncrementalDedup.admitBatch(
      spark.createDataFrame(docs.take(3).map(d => (d._1, d._2))).toDF("doc_id", "text"),
      "doc_id", "text", 0.8, store)
    assert(replay.count() === 0L, "replay re-admitted docs")
    assert(IncrementalDedup.admittedDocs(spark, store).count() === 3L)
  }

  test("a restarted stream resumes from its checkpoint and keeps rejecting " +
      "against the store built before the restart") {
    val root = Files.createTempDirectory("incdedup-rs-")
    val client = new FileStreamClient(root)
    client.createStream("docs", 1)
    val store = Files.createTempDirectory("incdedup-rs-store-").toString
    val ck = Files.createTempDirectory("incdedup-rs-ck-").toString

    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    def runOnce(): Unit = {
      val q = spark.readStream.format("dis")
        .option("client.root", root.toString).option("stream", "docs")
        .option("startingOffsets", "earliest")
        .option("maxRecordsPerTrigger", "2")
        .load()
        .select(from_json(col("value").cast("string"), schema).as("d"))
        .select(col("d.*"))
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          IncrementalDedup.admitBatch(batch, "doc_id", "text", 0.8, store)
          ()
        }
        .option("checkpointLocation", ck)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination(180000)
    }

    def feed(id: Long, text: String): Unit =
      client.append("docs", 0, null, s"""{"doc_id":$id,"text":"$text"}""".getBytes("UTF-8"))

    // run 1: admit A and B
    feed(1L, baseA); feed(2L, baseB)
    runOnce()
    assert(IncrementalDedup.admittedDocs(spark, store)
      .collect().map(_.getLong(0)).toSet === Set(1L, 2L))

    // run 2 (the restart): near-dups of A and B plus a novel doc arrive;
    // the resumed query must not re-read offsets 0-1 and must reject the
    // dups against the store persisted by run 1
    feed(3L, baseA + " az"); feed(4L, (1 to 20).map(i => s"d$i").mkString(" "))
    feed(5L, baseB + " bz")
    runOnce()
    assert(IncrementalDedup.admittedDocs(spark, store)
      .collect().map(_.getLong(0)).toSet === Set(1L, 2L, 4L))

    // compaction: identical content, fewer files, admission still works
    def parquetFiles(sub: String): Int = IncrementalDedupSpec.walkParquet(s"$store/$sub").size
    val beforeDocs = parquetFiles("docs")
    val beforeBands = parquetFiles("bands")
    IncrementalDedup.compactStore(spark, store, parts = 1)
    // docs AND bands collapse to ONE file per non-empty bucket
    // directory (the pruned-read-optimal layout; docs are dbucket-
    // partitioned since the round-17 candidate-fetch pruning)
    val bucketDirs = new java.io.File(s"$store/bands").listFiles()
      .count(f => f.isDirectory && f.getName.startsWith("bucket="))
    val docBucketDirs = new java.io.File(s"$store/docs").listFiles()
      .count(f => f.isDirectory && f.getName.startsWith("dbucket="))
    assert(parquetFiles("docs") === docBucketDirs && parquetFiles("bands") === bucketDirs,
      s"docs ${parquetFiles("docs")} (was $beforeDocs) over $docBucketDirs dbuckets, " +
        s"bands ${parquetFiles("bands")} over $bucketDirs buckets (was $beforeBands)")
    assert(parquetFiles("bands") <= beforeBands)
    assert(IncrementalDedup.admittedDocs(spark, store)
      .collect().map(_.getLong(0)).toSet === Set(1L, 2L, 4L))
    // rejection against the compacted band index still works
    val post = IncrementalDedup.admitBatch(
      spark.createDataFrame(Seq((9L, baseA + " aq"))).toDF("doc_id", "text"),
      "doc_id", "text", 0.8, store)
    assert(post.count() === 0L, "compacted store failed to reject a near-dup")
  }

  test("streaming crawl ingest: HTML extract → code routing → near-dup " +
      "admission composes per micro-batch against the persisted store") {
    // Raw pages: families share extracted BODY text while differing in
    // script/comment blocks (the dup is only visible AFTER extraction);
    // one page is code and must be routed out before admission.
    val bodyA = (1 to 20).map(i => s"a$i").mkString(" ")
    val bodyB = (1 to 20).map(i => s"b$i").mkString(" ")
    def page(id: Long, body: String) =
      s"<html><!-- crawl $id --><head><script>var p = $id;</script></head>" +
        s"<body><p>$body</p></body></html>"
    val pages = Seq(
      1L -> page(1, bodyA),            // batch 1: canonical A
      2L -> page(2, bodyA + " ax"),    // batch 1: extracted near-dup of A
      3L -> page(3, bodyB),            // batch 1: canonical B
      4L -> page(4, "x = 1; y = 2; z = 3;"), // batch 2: code → routed out
      5L -> page(5, bodyB + " bx"),    // batch 2: history near-dup of B
      6L -> page(6, (1 to 20).map(i => s"c$i").mkString(" "))) // batch 2: novel

    val root = Files.createTempDirectory("crawl-ingest-")
    val client = new FileStreamClient(root)
    client.createStream("pages", 1)
    pages.foreach { case (id, html) =>
      client.append("pages", 0, null,
        s"""{"page_id":$id,"html":"${html.replace("\"", "\\\"")}"}""".getBytes("UTF-8"))
    }
    val store = Files.createTempDirectory("crawl-ingest-store-").toString

    val schema = StructType(Seq(
      StructField("page_id", LongType), StructField("html", StringType)))
    val q = spark.readStream.format("dis")
      .option("client.root", root.toString).option("stream", "pages")
      .option("startingOffsets", "earliest")
      .option("maxRecordsPerTrigger", "3")
      .load()
      .select(from_json(col("value").cast("string"), schema).as("d"))
      .select(col("d.*"))
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        // the batch-level shape of the crawl chain: extract, route
        // code away, admit prose against all prior history
        val text = graft.api.Graft.htmlExtract(batch, "page_id", "html")
        val prose = text.join(
          graft.api.Graft.codeDetect(text, "page_id", "text")
            .filter(col("is_code") === 0L).select("page_id"),
          "page_id")
        IncrementalDedup.admitBatch(prose, "page_id", "text", 0.8, store)
        ()
      }
      .option("checkpointLocation", Files.createTempDirectory("crawl-ingest-ck-").toString)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(180000)

    val admitted = IncrementalDedup.admittedDocs(spark, store)
      .collect().map(_.getLong(0)).toSet
    assert(admitted === Set(1L, 3L, 6L),
      s"admitted $admitted — expected canonical A, canonical B, novel C")
    // the admitted store holds EXTRACTED text (no markup survived)
    val texts = IncrementalDedup.admittedDocs(spark, store)
      .collect().map(_.getString(1))
    assert(texts.forall(t => !t.contains("<") && !t.contains("crawl")),
      s"markup leaked into the store: ${texts.toSeq}")
  }

  private def doc(i: Long, prefix: String): (Long, String) =
    i -> (1 to 20).map(j => s"$prefix${i}w$j").mkString(" ")

  private def admit(pairs: Seq[(Long, String)], store: String) =
    IncrementalDedup.admitBatch(
      spark.createDataFrame(pairs).toDF("doc_id", "text"),
      "doc_id", "text", 0.8, store)

  test("a batch's band-index read is pruned to its own bucket directories " +
      "(strict subset of files, admission decisions unchanged)") {
    import graft.ops.DedupQueries
    val store = Files.createTempDirectory("incdedup-prune-").toString
    // seed 3 batches × 15 distinct docs → band files spread over many buckets
    admit((1L to 15L).map(doc(_, "p")), store)
    admit((16L to 30L).map(doc(_, "q")), store)
    admit((31L to 45L).map(doc(_, "r")), store)
    val bandsPath = s"$store/bands"
    val allFiles = IncrementalDedupSpec.walkParquet(bandsPath)
    assert(allFiles.size > 40, s"seed store too small to prove pruning: ${allFiles.size}")

    // the probe batch: one near-dup of doc 1 — its band rows hit ≤ Bands buckets
    val probe = spark.createDataFrame(Seq(doc(1L, "p")._1 -> (doc(1L, "p")._2 + " x")))
      .toDF("doc_id", "text")
    val probeBuckets = DedupQueries.bandsOf(
        DedupQueries.signatures(probe, "doc_id", "text"))
      .select(pmod(col("bandhash"), lit(IncrementalDedup.BandBuckets.toLong)).cast("int"))
      .distinct().collect().map(_.getInt(0)).toSeq

    // the exact scan admitBatch plans for this batch: execute it and read
    // the physical scan's numFiles metric
    val scan = IncrementalDedup.bandIndexScan(spark, bandsPath, probeBuckets)
    scan.collect()
    val filesRead = IncrementalDedupSpec.scannedFiles(scan)
    val expected = probeBuckets.map(b =>
      IncrementalDedupSpec.walkParquet(s"$bandsPath/bucket=$b").size).sum
    assert(filesRead === expected,
      s"scan read $filesRead files, bucket dirs hold $expected")
    assert(filesRead > 0 && filesRead < allFiles.size,
      s"not a strict subset: $filesRead of ${allFiles.size}")

    // admission decisions unchanged by pruning: the near-dup is rejected
    // against history, a novel doc is admitted
    val out = admit(Seq(100L -> (doc(1L, "p")._2 + " x"), 101L -> doc(101L, "z")._2), store)
    assert(out.collect().map(_.getLong(0)).toSet === Set(101L),
      "pruned index changed admission decisions")
  }

  test("appending to a pre-bucketing store (flat band files) migrates the " +
      "layout instead of bricking partition discovery") {
    import graft.ops.DedupQueries
    val store = Files.createTempDirectory("incdedup-flat-").toString
    // seed the store the way the pre-bucketing code did: docs/ plain,
    // bands/ as FLAT parquet at the root, no bucket column
    val seed = (1L to 10L).map(doc(_, "f"))
    val seedDf = spark.createDataFrame(seed).toDF("doc_id", "text")
    seedDf.write.parquet(s"$store/docs")
    DedupQueries.bandsOf(DedupQueries.signatures(seedDf, "doc_id", "text"))
      .write.parquet(s"$store/bands")
    assert(new java.io.File(s"$store/bands").listFiles()
      .exists(f => f.isFile && f.getName.endsWith(".parquet")),
      "seed store is not flat — test setup broken")

    // the upgrade-boundary batch: a near-dup of seeded doc 1 plus a novel doc
    val out = admit(Seq(90L -> (doc(1L, "f")._2 + " x"), 91L -> doc(91L, "n")._2), store)
    assert(out.collect().map(_.getLong(0)).toSet === Set(91L),
      "admission decisions wrong across the layout migration")

    // the store must still be readable (the bricking failure mode is
    // 'Conflicting directory structures' on this exact read) and fully
    // bucketed: no flat parquet left at the root
    val bandDocs = spark.read.parquet(s"$store/bands")
      .select("doc_id").distinct().collect().map(_.getLong(0)).toSet
    assert(bandDocs === (1L to 10L).toSet + 91L, s"band index lost rows: $bandDocs")
    assert(!new java.io.File(s"$store/bands").listFiles()
      .exists(f => f.isFile && f.getName.endsWith(".parquet")),
      "flat files survived next to bucket= dirs")

    // and later batches keep working against the migrated layout
    val later = admit(Seq(92L -> (doc(91L, "n")._2 + " y"), 93L -> doc(93L, "m")._2), store)
    assert(later.collect().map(_.getLong(0)).toSet === Set(93L))
  }

  test("a compaction crash at any point leaves a store that serves identical " +
      "admission decisions (self-recovery)") {
    val fsRoot = Files.createTempDirectory("incdedup-crash-").toString
    admit(Seq(doc(1L, "a"), doc(2L, "b")), fsRoot)
    val dupOf1 = Seq(50L -> (doc(1L, "a")._2 + " t"))

    // crash point 1: rewrite finished, swap not started → stale __compact_*
    // dirs next to an intact live store
    val fs = new org.apache.hadoop.fs.Path(fsRoot)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    spark.read.parquet(s"$fsRoot/docs").write.parquet(s"$fsRoot/__compact_docs")
    spark.read.parquet(s"$fsRoot/bands").write.parquet(s"$fsRoot/__compact_bands")
    assert(admit(dupOf1, fsRoot).count() === 0L, "near-dup admitted after crash point 1")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$fsRoot/__compact_docs")),
      "stale compaction artifact not cleaned")
    // a fresh compaction over the recovered store succeeds
    IncrementalDedup.compactStore(spark, fsRoot, parts = 1)
    assert(admit(dupOf1, fsRoot).count() === 0L)

    // crash point 2: between the two renames — live dir moved aside,
    // rewrite never swapped in (the data-loss window)
    require(fs.rename(new org.apache.hadoop.fs.Path(s"$fsRoot/bands"),
      new org.apache.hadoop.fs.Path(s"$fsRoot/__old_bands")))
    assert(admit(dupOf1, fsRoot).count() === 0L,
      "near-dup admitted: band index lost in the rename window")
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$fsRoot/bands")), "live bands not restored")

    // same window for docs/: admitted corpus must survive
    require(fs.rename(new org.apache.hadoop.fs.Path(s"$fsRoot/docs"),
      new org.apache.hadoop.fs.Path(s"$fsRoot/__old_docs")))
    assert(IncrementalDedup.admittedDocs(spark, fsRoot)
      .collect().map(_.getLong(0)).toSet === Set(1L, 2L))
  }

  test("a legacy store bucketed at a HIGHER fan-out (no manifest) is " +
      "detected from its dirs: history witnesses in dirs >= 64 are still " +
      "probed and their near-dups rejected") {
    import graft.ops.DedupQueries
    // the ADVICE r16 regression: a store written when the fan-out
    // constant was 256 has bucket dirs up to 255; probing it with
    // mod-64 bucket values never scans dirs >= 64, so a doc whose ONLY
    // shared-band witnesses live there is silently re-admitted. Build
    // that store exactly: one admitted doc whose band index contains
    // ONLY its dirs->=64 rows (admission needs one witness; verify
    // re-shingles the full text).
    val store = Files.createTempDirectory("incdedup-legacy-").toString
    val seed = spark.createDataFrame(Seq(doc(1L, "g"))).toDF("doc_id", "text")
    seed.write.parquet(s"$store/docs")
    val highBands = DedupQueries.bandsOf(
        DedupQueries.signatures(seed, "doc_id", "text"))
      .withColumn("bucket", pmod(col("bandhash"), lit(256L)).cast("int"))
      .filter(col("bucket") >= 64)
    assert(highBands.count() > 0, "fixture vacuous: no band landed in a dir >= 64")
    highBands.repartition(col("bucket"))
      .write.partitionBy("bucket").parquet(s"$store/bands")

    val detected = IncrementalDedup.storeFanout(spark, store)
    val maxDir = new java.io.File(s"$store/bands").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("bucket="))
      .map(_.getName.stripPrefix("bucket=").toInt).max
    assert(detected >= maxDir + 1 && Integer.bitCount(detected) === 1 &&
      detected >= IncrementalDedup.BandBuckets,
      s"detected fan-out $detected does not cover max dir $maxDir")

    // near-dup of the seeded doc + a novel doc: pre-fix code admits BOTH
    // (all witnesses live in unprobed dirs); fixed code rejects the dup
    val out = admit(Seq(2L -> (doc(1L, "g")._2 + " zz"), 3L -> doc(3L, "h")._2), store)
    assert(out.collect().map(_.getLong(0)).toSet === Set(3L),
      "near-dup re-admitted: legacy high-fan-out dirs were not probed")
    // the store is now stamped and stays at the detected fan-out
    assert(IncrementalDedup.storeFanout(spark, store) === detected)
    // appended rows bucket consistently: every dir value is the row's
    // own bandhash mod the detected fan-out
    val bad = spark.read.parquet(s"$store/bands")
      .filter(col("bucket") =!= pmod(col("bandhash"), lit(detected.toLong)).cast("int"))
      .count()
    assert(bad === 0L, s"$bad band rows in dirs inconsistent with fan-out $detected")
  }

  test("maybeCompact: fires once files-per-bucket crosses the policy " +
      "threshold, is a no-op right after, decisions unchanged") {
    val store = Files.createTempDirectory("incdedup-policy-").toString
    for (i <- 0 until 4) admit(Seq(doc(10L * i + 1, s"mc$i")), store)
    val (files0, dirs0) = AtomicStore.filesPerDir(spark, s"$store/bands", "bucket")
    assert(files0 > dirs0, s"fixture vacuous: $files0 files over $dirs0 dirs")
    assert(IncrementalDedup.maybeCompact(spark, store, maxFilesPerBucket = 1),
      "policy did not fire above threshold")
    // compaction ends at one file per non-empty bucket → immediately quiet
    assert(!IncrementalDedup.maybeCompact(spark, store, maxFilesPerBucket = 1),
      "policy re-fired on a just-compacted store")
    // decisions unchanged: a near-dup of a pre-compaction doc still rejects
    assert(admit(Seq(99L -> (doc(1L, "mc0")._2 + " x")), store).count() === 0L,
      "compacted store lost rejection power")
  }

  test("size-adaptive fan-out growth: admission decisions identical across " +
      "a 64 -> 256 migration, cross-boundary history still rejects") {
    val fixed = Files.createTempDirectory("incdedup-fixed-").toString
    val adaptive = Files.createTempDirectory("incdedup-adapt-").toString
    val b1 = Seq(doc(1L, "p"), 2L -> (doc(1L, "p")._2 + " ax"), doc(3L, "q"))
    val b2 = Seq(4L -> (doc(1L, "p")._2 + " ay"), doc(5L, "r"))
    val b3 = Seq(6L -> (doc(3L, "q")._2 + " by"), doc(7L, "s"))
    def run(store: String): Seq[Set[Long]] =
      Seq(b1, b2, b3).map(b => admit(b, store).collect().map(_.getLong(0)).toSet)

    val control = run(fixed) // default thresholds: stays at 64
    try {
      // 1-byte threshold: batch 1 creates the store at 64 (empty store
      // schedules Base), batch 2's reconcile sees bytes >= 1 and grows
      spark.conf.set(BucketFanout.GrowAt256Key, "1")
      val grown = run(adaptive)
      assert(grown === control,
        s"admission diverged across the migration: $grown vs $control")
      assert(IncrementalDedup.storeFanout(spark, adaptive) === 256,
        "adaptive store did not migrate")
      assert(IncrementalDedup.storeFanout(spark, fixed) === 64)
      // batch-1 history (written at 64, re-bucketed to 256) still
      // rejects: replayed batch-1 docs self-match post-migration
      assert(admit(b1.map { case (i, t) => (i + 100L, t) }, adaptive).count() === 0L,
        "pre-migration history lost its rejection power")
      // growth is monotonic: removing the override cannot shrink 256
      spark.conf.unset(BucketFanout.GrowAt256Key)
      admit(Seq(doc(50L, "z")), adaptive)
      assert(IncrementalDedup.storeFanout(spark, adaptive) === 256,
        "fan-out shrank after the threshold override was removed")
    } finally spark.conf.unset(BucketFanout.GrowAt256Key)
  }
}

object IncrementalDedupSpec {
  /** All parquet files under `dir`, recursively (bands/ is directory-
    * partitioned, so a flat listing sees only bucket dirs). */
  def walkParquet(dir: String): Seq[java.io.File] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.flatMap(walk)
      else if (f.getName.endsWith(".parquet")) Seq(f)
      else Nil
    walk(new java.io.File(dir))
  }

  /** Sum of the `numFiles` metric over the executed plan's file scans —
    * the count AFTER partition pruning (descends through AQE). */
  def scannedFiles(df: org.apache.spark.sql.DataFrame): Long = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case f: FileSourceScanExec => Seq(f)
      case other => other.children.flatMap(scans)
    }
    scans(df.queryExecution.executedPlan).map(_.metrics("numFiles").value).sum
  }
}
