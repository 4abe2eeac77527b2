package graft.drive

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.streaming.{BucketFanout, IncrementalDedup}

/** End-to-end drive for the [[IncrementalDedup.maybeCompact]] policy
  * (VERDICT r17 item 5): the policy had unit pins (fires at the
  * threshold, no-op right after, decisions unchanged) but no
  * LONG-HORIZON evidence that a continuous ingest stays healthy under
  * it. Two phases:
  *
  * **Horizon** — `triggers` small admitBatch triggers over the same
  * pre-sliced batches, twice:
  *  - *compacted*: after every trigger, `maybeCompact(maxFiles)` runs
  *    in the ingest's own maintenance slot. Files/bucket must
  *    sawtooth — grow ~1 per trigger, reset at each compaction — and
  *    stay ≤ maxFiles + 1 forever (the small-files metadata tax
  *    bounded: at 100 TB, files/bucket is the number of open()s every
  *    probed bucket costs every trigger).
  *  - *control*: no compaction; files/bucket grows ≈ linearly with
  *    triggers. Admission parity across arms asserted per trigger.
  *
  * **Pre-pay** — the documented interaction with the size schedule:
  * grow a store past the 64→256 byte threshold while the schedule is
  * disabled, enable it (migration now PENDING), and (a) run a
  * maintenance-window `compactStore`: the rewrite lands at the
  * scheduled 256, and the next trigger's reconcile is a no-op — pinned
  * by the `_fanout` manifest mtime not moving across that trigger
  * (the round-18 reconcile skips the stamp when current); (b) on an
  * identical control store, skip the maintenance window: the next
  * ADMIT pays the migration mid-trigger. Both end at 256 with the
  * same admissions; (a) moves the rewrite seconds out of the ingest
  * path.
  *
  * Usage: Test/runMain graft.drive.CompactionHorizonDrive \
  *   [dir=/root/testdata/sf0.1] [triggers=50] [batch=100] [maxFiles=8] \
  *   [phase=all|horizon|prepay]
  */
object CompactionHorizonDrive {

  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val triggers = if (args.length > 1) args(1).toInt else 50
    val batch = if (args.length > 2) args(2).toLong else 100L
    val maxFiles = if (args.length > 3) args(3).toInt else 8
    val phase = if (args.length > 4) args(4) else "all"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val bytesRead = new java.util.concurrent.atomic.AtomicLong(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        if (t.taskMetrics != null)
          bytesRead.addAndGet(t.taskMetrics.inputMetrics.bytesRead)
    })

    def filesPerBucket(path: String): (Long, Long) = {
      val p = new org.apache.hadoop.fs.Path(path)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (!fs.exists(p)) return (0L, 0L)
      val dirs = fs.listStatus(p)
        .filter(s => s.isDirectory && s.getPath.getName.startsWith("bucket="))
      val files = dirs.map(d => fs.listStatus(d.getPath)
        .count(f => f.isFile && f.getPath.getName.endsWith(".parquet")).toLong).sum
      (files, dirs.length.toLong)
    }

    // pre-write each trigger's batch to its own dir so bytesRead
    // isolates STORE reads (the FanoutScaleDrive lesson)
    val w = Window.orderBy(col("doc_id"))
    val corpus = graft.ops.Tables.documents(spark, dir)
      .select((row_number().over(w) - 1).cast("long").as("rk"),
        col("doc_id"), col("text"))
      .localCheckpoint(true)
    val total = corpus.count()
    require(total >= triggers * batch,
      s"corpus has $total docs < ${triggers * batch} needed")
    val sliceRoot = java.nio.file.Files.createTempDirectory("compact-slices-").toString
    for (k <- 0 until triggers)
      corpus.filter(col("rk") >= k * batch && col("rk") < (k + 1) * batch)
        .select(col("doc_id"), col("text"))
        .coalesce(1).write.parquet(s"$sliceRoot/b$k")
    println(s"COMPACTHORIZON dir=$dir triggers=$triggers batch=$batch " +
      s"maxFiles=$maxFiles docs=$total")

    var ok = true
    case class Obs(sec: Double, readMb: Double, filesPerBucket: Double,
      compacted: Boolean, admitted: Set[Long])

    def admitSlice(k: Int, store: String): (Set[Long], Double, Double) = {
      val b = spark.read.parquet(s"$sliceRoot/b$k")
      val r0 = bytesRead.get()
      val t0 = System.nanoTime()
      val admitted = IncrementalDedup.admitBatch(b, "doc_id", "text", 0.8, store)
        .collect().map(_.getLong(0)).toSet
      ((System.nanoTime() - t0) / 1e9, (bytesRead.get() - r0) / 1e6) match {
        case (sec, mb) => (admitted, sec, mb)
      }
    }

    def run(compact: Boolean): Seq[Obs] = {
      // fixed 64 buckets for the horizon phase: the sawtooth is the
      // observable here, the size schedule gets its own phase below
      spark.conf.set(BucketFanout.GrowAt256Key, Long.MaxValue.toString)
      spark.conf.set(BucketFanout.GrowAt1024Key, Long.MaxValue.toString)
      val store = java.nio.file.Files.createTempDirectory(
        s"compact-${if (compact) "on" else "off"}-").toString
      val out = (0 until triggers).map { k =>
        val (admitted, sec, readMb) = admitSlice(k, store)
        val didCompact =
          compact && IncrementalDedup.maybeCompact(spark, store, maxFiles)
        val (files, dirs) = filesPerBucket(s"$store/bands")
        val fpb = if (dirs == 0) 0.0 else files.toDouble / dirs
        println(f"COMPACTHORIZON ${if (compact) "compacted" else "control"}%-9s " +
          f"trigger=$k%3d sec=$sec%5.2f readMB=$readMb%6.1f " +
          f"filesPerBucket=$fpb%6.2f" + (if (didCompact) " COMPACTED" else ""))
        Obs(sec, readMb, fpb, didCompact, admitted)
      }
      spark.conf.unset(BucketFanout.GrowAt256Key)
      spark.conf.unset(BucketFanout.GrowAt1024Key)
      out
    }

    if (phase != "prepay") {
    val compacted = run(compact = true)
    val control = run(compact = false)

    val parity = compacted.zip(control).zipWithIndex.count { case ((a, c), k) =>
      if (a.admitted != c.admitted) {
        println(s"COMPACTHORIZON PARITY FAIL trigger=$k " +
          s"missing=${(c.admitted -- a.admitted).take(5)} " +
          s"extra=${(a.admitted -- c.admitted).take(5)}")
        ok = false
      }
      a.admitted == c.admitted
    }
    val worstCompacted = compacted.map(_.filesPerBucket).max
    if (worstCompacted > maxFiles + 1) {
      println(f"COMPACTHORIZON BOUND FAIL: compacted files/bucket peaked at " +
        f"$worstCompacted%.2f > ${maxFiles + 1}")
      ok = false
    }
    val lastControl = control.last.filesPerBucket
    if (lastControl < maxFiles * 2) {
      println(f"COMPACTHORIZON CONTROL FAIL: control files/bucket only " +
        f"$lastControl%.2f after $triggers triggers — fixture too small to " +
        "exhibit the tax")
      ok = false
    }
    val nCompactions = compacted.count(_.compacted)
    println(f"COMPACTHORIZON summary parity=$parity/$triggers " +
      f"compactions=$nCompactions worstCompactedFPB=$worstCompacted%.2f " +
      f"controlFPB=$lastControl%.2f " +
      f"meanSecCompacted=${compacted.map(_.sec).sum / triggers}%.2f " +
      f"meanSecControl=${control.map(_.sec).sum / triggers}%.2f")
    }

    if (phase != "horizon") {
    // ---------- pre-pay phase ----------
    def buildPending(): String = {
      spark.conf.set(BucketFanout.GrowAt256Key, Long.MaxValue.toString)
      spark.conf.set(BucketFanout.GrowAt1024Key, Long.MaxValue.toString)
      val store = java.nio.file.Files.createTempDirectory("compact-prepay-").toString
      for (k <- 0 until math.min(10, triggers - 1))
        admitSlice(k, store)
      // enable the schedule below the store's current size: the
      // 64 -> 256 migration is now pending
      spark.conf.set(BucketFanout.GrowAt256Key, (64L << 10).toString)
      store
    }
    val pre = buildPending()
    require(IncrementalDedup.storeFanout(spark, pre) == 64)
    val tC = System.nanoTime()
    IncrementalDedup.compactStore(spark, pre)
    val prepaySec = (System.nanoTime() - tC) / 1e9
    if (IncrementalDedup.storeFanout(spark, pre) != 256) {
      println("COMPACTHORIZON PREPAY FAIL: maintenance compaction did not " +
        "rewrite at the scheduled fan-out")
      ok = false
    }
    val manifest = new java.io.File(s"$pre/bands/_fanout")
    val stamp = manifest.lastModified()
    val (_, postSec, _) = admitSlice(math.min(10, triggers - 1), pre)
    if (manifest.lastModified() != stamp) {
      println("COMPACTHORIZON PREPAY FAIL: post-compaction trigger re-entered " +
        "the manifest stamp — reconcile was not a no-op")
      ok = false
    }
    val ctl = buildPending()
    val (_, migrateSec, _) = admitSlice(math.min(10, triggers - 1), ctl)
    if (IncrementalDedup.storeFanout(spark, ctl) != 256) {
      println("COMPACTHORIZON PREPAY FAIL: control admit did not migrate")
      ok = false
    }
    spark.conf.unset(BucketFanout.GrowAt256Key)
    spark.conf.unset(BucketFanout.GrowAt1024Key)
    println(f"COMPACTHORIZON prepay maintenanceCompactSec=$prepaySec%.2f " +
      f"postCompactionTriggerSec=$postSec%.2f " +
      f"controlMigratingTriggerSec=$migrateSec%.2f " +
      "(the maintenance window absorbs the rewrite; the control pays it " +
      "inside the ingest trigger)")
    }
    spark.stop()
    if (!ok) sys.exit(1)
  }
}
