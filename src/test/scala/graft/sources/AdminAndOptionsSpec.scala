package graft.sources

import java.nio.file.Files
import java.util.concurrent.{CountDownLatch, TimeUnit}

import graft.SparkTestBase

/** DisAdmin (immediate commit / count / lag — reference CanCommitOffsets
  * + O(1)-count parity) and the loud rejection of reference options the
  * connector cannot honor. */
class AdminAndOptionsSpec extends SparkTestBase {

  private def freshRoot(parts: Int = 2, records: Int = 10): (String, FileStreamClient) = {
    val root = Files.createTempDirectory("admin-").toString
    val client = new FileStreamClient(java.nio.file.Paths.get(root))
    client.createStream("s", parts)
    (0 until records).foreach(i =>
      client.append("s", i % parts, null, s"v$i".getBytes("UTF-8")))
    (root, client)
  }

  private def opts(root: String, more: (String, String)*): Map[String, String] =
    (Map("client.root" -> root, "stream" -> "s", "groupId" -> "g1") ++ more).toMap

  test("commitNow applies immediately, outside any trigger, and is readable back") {
    val (root, client) = freshRoot()
    DisAdmin.commitNow(opts(root), Map(("s", 0) -> 3L, ("s", 1) -> 2L))
    assert(DisAdmin.committed(opts(root), "s") === Map(0 -> 3L, 1 -> 2L))
    assert(client.committed("s", "g1") === Map(0 -> 3L, 1 -> 2L))
    // a later commit for one partition merges, not replaces
    DisAdmin.commitNow(opts(root), """{"s":{"0":5}}""")
    assert(DisAdmin.committed(opts(root), "s") === Map(0 -> 5L, 1 -> 2L))
  }

  test("commitAsync completes on the daemon thread and reports success") {
    val (root, _) = freshRoot()
    val latch = new CountDownLatch(1)
    @volatile var ok = false
    DisAdmin.commitAsync(opts(root), Map(("s", 1) -> 4L), { t =>
      ok = t.isSuccess; latch.countDown()
    })
    assert(latch.await(10, TimeUnit.SECONDS), "commitAsync callback never fired")
    assert(ok)
    assert(DisAdmin.committed(opts(root), "s") === Map(1 -> 4L))
  }

  test("commitOnNextTrigger queues now, drains at the next trigger: " +
      "max untilOffset per partition, empty ranges skipped, last callback wins") {
    import org.apache.spark.sql.streaming.Trigger
    val (root, _) = freshRoot(parts = 2, records = 10)
    val o = opts(root)

    // enqueue BEFORE any query runs: two overlapping ranges for p0 (max
    // untilOffset 4 must win), an empty range for p1 (no progress — must
    // NOT produce a commit), then a second call whose callback replaces
    // the first (reference: only the most recent callback fires)
    DisAdmin.commitOnNextTrigger(o, Seq(
      OffsetRange("s", 0, 0L, 2L), OffsetRange("s", 0, 1L, 4L),
      OffsetRange("s", 1, 3L, 3L)),
      _ => fail("superseded callback must not fire"))
    @volatile var result: Option[scala.util.Try[Unit]] = None
    DisAdmin.commitOnNextTrigger(o, Seq(OffsetRange("s", 1, 0L, 1L)),
      t => result = Some(t))

    // nothing committed until a trigger drains the queue
    assert(DisAdmin.committed(o, "s") === Map.empty)

    val q = spark.readStream.format("dis")
      .option("client.root", root).option("stream", "s")
      .option("groupId", "g1").option("startingOffsets", "earliest")
      // several micro-batches: Spark delivers source.commit(n) while
      // planning batch n+1, so the queue drains mid-run — matching the
      // reference, whose drain also happens at the NEXT compute()
      .option("maxRecordsPerTrigger", "3")
      .load()
      .writeStream.format("noop")
      .option("checkpointLocation", Files.createTempDirectory("qc-ck-").toString)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    assert(result.exists(_.isSuccess), "drain callback never fired or failed")
    // p0: max(2, 4) = 4; p1: the empty (3,3] range dropped, (0,1] applied
    assert(DisAdmin.committed(o, "s") === Map(0 -> 4L, 1 -> 1L))
    // queue is drained: another trigger with nothing enqueued changes nothing
    DisAdmin.commitNow(o, Map(("s", 1) -> 2L))
    assert(DisAdmin.committed(o, "s") === Map(0 -> 4L, 1 -> 2L))
  }

  test("count is exact offset algebra: full backlog, explicit and sentinel ranges") {
    val (root, _) = freshRoot(parts = 2, records = 10) // 5 records per partition
    assert(DisAdmin.count(opts(root)) === 10L)
    assert(DisAdmin.count(opts(root,
      "offsetRanges" -> """{"s":{"0":[1,4],"1":[0,2]}}""")) === 5L)
    // [earliest,-1] sentinel = everything in partition 0
    assert(DisAdmin.count(opts(root,
      "offsetRanges" -> """{"s":{"0":[-2,-1]}}""")) === 5L)
  }

  test("countApprox returns the exact count as a final degenerate bound " +
      "(reference parity: offset algebra dominates any timed approximation)") {
    val (root, _) = freshRoot(parts = 2, records = 10)
    val b = DisAdmin.countApprox(opts(root), timeoutMs = 1L, confidence = 0.5)
    assert(b === DisAdmin.BoundedCount(10.0, 1.0, 10.0, 10.0))
    // range-scoped variant flows through the same offset algebra
    val r = DisAdmin.countApprox(opts(root,
      "offsetRanges" -> """{"s":{"0":[1,4]}}"""), timeoutMs = 0L)
    assert(r === DisAdmin.BoundedCount(3.0, 1.0, 3.0, 3.0))
    intercept[IllegalArgumentException](
      DisAdmin.countApprox(opts(root), timeoutMs = 1L, confidence = 1.5))
  }

  test("lag = latest - committed; uncommitted partitions lag the full backlog") {
    val (root, _) = freshRoot(parts = 2, records = 10)
    assert(DisAdmin.lag(opts(root), "s") === Map(0 -> 5L, 1 -> 5L))
    DisAdmin.commitNow(opts(root), Map(("s", 0) -> 3L))
    assert(DisAdmin.lag(opts(root), "s") === Map(0 -> 2L, 1 -> 5L))
  }

  test("unsupported reference options are rejected by name at table construction") {
    val (root, _) = freshRoot()
    Dis.unsupportedOptions.foreach { key =>
      val e = intercept[IllegalArgumentException] {
        spark.read.format("dis")
          .option("client.root", root).option("stream", "s")
          .option(key, "anything")
          .load()
      }
      assert(e.getMessage.contains(key), s"error does not name '$key': ${e.getMessage}")
      assert(e.getMessage.contains("unsupported option"), e.getMessage)
    }
    // case-insensitive like every other connector option
    val e = intercept[IllegalArgumentException] {
      spark.read.format("dis")
        .option("client.root", root).option("stream", "s")
        .option("Body.Serialize.Type", "protobuf")
        .load()
    }
    assert(e.getMessage.contains("body.serialize.type"), e.getMessage)
  }

  test("boolean feature flags at their disabled default are accepted (no-op, not an error)") {
    val (root, _) = freshRoot()
    val df = spark.read.format("dis")
      .option("client.root", root).option("stream", "s")
      .option("data.encrypt.enabled", "false")
      .option("trusted.jks.enabled", "no")
      .load()
    assert(df.count() === 10L)
    val e = intercept[IllegalArgumentException] {
      spark.read.format("dis")
        .option("client.root", root).option("stream", "s")
        .option("data.encrypt.enabled", "true")
        .load()
    }
    assert(e.getMessage.contains("data.encrypt.enabled"), e.getMessage)
  }

  test("manual-commit migration pattern: foreachBatch + commitNow tracks progress") {
    // the reference demo's canonical loop — foreachRDD { offsetRanges;
    // commitAsync } — rebuilt as foreachBatch committing each batch's
    // max offset + 1 per partition, with commitOnTrigger OFF
    import org.apache.spark.sql.functions._
    val (root, _) = freshRoot(parts = 2, records = 30)
    val o = opts(root)
    val q = spark.readStream.format("dis")
      .option("client.root", root).option("stream", "s")
      .option("maxRecordsPerTrigger", "10")
      .load()
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val ends = batch.groupBy(col("partition"))
          .agg(max(col("offset")).as("o")).collect()
          .map(r => ("s", r.getInt(0)) -> (r.getLong(1) + 1L)).toMap
        if (ends.nonEmpty) DisAdmin.commitNow(o, ends)
        ()
      }
      .option("checkpointLocation",
        Files.createTempDirectory("ck-manualcommit-").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    // after draining, the group's committed offsets equal the log end
    assert(DisAdmin.committed(o, "s") === Map(0 -> 15L, 1 -> 15L))
    assert(DisAdmin.lag(o, "s") === Map(0 -> 0L, 1 -> 0L))
  }

  test("PreferFixed location strategy: fixed hosts win, others fall back to consistent") {
    val fixed = Offsets.partitionHosts("""{"s":{"0":"host-a","1":"host-b"}}""")
    val hosts = Array("e1", "e2", "e3")
    assert(ExecutorLocator.preferredFor("s", 0, hosts, fixed).toSeq === Seq("host-a"))
    assert(ExecutorLocator.preferredFor("s", 1, hosts, fixed).toSeq === Seq("host-b"))
    // unmapped partition: consistent-hash pick from the executor list
    val fallback = ExecutorLocator.preferredFor("s", 2, hosts, fixed)
    assert(fallback.length === 1 && hosts.contains(fallback.head))
    // deterministic across calls
    assert(fallback.toSeq === ExecutorLocator.preferredFor("s", 2, hosts, fixed).toSeq)
    // end-to-end: the option flows into batch planning without error
    val (root, _) = freshRoot()
    val df = spark.read.format("dis")
      .option("client.root", root).option("stream", "s")
      .option("preferFixed", """{"s":{"0":"host-a"}}""")
      .load()
    assert(df.count() === 10L)
    intercept[IllegalArgumentException](Offsets.partitionHosts("not json"))
  }

  test("supported options still pass validation untouched") {
    val (root, _) = freshRoot()
    val df = spark.read.format("dis")
      .option("client.root", root).option("stream", "s")
      .option("maxRecordsPerPartition", "2")
      .load()
    assert(df.count() === 10L)
  }
}
