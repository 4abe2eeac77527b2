package graft.sources

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path}

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** O16 SubscribePattern + O6 backpressure coverage. */
class PatternAndRateSpec extends SparkTestBase {

  private def newRoot(): Path = Files.createTempDirectory("dis-pat-")

  private def fill(root: Path, stream: String, parts: Int, perPart: Int): Unit = {
    val client = new FileStreamClient(root)
    client.createStream(stream, parts)
    for (p <- 0 until parts; i <- 0 until perPart)
      client.append(stream, p, null, s"$stream-$p-$i".getBytes(UTF_8))
  }

  test("subscribePattern reads every matching stream, topic column distinguishes them") {
    val root = newRoot()
    fill(root, "clicks-eu", 2, 5)
    fill(root, "clicks-us", 1, 7)
    fill(root, "audit", 1, 3) // must NOT match
    val df = spark.read.format("dis")
      .option("client.root", root.toString)
      .option("subscribePattern", "clicks-.*")
      .load()
    val byTopic = df.groupBy("topic").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byTopic === Map("clicks-eu" -> 10L, "clicks-us" -> 7L))
  }

  test("subscribePattern with no matches fails with a helpful error") {
    val root = newRoot()
    fill(root, "audit", 1, 1)
    val e = intercept[Exception] {
      spark.read.format("dis")
        .option("client.root", root.toString)
        .option("subscribePattern", "nope-.*")
        .load().count()
    }
    assert(e.getMessage.contains("nope-.*") ||
      Option(e.getCause).exists(_.getMessage.contains("nope-.*")))
  }

  test("streaming offsets span multiple matched streams") {
    val root = newRoot()
    fill(root, "s-a", 1, 4)
    fill(root, "s-b", 2, 3)
    val stream = new DisMicroBatchStream(Dis.normalize(Map(
      "client.root" -> root.toString, "subscribePattern" -> "s-.*")))
    val end = DisSourceOffset.from(
      stream.latestOffset(stream.initialOffset(), stream.getDefaultReadLimit)).offsets
    assert(end === Map(("s-a", 0) -> 4L, ("s-b", 0) -> 3L, ("s-b", 1) -> 3L))
    stream.stop()
  }

  test("RateController: budget tracks observed throughput and smooths") {
    val rc = new RateController(targetTriggerMs = 1000L, alpha = 0.5)
    assert(rc.nextBudget(0L).isEmpty) // no observation yet
    rc.admitted(1000L, 0L)
    // 1000 records took 500ms -> 2 rec/ms -> budget 2000 for a 1s target
    assert(rc.nextBudget(500L) === Some(2000L))
    rc.admitted(2000L, 500L)
    // next trigger was slower: 2000 in 4000ms = 0.5 rec/ms; EWMA(0.5) of
    // (0.5, 2.0) = 1.25 -> budget 1250
    assert(rc.nextBudget(4500L) === Some(1250L))
  }

  test("RateController honors the floor and the initial-rate seed") {
    val seeded = new RateController(targetTriggerMs = 100L, initialRatePerSec = Some(50.0))
    assert(seeded.nextBudget(0L) === Some(5L)) // 50/s over 100ms
    val rc = new RateController(targetTriggerMs = 10L, minRecords = 7L)
    rc.admitted(1L, 0L)
    assert(rc.nextBudget(100000L) === Some(7L)) // tiny rate floors at minRecords
  }

  test("maxRecordsPerPartition splits a partition's range across tasks") {
    val root = newRoot()
    fill(root, "big", 2, 100)
    val df = spark.read.format("dis")
      .option("client.root", root.toString).option("stream", "big")
      .option("maxRecordsPerPartition", "30")
      .load()
    // ceil(100/30)=4 chunks per partition × 2 partitions
    assert(df.rdd.getNumPartitions === 8)
    assert(df.count() === 200)
    val offs = df.selectExpr("partition", "offset").collect()
      .groupBy(_.getInt(0)).view.mapValues(_.map(_.getLong(1)).sorted.toSeq).toMap
    assert(offs(0) === (0L until 100L)) // chunks tile the range exactly
    assert(offs(1) === (0L until 100L))
  }

  test("end-to-end: backpressure-enabled stream still drains exactly once") {
    val root = newRoot()
    fill(root, "bp", 2, 30)
    val out = Files.createTempDirectory("bp-out-").toString
    val q = spark.readStream.format("dis")
      .option("client.root", root.toString).option("stream", "bp")
      .option("maxRecordsPerTrigger", "25")
      .option("backpressureEnabled", "true")
      .option("targetTriggerMs", "200")
      .load()
      .selectExpr("cast(value as string) AS value")
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", Files.createTempDirectory("bp-ck-").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val vals = spark.read.parquet(out).collect().map(_.getString(0))
    assert(vals.length === 60)
    assert(vals.distinct.length === 60)
  }
}
