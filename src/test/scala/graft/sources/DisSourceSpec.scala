package graft.sources

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkTestBase

/** End-to-end DSv2 connector tests over the FileStreamClient fake:
  * batch reads with explicit/sentinel ranges (O1/O2), the sink (O22),
  * micro-batch streaming with admission control (O4/O6), checkpoint
  * replay (O18 analog — Structured Streaming WAL), partition
  * elasticity (O5), commit-on-trigger (O17). */
class DisSourceSpec extends SparkTestBase {

  private def newRoot(): Path = Files.createTempDirectory("dis-test-")

  private def fill(root: Path, stream: String, parts: Int, perPart: Int): FileStreamClient = {
    val client = new FileStreamClient(root)
    client.createStream(stream, parts)
    for (p <- 0 until parts; i <- 0 until perPart)
      client.append(stream, p, s"k$p-$i".getBytes(UTF_8), s"v$p-$i".getBytes(UTF_8))
    client
  }

  private def read(root: Path, extra: (String, String)*) = {
    val r = spark.read.format("dis")
      .option("client.root", root.toString).option("stream", "s")
    extra.foldLeft(r) { case (acc, (k, v)) => acc.option(k, v) }.load()
  }

  test("batch read: full stream via earliest/latest defaults") {
    val root = newRoot()
    fill(root, "s", parts = 3, perPart = 10)
    val df = read(root)
    assert(df.count() === 30)
    assert(df.schema.fieldNames.toSeq ===
      Seq("key", "value", "topic", "partition", "offset", "timestamp"))
    val row = df.selectExpr("cast(value as string)", "topic", "partition", "offset")
      .where("partition = 1 and offset = 3").collect()
    assert(row.map(_.getString(0)).toSeq === Seq("v1-3"))
  }

  test("batch read: explicit offsetRanges JSON with sentinels, half-open") {
    val root = newRoot()
    fill(root, "s", parts = 2, perPart = 10)
    val df = read(root, "offsetRanges" -> """{"s":{"0":[2,5],"1":[-2,-1]}}""")
    val byPart = df.groupBy("partition").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(byPart === Map(0 -> 3, 1 -> 10)) // [2,5) = 3 records; full p1
    val offsets = df.where("partition = 0").select("offset").collect().map(_.getLong(0)).sorted
    assert(offsets.toSeq === Seq(2L, 3L, 4L)) // until exclusive
  }

  test("batch read plans one partition per stream partition, empty ranges dropped") {
    val root = newRoot()
    val client = fill(root, "s", parts = 4, perPart = 5)
    client.createStream("s", 5) // p4 exists but is empty
    val df = read(root)
    assert(df.rdd.getNumPartitions === 4) // empty p4 planned away
  }

  test("sink: batch write with key-hash partitioning, then read back") {
    val root = newRoot()
    new FileStreamClient(root).createStream("out", 3)
    import spark.implicits._
    (0 until 30).map(i => (s"key$i", s"val$i")).toDF("key", "value")
      .write.format("dis")
      .option("client.root", root.toString).option("stream", "out").mode("append").save()
    val back = spark.read.format("dis")
      .option("client.root", root.toString).option("stream", "out").load()
    assert(back.count() === 30)
    assert(back.selectExpr("cast(value as string)").as[String].collect().toSet ===
      (0 until 30).map(i => s"val$i").toSet)
    // same key always lands in the same partition
    val parts = back.selectExpr("cast(key as string) k", "partition")
      .groupBy("k").agg(countDistinct("partition").as("n"))
      .agg(max("n")).collect().head.getLong(0)
    assert(parts === 1L)
  }

  test("streaming: admission control splits per-trigger budget lag-proportionally") {
    val root = newRoot()
    fill(root, "s", parts = 2, perPart = 50)
    val stream = new DisMicroBatchStream(Dis.normalize(Map(
      "client.root" -> root.toString, "stream" -> "s", "maxRecordsPerTrigger" -> "20")))
    val start = stream.initialOffset()
    val end1 = stream.latestOffset(start, stream.getDefaultReadLimit)
    val endMap = DisSourceOffset.from(end1).offsets
    assert(endMap(("s", 0)) === 10L) // equal lags → equal split
    assert(endMap(("s", 1)) === 10L)
    val end2 = stream.latestOffset(end1, stream.getDefaultReadLimit)
    val endMap2 = DisSourceOffset.from(end2).offsets
    assert(endMap2(("s", 0)) === 20L)
    stream.stop()
  }

  test("streaming end-to-end: micro-batches, checkpoint replay, exactly-once counts") {
    val root = newRoot()
    fill(root, "s", parts = 2, perPart = 25)
    val checkpoint = Files.createTempDirectory("dis-ckpt-").toString
    val outDir = Files.createTempDirectory("dis-out-").toString

    def runOnce(): Unit = {
      val q = spark.readStream.format("dis")
        .option("client.root", root.toString).option("stream", "s")
        .option("startingOffsets", "earliest")
        .option("maxRecordsPerTrigger", "10")
        .load()
        .selectExpr("cast(value as string) AS value", "partition", "offset")
        .writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", checkpoint)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000)
    }
    runOnce()
    val first = spark.read.parquet(outDir)
    assert(first.count() === 50)
    assert(first.select("value").distinct().count() === 50) // no dupes, no loss

    // more data arrives; restart from checkpoint must pick up ONLY the delta
    val client = new FileStreamClient(root)
    (0 until 5).foreach(i => client.append("s", 0, null, s"late-$i".getBytes(UTF_8)))
    runOnce()
    val second = spark.read.parquet(outDir)
    assert(second.count() === 55)
    assert(second.select("value").distinct().count() === 55)
  }

  test("partition elasticity: a partition added mid-stream is picked up at earliest") {
    val root = newRoot()
    fill(root, "s", parts = 1, perPart = 10)
    val stream = new DisMicroBatchStream(Dis.normalize(Map(
      "client.root" -> root.toString, "stream" -> "s")))
    val start = stream.initialOffset()
    // new partition appears after the stream started
    val client = new FileStreamClient(root)
    client.createStream("s", 2)
    (0 until 7).foreach(i => client.append("s", 1, null, s"n$i".getBytes(UTF_8)))
    val end = stream.latestOffset(start, stream.getDefaultReadLimit)
    val ranges = stream.planInputPartitions(start, end).map(_.asInstanceOf[DisInputPartition].range)
    assert(ranges.toSet === Set(OffsetRange("s", 0, 0, 10), OffsetRange("s", 1, 0, 7)))
    stream.stop()
  }

  test("commit-on-trigger pushes group offsets back to the service") {
    val root = newRoot()
    fill(root, "s", parts = 2, perPart = 5)
    val stream = new DisMicroBatchStream(Dis.normalize(Map(
      "client.root" -> root.toString, "stream" -> "s",
      "commitOnTrigger" -> "true", "groupId" -> "g1")))
    val end = stream.latestOffset(stream.initialOffset(), stream.getDefaultReadLimit)
    stream.commit(end)
    assert(new FileStreamClient(root).committed("s", "g1") === Map(0 -> 5L, 1 -> 5L))
    stream.stop()
  }

  test("failOnDataLoss=true raises when a range offset is unavailable") {
    val root = newRoot()
    fill(root, "s", parts = 1, perPart = 3)
    val df = read(root,
      "offsetRanges" -> """{"s":{"0":[0,10]}}""", "pollTimeoutMs" -> "200")
    val e = intercept[Exception](df.count())
    assert(e.getMessage.contains("failOnDataLoss") ||
      Option(e.getCause).exists(_.getMessage.contains("failOnDataLoss")))
  }

  test("failOnDataLoss=false stops quietly at the end of available data") {
    val root = newRoot()
    fill(root, "s", parts = 1, perPart = 3)
    val df = read(root,
      "offsetRanges" -> """{"s":{"0":[0,10]}}""",
      "failOnDataLoss" -> "false", "pollTimeoutMs" -> "200")
    assert(df.count() === 3)
  }
}
