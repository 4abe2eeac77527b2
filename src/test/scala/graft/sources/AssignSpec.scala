package graft.sources

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path}

import graft.SparkTestBase

/** Assign consumer strategy (explicit partition subsets, reference
  * dis/ConsumerStrategy.scala:186-213) and per-partition rate overrides
  * (PerPartitionConfig analog, dis/PerPartitionConfig.scala:30-46). */
class AssignSpec extends SparkTestBase {

  private def newRoot(): Path = Files.createTempDirectory("dis-assign-")

  private def fill(root: Path, stream: String, parts: Int, perPart: Int): Unit = {
    val client = new FileStreamClient(root)
    client.createStream(stream, parts)
    for (p <- 0 until parts; i <- 0 until perPart)
      client.append(stream, p, null, s"$stream-$p-$i".getBytes(UTF_8))
  }

  test("batch assign reads exactly the assigned partitions of the assigned streams") {
    val root = newRoot()
    fill(root, "s-a", 3, 4)
    fill(root, "s-b", 2, 5)
    val df = spark.read.format("dis")
      .option("client.root", root.toString)
      .option("assign", """{"s-a":[0,2]}""")
      .load()
    val got = df.selectExpr("topic", "partition").distinct().collect()
      .map(r => (r.getString(0), r.getInt(1))).toSet
    assert(got === Set(("s-a", 0), ("s-a", 2)))
    assert(df.count() === 8L) // 2 partitions × 4 records; s-a p1 and s-b untouched
  }

  test("streaming assign: trigger offsets cover only the assigned subset") {
    val root = newRoot()
    fill(root, "s-a", 3, 4)
    fill(root, "s-b", 2, 3)
    val stream = new DisMicroBatchStream(Dis.normalize(Map(
      "client.root" -> root.toString,
      "assign" -> """{"s-a":[1],"s-b":[0]}""")))
    val end = DisSourceOffset.from(
      stream.latestOffset(stream.initialOffset(), stream.getDefaultReadLimit)).offsets
    assert(end === Map(("s-a", 1) -> 4L, ("s-b", 0) -> 3L))
    stream.stop()
  }

  test("assign is mutually exclusive with stream/subscribePattern") {
    val root = newRoot()
    fill(root, "s-a", 1, 1)
    val e = intercept[Exception] {
      spark.read.format("dis")
        .option("client.root", root.toString)
        .option("stream", "s-a")
        .option("assign", """{"s-a":[0]}""")
        .load().count()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("mutually")), s"got: ${msgs(e)}")
  }

  test("assigning a nonexistent partition fails loudly, not silently-empty") {
    val root = newRoot()
    fill(root, "s-a", 2, 1)
    val e = intercept[Exception] {
      spark.read.format("dis")
        .option("client.root", root.toString)
        .option("assign", """{"s-a":[0,7]}""")
        .load().count()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(m => m.contains("7") && m.contains("do not exist")), s"got: ${msgs(e)}")
  }

  test("streamPartitions rejects malformed or empty assignments by example") {
    intercept[IllegalArgumentException](Offsets.streamPartitions("""{"s":[]}"""))
    intercept[IllegalArgumentException](Offsets.streamPartitions("{}"))
    intercept[IllegalArgumentException](Offsets.streamPartitions("""{"s":{"0":1}}"""))
    assert(Offsets.streamPartitions("""{"s":[2,0,2]}""") === Map("s" -> Seq(0, 2)))
  }

  test("per-partition overrides cap only their partition; others keep the uniform cap") {
    val lags = Map(("s", 0) -> 100L, ("s", 1) -> 100L, ("s", 2) -> 100L)
    val alloc = RateAllocator.allocate(lags, totalLimit = None,
      perPartitionLimit = Some(10L), partitionOverrides = Map(("s", 1) -> 3L))
    assert(alloc === Map(("s", 0) -> 10L, ("s", 1) -> 3L, ("s", 2) -> 10L))
    // floor of 1 survives an override smaller than the floor's intent
    val floored = RateAllocator.allocate(Map(("s", 0) -> 0L), Some(100L), None,
      Map(("s", 0) -> 5L))
    assert(floored === Map(("s", 0) -> 1L))
  }

  test("streaming respects maxRatePerPartitionOverrides end to end") {
    val root = newRoot()
    fill(root, "s-a", 2, 50)
    val stream = new DisMicroBatchStream(Dis.normalize(Map(
      "client.root" -> root.toString, "stream" -> "s-a",
      "maxRatePerPartition" -> "10",
      "maxRatePerPartitionOverrides" -> """{"s-a":{"1":2}}""")))
    val end = DisSourceOffset.from(
      stream.latestOffset(stream.initialOffset(), stream.getDefaultReadLimit)).offsets
    assert(end === Map(("s-a", 0) -> 10L, ("s-a", 1) -> 2L))
    stream.stop()
  }

  test("a non-positive override is rejected at construction") {
    val root = newRoot()
    val e = intercept[IllegalArgumentException] {
      new DisMicroBatchStream(Dis.normalize(Map(
        "client.root" -> root.toString, "stream" -> "s",
        "maxRatePerPartitionOverrides" -> """{"s":{"0":0}}""")))
    }
    assert(e.getMessage.contains("positive"))
  }
}
