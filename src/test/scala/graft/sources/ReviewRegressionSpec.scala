package graft.sources

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path}

import org.apache.spark.sql.streaming.Trigger

import graft.SparkTestBase

/** Regressions for the round-1 self-review findings: unbounded-rate
  * clamp overflow, sentinel ranges like [100,-1], float_dot implicit
  * casts, gap-past-range-end emission, null sink values, and
  * allowEmptySubscription=false. */
class ReviewRegressionSpec extends SparkTestBase {

  private def newRoot(): Path = Files.createTempDirectory("rr-")

  private def fill(root: Path, stream: String, parts: Int, perPart: Int): FileStreamClient = {
    val client = new FileStreamClient(root)
    client.createStream(stream, parts)
    for (p <- 0 until parts; i <- 0 until perPart)
      client.append(stream, p, null, s"v$p-$i".getBytes(UTF_8))
    client
  }

  test("clamp with unbounded allocation advances to latest (no Long overflow)") {
    val end = RateAllocator.clamp(
      current = Map(("s", 0) -> 50L),
      latest = Map(("s", 0) -> 120L),
      allocation = Map(("s", 0) -> Long.MaxValue))
    assert(end(("s", 0)) === 120L)
  }

  test("unlimited streaming source (no maxRecordsPerTrigger) keeps consuming new data") {
    val root = newRoot()
    fill(root, "s", 1, 10)
    val stream = new DisMicroBatchStream(Dis.normalize(Map(
      "client.root" -> root.toString, "stream" -> "s")))
    val start = stream.initialOffset()
    val end1 = stream.latestOffset(start, stream.getDefaultReadLimit)
    assert(DisSourceOffset.from(end1).offsets(("s", 0)) === 10L)
    // new data after catching up: the next trigger must advance again
    val client = new FileStreamClient(root)
    (0 until 5).foreach(i => client.append("s", 0, null, s"late$i".getBytes(UTF_8)))
    val end2 = stream.latestOffset(end1, stream.getDefaultReadLimit)
    assert(DisSourceOffset.from(end2).offsets(("s", 0)) === 15L)
    stream.stop()
  }

  test("offsetRanges [from,-1] (explicit start to latest) works end to end") {
    val root = newRoot()
    fill(root, "s", 1, 10)
    val df = spark.read.format("dis")
      .option("client.root", root.toString).option("stream", "s")
      .option("offsetRanges", """{"s":{"0":[4,-1]}}""")
      .load()
    assert(df.count() === 6)
    assert(df.selectExpr("min(offset)").collect().head.getLong(0) === 4L)
  }

  test("float_dot accepts array<double> via implicit cast (no silent garbage)") {
    val d = spark.range(1).select(
      graft.functions.VecMath.float_dot(
        org.apache.spark.sql.functions.expr("array(1.0D, 2.0D)"),
        org.apache.spark.sql.functions.expr("array(3.0D, 4.0D)")).as("d"))
      .collect().head.getDouble(0)
    assert(d === 11.0)
  }

  test("gappy stream never emits records beyond the range end") {
    val root = newRoot()
    val client = new FileStreamClient(root)
    client.createStream("s", 1)
    (0 until 12).foreach(i => client.append("s", 0, null, s"v$i".getBytes(UTF_8)))
    // ranges [0,5) and [5,10) with allowNonConsecutiveOffsets: even if a
    // consumer skips, rows must stay within their range (no duplicates)
    val df = spark.read.format("dis")
      .option("client.root", root.toString).option("stream", "s")
      .option("offsetRanges", """{"s":{"0":[0,10]}}""")
      .option("maxRecordsPerPartition", "5")
      .option("allowNonConsecutiveOffsets", "true")
      .load()
    val offsets = df.select("offset").collect().map(_.getLong(0)).sorted.toSeq
    assert(offsets === (0L until 10L)) // exactly once each
  }

  test("null value rows fail the sink with a named error, null keys are fine") {
    val root = newRoot()
    new FileStreamClient(root).createStream("out", 1)
    import spark.implicits._
    val ok = Seq((Option.empty[String], "v1")).toDF("key", "value")
    ok.write.format("dis").option("client.root", root.toString)
      .option("stream", "out").mode("append").save() // null key: fine
    val bad = Seq(("k", Option.empty[String])).toDF("key", "value")
    val e = intercept[Exception] {
      bad.write.format("dis").option("client.root", root.toString)
        .option("stream", "out").mode("append").save()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("'value' column")), msgs(e).mkString(" | "))
  }

  test("allowEmptySubscription=false still fails on an empty pattern match") {
    val root = newRoot()
    fill(root, "real", 1, 1)
    val e = intercept[Exception] {
      spark.read.format("dis")
        .option("client.root", root.toString)
        .option("subscribePattern", "none-.*")
        .option("allowEmptySubscription", "false")
        .load().count()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("none-.*")), msgs(e).mkString(" | "))
  }
}
