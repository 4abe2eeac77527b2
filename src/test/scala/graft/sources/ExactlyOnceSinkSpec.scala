package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkTestBase

/** Opt-in idempotent sink read-back (`exactlyOnceKey`): at-least-once
  * duplicates — replayed epochs after a crash between the sink write
  * and the streaming commit log, or repeated batch writes of the same
  * epoch — carry identical identity envelopes and collapse to exactly
  * one row through [[DisExactlyOnce.view]], with user keys restored
  * byte-exactly and plain records passing through untouched. */
class ExactlyOnceSinkSpec extends SparkTestBase {
  import spark.implicits._

  test("envelope/parse round-trips every user-key shape; plain keys pass through") {
    val keys = Seq[Array[Byte]](
      null,
      Array.emptyByteArray,
      "user-key".getBytes("UTF-8"),
      Array[Byte](0, 1, -1, 58, 75, 78), // binary incl. ':' 'K' 'N'
      "XO2:9:9:9:9:K-looking-user-key".getBytes("UTF-8"))
    keys.foreach { k =>
      val (tok, user) = DisExactlyOnce.parse(DisExactlyOnce.envelope(42L, 7L, 3, 11L, k))
      assert(tok === "XO2:42:7:3:11")
      if (k == null) assert(user === null)
      else assert(java.util.Arrays.equals(user, k), s"user key mangled for ${k.toSeq}")
    }
    // legacy v1 envelopes (no writer id) still parse, version-prefixed
    // so they can never collide with a v2 identity
    val (ltok, luser) = DisExactlyOnce.parse("XO1:7:3:11:Kold".getBytes("UTF-8"))
    assert(ltok === "XO1:7:3:11")
    assert(new String(luser, "UTF-8") === "old")
    // plain keys (no magic / malformed / empty-field envelopes) parse
    // to (null, same bytes)
    Seq("plain".getBytes("UTF-8"), "XO1:".getBytes("UTF-8"), "XO2:".getBytes("UTF-8"),
      "XO1:1:2:3:Q".getBytes("UTF-8"), "XO1:a:b:c:K".getBytes("UTF-8"),
      "XO2:1:2:3:K".getBytes("UTF-8"), // v2 needs 4 fields
      "XO1::::N".getBytes("UTF-8"), "XO2:::::N".getBytes("UTF-8"), // empty fields rejected
      "XO3:1:2:3:4:K".getBytes("UTF-8"), // unknown version
      Array.emptyByteArray).foreach { k =>
      val (tok, user) = DisExactlyOnce.parse(k)
      assert(tok === null, s"expected plain for ${new String(k, "UTF-8")}")
      assert(java.util.Arrays.equals(user, k))
    }
    assert(DisExactlyOnce.parse(null) === ((null, null)))
  }

  test("two independent batch writers reusing the same epoch do NOT collide " +
      "when they carry distinct writer ids") {
    val root = Files.createTempDirectory("xo-writers-")
    new FileStreamClient(root).createStream("out", 2)
    def writeAs(wid: String, rows: Seq[(String, String)]): Unit =
      rows.toDF("key", "value").write.format("dis")
        .option("client.root", root.toString).option("stream", "out")
        .option("exactlyOnceKey", "true").option("exactlyOnceEpoch", "0")
        .option("exactlyOnceWriterId", wid)
        .mode("append").save()
    writeAs("jobA", (1 to 10).map(i => s"a$i" -> s"va$i"))
    writeAs("jobB", (1 to 10).map(i => s"b$i" -> s"vb$i"))
    val v = DisExactlyOnce.view(spark.read.format("dis")
      .option("client.root", root.toString).option("stream", "out").load())
    assert(v.count() === 20L,
      "distinct writers sharing an epoch collided in the exactly-once view")
  }

  test("strict view fails loudly on a non-enveloped record") {
    val root = Files.createTempDirectory("xo-strict-")
    new FileStreamClient(root).createStream("out", 1)
    Seq(("p1", "plain1")).toDF("key", "value")
      .write.format("dis")
      .option("client.root", root.toString).option("stream", "out")
      .mode("append").save()
    val raw = spark.read.format("dis")
      .option("client.root", root.toString).option("stream", "out").load()
    val e = intercept[Exception] { DisExactlyOnce.view(raw, strict = true).count() }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(e).exists(c =>
      c.getMessage != null && c.getMessage.contains("identity envelope")), s"unexpected: $e")
  }

  test("repeated batch write of the same epoch: raw read doubles, the view " +
      "keeps one copy per identity with user keys restored") {
    val root = Files.createTempDirectory("xo-batch-")
    new FileStreamClient(root).createStream("out", 2)
    val rows = (1L to 40L).map(i => (s"k$i", s"v$i"))
    def writeOnce(): Unit = rows.toDF("key", "value")
      .write.format("dis")
      .option("client.root", root.toString).option("stream", "out")
      .option("exactlyOnceKey", "true").option("exactlyOnceEpoch", "5")
      .option("exactlyOnceWriterId", "job-1")
      .mode("append").save()
    writeOnce(); writeOnce() // the replayed-epoch shape

    val raw = spark.read.format("dis")
      .option("client.root", root.toString).option("stream", "out").load()
    assert(raw.count() === 80L, "expected at-least-once duplicates on the wire")
    val v = DisExactlyOnce.view(raw)
    assert(v.count() === 40L, "view did not collapse the replayed epoch")
    val got = v.select(col("key").cast("string"), col("value").cast("string"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toSet
    assert(got === rows.toSet, "view lost or mangled records")
  }

  test("batch write with exactlyOnceKey but no epoch fails loudly") {
    val root = Files.createTempDirectory("xo-noepoch-")
    new FileStreamClient(root).createStream("out", 1)
    val e = intercept[Exception] {
      Seq(("k", "v")).toDF("key", "value")
        .write.format("dis")
        .option("client.root", root.toString).option("stream", "out")
        .option("exactlyOnceKey", "true")
        .mode("append").save()
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(e).exists(_.getMessage != null) &&
      causes(e).exists(c => c.getMessage != null && c.getMessage.contains("exactlyOnceEpoch")),
      s"unexpected error: $e")
  }

  test("batch write with exactlyOnceKey but no writer id fails loudly") {
    val root = Files.createTempDirectory("xo-nowid-")
    new FileStreamClient(root).createStream("out", 1)
    val e = intercept[Exception] {
      Seq(("k", "v")).toDF("key", "value")
        .write.format("dis")
        .option("client.root", root.toString).option("stream", "out")
        .option("exactlyOnceKey", "true").option("exactlyOnceEpoch", "3")
        .mode("append").save()
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(e).exists(c =>
      c.getMessage != null && c.getMessage.contains("exactlyOnceWriterId")),
      s"unexpected error: $e")
  }

  test("mixed stream: plain records pass the view untouched next to enveloped ones") {
    val root = Files.createTempDirectory("xo-mixed-")
    new FileStreamClient(root).createStream("out", 1)
    Seq(("p1", "plain1"), ("p2", "plain2")).toDF("key", "value")
      .write.format("dis")
      .option("client.root", root.toString).option("stream", "out")
      .mode("append").save()
    Seq(("e1", "env1")).toDF("key", "value")
      .write.format("dis")
      .option("client.root", root.toString).option("stream", "out")
      .option("exactlyOnceKey", "true").option("exactlyOnceEpoch", "1")
      .option("exactlyOnceWriterId", "job-mixed")
      .mode("append").save()
    val v = DisExactlyOnce.view(spark.read.format("dis")
      .option("client.root", root.toString).option("stream", "out").load())
      .select(col("key").cast("string"), col("value").cast("string"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toSet
    assert(v === Set("p1" -> "plain1", "p2" -> "plain2", "e1" -> "env1"))
  }

  test("mid-batch crash: a batch whose sink write landed but whose streaming " +
      "commit never did is replayed on restart — duplicates on the wire, " +
      "exactly one copy through the view") {
    val root = Files.createTempDirectory("xo-restart-")
    val client = new FileStreamClient(root)
    client.createStream("in", 1)
    client.createStream("out", 2)
    val n = 30
    (1 to n).foreach { i =>
      client.append("in", 0, s"k$i".getBytes("UTF-8"), s"v$i".getBytes("UTF-8"))
    }
    val ck = Files.createTempDirectory("xo-restart-ck-").toString

    def runOnce(): Unit = {
      val q = spark.readStream.format("dis")
        .option("client.root", root.toString).option("stream", "in")
        .option("startingOffsets", "earliest")
        .option("maxRecordsPerTrigger", "10") // several micro-batches
        .load()
        .select(col("key"), col("value"))
        .writeStream.format("dis")
        .option("client.root", root.toString).option("stream", "out")
        .option("exactlyOnceKey", "true")
        .option("checkpointLocation", ck)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination(180000)
    }
    runOnce()

    // simulate the crash window: the LAST batch's sink output is on the
    // wire but its commit-log entry is gone → the restart replays it
    val commits = new java.io.File(s"$ck/commits").listFiles()
      .filter(_.getName.forall(_.isDigit)).sortBy(_.getName.toInt)
    assert(commits.length >= 3, s"expected several micro-batches, got ${commits.length}")
    val crc = new java.io.File(commits.last.getParent, s".${commits.last.getName}.crc")
    require(commits.last.delete(), "could not delete the last commit entry")
    if (crc.exists()) require(crc.delete(), "could not delete the commit crc")
    runOnce()

    val raw = spark.read.format("dis")
      .option("client.root", root.toString).option("stream", "out").load()
    assert(raw.count() > n.toLong,
      s"replay produced no wire duplicates (${raw.count()} rows) — test is vacuous")
    val v = DisExactlyOnce.view(raw)
    assert(v.count() === n.toLong, s"view shows duplicates: ${v.count()} != $n")
    val got = v.select(col("key").cast("string"), col("value").cast("string"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toSet
    assert(got === (1 to n).map(i => s"k$i" -> s"v$i").toSet)
  }

  test("writer id is stable under cosmetic checkpoint-path spellings " +
      "(trailing slash, scheme spelling, dot segments) and distinct for " +
      "genuinely different paths") {
    val forms = Seq(
      "/tmp/ck/q1", "/tmp/ck/q1/", "/tmp/ck/q1///",
      "file:/tmp/ck/q1", "file:///tmp/ck/q1", "file://localhost/tmp/ck/q1",
      "/tmp/ck/./q1", "/tmp/ck/sub/../q1", "  /tmp/ck/q1 ")
    val ids = forms.map(DisExactlyOnce.canonicalCheckpoint).distinct
    assert(ids === Seq("file:///tmp/ck/q1"),
      s"cosmetic spellings split identities: $ids")
    // different queries stay distinct; non-file schemes keep authority
    assert(DisExactlyOnce.canonicalCheckpoint("/tmp/ck/q2") !=
      DisExactlyOnce.canonicalCheckpoint("/tmp/ck/q1"))
    assert(DisExactlyOnce.canonicalCheckpoint("hdfs://nn:8020/ck/q1/") ===
      "hdfs://nn:8020/ck/q1")
    assert(DisExactlyOnce.canonicalCheckpoint("hdfs://nn2:8020/ck/q1") !=
      DisExactlyOnce.canonicalCheckpoint("hdfs://nn:8020/ck/q1"))
    // query/fragment components are LOCATIONS, not cosmetics: URIs
    // differing only there must not collide into one writer id
    assert(DisExactlyOnce.canonicalCheckpoint("s3://b/ck?versionId=1") !=
      DisExactlyOnce.canonicalCheckpoint("s3://b/ck?versionId=2"))
    assert(DisExactlyOnce.canonicalCheckpoint("s3://b/ck#a") !=
      DisExactlyOnce.canonicalCheckpoint("s3://b/ck#b"))
    assert(DisExactlyOnce.canonicalCheckpoint("s3://b/ck?v=1") !=
      DisExactlyOnce.canonicalCheckpoint("s3://b/ck"))
  }
}
