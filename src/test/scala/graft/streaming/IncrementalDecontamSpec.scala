package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

import graft.SparkTestBase
import graft.sources.FileStreamClient

/** Streaming benchmark decontamination: micro-batches gated against a
  * persisted benchmark-gram store (Bloom prefilter + exact verify),
  * across batch boundaries and a restart, through a real dis-source
  * stream. The store is static, so decisions must be bit-identical to
  * the batch operator whatever the batching. */
class IncrementalDecontamSpec extends SparkTestBase {

  import spark.implicits._

  private val bench = Seq(
    (100L, "alpha beta gamma delta"),
    (101L, "secret eval question here"))
  // 3-gram contamination: docs 2 and 4 carry a benchmark trigram; doc 6
  // has the benchmark words but never 3 in a row
  private val docs = Seq(
    1L -> "x y z w",
    2L -> "p alpha beta gamma q",
    3L -> "r s t u v",
    4L -> "beta gamma delta end here",
    5L -> "clean text only here now",
    6L -> "alpha beta nope gamma delta")
  private val cleanIds = Set(1L, 3L, 5L, 6L)

  private def buildStore(fpp: Double = 0.3): String = {
    val store = Files.createTempDirectory("incdecon-store-").toString
    // high fpp so the fixture genuinely exercises the exact-verify path
    IncrementalDecontam.buildStore(
      bench.toDF("doc_id", "text"), "text", store, n = 3, fpp = fpp)
    store
  }

  test("checkBatch decisions are bit-identical to the batch operator " +
      "and admitBatch keeps exactly the clean rows") {
    val store = buildStore()
    assert(IncrementalDecontam.gramWidth(spark, store) === 3)
    val batch = docs.toDF("doc_id", "text")
    val got = IncrementalDecontam.checkBatch(batch, "doc_id", "text", store)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val exact = graft.api.Graft.decontaminate(
      batch, "doc_id", "text", bench.toDF("doc_id", "text"), "text", n = 3)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got === exact, "Bloom-gated decisions diverge from the exact operator")
    assert(IncrementalDecontam.admitBatch(batch, "doc_id", "text", store)
      .collect().map(_.getLong(0)).toSet === cleanIds)
  }

  test("streamed batches are gated against the store; the admitted union " +
      "equals the batch operator's clean set") {
    val store = buildStore()
    val root = Files.createTempDirectory("incdecon-")
    val client = new FileStreamClient(root)
    client.createStream("docs", 1)
    docs.foreach { case (id, text) =>
      client.append("docs", 0, null,
        s"""{"doc_id":$id,"text":"$text"}""".getBytes("UTF-8"))
    }
    val outDir = Files.createTempDirectory("incdecon-out-").toString

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
        IncrementalDecontam.admitBatch(batch, "doc_id", "text", store)
          .write.mode("append").parquet(outDir)
        ()
      }
      .option("checkpointLocation", Files.createTempDirectory("incdecon-ck-").toString)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(180000)

    val admitted = spark.read.parquet(outDir)
      .collect().map(_.getLong(0)).toSet
    assert(admitted === cleanIds,
      s"admitted $admitted — expected the batch operator's clean set $cleanIds")
  }

  test("a restarted stream resumes from its checkpoint; decisions after " +
      "the restart match the static store built before it") {
    val store = buildStore()
    val root = Files.createTempDirectory("incdecon-rs-")
    val client = new FileStreamClient(root)
    client.createStream("docs", 1)
    val ck = Files.createTempDirectory("incdecon-rs-ck-").toString
    val outDir = Files.createTempDirectory("incdecon-rs-out-").toString

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
          IncrementalDecontam.admitBatch(batch, "doc_id", "text", store)
            .write.mode("append").parquet(outDir)
          ()
        }
        .option("checkpointLocation", ck)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination(180000)
    }
    def feed(id: Long, text: String): Unit =
      client.append("docs", 0, null,
        s"""{"doc_id":$id,"text":"$text"}""".getBytes("UTF-8"))

    docs.take(3).foreach { case (id, t) => feed(id, t) } // run 1: docs 1-3
    runOnce()
    assert(spark.read.parquet(outDir).collect().map(_.getLong(0)).toSet
      === (cleanIds intersect Set(1L, 2L, 3L)))

    docs.drop(3).foreach { case (id, t) => feed(id, t) } // run 2: docs 4-6
    runOnce()
    // the resumed query must not re-emit docs 1-3 (offsets committed)
    val admitted = spark.read.parquet(outDir).collect().map(_.getLong(0))
    assert(admitted.length === admitted.distinct.length,
      s"restart re-emitted rows: ${admitted.mkString(",")}")
    assert(admitted.toSet === cleanIds)
  }

  test("buildStore records the gram width; a rebuilt store with a new " +
      "width is picked up by the mtime-keyed Bloom cache") {
    val store = buildStore()
    val batch = docs.toDF("doc_id", "text")
    assert(IncrementalDecontam.admitBatch(batch, "doc_id", "text", store)
      .collect().map(_.getLong(0)).toSet === cleanIds)
    // rebuild with n=2: doc 6 now carries benchmark bigrams ("alpha
    // beta", "gamma delta") and must flip to contaminated
    IncrementalDecontam.buildStore(
      bench.toDF("doc_id", "text"), "text", store, n = 2, fpp = 0.3)
    assert(IncrementalDecontam.gramWidth(spark, store) === 2)
    assert(IncrementalDecontam.admitBatch(batch, "doc_id", "text", store)
      .collect().map(_.getLong(0)).toSet === Set(1L, 3L, 5L))
  }
}
