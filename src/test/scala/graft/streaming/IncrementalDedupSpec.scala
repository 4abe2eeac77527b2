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
    def parquetFiles(sub: String): Int =
      new java.io.File(s"$store/$sub").listFiles()
        .count(f => f.getName.endsWith(".parquet"))
    val before = parquetFiles("docs")
    IncrementalDedup.compactStore(spark, store, parts = 1)
    assert(parquetFiles("docs") === 1 && parquetFiles("bands") === 1,
      s"docs ${parquetFiles("docs")} bands ${parquetFiles("bands")} (was $before)")
    assert(IncrementalDedup.admittedDocs(spark, store)
      .collect().map(_.getLong(0)).toSet === Set(1L, 2L, 4L))
    // rejection against the compacted band index still works
    val post = IncrementalDedup.admitBatch(
      spark.createDataFrame(Seq((9L, baseA + " aq"))).toDF("doc_id", "text"),
      "doc_id", "text", 0.8, store)
    assert(post.count() === 0L, "compacted store failed to reject a near-dup")
  }
}
