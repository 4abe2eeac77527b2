package graft.streaming

import java.nio.file.{Files, Path}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

import graft.SparkTestBase
import graft.ops.SftQueries
import graft.sources.FileStreamClient

/** [[StreamingSft.assembleSessions]] against the batch kernel
  * ([[SftQueries.sftAssemble]]): watermark-closed sessions must equal
  * the batch rows field-for-field (including the per-user `sid`
  * numbering), independently of micro-batch boundaries, out-of-order
  * arrival inside the watermark, and a checkpoint restart in the
  * middle of the stream — the DomainQuotaSpec contract applied to the
  * SFT family. */
class StreamingSftSpec extends SparkTestBase {
  import spark.implicits._

  private val Min = 60L * 1000000L
  private val Hour = 60L * Min
  // realistic epoch base: an event at offset 0 must not sit exactly on
  // the stream's INITIAL watermark (epoch 0), where it would be late
  private val T0 = 1600000000L * 1000000L

  /** (user_id, ts_us, event_id, event_type, props) */
  private type Ev = (Long, Long, Long, String, String)

  // u1: two sessions (3 turns, then 2 turns after a >30min gap);
  // u2: one 4-turn session with a ts tie broken by event_id;
  // u3: two single-turn sessions, the second arriving after a restart
  //     (pins the sid counter surviving state with no open sessions);
  // u999: the watermark sentinel, its session never closes.
  private val part1: Seq[Ev] = Seq(
    (1L, 10 * Min, 103L, "click", "p3"),   // u1 s1 arrives OUT OF ORDER
    (1L, 0 * Min, 101L, "view", "p1"),
    (2L, 20 * Min, 202L, "view", "q2"),    // tie on ts: 201 before 202
    (2L, 20 * Min, 201L, "click", "q1"),
    (1L, 5 * Min, 102L, "scroll", "p2"),
    (2L, 25 * Min, 203L, "buy", "q3"),
    (1L, 2 * Hour, 104L, "view", "p4"),    // u1 s2 opens
    (2L, 30 * Min, 204L, "view", "q4"),
    (3L, 40 * Min, 301L, "click", "r1"),   // u3 s1 (single turn)
    (1L, 2 * Hour + 1 * Min, 105L, "buy", "p5"))
  private val part2: Seq[Ev] = Seq(
    (3L, 3 * Hour, 302L, "view", "r2"),    // u3 s2 — sid must be 2
    (999L, 13 * Hour, 901L, "view", "z"))  // sentinel: closes everything

  private def shifted(evs: Seq[Ev]): Seq[Ev] =
    evs.map { case (u, ts, eid, et, p) => (u, T0 + ts, eid, et, p) }

  private def eventsDf(evs: Seq[Ev]): DataFrame =
    shifted(evs).toDF("user_id", "ts_us", "event_id", "event_type", "props")
      .select(col("user_id"), timestamp_micros(col("ts_us")).as("ts"),
        col("event_id"), col("event_type"), col("props"))

  private val evSchema = StructType(Seq(
    StructField("user_id", LongType), StructField("ts_us", LongType),
    StructField("event_id", LongType), StructField("event_type", StringType),
    StructField("props", StringType)))

  private def produce(root: Path, evs: Seq[Ev]): Unit =
    shifted(evs).toDF("user_id", "ts_us", "event_id", "event_type", "props")
      .select(to_json(struct(col("user_id"), col("ts_us"), col("event_id"),
        col("event_type"), col("props"))).as("value"),
        lit(0).cast("int").as("partition"))
      .coalesce(1)
      .write.format("dis")
      .option("client.root", root.toString).option("stream", "events")
      .mode("append").save()

  private def readEvents(root: Path, perTrigger: Int): DataFrame =
    spark.readStream.format("dis")
      .option("client.root", root.toString)
      .option("stream", "events")
      .option("startingOffsets", "earliest")
      .option("maxRecordsPerTrigger", perTrigger.toString)
      .load()
      .select(from_json(col("value").cast("string"), evSchema).as("e"))
      .select(col("e.user_id"), timestamp_micros(col("e.ts_us")).as("ts"),
        col("e.event_id"), col("e.event_type"), col("e.props"))

  private def runOnce(root: Path, ck: Path, out: String, perTrigger: Int): Unit = {
    val q = StreamingSft.assembleSessions(spark, readEvents(root, perTrigger),
        watermark = "2 hours")
      .toDF()
      .writeStream.format("parquet")
      .option("path", out)
      .option("checkpointLocation", ck.toString)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(180000)
  }

  private type OutRow = (Long, Long, Long, String, Long, Long, Double)
  private def rowsOf(df: DataFrame): Set[OutRow] = df.collect().map(r => (
    r.getAs[Long]("user_id"), r.getAs[Long]("sid"), r.getAs[Long]("n_turns"),
    r.getAs[String]("transcript"), r.getAs[Long]("transcript_chars"),
    r.getAs[Long]("assistant_chars"), r.getAs[Double]("mask_frac"))).toSet

  /** The batch side over the full synthetic log, sentinel excluded
    * (its session never closes in the stream). */
  private def batchExpectation(): Set[OutRow] = rowsOf(
    SftQueries.sftAssemble(SftQueries.turnsOf(eventsDf(part1 ++ part2)))
      .filter(col("user_id") =!= 999L))

  test("closed sessions equal the batch assembly field-for-field, and the " +
      "result is micro-batch-boundary invariant") {
    val expected = batchExpectation()
    assert(expected.size === 5, s"fixture drifted: $expected")
    for (perTrigger <- Seq(3, 1000)) {
      val root = Files.createTempDirectory(s"sft-stream-$perTrigger-")
      new FileStreamClient(root).createStream("events", 1)
      val out = Files.createTempDirectory(s"sft-out-$perTrigger-").toString
      produce(root, part1 ++ part2)
      runOnce(root, Files.createTempDirectory(s"sft-ck-$perTrigger-"), out, perTrigger)
      assert(rowsOf(spark.read.parquet(out)) === expected,
        s"perTrigger=$perTrigger diverges from the batch kernel")
    }
  }

  test("checkpoint restart mid-stream: open sessions and sid counters recover; " +
      "the union of both runs equals the batch assembly exactly once") {
    val root = Files.createTempDirectory("sft-restart-")
    new FileStreamClient(root).createStream("events", 1)
    val ck = Files.createTempDirectory("sft-restart-ck-")
    val out = Files.createTempDirectory("sft-restart-out-").toString

    produce(root, part1)
    runOnce(root, ck, out, 4)
    val afterRun1 = rowsOf(spark.read.parquet(out))
    // u3's second session and the sentinel have not arrived: u3 sid 2
    // cannot exist yet, and nothing may be emitted twice later
    assert(!afterRun1.exists(r => r._1 == 3L && r._2 == 2L))

    produce(root, part2)
    runOnce(root, ck, out, 4) // same checkpoint: recovers state
    val total = rowsOf(spark.read.parquet(out))
    assert(total === batchExpectation(),
      "restart lost or duplicated sessions (or broke sid numbering)")
    // exactly-once across the two runs: parquet rows, not just the set
    assert(spark.read.parquet(out).count() === 5L, "duplicate emissions")
  }
}
