package graft.streaming

import java.nio.file.{Files, Path}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

import graft.SparkTestBase
import graft.ops.RlQueries
import graft.sources.FileStreamClient

/** [[StreamingRlMetrics.monitor]] against the batch estimators
  * ([[RlQueries.passAtKOf]] / [[RlQueries.rewardDriftOf]]):
  * watermark-closed pools must carry the batch pass@{1,5,10} and
  * Spearman ρ field-for-field — exact doubles, not tolerances —
  * independently of micro-batch boundaries, out-of-order arrival
  * inside the watermark, and a checkpoint restart mid-stream (the
  * StreamingBestOfNSpec contract applied to the monitor). */
class StreamingRlMetricsSpec extends SparkTestBase {
  import spark.implicits._

  private val Min = 60L * 1000000L
  private val Hour = 60L * Min
  private val T0 = 1600000000L * 1000000L

  /** (user_id, ts_us, event_id, event_type, value) */
  private type Ev = (Long, Long, Long, String, Double)

  // u1/gen: a 6-candidate pool, 3 passing (≥60), scores TRENDING UP
  //         with arrival (positive drift) and a value tie (65.0 twice)
  //         exercising the tie-broken permutation;
  // u1/rank: a singleton pool — NULL pass@5/10 and NULL spearman;
  // u2/gen: 5 candidates arriving OUT OF ORDER, 0 passing — pass@k = 0
  //         exactly, drift from the scrambled arrival;
  // u3/gen: opens before the restart, more candidates arrive AFTER —
  //         the restart must not close it early or lose the buffer;
  // u999: the watermark sentinel, its pool never closes.
  private val part1: Seq[Ev] = Seq(
    (1L, 0 * Min, 111L, "gen", 10.0),
    (1L, 2 * Min, 112L, "gen", 30.0),
    (1L, 4 * Min, 113L, "gen", 65.0),
    (1L, 6 * Min, 114L, "gen", 65.0),   // value tie with 113
    (1L, 8 * Min, 115L, "gen", 80.0),
    (1L, 9 * Min, 116L, "gen", 55.0),
    (1L, 12 * Min, 121L, "rank", 70.0), // singleton
    (2L, 20 * Min, 213L, "gen", 40.0),  // out-of-order arrival:
    (2L, 15 * Min, 211L, "gen", 55.0),  //   ts does not follow file order
    (2L, 25 * Min, 215L, "gen", 10.0),
    (2L, 17 * Min, 212L, "gen", 25.0),
    (2L, 22 * Min, 214L, "gen", 35.0),
    (3L, 30 * Min, 311L, "gen", 90.0))
  private val part2: Seq[Ev] = Seq(
    (3L, 40 * Min, 312L, "gen", 20.0),  // u3 grows post-restart
    (3L, 45 * Min, 313L, "gen", 75.0),
    (999L, 13 * Hour, 901L, "gen", 0.0)) // sentinel: closes everything

  private def shifted(evs: Seq[Ev]): Seq[Ev] =
    evs.map { case (u, ts, eid, et, v) => (u, T0 + ts, eid, et, v) }

  private def eventsDf(evs: Seq[Ev]): DataFrame =
    shifted(evs).toDF("user_id", "ts_us", "event_id", "event_type", "value")
      .select(col("user_id"), timestamp_micros(col("ts_us")).as("ts"),
        col("event_id"), col("event_type"), col("value"))

  private val evSchema = StructType(Seq(
    StructField("user_id", LongType), StructField("ts_us", LongType),
    StructField("event_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType)))

  private def produce(root: Path, evs: Seq[Ev]): Unit =
    shifted(evs).toDF("user_id", "ts_us", "event_id", "event_type", "value")
      .select(to_json(struct(col("user_id"), col("ts_us"), col("event_id"),
        col("event_type"), col("value"))).as("value"),
        lit(0).cast("int").as("partition"))
      .coalesce(1)
      .write.format("dis")
      .option("client.root", root.toString).option("stream", "cands")
      .mode("append").save()

  private def readEvents(root: Path, perTrigger: Int): DataFrame =
    spark.readStream.format("dis")
      .option("client.root", root.toString)
      .option("stream", "cands")
      .option("startingOffsets", "earliest")
      .option("maxRecordsPerTrigger", perTrigger.toString)
      .load()
      .select(from_json(col("value").cast("string"), evSchema).as("e"))
      .select(col("e.user_id"), timestamp_micros(col("e.ts_us")).as("ts"),
        col("e.event_id"), col("e.event_type"), col("e.value"))

  private def runOnce(root: Path, ck: Path, out: String, perTrigger: Int): Unit = {
    val q = StreamingRlMetrics.monitor(spark, readEvents(root, perTrigger),
        quietUs = 30L * Min, watermark = "2 hours")
      .toDF()
      .writeStream.format("parquet")
      .option("path", out)
      .option("checkpointLocation", ck.toString)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(180000)
  }

  private type OutRow = (Long, String, Long, Long, Option[Double],
    Option[Double], Option[Double], Option[Double])
  private def key(df: DataFrame): Set[OutRow] = {
    def opt(r: org.apache.spark.sql.Row, i: Int): Option[Double] =
      if (r.isNullAt(i)) None else Some(r.getDouble(i))
    df.collect().map { r =>
      (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        opt(r, 4), opt(r, 5), opt(r, 6), opt(r, 7))
    }.toSet
  }

  /** The batch side over the full synthetic log (sentinel excluded):
    * pass@k joined with Spearman on the pool key — the two batch
    * queries the monitor mirrors. */
  private def batchExpectation(): Set[OutRow] = {
    val ev = eventsDf(part1 ++ part2).filter(col("user_id") =!= 999L)
    val pk = RlQueries.passAtKOf(ev)
    val rd = RlQueries.rewardDriftOf(ev)
      .select(col("user_id"), col("event_type"), col("spearman"))
    key(pk.join(rd, Seq("user_id", "event_type"))
      .select(col("user_id"), col("event_type"), col("n"), col("c"),
        col("pass_at_1"), col("pass_at_5"), col("pass_at_10"), col("spearman")))
  }

  test("closed pools equal the batch pass@k AND spearman field-for-field " +
      "(exact doubles), invariant to micro-batch boundaries") {
    val expected = batchExpectation()
    assert(expected.size === 4, s"fixture drifted: $expected")
    // fixture really exercises the contracts: a NULL-rho singleton, a
    // zero-pass pool, and a pool with all three estimates defined
    assert(expected.exists(r => r._3 == 1L && r._8.isEmpty && r._5.contains(0.0)
      || r._3 == 1L && r._8.isEmpty && r._5.contains(1.0)), "singleton pool")
    assert(expected.exists(r => r._4 == 0L && r._5.contains(0.0)), "zero-pass pool")
    assert(expected.exists(r => r._3 >= 5L && r._6.nonEmpty), "pass@5-defined pool")
    for (perTrigger <- Seq(3, 1000)) {
      val root = Files.createTempDirectory(s"rlm-stream-$perTrigger-")
      new FileStreamClient(root).createStream("cands", 1)
      val out = Files.createTempDirectory(s"rlm-out-$perTrigger-").toString
      produce(root, part1 ++ part2)
      runOnce(root, Files.createTempDirectory(s"rlm-ck-$perTrigger-"), out, perTrigger)
      assert(key(spark.read.parquet(out).select(
        col("user_id"), col("event_type"), col("n"), col("c"),
        col("pass_at_1"), col("pass_at_5"), col("pass_at_10"), col("spearman")))
        === expected,
        s"perTrigger=$perTrigger diverges from the batch estimators")
    }
  }

  test("spearman kernel: a -0.0 score ties with 0.0 and breaks by event_id, " +
      "exactly like the batch window ordering") {
    import StreamingRlMetrics.{Cand, spearman}
    // batch: value tie -> rv by event_id -> rv == rt -> rho = +1
    val cands = Seq(Cand(1L, 100L, 0.0), Cand(2L, 200L, -0.0))
    assert(spearman(cands) === Some(1.0),
      "-0.0 must not reorder the value permutation vs the batch window")
    // sanity: a real reversal still reads -1
    val rev = Seq(Cand(1L, 200L, 1.0), Cand(2L, 100L, 2.0))
    assert(spearman(rev) === Some(-1.0))
  }

  test("two bursts of one key ≥ quietUs apart in EVENT time emit as two " +
      "pools even when a catch-up replay's watermark jumps past both; " +
      "the earlier closes while the later stays open") {
    // burst A (0–5 min) and burst B (100–105 min): 95 min apart, far
    // beyond quietUs = 30 min. A replay that feeds both in ONE batch
    // must still split them — the round-13 close rule (one lastUs for
    // the whole buffer) merged them into a single 6-candidate pool.
    val burstA: Seq[Ev] = Seq(
      (7L, 0 * Min, 711L, "gen", 70.0),
      (7L, 2 * Min, 712L, "gen", 50.0),
      (7L, 5 * Min, 713L, "gen", 80.0))
    val burstB: Seq[Ev] = Seq(
      (7L, 100 * Min, 714L, "gen", 10.0),
      (7L, 102 * Min, 715L, "gen", 90.0),
      (7L, 105 * Min, 716L, "gen", 20.0))
    // watermark advancer: wm = 160 − 120 (delay) = 40 min — past A's
    // close boundary (5 + 30 = 35 min), before B's (105 + 30 = 135 min)
    val advance: Seq[Ev] = Seq((998L, 160 * Min, 991L, "gen", 0.0))
    val sentinel: Seq[Ev] = Seq((999L, 13 * Hour, 901L, "gen", 0.0))

    def slice(evs: Seq[Ev]): Set[OutRow] = {
      val ev = eventsDf(evs)
      val pk = RlQueries.passAtKOf(ev)
      val rd = RlQueries.rewardDriftOf(ev)
        .select(col("user_id"), col("event_type"), col("spearman"))
      key(pk.join(rd, Seq("user_id", "event_type"))
        .select(col("user_id"), col("event_type"), col("n"), col("c"),
          col("pass_at_1"), col("pass_at_5"), col("pass_at_10"), col("spearman")))
    }
    def u7(out: String): Set[OutRow] =
      key(spark.read.parquet(out).filter(col("user_id") === 7L).select(
        col("user_id"), col("event_type"), col("n"), col("c"),
        col("pass_at_1"), col("pass_at_5"), col("pass_at_10"), col("spearman")))

    val root = Files.createTempDirectory("rlm-burst-")
    new FileStreamClient(root).createStream("cands", 1)
    val ck = Files.createTempDirectory("rlm-burst-ck-")
    val out = Files.createTempDirectory("rlm-burst-out-").toString

    produce(root, burstA ++ burstB ++ advance)
    runOnce(root, ck, out, 1000) // one data batch: wm covers A only
    assert(u7(out) === slice(burstA),
      "burst A must close as its own pool while B stays open in state")

    produce(root, sentinel)
    runOnce(root, ck, out, 1000)
    assert(u7(out) === slice(burstA) ++ slice(burstB),
      "burst B must emit as a SECOND pool, never merged with A")
    assert(spark.read.parquet(out).filter(col("user_id") === 7L).count() === 2L,
      "exactly two pools for the two bursts")
  }

  test("checkpoint restart mid-stream: open pools recover their buffer; " +
      "the union of both runs equals the batch result exactly once") {
    val root = Files.createTempDirectory("rlm-restart-")
    new FileStreamClient(root).createStream("cands", 1)
    val ck = Files.createTempDirectory("rlm-restart-ck-")
    val out = Files.createTempDirectory("rlm-restart-out-").toString

    produce(root, part1)
    runOnce(root, ck, out, 4)
    val afterRun1 = spark.read.parquet(out)
    // u3's later candidates have not arrived; its pool must stay open
    assert(afterRun1.filter(col("user_id") === 3L).count() === 0L,
      "u3 pool closed prematurely")

    produce(root, part2)
    runOnce(root, ck, out, 4) // same checkpoint: recovers state
    val total = spark.read.parquet(out)
    assert(key(total.select(
      col("user_id"), col("event_type"), col("n"), col("c"),
      col("pass_at_1"), col("pass_at_5"), col("pass_at_10"), col("spearman")))
      === batchExpectation(),
      "restart lost or duplicated pools (or broke the buffer)")
    assert(total.count() === 4L, "duplicate emissions")
  }
}
