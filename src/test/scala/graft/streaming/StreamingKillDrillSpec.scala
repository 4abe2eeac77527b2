package graft.streaming

import java.nio.file.{Files, Path}
import java.util.concurrent.atomic.AtomicBoolean

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQueryException, Trigger}
import org.apache.spark.sql.types._

import graft.SparkTestBase
import graft.sources.FileStreamClient

/** Mid-commit kill drills for the watermark-closed keyed-state arms
  * (SFT session assembly, best-of-N, GRPO advantages, the RL-metrics
  * monitor) — the failure mode their checkpoint-restart specs do NOT
  * cover: the SINK fails while a batch's output is being committed
  * (data landed, checkpoint commit didn't), the query dies, and a
  * restart replays that batch against a fault-tolerant sink.
  *
  * The sink here is the standard idempotent foreachBatch pattern
  * (overwrite-by-batch-id directories): a replayed batch id rewrites
  * its own directory, so the drill proves the ARM's side of the
  * contract — a replayed batch regenerates byte-identical rows (state
  * version N−1 + the same offsets → the same closes), so no pool
  * closes twice under a different batch id and none is lost. Each
  * arm's drilled output must equal its clean (no-failure) run's output
  * as a MULTISET, not just a set. */
class StreamingKillDrillSpec extends SparkTestBase {

  private val Min = 60L * 1000000L
  private val Hour = 60L * Min
  private val T0 = 1700000000L * 1000000L

  /** Four closable pools spread so that with maxRecordsPerTrigger=3
    * and a 1-minute watermark delay the closes land in (at least) two
    * DIFFERENT batches — the drill needs committed output both before
    * and after the injected failure. File order = arrival order:
    * batches ≈ (u1×3)(u2×3)(u998, u3×2)(sentinel)(cleanup); u1/u2
    * close when the u3 timestamps advance the watermark past T0+44min,
    * u3/u998 close on the sentinel's jump. */
  private val events: Seq[(Long, Long, Long, String, Double, String)] = Seq(
    (1L, T0 + 0 * Min, 111L, "gen", 10.0, "a1"),
    (1L, T0 + 3 * Min, 112L, "gen", 70.0, "a2"),
    (1L, T0 + 6 * Min, 113L, "gen", 65.0, "a3"),
    (2L, T0 + 10 * Min, 211L, "gen", 90.0, "b1"),
    (2L, T0 + 12 * Min, 212L, "gen", 20.0, "b2"),
    (2L, T0 + 14 * Min, 213L, "gen", 55.0, "b3"),
    (998L, T0 + 50 * Min, 811L, "gen", 30.0, "f1"),
    (3L, T0 + 3 * Hour, 311L, "gen", 45.0, "c1"),
    (3L, T0 + 3 * Hour + 5 * Min, 312L, "gen", 75.0, "c2"),
    (999L, T0 + 20 * Hour, 901L, "gen", 0.0, "zz"))

  private lazy val evRoot: Path = {
    import spark.implicits._
    val r = Files.createTempDirectory("killdrill-ev-")
    new FileStreamClient(r).createStream("events", 1)
    events.toDF("user_id", "ts_us", "event_id", "event_type", "value", "props")
      .select(to_json(struct(col("event_id"), col("ts_us"), col("user_id"),
        col("event_type"), col("value"), col("props"))).as("value"),
        lit(0).cast("int").as("partition"))
      .coalesce(1)
      .write.format("dis")
      .option("client.root", r.toString).option("stream", "events")
      .mode("append").save()
    r
  }

  private def readEv(): DataFrame =
    StreamingQueries.readEvents(spark, evRoot.toString, "events",
      Map("startingOffsets" -> "earliest", "maxRecordsPerTrigger" -> "3"))

  private val outSchemas = scala.collection.mutable.Map.empty[String, StructType]

  /** Run `plan` through the idempotent per-batch-directory sink. If
    * `failOnce` is set, the FIRST batch that produces rows throws
    * AFTER its directory is written — data landed, commit didn't. */
  private def runToDirs(name: String, plan: DataFrame, out: Path, ck: Path,
      failOnce: Option[AtomicBoolean]): Unit = {
    outSchemas(name) = plan.schema
    val q = plan.writeStream
      .foreachBatch { (df: DataFrame, id: Long) =>
        val batch = df.persist()
        try {
          if (batch.count() > 0L) {
            batch.write.mode("overwrite").parquet(s"$out/batch=$id")
            failOnce.foreach { flag =>
              if (flag.compareAndSet(false, true))
                throw new RuntimeException(s"injected sink failure at batch $id")
            }
          }
        } finally batch.unpersist()
        ()
      }
      .option("checkpointLocation", ck.toString)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    try q.awaitTermination(180000)
    catch { case _: StreamingQueryException => () } // the injected kill
  }

  /** All rows across batch directories, as a multiset of row strings. */
  private def drained(name: String, out: Path): Map[String, Int] = {
    val dirs = Option(out.toFile.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("batch="))
    if (dirs.isEmpty) Map.empty
    else spark.read.schema(outSchemas(name)).parquet(dirs.map(_.toString): _*)
      .collect().map(_.toString).groupBy(identity).map { case (k, v) => k -> v.length }
  }

  private def drill(name: String)(plan: => DataFrame): Unit = {
    // clean control run
    val cleanOut = Files.createTempDirectory(s"kd-$name-clean-out-")
    runToDirs(name, plan, cleanOut, Files.createTempDirectory(s"kd-$name-clean-ck-"), None)
    val expected = drained(name, cleanOut)
    assert(expected.nonEmpty, s"$name: clean run emitted nothing — fixture broken")
    assert(expected.size >= 3, s"$name: need multiple pools to drill, got $expected")
    // the drill is only meaningful if output spans >1 commit: some of
    // it must already be durable when the kill lands on a later batch
    val emittingBatches = Option(cleanOut.toFile.listFiles()).getOrElse(Array.empty)
      .count(f => f.isDirectory && f.getName.startsWith("batch="))
    assert(emittingBatches >= 2,
      s"$name: all pools closed in one batch — fixture pacing broken")

    // drilled run: first emitting batch's sink commit fails; restart
    val out = Files.createTempDirectory(s"kd-$name-out-")
    val ck = Files.createTempDirectory(s"kd-$name-ck-")
    val fired = new AtomicBoolean(false)
    runToDirs(name, plan, out, ck, Some(fired))
    assert(fired.get(), s"$name: the injected failure never fired")
    runToDirs(name, plan, out, ck, None) // restart, same checkpoint + sink
    assert(drained(name, out) === expected,
      s"$name: a pool was lost or closed twice across the kill/restart")
  }

  test("RL-metrics monitor survives a mid-commit sink kill exactly once") {
    drill("rlmon")(StreamingRlMetrics.monitor(spark, readEv(),
      quietUs = 30L * Min, watermark = "1 minute").toDF()
      .filter(col("user_id") =!= 999L))
  }

  test("best-of-N selection survives a mid-commit sink kill exactly once") {
    drill("bestofn")(StreamingBestOfN.selectBest(spark, readEv(),
      quietUs = 30L * Min, watermark = "1 minute").toDF()
      .filter(col("user_id") =!= 999L))
  }

  test("GRPO advantages survive a mid-commit sink kill exactly once") {
    drill("grpo")(StreamingBestOfN.advantages(spark, readEv(),
      quietUs = 30L * Min, watermark = "1 minute").toDF()
      .filter(col("user_id") =!= 999L))
  }

  test("SFT session assembly survives a mid-commit sink kill exactly once") {
    drill("sft")(StreamingSft.assembleSessions(spark, readEv(),
      watermark = "1 minute").toDF()
      .filter(col("user_id") =!= 999L))
  }
}
