package graft.streaming

import java.nio.file.{Files, Path}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkTestBase
import graft.ops.Tables
import graft.sources.FileStreamClient

/** Streaming semantics tests: the sf0.001 `events` fixture is produced
  * into a dis stream (through the sink), consumed back as micro-batches
  * (rate-limited so several triggers fire), and each stateful operator's
  * streaming output is compared against the equivalent batch
  * computation — the strongest equivalence the micro-batch model
  * admits (append-mode windows: all windows finalized by the terminal
  * watermark). */
class StreamingSpec extends SparkTestBase {
  private val dir = "/root/testdata/sf0.001"

  /** Produce events (ordered by ts → no late data) into a fresh stream;
    * returns the stream root. */
  private lazy val root: Path = {
    val r = Files.createTempDirectory("stream-events-")
    new FileStreamClient(r).createStream("events", 4)
    // single ts-ordered partition-0 feed would serialize everything
    // through one task; hash users across 4 partitions instead, each
    // partition individually ts-ordered (per-key order preserved —
    // the guarantee a partitioned log actually gives)
    Tables.events(spark, dir)
      .orderBy(col("ts"))
      .select(
        to_json(struct(col("event_id"), unix_micros(col("ts")).as("ts_us"),
          col("user_id"), col("event_type"), col("value"), col("props"))).as("value"),
        pmod(col("user_id"), lit(4)).cast("int").as("partition"))
      .coalesce(1) // keep per-partition append order = ts order
      .write.format("dis")
      .option("client.root", r.toString).option("stream", "events")
      .mode("append").save()
    r
  }

  private def streamEvents(maxPerTrigger: Int = 200): DataFrame =
    StreamingQueries.readEvents(spark, root.toString, "events",
      Map("maxRecordsPerTrigger" -> maxPerTrigger.toString))

  private def runToMemory(df: DataFrame, name: String, mode: String): DataFrame = {
    val q = df.writeStream.format("memory").queryName(name)
      .outputMode(mode)
      .option("checkpointLocation", Files.createTempDirectory(s"ck-$name-").toString)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(180000)
    spark.table(name)
  }

  private def batchEvents: DataFrame = Tables.events(spark, dir)

  test("streaming tumbling windows equal batch for all finalized windows") {
    val streamed = runToMemory(
      StreamingQueries.tumblingCounts(streamEvents()), "tumbling", "append")
      .collect().map(r => (r.getTimestamp(0), r.getLong(1), math.round(r.getDouble(2) * 100))).toSet

    val maxTs = batchEvents.agg(max(col("ts"))).collect().head.getTimestamp(0)
    val horizon = new java.sql.Timestamp(maxTs.getTime - 10 * 60 * 1000)
    val finalized = batchEvents
      .groupBy(window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("cnt"), sum(col("value")).as("sum_value"))
      .filter(col("window.end") <= lit(horizon)) // watermark passed the end
      .select(col("window.start"), col("cnt"), col("sum_value"))
      .collect().map(r => (r.getTimestamp(0), r.getLong(1), math.round(r.getDouble(2) * 100))).toSet

    assert(finalized.nonEmpty)
    assert(finalized.subsetOf(streamed),
      s"missing windows: ${finalized -- streamed}")
    // streamed may not contain any window batch would not produce
    val allBatch = batchEvents.groupBy(window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("cnt"), sum(col("value")).as("sum_value"))
      .select(col("window.start"), col("cnt"), col("sum_value"))
      .collect().map(r => (r.getTimestamp(0), r.getLong(1), math.round(r.getDouble(2) * 100))).toSet
    assert(streamed.subsetOf(allBatch), s"phantom windows: ${streamed -- allBatch}")
  }

  test("streaming sessionization equals batch session_window on finalized sessions") {
    val streamed = runToMemory(
      StreamingQueries.sessionize(streamEvents()), "sessions", "append")
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getLong(3))).toSet

    val batch = batchEvents
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("session_window.start"),
        col("session_window.end"), col("n_events"))
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getLong(3))).toSet

    assert(streamed.nonEmpty)
    assert(streamed.subsetOf(batch), s"phantom sessions: ${streamed -- batch}")
    // every batch session ending before the final watermark must be present
    val maxTs = batchEvents.agg(max(col("ts"))).collect().head.getTimestamp(0)
    val horizon = new java.sql.Timestamp(maxTs.getTime - 10 * 60 * 1000)
    val finalized = batch.filter(_._3.getTime <= horizon.getTime)
    assert(finalized.subsetOf(streamed), s"missing sessions: ${finalized -- streamed}")
  }

  test("streaming dedup admits each event_id exactly once across duplicated input") {
    // duplicate the whole stream into a second copy appended after the first
    val dupRoot = Files.createTempDirectory("stream-dup-")
    new FileStreamClient(dupRoot).createStream("events", 2)
    val payload = Tables.events(spark, dir).orderBy(col("ts"))
      .select(to_json(struct(col("event_id"), unix_micros(col("ts")).as("ts_us"),
        col("user_id"), col("event_type"), col("value"), col("props"))).as("value"),
        pmod(col("user_id"), lit(2)).cast("int").as("partition"))
      .coalesce(1)
    payload.write.format("dis").option("client.root", dupRoot.toString)
      .option("stream", "events").mode("append").save()
    payload.write.format("dis").option("client.root", dupRoot.toString)
      .option("stream", "events").mode("append").save() // exact duplicates

    val events = StreamingQueries.readEvents(spark, dupRoot.toString, "events",
      Map("maxRecordsPerTrigger" -> "300"))
    val out = runToMemory(
      StreamingQueries.dedupEvents(events).select(col("event_id")), "dedup", "append")
    val ids = out.collect().map(_.getLong(0))
    assert(ids.length === ids.distinct.length, "duplicates survived dedup")
    // every id whose duplicate arrived within the watermark horizon is deduped;
    // with both copies interleaved per partition the horizon covers all but the tail
    assert(ids.length >= 900 && ids.length <= 1000 + 100,
      s"unexpected dedup cardinality ${ids.length}")
  }

  test("custom-state sessionizer (EventTimeTimeout) matches batch session_window") {
    val streamed = runToMemory(
      StreamingQueries.sessionizeWithState(spark, streamEvents(150))
        .toDF()
        .select(col("user_id"), timestamp_micros(col("start_us")).as("s"),
          timestamp_micros(col("end_us")).as("e"), col("n_events")),
      "customsess", "append")
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getLong(3))).toSet

    val batch = batchEvents
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("session_window.start"),
        col("session_window.end"), col("n_events"))
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getLong(3))).toSet

    assert(streamed.nonEmpty)
    assert(streamed.subsetOf(batch), s"phantom sessions: ${(streamed -- batch).take(5)}")
    val maxTs = batchEvents.agg(max(col("ts"))).collect().head.getTimestamp(0)
    val horizon = new java.sql.Timestamp(maxTs.getTime - 10 * 60 * 1000)
    val finalized = batch.filter(_._3.getTime <= horizon.getTime)
    assert(finalized.subsetOf(streamed), s"missing sessions: ${(finalized -- streamed).take(5)}")
  }

  test("flatMapGroupsWithState running totals converge to batch totals") {
    val out = runToMemory(
      StreamingQueries.runningUserStats(spark, streamEvents(100)).toDF(), "stats", "update")
    // last update per user = final running total
    val finals = out.groupBy(col("user_id"))
      .agg(max(col("n_events")).as("n"), max(col("sum_value")).as("s"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val batch = batchEvents.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("s"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(finals.keySet === batch.keySet)
    batch.foreach { case (u, (n, s)) =>
      assert(finals(u)._1 === n, s"user $u count")
      assert(math.abs(finals(u)._2 - s) < 1e-6, s"user $u sum")
    }
  }

  test("the reference's canonical demo: streaming word count over the connector") {
    // ≙ demo DISSparkStreamingSubscribeExample.scala:46 —
    // stream.map(_.value).flatMap(_.split(" ")).map((_,1L)).reduceByKey(_+_)
    val wcRoot = Files.createTempDirectory("wc-")
    val client = new FileStreamClient(wcRoot)
    client.createStream("lines", 2)
    val lines = Seq("the quick fox", "the lazy dog", "quick quick fox")
    lines.zipWithIndex.foreach { case (l, i) =>
      client.append("lines", i % 2, null, l.getBytes)
    }
    val counts = spark.readStream.format("dis")
      .option("client.root", wcRoot.toString).option("stream", "lines")
      .load()
      .selectExpr("explode(split(cast(value as string), ' ')) AS word")
      .groupBy("word").count()
    val q = counts.writeStream.format("memory").queryName("wc")
      .outputMode("complete")
      .option("checkpointLocation", Files.createTempDirectory("wc-ck-").toString)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val result = spark.table("wc").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(result === Map("the" -> 2L, "quick" -> 3L, "fox" -> 2L, "lazy" -> 1L, "dog" -> 1L))
  }

  test("stream-stream interval join: clicks matched to purchases within 1 hour") {
    // two watermarked streams from the same feed joined on user with a
    // time-interval predicate — the stateful two-sided join the DStream
    // API never had; results must equal the batch interval join
    val ev = streamEvents(500)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"), col("ts").as("click_ts"))
      .withWatermark("click_ts", "10 minutes")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
        col("ts").as("purchase_ts"))
      .withWatermark("purchase_ts", "10 minutes")
    val joined = clicks.join(purchases,
      col("user_id") === col("p_user") &&
        col("purchase_ts") > col("click_ts") &&
        col("purchase_ts") <= col("click_ts") + expr("INTERVAL 1 HOUR"))
      .select(col("click_id"), col("purchase_id"))
    val streamed = runToMemory(joined, "ssjoin", "append")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val b = batchEvents
    val bc = b.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"), col("ts").as("click_ts"))
    val bp = b.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
        col("ts").as("purchase_ts"))
    val batch = bc.join(bp,
      col("user_id") === col("p_user") &&
        col("purchase_ts") > col("click_ts") &&
        col("purchase_ts") <= col("click_ts") + expr("INTERVAL 1 HOUR"))
      .select(col("click_id"), col("purchase_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    assert(batch.nonEmpty)
    assert(streamed === batch,
      s"missing=${(batch -- streamed).take(5)} phantom=${(streamed -- batch).take(5)}")
  }

  test("late rows beyond the watermark are dropped from windowed aggregation") {
    // two partitions: p0 carries the in-order bulk; p1 carries one very
    // late straggler (ts far before the bulk's max) appended last
    val lateRoot = Files.createTempDirectory("stream-late-")
    val client = new FileStreamClient(lateRoot)
    client.createStream("events", 1)
    def js(id: Long, ts: String, v: Double) = {
      val us = java.sql.Timestamp.valueOf(ts).getTime * 1000L
      s"""{"event_id":$id,"ts_us":$us,"user_id":1,"event_type":"click","value":$v,"props":"{}"}"""
    }
    // bulk: 3 hours of events, one per minute
    (0 until 180).foreach { i =>
      val m = i % 60; val h = i / 60
      client.append("events", 0, null,
        js(i, f"2024-01-01 0$h%d:$m%02d:00", 1.0).getBytes)
    }
    // straggler: 2.5 hours late, appended after everything else
    client.append("events", 0, null, js(999, "2024-01-01 00:30:30", 100.0).getBytes)

    val events = StreamingQueries.readEvents(spark, lateRoot.toString, "events",
      Map("maxRecordsPerTrigger" -> "50")) // several triggers → watermark advances past straggler
    val out = runToMemory(
      StreamingQueries.tumblingCounts(events, "1 hour", "10 minutes"), "late", "append")
      .collect().map(r => (r.getTimestamp(0).toString, r.getLong(1), r.getDouble(2))).toMap2

    // hour-0 window finalized before the straggler arrived: count 60, sum 60
    val hour0 = out.keys.find(_.startsWith("2024-01-01 00:00"))
    assert(hour0.isDefined, s"hour-0 window missing from $out")
    assert(out(hour0.get) === ((60L, 60.0)), s"straggler leaked into $out")
  }

  private implicit class MapOps(rows: Array[(String, Long, Double)]) {
    def toMap2: Map[String, (Long, Double)] =
      rows.map { case (k, a, b) => k -> ((a, b)) }.toMap
  }
}
