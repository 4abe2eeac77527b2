package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkTestBase
import graft.ops.Tables
import graft.sources.FileStreamClient

/** The stateful operators against the RocksDB state store — the 100 TB
  * state deployment ([[StateStores]]): state lives off-heap in native
  * RocksDB instances instead of executor-heap hash maps. The sf0.01
  * feed keys dedup state by event_id (10k live keys within the
  * watermark horizon — orders of magnitude more state rows than any
  * other suite) and the custom sessionizer by user, and both must
  * produce results identical to the heap-backed provider's semantics.
  * The state-operator metrics prove RocksDB actually served the query
  * (a silently ignored conf would pass a results-only test). */
class RocksDBStateSpec extends SparkTestBase {
  private val dir = "/root/testdata/sf0.01"

  override def beforeAll(): Unit = {
    super.beforeAll()
    StateStores.useRocksDB(spark)
  }

  override def afterAll(): Unit = {
    StateStores.useDefault(spark)
    super.afterAll()
  }

  private lazy val root = {
    val r = Files.createTempDirectory("rocks-events-")
    new FileStreamClient(r).createStream("events", 4)
    Tables.events(spark, dir)
      .orderBy(col("ts"))
      .select(
        to_json(struct(col("event_id"), unix_micros(col("ts")).as("ts_us"),
          col("user_id"), col("event_type"), col("value"), col("props"))).as("value"),
        pmod(col("user_id"), lit(4)).cast("int").as("partition"))
      .coalesce(1)
      .write.format("dis")
      .option("client.root", r.toString).option("stream", "events")
      .mode("append").save()
    r
  }

  test("streaming dedup over 10k keys runs on RocksDB state and stays exact") {
    val events = StreamingQueries.readEvents(spark, root.toString, "events",
      Map("maxRecordsPerTrigger" -> "2000"))
    val q = StreamingQueries.dedupEvents(events).select(col("event_id"))
      .writeStream.format("memory").queryName("rocksdedup")
      .outputMode("append")
      .option("checkpointLocation", Files.createTempDirectory("ck-rocksdedup-").toString)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(180000)

    val progress = q.recentProgress.filter(_.stateOperators.nonEmpty)
    assert(progress.nonEmpty, "no stateful progress recorded")
    val metrics = progress.last.stateOperators.head.customMetrics
    assert(metrics.keySet.asScala.exists(_.startsWith("rocksdb")),
      s"state metrics carry no rocksdb counters: ${metrics.keySet}")

    val ids = spark.table("rocksdedup").collect().map(_.getLong(0))
    assert(ids.length === ids.distinct.length, "duplicates survived dedup")
    assert(ids.length === 10000, s"expected all 10k distinct event_ids, got ${ids.length}")
  }

  test("custom-state sessionizer matches batch session_window on RocksDB") {
    val events = StreamingQueries.readEvents(spark, root.toString, "events",
      Map("maxRecordsPerTrigger" -> "2000"))
    val q = StreamingQueries.sessionizeWithState(spark, events)
      .toDF()
      .select(col("user_id"), timestamp_micros(col("start_us")).as("s"),
        timestamp_micros(col("end_us")).as("e"), col("n_events"))
      .writeStream.format("memory").queryName("rockssess")
      .outputMode("append")
      .option("checkpointLocation", Files.createTempDirectory("ck-rockssess-").toString)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(180000)

    val streamed = spark.table("rockssess").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getLong(3))).toSet
    val batch = Tables.events(spark, dir)
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("session_window.start"),
        col("session_window.end"), col("n_events"))
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getLong(3))).toSet

    assert(streamed.nonEmpty)
    assert(streamed.subsetOf(batch), s"phantom sessions: ${(streamed -- batch).take(5)}")
    val maxTs = Tables.events(spark, dir).agg(max(col("ts"))).collect().head.getTimestamp(0)
    val horizon = new java.sql.Timestamp(maxTs.getTime - 10 * 60 * 1000)
    val finalized = batch.filter(_._3.getTime <= horizon.getTime)
    assert(finalized.subsetOf(streamed), s"missing sessions: ${(finalized -- streamed).take(5)}")
  }

  private implicit class JavaSetOps[T](s: java.util.Set[T]) {
    def asScala: Set[T] = {
      val b = Set.newBuilder[T]
      s.forEach(e => b += e)
      b.result()
    }
  }
}
