package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.SparkTestBase
import graft.sources.FileStreamClient

/** RocksDB parity for the five keyed-state arms that RocksDBStateSpec
  * does not cover (it pins streaming dedup + the custom sessionizer):
  * [[StreamingSft.assembleSessions]], [[StreamingBestOfN.selectBest]],
  * [[StreamingBestOfN.advantages]], [[StreamingRlMetrics.monitor]] and
  * [[StreamingQueries.domainQuota]]. Each arm's Scaladoc claims the
  * 100 TB state deployment; this spec backs the claim per arm: the
  * SAME input stream is run once on the default (heap-backed) provider
  * and once on RocksDB with changelog checkpointing
  * ([[StateStores.useRocksDB]]), the two result sets must be
  * IDENTICAL, and the RocksDB run's state-operator metrics must prove
  * RocksDB actually served it (a silently ignored provider conf would
  * pass a results-only comparison). */
class RocksDBArmsSpec extends SparkTestBase {

  private val Min = 60L * 1000000L
  private val Hour = 60L * Min
  private val T0 = 1600000000L * 1000000L

  /** (user_id, ts_us, event_id, event_type, value, props) — two
    * multi-candidate pools per arm concern (value ties, a zero-pass
    * pool, odd/even turn counts for SFT) + the watermark sentinel. */
  private val events: Seq[(Long, Long, Long, String, Double, String)] = Seq(
    (1L, T0 + 0 * Min, 111L, "gen", 10.0, "p-a"),
    (1L, T0 + 2 * Min, 112L, "gen", 65.0, "p-b"),
    (1L, T0 + 4 * Min, 113L, "gen", 65.0, "p-c"),
    (1L, T0 + 6 * Min, 114L, "gen", 80.0, "p-d"),
    (1L, T0 + 8 * Min, 115L, "gen", 55.0, "p-e"),
    (2L, T0 + 20 * Min, 213L, "gen", 40.0, "q-a"),
    (2L, T0 + 15 * Min, 211L, "gen", 55.0, "q-b"), // out of order
    (2L, T0 + 25 * Min, 215L, "gen", 10.0, "q-c"),
    (2L, T0 + 17 * Min, 212L, "gen", 25.0, "q-d"),
    (999L, T0 + 13 * Hour, 901L, "gen", 0.0, "zz")) // sentinel

  private lazy val evRoot = {
    import spark.implicits._
    val r = Files.createTempDirectory("rocksarms-ev-")
    new FileStreamClient(r).createStream("events", 1)
    events.toDF("user_id", "ts_us", "event_id", "event_type", "value", "props")
      .select(to_json(struct(col("event_id"), col("ts_us"), col("user_id"),
        col("event_type"), col("value"), col("props"))).as("value"),
        lit(0).cast("int").as("partition"))
      .coalesce(1)
      .write.format("dis")
      .option("client.root", r.toString).option("stream", "events")
      .mode("append").save()
    r.toString
  }

  /** (source, doc_id) for the quota arm — 3 domains, 8 docs each. */
  private lazy val docRoot = {
    import spark.implicits._
    val r = Files.createTempDirectory("rocksarms-doc-")
    new FileStreamClient(r).createStream("docs", 1)
    (0 until 24).map(i => (s"dom${i % 3}", i.toLong))
      .toDF("source", "doc_id")
      .select(to_json(struct(col("source"), col("doc_id"))).as("value"),
        lit(0).cast("int").as("partition"))
      .coalesce(1)
      .write.format("dis")
      .option("client.root", r.toString).option("stream", "docs")
      .mode("append").save()
    r.toString
  }

  private def readEv(perTrigger: Int): DataFrame =
    StreamingQueries.readEvents(spark, evRoot, "events",
      Map("startingOffsets" -> "earliest",
        "maxRecordsPerTrigger" -> perTrigger.toString))

  private def readDocs(perTrigger: Int): DataFrame = {
    import org.apache.spark.sql.types._
    spark.readStream.format("dis")
      .option("client.root", docRoot)
      .option("stream", "docs")
      .option("startingOffsets", "earliest")
      .option("maxRecordsPerTrigger", perTrigger.toString)
      .load()
      .select(from_json(col("value").cast("string"), StructType(Seq(
        StructField("source", StringType), StructField("doc_id", LongType)))).as("d"))
      .select(col("d.*"))
  }

  /** Run `plan` to completion on a memory sink; returns (rows-as-set,
    * whether any state operator reported rocksdb counters). */
  private def run(name: String, plan: DataFrame): (Set[String], Boolean) = {
    val q: StreamingQuery = plan.writeStream.format("memory").queryName(name)
      .outputMode("append")
      .option("checkpointLocation", Files.createTempDirectory(s"ck-$name-").toString)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(180000)
    val rocks = q.recentProgress.filter(_.stateOperators.nonEmpty).exists { p =>
      val ks = p.stateOperators.head.customMetrics.keySet
      val b = Set.newBuilder[String]; ks.forEach(k => b += k)
      b.result().exists(_.startsWith("rocksdb"))
    }
    (spark.table(name).collect().map(_.toString).toSet, rocks)
  }

  /** The parity contract: default-store vs RocksDB runs of the same
    * plan produce identical rows; the RocksDB run really used RocksDB. */
  private def parity(name: String)(plan: => DataFrame): Unit = {
    val (defaultRows, defaultRocks) = run(s"${name}_default", plan)
    assert(!defaultRocks, s"$name: default run unexpectedly on rocksdb")
    assert(defaultRows.nonEmpty, s"$name: fixture produced no output rows")
    StateStores.useRocksDB(spark)
    try {
      val (rocksRows, usedRocks) = run(s"${name}_rocks", plan)
      assert(usedRocks, s"$name: rocksdb provider conf was silently ignored")
      assert(rocksRows === defaultRows,
        s"$name: rocksdb output diverges from the default store")
    } finally StateStores.useDefault(spark)
  }

  test("StreamingSft.assembleSessions: RocksDB == default store") {
    parity("sft")(StreamingSft.assembleSessions(spark, readEv(3),
      watermark = "2 hours").toDF()
      .filter(col("user_id") =!= 999L))
  }

  test("StreamingBestOfN.selectBest: RocksDB == default store") {
    parity("bestofn")(StreamingBestOfN.selectBest(spark, readEv(3),
      quietUs = 30L * Min, watermark = "2 hours").toDF()
      .filter(col("user_id") =!= 999L))
  }

  test("StreamingBestOfN.advantages: RocksDB == default store") {
    parity("grpo")(StreamingBestOfN.advantages(spark, readEv(3),
      quietUs = 30L * Min, watermark = "2 hours").toDF()
      .filter(col("user_id") =!= 999L))
  }

  test("StreamingRlMetrics.monitor: RocksDB == default store") {
    parity("rlmon")(StreamingRlMetrics.monitor(spark, readEv(3),
      quietUs = 30L * Min, watermark = "2 hours").toDF()
      .filter(col("user_id") =!= 999L))
  }

  test("domainQuota: RocksDB == default store") {
    parity("quota")(StreamingQueries.domainQuota(
      spark, readDocs(5), "source", "doc_id", 5).toDF())
  }
}
