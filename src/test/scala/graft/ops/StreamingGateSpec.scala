package graft.ops

import graft.SparkTestBase

/** The streaming KMV gate binding: the sketch's associative
  * union-then-trim merge makes the streamed estimate bit-identical to
  * the batch aggregate, whatever the micro-batching. */
class StreamingGateSpec extends SparkTestBase {

  test("streaming KMV estimate is bit-identical to the batch sketch") {
    val dir = "/root/testdata/sf0.001"
    val s = ConnectorQueries.qStreamingKmv(spark, dir).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val b = CoreQueries.qDistinctKmv(spark, dir).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(s == b, s"streamed $s != batch $b")
    assert(s.nonEmpty && !s.contains("flush"))
  }

  test("group pass: the leader's shared AvailableNow run deposits every " +
      "member's rows, identical to the arm contracts") {
    val dir = "/root/testdata/sf0.001"
    // sessions group — leader runs all five arms in one concurrent pass
    val bofn = ConnectorQueries.qStreamingBestOfN(spark, dir)
    assert(bofn.count() > 0, "leader arm returned no rows")
    // kmv through the DEPOSIT path keeps the bit-identical-to-batch
    // contract the solo test pins
    val s = ConnectorQueries.qStreamingKmv(spark, dir).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val b = CoreQueries.qDistinctKmv(spark, dir).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(s == b, s"deposited kmv $s != batch $b")
    assert(ConnectorQueries.qStreamingSessionize(spark, dir).count() > 0)
    assert(ConnectorQueries.qStreamingRlMetrics(spark, dir).count() > 0)
    // sft ran inside the group under the RocksDB state store binding
    assert(ConnectorQueries.qStreamingSft(spark, dir).count() > 0)
    // and the provider conf was scoped to that one query, not leaked
    // (unset restores Spark's HDFS-backed default)
    assert(!spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
      .exists(_.contains("RocksDB")),
      "RocksDB provider conf leaked out of the sft binding")

    // docs group — reservoir through the deposit path keeps the
    // byte-identical-to-batch A-Res contract
    val quota = ConnectorQueries.qStreamingDomainQuota(spark, dir)
    assert(quota.count() > 0)
    val res = ConnectorQueries.qStreamingReservoir(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val batchRes = graft.api.Graft.weightedSamplePerStratum(
        Tables.documents(spark, dir), "lang", "doc_id", "n_chars", 20)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(res == batchRes, "deposited reservoir != batch A-Res sample")
    assert(ConnectorQueries.qStreamingPsi(spark, dir).count() > 0)

    // docstext group — admission store arms through one shared pass
    val bm25 = ConnectorQueries.qStreamingBm25(spark, dir)
    assert(bm25.count() > 0)
    assert(ConnectorQueries.qStreamingNeardup(spark, dir).count() > 0)
    assert(ConnectorQueries.qStreamingChunks(spark, dir).count() > 0)
    assert(ConnectorQueries.qStreamingDecontam(spark, dir).count() > 0)
  }
}
