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
}
