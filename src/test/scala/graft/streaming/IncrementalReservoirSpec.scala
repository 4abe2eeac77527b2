package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.api.Graft

/** Incremental weighted reservoir ([[IncrementalReservoir]]): after
  * every batch the store equals the batch
  * [[Graft.weightedSamplePerStratum]] over everything admitted so far
  * (exact, not approximate), replays are idempotent, and a crashed
  * store-swap rolls forward. */
class IncrementalReservoirSpec extends SparkTestBase {
  import spark.implicits._

  private def docs(from: Long, until: Long) =
    (from until until)
      .map(i => (s"l${i % 3}", i, (i % 11 + 1).toDouble))
      .toDF("lang", "doc_id", "w")

  private def sampleSet(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r =>
      (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet

  test("store equals the batch sampler over all arrivals, after every batch") {
    val store = Files.createTempDirectory("resv-").toString
    IncrementalReservoir.init(spark, store)
    val batches = Seq(docs(0, 50), docs(50, 120), docs(120, 200))
    var seen = docs(0, 0)
    for (b <- batches) {
      seen = seen.unionByName(b)
      val got = sampleSet(
        IncrementalReservoir.admitBatch(b, "lang", "doc_id", "w", 10, store))
      val want = sampleSet(
        Graft.weightedSamplePerStratum(seen, "lang", "doc_id", "w", 10)
          .toDF("stratum", "id", "weight", "rank"))
      assert(got === want, "incremental store must equal the batch sampler")
    }
  }

  // Replay idempotence (incl. re-offering evicted rows) and the
  // rename-window crash roll-forward are covered by the shared
  // StoreContractSpec harness.

  test("zero and negative weights are never admitted") {
    val store = Files.createTempDirectory("resv-w-").toString
    IncrementalReservoir.init(spark, store)
    val b = Seq(("a", 1L, 0.0), ("a", 2L, -3.0), ("a", 3L, 1.0)).toDF("lang", "doc_id", "w")
    val got = IncrementalReservoir.admitBatch(b, "lang", "doc_id", "w", 5, store)
    assert(got.select(col("id")).collect().map(_.getLong(0)).toSeq === Seq(3L))
  }
}
