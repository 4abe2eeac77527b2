package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Accuracy bounds for the approximate operators that have no SQL
  * oracle (the driver only rows-checks them): HLL distinct counts and
  * IVF approximate kNN. */
class ApproxOpsSpec extends SparkTestBase {
  private val dir = "/root/testdata/sf0.001"

  test("q_dedup_approx: HLL estimate within 5% of exact distinct per key") {
    val approx = CoreQueries.qDedupApprox(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet === exact.keySet)
    exact.foreach { case (k, n) =>
      assert(math.abs(approx(k) - n) <= math.max(1L, (n * 0.05).toLong),
        s"$k: approx ${approx(k)} vs exact $n")
    }
  }

  test("q_similarity_ivf: well-formed per-query top-k with sane recall vs exact") {
    val exact = SimilarityQueries.qSimilarityKnn(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = SimilarityQueries.qSimilarityIvf(spark, dir).collect()

    val byQuery = ivf.groupBy(_.getLong(0))
    assert(byQuery.keySet === (0L until 10L).toSet)
    byQuery.foreach { case (q, rows) =>
      assert(rows.length === 5, s"query $q returned ${rows.length} neighbors")
      val ranked = rows.sortBy(_.getLong(2))
      assert(ranked.map(_.getLong(2)).toSeq === (1L to 5L), s"query $q ranks")
      // cos non-increasing with rank
      val cosSeq = ranked.map(_.getDouble(3)).toSeq
      assert(cosSeq === cosSeq.sorted.reverse, s"query $q cos ordering")
      assert(!rows.exists(_.getLong(1) == q), s"query $q returned itself")
    }
    val ivfPairs = ivf.map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (ivfPairs intersect exact).size.toDouble / exact.size
    // random 64-d embeddings have weak cluster structure; the probe-4-of-16
    // expectation is ~4/16 of the corpus scanned, so recall well above that
    // floor indicates the cell assignment/probing works
    assert(recall >= 0.25, s"IVF recall $recall too low")
  }
}
