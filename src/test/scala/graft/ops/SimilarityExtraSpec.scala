package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** MMR diverse selection + int8 scalar-quantized top-k: the diversity
  * guarantee, quantizer exactness, and ranking fidelity vs the float
  * kernel. */
class SimilarityExtraSpec extends SparkTestBase {
  import spark.implicits._

  private val Dir = "/root/testdata/sf0.001"

  test("mmr: 10 distinct picks, first is the relevance argmax") {
    val out = SimilarityQueries.qMmrSelect(spark, Dir).collect()
      .sortBy(_.getLong(0))
    assert(out.length == 10)
    assert(out.map(_.getLong(1)).distinct.length == 10)
    // step 1 must equal brute-force rank-1 for query vec 0
    val knn = graft.api.Graft.knn(
      Tables.embeddings(spark, Dir).filter(col("vec_id") > 0), "vec_id", "embedding",
      Tables.embeddings(spark, Dir).filter(col("vec_id") === 0), "vec_id", "embedding", 1)
      .collect()
    assert(out.head.getLong(1) == knn.head.getLong(1))
  }

  test("mmr: near-duplicate of an early pick is deferred, pure top-k keeps it") {
    // query-oblique geometry: a and its exact duplicate a2 are the two
    // most relevant; b is equally relevant but ~orthogonal to a, so
    // after picking a the duplicate's penalty (cos = 1) sinks it below
    // b — with an a ALIGNED to the query no λ=0.7 pick could ever beat
    // an exact duplicate (score_b = 0.4·rel_b ≤ 0.4 = score_dup)
    def v(xs: Double*): Array[Float] = xs.map(_.toFloat).toArray
    val rows = Seq(
      (0L, v(1, 0, 0, 0)),             // the query
      (1L, v(0.70, 0.7141, 0, 0)),     // a
      (2L, v(0.70, 0.7141, 0, 0)),     // a2 = exact duplicate of a
      (3L, v(0.6999, -0.7142, 0, 0)))  // b: same relevance, cos(a,b) ≈ 0
    val emb = rows.toDF("vec_id", "embedding")
    // relevance order is a, a2, b — but after picking a, MMR's penalty
    // on a2 (cos ≈ 1) must defer it behind b
    val q = emb.filter(col("vec_id") === 0).select(col("embedding").as("qv"))
    val rel = emb.filter(col("vec_id") > 0).crossJoin(broadcast(q))
      .select(col("vec_id"),
        round(graft.functions.VecMath.float_dot(col("qv"), col("embedding"))
          / sqrt(graft.functions.VecMath.float_dot(col("qv"), col("qv")))
          / sqrt(graft.functions.VecMath.float_dot(col("embedding"), col("embedding"))), 12).as("rel"))
      .orderBy(col("rel").desc).collect().map(_.getLong(0))
    assert(rel.take(2).toSet == Set(1L, 2L), "top-2 by relevance are the near-dups")
    val sel = SimilarityQueries.mmrGreedy(
      emb.filter(col("vec_id") > 0), "vec_id", "embedding",
      emb.filter(col("vec_id") === 0), "embedding", 3)
    assert(sel.take(2).map(_._2).toSet == Set(rel.head, 3L),
      s"MMR should pick one near-dup then the diverse vector, got ${sel.toSeq}")
  }

  test("mmr: shortlist-sufficiency — doubling shortlistN leaves the selection unchanged (sf1)") {
    // The gate binding feeds a 40-item relevance shortlist to a k=10
    // greedy; the boundedness argument ("the greedy never needs more
    // than the top-40") is what keeps the gate hash stable. This makes
    // it CHECKABLE at the ×10 amplified scale: with twice the
    // shortlist the greedy must pick the same ids with the same scores
    // — if the 40-cut ever under-covered, the 80-run would diverge
    // here before the driver's hash could move.
    val sf1 = "target/sf1"
    assume(new java.io.File(s"$sf1/embeddings.parquet").exists,
      "amplified sf1 fixture not built on this machine")
    val emb = Tables.embeddings(spark, sf1)
    def run(n: Int): Seq[(Long, Long, Double)] = SimilarityQueries.mmrGreedy(
      emb.filter(col("vec_id") > 0), "vec_id", "embedding",
      emb.filter(col("vec_id") === 0), "embedding", 10, shortlistN = n)
    val base = run(40)
    assert(base.length == 10)
    assert(run(80) == base, "a 2x shortlist changed the MMR selection — " +
      "the gate's 40-cut under-covers at sf1")
  }

  test("sq8: quantized cosine tracks the float kernel") {
    val out = SimilarityQueries.qSimilaritySq8(spark, Dir)
    val rows = out.collect()
    // 10 queries × 5 ranks
    assert(rows.length == 50)
    assert(rows.map(r => (r.getLong(0), r.getLong(2))).distinct.length == 50)
    // quantized cosine stays a cosine
    assert(rows.forall(r => math.abs(r.getDouble(3)) <= 1.0 + 1e-9))
    // top-1 agreement with the exact float kernel: the per-vector
    // absmax scale cancels in the cosine, so only near-tie margins
    // (quantization noise ~1/127 per component) can flip
    val emb = Tables.embeddings(spark, Dir)
    val exact = graft.api.Graft.knn(emb, "vec_id", "embedding",
      emb.filter(col("vec_id") < 10), "vec_id", "embedding", 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val sq1 = rows.filter(_.getLong(2) == 1L)
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val agree = exact.count { case (q, n) => sq1.get(q).contains(n) }
    assert(agree >= 8, s"sq8 top-1 agrees with exact on $agree/10 queries")
  }

  test("sq8: zero vector quantizes to all-zero codes, not NaN") {
    val rows = Seq(
      (0L, Array.fill(64)(0.5f)),
      (1L, Array.fill(64)(0.0f)), // all-zero: amax = 0 guard
      (2L, Array.fill(64)(1.0f)))
    val emb = rows.toDF("vec_id", "embedding")
    // reuse the gate quantizer by scoring query 0 against 1 and 2
    val coded = emb
      .withColumn("amax", aggregate(col("embedding"), lit(0.0),
        (a, x) => greatest(a, abs(x.cast("double")))))
      .withColumn("codes", when(col("amax") === 0.0,
          transform(col("embedding"), _ => lit(0)))
        .otherwise(transform(col("embedding"),
          x => floor(x.cast("double") / col("amax") * 127.0 + 0.5).cast("int"))))
      .select(col("vec_id"), col("codes")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(coded(1L).forall(_ == 0))
    assert(coded(0L).forall(_ == 127) && coded(2L).forall(_ == 127))
  }

  test("ece: bins partition the corpus with exact integer gaps") {
    val docs = Tables.documents(spark, Dir)
    val out = ClassifyQueries.qEceCalibration(spark, Dir).collect()
    assert(out.map(_.getLong(0)).forall(b => b >= 0 && b <= 9))
    assert(out.map(_.getLong(1)).sum == docs.count())
    out.foreach { r =>
      val (n, pos, confSum, gap) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(pos <= n)
      assert(confSum <= 1000L * n)
      assert(gap == math.abs(1000L * pos - confSum))
    }
  }

  test("ece: hand-computed bins on a tiny corpus") {
    // doc 0: 2 stopword hits of 4 tokens -> conf 500, bin 5, en
    // doc 1: 0 hits of 2 tokens -> conf 0, bin 0, de
    // doc 2: 4 hits of 4 tokens -> conf 1000, bin 9 (capped), en
    val docs = Seq(
      (0L, "the cat of war", "en"),
      (1L, "katze hund", "de"),
      (2L, "the of to in", "en"))
      .toDF("doc_id", "text", "lang")
      .withColumn("source", lit("s")).withColumn("n_chars", lit(1L))
    val tmp = java.nio.file.Files.createTempDirectory("ece").toString
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = ClassifyQueries.qEceCalibration(spark, tmp).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(out(5L) == ((1L, 1L, 500L, 500L)))
    assert(out(0L) == ((1L, 0L, 0L, 0L)))
    assert(out(9L) == ((1L, 1L, 1000L, 0L)))
  }
}
