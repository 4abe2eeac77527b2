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

  test("q_distinct_kmv: estimate within 4/sqrt(k-2) of exact per key, " +
      "EXACT below k, partitioning-invariant") {
    import spark.implicits._
    val approx = CoreQueries.qDistinctKmv(spark, dir)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val exact = Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet === exact.keySet)
    exact.foreach { case (key, n) =>
      if (n < 64) assert(approx(key) === n.toDouble, s"$key must be exact below k")
      // 4 std errors of the KMV estimator (σ ≈ n/√(k−2))
      else assert(math.abs(approx(key) - n) <= 4.0 * n / math.sqrt(62.0),
        s"$key: kmv ${approx(key)} vs exact $n")
    }
    // the sketch is a pure function of the data: any partitioning of
    // the same rows gives the same distinct hashes, ranks and estimate
    val df = Tables.events(spark, dir).select(col("event_type"), col("user_id"))
    val a = graft.api.Graft.kmvDistinct(df, "event_type", "user_id", 64)
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSet
    val b = graft.api.Graft.kmvDistinct(df.repartition(13), "event_type", "user_id", 64)
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSet
    assert(a === b)
    // duplicates collapse: the estimate sees distinct VALUES, so a
    // corpus with every row duplicated 3x reports the same number
    val tripled = df.union(df).union(df)
    val c = graft.api.Graft.kmvDistinct(tripled, "event_type", "user_id", 64)
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSet
    assert(c === a)
    // k bigger than every key's cardinality degrades to exact counting
    val small = Seq(("x", 1L), ("x", 2L), ("x", 2L), ("y", 7L))
      .toDF("event_type", "user_id")
    val ex = graft.api.Graft.kmvDistinct(small, "event_type", "user_id", 64)
      .collect().map(r => (r.getString(0), r.getDouble(1))).toMap
    assert(ex === Map("x" -> 2.0, "y" -> 1.0))
  }

  test("kmvDistinct input contract: non-integral value columns rejected " +
      "loudly, NULL values dropped, negative ids hash sign-safely") {
    import spark.implicits._
    // strings would cast("long") to NULL and collapse every value to one
    // hash — reject at plan time instead of reporting 1.0 silently
    val strs = Seq(("x", "alpha"), ("x", "beta")).toDF("event_type", "user_id")
    val err = intercept[IllegalArgumentException] {
      graft.api.Graft.kmvDistinct(strs, "event_type", "user_id", 64)
    }
    assert(err.getMessage.contains("integral"), err.getMessage)
    // NULL values don't contribute a distinct hash (count-distinct NULL
    // semantics): (1, 2, NULL) counts 2; a NULL-only key has no
    // sketchable rows and drops out entirely (both engines filter
    // NULLs before grouping, so the oracle agrees)
    val withNulls = Seq(("x", java.lang.Long.valueOf(1L)),
      ("x", java.lang.Long.valueOf(2L)), ("x", null.asInstanceOf[java.lang.Long]),
      ("y", null.asInstanceOf[java.lang.Long]))
      .toDF("event_type", "user_id")
    val got = graft.api.Graft.kmvDistinct(withNulls, "event_type", "user_id", 64)
      .collect().map(r => (r.getString(0), r.getDouble(1))).toMap
    assert(got === Map("x" -> 2.0))
    // negative ids: Spark's pmod keeps the hash in [0, 2^31) — the
    // same value the oracle's ((x % m + m) % m) replay computes — and
    // distinct negatives stay distinct
    val negs = Seq(("x", -5L), ("x", -6L), ("x", -5L)).toDF("event_type", "user_id")
    val gn = graft.api.Graft.kmvDistinct(negs, "event_type", "user_id", 64)
      .collect().map(r => (r.getString(0), r.getDouble(1))).toMap
    assert(gn === Map("x" -> 2.0))
  }

  test("q_profile_approx: HLL n_distinct within 5% of the exact profile, " +
      "all other stats identical") {
    val approx = ClassifyQueries.qProfileApprox(spark, dir)
      .collect().map(r => r.getString(0) -> r).toMap
    val exact = ClassifyQueries.qProfile(spark, dir)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(approx.keySet === exact.keySet)
    exact.foreach { case (c, e) =>
      val a = approx(c)
      assert(a.getLong(1) === e.getLong(1), s"$c n_rows")
      assert(a.getLong(2) === e.getLong(2), s"$c n_nulls")
      val (ad, ed) = (a.getLong(3), e.getLong(3))
      assert(math.abs(ad - ed) <= math.max(1L, (ed * 0.05).toLong),
        s"$c: approx distinct $ad vs exact $ed")
    }
  }

  test("q_percentiles: approx_percentile within ±2% RANK of the exact quantile per key") {
    // The sketch guarantees rank error (≤ 1/accuracy), not value error —
    // and approx_percentile returns a data value (nearest rank) while
    // percentile() interpolates, so value-compare would fail on small
    // groups even with a perfect sketch. Bound each approx value by the
    // exact interpolated quantiles at q ± 0.02.
    val approx = CoreQueries.qPercentiles(spark, dir)
      .collect().map(r => r.getString(0) -> Seq(r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    val qs = Seq(0.5, 0.9, 0.99)
    val boundsExprs = qs.flatMap { q =>
      val lo = math.max(q - 0.02, 0.0); val hi = math.min(q + 0.02, 1.0)
      Seq(expr(s"percentile(value, $lo)"), expr(s"percentile(value, $hi)"))
    }
    val bounds = Tables.events(spark, dir).groupBy(col("event_type"))
      .agg(boundsExprs.head, boundsExprs.tail: _*)
      .collect().map(r => r.getString(0) -> (1 to 6).map(r.getDouble)).toMap
    assert(approx.keySet === bounds.keySet)
    approx.foreach { case (k, vals) =>
      qs.indices.foreach { i =>
        val (lo, hi) = (bounds(k)(2 * i), bounds(k)(2 * i + 1))
        assert(vals(i) >= lo - 1e-9 && vals(i) <= hi + 1e-9,
          s"$k q=${qs(i)}: approx ${vals(i)} outside exact rank window [$lo, $hi]")
      }
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
    // the stride-index gate binding (round 13: hash-oracle-able, no
    // k-means) probes 10 of ~24 cells with ×2 spill — measured 0.88
    // here, DETERMINISTIC (the index is a data-derived rule, no
    // sampling), so the bound is a regression tripwire, not a gamble
    assert(recall >= 0.8, s"IVF recall $recall too low for the stride index")
  }

  test("q_similarity_ivf: recall bound holds at the gate scale too") {
    val gateDir = "/root/testdata/sf0.01"
    val exact = SimilarityQueries.qSimilarityKnn(spark, gateDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = SimilarityQueries.qSimilarityIvf(spark, gateDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (ivf intersect exact).size.toDouble / exact.size
    assert(recall >= 0.8, s"IVF recall $recall at sf0.01") // measured 0.86
  }

  test("trained IVF (spherical k-means, the production path) beats the " +
      "stride gate binding's recall on both fixtures") {
    // the gate replays the stride rule for the oracle; production
    // TRAINS — this pins that training keeps paying for itself
    for (d <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val emb = Tables.embeddings(spark, d)
      val q = emb.filter(org.apache.spark.sql.functions.col("vec_id") < 10)
      val exact = graft.api.Graft.knn(emb, "vec_id", "embedding",
        q, "vec_id", "embedding", 5)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val trained = graft.api.Graft.ivfKnn(emb, "vec_id", "embedding",
        q, "vec_id", "embedding", 5, Ivf.Params())
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val recall = (trained intersect exact).size.toDouble / exact.size
      assert(recall >= 0.9, s"trained IVF recall $recall at $d") // 0.96/0.94
    }
  }

  test("IVF auto-sizing: nlist ≈ √n clamped, nprobe ≈ nlist/3, cells balanced") {
    val p = Ivf.Params()
    // sizing law: √n clamped to [16, sampleCap]
    assert(p.resolveNlist(100L) === 16)
    assert(p.resolveNlist(1000000L) === 1000)
    assert(p.resolveNlist(100000000000L) === p.sampleCap)
    assert(p.resolveNprobe(16) === 6)
    assert(p.resolveNprobe(1000) === 334)
    // explicit values pass through untouched (clamped to cell count)
    assert(Ivf.Params(nlist = 7, nprobe = 3).resolveNlist(1000000L) === 7)
    assert(Ivf.Params(nprobe = 99).resolveNprobe(10) === 10)

    val emb = Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding"))
    val n = emb.count()
    val centroids = Ivf.trainCentroids(emb, "vec_id", "embedding", p)
    assert(centroids.length === p.resolveNlist(n),
      s"trained ${centroids.length} cells for n=$n")
    // balance: trained Voronoi cells must not collapse — the largest
    // home cell stays within a small factor of the mean population, so
    // the downstream cell equi-join has no quadratic hot cell
    val sizes = Ivf.assign(emb, "vec_id", "embedding", centroids, 1)
      .groupBy(col("cell")).count()
      .collect().map(_.getLong(1))
    val mean = n.toDouble / centroids.length
    assert(sizes.max <= 4.0 * mean,
      s"hot cell ${sizes.max} vs mean $mean over ${centroids.length} cells")
    assert(sizes.length >= centroids.length / 2,
      s"only ${sizes.length} of ${centroids.length} cells populated")
  }

  test("pqKnn with a full-corpus shortlist equals exact knn bit for bit") {
    // rerank·k ≥ n makes the ADC shortlist the whole corpus, so the
    // exact-cosine rerank IS the exact kNN: any divergence would be a
    // bug in the code/shortlist/merge plumbing, not approximation
    val emb = Tables.embeddings(spark, dir)
    val n = emb.count().toInt
    val queries = emb.filter(col("vec_id") < 10)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).sorted.toSeq
    val exact = rows(graft.api.Graft.knn(emb, "vec_id", "embedding",
      queries, "vec_id", "embedding", 5))
    val pq = rows(graft.api.Graft.pqKnn(emb, "vec_id", "embedding",
      queries, "vec_id", "embedding", 5, rerank = n / 5 + 1))
    assert(pq === exact)
  }

  test("q_similarity_pq: well-formed top-k, exact cos values, recall vs exact") {
    val exactRows = SimilarityQueries.qSimilarityKnn(spark, dir).collect()
    val exact = exactRows.map(r => (r.getLong(0), r.getLong(1))).toSet
    val exactCos = exactRows.map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    val pq = SimilarityQueries.qSimilarityPq(spark, dir).collect()
    val byQuery = pq.groupBy(_.getLong(0))
    assert(byQuery.keySet === (0L until 10L).toSet)
    byQuery.foreach { case (q, rows) =>
      assert(rows.length === 5, s"query $q returned ${rows.length} neighbors")
      assert(rows.sortBy(_.getLong(2)).map(_.getLong(2)).toSeq === (1L to 5L))
      assert(!rows.exists(_.getLong(1) == q), s"query $q returned itself")
    }
    // the REPORTED cos of any true-neighbor hit is the exact cosine —
    // rerank computes it on the original vectors
    pq.foreach { r =>
      val key = (r.getLong(0), r.getLong(1))
      exactCos.get(key).foreach(c => assert(r.getDouble(3) === c, s"$key cos drifted"))
    }
    val recall = (pq.map(r => (r.getLong(0), r.getLong(1))).toSet intersect exact).size.toDouble / exact.size
    // stride codebooks since round 13 (hash-oracle-able): measured
    // 0.86 here, deterministic — the bound is a regression tripwire
    assert(recall >= 0.7, s"PQ recall $recall with 8x rerank shortlist")
  }

  test("trained PQ codebooks (k-means, the production path) hold the " +
      "recall floor the stride gate binding is held to") {
    val emb = Tables.embeddings(spark, dir)
    val queries = emb.filter(col("vec_id") < 10)
    val exact = graft.api.Graft.knn(emb, "vec_id", "embedding",
      queries, "vec_id", "embedding", 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val trained = graft.api.Graft.pqKnn(emb, "vec_id", "embedding",
      queries, "vec_id", "embedding", 5, rerank = 8) // default trained Params
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (trained intersect exact).size.toDouble / exact.size
    assert(recall >= 0.7, s"trained PQ recall $recall")
  }

  test("q_similarity_pq: recall bound holds at the gate scale too (sf0.01)") {
    val gateDir = "/root/testdata/sf0.01"
    val exact = SimilarityQueries.qSimilarityKnn(spark, gateDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val pq = SimilarityQueries.qSimilarityPq(spark, gateDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (pq intersect exact).size.toDouble / exact.size
    assert(recall >= 0.7, s"PQ recall $recall at sf0.01")
  }

  test("PQ codebooks save/load round-trips and is partitioning-independent") {
    val emb = Tables.embeddings(spark, dir)
    val cb = Pq.train(emb, "vec_id", "embedding")
    val dirOut = java.nio.file.Files.createTempDirectory("pq_cb").toString
    Pq.save(spark, dirOut, cb)
    val loaded = Pq.load(spark, dirOut)
    assert(loaded.m === cb.m && loaded.ksub === cb.ksub && loaded.dsub === cb.dsub)
    cb.books.indices.foreach(s => cb.books(s).indices.foreach(j =>
      assert(java.util.Arrays.equals(loaded.books(s)(j), cb.books(s)(j)), s"book($s)($j)")))
    // encoding through the loaded books, on a differently-partitioned
    // input, produces identical codes
    def codes(df: org.apache.spark.sql.DataFrame, b: Pq.Codebooks) =
      Pq.encode(df, "vec_id", "embedding", b).collect()
        .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1).toSeq).toMap
    assert(codes(emb.repartition(13), loaded) === codes(emb, cb))
  }

  test("q_compress_ratio: deflate ratio separates repetitive from varied text, " +
      "counts raw UTF-8 bytes, and is partitioning-independent") {
    import spark.implicits._
    val df = Seq(
      (1L, "spam spam spam spam spam spam spam spam spam spam spam spam spam spam " * 8),
      (2L, (0 until 112).map(i => s"w${i * 37 % 997}x${i * 61 % 911}").mkString(" ")),
      (3L, ""),
      (4L, "héllo wörld")) // multi-byte UTF-8
      .toDF("k", "body")
    val out = graft.api.Graft.compressionRatio(df, "k", "body").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    val (rep, varied) = (out(1L)._3, out(2L)._3)
    assert(rep < 0.2, s"repeated text ratio $rep should be tiny")
    assert(varied > 2 * rep, s"varied ($varied) vs repetitive ($rep) not separated")
    assert(out(3L) === ((0L, 0L, 1.0)), "empty text pins ratio 1.0")
    assert(out(4L)._1 === "héllo wörld".getBytes("UTF-8").length.toLong,
      "raw_bytes must count UTF-8 bytes, not chars")
    // deterministic across partitionings (one action each — the kernel
    // holds no cross-row state that could leak between layouts)
    val a = graft.api.Graft.compressionRatio(df.repartition(7), "k", "body")
      .collect().map(r => (r.getLong(0), r.getLong(2))).sorted.toSeq
    val b = out.toSeq.map { case (k, (_, d, _)) => (k, d) }.sorted
    assert(a === b)
    // and the graded entry returns one row per doc
    val gate = TextQueries.qCompressRatio(spark, dir)
    assert(gate.count() === Tables.documents(spark, dir).count())
  }

  test("q_fingerprint64: xxhash64 production path is collision-free on the fixtures " +
      "and partitions identically to exact text equality") {
    val docs = Tables.documents(spark, dir)
    val fp = graft.api.Graft.fingerprint64(docs, "doc_id", "text")
    assert(fp.columns.toSeq === Seq("doc_id", "fp64"))
    assert(fp.count() === docs.count())
    // same text ⇒ same fp (hash is a function) and, on the fixtures,
    // same fp ⇒ same text (no collisions): distinct counts must agree
    // and (text, fp) pairs must be 1:1
    val nText = docs.select("text").distinct().count()
    val nFp = fp.select("fp64").distinct().count()
    assert(nFp === nText, s"xxhash64 collided: $nFp fingerprints for $nText texts")
    val pairs = docs.join(fp, "doc_id").select("text", "fp64").distinct().count()
    assert(pairs === nText, "fp64 is not a pure function of text")
  }

  test("q_fingerprint_poly: mod-2^64 polynomial — pinned values incl. " +
      "astral text, null/empty -> null, collision-free on the fixtures") {
    import spark.implicits._
    // reference values computed independently (python: acc = (acc*31 +
    // ord(ch)) % 2**64 over code points, mapped to signed) — pins the
    // kernel's wrap arithmetic AND its code-point (not UTF-16) walk:
    // 𝄞 is supplementary-plane, one element on both engines
    val fx = Seq((1L, "hello world"), (2L, ""), (3L, null),
      (4L, "naïve ☃ text 𝄞")).toDF("doc_id", "text")
    val got = graft.api.Graft.polyFingerprint64(fx, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getLong(1))).toMap
    assert(got(1L) === 88006926820958916L)
    assert(got(2L) === null)
    assert(got(3L) === null)
    assert(got(4L) === 1494079257533279965L)
    // 64-bit width: injective on the fixture corpus, like xxhash64
    val docs = Tables.documents(spark, dir)
    val fp = graft.api.Graft.polyFingerprint64(docs, "doc_id", "text")
    val nText = docs.select("text").distinct().count()
    assert(fp.select("fp64").distinct().count() === nText)
  }
}
