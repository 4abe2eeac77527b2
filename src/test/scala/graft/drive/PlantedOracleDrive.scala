package graft.drive

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Scale-correctness evidence for the 12 gate queries whose DuckDB
  * ORACLE formulation is intentionally quadratic (all-pairs SQL the
  * engine exists to avoid): their sf0.01 gate rows pin exact
  * correctness; THIS drive pins sf1 behavior with linear-cost
  * PLANTED-PAIR oracles. Known duplicate/near-dup pairs with globally
  * unique vocabulary (text) or exact-copy vectors (embeddings) are
  * injected into the amplified corpus under ids ≥ 10¹¹; the
  * AmplifyDrive construction (per-copy token suffixes, Rademacher
  * sign patterns) makes unintended text matches with the base corpus
  * impossible, so the expected planted result set is known EXACTLY —
  * recall and, where lossless features allow, full precision are
  * asserted on the planted slice while the production gate bindings
  * run unmodified at sf1 scale.
  *
  * Emits one `PLANTED <query> ok=<bool> <detail>` line per query, a
  * machine-readable `target/planted_sf1.json` that
  * `tools/check_oracle_sf1.py` merges into its report, and a nonzero
  * exit on any failure. */
object PlantedOracleDrive {

  private val PBase = 100000000000L // planted doc ids
  private def firstAvoiding97(start: Long): Long = {
    // a block start whose next 60 ids contain no multiple of 97
    var x = start
    while (x % 97 == 0 || x % 97 > 30) x += 1
    x
  }

  def main(args: Array[String]): Unit = {
    val src = if (args.length > 0) args(0) else "target/sf1"
    val out = if (args.length > 1) args(1) else "target/sf1p"
    // report path + optional query subset — the sf10 drill runs the
    // five heavy gate queries plus the ANN-index family the ×100
    // table pins (round 16 added sq8/pq/ann_recall at 200k vectors):
    //   Test/runMain graft.drive.PlantedOracleDrive target/sf10 \
    //     target/sf10p target/planted_sf10.json \
    //     q_minhash_dupes,q_cross_dedup,q_cluster_dedup,q_knn_classify_ivf,q_hard_negatives_ivf,q_similarity_sq8,q_similarity_pq,q_ann_recall
    val jsonOut = if (args.length > 2) args(2) else "target/planted_sf1.json"
    val subset: Option[Set[String]] =
      if (args.length > 3) Some(args(3).split(',').map(_.trim).filter(_.nonEmpty).toSet)
      else None
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // ---------- planted documents ----------
    def words(tag: String, n: Int = 40): String =
      (0 until n).map(j => s"$tag$j").mkString(" ")
    // F1: identical-text pairs (even, odd) — found by every text-dup op
    val f1 = (0 until 10).flatMap { i =>
      val t = words(s"zqf1p${i}w")
      Seq((PBase + 2 * i, t), (PBase + 2 * i + 1, t))
    }
    // F2: near-dup pairs — last word changed (3-shingle J = 35/41 ≈ 0.854,
    // 16-gram J ≈ 0.9, identical 64-char prefix → edit distance 0)
    val f2 = (0 until 10).flatMap { i =>
      val a = words(s"zqf2p${i}w")
      val b = a.split(" ").dropRight(1).mkString(" ") + s" zqf2p${i}wx"
      Seq((PBase + 1000 + 2 * i, a), (PBase + 1000 + 2 * i + 1, b))
    }
    // F3: an identical triple — one connected cluster of three
    val f3Text = words("zqf3w")
    val f3 = Seq((PBase + 2000, f3Text), (PBase + 2001, f3Text), (PBase + 2002, f3Text))
    val plantedDocs = (f1 ++ f2 ++ f3)
      .map { case (id, t) => (id, t, "en", "plant0", t.length.toLong) }

    // ---------- planted embeddings ----------
    val baseEmb = spark.read.parquet(s"$src/embeddings.parquet")
    val EBase = firstAvoiding97(200000000000L)
    val knnQueryIds = (0L until 10L).toSeq
    // query side of the FIXED panel (vec_id < 100 since round 13);
    // disjoint from knnQueryIds (0-9). The pre-r13 targets (100-145,
    // the old %5 panel) silently filtered to an empty result set —
    // caught by this round's fresh full-sf1 run (0/10).
    val classifyTargets = (50L to 95L by 5L).toSeq
    // hard-negative anchors: in the %20==0 panel, disjoint from the
    // classify targets' vectors
    val hardNegAnchors = Seq(200L, 240L, 280L, 320L, 360L)
    val fetchIds = (knnQueryIds ++ classifyTargets ++ hardNegAnchors).distinct
    val fetched = baseEmb
      .filter(col("vec_id").isin(fetchIds.map(Long.box): _*))
      .select(col("vec_id"), col("embedding"), col("label"))
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1), r.getInt(2)))
    val baseVecs: Map[Long, Seq[Float]] = fetched.map(t => t._1 -> t._2).toMap
    val baseLabels: Map[Long, Int] = fetched.map(t => t._1 -> t._3).toMap
    require(fetchIds.forall(baseVecs.contains), "base query vectors missing")
    require(hardNegAnchors.forall(a => baseLabels(a) != 99),
      "planted label 99 collides with an anchor's own label")

    // knn plants: one exact copy per query id → must be its rank-1
    val knnPlants = knnQueryIds.map(q => (EBase + q, baseVecs(q), 99))
    // classify plants: 5 exact copies per target (train side: id % 5 != 0,
    // id % 97 != 0) labeled 99 → the target's 5-NN vote is unanimous
    val classifyIdPool = Iterator.iterate(EBase + 1000L)(_ + 1L)
      .filter(x => x % 5 != 0 && x % 97 != 0).take(50).toSeq
    val classifyPlants = classifyTargets.zipWithIndex.flatMap { case (t, i) =>
      (0 until 5).map(j => (classifyIdPool(i * 5 + j), baseVecs(t), 99))
    }
    // decontamination plants: 5 planted benchmark vectors (id % 97 == 0)
    // with an exact corpus copy each (id % 97 != 0) → contaminated, with
    // the planted benchmark id as nearest
    val rnd = new java.util.Random(20260814L)
    def randVec(): Seq[Float] = Seq.fill(64)(rnd.nextFloat() - 0.5f)
    val deconBenchIds = (0 until 5).map(j => (300000000000L / 97 + 1 + j) * 97)
    val deconCorpusIds = Iterator.iterate(310000000000L)(_ + 1L)
      .filter(x => x % 97 != 0 && x % 5 != 0).take(5).toSeq
    val deconVecs = (0 until 5).map(_ => randVec())
    val deconPlants = deconBenchIds.zip(deconVecs).map { case (id, v) => (id, v, 99) } ++
      deconCorpusIds.zip(deconVecs).map { case (id, v) => (id, v, 99) }
    // hard-negative plants: 3 exact copies per anchor, labeled 99
    // (≠ every anchor's own label), ids off the anchor (%20) and query
    // (%5) panels and the %97 bench slice → each is a different-label
    // cos-1.0 candidate in the anchor's own probed cell, so the
    // anchor's top-3 negatives are exactly its copies (cos ties break
    // neg_id asc; nothing else reaches cos 1.0)
    val hardNegIdPool = Iterator.iterate(400000000000L)(_ + 1L)
      .filter(x => x % 5 != 0 && x % 97 != 0).take(15).toSeq
    val hardNegPlants = hardNegAnchors.zipWithIndex.flatMap { case (a, i) =>
      (0 until 3).map(j => (hardNegIdPool(i * 3 + j), baseVecs(a), 99))
    }

    // ---------- write the planted fixture dir ----------
    val fs = new java.io.File(out)
    if (fs.exists()) {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm); f.delete(); ()
      }
      rm(fs)
    }
    spark.read.parquet(s"$src/documents.parquet")
      .write.parquet(s"$out/documents.parquet")
    plantedDocs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("append").parquet(s"$out/documents.parquet")
    baseEmb.write.parquet(s"$out/embeddings.parquet")
    val embSchema = StructType(Seq(
      StructField("vec_id", LongType), StructField("embedding", ArrayType(FloatType)),
      StructField("label", IntegerType)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        (knnPlants ++ classifyPlants ++ deconPlants ++ hardNegPlants)
          .map { case (id, v, l) => Row(id, v, l) }, 1),
      embSchema)
      .write.mode("append").parquet(s"$out/embeddings.parquet")

    // ---------- expectations ----------
    val f1Pairs = (0 until 10).map(i => (PBase + 2L * i, PBase + 2L * i + 1)).toSet
    val f2Pairs = (0 until 10).map(i => (PBase + 1000 + 2L * i, PBase + 1000 + 2L * i + 1)).toSet
    val f3Pairs = Set((PBase + 2000, PBase + 2001), (PBase + 2000, PBase + 2002),
      (PBase + 2001, PBase + 2002))
    val all23 = f1Pairs ++ f2Pairs ++ f3Pairs
    val exact13 = f1Pairs ++ f3Pairs
    // cross-dedup: (new = odd id, ref = even id)
    val crossExpected = f1Pairs.map { case (a, b) => (b, a) } ++
      f2Pairs.map { case (a, b) => (b, a) } ++
      Set((PBase + 2001, PBase + 2000), (PBase + 2001, PBase + 2002))
    val clusterExpected =
      (0 until 10).flatMap { i =>
        Seq(PBase + 2L * i -> (PBase + 2L * i), (PBase + 2L * i + 1) -> (PBase + 2L * i)) }.toMap ++
      (0 until 10).flatMap { i =>
        Seq((PBase + 1000 + 2L * i) -> (PBase + 1000 + 2L * i),
          (PBase + 1000 + 2L * i + 1) -> (PBase + 1000 + 2L * i)) }.toMap ++
      Seq(PBase + 2000, PBase + 2001, PBase + 2002).map(_ -> (PBase + 2000)).toMap

    def planted(x: Long): Boolean = x >= PBase

    // ---------- run the gate bindings at sf1 and assert ----------
    val results = scala.collection.mutable.LinkedHashMap.empty[String, (Boolean, String)]
    def check(name: String)(body: DataFrame => (Boolean, String)): Unit = {
      if (subset.exists(!_.contains(name))) return
      val t0 = System.nanoTime()
      val r = try body(graft.SparkEntry.queries(name)(spark, out))
        catch { case e: Throwable => (false, s"exception: ${e.getMessage}") }
      val sec = (System.nanoTime() - t0) / 1e9
      results(name) = r
      println(f"PLANTED $name ok=${r._1} sec=$sec%.1f ${r._2}")
    }
    def pairSet(df: DataFrame, a: String, b: String): Set[(Long, Long)] = df
      .filter(col(a) >= PBase || col(b) >= PBase)
      .select(col(a), col(b)).collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    check("q_minhash_dupes") { df =>
      val got = pairSet(df, "doc_a", "doc_b")
      (got == all23, s"planted pairs ${got.size}/23 (exact-set)")
    }
    check("q_ngram_jaccard") { df =>
      val got = pairSet(df, "doc_a", "doc_b")
      (got == all23, s"planted pairs ${got.size}/23 (exact-set)")
    }
    check("q_simhash_dupes") { df =>
      val got = pairSet(df, "id_a", "id_b")
      (exact13.subsetOf(got) && got.subsetOf(all23),
        s"planted pairs ${got.size}: ⊇13 identical, ⊆23")
    }
    check("q_edit_dupes") { df =>
      val got = pairSet(df, "a_id", "b_id")
      val dists = df.filter(col("a_id") >= PBase).select(col("dist"))
        .collect().map(_.getLong(0)).toSet
      (got == all23 && dists == Set(0L), s"planted pairs ${got.size}/23, dist $dists")
    }
    check("q_cross_dedup") { df =>
      val got = pairSet(df, "new_id", "ref_id")
      (got == crossExpected, s"planted cross pairs ${got.size}/${crossExpected.size} (exact-set)")
    }
    check("q_dup_clusters") { df =>
      val got = df.filter(col("doc_id") >= PBase)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      (got == clusterExpected, s"planted cluster rows ${got.size}/${clusterExpected.size}")
    }
    check("q_cluster_dedup") { df =>
      val got = df.filter(col("doc_id") >= PBase)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      (got == clusterExpected, s"planted rows ${got.size}/${clusterExpected.size}")
    }
    check("q_similarity_knn") { df =>
      val got = df.filter(col("rank") === 1 && col("query_id") < 10)
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(3)))).toMap
      val ok = knnQueryIds.forall(q =>
        got.get(q).exists { case (n, c) => n == EBase + q && c >= 0.999999999999 })
      (ok, s"rank-1 = planted copy for ${got.count { case (q, (n, _)) => n == EBase + q }}/10 queries")
    }
    check("q_similarity_sq8") { df =>
      // an exact copy quantizes to IDENTICAL int8 codes (per-vector
      // absmax scaling is a pure function of the vector), so its
      // quantized cosine is exactly 1.0 — the index's rank-1 for its
      // query unless the int8 grid aliases some other vector to 1.0
      val got = df.filter(col("rank") === 1 && col("query_id") < 10)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val nOk = knnQueryIds.count(q => got.get(q).contains(EBase + q))
      (nOk == knnQueryIds.size,
        s"int8 rank-1 = planted code-identical copy for $nOk/${knnQueryIds.size} queries")
    }
    check("q_similarity_pq") { df =>
      // the copy shares the query's PQ codes, so its ADC score is the
      // query's own quantized self-similarity — inside the 8K ADC
      // shortlist — and the exact re-rank puts its cos-1.0 at rank 1
      val got = df.filter(col("rank") === 1 && col("query_id") < 10)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val nOk = knnQueryIds.count(q => got.get(q).contains(EBase + q))
      (nOk == knnQueryIds.size,
        s"PQ-ADC rank-1 = planted copy for $nOk/${knnQueryIds.size} queries")
    }
    check("q_ann_recall") { df =>
      // index-quality at scale: every planted query's copy must be in
      // BOTH the exact and the int8 top-5 (hits ≥ 1 is the planted
      // floor); the measured mean recall@5 is the pinned index-quality
      // number for BASELINE.md
      val rows = df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      val sub = rows.filter(_._1 < 10)
      val hitsOk = sub.nonEmpty && sub.forall(_._2 >= 1L)
      val mean = if (rows.nonEmpty) rows.map(_._3).sum / rows.length else 0.0
      (hitsOk, f"copy in both top-5s for ${sub.count(_._2 >= 1L)}/${sub.length} " +
        f"planted queries; mean recall@5 = $mean%.2f over ${rows.length} queries")
    }
    check("q_knn_classify") { df =>
      val got = df.filter(col("query_id").isin(classifyTargets.map(Long.box): _*))
        .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2)))).toMap
      val ok = classifyTargets.forall(t => got.get(t).contains((99, 5L)))
      (ok, s"unanimous planted label for ${got.count(_._2 == ((99, 5L)))}/10 targets")
    }
    check("q_embed_neardup") { df =>
      val want = knnQueryIds.map(q => (q, EBase + q)).toSet ++
        classifyTargets.zipWithIndex.flatMap { case (t, i) =>
          (0 until 5).map(j => (t, classifyIdPool(i * 5 + j))) }.toSet ++
        deconBenchIds.zip(deconCorpusIds).map { case (b, c) => (b, c) }.toSet
      val got = df.filter(col("cos") >= 0.999999)
        .select(least(col("vec_a"), col("vec_b")), greatest(col("vec_a"), col("vec_b")))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val wantN = want.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      (wantN.subsetOf(got), s"recall ${wantN.intersect(got).size}/${wantN.size} exact-copy pairs")
    }
    check("q_decontaminate_embed") { df =>
      val got = df.filter(col("vec_id").isin(deconCorpusIds.map(Long.box): _*))
        .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3)))).toMap
      val ok = deconCorpusIds.zip(deconBenchIds).forall { case (c, b) =>
        got.get(c).contains((b, 1L)) }
      (ok, s"flagged-with-planted-nearest ${got.count(_._2._2 == 1L)}/5")
    }
    check("q_phash_dupes") { df =>
      val got = pairSet(df, "doc_a", "doc_b")
      val want = exact13 // identical text → identical blob → hamming 0
      (want.subsetOf(got), s"recall ${want.intersect(got).size}/13 identical-blob pairs")
    }
    check("q_knn_classify_ivf") { df =>
      // approximate path, same plant as q_knn_classify: an exact copy
      // shares the query's cell ranking, so its top-2 assigned cells sit
      // inside the query's 8 probed cells — all 5 copies are candidates
      // at cos 1.0 and the vote is unanimous
      val got = df.filter(col("query_id").isin(classifyTargets.map(Long.box): _*))
        .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2)))).toMap
      val ok = classifyTargets.forall(t => got.get(t).contains((99, 5L)))
      (ok, s"unanimous planted label for ${got.count(_._2 == ((99, 5L)))}/" +
        s"${classifyTargets.size} targets (IVF path)")
    }
    check("q_hard_negatives_ivf") { df =>
      // each planted anchor's 3 cos-1.0 different-label copies must be
      // exactly its rank-1..3 negatives (ties break neg_id asc)
      val want = hardNegAnchors.zipWithIndex.map { case (a, i) =>
        a -> (0 until 3).map(j => hardNegIdPool(i * 3 + j)).sorted
      }.toMap
      val got = df.filter(col("anchor_id").isin(hardNegAnchors.map(Long.box): _*))
        .select(col("anchor_id"), col("rank"), col("neg_id"), col("neg_label"))
        .collect().groupBy(_.getLong(0))
        .map { case (a, rows) =>
          a -> rows.sortBy(_.getLong(1)).map(r => (r.getLong(2), r.getLong(3))).toSeq }
      val ok = hardNegAnchors.forall(a =>
        got.get(a).contains(want(a).map(id => (id, 99L))))
      (ok, s"top-3 = planted copies for ${hardNegAnchors.count(a =>
        got.get(a).contains(want(a).map(id => (id, 99L))))}/${hardNegAnchors.size} anchors")
    }

    // ---------- report ----------
    // provenance stamp (ADVICE r17): check_oracle_sf1.py refuses to let
    // a stale planted file vouch for a later Verify run, and this meta
    // records which fixture generation the evidence came from
    val srcMtime = new java.io.File(s"$src/documents.parquet").lastModified()
    val meta =
      s""""_meta": {"src": "$src", "src_mtime_ms": $srcMtime, "written_ms": ${System.currentTimeMillis()}}"""
    val json = (results.map { case (k, (ok, d)) =>
      s""""$k": {"planted_ok": $ok, "detail": "${d.replace("\"", "'")}"}"""
    }.toSeq :+ meta).mkString("{", ", ", "}")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(jsonOut), json)
    val failed = results.filter(!_._2._1)
    println(s"PLANTED summary: ${results.size - failed.size}/${results.size} ok" +
      (if (failed.nonEmpty) s"; FAILED: ${failed.keys.mkString(",")}" else ""))
    spark.stop()
    if (failed.nonEmpty) sys.exit(1)
  }
}
