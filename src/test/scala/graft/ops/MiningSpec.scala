package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.api.Graft

/** Unit/property tests for the round-9 corpus-mining operators:
  * heavy hitters, winnowing, PageRank, URL normalization, readability,
  * embedding decontamination, perplexity buckets, length histograms. */
class MiningSpec extends SparkTestBase {
  import spark.implicits._

  // ----- heavy hitters -----

  test("heavyHitters is EXACT even when the vocabulary dwarfs k") {
    // 400 distinct rare words + 5 planted heavy ones, k = 8 ≪ vocab
    val heavy = Seq.fill(60)("alpha") ++ Seq.fill(55)("beta") ++
      Seq.fill(50)("gamma") ++ Seq.fill(45)("delta") ++ Seq.fill(40)("eps")
    val rare = (0 until 400).map(i => s"rare$i")
    val words = new scala.util.Random(7).shuffle(heavy ++ rare)
    val docs = words.grouped(25).zipWithIndex
      .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }.toSeq
      .toDF("id", "text").repartition(5)
    val k = 8
    val n = (heavy ++ rare).size.toLong
    val thr = math.max(30L, n / k + 1) // = max(30, 650/8+1=82) = 82... use minCount 30
    val got = Graft.heavyHitters(docs, "text", k, 30L)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    // exact reference over the same threshold rule
    val exact = (heavy ++ rare).groupBy(identity).view.mapValues(_.size.toLong)
      .filter(_._2 >= thr).toMap
    assert(got === exact, s"threshold $thr")
  }

  test("heavyHitters threshold clamps to n/k+1 and is partitioning-independent") {
    val docs = (0 until 100).map(i => (i.toLong, "x x y z")).toDF("id", "text")
    // n = 400 tokens; k = 4 → clamp = 101 > minCount 1: only 'x' (200) qualifies
    val a = Graft.heavyHitters(docs, "text", 4, 1L).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(a === Set(("x", 200L)))
    val b = Graft.heavyHitters(docs.repartition(13), "text", 4, 1L).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(b === a)
  }

  // ----- winnowing -----

  /** Brute-force reference: hash all k-grams, take min per window. */
  private def refWinnow(s: String, k: Int, w: Int): Set[Long] = {
    val n = s.length - k + 1
    if (n < w) Set.empty
    else {
      val hs = Array.tabulate(n)(i => Graft.polyHash(s.substring(i, i + k)))
      (0 to n - w).map(i => hs.slice(i, i + w).min).toSet
    }
  }

  test("winnow matches the brute-force reference on random strings") {
    val rnd = new scala.util.Random(13)
    val docs = (0 until 60).map { i =>
      val len = rnd.nextInt(60)
      (i.toLong, (0 until len).map(_ => ('a' + rnd.nextInt(4)).toChar).mkString)
    }
    val got = Graft.winnow(docs.toDF("id", "text"), "id", "text", 5, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    docs.foreach { case (id, s) =>
      val want = refWinnow(s, 5, 3)
      assert(got.getOrElse(id, Set.empty) === want, s"doc $id '$s'")
    }
  }

  test("winnow guarantee: docs sharing a substring of length >= k+w-1 share a fingerprint") {
    val shared = "thequickbrownfoxjumps" // length 21 >= 8+4-1
    val a = (1L, s"aaaaaaaaaa${shared}bbbbbbbbbb")
    val b = (2L, s"cccccccccc${shared}dddddddddd")
    val fps = Graft.winnow(Seq(a, b).toDF("id", "text"), "id", "text", 8, 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(fps(1L).intersect(fps(2L)).nonEmpty,
      "shared 21-char substring must yield a shared fingerprint")
  }

  test("winnow density is ~1/w and short/null docs emit nothing") {
    val rnd = new scala.util.Random(5)
    val long = (0 until 4000).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    val docs = Seq((1L, long), (2L, "short"), (3L, null.asInstanceOf[String]))
      .toDF("id", "text")
    val byDoc = Graft.winnow(docs, "id", "text", 8, 4).collect()
      .groupBy(_.getLong(0))
    val nGrams = long.length - 8 + 1
    val nFps = byDoc(1L).length
    // distinct minima of random hashes: expected ≈ 2·n/(w+1) window
    // selections, deduped further — just bound it well below n and above n/20
    assert(nFps < nGrams / 2 && nFps > nGrams / 20, s"$nFps of $nGrams grams")
    assert(!byDoc.contains(2L) && !byDoc.contains(3L))
  }

  // ----- PageRank -----

  /** Dense local reference implementation. */
  private def refPageRank(edges: Seq[(String, String)], iters: Int,
                          d: Double): Map[String, Double] = {
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val n = nodes.size.toDouble
    val out = edges.groupBy(_._1).view.mapValues(_.size.toDouble).toMap
    var r = nodes.map(_ -> 1.0 / n).toMap
    for (_ <- 1 to iters) {
      val in = edges.groupBy(_._2).view.mapValues { es =>
        es.map(e => r(e._1) / out(e._1)).sum
      }.toMap
      r = nodes.map(v => v -> ((1.0 - d) / n + d * in.getOrElse(v, 0.0))).toMap
    }
    r
  }

  test("pageRank matches the dense reference on a random graph") {
    val rnd = new scala.util.Random(3)
    val edges = (0 until 300).map(_ => (s"n${rnd.nextInt(40)}", s"n${rnd.nextInt(40)}"))
      .distinct.filter(e => e._1 != e._2)
    val got = Graft.pageRank(edges.toDF("s", "d"), "s", "d", 3, 0.85)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val want = refPageRank(edges, 3, 0.85)
    assert(got.keySet === want.keySet)
    want.foreach { case (v, rk) =>
      assert(math.abs(got(v) - rk) < 1e-6, s"node $v: ${got(v)} vs $rk")
    }
  }

  test("pageRank: hub of a symmetric star out-ranks leaves; mass is conserved") {
    val leaves = (1 to 50).map(i => s"leaf$i")
    val edges = leaves.flatMap(l => Seq(("hub", l), (l, "hub")))
    val ranks = Graft.pageRank(edges.toDF("s", "d"), "s", "d", 3, 0.85)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(ranks("hub") > ranks("leaf1") * 10)
    // symmetric graph: no dangling mass, ranks sum to 1
    assert(math.abs(ranks.values.sum - 1.0) < 1e-4)
  }

  /** Dense reference WITH the dangling-mass completion. */
  private def refPageRankDangling(edges: Seq[(String, String)], iters: Int,
                                  d: Double): Map[String, Double] = {
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val n = nodes.size.toDouble
    val out = edges.groupBy(_._1).view.mapValues(_.size.toDouble).toMap
    var r = nodes.map(_ -> 1.0 / n).toMap
    for (_ <- 1 to iters) {
      val dmass = nodes.filterNot(out.contains).map(r).sum
      val in = edges.groupBy(_._2).view.mapValues { es =>
        es.map(e => r(e._1) / out(e._1)).sum
      }.toMap
      r = nodes.map(v => v -> ((1.0 - d) / n + d * (in.getOrElse(v, 0.0) + dmass / n))).toMap
    }
    r
  }

  test("pageRank redistributeDangling: mass is conserved on a graph with sinks " +
      "and matches the dense completion reference") {
    // a chain into two pure sinks: without redistribution mass leaks
    val edges = Seq("a" -> "b", "b" -> "c", "a" -> "d", "c" -> "sink1", "d" -> "sink2")
    val leaky = Graft.pageRank(edges.toDF("s", "d"), "s", "d", 3, 0.85)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(leaky.values.sum < 0.999, s"expected leakage without redistribution: $leaky")
    val got = Graft.pageRank(edges.toDF("s", "d"), "s", "d", 3, 0.85,
      redistributeDangling = true)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(got.values.sum - 1.0) < 1e-6, s"mass not conserved: $got")
    val want = refPageRankDangling(edges, 3, 0.85)
    want.foreach { case (v, rk) =>
      assert(math.abs(got(v) - rk) < 1e-6, s"node $v: ${got(v)} vs $rk")
    }
  }

  test("pageRank runs 50 iterations with lineage checkpointing and still " +
      "matches the dense reference (converged fixed point)") {
    val rnd = new scala.util.Random(7)
    val edges = (0 until 60).map(_ => (s"n${rnd.nextInt(12)}", s"n${rnd.nextInt(12)}"))
      .distinct.filter(e => e._1 != e._2)
    val got = Graft.pageRank(edges.toDF("s", "d"), "s", "d", iters = 50,
      damping = 0.85, redistributeDangling = true, checkpointEvery = 10)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val want = refPageRankDangling(edges, 50, 0.85)
    assert(math.abs(got.values.sum - 1.0) < 1e-6)
    want.foreach { case (v, rk) =>
      assert(math.abs(got(v) - rk) < 1e-6, s"node $v: ${got(v)} vs $rk")
    }
  }

  // ----- URL normalization -----

  test("urlNormalize: case, userinfo, default ports, tracking params, sort, fragment") {
    val urls = Seq(
      (1L, "HTTPS://u:p@WWW.Ex.COM:443/a/b?utm_source=t&b=2&a=1#frag"),
      (2L, "http://ex.com:8080/x?fbclid=1&z=2"),
      (3L, "http://EX.com:80"),
      (4L, "https://ex.com/p?gclid=9&utm_medium=m"),
      (5L, "garbage"),
      (6L, null.asInstanceOf[String]))
      .toDF("id", "u")
    val out = Graft.urlNormalize(urls, "id", "u").collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getString(2), r.getString(3)))).toMap
    assert(out(1L) === (("https", "www.ex.com", "https://www.ex.com/a/b?a=1&b=2")))
    assert(out(2L) === (("http", "ex.com", "http://ex.com:8080/x?z=2")),
      "non-default port survives")
    assert(out(3L) === (("http", "ex.com", "http://ex.com/")),
      "default port drops, path defaults to /")
    assert(out(4L) === (("https", "ex.com", "https://ex.com/p")),
      "all-tracking query drops entirely")
    assert(out(5L) === (("", "", "")))
    assert(out(6L) === (("", "", "")))
  }

  test("urlNormalize is a dedup key: param order and fragment variants collapse") {
    val urls = Seq(
      (1L, "https://ex.com/p?a=1&b=2"),
      (2L, "https://ex.com/p?b=2&a=1#sec"),
      (3L, "HTTPS://ex.com:443/p?b=2&utm_source=x&a=1"))
      .toDF("id", "u")
    val norms = Graft.urlNormalize(urls, "id", "u")
      .select("norm_url").distinct().collect()
    assert(norms.length === 1)
  }

  // ----- readability -----

  test("readability: hand-counted Flesch on a known sentence") {
    // "the cat sat on the mat. it was flat!" — 9 words, 2 sentences;
    // vowel groups: e,a,a,o,e,a,i,a,a = 9 syllables (no vowel-less words)
    val df = Seq((1L, "the cat sat on the mat. it was flat!")).toDF("id", "t")
    val r = Graft.readability(df, "id", "t").collect().head
    assert(r.getLong(1) === 9L)
    assert(r.getLong(2) === 2L)
    assert(r.getLong(3) === 9L)
    val want = 206.835 - 1.015 * (9.0 / 2.0) - 84.6 * (9.0 / 9.0)
    assert(math.abs(r.getDouble(4) -
      math.floor(want * 10000 + 0.5) / 10000) < 1e-12)
  }

  test("readability: vowel-less words count one syllable; empty/null docs -> NULL score") {
    val df = Seq((1L, "hmm pfft grr"), (2L, ""), (3L, null.asInstanceOf[String]))
      .toDF("id", "t")
    val out = Graft.readability(df, "id", "t").collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getLong(3) === 3L, "3 vowel-less words = 3 syllables")
    assert(out(2L).getLong(1) === 0L && out(2L).isNullAt(4))
    assert(out(3L).getLong(1) === 0L && out(3L).isNullAt(4))
  }

  // ----- embedding decontamination -----

  test("embedDecontaminate: planted duplicate flags at cos 1.0; brute-force agreement") {
    val rnd = new scala.util.Random(17)
    def vec(): Array[Float] = Array.fill(8)(rnd.nextGaussian().toFloat)
    val bench = (0 until 5).map(i => (i.toLong, vec()))
    val corpus = (100 until 140).map(i => (i.toLong, vec())) :+
      (999L, bench(2)._2.map(x => (x * 2.0f))) // same direction as bench 2
    val got = Graft.embedDecontaminate(
      corpus.toDF("vid", "emb"), "vid", "emb",
      bench.toDF("bid", "bemb"), "bid", "bemb", 0.99)
      .collect().map(r => r.getLong(0) ->
        ((r.getDouble(1), r.getLong(2), r.getLong(3)))).toMap
    val (cos999, near999, flag999) = got(999L)
    assert(near999 === 2L && flag999 === 1L && cos999 > 0.999999)
    // brute force over doubles, same rounding
    corpus.foreach { case (id, v) =>
      val cosines = bench.map { case (bid, bv) =>
        val dv = v.map(_.toDouble); val db = bv.map(_.toDouble)
        val dot = dv.zip(db).map { case (x, y) => x * y }.sum
        val c = dot / math.sqrt(dv.map(x => x * x).sum) / math.sqrt(db.map(x => x * x).sum)
        (bid, BigDecimal(c).setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
      val best = cosines.maxBy { case (bid, c) => (c, -bid) }
      assert(got(id)._1 === best._2 && got(id)._2 === best._1, s"vec $id")
    }
  }

  // ----- perplexity buckets -----

  test("perplexityBuckets: per-lang terciles are balanced and ordered") {
    val rnd = new scala.util.Random(29)
    val vocabA = Vector("aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh")
    val docs = (0 until 120).map { i =>
      val lang = if (i % 2 == 0) "en" else "fr"
      // even ids: typical docs; every 10th: word soup (high perplexity)
      // varied length + full vocab so per-doc bits values rarely tie
      // (fully-tied strata would legitimately empty a tercile)
      val words =
        if (i % 10 == 0) (0 until 20).map(_ => s"rare${rnd.nextInt(1000)}")
        else (0 until 15 + rnd.nextInt(10)).map(_ => vocabA(rnd.nextInt(8)))
      (i.toLong, lang, words.mkString(" "))
    }
    val out = Graft.perplexityBuckets(docs.toDF("id", "lang", "text"),
      "id", "text", "lang").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getString(3)))
    // terciles: each lang splits ~1/3 head, ~1/3 middle, ~1/3 tail
    Seq("en", "fr").foreach { lang =>
      val rows = out.filter(_._2 == lang)
      val byBucket = rows.groupBy(_._4).view.mapValues(_.length).toMap
      info(s"$lang: ${rows.length} rows, buckets $byBucket")
      val third = rows.length / 3.0
      Seq("head", "middle", "tail").foreach { b =>
        assert(math.abs(byBucket.getOrElse(b, 0) - third) <= third * 0.5 + 2,
          s"$lang/$b: $byBucket")
      }
      // ordering: every head doc has bits <= every tail doc
      val headMax = rows.filter(_._4 == "head").map(_._3).max
      val tailMin = rows.filter(_._4 == "tail").map(_._3).min
      assert(headMax <= tailMin)
    }
    // word-soup docs land in the tail of their language
    out.filter(r => r._1 % 10 == 0).foreach { r =>
      assert(r._4 === "tail", s"soup doc ${r._1} in ${r._4}")
    }
  }

  // ----- quality gate -----

  test("qualityGate: first failing rule wins; boundary docs keep") {
    val stop6 = "the a of and to in" // 6 stopwords, mean len 2.0
    val docs = Seq(
      (1L, Seq.fill(5)(stop6).mkString(" ")),                // 30 words, meanLen 2 → word_length
      (2L, ("worda " * 29).trim),                            // 29 words → word_count
      (3L, ("words " * 91).trim),                            // 91 words → word_count
      (4L, (("worda " * 28) + stop6).trim),                  // 34 words, no... meanLen check
      (5L, ("12345 " * 29 + "abcde").trim),                  // meanLen 5 ok, alpha 1/30 → alpha_ratio
      (6L, ("worda " * 30).trim),                            // 30 words meanLen 5, 0 stopwords → stopwords
      (7L, (("fives " * 28) + "the a").trim),                // 30 words, 2 stop hits → keep
      (8L, ""))                                              // 0 words → word_count
      .toDF("id", "t")
    val out = Graft.qualityGate(docs, "id", "t").collect()
      .map(r => r.getLong(0) -> ((r.getLong(5), r.getString(6)))).toMap
    assert(out(1L) === ((0L, "word_length")))
    assert(out(2L) === ((0L, "word_count")))
    assert(out(3L) === ((0L, "word_count")))
    assert(out(5L) === ((0L, "alpha_ratio")))
    assert(out(6L) === ((0L, "stopwords")))
    assert(out(7L) === ((1L, "")))
    assert(out(8L) === ((0L, "word_count")))
  }

  // ----- token entropy -----

  test("tokenEntropy: uniform doc = log2(k); constant doc = 0; empty omitted") {
    val docs = Seq(
      (1L, "a b c d"),          // uniform over 4 → H = 2
      (2L, "x x x x x"),        // constant → 0
      (3L, "a a b"),            // H = -(2/3)log2(2/3) - (1/3)log2(1/3)
      (4L, ""),
      (5L, null.asInstanceOf[String]))
      .toDF("id", "t")
    val out = Graft.tokenEntropy(docs, "id", "t").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(out(1L) === ((4L, 2.0)))
    assert(out(2L) === ((5L, 0.0)))
    val h3 = -(2.0 / 3) * math.log(2.0 / 3) / math.log(2) -
      (1.0 / 3) * math.log(1.0 / 3) / math.log(2)
    assert(out(3L)._2 ===
      BigDecimal(h3).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(!out.contains(4L) && !out.contains(5L))
  }

  test("tokenEntropy is partitioning-independent (sorted-order sum)") {
    val rnd = new scala.util.Random(23)
    val docs = (0 until 80).map { i =>
      (i.toLong, (0 until 50).map(_ => s"w${rnd.nextInt(12)}").mkString(" "))
    }.toDF("id", "t")
    val a = Graft.tokenEntropy(docs, "id", "t").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val b = Graft.tokenEntropy(docs.repartition(11), "id", "t").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(a === b)
  }

  // ----- mixture weights -----

  test("mixtureWeights: weights normalize to 1; alpha<1 upweights small sources") {
    val docs =
      (0 until 90).map(i => (s"big", "w " * 100)) ++
      (0 until 10).map(i => (s"small", "w " * 100))
    val out = Graft.mixtureWeights(docs.toDF("src", "t"), "src", "t",
      alpha = 0.5, budgetTokens = 10000L).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    val (_, bigToks, bigW, _) = out("big")
    val (_, smallToks, smallW, smallEp) = out("small")
    assert(math.abs(bigW + smallW - 1.0) < 1e-5)
    // α=0.5: weight ratio = sqrt(9) = 3, not 9 — small source upweighted
    assert(math.abs(bigW / smallW - 3.0) < 1e-3)
    assert(bigToks === 9000L && smallToks === 1000L)
    // epochs = budget·weight/tokens: small source repeats more
    assert(smallEp > out("big")._4)
  }

  // ----- length histogram -----

  test("lengthHistogram buckets on exact bit length") {
    val df = Seq((1L, "g1", 1L), (2L, "g1", 2L), (3L, "g1", 3L),
      (4L, "g1", 4L), (5L, "g2", 1023L), (6L, "g2", 1024L), (7L, "g2", 0L))
      .toDF("id", "g", "v")
    val out = Graft.lengthHistogram(df, "g", "v").collect()
      .map(r => ((r.getString(0), r.getLong(1)), (r.getLong(2), r.getLong(3)))).toMap
    assert(out(("g1", 1L)) === ((1L, 1L)))            // v=1 → bucket 1
    assert(out(("g1", 2L)) === ((2L, 5L)))            // v=2,3
    assert(out(("g1", 3L)) === ((1L, 4L)))            // v=4
    assert(out(("g2", 10L)) === ((1L, 1023L)))        // v=1023
    assert(out(("g2", 11L)) === ((1L, 1024L)))        // v=1024
    assert(out(("g2", 1L)) === ((1L, 0L)))            // v=0 shares bucket 1 (bin('0')='0')
  }

  // ----- PMI collocations -----

  test("pmiCollocations matches a local reference and ranks the planted pair first") {
    // "san francisco" always adjacent; "the" everywhere — high-count,
    // low-PMI filler the planted pair must outrank
    val docs = (0L until 40L).map { i =>
      val filler = Seq.fill(6)("the").mkString(" ")
      (i, s"san francisco $filler word$i the city")
    }.toDF("id", "text").repartition(5)
    val out = Graft.pmiCollocations(docs, "text", minCount = 5L, topK = 10)
      .collect().map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getDouble(3))))
    assert(out.head._1 === (("san", "francisco")), s"planted pair must rank first: ${out.toSeq}")
    assert(out.head._2._1 === 40L)

    // local replay of counts + the published formula
    val texts = docs.collect().map(_.getString(1))
    val toks = texts.map(_.split(" ").filter(_.nonEmpty))
    val uni = toks.flatten.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val bi = toks.flatMap(t => t.sliding(2).filter(_.length == 2).map(p => (p(0), p(1))))
      .groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val n = uni.values.sum.toDouble
    val nb = bi.values.sum.toDouble
    val expected = (bi(("san", "francisco")) / nb) /
      ((uni("san") / n) * (uni("francisco") / n))
    assert(math.abs(out.head._2._2 - BigDecimal(math.log(expected))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    // every returned pair respects minCount and the descending order
    val pmis = out.map(_._2._2).toSeq
    assert(pmis === pmis.sorted.reverse)
  }

  test("pmiCollocations respects minCount and is partitioning-independent") {
    val docs = (0L until 30L).map(i => (i, "a b c d a b")).toDF("id", "text")
    val out = Graft.pmiCollocations(docs, "text", minCount = 31L, topK = 10).collect()
    // every adjacent pair occurs at most 30 (a b occurs 60) — only (a,b) survives
    assert(out.map(r => (r.getString(0), r.getString(1))).toSeq === Seq(("a", "b")))
    val a = Graft.pmiCollocations(docs, "text", minCount = 5L, topK = 20)
    val b = Graft.pmiCollocations(docs.repartition(7), "text", minCount = 5L, topK = 20)
    assert(a.collect().toSeq === b.collect().toSeq)
  }

  // ----- blocklist filter -----

  test("blocklistFilter counts words and phrases on token boundaries, case-insensitive") {
    val docs = Seq(
      (0L, "the Slow query hit a big table twice big table"),
      (1L, "clean document with nothing flagged"),
      (2L, "slow slow slow"),
      (3L, "bigger tables are not big_table and slowly is not slow-ish"),
      (4L, ""),
      (5L, null.asInstanceOf[String])
    ).toDF("id", "text")
    val out = Graft.blocklistFilter(docs, "id", "text",
        Seq("slow", "legacy", "big table", "full scan"), maxHits = 2L)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(0L) === ((10L, 3L, 0L))) // Slow + 2x "big table" -> over quota
    assert(out(1L) === ((5L, 0L, 1L)))
    assert(out(2L) === ((3L, 3L, 0L)))
    // substrings must NOT match: bigger/slowly/big_table/slow-ish are clean
    assert(out(3L)._2 === 0L && out(3L)._3 === 1L)
    assert(out(4L) === ((0L, 0L, 1L)) && out(5L) === ((0L, 0L, 1L)))
  }

  test("blocklistFilter overlapping phrase occurrences each count") {
    val docs = Seq((0L, "x y x y x")).toDF("id", "text")
    val out = Graft.blocklistFilter(docs, "id", "text", Seq("x y", "y x"), maxHits = 10L)
      .head()
    assert(out.getLong(2) === 4L) // x y, y x, x y, y x
    val bad = intercept[IllegalArgumentException] {
      Graft.blocklistFilter(docs, "id", "text", Seq("three word phrase"))
    }
    assert(bad.getMessage.contains("one or two words"))
  }
}
