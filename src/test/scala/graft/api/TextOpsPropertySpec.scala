package graft.api

import org.scalacheck.Gen

import graft.SparkTestBase

/** Property tests for the round's text operators: the distributed
  * implementations must agree with straightforward single-machine
  * reference computations on random corpora (small alphabet → dense
  * collisions, the adversarial case for frequency logic). */
class TextOpsPropertySpec extends SparkTestBase {
  import spark.implicits._

  private val word = Gen.oneOf("aa", "bb", "cc", "dd", "ee", "ff")
  private val doc = Gen.chooseNum(0, 12).flatMap(n => Gen.listOfN(n, word))
  private def corpus(n: Int): Gen[List[List[String]]] = Gen.listOfN(n, doc)

  private def refDropBoilerplate(docs: List[List[String]], frac: Double)
      : Map[Long, (String, Long)] = {
    val n = docs.length
    val cut = math.ceil(n * frac).toLong
    val dfc = docs.flatMap(_.distinct).groupBy(identity).view.mapValues(_.size.toLong)
    val frequent = dfc.filter(_._2 >= cut).keySet
    docs.zipWithIndex.map { case (ws, i) =>
      val kept = ws.filterNot(frequent)
      i.toLong -> ((kept.mkString(" "), (ws.length - kept.length).toLong))
    }.toMap
  }

  private def refRepetition(ws: List[String]): (Long, Double, Double) = {
    def ratio(xs: List[String]) =
      if (xs.isEmpty) 0.0
      else BigDecimal(1.0 - xs.distinct.size.toDouble / xs.size)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val grams = if (ws.length < 3) Nil else ws.sliding(3).map(_.mkString(" ")).toList
    (ws.length.toLong, ratio(ws), ratio(grams))
  }

  test("property: dropBoilerplate matches a single-machine reference on random corpora") {
    val gen = for { n <- Gen.chooseNum(1, 12); c <- corpus(n) } yield c
    (1 to 25).foreach { seed =>
      val docs = gen.apply(Gen.Parameters.default, org.scalacheck.rng.Seed(seed)).get
      val df = docs.zipWithIndex
        .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }.toDF("doc_id", "text")
      val got = Graft.dropBoilerplate(df, "doc_id", "text", " ", 0.5)
        .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
      // the reference tokenizes exactly like split(" "): empty docs
      // produce one empty token on both sides
      val ref = refDropBoilerplate(docs.map(ws => if (ws.isEmpty) List("") else ws), 0.5)
      assert(got === ref, s"seed $seed corpus $docs")
    }
  }

  test("property: repetitionScore matches a single-machine reference on random docs") {
    (1 to 25).foreach { seed =>
      val docs = corpus(10).apply(Gen.Parameters.default, org.scalacheck.rng.Seed(seed)).get
      val df = docs.zipWithIndex
        .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }.toDF("doc_id", "text")
      val got = Graft.repetitionScore(df, "doc_id", "text")
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
      docs.zipWithIndex.foreach { case (ws, i) =>
        val (n, wr, gr) = refRepetition(ws)
        val (gn, gwr, ggr) = got(i.toLong)
        assert(gn === n, s"seed $seed doc $ws n_words")
        assert(math.abs(gwr - wr) < 1e-9, s"seed $seed doc $ws word ratio $gwr vs $wr")
        assert(math.abs(ggr - gr) < 1e-9, s"seed $seed doc $ws gram ratio $ggr vs $gr")
      }
    }
  }

  private def refLineDedup(docs: List[List[String]]): Map[Long, (String, Long)] = {
    // walking docs in id order with lines in position order IS keep-first
    // by (id, pos) — the operator's contract
    val seen = scala.collection.mutable.Set[String]()
    docs.zipWithIndex.map { case (lines, i) =>
      val kept = lines.filter(seen.add)
      i.toLong -> ((kept.mkString("\n"), (lines.length - kept.length).toLong))
    }.toMap
  }

  test("property: lineDedup matches a single-machine keep-first reference " +
      "on random corpora (dense collisions)") {
    val gen = for { n <- Gen.chooseNum(1, 12); c <- corpus(n) } yield c
    (1 to 25).foreach { seed =>
      val docs = gen.apply(Gen.Parameters.default, org.scalacheck.rng.Seed(seed)).get
      val df = docs.zipWithIndex
        .map { case (ws, i) => (i.toLong, ws.mkString("\n")) }.toDF("doc_id", "text")
      val got = Graft.lineDedup(df, "doc_id", "text", "\n")
        .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
      val ref = refLineDedup(docs.map(ws => if (ws.isEmpty) List("") else ws))
      assert(got === ref, s"seed $seed corpus $docs")
    }
  }

  test("property: epochShuffle matches the documented LCG arithmetic on " +
      "sparse ids up to Long.MaxValue (overflow regime)") {
    val idGen = Gen.oneOf(
      Gen.chooseNum(0L, 1000L),
      Gen.chooseNum(Long.MaxValue - 100000L, Long.MaxValue),
      Gen.chooseNum(0L, Long.MaxValue))
    (1 to 10).foreach { seed =>
      val ids = Gen.listOfN(200, idGen)
        .apply(Gen.Parameters.default, org.scalacheck.rng.Seed(seed)).get.distinct
      val got = Graft.epochShuffle(ids.toDF("rid"), "rid", 5)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
      val ref = ids.map { id =>
        (id, ((id % 2147483648L) * 1103515245L + 12345L) % 2147483648L)
      }.groupBy(_._2 % 5).toSeq.flatMap { case (shard, rows) =>
        rows.sortBy { case (id, key) => (key, id) }.zipWithIndex
          .map { case ((id, _), pos) => (id, shard, pos.toLong) }
      }.sorted
      assert(got === ref, s"seed $seed")
    }
  }

  private def refPii(text: String): (String, Long, Long, Long) = {
    def count(re: String) = {
      val m = java.util.regex.Pattern.compile(re).matcher(text)
      var n = 0L
      while (m.find()) n += 1
      n
    }
    (text.replaceAll(Graft.EmailRe, "<EMAIL>")
        .replaceAll(Graft.PhoneRe, "<PHONE>")
        .replaceAll(Graft.Ipv4Re, "<IP>"),
      count(Graft.EmailRe), count(Graft.PhoneRe), count(Graft.Ipv4Re))
  }

  test("property: piiRedact matches a direct java.util.regex reference on " +
      "random PII-studded docs") {
    val token = Gen.oneOf(
      Gen.oneOf("alpha", "beta", "x1", ""),
      Gen.chooseNum(0, 9999).map(n => s"u$n@host$n.org"),
      Gen.chooseNum(0, 255).map(n => s"10.$n.0.$n"),
      Gen.chooseNum(0, 999).map(n => f"555-$n%03d-$n%04d"))
    val docGen = Gen.chooseNum(0, 15).flatMap(n => Gen.listOfN(n, token))
    (1 to 25).foreach { seed =>
      val docs = Gen.listOfN(8, docGen)
        .apply(Gen.Parameters.default, org.scalacheck.rng.Seed(seed)).get
        .map(_.mkString(" "))
      val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val got = Graft.piiRedact(df, "doc_id", "text").collect()
        .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
      docs.zipWithIndex.foreach { case (t, i) =>
        assert(got(i.toLong) === refPii(t), s"seed $seed doc '$t'")
      }
    }
  }

  test("property: chunkWindows covers every token, clips the tail, and matches " +
      "a single-machine reference across random width/stride") {
    val gen = for {
      width <- Gen.chooseNum(1, 8)
      stride <- Gen.chooseNum(1, width)
      c <- corpus(8)
    } yield (width, stride, c)
    (1 to 25).foreach { seed =>
      val (width, stride, docs) =
        gen.apply(Gen.Parameters.default, org.scalacheck.rng.Seed(seed)).get
      val df = docs.zipWithIndex
        .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }.toDF("doc_id", "text")
      val got = Graft.chunkWindows(df, "doc_id", "text", width, stride)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getString(3)))).toMap
      val ref = docs.zipWithIndex.flatMap { case (ws, i) =>
        if (ws.isEmpty) Nil
        else {
          val nch = 1 + (math.max(ws.length - width, 0) + stride - 1) / stride
          (0 until nch).map { c =>
            val chunk = ws.slice(c * stride, c * stride + width)
            (i.toLong, c.toLong) -> ((chunk.length.toLong, chunk.mkString(" ")))
          }
        }
      }.toMap
      assert(got === ref, s"seed $seed width $width stride $stride")
      // coverage: token t of a doc appears in chunk floor(t/stride) (and
      // possibly earlier overlapping ones); reconstruction from
      // stride-prefixes equals the doc
      docs.zipWithIndex.foreach { case (ws, i) =>
        if (ws.nonEmpty) {
          val chunks = ref.collect { case ((d, c), (_, t)) if d == i.toLong => c -> t }
            .toSeq.sortBy(_._1).map(_._2)
          val rebuilt = chunks.init.map(_.split(" ").take(stride).mkString(" "))
            .filter(_.nonEmpty) :+ chunks.last
          assert(rebuilt.mkString(" ").split(" ").filter(_.nonEmpty).toSeq
            === ws.filter(_.nonEmpty), s"seed $seed doc $i reconstruction")
        }
      }
    }
  }

  /** The htmlExtract chain replayed with java.util.regex — same engine
    * Spark codegen uses; proves the Column fold order (entity decode
    * order, block-before-tag stripping) survives the plumbing. */
  private def refHtml(html: String): (String, Long) = {
    val nLinks = {
      val m = java.util.regex.Pattern.compile("(?i)<a[\\s>]").matcher(html)
      var n = 0L
      while (m.find()) n += 1
      n
    }
    var t = html.replaceAll("(?s)<!--.*?-->", " ")
    t = t.replaceAll("(?is)<script\\b[^>]*>.*?</script>", " ")
    t = t.replaceAll("(?is)<style\\b[^>]*>.*?</style>", " ")
    t = t.replaceAll("<[^>]+>", " ")
    for ((e, c) <- Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
        "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&"))
      t = t.replaceAll(e, java.util.regex.Matcher.quoteReplacement(c))
    (t.replaceAll("\\s+", " ").trim, nLinks)
  }

  test("property: htmlExtract matches a direct java.util.regex reference on " +
      "random tag/entity-studded fragments") {
    val frag = Gen.oneOf(
      Gen.oneOf("alpha", "beta", "gamma", "", "<b>", "</b>", "<p class=\"x\">",
        "</p>", "&amp;", "&lt;", "&quot;", "&nbsp;", "&amp;amp;",
        "<!-- note -->", "<a href=\"http://x\">l</a>", "<a name=\"n\">t</a>"),
      Gen.oneOf("<script>var a = 1 < 2;</script>", "<style>p{x:1}</style>"))
    val docGen = Gen.chooseNum(0, 12).flatMap(n => Gen.listOfN(n, frag))
    (1 to 25).foreach { seed =>
      val docs = Gen.listOfN(8, docGen)
        .apply(Gen.Parameters.default, org.scalacheck.rng.Seed(seed)).get
        .map(_.mkString(" "))
      val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val got = Graft.htmlExtract(df, "doc_id", "text").collect()
        .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
      docs.zipWithIndex.foreach { case (t, i) =>
        assert(got(i.toLong) === refHtml(t), s"seed $seed doc '$t'")
      }
    }
  }

  private def refLev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("property: editDupes PassJoin blocking matches the quadratic Levenshtein " +
      "reference on random small-alphabet corpora (dense near-misses)") {
    // 2-char alphabet, lengths 8-14 → many pairs sit exactly at the
    // k boundary, the adversarial regime for segment blocking
    val s = Gen.chooseNum(8, 14).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b')).map(_.mkString))
    val gen = Gen.chooseNum(4, 12).flatMap(n => Gen.listOfN(n, s))
    (1 to 20).foreach { seed =>
      val texts = gen.apply(Gen.Parameters.default, org.scalacheck.rng.Seed(seed)).get
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val got = Graft.editDupes(df, "doc_id", "text", k = 2)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val want = (for {
        (a, i) <- texts.zipWithIndex; (b, j) <- texts.zipWithIndex if i < j
        d = refLev(a, b) if d <= 2
      } yield (i.toLong, j.toLong, d.toLong)).toSet
      assert(got === want, s"seed $seed corpus $texts")
    }
  }
}
