package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** BPE training/encoding vs an independent sequential reference
  * (the textbook Sennrich algorithm over an in-memory word-count map)
  * — the distributed formulation must produce the identical merge
  * list and identical encodings, and encoding must round-trip. */
class BpeSpec extends SparkTestBase {
  import spark.implicits._

  // ---- sequential reference (deliberately naive) ----

  private def refTrain(words: Map[String, Long], numMerges: Int): Seq[(String, String)] = {
    var vocab: Map[Seq[String], Long] =
      words.map { case (w, c) => (w.split("").filter(_.nonEmpty).toSeq :+ Bpe.Eow, c) }
        .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sum }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var continue = true
    while (continue && merges.length < numMerges) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      vocab.foreach { case (syms, c) =>
        syms.sliding(2).foreach {
          case Seq(a, b) => counts((a, b)) = counts.getOrElse((a, b), 0L) + c
          case _ =>
        }
      }
      val best = counts.toSeq
        .sortBy { case ((a, b), n) => (-n, a, b) }.headOption
      best match {
        case Some(((a, b), n)) if n >= 2 =>
          merges += ((a, b))
          vocab = vocab.toSeq.map { case (syms, c) =>
            val out = scala.collection.mutable.ArrayBuffer.empty[String]
            var i = 0
            while (i < syms.length) {
              if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
                out += (a + b); i += 2
              } else { out += syms(i); i += 1 }
            }
            (out.toSeq, c)
          }.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sum }
        case _ => continue = false
      }
    }
    merges.toSeq
  }

  private def randomCorpus(seed: Int, n: Int): Seq[(Long, String)] = {
    val r = new scala.util.Random(seed)
    val roots = Array("spark", "stream", "batch", "shuffle", "merge", "token",
      "data", "join", "agg", "scan")
    val suffixes = Array("", "s", "ing", "ed", "er")
    (0 until n).map { i =>
      val words = Array.fill(6 + r.nextInt(10))(
        roots(r.nextInt(roots.length)) + suffixes(r.nextInt(suffixes.length)))
      (i.toLong, words.mkString(" "))
    }
  }

  test("distributed training reproduces the sequential reference merge list") {
    for (seed <- Seq(1, 7, 23)) {
      val corpus = randomCorpus(seed, 60)
      val df = corpus.toDF("id", "body")
      val got = Bpe.train(df, "body", 20, maxLocalVocab = 0) // force distributed rounds
      val wordCounts = corpus.flatMap(_._2.split(" ")).filter(_.nonEmpty)
        .groupBy(identity).map { case (w, ws) => w -> ws.size.toLong }
      val want = refTrain(wordCounts, 20)
      assert(got === want, s"seed $seed")
    }
  }

  test("the local fast path and the distributed rounds produce identical merges") {
    val df = randomCorpus(31, 70).toDF("id", "body")
    val local = Bpe.train(df, "body", 18) // vocab ≪ default maxLocalVocab
    val dist = Bpe.train(df, "body", 18, maxLocalVocab = 0)
    assert(local === dist)
  }

  test("encoding matches the reference greedy loop and round-trips losslessly") {
    val corpus = randomCorpus(11, 80)
    val df = corpus.toDF("id", "body")
    val merges = Bpe.train(df, "body", 25)
    val rank = merges.zipWithIndex.toMap
    val out = Bpe.encode(df, "id", "body", merges)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
    val byId = corpus.toMap
    out.foreach { case (id, n, toks) =>
      // round-trip: stripping token boundaries reconstructs the text
      assert(toks.split(" ").mkString("") === byId(id).split(" ").filter(_.nonEmpty).mkString(""))
      assert(n === toks.split(" ").count(_.nonEmpty))
      // per-word greedy reference
      val refToks = byId(id).split(" ").filter(_.nonEmpty)
        .flatMap(w => Bpe.encodeWord(w, rank))
        .map(_.replace(Bpe.Eow, "")).filter(_.nonEmpty)
      // (encodeWord is the shared kernel; what this pins is that the
      // DataFrame path applied it per word with the trained ranks)
      assert(toks === refToks.mkString(" "))
    }
  }

  test("merges actually compress: trained encoding has fewer tokens than chars") {
    val corpus = randomCorpus(3, 50)
    val df = corpus.toDF("id", "body")
    val merges = Bpe.train(df, "body", 30)
    assert(merges.nonEmpty)
    val enc = Bpe.encode(df, "id", "body", merges)
      .agg(sum($"n_tokens")).as[Long].head()
    val chars = corpus.map(_._2.count(_ != ' ')).sum
    assert(enc < chars, s"no compression: $enc tokens vs $chars chars")
  }

  test("non-BMP corpora: both training paths agree and symbols split on code points") {
    // U+1F600 (4-byte UTF-8, surrogate pair in UTF-16) vs U+FF01
    // (3-byte UTF-8, single UTF-16 unit): UTF-16 code-unit order and
    // UTF-8 byte order DISAGREE on this pair (surrogates sort below
    // U+E000.. in UTF-16, supplementary planes sort above in UTF-8),
    // so the equal-count ties below expose any ordering divergence
    // between the local fast path and the distributed rounds.
    val emoji = "😀" // 😀
    val bang = "！"        // ！
    val words = Seq(s"a$emoji", s"a$bang", s"b$emoji", s"b$bang")
    val corpus = words.zipWithIndex.map { case (w, i) =>
      (i.toLong, Array.fill(3)(w).mkString(" ")) }
    val df = corpus.toDF("id", "body")
    val local = Bpe.train(df, "body", 6) // vocab ≪ default maxLocalVocab
    val dist = Bpe.train(df, "body", 6, maxLocalVocab = 0)
    assert(local === dist, "local and distributed merges diverge beyond ASCII")
    // no merge symbol may contain a lone surrogate (code-point split)
    local.flatMap(p => Seq(p._1, p._2)).foreach { s =>
      var i = 0
      while (i < s.length) {
        assert(!Character.isLowSurrogate(s.charAt(i)) || (i > 0 &&
          Character.isHighSurrogate(s.charAt(i - 1))), s"split surrogate in '$s'")
        i += 1
      }
    }
    // encoding round-trips the supplementary characters losslessly
    val out = Bpe.encode(df, "id", "body", local).collect()
    out.foreach { r =>
      val orig = corpus.find(_._1 == r.getLong(0)).get._2
        .split(" ").filter(_.nonEmpty).mkString("")
      assert(r.getString(2).split(" ").mkString("") === orig)
    }
  }

  test("training is partitioning-independent") {
    val corpus = randomCorpus(5, 40)
    val a = Bpe.train(corpus.toDF("id", "body"), "body", 15)
    val b = Bpe.train(corpus.toDF("id", "body").repartition(7), "body", 15)
    assert(a === b)
  }

  // ---- byte-level arm ----

  /** Sequential byte-level reference: GPT-2 pre-tokenize, UTF-8 bytes
    * mapped through the byte→char table as initial symbols, textbook
    * merge loop (count desc, pair UTF-8-order asc tie-break). */
  private def refTrainBytes(texts: Seq[String], numMerges: Int): Seq[(String, String)] = {
    val pts = texts.flatMap(Bpe.preTokenize)
    val wc = pts.groupBy(identity).map { case (k, vs) => k -> vs.size.toLong }
    var vocab: Map[Seq[String], Long] = wc.toSeq
      .map { case (pt, c) => (Bpe.byteSymbols(pt).toSeq, c) }
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sum }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var continue = true
    implicit val ord: Ordering[(String, String)] =
      Ordering.Tuple2(Bpe.Utf8Order, Bpe.Utf8Order)
    while (continue && merges.length < numMerges) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      vocab.foreach { case (syms, c) =>
        syms.sliding(2).foreach {
          case Seq(a, b) => counts((a, b)) = counts.getOrElse((a, b), 0L) + c
          case _ =>
        }
      }
      counts.toSeq.sortBy { case (p, n) => (-n, p) }.headOption match {
        case Some(((a, b), n)) if n >= 2 =>
          merges += ((a, b))
          vocab = vocab.toSeq.map { case (syms, c) =>
            val out = scala.collection.mutable.ArrayBuffer.empty[String]
            var i = 0
            while (i < syms.length) {
              if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
                out += (a + b); i += 2
              } else { out += syms(i); i += 1 }
            }
            (out.toSeq, c)
          }.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sum }
        case _ => continue = false
      }
    }
    merges.toSeq
  }

  test("byte mapping is a bijection over all 256 byte values") {
    assert(Bpe.ByteToChar.distinct.length === 256)
    (0 until 256).foreach { b =>
      assert(Bpe.CharToByte(Bpe.ByteToChar(b)) === b)
    }
    // ASCII space maps OUT of space (token join stays unambiguous)
    assert(Bpe.ByteToChar(0x20) !== ' ')
  }

  test("pre-tokenizer is a partition: concatenation reproduces the input " +
      "(incl. contractions, emoji, CJK, trailing space)") {
    Seq("it's a test, isn't it?  yes!", "汉字 mixed 123 text",
      "tab\tand\nnewline ", "😀 emoji 🎉🎉 runs", "", " ", "a'll b'd 42x",
      "trailing space ends here ").foreach { s =>
      assert(Bpe.preTokenize(s).mkString("") === s, s"not a partition: '$s'")
    }
  }

  test("byte-level training: distributed and local paths reproduce the " +
      "sequential reference, including on emoji/CJK text") {
    val texts = Seq(
      "the cat sat on the mat, the cat sat again",
      "汉字汉字 and more 汉字 here",
      "😀😀 smile 😀😀 smile it's fine",
      "numbers 123 123 123 and 456")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "body")
    val want = refTrainBytes(texts, 20)
    val local = Bpe.trainBytes(df, "body", 20)
    val dist = Bpe.trainBytes(df, "body", 20, maxLocalVocab = 0)
    assert(local === want, "local path diverges from sequential reference")
    assert(dist === want, "distributed path diverges from sequential reference")
    assert(want.nonEmpty)
  }

  test("byte-level encode → decode round-trips ANY text losslessly " +
      "(emoji, CJK, control chars, lone-ish punctuation)") {
    val texts = Seq(
      "plain ascii text",
      "mixed 汉字 and ascii",
      "😀🎉 emoji, incl. 4-byte ones 😀",
      "it's got contractions, isn't it",
      "weirdcontrolbytes",
      "  leading and trailing  ",
      "")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "body")
    val merges = Bpe.trainBytes(df, "body", 12)
    val out = Bpe.encodeBytes(df, "id", "body", merges)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      assert(Bpe.decodeBytes(out(i.toLong)) === t, s"doc $i not lossless")
    }
  }

  test("byte-level merge inventories differ from the code-point arm on " +
      "non-ASCII (multi-byte chars start as multiple symbols)") {
    val texts = Seq.fill(4)("汉字 汉字 汉字")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "body")
    val byteMerges = Bpe.trainBytes(df, "body", 4)
    // the first byte-level merge joins two mapped UTF-8 bytes — neither
    // side is a full code point, which the code-point arm cannot produce
    assert(byteMerges.nonEmpty)
    val (a, b) = byteMerges.head
    assert(a.length === 1 && b.length === 1)
    assert(Bpe.CharToByte.contains(a.head) && Bpe.CharToByte.contains(b.head))
    assert(Bpe.CharToByte(a.head) >= 0x80, "expected a UTF-8 continuation/lead byte")
  }

  test("byte-level gate query emits one row per document with positive " +
      "token counts on non-empty docs") {
    val out = Bpe.qBpeBytes(spark, "/root/testdata/sf0.001").cache()
    val docs = Tables.documents(spark, "/root/testdata/sf0.001").count()
    assert(out.count() === docs)
    assert(out.filter($"n_tokens" <= 0).count() === 0)
    // spot round-trip against the source text
    val src = Tables.documents(spark, "/root/testdata/sf0.001")
      .select($"doc_id", $"text").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    out.select($"doc_id", $"bpe_tokens").collect().take(50).foreach { r =>
      assert(Bpe.decodeBytes(r.getString(1)) === src(r.getLong(0)))
    }
    out.unpersist()
  }
}
