package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Unigram-LM (SentencePiece-style) tokenizer: the distributed training
  * rounds must be bit-identical to the driver-side reference path, the
  * Viterbi segmentation must be the true max-probability segmentation
  * (checked by exhaustive enumeration on short units), and encoding
  * must round-trip whitespace-normalized text losslessly — including
  * beyond-BMP code points. */
class UnigramSpec extends SparkTestBase {
  import spark.implicits._

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

  test("distributed training is bit-identical to the local reference path") {
    for (seed <- Seq(1, 7, 23)) {
      val df = randomCorpus(seed, 60).toDF("id", "body")
      val local = Unigram.train(df, "body", vocabSize = 24, emIters = 3,
        seedSize = 64, maxPieceLen = 6)
      val dist = Unigram.train(df, "body", vocabSize = 24, emIters = 3,
        seedSize = 64, maxPieceLen = 6, maxLocalVocab = 0) // force distributed
      assert(local.pieces === dist.pieces, s"seed $seed")
      assert(local.maxLen === dist.maxLen, s"seed $seed")
      assert(local.unkLogp === dist.unkLogp, s"seed $seed")
    }
  }

  test("viterbi finds the true max-probability segmentation (exhaustive check)") {
    val df = randomCorpus(13, 50).toDF("id", "body")
    val model = Unigram.train(df, "body", vocabSize = 20, seedSize = 48,
      maxPieceLen = 5)

    // exhaustive segmentation scorer over all 2^(n-1) splits
    def bestExhaustive(cps: Array[String]): Double = {
      def score(piece: String): Option[Double] =
        model.pieces.get(piece)
          .orElse(if (piece.codePointCount(0, piece.length) == 1)
            Some(model.unkLogp) else None)
      def go(i: Int): Double =
        if (i == cps.length) 0.0
        else (i + 1 to cps.length).foldLeft(Double.NegativeInfinity) { (acc, k) =>
          score(cps.slice(i, k).mkString) match {
            case Some(lp) =>
              val rest = go(k)
              math.max(acc, if (rest.isNegInfinity) rest else lp + rest)
            case None => acc
          }
        }
      go(0)
    }

    val units = randomCorpus(14, 8).flatMap(r => Unigram.wordUnits(r._2))
      .distinct.filter(_.length <= 12).take(30)
    assert(units.nonEmpty)
    units.foreach { u =>
      val segs = Unigram.viterbi(u, model)
      assert(segs.mkString === Unigram.codePoints(u).mkString, s"coverage of '$u'")
      val got = segs.map { p =>
        model.pieces.getOrElse(p, model.unkLogp)
      }.sum
      val want = bestExhaustive(Unigram.codePoints(u))
      assert(math.abs(got - want) < 1e-9, s"'$u': viterbi $got vs exhaustive $want")
    }
  }

  test("encode round-trips whitespace-normalized text; trained model compresses") {
    val corpus = randomCorpus(11, 80)
    val df = corpus.toDF("id", "body")
    val model = Unigram.train(df, "body", vocabSize = 48, seedSize = 128)
    val byId = corpus.toMap
    var toks = 0L
    val rows = Unigram.encode(df, "id", "body", model)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    rows.foreach { case (id, n, enc) =>
      val norm = byId(id).split("\\s+").filter(_.nonEmpty).mkString(" ")
      assert(Unigram.decode(enc) === norm, s"round-trip of doc $id")
      assert(n === enc.split(" ").count(_.nonEmpty))
      toks += n
    }
    val chars = corpus.map(_._2.count(_ != ' ')).sum
    assert(toks < chars, s"no compression: $toks tokens vs $chars chars")
  }

  test("documented marker collision: a literal U+2581 inside a word decodes " +
      "to a space (the SentencePiece add_dummy_prefix caveat)") {
    import spark.implicits._
    val df = Seq((1L, "a▁b plain")).toDF("id", "body")
    val model = Unigram.train(df, "body", vocabSize = 16, seedSize = 32)
    val enc = Unigram.encode(df, "id", "body", model).collect()(0).getString(2)
    assert(Unigram.decode(enc) === "a b plain",
      "the ▁ collision contract changed — update the Scaladoc if intended")
  }

  test("non-BMP corpora: paths agree, pieces split on code points, round-trip holds") {
    val emoji = "😀" // U+1F600, surrogate pair
    val bang = "！"        // U+FF01 fullwidth bang
    val corpus = Seq(s"a$emoji", s"a$bang", s"b$emoji", s"b$bang")
      .zipWithIndex.map { case (w, i) => (i.toLong, Array.fill(3)(w).mkString(" ")) }
    val df = corpus.toDF("id", "body")
    val local = Unigram.train(df, "body", vocabSize = 6, seedSize = 12,
      maxPieceLen = 3)
    val dist = Unigram.train(df, "body", vocabSize = 6, seedSize = 12,
      maxPieceLen = 3, maxLocalVocab = 0)
    assert(local.pieces === dist.pieces, "paths diverge beyond ASCII")
    // no piece may contain a lone surrogate
    local.pieces.keysIterator.foreach { s =>
      var i = 0
      while (i < s.length) {
        assert(!Character.isLowSurrogate(s.charAt(i)) || (i > 0 &&
          Character.isHighSurrogate(s.charAt(i - 1))), s"split surrogate in '$s'")
        i += 1
      }
    }
    val rows = Unigram.encode(df, "id", "body", local).collect()
    rows.foreach { r =>
      val norm = corpus.find(_._1 == r.getLong(0)).get._2
        .split("\\s+").filter(_.nonEmpty).mkString(" ")
      assert(Unigram.decode(r.getString(2)) === norm)
    }
  }

  test("coverage floor: every seen character is a piece; unseen chars still encode") {
    val df = Seq((0L, "abc abd acd"), (1L, "bcd bda")).toDF("id", "body")
    val model = Unigram.train(df, "body", vocabSize = 4, seedSize = 8)
    for (ch <- Seq("a", "b", "c", "d", Unigram.WordMark))
      assert(model.pieces.contains(ch), s"char '$ch' missing from vocabulary")
    // a character never seen in training must still encode (priced at unkLogp)
    val out = Unigram.encode(Seq((9L, "axz")).toDF("id", "body"), "id", "body", model)
      .collect().head
    assert(Unigram.decode(out.getString(2)) === "axz")
    assert(out.getLong(1) > 0)
  }

  test("training is partitioning-independent; NULL and empty text encode to zero tokens") {
    val corpus = randomCorpus(5, 40)
    val a = Unigram.train(corpus.toDF("id", "body"), "body", 15, seedSize = 40)
    val b = Unigram.train(corpus.toDF("id", "body").repartition(7), "body", 15,
      seedSize = 40)
    assert(a.pieces === b.pieces)

    val df = Seq((0L, "spark streams"), (1L, null.asInstanceOf[String]),
      (2L, "")).toDF("id", "body")
    val rows = Unigram.encode(df, "id", "body", a)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows(1L) === 0L)
    assert(rows(2L) === 0L)
    assert(rows(0L) > 0L)
  }
}
