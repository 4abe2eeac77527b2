package graft.api

import org.scalacheck.Gen

import graft.SparkTestBase

/** Property tests for the fifteenth/sixteenth-pass operators: the
  * distributed implementations must agree with straightforward
  * single-machine references on random corpora (small alphabets →
  * dense collisions and boundary cases). */
class RetrievalPropertySpec extends SparkTestBase {
  import spark.implicits._

  // ---- cdcChunks vs a sequential reference ----

  private def refCdc(s: String, w: Int, m: Long): List[String] = {
    if (s.length < w) Nil
    else {
      val cuts = scala.collection.mutable.ArrayBuffer.empty[Int]
      var h = 0L
      for (i <- 0 until w) h = (h << 1) + s.charAt(i).toLong * 2654435761L
      var pos = w
      while (pos <= s.length) {
        if ((h & Long.MaxValue) % m == 0L || pos == s.length) cuts += pos
        if (pos < s.length) {
          h = ((h - s.charAt(pos - w).toLong * 2654435761L * (1L << (w - 1))) << 1) +
            s.charAt(pos).toLong * 2654435761L
        }
        pos += 1
      }
      (0 +: cuts.toList).sliding(2).map { case List(a, b) => s.substring(a, b) }.toList
    }
  }

  test("property: cdcChunks tiles exactly like the sequential reference on random text") {
    val gen = Gen.chooseNum(0, 400).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b', 'c', ' ')).map(_.mkString))
    (1 to 20).foreach { seed =>
      val texts = Gen.listOfN(6, gen)
        .apply(Gen.Parameters.default, org.scalacheck.rng.Seed(seed)).get
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val got = Graft.cdcChunks(df, "doc_id", "text", window = 8, modulus = 16L)
        .collect()
        .map(r => (r.getLong(0), r.getInt(1)) -> (r.getLong(2), r.getLong(3)))
        .toMap
      val want = texts.zipWithIndex.flatMap { case (t, i) =>
        refCdc(t, 8, 16L).zipWithIndex.map { case (c, j) =>
          (i.toLong, j + 1) -> ((c.length.toLong, graft.ops.DedupQueries.polyHashS(c)))
        }
      }.toMap
      assert(got === want, s"seed $seed")
    }
  }

  test("property: cdcChunks wide-window/non-ASCII hash equals the exact " +
      "BigInt sum mod 2^63 (the wrap-around mask is a true mod-2^63 hash)") {
    // window 30 × chars up to ￿ would overflow an unmasked Long sum;
    // the masked rolling hash must still equal the EXACT sum mod 2^63.
    val w = 30
    val m = 37L // non-power-of-2: divisibility is NOT wrap-invariant
    val gen = Gen.chooseNum(w, 200).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'z', '\u4e2d', '\uffff', ' ')).map(_.mkString))
    val two63 = BigInt(1) << 63
    def exactCuts(s: String): List[Int] = {
      val cuts = scala.collection.mutable.ArrayBuffer.empty[Int]
      var pos = w
      while (pos <= s.length) {
        val hv = (0 until w).map { j =>
          BigInt(s.charAt(pos - 1 - j).toLong) * BigInt(2654435761L) * (BigInt(1) << j)
        }.sum.mod(two63)
        if (hv % m == 0 || pos == s.length) cuts += pos
        pos += 1
      }
      cuts.toList
    }
    (1 to 10).foreach { seed =>
      val texts = Gen.listOfN(4, gen)
        .apply(Gen.Parameters.default, org.scalacheck.rng.Seed(seed)).get
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val got = Graft.cdcChunks(df, "doc_id", "text", window = w, modulus = m)
        .collect()
        .map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2))
        .toMap
      val want = texts.zipWithIndex.flatMap { case (t, i) =>
        val cuts = exactCuts(t)
        (0 +: cuts).sliding(2).zipWithIndex.collect {
          case (List(a, b), j) => (i.toLong, j + 1) -> (b - a).toLong
        }
      }.toMap
      assert(got === want, s"seed $seed")
    }
  }

  // ---- phraseSearch vs a naive scan ----

  test("property: phraseSearch matches a naive consecutive-scan reference") {
    val word = Gen.oneOf("x", "y", "z")
    val doc = Gen.chooseNum(0, 15).flatMap(n => Gen.listOfN(n, word))
    (1 to 15).foreach { seed =>
      val docs = Gen.listOfN(10, doc)
        .apply(Gen.Parameters.default, org.scalacheck.rng.Seed(seed)).get
      val df = docs.zipWithIndex.map { case (ws, i) => (i.toLong, ws.mkString(" ")) }
        .toDF("doc_id", "text")
      val phrase = Seq("x", "y")
      val got = Graft.phraseSearch(df, "doc_id", "text", phrase, k = 100)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val ptf = docs.zipWithIndex.map { case (ws, i) =>
        i.toLong -> ws.sliding(2).count(_ == phrase.toList)
      }.filter(_._2 > 0).toMap
      assert(got.keySet === ptf.keySet, s"seed $seed docs $docs")
      ptf.foreach { case (id, n) => assert(got(id) === n.toLong, s"seed $seed doc $id") }
    }
  }

  // ---- FIM / span corruption: lossless reconstruction ----

  test("property: FIM and span-corruption are lossless — originals reconstruct " +
      "exactly from the transformed outputs") {
    val gen = Gen.chooseNum(0, 60).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("aa", "bb", "cc")).map(_.mkString(" ")))
    (1 to 15).foreach { seed =>
      val texts = Gen.listOfN(8, gen)
        .apply(Gen.Parameters.default, org.scalacheck.rng.Seed(seed)).get
      // documents schema expected by the fixture-bound queries: write a
      // temp dir with the same table name
      val dir = java.nio.file.Files.createTempDirectory("fimprop-").toString
      texts.zipWithIndex
        .map { case (t, i) => (i.toLong, t, "en", "src0", t.length.toLong) }
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.parquet(s"$dir/documents.parquet")

      // FIM: text == prefix + middle + suffix, recovered by cut indices
      val fim = graft.ops.TextQueries.qFim(spark, dir)
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
      texts.zipWithIndex.foreach { case (t, i) =>
        val (c1, c2, psm) = fim(i.toLong)
        val p = psm.indexOf("<SUF>"); val m = psm.indexOf("<MID>")
        val prefix = psm.substring(5, p)
        val suffix = psm.substring(p + 5, m)
        val middle = psm.substring(m + 5)
        assert(prefix + middle + suffix === t, s"seed $seed doc $i")
        assert(prefix.length === c1.toInt && middle.length === (c2 - c1).toInt)
      }

      // span corruption: splicing target spans back into the sentinels
      // reproduces the original token stream
      val sc = graft.ops.TextQueries.qSpanCorrupt(spark, dir)
        .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getString(2)))).toMap
      texts.zipWithIndex.foreach { case (t, i) =>
        val (corrupted, target) = sc(i.toLong)
        val spans = target.split("<X\\d+>").map(_.trim).filter(_.nonEmpty)
        var rebuilt = corrupted
        spans.zipWithIndex.foreach { case (span, j) =>
          rebuilt = rebuilt.replace(s"<X$j>", span)
        }
        val origTokens = t.split(" ").filter(_.nonEmpty).mkString(" ")
        assert(rebuilt === origTokens, s"seed $seed doc $i: '$rebuilt' vs '$origTokens'")
      }
    }
  }

  // ---- maxsim vs a naive double loop ----

  test("maxsim scoring equals the naive per-query-token max over doc vectors") {
    val rnd = new java.util.Random(11)
    def v(): Seq[Float] = Seq.fill(8)(rnd.nextFloat() - 0.5f)
    // 6 docs × 3 vectors + 2 query tokens
    val corpus = (for (d <- 0 until 6; j <- 0 until 3) yield (d.toLong, v())).toSeq
    val qtoks = Seq((0L, v()), (1L, v()))
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
      val na = math.sqrt(a.map(x => x.toDouble * x.toDouble).sum)
      val nb = math.sqrt(b.map(x => x.toDouble * x.toDouble).sum)
      dot / na / nb
    }
    val want = (0 until 6).map { d =>
      val dvs = corpus.filter(_._1 == d).map(_._2)
      d.toLong -> qtoks.map { case (_, qv) =>
        math.floor(BigDecimal(dvs.map(dv => cos(dv, qv)).max)
          .setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble * 1e6 + 0.5).toLong
      }.sum / 1e6
    }.toMap

    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    val cdf = corpus.toDF("doc", "vec")
      .select(col("doc"), col("vec").cast(ArrayType(FloatType)).as("vec"))
    val qdf = qtoks.toDF("qtok", "qv")
      .select(col("qtok"), col("qv").cast(ArrayType(FloatType)).as("qv"))
    import graft.functions.VecMath.float_dot
    val scored = cdf.join(broadcast(qdf))
      .select(col("doc"), col("qtok"),
        round(float_dot(col("vec"), col("qv")) /
          sqrt(float_dot(col("vec"), col("vec"))) /
          sqrt(float_dot(col("qv"), col("qv"))), 12).as("c"))
      .groupBy(col("doc"), col("qtok"))
      .agg(floor(max(col("c")) * 1e6 + 0.5).cast("long").as("m"))
      .groupBy(col("doc")).agg((sum(col("m")).cast("double") / 1e6).as("maxsim"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // float32 storage truncates the fixture vectors identically on both
    // paths; the per-token quantized maxima must agree exactly
    assert(scored === want)
  }
}
