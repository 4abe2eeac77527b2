package graft.ops

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Distributed byte-pair-encoding tokenizer training + encoding — the
  * vocabulary-learning step of an LLM data pipeline (north star; the
  * reference has no tokenization surface).
  *
  * Scale design (the classic Sennrich word-level formulation): merges
  * never cross word boundaries, so training runs on the DISTINCT-word
  * count table — one corpus-sized shuffle up front, then every merge
  * round touches only the vocabulary (⋘ corpus; at 100 TB the corpus
  * is petascale but the distinct-word table is millions of rows).
  * Each round = one pair-count aggregation over the vocab + a 1-row
  * top-1 collect (deterministic tie-break: count desc, pair lex asc),
  * then a kernel rewrite of the affected words. The vocab frame is
  * cached and re-checkpointed every few rounds to keep lineage flat —
  * the same pattern as dupClusters' pointer jumping.
  *
  * Encoding broadcasts the ranked merge list and applies it greedily
  * (lowest-rank pair first — the exact GPT-2 `bpe()` loop) in a
  * per-partition kernel: shuffle-free over the corpus.
  */
object Bpe {

  /** End-of-word sentinel (the classic `</w>`), kept out of the
    * printable-token space so round-trips are unambiguous. */
  private[ops] val Eow = ""

  /** One symbol per Unicode CODE POINT (not UTF-16 char — splitting
    * surrogate pairs would make non-BMP merges byte-invalid), plus the
    * end-of-word sentinel. */
  private def wordSymbols(w: String): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < w.length) {
      val cp = w.codePointAt(i)
      out += new String(Character.toChars(cp))
      i += Character.charCount(cp)
    }
    out += Eow
    out.toArray
  }

  /** UTF-8 byte order — what Spark's UTF8String comparison (and so the
    * distributed rounds' `orderBy`) uses. The local fast path MUST
    * tie-break with the same ordering or the two paths diverge beyond
    * ASCII (Java's String ordering compares UTF-16 code units, which
    * sorts supplementary characters differently). */
  private[ops] val Utf8Order: Ordering[String] = new Ordering[String] {
    def compare(x: String, y: String): Int = {
      val a = x.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val b = y.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      var i = 0
      val n = math.min(a.length, b.length)
      while (i < n) {
        val c = (a(i) & 0xff) - (b(i) & 0xff)
        if (c != 0) return c
        i += 1
      }
      a.length - b.length
    }
  }

  /** Learn `numMerges` merges from a text column. Returns the ranked
    * merge list (left symbol, right symbol), rank = list index.
    *
    * The corpus-sized work (tokenize + word count) is always
    * distributed. The merge ITERATION runs on the distinct-word table;
    * when that table is small (≤ maxLocalVocab rows) it is collected
    * and iterated on the driver — a bounded collect, same pattern as
    * the IVF centroid sample — because numMerges Spark rounds over a
    * tiny table are pure scheduler latency (measured ~6 s for 24
    * merges over a 31-word vocab vs <50 ms local). Large vocabularies
    * take the distributed rounds. Both paths share the tie-break —
    * count desc, pair UTF-8-byte-order asc (the ordering Spark's
    * UTF8String compare gives the distributed `orderBy`) — and are
    * pinned identical in BpeSpec, including beyond-BMP input. */
  def train(df: DataFrame, text: String, numMerges: Int,
            maxLocalVocab: Int = 1 << 16): Seq[(String, String)] = {
    val wc = df.select(explode(filter(split(col(text), " "), t => t =!= "")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .cache()
    val n = wc.count()
    val res =
      if (n <= maxLocalVocab)
        trainLocal(wc.collect().map(r => (r.getString(0), r.getLong(1))), numMerges)
      else trainDistributed(wc, numMerges)
    wc.unpersist(false)
    res
  }

  /** Driver-side merge iteration over a collected word-count table. */
  private def trainLocal(words: Array[(String, Long)],
                         numMerges: Int): Seq[(String, String)] = {
    var vocab: Map[Seq[String], Long] = words
      .map { case (w, c) => (wordSymbols(w).toSeq, c) }
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sum }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var continue = true
    while (continue && merges.length < numMerges) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      vocab.foreach { case (syms, c) =>
        var i = 0
        while (i < syms.length - 1) {
          val k = (syms(i), syms(i + 1))
          counts(k) = counts.getOrElse(k, 0L) + c
          i += 1
        }
      }
      implicit val pairOrder: Ordering[(String, String)] =
        Ordering.Tuple2(Utf8Order, Utf8Order)
      val best = counts.toSeq
        .sortBy { case ((a, b), cnt) => (-cnt, (a, b)) }.headOption
      best match {
        case Some(((a, b), cnt)) if cnt >= 2 =>
          merges += ((a, b))
          vocab = vocab.toSeq.map { case (syms, c) => (mergeOnce(syms, a, b), c) }
            .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sum }
        case _ => continue = false
      }
    }
    merges.toSeq
  }

  /** Distributed merge rounds over the word-count frame — the path for
    * vocabularies too large to collect. */
  private def trainDistributed(wc: DataFrame, numMerges: Int): Seq[(String, String)] = {
    val enc = Encoders.row(StructType(Seq(
      StructField("syms", ArrayType(StringType)), StructField("cnt", LongType))))
    var vocab = wc
      .mapPartitions { it =>
        it.map(r => Row(wordSymbols(r.getString(0)).toSeq, r.getLong(1)))
      }(enc)
      .cache()
    vocab.count()

    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var round = 0
    while (round < numMerges) {
      // pair frequencies, weighted by word count; adjacent symbol pairs
      val top = vocab
        .select(col("cnt"), col("syms"),
          posexplode(slice(col("syms"), lit(1), size(col("syms")) - 1)))
        .select(col("cnt"), col("col").as("a"),
          element_at(col("syms"), col("pos") + 2).as("b"))
        .groupBy("a", "b").agg(sum(col("cnt")).as("n"))
        .orderBy(col("n").desc, col("a").asc, col("b").asc)
        .limit(1).collect() // 1 row by construction
      if (top.isEmpty || top(0).getLong(2) < 2) round = numMerges
      else {
        val (a, b) = (top(0).getString(0), top(0).getString(1))
        merges += ((a, b))
        val old = vocab
        vocab = old.mapPartitions { it =>
          it.map { r =>
            val syms = r.getSeq[String](0)
            Row(mergeOnce(syms, a, b), r.getLong(1))
          }
        }(enc).cache()
        // truncate lineage every 8 rounds so the plan doesn't deepen
        // unboundedly (same pattern as dupClusters' pointer jumping)
        if ((merges.length % 8) == 0) vocab = vocab.localCheckpoint(true)
        vocab.count()
        old.unpersist(false)
        round += 1
      }
    }
    vocab.unpersist(false)
    merges.toSeq
  }

  private def mergeOnce(syms: Seq[String], a: String, b: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toSeq
  }

  /** Greedy merge-rank encoding of one word (the GPT-2 `bpe()` loop):
    * repeatedly merge the present pair with the lowest rank. */
  private[ops] def encodeWord(w: String, rank: Map[(String, String), Int]): Array[String] = {
    var syms = wordSymbols(w)
    var done = false
    while (!done && syms.length > 1) {
      var best = Int.MaxValue; var bi = -1
      var i = 0
      while (i < syms.length - 1) {
        val r = rank.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (r < best) { best = r; bi = i }
        i += 1
      }
      if (bi < 0) done = true
      else {
        val merged = syms(bi) + syms(bi + 1)
        syms = (syms.take(bi) :+ merged) ++ syms.drop(bi + 2)
      }
    }
    syms
  }

  /** Encode a corpus with a trained merge list. Output: (id, n_tokens,
    * tokens as a space-joined string with the end-of-word sentinel
    * stripped — scalar so it can sit under the gate comparator).
    * The ranked merges broadcast; a wide input encodes where it
    * lives, shuffle-free — only a narrow (single-split) input is first
    * spread across the cluster ([[Spread.widen]]). NULL text encodes
    * to zero tokens. */
  def encode(df: DataFrame, id: String, text: String,
             merges: Seq[(String, String)]): DataFrame = {
    val bc = df.sparkSession.sparkContext.broadcast(
      merges.zipWithIndex.toMap)
    val enc = Encoders.row(StructType(Seq(
      StructField(id, LongType), StructField("n_tokens", LongType),
      StructField("bpe_tokens", StringType))))
    Spread.widen(df.select(col(id), coalesce(col(text), lit(""))))
      .mapPartitions { it =>
        val rank = bc.value
        it.map { r =>
          // a never-merged word-final sentinel strips to an empty
          // token — drop those so the output is purely printable
          val toks = r.getString(1).split(" ").filter(_.nonEmpty)
            .flatMap(w => encodeWord(w, rank))
            .map(_.replace(Eow, "")).filter(_.nonEmpty)
          Row(r.getLong(0), toks.length.toLong, toks.mkString(" "))
        }
      }(enc)
  }

  /** Gate binding: 24 merges trained on the even half of `documents`,
    * encoding applied to the full corpus. Engine-specific (iterative
    * argmax training is not expressible in ANSI SQL) → rows-only gate;
    * BpeSpec pins training + encoding against a sequential reference
    * implementation and the lossless round-trip. */
  def qBpeEncode(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val merges = train(docs.filter(pmod(col("doc_id"), lit(2)) === 0), "text", 24)
    encode(docs, "doc_id", "text", merges)
  }
}
