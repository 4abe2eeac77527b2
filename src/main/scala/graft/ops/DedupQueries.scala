package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Near-duplicate detection over `documents` — the dedup family a
  * 100 TB training-data pipeline needs (north star; the reference's
  * own dedup surface is only exact offset-based exactly-once,
  * dis/DISUtils.scala:43-45).
  *
  * Scale design:
  *  - MinHash+LSH: signatures are fixed-width (128 longs/doc) however
  *    large the doc; candidate generation is an equi-join on
  *    (band, bandHash) — shuffle ∝ docs × bands, never O(n²). The
  *    exact-Jaccard verify only touches candidate pairs.
  *  - SimHash: one 62-bit fingerprint per doc; bucket-join on the
  *    fingerprint prefix would shard hamming search at scale (here we
  *    emit fingerprints + close pairs).
  *  - n-gram Jaccard: inverted-index join on shingles (exact, for
  *    moderate corpora / gold labels).
  * All hashing is arithmetic expressible in ANSI SQL so every operator
  * here is DuckDB-oracle-checkable end to end.
  */
object DedupQueries {

  // ---- shared tokenization ----

  private def tokens(c: Column): Column = filter(split(c, " "), t => t =!= "")

  /** Distinct word 3-gram shingles; docs under 3 tokens fall back to
    * the whole text as a single shingle. */
  private def shingles(text: Column): Column = {
    val t = tokens(text)
    array_distinct(
      when(size(t) < 3, array(text))
        .otherwise(transform(
          sequence(lit(1), size(t) - 2),
          i => concat_ws(" ",
            element_at(t, i), element_at(t, i + 1), element_at(t, i + 2)))))
  }

  /** SQL-replicable 31-bit token hash: position-weighted char sum mixed
    * by an LCG step (`(poly * 48271) % 2147483647`). Weaker than
    * xxhash64 but bit-identical in any engine — production would swap
    * in xxhash64 (same plan shape, one expression). */
  private def polyHash(s: Column): Column = {
    val poly = aggregate(
      zip_with(
        filter(split(s, ""), c => c =!= ""),
        sequence(lit(1), length(s)),
        (c, i) => i.cast("long") * ascii(c).cast("long")),
      lit(0L), (acc, x) => acc + x)
    pmod(poly * lit(48271L), lit(2147483647L))
  }

  private val MinHashK = 128
  private val Bands = 32
  private val RowsPerBand = 4 // P(candidate | J=0.8) = 1-(1-0.8^4)^32 ≈ 1-5e-8
  private val P = 1000000007L

  /** docs with columns (doc_id, sh: array<string>, n: int). */
  private def docShingles(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), shingles(col("text")).as("sh"))
      .withColumn("n", size(col("sh")))

  /** MinHash signature: sig_i = min over shingles of (a_i*h + b_i) mod P,
    * h = polyHash(shingle). One expression pipeline, no shuffle. */
  private def signature(sh: Column): Column = {
    val hs = transform(sh, s => polyHash(s))
    transform(sequence(lit(0), lit(MinHashK - 1)), i =>
      array_min(transform(hs, h =>
        pmod((i * 2 + 1) * h + i * i + 13, lit(P)))))
  }

  /** Exact Jaccard on a pair of shingle arrays (set semantics). */
  private def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") / size(array_union(a, b)).cast("double")

  /** Near-duplicate pairs via MinHash → LSH banding → bucket join →
    * exact-Jaccard verify at 0.8. Output: (doc_a, doc_b, jaccard). */
  def qMinhashDupes(spark: SparkSession, dir: String): DataFrame = {
    val docs = docShingles(spark, dir)
      .withColumn("sig", signature(col("sh")))
      .select(col("doc_id"), col("sh"), col("sig"))

    // band rows: (doc_id, band, bandHash); bandHash folds the band's
    // signature slice so the join key is one long, not an array
    val bands = docs.select(
      col("doc_id"),
      posexplode(transform(sequence(lit(0), lit(Bands - 1)), b =>
        aggregate(slice(col("sig"), b * RowsPerBand + 1, lit(RowsPerBand)),
          lit(0L), (acc, x) => pmod(acc * 31 + x, lit(P))))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bandhash")

    val candidates = bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") &&
        col("x.bandhash") === col("y.bandhash") &&
        col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()

    candidates
      .join(docs.select(col("doc_id"), col("sh").as("sh_a")), col("doc_a") === col("doc_id")).drop("doc_id")
      .join(docs.select(col("doc_id"), col("sh").as("sh_b")), col("doc_b") === col("doc_id")).drop("doc_id")
      .withColumn("jaccard", jaccard(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= 0.8)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  val minhashOracle: String =
    """WITH tok AS (
      |  SELECT doc_id, text, list_filter(string_split(text, ' '), t -> t <> '') AS w
      |  FROM documents
      |), sh AS (
      |  SELECT DISTINCT doc_id, unnest(
      |    CASE WHEN len(w) < 3 THEN [text]
      |         ELSE list_transform(range(1, len(w) - 1),
      |                i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]) END) AS s
      |  FROM tok
      |), n AS (SELECT doc_id, count(*) AS cnt FROM sh GROUP BY doc_id)
      |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |  count(*)::DOUBLE / (any_value(na.cnt) + any_value(nb.cnt) - count(*))::DOUBLE AS jaccard
      |FROM sh a
      |JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      |JOIN n na ON na.doc_id = a.doc_id
      |JOIN n nb ON nb.doc_id = b.doc_id
      |GROUP BY a.doc_id, b.doc_id
      |HAVING count(*)::DOUBLE / (any_value(na.cnt) + any_value(nb.cnt) - count(*))::DOUBLE >= 0.8""".stripMargin

  private val SimBits = 62

  /** 62-bit SimHash fingerprint per document: bit b set iff the sum of
    * ±1 votes (token-hash bit b) is positive. Everything is small-int
    * arithmetic so the oracle reproduces it bit-for-bit. */
  def qSimhash(spark: SparkSession, dir: String): DataFrame = {
    val t = tokens(col("text"))
    val hs = transform(t, s => polyHash(s)) // per-token 31-bit hash
    val bits = transform(sequence(lit(0), lit(SimBits - 1)), b =>
      when(aggregate(hs, lit(0L),
        (acc, h) => acc + pmod(h * (b * 2 + 17), lit(1000003L)) % 2 * 2 - 1) > 0, 1L)
        .otherwise(0L))
    val powers = array((0 until SimBits).map(i => lit(1L << i)): _*)
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        aggregate(
          zip_with(bits, powers, (bit, p) => bit * p),
          lit(0L), (acc, x) => acc + x).as("simhash"))
  }

  val simhashOracle: String =
    """WITH tok AS (
      |  SELECT doc_id, unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS t
      |  FROM documents
      |), th AS (
      |  SELECT doc_id,
      |    (list_sum(list_transform(string_split(t, ''), (c, i) -> i * ascii(c)))
      |      * 48271) % 2147483647 AS h
      |  FROM tok
      |), votes AS (
      |  SELECT doc_id, b.b AS b,
      |    sum((h * (b.b * 2 + 17)) % 1000003 % 2 * 2 - 1) AS v
      |  FROM th, (SELECT unnest(range(0, 62)) AS b) b
      |  GROUP BY doc_id, b.b
      |)
      |SELECT doc_id,
      |  sum(CASE WHEN v > 0 THEN (1::BIGINT << b::INT) ELSE 0 END)::BIGINT AS simhash
      |FROM votes GROUP BY doc_id""".stripMargin

  /** Exact character-5-gram Jaccard pairs at ≥ 0.7 via inverted-index
    * join (no LSH — the exact variant of the family). */
  def qNgramJaccard(spark: SparkSession, dir: String): DataFrame = {
    val gramsDyn = array_distinct(transform(
      sequence(lit(1), greatest(length(col("text")) - 4, lit(1))),
      i => col("text").substr(i, lit(5))))
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), gramsDyn.as("g"))
      .withColumn("n", size(col("g")))
    val inv = docs.select(col("doc_id"), col("n"), explode(col("g")).as("s"))
    inv.as("a").join(inv.as("b"),
        col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("c"),
        first(col("a.n")).as("na"), first(col("b.n")).as("nb"))
      .withColumn("jaccard",
        col("c").cast("double") / (col("na") + col("nb") - col("c")).cast("double"))
      .filter(col("jaccard") >= 0.7)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  val ngramOracle: String =
    """WITH g AS (
      |  SELECT DISTINCT doc_id, unnest(list_transform(
      |    range(1, greatest(length(text) - 4, 1) + 1),
      |    i -> substr(text, i, 5))) AS s
      |  FROM documents
      |), n AS (SELECT doc_id, count(*) AS cnt FROM g GROUP BY doc_id)
      |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |  count(*)::DOUBLE / (any_value(na.cnt) + any_value(nb.cnt) - count(*))::DOUBLE AS jaccard
      |FROM g a
      |JOIN g b ON a.s = b.s AND a.doc_id < b.doc_id
      |JOIN n na ON na.doc_id = a.doc_id
      |JOIN n nb ON nb.doc_id = b.doc_id
      |GROUP BY a.doc_id, b.doc_id
      |HAVING count(*)::DOUBLE / (any_value(na.cnt) + any_value(nb.cnt) - count(*))::DOUBLE >= 0.7""".stripMargin
}
