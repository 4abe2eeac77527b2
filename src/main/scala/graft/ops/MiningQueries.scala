package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.api.Graft

/** Gate bindings for the round-9 corpus-mining / curation operators:
  * heavy hitters, winnowing fingerprints, PageRank authority, URL
  * canonicalization, readability, embedding decontamination, CCNet
  * perplexity buckets, and length histograms. Each query pairs a
  * [[graft.api.Graft]] operator with a DuckDB oracle over the same
  * fixture tables.
  */
object MiningQueries {

  // ----- heavy hitters -----

  private val HhK = 512
  private val HhMin = 1L

  /** Exact heavy hitters over `documents.text` tokens: Misra–Gries
    * candidates + exact recount; threshold = max(1, ⌊n/k⌋+1).
    *
    * k=512 (≈0.2% relative threshold, the q_heavy_hitters_cms cut):
    * the round-15 verdict's non-vacuity fix — the old k=16 threshold
    * (⌊n/16⌋+1) exceeded every word's count on BOTH gate fixtures, so
    * the gate row proved only that two engines agree on the empty set.
    * At k=512 the gate returns 30 rows at sf0.01 and 300 at sf1
    * (amplified copies dilute every word's share ~10× via per-copy
    * suffixes, which is exactly why a relative cut is required). The
    * gate fixtures' vocabularies (31 / 310 words) are smaller than k,
    * so the MG summaries there are exact by construction; the
    * decrement path (vocabulary ≫ k) keeps its own planted exactness
    * pins in MiningSpec. */
  def qHeavyHitters(spark: SparkSession, dir: String): DataFrame =
    Graft.heavyHitters(
      Tables.documents(spark, dir).select(col("text")), "text", HhK, HhMin)

  val heavyHittersOracle: String =
    s"""WITH t AS (
       |  SELECT unnest(list_filter(string_split(text, ' '), w -> w <> '')) AS w
       |  FROM documents
       |), tot AS (SELECT count(*) AS n FROM t)
       |SELECT w AS word, count(*)::BIGINT AS cnt
       |FROM t, tot GROUP BY w, tot.n
       |HAVING count(*) >= greatest($HhMin, tot.n // $HhK + 1)""".stripMargin

  /** CMS heavy hitters over the same token domain as
    * [[qHeavyHitters]] — the sketch itself (4×1024 LCG-hashed counter
    * grid, est = min over rows) is what the oracle replays, so the
    * one-sided estimation error is gate-checked, not just the final
    * set. Threshold: est ≥ 0.2% of the token count — non-trivial at
    * BOTH gate scales (amplified corpora dilute every word's share by
    * the factor via per-copy suffixes; a 1% cut returns empty at sf1). */
  def qHeavyHittersCms(spark: SparkSession, dir: String): DataFrame =
    Graft.cmsHeavyHitters(
      Tables.documents(spark, dir).select(col("text")), "text",
      width = 1024, depth = 4, denom = 500L)

  val heavyHittersCmsOracle: String = {
    val as = Seq(1103515245L, 214013L, 69069L, 1664525L)
    val bs = Seq(12345L, 2531011L, 1L, 1013904223L)
    // bucket = TOP 10 bits of the 31-bit row hash (// 2²¹) — the
    // low-bit extraction would collapse all four rows to one function
    // of h mod 1024 (the LCG low-bit trap, caught at sf1 in round 15)
    val rows = (0 until 4).map(i =>
      s"SELECT w, cnt, $i AS i, ((h * ${as(i)} + ${bs(i)}) % 2147483648) // 2097152 AS b FROM h")
      .mkString("\nUNION ALL\n")
    s"""WITH t AS (
       |  SELECT unnest(list_filter(string_split(text, ' '), w -> w <> '')) AS w
       |  FROM documents
       |), wc AS (
       |  SELECT w, count(*)::BIGINT AS cnt FROM t GROUP BY w
       |), h AS (
       |  SELECT w, cnt, list_reduce(
       |      list_prepend(0::BIGINT, list_transform(string_split(w, ''), c -> ascii(c)::BIGINT)),
       |      (acc, c) -> (acc * 31 + c) % 2147483648) AS h
       |  FROM wc
       |), ib AS (
       |$rows
       |), sketch AS (
       |  SELECT i, b, sum(cnt)::BIGINT AS c FROM ib GROUP BY i, b
       |), tot AS (SELECT sum(cnt)::BIGINT AS n FROM wc),
       |est AS (
       |  SELECT ib.w AS word, min(sketch.c)::BIGINT AS est
       |  FROM ib JOIN sketch USING (i, b) GROUP BY ib.w
       |)
       |SELECT word, est FROM est, tot WHERE est * 500 >= n""".stripMargin
  }

  /** Gini coefficient of the word-frequency distribution — the
    * concentration diagnostic next to [[qZipf]]'s power-law slope
    * (Gini → 1 as a few tokens dominate the corpus). Over SORTED
    * frequencies x₁ ≤ … ≤ xₙ, G = (2·Σ i·xᵢ)/(n·Σxᵢ) − (n+1)/n —
    * every sum an exact integer (rank window over the vocabulary-sized
    * frequency table, like zipf; never over the corpus), one double
    * division at the end (round 6). Ranks tie-break on the word so
    * the weighted sum is deterministic, and Σ i·xᵢ is tie-invariant
    * anyway (equal x under permuted equal ranks sums identically). */
  def qGini(spark: SparkSession, dir: String): DataFrame = {
    val freq = Tables.documents(spark, dir)
      .select(explode(filter(split(col("text"), " "), t => t =!= "")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
    val ranked = freq.withColumn("__r",
      row_number().over(org.apache.spark.sql.expressions.Window
        .orderBy(col("c").asc, col("w").asc)).cast("long"))
    ranked.agg(
      count(lit(1)).as("n_types"),
      sum(col("c")).as("n_tokens"),
      round(
        (lit(2.0) * sum(col("__r") * col("c")).cast("double")) /
          (count(lit(1)).cast("double") * sum(col("c")).cast("double")) -
          (count(lit(1)) + 1L).cast("double") / count(lit(1)).cast("double"),
        6).as("gini"))
  }

  val giniOracle: String =
    """WITH f AS (
      |  SELECT w, count(*)::BIGINT AS c FROM (
      |    SELECT unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS w
      |    FROM documents)
      |  GROUP BY w
      |), r AS (
      |  SELECT c, row_number() OVER (ORDER BY c ASC, w ASC)::BIGINT AS rk FROM f
      |)
      |SELECT count(*)::BIGINT AS n_types, sum(c)::BIGINT AS n_tokens,
      |  round((2.0::DOUBLE * sum(rk * c)::DOUBLE)
      |      / (count(*)::DOUBLE * sum(c)::DOUBLE)
      |    - (count(*) + 1)::DOUBLE / count(*)::DOUBLE, 6) AS gini
      |FROM r""".stripMargin

  /** Vocabulary coverage curve: the smallest top-k vocabularies that
    * cover 80 % / 95 % / 99 % of corpus tokens — the sizing question
    * every tokenizer build answers first. One corpus shuffle for the
    * frequency table; the cumulative sum runs over the
    * vocabulary-sized frame ordered (count desc, word asc), and the
    * thresholds are exact integer comparisons (cum·100 ≥ pct·total —
    * no doubles anywhere). */
  def qCoverageCurve(spark: SparkSession, dir: String): DataFrame = {
    val freq = Tables.documents(spark, dir)
      .select(explode(filter(split(col("text"), " "), t => t =!= "")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("c").desc, col("w").asc)
    val cum = freq
      .withColumn("__r", row_number().over(w).cast("long"))
      .withColumn("__cum", sum(col("c")).over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
    cum.crossJoin(broadcast(freq.agg(sum(col("c")).as("__tot"),
        count(lit(1)).as("n_types"))))
      .agg(
        first(col("n_types")).as("n_types"),
        first(col("__tot")).as("n_tokens"),
        min(when(col("__cum") * 100L >= col("__tot") * 80L, col("__r"))).as("k80"),
        min(when(col("__cum") * 100L >= col("__tot") * 95L, col("__r"))).as("k95"),
        min(when(col("__cum") * 100L >= col("__tot") * 99L, col("__r"))).as("k99"))
  }

  val coverageCurveOracle: String =
    """WITH f AS (
      |  SELECT w, count(*)::BIGINT AS c FROM (
      |    SELECT unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS w
      |    FROM documents)
      |  GROUP BY w
      |), r AS (
      |  SELECT c, row_number() OVER (ORDER BY c DESC, w ASC)::BIGINT AS rk,
      |    sum(c) OVER (ORDER BY c DESC, w ASC
      |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS cum
      |  FROM f
      |), t AS (SELECT sum(c)::BIGINT AS tot, count(*)::BIGINT AS n_types FROM f)
      |SELECT t.n_types, t.tot AS n_tokens,
      |  min(CASE WHEN cum * 100 >= tot * 80 THEN rk END)::BIGINT AS k80,
      |  min(CASE WHEN cum * 100 >= tot * 95 THEN rk END)::BIGINT AS k95,
      |  min(CASE WHEN cum * 100 >= tot * 99 THEN rk END)::BIGINT AS k99
      |FROM r CROSS JOIN t GROUP BY t.n_types, t.tot""".stripMargin

  // ----- winnowing fingerprints -----

  private val WinK = 8
  private val WinW = 4

  /** Winnowing fingerprint posting list over `documents.text`
    * (k=8-char grams, window w=4). */
  def qWinnow(spark: SparkSession, dir: String): DataFrame =
    Graft.winnow(
      Tables.documents(spark, dir).select(col("doc_id"), col("text")),
      "doc_id", "text", WinK, WinW)

  val winnowOracle: String =
    s"""WITH g AS (
       |  SELECT doc_id, text,
       |    unnest(range(1, greatest(length(text) - ${WinK - 2}, 1))) AS pos
       |  FROM documents
       |), h AS (
       |  SELECT doc_id, pos,
       |    ((list_sum(list_transform(string_split(substr(text, pos::INT, $WinK), ''),
       |        (c, i) -> i * ascii(c))) * 48271) % 2147483647)::BIGINT AS hv
       |  FROM g
       |), w AS (
       |  SELECT doc_id, pos,
       |    min(hv) OVER (PARTITION BY doc_id ORDER BY pos
       |                  ROWS BETWEEN ${WinW - 1} PRECEDING AND CURRENT ROW) AS m
       |  FROM h
       |)
       |SELECT DISTINCT doc_id, m AS fp FROM w WHERE pos >= $WinW""".stripMargin

  // ----- PageRank authority -----

  /** PageRank over the customer–supplier trade graph (orders ⋈
    * lineitem, symmetrized so the bipartite graph has no sinks),
    * 3 iterations at d = 0.85. Node ids are 'c<custkey>'/'s<suppkey>'. */
  def qPagerank(spark: SparkSession, dir: String): DataFrame = {
    val e0raw = Tables.orders(spark, dir).select(col("o_orderkey"), col("o_custkey"))
      .join(Tables.lineitem(spark, dir).select(col("l_orderkey"), col("l_suppkey")),
        col("o_orderkey") === col("l_orderkey"))
      .select(concat(lit("c"), col("o_custkey")).as("src"),
        concat(lit("s"), col("l_suppkey")).as("dst"))
      .distinct()
    // share the distinct edge list across the symmetrizing union +
    // pageRank's nodes/outdeg/withDeg construction (otherwise the
    // orders⋈lineitem→distinct subtree is recomputed four times) with a
    // LAZY persist: the round-18 eager localCheckpoint here cost
    // +1.5-2.5 s wall (min-of-4 interleaved in-JVM A/B — its extra
    // blocking materialization job outweighed the recompute it saved)
    // and burned lineage fault tolerance; persist() keeps the sharing,
    // spills under pressure, and recomputes on executor loss.
    val e0 = e0raw.persist()
    val e = e0.union(e0.select(col("dst").as("src"), col("src").as("dst")))
    Graft.pageRank(e, "src", "dst", iters = 3, damping = 0.85)
  }

  val pagerankOracle: String = {
    def iter(prev: String, out: String): String =
      s"""c$out AS (
         |  SELECT e.dst AS node, sum($prev.rank / deg.d) AS s
         |  FROM e JOIN deg ON e.src = deg.src JOIN $prev ON $prev.node = e.src
         |  GROUP BY e.dst
         |), $out AS (
         |  SELECT nodes.node,
         |    (1.0 - 0.85) / n.nn + 0.85 * coalesce(c$out.s, 0) AS rank
         |  FROM nodes CROSS JOIN n LEFT JOIN c$out ON c$out.node = nodes.node
         |)""".stripMargin
    s"""WITH e0 AS (
       |  SELECT DISTINCT 'c' || o_custkey AS src, 's' || l_suppkey AS dst
       |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey
       |), e AS (
       |  SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0
       |), nodes AS (SELECT DISTINCT src AS node FROM e),
       |n AS (SELECT count(*)::DOUBLE AS nn FROM nodes),
       |deg AS (SELECT src, count(*)::DOUBLE AS d FROM e GROUP BY src),
       |r0 AS (SELECT node, 1.0 / n.nn AS rank FROM nodes CROSS JOIN n),
       |${iter("r0", "r1")},
       |${iter("r1", "r2")},
       |${iter("r2", "r3")}
       |SELECT node, round(rank, 7) AS rank FROM r3""".stripMargin
  }

  // ----- URL canonicalization -----

  /** Deterministic messy-URL synthesis shared (in spirit) with the
    * closed-form oracle: mixed-case scheme/host, userinfo, default and
    * non-default ports, tracking params, unsorted query, fragment, and
    * a malformed row every 11 ids. */
  private def messyUrl = when(col("doc_id") % 11 === 0, lit("not a url"))
    .otherwise(concat(
      lit("HTTPS://User:pw@WWW"), col("doc_id") % 5,
      lit(".Site"), col("doc_id") % 97, lit(".COM"),
      when(col("doc_id") % 3 === 0, ":443")
        .when(col("doc_id") % 3 === 1, ":8443").otherwise(""),
      lit("/p/"), col("doc_id") % 7,
      when(col("doc_id") % 2 === 0, "?utm_source=x&b=2&a=1#frag")
        .otherwise("?z=9&a=0")))

  def qUrlNormalize(spark: SparkSession, dir: String): DataFrame =
    Graft.urlNormalize(
      Tables.documents(spark, dir).select(col("doc_id"), messyUrl.as("url")),
      "doc_id", "url")

  /** Closed-form expected output of the synthesized URLs (the ground
    * truth the normalizer must reach, not a re-implementation of it). */
  val urlNormalizeOracle: String =
    """SELECT doc_id,
      |  CASE WHEN doc_id % 11 = 0 THEN '' ELSE 'https' END AS scheme,
      |  CASE WHEN doc_id % 11 = 0 THEN ''
      |       ELSE 'www' || (doc_id % 5) || '.site' || (doc_id % 97) || '.com' END AS host,
      |  CASE WHEN doc_id % 11 = 0 THEN ''
      |       ELSE 'https://www' || (doc_id % 5) || '.site' || (doc_id % 97) || '.com'
      |         || CASE WHEN doc_id % 3 = 1 THEN ':8443' ELSE '' END
      |         || '/p/' || (doc_id % 7)
      |         || CASE WHEN doc_id % 2 = 0 THEN '?a=1&b=2' ELSE '?a=0&z=9' END
      |  END AS norm_url
      |FROM documents""".stripMargin

  // ----- readability -----

  def qReadability(spark: SparkSession, dir: String): DataFrame =
    Graft.readability(
      Tables.documents(spark, dir).select(col("doc_id"), col("text")),
      "doc_id", "text")

  val readabilityOracle: String =
    """SELECT doc_id, n_words, n_sentences, n_syllables,
      |  CASE WHEN n_words > 0 THEN
      |    floor((206.835::DOUBLE - 1.015::DOUBLE * n_words / n_sentences
      |                           - 84.6::DOUBLE * n_syllables / n_words)
      |          * 10000 + 0.5) / 10000
      |  END AS flesch
      |FROM (
      |  SELECT doc_id,
      |    len(list_filter(string_split(text, ' '), w -> w <> ''))::BIGINT AS n_words,
      |    greatest(len(regexp_extract_all(text, '[.!?]+')), 1)::BIGINT AS n_sentences,
      |    (len(regexp_extract_all(lower(text), '[aeiouy]+'))
      |     + len(list_filter(list_filter(string_split(lower(text), ' '), w -> w <> ''),
      |         w -> NOT regexp_matches(w, '[aeiouy]'))))::BIGINT AS n_syllables
      |  FROM documents)""".stripMargin

  // ----- embedding decontamination -----

  private val EmbTau = 0.4

  /** Embedding-space decontamination: benchmark = every 97th vector,
    * corpus = the rest; flag corpus vectors with cosine ≥ 0.4 to any
    * benchmark vector (the synthetic corpus tops out near 0.51, so the
    * threshold separates). */
  def qDecontaminateEmbed(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding"))
    Graft.embedDecontaminate(
      emb.filter(col("vec_id") % 97 =!= 0), "vec_id", "embedding",
      emb.filter(col("vec_id") % 97 === 0), "vec_id", "embedding", EmbTau)
  }

  val decontaminateEmbedOracle: String =
    s"""WITH b AS (
       |  SELECT vec_id AS bid, embedding AS bv FROM embeddings WHERE vec_id % 97 = 0
       |), c AS (
       |  SELECT vec_id, embedding FROM embeddings WHERE vec_id % 97 <> 0
       |), scored AS (
       |  SELECT c.vec_id, b.bid,
       |    round(
       |      list_sum(list_transform(range(1, 65), i -> c.embedding[i]::DOUBLE * b.bv[i]::DOUBLE))
       |      / sqrt(list_sum(list_transform(range(1, 65), i -> c.embedding[i]::DOUBLE * c.embedding[i]::DOUBLE)))
       |      / sqrt(list_sum(list_transform(range(1, 65), i -> b.bv[i]::DOUBLE * b.bv[i]::DOUBLE))),
       |      12) AS cos
       |  FROM c, b
       |)
       |SELECT vec_id, cos AS max_cos, bid AS nearest_id,
       |  (cos >= $EmbTau)::BIGINT AS contaminated
       |FROM (
       |  SELECT vec_id, bid, cos,
       |    row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, bid ASC) AS rn
       |  FROM scored)
       |WHERE rn = 1""".stripMargin

  // ----- CCNet perplexity buckets -----

  def qCcnetBucket(spark: SparkSession, dir: String): DataFrame =
    Graft.perplexityBuckets(
      Tables.documents(spark, dir).select(col("doc_id"), col("text"), col("lang")),
      "doc_id", "text", "lang")

  val ccnetBucketOracle: String =
    s"""WITH toks AS (
       |  SELECT doc_id, lang, list_filter(string_split(text, ' '), t -> t <> '') AS ts
       |  FROM documents
       |), uni AS (
       |  SELECT w1, count(*) AS c1 FROM (
       |    SELECT unnest(ts) AS w1 FROM toks
       |  ) GROUP BY w1
       |), v AS (SELECT count(*) AS v FROM uni),
       |bi AS (
       |  SELECT doc_id, lang,
       |    unnest(list_transform(range(0, greatest(len(ts) - 1, 0)),
       |      i -> ts[(i+1)::INT])) AS w1,
       |    unnest(list_transform(range(0, greatest(len(ts) - 1, 0)),
       |      i -> ts[(i+2)::INT])) AS w2
       |  FROM toks
       |), bcnt AS (
       |  SELECT w1, w2, count(*) AS cb FROM bi GROUP BY w1, w2
       |), scored AS (
       |  SELECT bi.doc_id, bi.lang,
       |    round(sum(-log2((bcnt.cb + 1) / (uni.c1 + v.v))) / count(*), 4)
       |      AS bits_per_token
       |  FROM bi JOIN bcnt USING (w1, w2) JOIN uni USING (w1), v
       |  GROUP BY bi.doc_id, bi.lang
       |), cuts AS (
       |  SELECT lang,
       |    round(quantile_cont(bits_per_token, ${1.0 / 3}), 6) AS c1,
       |    round(quantile_cont(bits_per_token, ${2.0 / 3}), 6) AS c2
       |  FROM scored GROUP BY lang
       |)
       |SELECT scored.doc_id, scored.lang, scored.bits_per_token,
       |  CASE WHEN bits_per_token <= cuts.c1 THEN 'head'
       |       WHEN bits_per_token <= cuts.c2 THEN 'middle'
       |       ELSE 'tail' END AS bucket
       |FROM scored JOIN cuts USING (lang)""".stripMargin

  // ----- Gopher quality gate -----

  def qQualityGate(spark: SparkSession, dir: String): DataFrame =
    Graft.qualityGate(
      Tables.documents(spark, dir).select(col("doc_id"), col("text")),
      "doc_id", "text")

  val qualityGateOracle: String =
    """SELECT doc_id, n_words, round(mean_word_len, 6) AS mean_word_len,
      |  round(alpha_frac, 6) AS alpha_frac, stop_hits,
      |  CASE WHEN reason = '' THEN 1 ELSE 0 END::BIGINT AS keep, reason
      |FROM (
      |  SELECT doc_id, n_words, mean_word_len, alpha_frac, stop_hits,
      |    CASE
      |      WHEN n_words < 30 OR n_words > 90 THEN 'word_count'
      |      WHEN mean_word_len IS NULL OR mean_word_len < 4.8
      |        OR mean_word_len > 6.0 THEN 'word_length'
      |      WHEN alpha_frac < 0.8 THEN 'alpha_ratio'
      |      WHEN stop_hits < 2 THEN 'stopwords'
      |      ELSE '' END AS reason
      |  FROM (
      |    SELECT doc_id,
      |      len(ts)::BIGINT AS n_words,
      |      CASE WHEN len(ts) > 0 THEN
      |        list_sum(list_transform(ts, w -> length(w))) * 1.0 / len(ts) END
      |        AS mean_word_len,
      |      CASE WHEN len(ts) > 0 THEN
      |        len(list_filter(ts, w -> regexp_matches(w, '[a-zA-Z]'))) * 1.0 / len(ts) END
      |        AS alpha_frac,
      |      len(list_filter(ts, w -> w IN ('the','a','of','and','to','in')))::BIGINT
      |        AS stop_hits
      |    FROM (SELECT doc_id,
      |            list_filter(string_split(text, ' '), t -> t <> '') AS ts
      |          FROM documents)))""".stripMargin

  // ----- within-document entropy -----

  def qEntropy(spark: SparkSession, dir: String): DataFrame =
    Graft.tokenEntropy(
      Tables.documents(spark, dir).select(col("doc_id"), col("text")),
      "doc_id", "text")

  val entropyOracle: String =
    """WITH t AS (
      |  SELECT doc_id, unnest(list_filter(string_split(text, ' '), w -> w <> '')) AS w
      |  FROM documents
      |), c AS (
      |  SELECT doc_id, w, count(*) AS cnt FROM t GROUP BY doc_id, w
      |), n AS (
      |  SELECT doc_id, sum(cnt) AS nt FROM c GROUP BY doc_id
      |)
      |SELECT c.doc_id, n.nt::BIGINT AS n_tokens,
      |  round(-sum((cnt * 1.0 / nt) * log2(cnt * 1.0 / nt)), 4) AS entropy
      |FROM c JOIN n USING (doc_id)
      |GROUP BY c.doc_id, n.nt""".stripMargin

  // ----- temperature mixture weights -----

  def qMixWeights(spark: SparkSession, dir: String): DataFrame =
    Graft.mixtureWeights(
      Tables.documents(spark, dir).select(col("source"), col("text")),
      "source", "text", alpha = 0.5, budgetTokens = 1000000L)

  val mixWeightsOracle: String =
    """WITH s AS (
      |  SELECT source, count(*)::BIGINT AS n_docs,
      |    sum(len(list_filter(string_split(text, ' '), w -> w <> '')))::BIGINT
      |      AS n_tokens
      |  FROM documents GROUP BY source
      |), t AS (SELECT sum(n_tokens) AS total FROM s),
      |r AS (
      |  SELECT s.*, pow(n_tokens * 1.0 / total, 0.5) AS sraw FROM s CROSS JOIN t
      |), z AS (SELECT sum(sraw) AS z FROM r)
      |SELECT source, n_docs, n_tokens, round(sraw / z.z, 6) AS weight,
      |  round(1000000.0 * (sraw / z.z) / n_tokens, 4) AS epochs
      |FROM r CROSS JOIN z""".stripMargin

  // ----- length histogram -----

  def qHistLengths(spark: SparkSession, dir: String): DataFrame =
    Graft.lengthHistogram(Tables.documents(spark, dir), "lang", "n_chars")

  val histLengthsOracle: String =
    """SELECT lang, length(bin(n_chars))::BIGINT AS bucket,
      |  count(*)::BIGINT AS n_docs, sum(n_chars)::BIGINT AS total_len
      |FROM documents WHERE n_chars >= 0
      |GROUP BY lang, length(bin(n_chars))""".stripMargin

  // ----- PMI collocations -----

  private val PmiMin = 5L
  private val PmiK = 50

  /** Top-50 adjacent-pair collocations over `documents.text` by PMI,
    * min pair count 5. The fixture vocabulary is ASCII, so the
    * (pmi, w1, w2) tie-break order is engine-identical. */
  def qPmi(spark: SparkSession, dir: String): DataFrame =
    Graft.pmiCollocations(
      Tables.documents(spark, dir).select(col("text")), "text", PmiMin, PmiK)

  val pmiOracle: String =
    s"""WITH tok AS (
       |  SELECT list_filter(string_split(text, ' '), w -> w <> '') AS t
       |  FROM documents
       |), uni AS (
       |  SELECT unnest(t) AS w FROM tok
       |), uc AS (
       |  SELECT w, count(*)::BIGINT AS cu FROM uni GROUP BY w
       |), bi AS (
       |  SELECT unnest(list_filter(
       |    list_transform(t, (x, i) ->
       |      CASE WHEN i < len(t) THEN struct_pack(w1 := x, w2 := t[i + 1]) END),
       |    v -> v IS NOT NULL)) AS p
       |  FROM tok
       |), bc AS (
       |  SELECT p.w1 AS w1, p.w2 AS w2, count(*)::BIGINT AS c12 FROM bi GROUP BY 1, 2
       |), n AS (SELECT sum(cu)::BIGINT AS n FROM uc),
       |nb AS (SELECT sum(c12)::BIGINT AS nb FROM bc),
       |scored AS (
       |  SELECT bc.w1, bc.w2, bc.c12,
       |    ln((bc.c12::DOUBLE / nb.nb::DOUBLE) /
       |       ((u1.cu::DOUBLE / n.n::DOUBLE) * (u2.cu::DOUBLE / n.n::DOUBLE))) AS pmi
       |  FROM bc
       |  JOIN uc u1 ON u1.w = bc.w1
       |  JOIN uc u2 ON u2.w = bc.w2
       |  CROSS JOIN n CROSS JOIN nb
       |  WHERE bc.c12 >= $PmiMin
       |)
       |, sel AS (
       |  -- cut on the RAW pmi (as the engine does); rounding only the output
       |  SELECT * FROM scored ORDER BY scored.pmi DESC, w1, w2 LIMIT $PmiK
       |)
       |SELECT w1, w2, c12, round(pmi, 4) AS pmi FROM sel""".stripMargin

  // ----- Zipf rank–frequency spectrum -----

  /** OLS slope of the log-log rank–frequency curve over the top-1000
    * vocabulary ([[Graft.zipfSlope]]); natural text sits near −1. */
  def qZipf(spark: SparkSession, dir: String): DataFrame =
    Graft.zipfSlope(Tables.documents(spark, dir).select(col("text")),
      "text", 1000)

  val zipfOracle: String =
    """WITH f AS (
      |  SELECT w, count(*)::BIGINT AS c
      |  FROM (SELECT unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS w
      |        FROM documents)
      |  GROUP BY w
      |), tot AS (
      |  SELECT count(*)::BIGINT AS n_types, sum(c)::BIGINT AS n_tokens FROM f
      |), top AS (
      |  SELECT c, r FROM (
      |    SELECT c, row_number() OVER (ORDER BY c DESC, w) AS r FROM f)
      |  WHERE r <= 1000
      |), q AS (
      |  SELECT
      |    floor(log10(r::DOUBLE) * 1e6 + 0.5::DOUBLE)::BIGINT AS x,
      |    floor(log10(c::DOUBLE) * 1e6 + 0.5::DOUBLE)::BIGINT AS y,
      |    floor(log10(r::DOUBLE) * log10(r::DOUBLE) * 1e6 + 0.5::DOUBLE)::BIGINT AS xx,
      |    floor(log10(r::DOUBLE) * log10(c::DOUBLE) * 1e6 + 0.5::DOUBLE)::BIGINT AS xy
      |  FROM top
      |), s AS (
      |  SELECT count(*)::BIGINT AS k, sum(x)::BIGINT AS sx, sum(y)::BIGINT AS sy,
      |    sum(xx)::BIGINT AS sxx, sum(xy)::BIGINT AS sxy
      |  FROM q
      |)
      |SELECT
      |  floor(((k::DOUBLE * (sxy::DOUBLE / 1e6) - (sx::DOUBLE / 1e6) * (sy::DOUBLE / 1e6))
      |    / (k::DOUBLE * (sxx::DOUBLE / 1e6) - (sx::DOUBLE / 1e6) * (sx::DOUBLE / 1e6)))
      |    * 1e4 + 0.5::DOUBLE) / 1e4 AS slope,
      |  floor((((sy::DOUBLE / 1e6)
      |    - ((k::DOUBLE * (sxy::DOUBLE / 1e6) - (sx::DOUBLE / 1e6) * (sy::DOUBLE / 1e6))
      |       / (k::DOUBLE * (sxx::DOUBLE / 1e6) - (sx::DOUBLE / 1e6) * (sx::DOUBLE / 1e6)))
      |      * (sx::DOUBLE / 1e6)) / k::DOUBLE)
      |    * 1e4 + 0.5::DOUBLE) / 1e4 AS intercept,
      |  k AS top_k, n_types, n_tokens
      |FROM s CROSS JOIN tot""".stripMargin
}
