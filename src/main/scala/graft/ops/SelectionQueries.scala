package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.api.Graft

/** Gate bindings + DuckDB oracles for the data-selection / monitoring
  * operators: DSIR importance weights (Xie et al., 2023), weighted
  * sampling without replacement (Efraimidis & Spirakis, 2006), PSI
  * corpus-drift reporting, and Unicode NFC/accent-fold normalization.
  *
  * Reference scope note (SURVEY.md §2): the reference connector
  * (`dis-spark-streaming/.../dis/`) implements none of these — they
  * are part of the LLM-pipeline surface this engine adds on top of
  * reference parity, under the same query+oracle contract as every
  * other gate entry.
  */
object SelectionQueries {

  // ----- DSIR importance weights -----

  /** Raw corpus = all documents, target = the English slice — the
    * paper's own setup (select web data resembling a trusted target).
    * 4096 feature buckets. */
  def qDsirWeights(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    Graft.dsirWeights(docs, "doc_id", "text",
      docs.filter(col("lang") === "en"), "text", buckets = 4096)
  }

  /** Same arithmetic replayed in SQL: unigram+bigram grams, base-31
    * char polynomial mod 2³¹ mod 4096, add-one-smoothed log ratio of
    * the target (lang='en') vs raw bucket distributions, per-doc sum.
    * Docs with no tokens get log_w 0. */
  val dsirWeightsOracle: String =
    """WITH tok AS (
      |  SELECT doc_id, lang,
      |    list_filter(string_split(text, ' '), w -> w <> '') AS t
      |  FROM documents
      |), gr AS (
      |  SELECT doc_id, lang, list_concat(t,
      |    list_filter(
      |      list_transform(t, (x, i) ->
      |        CASE WHEN i < len(t) THEN x || ' ' || t[i + 1] END),
      |      v -> v IS NOT NULL)) AS g
      |  FROM tok
      |), ub AS (
      |  SELECT doc_id, lang,
      |    unnest(list_transform(g, s ->
      |      list_reduce(
      |        list_prepend(0::BIGINT, list_transform(string_split(s, ''), c -> ascii(c)::BIGINT)),
      |        (acc, c) -> (acc * 31 + c) % 2147483648) % 4096)) AS bucket
      |  FROM gr
      |), tgt AS (
      |  SELECT bucket, count(*)::BIGINT AS ct FROM ub WHERE lang = 'en' GROUP BY bucket
      |), rw AS (
      |  SELECT bucket, count(*)::BIGINT AS cr FROM ub GROUP BY bucket
      |), tt AS (SELECT coalesce(sum(ct), 0)::BIGINT AS tt FROM tgt),
      |tr AS (SELECT coalesce(sum(cr), 0)::BIGINT AS tr FROM rw),
      |lam AS (
      |  SELECT r.range AS bucket,
      |    ln((coalesce(ct, 0) + 1)::DOUBLE / (tt + 4096)::DOUBLE) -
      |    ln((coalesce(cr, 0) + 1)::DOUBLE / (tr + 4096)::DOUBLE) AS l
      |  FROM range(4096) r
      |  LEFT JOIN tgt ON tgt.bucket = r.range
      |  LEFT JOIN rw ON rw.bucket = r.range
      |  CROSS JOIN tt CROSS JOIN tr
      |), sc AS (
      |  SELECT ub.doc_id, sum(lam.l) AS s
      |  FROM ub JOIN lam USING (bucket) GROUP BY ub.doc_id
      |)
      |SELECT d.doc_id, round(coalesce(sc.s, 0.0), 4) AS log_w
      |FROM documents d LEFT JOIN sc USING (doc_id)""".stripMargin

  // ----- weighted sampling without replacement -----

  /** 50 of 500 documents, weight = n_chars (longer docs proportionally
    * likelier), deterministic LCG randomness keyed on doc_id. */
  def qWeightedSample(spark: SparkSession, dir: String): DataFrame =
    Graft.weightedSample(
      Tables.documents(spark, dir).select(col("doc_id"), col("n_chars")),
      "doc_id", "n_chars", k = 50)

  val weightedSampleOracle: String =
    """WITH keyed AS (
      |  SELECT doc_id, n_chars,
      |    ln((((doc_id % 2147483648) * 1103515245 + 12345) % 2147483648
      |        + 0.5) / 2147483648.0) / n_chars::DOUBLE AS key
      |  FROM documents WHERE n_chars > 0
      |)
      |SELECT doc_id, n_chars,
      |  row_number() OVER (ORDER BY key DESC, doc_id)::BIGINT AS rank
      |FROM keyed ORDER BY key DESC, doc_id LIMIT 50""".stripMargin

  /** 20 docs per language, weight = n_chars — the language-balanced
    * selection draw; same key as q_weighted_sample. */
  def qWeightedStratum(spark: SparkSession, dir: String): DataFrame =
    Graft.weightedSamplePerStratum(
      Tables.documents(spark, dir).select(col("lang"), col("doc_id"), col("n_chars")),
      "lang", "doc_id", "n_chars", k = 20)

  val weightedStratumOracle: String =
    """WITH keyed AS (
      |  SELECT lang, doc_id, n_chars,
      |    ln((((doc_id % 2147483648) * 1103515245 + 12345) % 2147483648
      |        + 0.5) / 2147483648.0) / n_chars::DOUBLE AS key
      |  FROM documents WHERE n_chars > 0
      |)
      |SELECT lang, doc_id, n_chars,
      |  row_number() OVER (PARTITION BY lang ORDER BY key DESC, doc_id)::BIGINT AS rank
      |FROM keyed
      |QUALIFY rank <= 20""".stripMargin

  // ----- PSI drift between two snapshots -----

  /** Snapshot A = even event ids, B = odd — a deterministic split whose
    * event_type distributions genuinely differ a little, so per-category
    * PSI terms are small but nonzero. */
  def qPsiDrift(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    Graft.psiDrift(
      ev.filter(col("event_id") % 2 === 0), ev.filter(col("event_id") % 2 === 1),
      "event_type")
  }

  val psiDriftOracle: String =
    """WITH ca AS (
      |  SELECT event_type, count(*)::BIGINT AS n_a FROM events
      |  WHERE event_id % 2 = 0 GROUP BY event_type
      |), cb AS (
      |  SELECT event_type, count(*)::BIGINT AS n_b FROM events
      |  WHERE event_id % 2 = 1 GROUP BY event_type
      |), cats AS (
      |  SELECT coalesce(ca.event_type, cb.event_type) AS event_type,
      |    coalesce(n_a, 0) AS n_a, coalesce(n_b, 0) AS n_b
      |  FROM ca FULL OUTER JOIN cb USING (event_type)
      |), c AS (SELECT count(*)::BIGINT AS c FROM cats),
      |t AS (SELECT sum(n_a)::BIGINT AS ta, sum(n_b)::BIGINT AS tb FROM cats)
      |SELECT event_type, n_a, n_b,
      |  round(((n_a + 0.5) / (ta + 0.5 * c.c) - (n_b + 0.5) / (tb + 0.5 * c.c)) *
      |    ln(((n_a + 0.5) / (ta + 0.5 * c.c)) / ((n_b + 0.5) / (tb + 0.5 * c.c))),
      |    6) AS psi
      |FROM cats CROSS JOIN c CROSS JOIN t""".stripMargin

  // ----- Unicode normalization -----

  /** Deterministic accented synthesis: decomposed e+U+0301 (NFC must
    * compose it), precomposed Latin accents, and pass-through chars
    * without a mark decomposition (ß, Ł, œ — identical under Java
    * NFD-strip and utf8proc strip_accents). */
  private def accented = concat(
    lit("Café "),
    when(col("doc_id") % 3 === 0, lit("naïve "))
      .when(col("doc_id") % 3 === 1, lit("élève "))
      .otherwise(lit("señor ")),
    when(col("doc_id") % 2 === 0, lit("straße Łódź"))
      .otherwise(lit("cœur über")),
    lit(" doc"), col("doc_id") % 7)

  def qUnicodeNorm(spark: SparkSession, dir: String): DataFrame =
    Graft.unicodeNormalize(
      Tables.documents(spark, dir).select(col("doc_id"), accented.as("text")),
      "doc_id", "text")

  /** strip_accents(nfc) ≡ NFD-strip for this synthesis charset (no
    * mark-free compositions involved). */
  val unicodeNormOracle: String =
    """WITH t AS (
      |  SELECT doc_id,
      |    'Cafe' || chr(769) || ' ' ||
      |    CASE WHEN doc_id % 3 = 0 THEN 'naïve '
      |         WHEN doc_id % 3 = 1 THEN 'élève '
      |         ELSE 'señor ' END ||
      |    CASE WHEN doc_id % 2 = 0 THEN 'straße Ło' || chr(769) || 'dź'
      |         ELSE 'cœur über' END ||
      |    ' doc' || (doc_id % 7) AS text
      |  FROM documents
      |)
      |SELECT doc_id, nfc_normalize(text) AS nfc_text,
      |  strip_accents(nfc_normalize(text)) AS folded_text
      |FROM t""".stripMargin
}
