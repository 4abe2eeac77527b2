package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Gate bindings for the classification + profiling operators
  * ([[graft.api.Graft.nbTrain]]/[[graft.api.Graft.nbScore]],
  * [[graft.api.Graft.profile]]) — the trainable quality/language
  * classifier and the before/after-stage data-profile table of a
  * curation pipeline (north star; the reference has no analytics
  * surface of its own).
  *
  * Every arithmetic step (polyHash features, add-one smoothing, ln,
  * argmax tie-break) is ANSI-SQL-replicable, so both operators sit
  * under the full DuckDB hash oracle.
  */
object ClassifyQueries {

  private val F = 1024

  /** Train a 5-class language NB on the even half of `documents`,
    * score the odd half. The labels are fixture-random (vocabulary is
    * shared across langs), which makes this a pure cross-engine
    * arithmetic pin; NbClassifySpec proves the learning semantics on a
    * separable corpus. */
  def qNbClassify(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val train = docs.filter(pmod(col("doc_id"), lit(2)) === 0)
    val test = docs.filter(pmod(col("doc_id"), lit(2)) === 1)
    val model = graft.api.Graft.nbTrain(train, "lang", "text", F)
    graft.api.Graft.nbScore(test, "doc_id", "text", model, F)
      .select(col("doc_id"), col("pred_label").as("pred_lang"), col("score"))
  }

  val nbClassifyOracle: String =
    s"""WITH train AS (SELECT * FROM documents WHERE doc_id % 2 = 0),
       |test AS (SELECT * FROM documents WHERE doc_id % 2 = 1),
       |labels AS (SELECT DISTINCT lang FROM train),
       |prior AS (
       |  SELECT lang, ln(count(*)::DOUBLE / (SELECT count(*) FROM train)) AS lp
       |  FROM train GROUP BY lang),
       |trtok AS (
       |  SELECT lang, unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS t
       |  FROM train),
       |trfeat AS (
       |  SELECT lang,
       |    ((list_sum(list_transform(string_split(t, ''), (c, i) -> i * ascii(c)))
       |      * 48271) % 2147483647) % $F AS f
       |  FROM trtok),
       |cnt AS (SELECT lang, f, count(*)::DOUBLE AS c FROM trfeat GROUP BY 1, 2),
       |tot AS (SELECT lang, count(*)::DOUBLE AS n FROM trfeat GROUP BY 1),
       |tetok AS (
       |  SELECT doc_id, unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS t
       |  FROM test),
       |tefeat AS (
       |  SELECT doc_id,
       |    ((list_sum(list_transform(string_split(t, ''), (c, i) -> i * ascii(c)))
       |      * 48271) % 2147483647) % $F AS f
       |  FROM tetok),
       |ll AS (
       |  SELECT tf.doc_id, l.lang,
       |    sum(ln((coalesce(c.c, 0) + 1) / (t.n + $F))) AS s
       |  FROM tefeat tf
       |  CROSS JOIN labels l
       |  JOIN tot t ON t.lang = l.lang
       |  LEFT JOIN cnt c ON c.lang = l.lang AND c.f = tf.f
       |  GROUP BY 1, 2),
       |scored AS (
       |  SELECT d.doc_id, l.lang, p.lp + coalesce(ll.s, 0) AS raw
       |  FROM test d
       |  CROSS JOIN labels l
       |  JOIN prior p ON p.lang = l.lang
       |  LEFT JOIN ll ON ll.doc_id = d.doc_id AND ll.lang = l.lang)
       |SELECT doc_id, lang AS pred_lang, round(raw, 4) AS score FROM (
       |  SELECT *, row_number() OVER (PARTITION BY doc_id
       |                               ORDER BY raw DESC, lang ASC) AS rn
       |  FROM scored)
       |WHERE rn = 1""".stripMargin

  /** Profile the four analyzable `events` columns (ts is excluded:
    * timestamp→string rendering is engine-specific). */
  def qProfile(spark: SparkSession, dir: String): DataFrame =
    graft.api.Graft.profile(
      Tables.events(spark, dir),
      numCols = Seq("event_id", "user_id", "value"),
      strCols = Seq("event_type"))

  /** HLL variant of [[qProfile]] — the single-pass shape meant for wide
    * 100 TB scans (no per-column exact-distinct shuffle). Rows-only
    * gate (HLL cardinalities are engine-specific); ApproxOpsSpec pins
    * the ≤5% error vs the exact profile on the same fixture. */
  def qProfileApprox(spark: SparkSession, dir: String): DataFrame =
    graft.api.Graft.profileApprox(
      Tables.events(spark, dir),
      numCols = Seq("event_id", "user_id", "value"),
      strCols = Seq("event_type"))

  val profileOracle: String = {
    def num(c: String) =
      s"""SELECT '$c' AS "column", count(*)::BIGINT AS n_rows,
         |  (count(*) - count($c))::BIGINT AS n_nulls,
         |  count(DISTINCT $c)::BIGINT AS n_distinct,
         |  min($c)::DOUBLE AS min_num, max($c)::DOUBLE AS max_num,
         |  NULL::VARCHAR AS min_str, NULL::VARCHAR AS max_str
         |FROM events""".stripMargin
    def str(c: String) =
      s"""SELECT '$c' AS "column", count(*)::BIGINT AS n_rows,
         |  (count(*) - count($c))::BIGINT AS n_nulls,
         |  count(DISTINCT $c)::BIGINT AS n_distinct,
         |  NULL::DOUBLE AS min_num, NULL::DOUBLE AS max_num,
         |  min($c) AS min_str, max($c) AS max_str
         |FROM events""".stripMargin
    Seq(num("event_id"), num("user_id"), num("value"), str("event_type"))
      .mkString("\nUNION ALL\n")
  }
}
