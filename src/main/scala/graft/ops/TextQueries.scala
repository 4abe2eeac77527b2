package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis operators over the `documents` corpus — the
  * training-data-pipeline surface (north star): cleaning, token
  * counting, quality scoring, language ID, fingerprinting.
  *
  * All of these are pure per-row expression pipelines: no shuffle at
  * all (except the fingerprint variant that aggregates per doc), fully
  * whole-stage-codegen'd, and scale linearly with input bytes — the
  * shape you want over 100 TB of text.
  */
object TextQueries {

  private val StopwordsEn = Seq("the", "a", "an", "and", "of", "to", "in", "is", "on", "for")
  private val StopwordsDe = Seq("der", "die", "das", "und", "ist", "ein", "zu", "mit")
  private val StopwordsEs = Seq("el", "la", "los", "de", "y", "es", "un", "en", "que")
  private val StopwordsFr = Seq("le", "les", "des", "et", "est", "un", "une", "du", "que")

  /** Non-empty whitespace tokens of `text`. */
  private def tokens = filter(split(col("text"), " "), t => t =!= "")

  /** Text normalization: strip non-alphanumerics, lowercase, length. */
  def qTextClean(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        lower(regexp_replace(col("text"), "[^a-zA-Z0-9 ]", "")).as("clean_text"))
      .withColumn("clean_len", length(col("clean_text")).cast("long"))

  /** Token counting: whitespace tokens + a BPE-ish regex token count
    * (letter runs / digit runs / single punctuation marks — the classic
    * pre-tokenizer split). */
  def qTokenCount(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        size(tokens).cast("long").as("ws_tokens"),
        size(regexp_extract_all(col("text"), lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0)))
          .cast("long").as("bpe_tokens"),
        length(col("text")).cast("long").as("n_chars"))

  /** Quality scoring: length, punctuation ratio, stopword ratio, mean
    * word length — the standard cheap filters a pretraining pipeline
    * runs before anything expensive. Pure per-row FP arithmetic
    * (deterministic, no reduction-order effects). */
  def qQualityScore(spark: SparkSession, dir: String): DataFrame = {
    val nWords = size(tokens).cast("double")
    val nStop = size(filter(tokens, t => t.isin(StopwordsEn: _*))).cast("double")
    val nPunct = size(regexp_extract_all(col("text"), lit("[^a-zA-Z0-9 ]"), lit(0))).cast("double")
    val nChars = length(col("text")).cast("double")
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        nChars.as("n_chars"),
        nWords.as("n_words"),
        (nStop / nWords).as("stop_ratio"),
        (nPunct / greatest(nChars, lit(1.0))).as("punct_ratio"),
        ((nChars - nWords + 1.0) / nWords).as("avg_word_len"))
      .withColumn("quality",
        col("stop_ratio") * 0.4
          + (lit(1.0) - col("punct_ratio")) * 0.3
          + least(col("n_words") / 100.0, lit(1.0)) * 0.3)
  }

  /** Language ID via stopword-profile scoring (n-gram-heuristic family):
    * count stopword hits per language profile, argmax with a fixed
    * priority tiebreak so the result is deterministic. */
  def qLangId(spark: SparkSession, dir: String): DataFrame = {
    def score(words: Seq[String]) =
      size(filter(tokens, t => t.isin(words: _*))).cast("long")
    Tables.documents(spark, dir)
      .select(
        col("doc_id"), col("lang").as("lang_actual"),
        score(StopwordsEn).as("s_en"), score(StopwordsDe).as("s_de"),
        score(StopwordsEs).as("s_es"), score(StopwordsFr).as("s_fr"))
      .withColumn("lang_pred",
        when(col("s_en") >= col("s_de") && col("s_en") >= col("s_es") && col("s_en") >= col("s_fr"), "en")
          .when(col("s_de") >= col("s_es") && col("s_de") >= col("s_fr"), "de")
          .when(col("s_es") >= col("s_fr"), "es")
          .otherwise("fr"))
      .select(col("doc_id"), col("lang_actual"), col("lang_pred"),
        col("s_en"), col("s_de"), col("s_es"), col("s_fr"))
  }

  /** Document fingerprint: position-weighted character hash
    * (rolling-hash family), oracle-checkable in plain SQL. The
    * high-throughput variant for production dedup is xxhash64(text)
    * (see DedupQueries) — this one exists to pin exact cross-engine
    * semantics. Shuffle-free: aggregate() folds the char array per row. */
  def qFingerprint(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        aggregate(
          zip_with(
            filter(split(col("text"), ""), c => c =!= ""),
            sequence(lit(1), length(col("text"))),
            (c, i) => i.cast("long") * ascii(c).cast("long")),
          lit(0L), (acc, x) => acc + x).as("fp"))
}
