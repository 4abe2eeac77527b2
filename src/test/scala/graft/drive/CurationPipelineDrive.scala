package graft.drive

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.api.Graft

/** End-to-end curation pipeline at sf1 — the user-shaped composition
  * (URL gate → quality gate → near-dup cluster dedup → decontaminate →
  * token-budget mixture → sequence packing) timed as ONE run, so
  * cross-operator regressions (lost exchange reuse, a stage that stops
  * caching, a join that flips strategy only in composition) surface
  * even when every per-query bench number stays green.
  *
  * PipelineSpec proves the same chain CORRECT at fixture scale; this
  * drive pins its sf1 wall time in BASELINE.md (drift-checked by hand
  * each round against the recorded number — the chain is not a gate
  * query, so it rides outside bench_reference.json).
  *
  * Output: one JSON line {"drive":"curation_pipeline",...} with the
  * min-of-3 end-to-end seconds and the surviving-doc/sequence counts
  * (the counts pin the chain's SHAPE: a timing that improves because a
  * gate started dropping everything is a regression, not a win). */
object CurationPipelineDrive {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "target/sf1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def chain(): (Long, Long, Long) = {
      val docs = graft.ops.Tables.documents(spark, dir)
        .select(col("doc_id"), col("text"), col("lang"), col("source"))

      // 1. URL gate: canonical-URL keep-first (messy synthetic URLs,
      //    the q_url_dedup synthesis at corpus scale)
      val url = when(col("doc_id") % 11 === 0, lit("not a url"))
        .otherwise(concat(
          lit("HTTPS://u:p@Site"), col("doc_id") % 7001, lit(".COM"),
          when(col("doc_id") % 3 === 0, ":443")
            .when(col("doc_id") % 3 === 1, ":8443").otherwise(""),
          lit("/p/"), col("doc_id") % 503,
          when(col("doc_id") % 2 === 0, "?utm_source=x&b=2&a=1#f")
            .otherwise("?z=9&a=0")))
      val urlKept = Graft.urlDedup(
        docs.select(col("doc_id"), url.as("url")), "doc_id", "url")
        .filter(col("kept")).select(col("doc_id"))
      val gated0 = docs.join(urlKept, "doc_id")

      // 2. quality gate
      val quality = Graft.qualityScore(gated0, "doc_id", "text")
      val gated = gated0.join(
        quality.filter(col("quality") > 0.3 && col("n_words") >= 5)
          .select(col("doc_id")), "doc_id")

      // 3. near-dup pairs → clusters → one doc per cluster
      val pairs = Graft.minhashDupes(gated, "doc_id", "text", 0.8)
      val clusters = Graft.dupClusters(pairs, "id_a", "id_b")
      val canonical = Graft.dedupKeepFirst(
        gated.join(clusters.withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left")
          .withColumn("cluster_id", coalesce(col("cluster_id"), col("doc_id"))),
        Seq("cluster_id"), "doc_id")

      // 4. decontaminate against a held-out benchmark slice
      val bench = docs.filter(pmod(col("doc_id"), lit(97)) === 0)
        .select(col("doc_id"), col("text"))
      val train = canonical.filter(pmod(col("doc_id"), lit(97)) =!= 0)
      val clean = train.join(
        Graft.decontaminate(train, "doc_id", "text", bench, "text", 8)
          .filter(col("contaminated") === 0).select(col("doc_id")), "doc_id")

      // 5. token-budget mixture by language (per-lang budgets sized to
      //    bite: ~half the corpus-wide token mass)
      val withTokens = Graft.tokenCounts(clean, "doc_id", "text")
        .select(col("doc_id"), col("ws_tokens").as("n_tokens"))
        .join(clean.select(col("doc_id"), col("lang")), "doc_id")
      val budgets = Map("en" -> 6000000L, "de" -> 1000000L,
        "es" -> 1000000L, "fr" -> 1000000L)
      val mixed = Graft.tokenBudgetSample(
        withTokens, "doc_id", "lang", "n_tokens", budgets)
        .filter(col("kept") === 1)

      // 6. pack into 2048-token training sequences
      val packed = Graft.packSequences(
        mixed.select(col("doc_id"), col("n_tokens")),
        "doc_id", "n_tokens", 2048L)

      val nSeqs = packed.agg(countDistinct(col("seq_id"))).collect()(0).getLong(0)
      (gated.count(), mixed.count(), nSeqs)
    }

    def time(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    var shape: (Long, Long, Long) = (0L, 0L, 0L)
    val secs = (1 to 3).map(_ => time { shape = chain() })
    val json = s"""{"drive":"curation_pipeline","dir":"$dir",""" +
      s""""sec_min":${secs.min},"sec_all":[${secs.mkString(",")}],""" +
      s""""docs_after_gates":${shape._1},"docs_in_mixture":${shape._2},""" +
      s""""sequences":${shape._3}}"""
    println(json)
    // persist for tools/check_bench_drift.py --pipeline: the drift
    // checker gates BOTH the wall time (2x of the pinned sec_min) and
    // the exact shape counts (a faster run that drops docs is a
    // semantics regression, not a win)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get("target"))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("target/pipeline_last.json"), json)
    spark.stop()
  }
}
