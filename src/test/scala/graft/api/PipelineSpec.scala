package graft.api

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.ops.Tables

/** End-to-end training-data pipeline over the public operator surface —
  * the composition a real corpus build runs, proving the operators
  * chain without impedance mismatches:
  *
  *   clean → quality filter → language filter → near-dup pairs →
  *   duplicate clusters → keep one doc per cluster → deterministic
  *   sample → pack into training sequences.
  */
class PipelineSpec extends SparkTestBase {
  private val dir = "/root/testdata/sf0.001"

  test("clean → filter → dedup → cluster → keep-first → sample → pack composes") {
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"), col("lang"))

    // 1. quality + language gates (cheap per-row filters first)
    val scored = Graft.qualityScore(docs, "doc_id", "text")
      .join(docs.select(col("doc_id"), col("text"), col("lang")), "doc_id")
    val kept = scored.filter(col("quality") > 0.3 && col("n_words") >= 5)
    val keptN = kept.count()
    assert(keptN > 100, s"quality gate too aggressive: $keptN")

    // 2. near-dup pairs → connected clusters → canonical keeper per cluster
    val pairs = Graft.minhashDupes(kept, "doc_id", "text", 0.8)
    val clusters = Graft.dupClusters(pairs, "id_a", "id_b")
    val deduped = kept
      .join(clusters.withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left")
      .withColumn("cluster_id", coalesce(col("cluster_id"), col("doc_id")))
    val canonical = Graft.dedupKeepFirst(deduped, Seq("cluster_id"), "doc_id")
    val canonN = canonical.count()
    val pairN = pairs.count()
    assert(canonN < keptN || pairN == 0, "dedup removed nothing despite dup pairs")
    // every cluster contributes exactly one doc
    assert(canonical.select(col("cluster_id")).distinct().count() === canonN)

    // 3. deterministic stratified sample by language
    val sampled = Graft.hashSample(canonical, "lang", "doc_id",
      Map("en" -> 1.0, "de" -> 0.5, "es" -> 0.5, "fr" -> 0.5))
    val sampledN = sampled.count()
    assert(sampledN > 0 && sampledN <= canonN)

    // 4. pack into 512-token training sequences
    val packed = Graft.packSequences(
      Graft.tokenCounts(sampled, "doc_id", "text")
        .select(col("doc_id"), col("ws_tokens").as("n_tokens")),
      "doc_id", "n_tokens", 512L)
    val rows = packed.orderBy(col("doc_id")).collect()
    assert(rows.length === sampledN)
    // offsets are a consistent prefix sum: each doc starts where the
    // previous ended, and sequence ids never decrease
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(b.getLong(2) === a.getLong(2) + a.getLong(1), "offset gap")
        assert(b.getLong(3) >= a.getLong(3), "seq_id decreased")
      case _ =>
    }
    // the stream covers every token exactly once
    val totalTokens = rows.map(_.getLong(1)).sum
    assert(rows.last.getLong(2) + rows.last.getLong(1) === totalTokens)
  }
}
