package graft.api

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkTestBase

/** End-to-end RAG retrieval chain: chunkWindows → (BM25 lexical ‖
  * dense kNN) → reciprocal-rank fusion. Proves the gate operators
  * compose as the retrieval stack they document: hybrid fusion
  * surfaces hits that each single modality misses, and every fused
  * result is relevant to the query topic. */
class RagPipelineSpec extends SparkTestBase {

  import spark.implicits._

  private val Dim = 8

  /** Deterministic chunk embedding: one-hot(topic) + tiny hash noise. */
  private def vec(topic: Int, seed: Long): Seq[Float] = {
    val v = Array.fill(Dim)(0.0f)
    v(topic) = 1.0f
    v(((seed % Dim) + Dim).toInt % Dim) += 0.05f
    v.toSeq
  }

  test("chunk → BM25 ∥ dense → RRF: fusion recovers single-modality-only hits, " +
      "and every fused result is on-topic") {
    // 4 topics × 10 docs; topic-t docs carry the marker token topic<t>gold
    val filler = (1 to 30).map(i => s"w$i").mkString(" ")
    val base = for (d <- 0 until 16) yield {
      val t = d / 4
      (d.toLong, s"topic${t}gold alpha$d $filler topic${t}gold beta$d", t)
    }
    // planted: doc 100 SAYS topic2 but its vectors point at topic 0
    // (lexical-only hit); doc 101 says nothing but its vectors point at
    // topic 2 (dense-only hit)
    val planted = Seq(
      (100L, s"topic2gold gamma $filler topic2gold delta", 0),
      (101L, s"unrelated words only $filler epsilon zeta", 2))
    val docs = (base ++ planted).toDF("doc_id", "text", "vec_topic")

    val chunks = Graft.chunkWindows(docs, "doc_id", "text", width = 16, stride = 8)
      .withColumn("chunk_id", col("doc_id") * 1000L + col("chunk_no"))
    val chunkVecs = chunks
      .join(docs.select(col("doc_id"), col("vec_topic")), Seq("doc_id"))
      .select(col("chunk_id"), col("vec_topic"))
      .collect() // test-sized fixture; vectors built deterministically
      .map(r => (r.getLong(0), vec(r.getInt(1), r.getLong(0))))
      .toSeq.toDF("chunk_id", "vec")
      .select(col("chunk_id"), col("vec").cast(ArrayType(FloatType)).as("vec"))

    val lexical = Graft.bm25Search(
      chunks.select(col("chunk_id"), col("chunk_text")),
      "chunk_id", "chunk_text", Seq("topic2gold"), k = 20)
    val query = Seq((-1L, vec(2, 0L))).toDF("query_id", "qv")
      .select(col("query_id"), col("qv").cast(ArrayType(FloatType)).as("qv"))
    val dense = Graft.knn(chunkVecs, "chunk_id", "vec", query, "query_id", "qv", k = 20)
      .select(col("neighbor_id").as("chunk_id"), col("rank"))

    val fused = Graft.rrfFuse(
      Seq(lexical.select(col("chunk_id"), col("rank")), dense),
      "chunk_id", "rank", topK = 20)
    val fusedIds = fused.orderBy(col("rank")).collect().map(_.getLong(0))
    val fusedDocs = fusedIds.map(_ / 1000L).toSet

    // each planted single-modality hit survives fusion
    assert(fusedDocs.contains(100L), s"lexical-only doc lost in fusion: $fusedDocs")
    assert(fusedDocs.contains(101L), s"dense-only doc lost in fusion: $fusedDocs")
    // sanity of the plant: each modality alone misses its counterpart
    val lexDocs = lexical.collect().map(_.getLong(0) / 1000L).toSet
    val denseDocs = dense.collect().map(_.getLong(0) / 1000L).toSet
    assert(!lexDocs.contains(101L), "plant broken: dense-only doc matched lexically")
    assert(!denseDocs.contains(100L), "plant broken: lexical-only doc matched densely")
    // every fused result is topic-2-relevant (topic-2 corpus or a plant)
    val gold = (8L to 11L).toSet ++ Set(100L, 101L)
    assert(fusedDocs.subsetOf(gold), s"off-topic docs in fused top-20: ${fusedDocs -- gold}")
    // and fusion is deterministic: rerun yields the identical list
    val again = Graft.rrfFuse(
      Seq(lexical.select(col("chunk_id"), col("rank")), dense),
      "chunk_id", "rank", topK = 20)
      .orderBy(col("rank")).collect().map(_.getLong(0))
    assert(again.toSeq === fusedIds.toSeq)
  }
}
