package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VecMath.float_dot

/** Similarity search over `embeddings.embedding` (array<float>, 64-d) —
  * the ANN surface a training-data pipeline needs (north star).
  *
  * Scale design: the brute-force path is the correctness baseline
  * (queries broadcast against the corpus — linear scan, no shuffle of
  * the big side). The IVF path is the 100 TB shape: corpus is
  * partitioned into nlist Voronoi cells once (shuffle on cell id);
  * each query probes nprobe cells, so compute drops by ~nlist/nprobe
  * and the candidate join is an equi-join on cell id instead of a
  * cross product.
  */
object SimilarityQueries {

  /** Cosine similarity of two float vectors via the codegen'd
    * [[graft.functions.FloatVecDot]] expression: left-to-right double
    * accumulation — deterministic and bit-identical to the SQL-oracle
    * formulation, ~100× faster than the interpreted HOF route.
    * Prefer [[cosinePrenormed]] across joins (norms computed once per
    * side instead of once per pair). */
  private def cosine(a: Column, b: Column): Column =
    float_dot(a, b) / sqrt(float_dot(a, a)) / sqrt(float_dot(b, b))

  /** Cosine from precomputed norms (hoist `sqrt(dot(v,v))` to each
    * join side — O(n) norms instead of O(pairs)). */
  private def cosinePrenormed(a: Column, b: Column, normA: Column, normB: Column): Column =
    float_dot(a, b) / normA / normB

  private def withNorm(df: DataFrame, vec: String, norm: String): DataFrame =
    df.withColumn(norm, sqrt(float_dot(col(vec), col(vec))))

  private val K = 5
  private val NQueries = 10 // vec_id < 10 play the role of query vectors

  /** Brute-force exact cosine top-K: queries (a small set) broadcast
    * against the corpus; rank per query with a deterministic tiebreak.
    * Ties/FP: rank on round(cos, 12) then vec_id so the result is
    * bit-stable across engines. */
  def qSimilarityKnn(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    graft.api.Graft.knn(
      emb, "vec_id", "embedding",
      emb.filter(col("vec_id") < NQueries), "vec_id", "embedding", K)
  }

  val knnOracle: String =
    s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < $NQueries),
       |scored AS (
       |  SELECT q.query_id, e.vec_id AS neighbor_id,
       |    round(
       |      list_sum(list_transform(range(1, 65), i -> qv[i]::DOUBLE * e.embedding[i]::DOUBLE))
       |      / sqrt(list_sum(list_transform(range(1, 65), i -> qv[i]::DOUBLE * qv[i]::DOUBLE)))
       |      / sqrt(list_sum(list_transform(range(1, 65), i -> e.embedding[i]::DOUBLE * e.embedding[i]::DOUBLE))),
       |      12) AS cos
       |  FROM embeddings e, q WHERE e.vec_id <> q.query_id
       |)
       |SELECT query_id, neighbor_id, rank, cos FROM (
       |  SELECT query_id, neighbor_id, cos,
       |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC)::BIGINT AS rank
       |  FROM scored)
       |WHERE rank <= $K""".stripMargin

  /** Embedding near-duplicate pairs: cosine ≥ 0.45 with vec_a < vec_b
    * (threshold sits at the top tail of this corpus's cosine
    * distribution — max pairwise cos is ~0.51, so a "real" dedup cut
    * like 0.95 would be vacuously empty). Runs through the IVF cells
    * (equi-join candidate generation + exact verify); the exhaustive
    * SQL oracle cross-checks that no qualifying pair is missed. */
  def qEmbedNeardup(spark: SparkSession, dir: String): DataFrame =
    graft.api.Graft.embedNearDup(
      Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding")),
      "vec_id", "embedding", 0.45)
      .select(col("id_a").as("vec_a"), col("id_b").as("vec_b"), col("cos"))

  val neardupOracle: String =
    """SELECT vec_a, vec_b, cos FROM (
      |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
      |    round(
      |      list_sum(list_transform(range(1, 65), i -> a.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE))
      |      / sqrt(list_sum(list_transform(range(1, 65), i -> a.embedding[i]::DOUBLE * a.embedding[i]::DOUBLE)))
      |      / sqrt(list_sum(list_transform(range(1, 65), i -> b.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE))),
      |      12) AS cos
      |  FROM embeddings a, embeddings b
      |  WHERE a.vec_id < b.vec_id)
      |WHERE cos >= 0.45""".stripMargin

  /** IVF-bucketed approximate kNN — the scale path: corpus vectors
    * live in their 2 nearest cells via a map-only kernel; queries
    * probe their 10 nearest cells; scoring is the cell equi-join.
    * Round 13 moved the gate binding from trained k-means centroids to
    * [[Ivf.strideIndex]] (the engine-replicable rule), which puts the
    * WHOLE approximate result under the full DuckDB hash oracle —
    * shrinking the gate's no-oracle list — at a measured recall of
    * 0.88/0.86 vs exact at sf0.001/sf0.01 (deterministic, pinned ≥0.8
    * in ApproxOpsSpec; trained centroids reach 0.96/0.94 and keep
    * their own recall spec on [[Ivf.Params]] — production trains, the
    * gate replays). */
  def qSimilarityIvf(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    graft.api.Graft.ivfKnn(
      emb, "vec_id", "embedding",
      emb.filter(col("vec_id") < NQueries), "vec_id", "embedding", K,
      Ivf.strideIndex(emb, "vec_id", "embedding"), nprobe = 10, corpusAssign = 2)
  }

  /** The [[RlQueries.ivfAsgCte]] cell replay + [[knnOracle]] scoring
    * over the cell-join candidates — the SQL form of the stride-index
    * [[qSimilarityIvf]]. */
  val similarityIvfOracle: String =
    s"""${RlQueries.ivfAsgCte}, c AS (
      |  SELECT vec_id, embedding, cell FROM asg WHERE r <= 2
      |), q AS (
      |  SELECT vec_id AS query_id, embedding AS qv, cell FROM asg
      |  WHERE r <= 10 AND vec_id < $NQueries
      |), cand AS (
      |  SELECT DISTINCT q.query_id, c.vec_id AS neighbor_id,
      |    round(
      |      list_sum(list_transform(range(1, 65), i -> q.qv[i]::DOUBLE * c.embedding[i]::DOUBLE))
      |      / sqrt(list_sum(list_transform(range(1, 65), i -> q.qv[i]::DOUBLE * q.qv[i]::DOUBLE)))
      |      / sqrt(list_sum(list_transform(range(1, 65), i -> c.embedding[i]::DOUBLE * c.embedding[i]::DOUBLE))),
      |      12) AS cos
      |  FROM c JOIN q USING (cell)
      |  WHERE c.vec_id <> q.query_id
      |)
      |SELECT query_id, neighbor_id, rank, cos FROM (
      |  SELECT query_id, neighbor_id, cos,
      |    row_number() OVER (PARTITION BY query_id
      |      ORDER BY cos DESC, neighbor_id ASC)::BIGINT AS rank
      |  FROM cand)
      |WHERE rank <= $K""".stripMargin

  /** Product-quantized kNN with exact rerank — the compressed-corpus
    * scale path ([[graft.api.Graft.pqKnn]]): 8 one-byte codes per
    * 64-d vector (32×), ADC shortlist of 8·K, exact cosine rerank.
    * Round 13 moved the gate binding to STRIDE codebooks
    * (`Params(ksub = 128, sampleCap = 128, lloydIters = 0)` — with
    * zero Lloyd iterations [[Pq.train]]'s seeds ARE the codebook: the
    * subvectors of the 128 stride-sampled vectors in id order, an
    * engine-replicable data rule), so the WHOLE approximate pipeline —
    * per-subspace L2 argmin encode, ADC scoring, 40-deep shortlist,
    * exact rerank — replays under the full DuckDB hash oracle, the
    * q_similarity_ivf/q_semdedup shrink applied to PQ. Measured recall
    * 0.86/0.84 at sf0.001/sf0.01 (deterministic; trained codebooks
    * keep their own spec floor and the bit-exact full-shortlist
    * plumbing test). Reported cos values are exact by construction. */
  def qSimilarityPq(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    graft.api.Graft.pqKnn(
      emb, "vec_id", "embedding",
      emb.filter(col("vec_id") < NQueries), "vec_id", "embedding", K,
      rerank = 8,
      pq = graft.ops.Pq.Params(ksub = 128, sampleCap = 128, lloydIters = 0))
  }

  /** SQL replay of the stride-codebook [[qSimilarityPq]]: codebook =
    * stride rows (LIMIT 128) in id order; encode = per-(row, subspace)
    * L2 argmin with lower-code ties; ADC = per-query lookup-table sum
    * over the row's 8 codes, divided by the norms; global 40-deep
    * shortlist by (round-12 adc desc, id asc); exact rerank per
    * [[knnOracle]]. Both sides round the ADC to 12 before the cut —
    * the grouped sum here is 8 doubles whose accumulation order DuckDB
    * does not guarantee, and an exact ADC tie (duplicate vectors)
    * straddling the shortlist boundary would otherwise make the
    * unrounded cut run-to-run nondeterministic. */
  val similarityPqOracle: String =
    s"""WITH p AS (
      |  SELECT greatest(1, count(*) // 128)::BIGINT AS s FROM embeddings
      |), cb AS (
      |  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS code, embedding
      |  FROM embeddings, p WHERE vec_id % p.s = 0
      |  ORDER BY vec_id LIMIT 128
      |), subs AS (
      |  SELECT unnest(range(0, 8)) AS sub
      |), dist AS (
      |  SELECT e.vec_id, subs.sub, cb.code,
      |    list_sum(list_transform(range(1, 9),
      |      i -> (e.embedding[subs.sub*8 + i]::DOUBLE - cb.embedding[subs.sub*8 + i]::DOUBLE)
      |         * (e.embedding[subs.sub*8 + i]::DOUBLE - cb.embedding[subs.sub*8 + i]::DOUBLE))) AS d
      |  FROM embeddings e, cb, subs
      |), codes AS (
      |  SELECT vec_id, sub, code FROM (
      |    SELECT vec_id, sub, code,
      |      row_number() OVER (PARTITION BY vec_id, sub ORDER BY d ASC, code ASC) AS r
      |    FROM dist) WHERE r = 1
      |), nrm AS (
      |  SELECT vec_id,
      |    sqrt(list_sum(list_transform(embedding, x -> x::DOUBLE * x::DOUBLE))) AS nrm
      |  FROM embeddings
      |), q AS (
      |  SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < $NQueries
      |), qnrm AS (
      |  SELECT query_id,
      |    sqrt(list_sum(list_transform(qv, x -> x::DOUBLE * x::DOUBLE))) AS qn
      |  FROM q
      |), lut AS (
      |  SELECT q.query_id, subs.sub, cb.code,
      |    list_sum(list_transform(range(1, 9),
      |      i -> q.qv[subs.sub*8 + i]::DOUBLE * cb.embedding[subs.sub*8 + i]::DOUBLE)) AS l
      |  FROM q, cb, subs
      |), adc AS (
      |  SELECT l.query_id, c.vec_id AS neighbor_id,
      |    round(sum(l.l) / (max(qn.qn) * max(n.nrm)), 12) AS a
      |  FROM codes c
      |  JOIN lut l ON l.sub = c.sub AND l.code = c.code
      |  JOIN nrm n ON n.vec_id = c.vec_id
      |  JOIN qnrm qn ON qn.query_id = l.query_id
      |  WHERE c.vec_id <> l.query_id
      |  GROUP BY l.query_id, c.vec_id
      |), short AS (
      |  SELECT query_id, neighbor_id FROM (
      |    SELECT query_id, neighbor_id,
      |      row_number() OVER (PARTITION BY query_id
      |        ORDER BY a DESC, neighbor_id ASC) AS r
      |    FROM adc) WHERE r <= ${8 * K}
      |), scored AS (
      |  SELECT s.query_id, s.neighbor_id,
      |    round(
      |      list_sum(list_transform(range(1, 65), i -> q.qv[i]::DOUBLE * e.embedding[i]::DOUBLE))
      |      / sqrt(list_sum(list_transform(range(1, 65), i -> q.qv[i]::DOUBLE * q.qv[i]::DOUBLE)))
      |      / sqrt(list_sum(list_transform(range(1, 65), i -> e.embedding[i]::DOUBLE * e.embedding[i]::DOUBLE))),
      |      12) AS cos
      |  FROM short s
      |  JOIN embeddings e ON e.vec_id = s.neighbor_id
      |  JOIN q ON q.query_id = s.query_id
      |)
      |SELECT query_id, neighbor_id, rank, cos FROM (
      |  SELECT query_id, neighbor_id, cos,
      |    row_number() OVER (PARTITION BY query_id
      |      ORDER BY cos DESC, neighbor_id ASC)::BIGINT AS rank
      |  FROM scored)
      |WHERE rank <= $K""".stripMargin

  // ----- late-interaction (ColBERT-style MaxSim) retrieval -----

  private val MsVecsPerDoc = 10

  /** Late-interaction retrieval (Khattab & Zaharia 2020, public
    * recipe): multi-vector documents scored by
    * Σ_query-token max_doc-vector cosine. The fixture's vectors group
    * into 10-vector "documents" (doc = vec_id / 10); the query is
    * doc 0's own vector set. Per-(doc, token) maxima are taken over
    * round-12 cosines and micro-quantized BEFORE the cross-token sum,
    * so the score is an order-free integer sum — hash-exact.
    *
    * Scale shape: the corpus stays unshuffled (query tokens broadcast
    * against it via the codegen'd float_dot); one keyed max-agg on
    * (doc, token) with map-side combine, one sum-agg on doc, then a
    * distributed top-10. */
  def qMaxsimSearch(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"))
    val corpus = withNorm(emb, "embedding", "__nrm")
      .select((col("vec_id") / MsVecsPerDoc).cast("long").as("doc"),
        col("embedding"), col("__nrm"))
    val qtoks = withNorm(emb.filter(col("vec_id") < MsVecsPerDoc), "embedding", "__qnrm")
      .select(col("vec_id").as("qtok"), col("embedding").as("__qv"), col("__qnrm"))
    val scored = corpus.join(broadcast(qtoks), col("doc") =!= 0L)
      .select(col("doc"), col("qtok"),
        round(cosinePrenormed(col("embedding"), col("__qv"), col("__nrm"), col("__qnrm")),
          12).as("__cos"))
    val perTok = scored.groupBy(col("doc"), col("qtok"))
      .agg(floor(max(col("__cos")) * 1e6 + 0.5).cast("long").as("__m"))
    perTok.groupBy(col("doc"))
      .agg((sum(col("__m")).cast("double") / 1e6).as("maxsim"))
      .orderBy(col("maxsim").desc, col("doc").asc)
      .limit(10)
      .withColumn("rank", row_number()
        .over(Window.orderBy(col("maxsim").desc, col("doc").asc)).cast("long"))
  }

  val maxsimOracle: String =
    s"""WITH c AS (
       |  SELECT vec_id // $MsVecsPerDoc AS doc, embedding,
       |    sqrt(list_sum(list_transform(range(1, 65),
       |      i -> embedding[i]::DOUBLE * embedding[i]::DOUBLE))) AS nrm
       |  FROM embeddings
       |), q AS (
       |  SELECT vec_id AS qtok, embedding AS qv,
       |    sqrt(list_sum(list_transform(range(1, 65),
       |      i -> embedding[i]::DOUBLE * embedding[i]::DOUBLE))) AS qnrm
       |  FROM embeddings WHERE vec_id < $MsVecsPerDoc
       |), m AS (
       |  SELECT c.doc, q.qtok,
       |    floor(max(round(
       |      list_sum(list_transform(range(1, 65),
       |        i -> c.embedding[i]::DOUBLE * q.qv[i]::DOUBLE)) / c.nrm / q.qnrm,
       |      12)) * 1e6 + 0.5)::BIGINT AS mq
       |  FROM c, q WHERE c.doc <> 0
       |  GROUP BY c.doc, q.qtok
       |)
       |SELECT doc, maxsim, rank FROM (
       |  SELECT doc, sum(mq)::DOUBLE / 1e6 AS maxsim,
       |    row_number() OVER (ORDER BY sum(mq) DESC, doc ASC)::BIGINT AS rank
       |  FROM m GROUP BY doc)
       |WHERE rank <= 10""".stripMargin
}
