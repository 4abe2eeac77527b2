package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Evaluation operators — the measurement half of the retrieval and
  * classification stacks (north star): IR rank metrics (recall@k, MRR,
  * nDCG) over the exact-kNN run, a per-class confusion profile for the
  * NB classifier, and the full-outer reconciliation join that
  * completes the join-type matrix.
  *
  * Scale notes: metrics aggregate the (queries × k) retrieval frame —
  * tiny relative to the corpus — after broadcast label joins; the
  * confusion matrix is |classes|²; the outer join shuffles both sides
  * once on the shared key.
  */
object EvalQueries {

  private val K = 5

  /** Rank-quality evaluation of the exact cosine kNN
    * ([[SimilarityQueries.qSimilarityKnn]]) with label-match relevance:
    * per query — hit count, recall@K (vs the achievable pool
    * min(K, |same-label|−1)), MRR, and nDCG@K. Every metric is
    * arithmetic over ranks and exact counts (log2 rounded at 6 to
    * absorb libm ULP differences across engines). */
  def qRankEval(spark: SparkSession, dir: String): DataFrame = {
    val knn = SimilarityQueries.qSimilarityKnn(spark, dir)
    val lbl = Tables.embeddings(spark, dir).select(col("vec_id"), col("label"))
    val lc = lbl.groupBy(col("label")).agg(count(lit(1)).as("__c"))
    val j = knn
      .join(broadcast(lbl.select(col("vec_id").as("neighbor_id"), col("label").as("__nl"))),
        Seq("neighbor_id"))
      .join(broadcast(lbl.select(col("vec_id").as("query_id"), col("label").as("__ql"))),
        Seq("query_id"))
      .join(broadcast(lc.select(col("label").as("__ql"), (col("__c") - 1L).as("__rt"))),
        Seq("__ql"))
      .select(col("query_id"), col("rank"),
        (col("__nl") === col("__ql")).as("__rel"), col("__rt"))
    val pool = least(lit(K.toLong), min(col("__rt")))
    // Singleton-label guard: a query whose label has no other member has
    // pool = 0 — recall/nDCG are undefined (division by zero; and
    // sequence(1, 0) would be a DESCENDING [1,0] in Spark vs an empty
    // range in DuckDB). Both engines yield NULL identically (CaseWhen
    // evaluates branches lazily, so the guarded division never runs).
    j.groupBy(col("query_id"))
      .agg(
        sum(when(col("__rel"), 1L).otherwise(0L)).as("n_rel"),
        round(when(pool > 0L,
          sum(when(col("__rel"), 1L).otherwise(0L)).cast("double") /
            pool.cast("double")), 6).as("recall_at_k"),
        round(coalesce(lit(1.0) / min(when(col("__rel"), col("rank"))).cast("double"),
          lit(0.0)), 6).as("mrr"),
        round(when(pool > 0L,
          sum(when(col("__rel"), lit(1.0) / log2(col("rank").cast("double") + 1.0))
            .otherwise(0.0)) /
          aggregate(sequence(lit(1L), pool), lit(0.0),
            (acc, i) => acc + lit(1.0) / log2(i.cast("double") + 1.0))), 6).as("ndcg"))
  }

  val rankEvalOracle: String =
    s"""WITH knn AS (SELECT * FROM (${SimilarityQueries.knnOracle}) z),
       |lbl AS (SELECT vec_id, label FROM embeddings),
       |lc AS (SELECT label, count(*) AS c FROM embeddings GROUP BY label),
       |j AS (
       |  SELECT knn.query_id, knn.rank, (nl.label = ql.label) AS rel, lc.c - 1 AS rt
       |  FROM knn JOIN lbl nl ON knn.neighbor_id = nl.vec_id
       |           JOIN lbl ql ON knn.query_id = ql.vec_id
       |           JOIN lc ON lc.label = ql.label
       |)
       |SELECT query_id,
       |  sum(CASE WHEN rel THEN 1 ELSE 0 END)::BIGINT AS n_rel,
       |  round(CASE WHEN least($K, min(rt)) > 0 THEN
       |        sum(CASE WHEN rel THEN 1 ELSE 0 END)::DOUBLE
       |        / least($K, min(rt))::DOUBLE END, 6) AS recall_at_k,
       |  round(coalesce(1.0::DOUBLE / min(CASE WHEN rel THEN rank END)::DOUBLE,
       |        0.0::DOUBLE), 6) AS mrr,
       |  round(CASE WHEN least($K, min(rt)) > 0 THEN
       |        sum(CASE WHEN rel THEN 1.0::DOUBLE / log2((rank + 1)::DOUBLE)
       |            ELSE 0.0::DOUBLE END)
       |        / list_sum(list_transform(range(1, least($K, min(rt)) + 1),
       |            i -> 1.0::DOUBLE / log2((i + 1)::DOUBLE))) END, 6) AS ndcg
       |FROM j GROUP BY query_id""".stripMargin

  /** Per-class confusion profile of the NB classifier gate run
    * ([[ClassifyQueries.qNbClassify]] — train on even doc_ids, score
    * odd): tp/fp/fn and exact-ratio precision/recall/F1 per true
    * class. The cell matrix is |classes|² — driver-scale math on top
    * of a distributed scoring pass. */
  def qConfusion(spark: SparkSession, dir: String): DataFrame = {
    val pred = ClassifyQueries.qNbClassify(spark, dir)
      .select(col("doc_id"), col("pred_lang"))
    val truth = Tables.documents(spark, dir)
      .filter(pmod(col("doc_id"), lit(2)) === 1)
      .select(col("doc_id"), col("lang"))
    // |classes|² rows, but fed by the FULL NB train+score pass: byTrue
    // and byPred below would each recompute that pass (2 scoring runs
    // in the r18 plan dump) — materialize the tiny cell matrix once
    val cells = pred.join(truth, Seq("doc_id"))
      .groupBy(col("lang"), col("pred_lang")).agg(count(lit(1)).as("__n"))
      .localCheckpoint(true)
    val byTrue = cells.groupBy(col("lang")).agg(
      sum(when(col("pred_lang") === col("lang"), col("__n")).otherwise(0L)).as("tp"),
      sum(when(col("pred_lang") =!= col("lang"), col("__n")).otherwise(0L)).as("fn"))
    val byPred = cells.groupBy(col("pred_lang")).agg(
      sum(when(col("pred_lang") =!= col("lang"), col("__n")).otherwise(0L)).as("fp"))
    val m = byTrue.join(byPred, col("lang") === col("pred_lang"), "left")
      .select(col("lang"), col("tp"), coalesce(col("fp"), lit(0L)).as("fp"), col("fn"))
    // ANSI-safe: a never-predicted class has tp+fp = 0 → precision 0
    val p = when(col("tp") + col("fp") > 0L,
      col("tp").cast("double") / (col("tp") + col("fp")).cast("double")).otherwise(0.0)
    val r = when(col("tp") + col("fn") > 0L,
      col("tp").cast("double") / (col("tp") + col("fn")).cast("double")).otherwise(0.0)
    m.select(col("lang"), col("tp"), col("fp"), col("fn"),
      round(p, 6).as("precision"),
      round(r, 6).as("recall"),
      round(when(p + r > 0.0, lit(2.0) * p * r / (p + r)).otherwise(0.0), 6).as("f1"))
  }

  val confusionOracle: String =
    s"""WITH pred AS (
       |  SELECT doc_id, pred_lang FROM (${ClassifyQueries.nbClassifyOracle}) z
       |), truth AS (
       |  SELECT doc_id, lang FROM documents WHERE doc_id % 2 = 1
       |), cells AS (
       |  SELECT t.lang, p.pred_lang, count(*)::BIGINT AS n
       |  FROM pred p JOIN truth t ON p.doc_id = t.doc_id GROUP BY 1, 2
       |), bt AS (
       |  SELECT lang,
       |    sum(CASE WHEN pred_lang = lang THEN n ELSE 0 END)::BIGINT AS tp,
       |    sum(CASE WHEN pred_lang <> lang THEN n ELSE 0 END)::BIGINT AS fn
       |  FROM cells GROUP BY lang
       |), bp AS (
       |  SELECT pred_lang,
       |    sum(CASE WHEN pred_lang <> lang THEN n ELSE 0 END)::BIGINT AS fp
       |  FROM cells GROUP BY pred_lang
       |), m AS (
       |  SELECT bt.lang, bt.tp, coalesce(bp.fp, 0)::BIGINT AS fp, bt.fn
       |  FROM bt LEFT JOIN bp ON bt.lang = bp.pred_lang
       |)
       |, pr AS (
       |  SELECT lang, tp, fp, fn,
       |    CASE WHEN tp + fp > 0 THEN tp::DOUBLE / (tp + fp)::DOUBLE
       |         ELSE 0.0::DOUBLE END AS p,
       |    CASE WHEN tp + fn > 0 THEN tp::DOUBLE / (tp + fn)::DOUBLE
       |         ELSE 0.0::DOUBLE END AS r
       |  FROM m
       |)
       |SELECT lang, tp, fp, fn,
       |  round(p, 6) AS precision, round(r, 6) AS recall,
       |  round(CASE WHEN p + r > 0.0 THEN 2.0::DOUBLE * p * r / (p + r)
       |        ELSE 0.0::DOUBLE END, 6) AS f1
       |FROM pr""".stripMargin

  /** Full-outer reconciliation: per-user event activity against
    * per-customer order activity on the shared key — both unmatched
    * sides survive with zero-filled counts (users who never ordered,
    * customers who never clicked). Both inputs pre-aggregate to key
    * grain BEFORE the join, so the outer join is small-side × small-side
    * however large the raw facts are. */
  def qOuterJoin(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir).groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"))
    val o = Tables.orders(spark, dir).groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"))
    e.join(o, col("user_id") === col("o_custkey"), "full_outer")
      .select(
        coalesce(col("user_id"), col("o_custkey")).as("key"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        coalesce(col("n_orders"), lit(0L)).as("n_orders"))
  }

  val outerJoinOracle: String =
    """WITH e AS (SELECT user_id, count(*) AS n_events FROM events GROUP BY user_id),
      |o AS (SELECT o_custkey, count(*) AS n_orders FROM orders GROUP BY o_custkey)
      |SELECT coalesce(e.user_id, o.o_custkey) AS key,
      |  coalesce(e.n_events, 0) AS n_events,
      |  coalesce(o.n_orders, 0) AS n_orders
      |FROM e FULL OUTER JOIN o ON e.user_id = o.o_custkey""".stripMargin

  /** The SQL-standard rank-function family: rank, dense_rank,
    * percent_rank, cume_dist per event_type ordered by value ALONE —
    * ties get equal ranks in every engine, and percent_rank/cume_dist
    * are exact integer ratios, so the whole family is deterministic
    * without a tiebreak column (row_number would not be).
    *
    * PRECONDITION: `value` must be non-NULL and non-NaN. The tie-group
    * frame joins back to the events on raw-double equality, and
    * NaN != NaN (and NULL != NULL) in a join predicate — such rows
    * would silently vanish from the output where the one-window form
    * would rank them (Spark windows order NaN last, NULL first). The
    * fixture column is NOT NULL / finite by construction; corpora with
    * NaN sentinels should canonicalize first (e.g. nanvl or a
    * bit-stable key) — this kernel deliberately does not pay that
    * projection for data that doesn't need it.
    *
    * event_type is fixed-cardinality, so the naive one-window form is a
    * single-task sort per stratum at scale (round-11 weak class).
    * Instead: collapse to the DISTINCT (event_type, value) frame with
    * tie-group counts, rank THAT with the distributed two-pass
    * [[graft.ops.StratifiedRank]] kernel (dense_rank = the distinct
    * frame's row number; rank − 1 and the cume_dist numerator are its
    * exclusive/inclusive weight prefix sums), and join the tie-group
    * frame back to the events on (event_type, value) — every rank
    * function becomes exact integer arithmetic over per-group scalars
    * and no data-sized per-stratum sort exists anywhere in the plan. */
  def qRankFuncs(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
      .select(col("event_id"), col("event_type"), col("value"))
    val grp = e.groupBy(col("event_type"), col("value"))
      .agg(count(lit(1)).as("__c"))
    val totals = grp.groupBy(col("event_type")).agg(sum(col("__c")).as("__n"))
    val ranked = StratifiedRank.stratifiedRank(grp, Seq("event_type"),
        col("value"), weight = Some(col("__c")),
        rankName = "__drnk", psumName = "__below")
      .join(broadcast(totals), "event_type")
      .select(col("event_type"), col("value"),
        (col("__below") + 1L).as("rnk"),
        col("__drnk").as("drnk"),
        when(col("__n") > 1L, col("__below").cast("double") /
          (col("__n") - 1L).cast("double")).otherwise(lit(0.0)).as("prank"),
        ((col("__below") + col("__c")).cast("double") /
          col("__n").cast("double")).as("cdist"))
    e.join(ranked, Seq("event_type", "value"))
      .select(col("event_id"), col("event_type"),
        col("rnk"), col("drnk"), col("prank"), col("cdist"))
  }

  val rankFuncsOracle: String =
    """SELECT event_id, event_type,
      |  rank() OVER w::BIGINT AS rnk,
      |  dense_rank() OVER w::BIGINT AS drnk,
      |  percent_rank() OVER w AS prank,
      |  cume_dist() OVER w AS cdist
      |FROM events
      |WINDOW w AS (PARTITION BY event_type ORDER BY value)""".stripMargin

  /** ROUGE-1/2 overlap between adjacent document pairs (doc 2k is the
    * reference, 2k+1 the candidate) — the n-gram generation-eval
    * metric, with standard clipped (multiset-min) counts. Token/bigram
    * frames explode once per side; the overlap is an equi-join on the
    * gram string grouped per pair — never a doc × doc product. */
  def qRouge(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
      .select((col("doc_id") / 2).cast("long").as("pair_id"),
        pmod(col("doc_id"), lit(2)).as("side"),
        filter(split(col("text"), " "), t => t =!= "").as("__t"))
    def grams(n: Int): DataFrame =
      if (n == 1) d.select(col("pair_id"), col("side"), explode(col("__t")).as("g"))
      else d
        .filter(size(col("__t")) >= n)
        .select(col("pair_id"), col("side"),
          explode(transform(sequence(lit(1), size(col("__t")) - (n - 1)),
            i => concat_ws(" ", element_at(col("__t"), i), element_at(col("__t"), i + 1))))
            .as("g"))
    // gram totals come from the DOC frame, not the exploded counts, so
    // a side with zero tokens/bigrams still yields a (pair, 0) total in
    // BOTH engines instead of dropping the pair on one side only
    val totals = d.groupBy(col("pair_id")).agg(
      sum(when(col("side") === 0, size(col("__t")).cast("long")).otherwise(0L)).as("__tr1"),
      sum(when(col("side") === 1, size(col("__t")).cast("long")).otherwise(0L)).as("__tc1"),
      sum(when(col("side") === 0, greatest(size(col("__t")) - 1, lit(0)).cast("long"))
        .otherwise(0L)).as("__tr2"),
      sum(when(col("side") === 1, greatest(size(col("__t")) - 1, lit(0)).cast("long"))
        .otherwise(0L)).as("__tc2"))
    // clipped overlap in ONE pass: the old side-0 ⋈ side-1 self-join
    // computed the gram subtree (scan + explode + agg) once per side;
    // a two-sided conditional agg over (pair_id, g) reads the grams
    // once and needs no join. Grams present on one side only
    // contribute least(c, 0) = 0, exactly what the inner join dropped,
    // and a pair with zero shared grams now sums to 0 instead of going
    // missing — identical after the downstream coalesce(·, 0).
    def overlap(n: Int, name: String): DataFrame =
      grams(n)
        .groupBy(col("pair_id"), col("g"))
        .agg(sum(when(col("side") === 0, 1L).otherwise(0L)).as("cr"),
          sum(when(col("side") === 1, 1L).otherwise(0L)).as("cc"))
        .groupBy(col("pair_id")).agg(sum(least(col("cr"), col("cc"))).as(name))
    def metrics(ov: String, tr: String, tc: String, pfx: String): Seq[org.apache.spark.sql.Column] = {
      val o = coalesce(col(ov), lit(0L)).cast("double")
      val p = when(col(tc) > 0L, o / col(tc).cast("double")).otherwise(0.0)
      val r = when(col(tr) > 0L, o / col(tr).cast("double")).otherwise(0.0)
      Seq(round(p, 6).as(s"${pfx}_p"), round(r, 6).as(s"${pfx}_r"),
        round(when(p + r > 0.0, lit(2.0) * p * r / (p + r)).otherwise(0.0), 6).as(s"${pfx}_f"))
    }
    totals
      .join(overlap(1, "__ov1"), Seq("pair_id"), "left")
      .join(overlap(2, "__ov2"), Seq("pair_id"), "left")
      .select(col("pair_id") +:
        (metrics("__ov1", "__tr1", "__tc1", "r1") ++
          metrics("__ov2", "__tr2", "__tc2", "r2")): _*)
  }

  val rougeOracle: String =
    """WITH d AS (
      |  SELECT doc_id // 2 AS pair_id, doc_id % 2 AS side,
      |    list_filter(string_split(text, ' '), t -> t <> '') AS w
      |  FROM documents
      |), tot AS (
      |  SELECT pair_id,
      |    sum(CASE WHEN side = 0 THEN len(w) ELSE 0 END)::BIGINT AS tr1,
      |    sum(CASE WHEN side = 1 THEN len(w) ELSE 0 END)::BIGINT AS tc1,
      |    sum(CASE WHEN side = 0 THEN greatest(len(w) - 1, 0) ELSE 0 END)::BIGINT AS tr2,
      |    sum(CASE WHEN side = 1 THEN greatest(len(w) - 1, 0) ELSE 0 END)::BIGINT AS tc2
      |  FROM d GROUP BY pair_id
      |), uni AS (
      |  SELECT pair_id, side, unnest(w) AS g FROM d
      |), bi AS (
      |  SELECT pair_id, side,
      |    unnest(list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1])) AS g
      |  FROM d WHERE len(w) >= 2
      |), u AS (SELECT pair_id, side, g, count(*) AS c FROM uni GROUP BY 1,2,3),
      |b AS (SELECT pair_id, side, g, count(*) AS c FROM bi GROUP BY 1,2,3),
      |uo AS (
      |  SELECT r.pair_id, sum(least(r.c, ca.c)) AS ov
      |  FROM u r JOIN u ca ON r.pair_id = ca.pair_id AND r.g = ca.g
      |  WHERE r.side = 0 AND ca.side = 1 GROUP BY r.pair_id
      |), bo AS (
      |  SELECT r.pair_id, sum(least(r.c, ca.c)) AS ov
      |  FROM b r JOIN b ca ON r.pair_id = ca.pair_id AND r.g = ca.g
      |  WHERE r.side = 0 AND ca.side = 1 GROUP BY r.pair_id
      |), m AS (
      |  SELECT tot.pair_id,
      |    CASE WHEN tc1 > 0 THEN coalesce(uo.ov, 0)::DOUBLE / tc1::DOUBLE
      |         ELSE 0.0::DOUBLE END AS p1,
      |    CASE WHEN tr1 > 0 THEN coalesce(uo.ov, 0)::DOUBLE / tr1::DOUBLE
      |         ELSE 0.0::DOUBLE END AS r1,
      |    CASE WHEN tc2 > 0 THEN coalesce(bo.ov, 0)::DOUBLE / tc2::DOUBLE
      |         ELSE 0.0::DOUBLE END AS p2,
      |    CASE WHEN tr2 > 0 THEN coalesce(bo.ov, 0)::DOUBLE / tr2::DOUBLE
      |         ELSE 0.0::DOUBLE END AS r2
      |  FROM tot LEFT JOIN uo ON tot.pair_id = uo.pair_id
      |           LEFT JOIN bo ON tot.pair_id = bo.pair_id
      |)
      |SELECT pair_id,
      |  round(p1, 6) AS r1_p, round(r1, 6) AS r1_r,
      |  round(CASE WHEN p1 + r1 > 0.0 THEN 2.0::DOUBLE * p1 * r1 / (p1 + r1)
      |        ELSE 0.0::DOUBLE END, 6) AS r1_f,
      |  round(p2, 6) AS r2_p, round(r2, 6) AS r2_r,
      |  round(CASE WHEN p2 + r2 > 0.0 THEN 2.0::DOUBLE * p2 * r2 / (p2 + r2)
      |        ELSE 0.0::DOUBLE END, 6) AS r2_f
      |FROM m""".stripMargin
}
