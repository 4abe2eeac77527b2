package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal/relational completeness pass: change-capture intervals
  * (SCD-2), Markov transition matrices, CUBE grouping, grouped
  * correlation/regression, and percentile winsorization.
  *
  * These extend the §2.B "stock Spark downstream of the connector"
  * surface (SURVEY.md: the reference delegates ALL relational work to
  * Spark — e.g. demo DISSparkStreamingSubscribeExample.scala:46) with
  * the event-history shapes a warehouse built on a stream ingest needs:
  * the DIS record stream is an append-only change log, and SCD-2 /
  * transition mining are the canonical queries over such a log.
  *
  * Scale notes (100 TB): every query here shuffles at most once on its
  * natural key (user_id for the per-user windows, the group keys for
  * the aggs); the winsorize percentile frame is |event_type| rows and
  * broadcast. No windows over an unpartitioned global ordering.
  */
object TemporalQueries {

  /** SCD-2 change capture over the event log: per user ordered by
    * (ts, event_id), keep only rows where `event_type` changed vs the
    * previous event, and emit validity intervals
    * [valid_from, valid_to) with NULL valid_to = current row.
    *
    * Both window functions share one partitioning (user_id) and one
    * sort order, so Catalyst plans a single exchange + sort with two
    * Window nodes — per-user history never crosses executors twice. */
  def qScd2(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val changes = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .withColumn("__prev", lag(col("event_type"), 1).over(w))
      .filter(col("__prev").isNull || col("__prev") =!= col("event_type"))
    changes
      .withColumn("valid_to", lead(col("ts"), 1).over(w))
      .select(col("user_id"), col("event_type"), col("ts").as("valid_from"),
        col("valid_to"), col("valid_to").isNull.as("is_current"))
  }

  val scd2Oracle: String =
    """WITH s AS (
      |  SELECT user_id, event_type, ts, event_id,
      |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
      |  FROM events
      |), c AS (
      |  SELECT user_id, event_type, ts, event_id FROM s
      |  WHERE prev IS NULL OR prev <> event_type
      |)
      |SELECT user_id, event_type, ts AS valid_from,
      |  lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to,
      |  lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL AS is_current
      |FROM c""".stripMargin

  /** First-order Markov transition matrix over per-user event
    * sequences: count and conditional probability of each
    * (src event_type → dst event_type) step. One window shuffle on
    * user_id, then a tiny |types|² agg; `prob` is an exact integer
    * division (IEEE-identical across engines). */
  def qTransitions(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val steps = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .withColumn("src", lag(col("event_type"), 1).over(w))
      .filter(col("src").isNotNull)
      .groupBy(col("src"), col("event_type").as("dst"))
      .agg(count(lit(1)).as("cnt"))
    steps.withColumn("prob",
      col("cnt").cast("double") /
        sum(col("cnt")).over(Window.partitionBy(col("src"))).cast("double"))
  }

  val transitionsOracle: String =
    """WITH s AS (
      |  SELECT event_type,
      |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS src
      |  FROM events
      |), t AS (
      |  SELECT src, event_type AS dst, count(*) AS cnt
      |  FROM s WHERE src IS NOT NULL GROUP BY 1, 2
      |)
      |SELECT src, dst, cnt,
      |  cnt::DOUBLE / (sum(cnt) OVER (PARTITION BY src))::DOUBLE AS prob
      |FROM t""".stripMargin

  /** CUBE over (l_returnflag, l_linestatus): all 2² grouping sets in
    * one pass. Spark plans an Expand + single hash agg — one shuffle
    * for every subtotal level. sum(l_quantity) is a sum of integral
    * doubles < 2⁵³, so it is order-independent and hash-exact. */
  def qCube(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("cnt"), sum(col("l_quantity")).as("sum_qty"))

  val cubeOracle: String =
    """SELECT l_returnflag, l_linestatus, count(*) AS cnt,
      |  sum(l_quantity) AS sum_qty
      |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)""".stripMargin

  /** Explicit GROUPING SETS — the general form cube/rollup are sugar
    * for: a business-chosen set list ((flag, status), (ship month), ())
    * that a cube would over-produce (2³ = 8 sets) and a rollup cannot
    * express at all. Same Expand + ONE hash aggregate plan as
    * [[qCube]] — one shuffle for all three subtotal levels; the
    * grouping columns are non-null in lineitem, so NULL markers
    * disambiguate levels without grouping_id (whose bit order is not
    * portable across engines). */
  def qGroupingSets(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .withColumn("ship_month", date_trunc("month", col("l_shipdate")).cast("date"))
      .groupingSets(
        Seq(Seq(col("l_returnflag"), col("l_linestatus")),
          Seq(col("ship_month")), Seq.empty),
        col("l_returnflag"), col("l_linestatus"), col("ship_month"))
      .agg(count(lit(1)).as("cnt"), sum(col("l_quantity")).as("sum_qty"))

  val groupingSetsOracle: String =
    """SELECT l_returnflag, l_linestatus,
      |  date_trunc('month', l_shipdate)::DATE AS ship_month,
      |  count(*) AS cnt, sum(l_quantity) AS sum_qty
      |FROM lineitem
      |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
      |  (date_trunc('month', l_shipdate)::DATE), ())""".stripMargin

  /** Grouped correlation + least-squares slope of extendedprice on
    * quantity per return flag — the profile-stats shape for numeric
    * column pairs. One shuffle on the group key; co-moments are
    * computed with map-side partial merges (mergeable moment sketches,
    * the same shape Welford merging gives a 1000-executor scan).
    * Rounded so one-pass merge-order jitter in the last double bits
    * cannot flip the comparator. */
  def qCorr(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n"),
        round(corr(col("l_quantity"), col("l_extendedprice")), 6).as("corr_qp"),
        round(regr_slope(col("l_extendedprice"), col("l_quantity")), 4).as("slope"))

  val corrOracle: String =
    """SELECT l_returnflag, count(*) AS n,
      |  round(corr(l_quantity, l_extendedprice), 6) AS corr_qp,
      |  round(regr_slope(l_extendedprice, l_quantity), 4) AS slope
      |FROM lineitem GROUP BY l_returnflag""".stripMargin

  /** Percentile winsorization: cap `value` at the exact per-type
    * [p05, p95] band, report the capped mean — the outlier-robust
    * normalization step of a feature pipeline. The percentile frame is
    * |event_type| rows → broadcast; the big side streams through one
    * hash agg. p05/p95 use the same linear-interpolation definition as
    * DuckDB quantile_cont (pinned hash-green by q_percentiles_exact). */
  def qWinsorize(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir).select(col("event_type"), col("value"))
    val pct = e.groupBy(col("event_type")).agg(
      percentile(col("value"), lit(0.05)).as("lo"),
      percentile(col("value"), lit(0.95)).as("hi"))
    e.join(broadcast(pct), Seq("event_type"))
      .select(col("event_type"),
        least(greatest(col("value"), col("lo")), col("hi")).as("__capped"),
        col("lo"), col("hi"))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        round(first(col("lo")), 6).as("lo"),
        round(first(col("hi")), 6).as("hi"),
        round(avg(col("__capped")), 6).as("avg_capped"))
  }

  val winsorizeOracle: String =
    """WITH pct AS (
      |  SELECT event_type, quantile_cont(value, 0.05) AS lo,
      |    quantile_cont(value, 0.95) AS hi
      |  FROM events GROUP BY event_type
      |)
      |SELECT e.event_type, count(*) AS n,
      |  round(min(pct.lo), 6) AS lo, round(min(pct.hi), 6) AS hi,
      |  round(avg(least(greatest(e.value, pct.lo), pct.hi)), 6) AS avg_capped
      |FROM events e JOIN pct ON e.event_type = pct.event_type
      |GROUP BY e.event_type""".stripMargin

  /** Cohort retention matrix: users grouped by first-activity day,
    * counted distinct per day offset — the engagement query every
    * event warehouse runs. Two keyed shuffles (per-user min, then the
    * small cohort×offset agg); the first-day frame joins back on
    * user_id, co-partitioned with the agg that built it. */
  def qRetention(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
      .select(col("user_id"), to_date(col("ts")).as("d"))
    val first = e.groupBy(col("user_id")).agg(min(col("d")).as("cohort"))
    e.join(first, Seq("user_id"))
      .groupBy(col("cohort"), datediff(col("d"), col("cohort")).cast("long").as("day_offset"))
      .agg(countDistinct(col("user_id")).as("users"))
  }

  val retentionOracle: String =
    """WITH f AS (
      |  SELECT user_id, min(ts::DATE) AS cohort FROM events GROUP BY user_id
      |)
      |SELECT f.cohort, (e.ts::DATE - f.cohort)::BIGINT AS day_offset,
      |  count(DISTINCT e.user_id) AS users
      |FROM events e JOIN f ON e.user_id = f.user_id
      |GROUP BY 1, 2""".stripMargin

  /** Equal-frequency quartile assignment per event_type (ntile over a
    * deterministic (value, event_id) order) — the bucketing step of
    * monotone feature binning. event_type is a FIXED-cardinality key,
    * so `ntile().over(partitionBy(event_type))` would single-task-sort
    * each stratum at scale (round-11 weak class); instead the
    * per-stratum row number comes from the distributed two-pass
    * [[StratifiedRank]] kernel and the quartile is the SQL-standard
    * closed form over (rn, stratum count): with q = n div 4,
    * r = n mod 4, the first r buckets hold q+1 rows — bit-identical to
    * every engine's ntile. */
  def qNtile(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
      .select(col("event_id"), col("event_type"), col("value"))
    val totals = e.groupBy(col("event_type")).agg(count(lit(1)).as("__n"))
    StratifiedRank.stratifiedRank(e, Seq("event_type"), col("value"),
        Seq(col("event_id")), rankName = "__rn")
      .join(broadcast(totals), "event_type")
      // exact integer arithmetic only (div, %) — the greatest() guard is
      // unreachable arithmetic (the ELSE branch implies __n div 4 >= 1)
      // but keeps the plan ANSI-safe
      .withColumn("quartile", expr(
        """CASE WHEN __rn <= (__n % 4) * (__n div 4 + 1)
          |THEN (__rn - 1) div (__n div 4 + 1) + 1
          |ELSE (__n % 4) + (__rn - (__n % 4) * (__n div 4 + 1) - 1)
          |       div greatest(__n div 4, 1) + 1
          |END""".stripMargin).cast("long"))
      .select(col("event_id"), col("event_type"), col("quartile"))
  }

  val ntileOracle: String =
    """SELECT event_id, event_type,
      |  ntile(4) OVER (PARTITION BY event_type ORDER BY value, event_id)::BIGINT AS quartile
      |FROM events""".stripMargin

  /** Robust outlier profile per event_type: exact median, median
    * absolute deviation, and the count of |x − med| > 3·1.4826·MAD
    * outliers — the scale-robust z-score that heavy tails can't skew.
    * The |types|-row median frame is broadcast; the corpus streams
    * through two agg passes (median, then MAD+flag) without ever
    * sorting globally. */
  def qMadOutliers(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir).select(col("event_type"), col("value"))
    val med = e.groupBy(col("event_type"))
      .agg(percentile(col("value"), lit(0.5)).as("med"))
    val dev = e.join(broadcast(med), Seq("event_type"))
      .withColumn("__ad", abs(col("value") - col("med")))
    val mad = dev.groupBy(col("event_type"))
      .agg(first(col("med")).as("__m"), percentile(col("__ad"), lit(0.5)).as("__mad"))
    dev.join(broadcast(mad.select(col("event_type"), col("__m"), col("__mad"))),
        Seq("event_type"))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        round(first(col("__m")), 6).as("med"),
        round(first(col("__mad")), 6).as("mad"),
        sum(when(col("__ad") > lit(3.0) * lit(1.4826) * col("__mad"), 1L)
          .otherwise(0L)).as("n_outliers"))
  }

  val madOutliersOracle: String =
    """WITH med AS (
      |  SELECT event_type, quantile_cont(value, 0.5) AS m FROM events GROUP BY event_type
      |), dev AS (
      |  SELECT e.event_type, abs(e.value - med.m) AS ad, med.m
      |  FROM events e JOIN med ON e.event_type = med.event_type
      |), mad AS (
      |  SELECT event_type, min(m) AS m, quantile_cont(ad, 0.5) AS md
      |  FROM dev GROUP BY event_type
      |)
      |SELECT dev.event_type, count(*) AS n,
      |  round(min(mad.m), 6) AS med, round(min(mad.md), 6) AS mad,
      |  sum(CASE WHEN dev.ad > 3.0::DOUBLE * 1.4826::DOUBLE * mad.md
      |      THEN 1 ELSE 0 END)::BIGINT AS n_outliers
      |FROM dev JOIN mad ON dev.event_type = mad.event_type
      |GROUP BY dev.event_type""".stripMargin

  /** Stride-scheduled mixture interleave: each source s gets weight
    * w_s = 1 + (srcnum mod 4); its i-th document (by doc_id) is
    * scheduled at key i/w_s, so sorting by (sched_key, source,
    * src_rank) yields the weight-proportional round-robin order LLM
    * training mixtures use. The key is an exact integer division —
    * bit-identical across engines — and realizing the order at 100 TB
    * is a distributed range-partitioned sort on sched_key (Spark's
    * sample-based exchange), never a single-point row_number. */
  def qInterleave(spark: SparkSession, dir: String): DataFrame = {
    // per-source rank via the distributed two-pass kernel — `source` is
    // fixed-cardinality, so a dense row_number window over it would be
    // the single-point sort the Scaladoc above promises to avoid
    StratifiedRank.stratifiedRank(
        Tables.documents(spark, dir).select(col("doc_id"), col("source")),
        Seq("source"), col("doc_id"), rankName = "src_rank")
      .withColumn("sched_key",
        col("src_rank").cast("double") /
          // unbounded slice — identical parse to the oracle's substr(source, 4)
          (lit(1.0) + pmod(expr("substring(source, 4)").cast("long"), lit(4L))
            .cast("double")))
  }

  val interleaveOracle: String =
    """WITH r AS (
      |  SELECT doc_id, source,
      |    row_number() OVER (PARTITION BY source ORDER BY doc_id) AS src_rank
      |  FROM documents
      |)
      |SELECT doc_id, source, src_rank::BIGINT AS src_rank,
      |  src_rank::DOUBLE / (1.0::DOUBLE + (substr(source, 4)::BIGINT % 4)::DOUBLE) AS sched_key
      |FROM r""".stripMargin

  /** OHLC downsampling: open/high/low/close of `value` per
    * (event_type, hour) bar — the financial/metrics resampling shape.
    * Open/close come from first_value/last_value over the
    * deterministic (ts, event_id) order (full-frame window so
    * last_value sees the whole bar); high/low are plain min/max. One
    * window shuffle on the bar key, then a collapse to bar grain. */
  def qOhlc(spark: SparkSession, dir: String): DataFrame = {
    val hour = date_trunc("hour", col("ts"))
    val w = Window.partitionBy(col("event_type"), hour)
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.events(spark, dir)
      .select(col("event_type"), hour.as("bar_start"), col("ts"), col("event_id"), col("value"))
      .withColumn("open", first(col("value")).over(w))
      .withColumn("close", last(col("value")).over(w))
      .groupBy(col("event_type"), col("bar_start"))
      .agg(
        first(col("open")).as("open"),
        max(col("value")).as("high"),
        min(col("value")).as("low"),
        first(col("close")).as("close"),
        count(lit(1)).as("n"))
  }

  val ohlcOracle: String =
    """WITH e AS (
      |  SELECT event_type, date_trunc('hour', ts) AS bar_start, ts, event_id, value,
      |    first_value(value) OVER (PARTITION BY event_type, date_trunc('hour', ts)
      |      ORDER BY ts, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS open,
      |    last_value(value) OVER (PARTITION BY event_type, date_trunc('hour', ts)
      |      ORDER BY ts, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS close
      |  FROM events
      |)
      |SELECT event_type, bar_start,
      |  min(open) AS open, max(value) AS high, min(value) AS low,
      |  min(close) AS close, count(*) AS n
      |FROM e GROUP BY event_type, bar_start""".stripMargin

  /** Time-weighted average: each event's value holds until the user's
    * next event; the mean weighted by holding duration — the correct
    * average for irregularly-sampled state. Values quantize to exact
    * 1e-6 integers and durations are integer microseconds, so the
    * weighted sum is an order-independent integer sum (< 2⁶³) divided
    * once at the end — bit-identical across engines. One window
    * shuffle on user_id. */
  def qTimeWeighted(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      .withColumn("__durMs",
        (unix_millis(lead(col("ts"), 1).over(w)) - unix_millis(col("ts"))))
      .filter(col("__durMs").isNotNull)
      .select(col("user_id"),
        (floor(col("value") * 1e6 + 0.5).cast("long") * col("__durMs")).as("__wv"),
        col("__durMs"))
      .groupBy(col("user_id"))
      .agg(
        round((sum(col("__wv")).cast("double") / 1e6) /
          sum(col("__durMs")).cast("double"), 6).as("twa_value"),
        sum(col("__durMs")).as("span_ms"),
        count(lit(1)).as("n_holds"))
  }

  /** Lag-1 autocorrelation of each type's hourly count series — the
    * burstiness/seasonality diagnostic for stream monitoring. The
    * series is the gap-filled hourly grid (zeros count: dropping empty
    * hours would bias the correlation), pairs come from one lag window
    * per type, and the Pearson correlation over integer count pairs is
    * computed from exact integer sums in one closed-form expression
    * (round 6). Series length is calendar-bounded, never row-bounded. */
  def qAutocorr(spark: SparkSession, dir: String): DataFrame = {
    val grid = OlapQueries.qGapFill(spark, dir) // (event_type, hour_start, cnt)
    val w = Window.partitionBy(col("event_type")).orderBy(col("hour_start"))
    val pairs = grid
      .withColumn("__prev", lag(col("cnt"), 1).over(w))
      .filter(col("__prev").isNotNull)
    pairs.groupBy(col("event_type"))
      .agg(count(lit(1)).as("__k"),
        sum(col("cnt")).as("__sx"), sum(col("__prev")).as("__sy"),
        sum(col("cnt") * col("cnt")).as("__sxx"),
        sum(col("__prev") * col("__prev")).as("__syy"),
        sum(col("cnt") * col("__prev")).as("__sxy"))
      .select(col("event_type"), col("__k").as("n_pairs"),
        round(
          (col("__k") * col("__sxy") - col("__sx") * col("__sy")).cast("double") /
            sqrt((col("__k") * col("__sxx") - col("__sx") * col("__sx")).cast("double")) /
            sqrt((col("__k") * col("__syy") - col("__sy") * col("__sy")).cast("double")),
          6).as("autocorr"))
  }

  val autocorrOracle: String =
    """WITH e AS (
      |  SELECT event_type, date_trunc('hour', ts) AS hour_start FROM events
      |), counts AS (
      |  SELECT event_type, hour_start, count(*) AS cnt FROM e GROUP BY 1, 2
      |), hours AS (
      |  SELECT unnest(generate_series(min(hour_start), max(hour_start),
      |    INTERVAL 1 HOUR)) AS hour_start FROM e
      |), grid AS (
      |  SELECT t.event_type, h.hour_start, coalesce(c.cnt, 0) AS cnt
      |  FROM hours h CROSS JOIN (SELECT DISTINCT event_type FROM e) t
      |  LEFT JOIN counts c ON c.event_type = t.event_type AND c.hour_start = h.hour_start
      |), p AS (
      |  SELECT event_type, cnt,
      |    lag(cnt) OVER (PARTITION BY event_type ORDER BY hour_start) AS prev
      |  FROM grid
      |), s AS (
      |  SELECT event_type, count(*)::BIGINT AS k,
      |    sum(cnt)::BIGINT AS sx, sum(prev)::BIGINT AS sy,
      |    sum(cnt * cnt)::BIGINT AS sxx, sum(prev * prev)::BIGINT AS syy,
      |    sum(cnt * prev)::BIGINT AS sxy
      |  FROM p WHERE prev IS NOT NULL GROUP BY event_type
      |)
      |SELECT event_type, k AS n_pairs,
      |  round((k * sxy - sx * sy)::DOUBLE
      |    / sqrt((k * sxx - sx * sx)::DOUBLE)
      |    / sqrt((k * syy - sy * sy)::DOUBLE), 6) AS autocorr
      |FROM s""".stripMargin

  /** Burst detection over the hourly grid: hours whose count exceeds
    * the type's mean + 3σ (population σ from exact integer sums) —
    * the paging-alert rule. The threshold is one closed-form double
    * per type (broadcast back over the calendar-bounded grid);
    * emitting the quantized threshold keeps the gate row informative
    * without a rounding-boundary risk on the flag itself (counts are
    * integers, thresholds are irrational — equality can't occur). */
  def qBurstDetect(spark: SparkSession, dir: String): DataFrame = {
    val grid = OlapQueries.qGapFill(spark, dir)
    val stats = grid.groupBy(col("event_type")).agg(
      count(lit(1)).as("__k"), sum(col("cnt")).as("__s"),
      sum(col("cnt") * col("cnt")).as("__ss"))
    val mean = col("__s").cast("double") / col("__k").cast("double")
    val variance = col("__ss").cast("double") / col("__k").cast("double") - mean * mean
    val thresh = mean + lit(3.0) * sqrt(variance)
    grid.join(broadcast(stats.select(col("event_type"), thresh.as("__t"))),
        Seq("event_type"))
      .filter(col("cnt").cast("double") > col("__t"))
      .select(col("event_type"), col("hour_start"), col("cnt"),
        round(col("__t"), 6).as("threshold"))
  }

  val burstDetectOracle: String =
    """WITH e AS (
      |  SELECT event_type, date_trunc('hour', ts) AS hour_start FROM events
      |), counts AS (
      |  SELECT event_type, hour_start, count(*) AS cnt FROM e GROUP BY 1, 2
      |), hours AS (
      |  SELECT unnest(generate_series(min(hour_start), max(hour_start),
      |    INTERVAL 1 HOUR)) AS hour_start FROM e
      |), grid AS (
      |  SELECT t.event_type, h.hour_start, coalesce(c.cnt, 0) AS cnt
      |  FROM hours h CROSS JOIN (SELECT DISTINCT event_type FROM e) t
      |  LEFT JOIN counts c ON c.event_type = t.event_type AND c.hour_start = h.hour_start
      |), s AS (
      |  SELECT event_type, count(*)::BIGINT AS k, sum(cnt)::BIGINT AS sx,
      |    sum(cnt * cnt)::BIGINT AS sxx
      |  FROM grid GROUP BY event_type
      |), t AS (
      |  SELECT event_type,
      |    sx::DOUBLE / k::DOUBLE
      |      + 3.0::DOUBLE * sqrt(sxx::DOUBLE / k::DOUBLE
      |          - (sx::DOUBLE / k::DOUBLE) * (sx::DOUBLE / k::DOUBLE)) AS th
      |  FROM s
      |)
      |SELECT g.event_type, g.hour_start, g.cnt, round(t.th, 6) AS threshold
      |FROM grid g JOIN t ON g.event_type = t.event_type
      |WHERE g.cnt::DOUBLE > t.th""".stripMargin

  /** Exponentially-weighted moving average of each user's value
    * stream (α = 0.1): the stateful smoothing every metrics pipeline
    * runs, folded in deterministic (ts, event_id) order. A recurrence
    * can't be a window expression, so each user's ordered values
    * collect once (bounded by per-user activity, never corpus-sized)
    * and fold in a per-row Scala kernel — the identical left fold the
    * oracle states with list_reduce, so doubles match bit-for-bit
    * before the final rounding. */
  def qEwma(spark: SparkSession, dir: String): DataFrame = {
    val lists = Tables.events(spark, dir)
      .groupBy(col("user_id"))
      .agg(array_sort(collect_list(struct(col("ts"), col("event_id"), col("value"))))
        .as("__seq"))
    val enc = org.apache.spark.sql.Encoders.row(
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("user_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("ewma",
          org.apache.spark.sql.types.DoubleType),
        org.apache.spark.sql.types.StructField("n",
          org.apache.spark.sql.types.LongType))))
    lists.mapPartitions { rows =>
      rows.map { r =>
        val uid = r.getLong(0)
        val seq = r.getSeq[org.apache.spark.sql.Row](1)
        var acc = seq.head.getDouble(2)
        var i = 1
        while (i < seq.length) { acc = acc * 0.9 + seq(i).getDouble(2) * 0.1; i += 1 }
        org.apache.spark.sql.Row(uid,
          math.floor(acc * 1e6 + 0.5) / 1e6, seq.length.toLong)
      }
    }(enc)
  }

  val ewmaOracle: String =
    """WITH s AS (
      |  SELECT user_id, list(value ORDER BY ts, event_id) AS vs
      |  FROM events GROUP BY user_id
      |)
      |SELECT user_id,
      |  floor(list_reduce(vs, (acc, x) -> acc * 0.9::DOUBLE + x * 0.1::DOUBLE) * 1e6
      |    + 0.5) / 1e6 AS ewma,
      |  len(vs)::BIGINT AS n
      |FROM s""".stripMargin

  /** Conversion latency: first click → first subsequent purchase per
    * user, summarized as converted-user count + exact p50/p90 of the
    * latency in integer milliseconds. Two keyed aggs co-partitioned on
    * user_id, then a 1-row percentile collapse — the funnel-timing
    * report next to [[CoreQueries.qFunnel]]'s stage counts. */
  def qFunnelLatency(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    val clicks = e.filter(col("event_type") === "click")
      .groupBy(col("user_id")).agg(min(col("ts")).as("__tc"))
    val lat = e.filter(col("event_type") === "purchase")
      .join(clicks, Seq("user_id"))
      .filter(col("ts") > col("__tc"))
      .groupBy(col("user_id"))
      .agg((unix_millis(min(col("ts"))) - unix_millis(first(col("__tc")))).as("__latMs"))
    lat.agg(
      count(lit(1)).as("n_converted"),
      round(percentile(col("__latMs"), lit(0.5)) / 1000.0, 6).as("p50_s"),
      round(percentile(col("__latMs"), lit(0.9)) / 1000.0, 6).as("p90_s"))
  }

  val funnelLatencyOracle: String =
    """WITH c AS (
      |  SELECT user_id, min(ts) AS tc FROM events WHERE event_type = 'click'
      |  GROUP BY user_id
      |), l AS (
      |  SELECT e.user_id, epoch_ms(min(e.ts)) - epoch_ms(min(c.tc)) AS lat_ms
      |  FROM events e JOIN c ON e.user_id = c.user_id
      |  WHERE e.event_type = 'purchase' AND e.ts > c.tc
      |  GROUP BY e.user_id
      |)
      |SELECT count(*) AS n_converted,
      |  round(quantile_cont(lat_ms, 0.5) / 1000.0, 6) AS p50_s,
      |  round(quantile_cont(lat_ms, 0.9) / 1000.0, 6) AS p90_s
      |FROM l""".stripMargin

  val timeWeightedOracle: String =
    """WITH s AS (
      |  SELECT user_id, value,
      |    epoch_ms(lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
      |      - epoch_ms(ts) AS dur
      |  FROM events
      |)
      |SELECT user_id,
      |  round((sum(floor(value * 1e6 + 0.5)::BIGINT * dur)::DOUBLE / 1e6)
      |        / sum(dur)::DOUBLE, 6) AS twa_value,
      |  sum(dur)::BIGINT AS span_ms,
      |  count(*) AS n_holds
      |FROM s WHERE dur IS NOT NULL GROUP BY user_id""".stripMargin
}
