package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** The classic OLAP shapes (TPC-H Q1/Q3/Q6 silhouettes) plus calendar
  * gap-fill and ordered path concatenation — the reporting layer a
  * stream-fed warehouse runs downstream of the connector (SURVEY.md
  * §2.B: the reference delegates ALL relational work to stock Spark).
  *
  * Money arithmetic: 2-decimal prices/discounts/taxes are lifted to
  * exact integer cents (floor(x·100+0.5)) BEFORE multiplying/summing,
  * so every aggregate is an order-independent integer sum (< 2⁵³) —
  * bit-identical across engines, partitionings, and cluster sizes —
  * and only divided back to dollars at the very end. Plain double
  * sums of price products would drift in the last bits under Spark's
  * nondeterministic partial-agg merge order at multi-split scale.
  */
object OlapQueries {

  private def cents(c: Column): Column = floor(c * 100.0 + 0.5).cast("long")

  /** TPC-H Q1 pricing summary: one scan → one hash agg on the two
    * low-cardinality flags; the shipdate predicate pushes to parquet. */
  def qPricingSummary(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") <= lit("2001-09-01").cast("timestamp"))
      .select(col("l_returnflag"), col("l_linestatus"), col("l_quantity"),
        cents(col("l_extendedprice")).as("__pc"),
        cents(col("l_discount")).as("__d"),
        cents(col("l_tax")).as("__t"))
    l.groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity")).as("sum_qty"),
        (sum(col("__pc")).cast("double") / 100.0).as("sum_base_price"),
        (sum(col("__pc") * (lit(100L) - col("__d"))).cast("double") / 10000.0)
          .as("sum_disc_price"),
        (sum(col("__pc") * (lit(100L) - col("__d")) * (lit(100L) + col("__t")))
          .cast("double") / 1000000.0).as("sum_charge"),
        (sum(col("l_quantity")) / count(lit(1)).cast("double")).as("avg_qty"),
        (sum(col("__pc")).cast("double") / 100.0 / count(lit(1)).cast("double"))
          .as("avg_price"),
        (sum(col("__d")).cast("double") / 100.0 / count(lit(1)).cast("double"))
          .as("avg_disc"),
        count(lit(1)).as("count_order"))
  }

  val pricingSummaryOracle: String =
    """WITH l AS (
      |  SELECT l_returnflag, l_linestatus, l_quantity,
      |    floor(l_extendedprice * 100.0 + 0.5)::BIGINT AS pc,
      |    floor(l_discount * 100.0 + 0.5)::BIGINT AS d,
      |    floor(l_tax * 100.0 + 0.5)::BIGINT AS t
      |  FROM lineitem WHERE l_shipdate <= TIMESTAMP '2001-09-01'
      |)
      |SELECT l_returnflag, l_linestatus,
      |  sum(l_quantity) AS sum_qty,
      |  sum(pc)::DOUBLE / 100.0 AS sum_base_price,
      |  sum(pc * (100 - d))::DOUBLE / 10000.0 AS sum_disc_price,
      |  sum(pc * (100 - d) * (100 + t))::DOUBLE / 1000000.0 AS sum_charge,
      |  sum(l_quantity) / count(*)::DOUBLE AS avg_qty,
      |  sum(pc)::DOUBLE / 100.0 / count(*)::DOUBLE AS avg_price,
      |  sum(d)::DOUBLE / 100.0 / count(*)::DOUBLE AS avg_disc,
      |  count(*) AS count_order
      |FROM l GROUP BY l_returnflag, l_linestatus""".stripMargin

  /** TPC-H Q3 shipping priority: segment-filtered customers (broadcast
    * semi-join — the fact side never shuffles for the filter), orders ⋈
    * lineitem on the order key, revenue agg per order, distributed
    * top-10 via TakeOrderedAndProject (no global sort). */
  def qTopOrders(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
      .filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey"))
    val o = Tables.orders(spark, dir)
      .filter(col("o_orderdate") < lit("1999-01-01").cast("timestamp"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"), "left_semi")
      .select(col("o_orderkey"), col("o_orderdate"))
    val l = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") > lit("1999-01-01").cast("timestamp"))
      .select(col("l_orderkey"),
        (cents(col("l_extendedprice")) * (lit(100L) - cents(col("l_discount"))))
          .as("__rev"))
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"))
      .agg((sum(col("__rev")).cast("double") / 10000.0).as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey").asc)
      .limit(10)
  }

  val topOrdersOracle: String =
    """SELECT l.l_orderkey, o.o_orderdate,
      |  sum(floor(l.l_extendedprice * 100.0 + 0.5)::BIGINT
      |      * (100 - floor(l.l_discount * 100.0 + 0.5)::BIGINT))::DOUBLE / 10000.0
      |    AS revenue
      |FROM lineitem l
      |JOIN orders o ON l.l_orderkey = o.o_orderkey
      |WHERE o.o_orderdate < TIMESTAMP '1999-01-01'
      |  AND l.l_shipdate > TIMESTAMP '1999-01-01'
      |  AND o.o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
      |GROUP BY l.l_orderkey, o.o_orderdate
      |ORDER BY revenue DESC, l.l_orderkey ASC
      |LIMIT 10""".stripMargin

  /** TPC-H Q6 revenue forecast: pure scan-filter-sum; every predicate
    * pushes to the parquet reader, the agg is a 1-row partial+final. */
  def qRevenueForecast(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp") &&
        col("l_discount") >= 0.02 && col("l_discount") <= 0.06 &&
        col("l_quantity") < 24.0)
      .select(cents(col("l_extendedprice")).as("__pc"), cents(col("l_discount")).as("__d"))
      .agg(
        (sum(col("__pc") * col("__d")).cast("double") / 10000.0).as("revenue"),
        count(lit(1)).as("n_items"))

  val revenueForecastOracle: String =
    """SELECT
      |  sum(floor(l_extendedprice * 100.0 + 0.5)::BIGINT
      |      * floor(l_discount * 100.0 + 0.5)::BIGINT)::DOUBLE / 10000.0 AS revenue,
      |  count(*) AS n_items
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
      |  AND l_discount >= 0.02::DOUBLE AND l_discount <= 0.06::DOUBLE
      |  AND l_quantity < 24.0::DOUBLE""".stripMargin

  /** Calendar gap-fill: the dense (event_type × hour) grid over the
    * observed time span, missing cells zero-filled — what dashboards
    * need before charting a sparse stream. The hour spine and the type
    * dimension are tiny generated frames (broadcast); the only big-side
    * work is the original grouped count. */
  def qGapFill(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
      .select(col("event_type"), date_trunc("hour", col("ts")).as("hour_start"))
    val counts = e.groupBy(col("event_type"), col("hour_start"))
      .agg(count(lit(1)).as("cnt"))
    val span = e.agg(min(col("hour_start")).as("lo"), max(col("hour_start")).as("hi"))
    val hours = span.select(
      explode(sequence(col("lo"), col("hi"), expr("INTERVAL 1 HOUR"))).as("hour_start"))
    val types = e.select(col("event_type")).distinct()
    broadcast(hours).crossJoin(broadcast(types))
      .join(counts, Seq("event_type", "hour_start"), "left")
      .select(col("event_type"), col("hour_start"),
        coalesce(col("cnt"), lit(0L)).as("cnt"))
  }

  val gapFillOracle: String =
    """WITH e AS (
      |  SELECT event_type, date_trunc('hour', ts) AS hour_start FROM events
      |), counts AS (
      |  SELECT event_type, hour_start, count(*) AS cnt FROM e GROUP BY 1, 2
      |), hours AS (
      |  SELECT unnest(generate_series(min(hour_start), max(hour_start),
      |    INTERVAL 1 HOUR)) AS hour_start FROM e
      |), types AS (SELECT DISTINCT event_type FROM e)
      |SELECT t.event_type, h.hour_start, coalesce(c.cnt, 0) AS cnt
      |FROM hours h CROSS JOIN types t
      |LEFT JOIN counts c ON c.event_type = t.event_type AND c.hour_start = h.hour_start""".stripMargin

  /** Ordered path concatenation: each user's full event-type journey as
    * one delimited string (deterministic (ts, event_id) order inside
    * the collect) — the sequence-mining input format. One shuffle on
    * user_id; paths are bounded by per-user activity, not corpus size. */
  def qUserPaths(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("user_id"))
      .agg(
        array_join(
          transform(
            array_sort(collect_list(struct(col("ts"), col("event_id"), col("event_type")))),
            x => x.getField("event_type")),
          ">").as("path"),
        count(lit(1)).as("n_events"))

  val userPathsOracle: String =
    """SELECT user_id,
      |  string_agg(event_type, '>' ORDER BY ts, event_id) AS path,
      |  count(*) AS n_events
      |FROM events GROUP BY user_id""".stripMargin

  /** 2-D Pareto skyline: orders not dominated on
    * (o_orderdate later, o_totalprice higher). An order is dominated
    * iff a strictly-later date carries an equal-or-higher max price,
    * or its own date's max price strictly exceeds it — so the frontier
    * falls out of ONE running-max window over the per-date maxima
    * (|dates| rows), never the O(n²) pairwise dominance check. The
    * raw table only does a per-date max agg and a semi-join back. */
  def qSkyline(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_orderdate"), col("o_totalprice"))
    val perDate = o.groupBy(col("o_orderdate"))
      .agg(max(col("o_totalprice")).as("__maxp"))
    val w = Window.orderBy(col("o_orderdate").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    // running max over STRICTLY LATER dates (per-date maxima are unique
    // per date, so date ties cannot corrupt the frame)
    val frontierDates = perDate
      .withColumn("__later", max(col("__maxp")).over(w))
      .filter(col("__later").isNull || col("__maxp") > col("__later"))
      .select(col("o_orderdate"), col("__maxp"))
    o.join(broadcast(frontierDates), Seq("o_orderdate"))
      .filter(col("o_totalprice") === col("__maxp"))
      .select(col("o_orderkey"), col("o_orderdate"), col("o_totalprice"))
  }

  val skylineOracle: String =
    """WITH pd AS (
      |  SELECT o_orderdate, max(o_totalprice) AS maxp FROM orders GROUP BY o_orderdate
      |), f AS (
      |  SELECT o_orderdate, maxp,
      |    max(maxp) OVER (ORDER BY o_orderdate DESC
      |                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS later
      |  FROM pd
      |)
      |SELECT o.o_orderkey, o.o_orderdate, o.o_totalprice
      |FROM orders o JOIN f ON o.o_orderdate = f.o_orderdate
      |WHERE (f.later IS NULL OR f.maxp > f.later) AND o.o_totalprice = f.maxp""".stripMargin

  /** Two-sample A/B comparison: users split by id parity, Welch
    * t-statistic on `value`. Moments come from exact 1e-3-quantized
    * integer sums (Σx_q, Σx_q² < 2⁶³ at any SF), so the statistic is
    * a pure function of order-independent integers — bit-identical
    * across engines — computed in one scan + one 2-row agg. */
  def qAbTest(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
      .select(pmod(col("user_id"), lit(2)).as("arm"),
        floor(col("value") * 1000.0 + 0.5).cast("long").as("__xq"))
    val m = e.groupBy(col("arm")).agg(
      count(lit(1)).as("n"),
      sum(col("__xq")).as("__s"),
      sum(col("__xq") * col("__xq")).as("__ss"))
    def stats(arm: Int, p: String): DataFrame =
      m.filter(col("arm") === arm).select(
        col("n").as(s"n_$p"), col("__s").as(s"__s_$p"), col("__ss").as(s"__ss_$p"))
    val j = stats(0, "a").crossJoin(stats(1, "b"))
    def mean(p: String) = col(s"__s_$p").cast("double") / 1000.0 / col(s"n_$p").cast("double")
    def varS(p: String) = {
      val n = col(s"n_$p").cast("double")
      (col(s"__ss_$p").cast("double") / 1e6 -
        (col(s"__s_$p").cast("double") / 1000.0) * (col(s"__s_$p").cast("double") / 1000.0) / n) /
        (n - 1.0)
    }
    j.select(
      col("n_a"), col("n_b"),
      round(mean("a"), 6).as("mean_a"),
      round(mean("b"), 6).as("mean_b"),
      round((mean("a") - mean("b")) /
        sqrt(varS("a") / col("n_a").cast("double") +
          varS("b") / col("n_b").cast("double")), 6).as("t_stat"))
  }

  /** TPC-H Q5 silhouette — the 6-table join: revenue by nation for
    * intra-region trade (customer and supplier in the SAME nation,
    * nation in ASIA, orders in 1997). The fact chain
    * lineitem ⋈ orders shuffles once on the order key; every
    * dimension (customer, supplier, nation⋈region) broadcasts; the
    * co-nationality predicate is an equi-condition inside the join
    * tree, so Catalyst keeps the whole thing hash joins — no
    * cartesian anywhere. Revenue in exact integer micros. */
  def qRegionalVolume(spark: SparkSession, dir: String): DataFrame = {
    val asiaNations = Tables.nation(spark, dir)
      .join(Tables.region(spark, dir).filter(col("r_name") === "ASIA"),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"), col("n_name"))
    val c = Tables.customer(spark, dir)
      .join(broadcast(asiaNations), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("c_nationkey"), col("n_name"))
    val s = Tables.supplier(spark, dir)
      .select(col("s_suppkey"), col("s_nationkey"))
    val o = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      .select(col("o_orderkey"), col("o_custkey"))
    val l = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_suppkey"),
        (cents(col("l_extendedprice")) * (lit(100L) - cents(col("l_discount"))))
          .as("__rev"))
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .join(broadcast(s), col("l_suppkey") === col("s_suppkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .groupBy(col("n_name"))
      .agg((sum(col("__rev")).cast("double") / 10000.0).as("revenue"),
        count(lit(1)).as("n_items"))
  }

  val regionalVolumeOracle: String =
    """SELECT n_name,
      |  sum(floor(l_extendedprice * 100.0 + 0.5)::BIGINT
      |      * (100 - floor(l_discount * 100.0 + 0.5)::BIGINT))::DOUBLE / 10000.0
      |    AS revenue,
      |  count(*) AS n_items
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1997-01-01'
      |  AND o_orderdate < TIMESTAMP '1998-01-01'
      |GROUP BY n_name""".stripMargin

  /** RFM segmentation: per-customer recency (days since last order,
    * vs the corpus max date), frequency (order count), monetary (exact
    * cents), each cut into quartiles against BROADCAST percentile
    * thresholds — never an ntile window over the customer population
    * (that would be a data-sized unpartitioned sort at scale). Segment
    * string r-f-m with 1 = best quartile. */
  def qRfm(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderdate"), cents(col("o_totalprice")).as("__pc"))
    val refDate = o.agg(max(col("o_orderdate")).as("__ref"))
    val percust = o.crossJoin(broadcast(refDate))
      .groupBy(col("o_custkey"))
      .agg(
        min(datediff(col("__ref"), col("o_orderdate"))).cast("long").as("recency_days"),
        count(lit(1)).as("frequency"),
        sum(col("__pc")).as("__mc"))
    val th = percust.agg(
      percentile(col("recency_days"), lit(0.25)).as("r25"),
      percentile(col("recency_days"), lit(0.5)).as("r50"),
      percentile(col("recency_days"), lit(0.75)).as("r75"),
      percentile(col("frequency"), lit(0.25)).as("f25"),
      percentile(col("frequency"), lit(0.5)).as("f50"),
      percentile(col("frequency"), lit(0.75)).as("f75"),
      percentile(col("__mc"), lit(0.25)).as("m25"),
      percentile(col("__mc"), lit(0.5)).as("m50"),
      percentile(col("__mc"), lit(0.75)).as("m75"))
    def quartile(v: org.apache.spark.sql.Column, p25: String, p50: String, p75: String,
        lowIsGood: Boolean) = {
      val q = lit(1L) + (v > col(p25)).cast("long") + (v > col(p50)).cast("long") +
        (v > col(p75)).cast("long")
      if (lowIsGood) q else lit(5L) - q
    }
    percust.crossJoin(broadcast(th))
      .select(col("o_custkey"), col("recency_days"), col("frequency"),
        (col("__mc").cast("double") / 100.0).as("monetary"),
        concat_ws("-",
          quartile(col("recency_days").cast("double"), "r25", "r50", "r75", lowIsGood = true),
          quartile(col("frequency").cast("double"), "f25", "f50", "f75", lowIsGood = false),
          quartile(col("__mc").cast("double"), "m25", "m50", "m75", lowIsGood = false))
          .as("rfm_segment"))
  }

  val rfmOracle: String =
    """WITH o AS (
      |  SELECT o_custkey, o_orderdate,
      |    floor(o_totalprice * 100.0 + 0.5)::BIGINT AS pc
      |  FROM orders
      |), ref AS (SELECT max(o_orderdate) AS r FROM o),
      |pc AS (
      |  SELECT o_custkey,
      |    min(datediff('day', o_orderdate, ref.r))::BIGINT AS recency_days,
      |    count(*) AS frequency, sum(pc)::BIGINT AS mc
      |  FROM o CROSS JOIN ref GROUP BY o_custkey, ref.r
      |), th AS (
      |  SELECT quantile_cont(recency_days, 0.25) AS r25, quantile_cont(recency_days, 0.5) AS r50,
      |    quantile_cont(recency_days, 0.75) AS r75,
      |    quantile_cont(frequency, 0.25) AS f25, quantile_cont(frequency, 0.5) AS f50,
      |    quantile_cont(frequency, 0.75) AS f75,
      |    quantile_cont(mc, 0.25) AS m25, quantile_cont(mc, 0.5) AS m50,
      |    quantile_cont(mc, 0.75) AS m75
      |  FROM pc
      |)
      |SELECT o_custkey, recency_days, frequency, mc::DOUBLE / 100.0 AS monetary,
      |  (1 + (recency_days::DOUBLE > r25)::INT + (recency_days::DOUBLE > r50)::INT
      |     + (recency_days::DOUBLE > r75)::INT)::BIGINT
      |  || '-' ||
      |  (5 - (1 + (frequency::DOUBLE > f25)::INT + (frequency::DOUBLE > f50)::INT
      |     + (frequency::DOUBLE > f75)::INT))::BIGINT
      |  || '-' ||
      |  (5 - (1 + (mc::DOUBLE > m25)::INT + (mc::DOUBLE > m50)::INT
      |     + (mc::DOUBLE > m75)::INT))::BIGINT AS rfm_segment
      |FROM pc CROSS JOIN th""".stripMargin

  /** Market-basket pair mining: support and lift of part pairs
    * co-occurring in an order, top-20 by lift. Pair expansion is a
    * per-order self-join on the DISTINCT item set (items/order is a
    * small constant, so pairs ∝ orders, never |parts|²); lift is exact
    * integer-count arithmetic; the cut is a TakeOrderedAndProject with
    * full deterministic tiebreak. */
  def qBasket(spark: SparkSession, dir: String): DataFrame = {
    // One exchange on l_orderkey builds the per-order DISTINCT item
    // set (collect_set dedups, so no separate .distinct() exchange),
    // and the localCheckpoint materializes it ONCE — the old
    // formulation recomputed the items-distinct subtree four times
    // (self-join x/y sides + both itemCnt joins) because mapless
    // repeated subtrees don't exchange-reuse across aliases. Pairs are
    // generated group-locally from the sorted set (items/order is a
    // small constant, so pairs ∝ orders — same bound as the old
    // self-join), and per-part counts come from exploding the same
    // checkpointed sets.
    // cast enforces the row accessor's long assumption in the plan
    // (ADVICE r18): an int32 partkey fixture would otherwise CCE in
    // the mapPartitions getSeq[Long] at runtime
    val sets = Tables.lineitem(spark, dir)
      .groupBy(col("l_orderkey"))
      .agg(collect_set(col("l_partkey").cast("long")).as("__ps"))
      .select(col("__ps"))
      .localCheckpoint(true)
    val nOrders = Tables.orders(spark, dir).agg(count(lit(1)).as("__n"))
    val itemCnt = sets.select(explode(col("__ps")).as("l_partkey"))
      .groupBy(col("l_partkey")).agg(count(lit(1)).as("__ci"))
    val pairEnc = Encoders.row(StructType(Seq(
      StructField("part_a", LongType), StructField("part_b", LongType))))
    val pairRows = sets.mapPartitions { rows =>
      rows.flatMap { r =>
        val ps = r.getSeq[Long](0).toArray
        java.util.Arrays.sort(ps)
        for {
          i <- ps.indices.iterator
          j <- Iterator.range(i + 1, ps.length)
        } yield Row(ps(i), ps(j))
      }
    }(pairEnc)
    val pairs = pairRows
      .groupBy(col("part_a"), col("part_b"))
      .agg(count(lit(1)).as("pair_cnt"))
      .filter(col("pair_cnt") >= 3L)
    pairs
      .join(itemCnt.select(col("l_partkey").as("part_a"), col("__ci").as("__ca")), Seq("part_a"))
      .join(itemCnt.select(col("l_partkey").as("part_b"), col("__ci").as("__cb")), Seq("part_b"))
      .crossJoin(broadcast(nOrders))
      .select(col("part_a"), col("part_b"), col("pair_cnt"),
        (col("pair_cnt").cast("double") * col("__n").cast("double") /
          (col("__ca").cast("double") * col("__cb").cast("double"))).as("lift"))
      .orderBy(col("lift").desc, col("part_a").asc, col("part_b").asc)
      .limit(20)
  }

  val basketOracle: String =
    """WITH items AS (
      |  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
      |), n AS (SELECT count(*)::BIGINT AS n FROM orders),
      |ic AS (SELECT l_partkey, count(*) AS ci FROM items GROUP BY l_partkey),
      |p AS (
      |  SELECT x.l_partkey AS part_a, y.l_partkey AS part_b, count(*) AS pair_cnt
      |  FROM items x JOIN items y
      |    ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey
      |  GROUP BY 1, 2 HAVING count(*) >= 3
      |)
      |SELECT part_a, part_b, pair_cnt,
      |  pair_cnt::DOUBLE * n.n::DOUBLE / (ca.ci::DOUBLE * cb.ci::DOUBLE) AS lift
      |FROM p JOIN ic ca ON p.part_a = ca.l_partkey
      |       JOIN ic cb ON p.part_b = cb.l_partkey
      |       CROSS JOIN n
      |ORDER BY lift DESC, part_a ASC, part_b ASC
      |LIMIT 20""".stripMargin

  val abTestOracle: String =
    """WITH q AS (
      |  SELECT user_id % 2 AS arm, floor(value * 1000.0 + 0.5)::BIGINT AS xq FROM events
      |), m AS (
      |  SELECT arm, count(*) AS n, sum(xq)::BIGINT AS s, sum(xq * xq)::BIGINT AS ss
      |  FROM q GROUP BY arm
      |), a AS (SELECT n AS n_a, s AS s_a, ss AS ss_a FROM m WHERE arm = 0),
      |b AS (SELECT n AS n_b, s AS s_b, ss AS ss_b FROM m WHERE arm = 1)
      |SELECT n_a, n_b,
      |  round(s_a::DOUBLE / 1000.0 / n_a::DOUBLE, 6) AS mean_a,
      |  round(s_b::DOUBLE / 1000.0 / n_b::DOUBLE, 6) AS mean_b,
      |  round((s_a::DOUBLE / 1000.0 / n_a::DOUBLE - s_b::DOUBLE / 1000.0 / n_b::DOUBLE)
      |    / sqrt(
      |      ((ss_a::DOUBLE / 1e6 - (s_a::DOUBLE / 1000.0) * (s_a::DOUBLE / 1000.0) / n_a::DOUBLE)
      |        / (n_a::DOUBLE - 1.0)) / n_a::DOUBLE
      |      + ((ss_b::DOUBLE / 1e6 - (s_b::DOUBLE / 1000.0) * (s_b::DOUBLE / 1000.0) / n_b::DOUBLE)
      |        / (n_b::DOUBLE - 1.0)) / n_b::DOUBLE), 6) AS t_stat
      |FROM a CROSS JOIN b""".stripMargin
}
