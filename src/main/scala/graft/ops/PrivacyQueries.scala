package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Privacy-preserving release operators: the aggregate-publication
  * steps a data pipeline runs before numbers leave the trust boundary.
  * Both are deterministic-by-construction (seeded noise, pure
  * suppression rules) so they sit under the DuckDB hash oracle like
  * every exact operator.
  *
  * Scale notes: both operate on ALREADY-AGGREGATED frames (|groups|
  * rows) — the only corpus-sized work is the keyed count with
  * map-side combine.
  */
object PrivacyQueries {

  private val Epsilon = 0.5 // Laplace scale b = sensitivity/ε = 2.0

  /** ε-differentially-private count release (Laplace mechanism,
    * sensitivity 1): per-type event counts plus Laplace(1/ε) noise
    * drawn from a DETERMINISTIC uniform seeded by the group key's
    * portable hash — the reproducible-release variant (same seed ⇒
    * same publication; the privacy argument treats the seed as the
    * mechanism's randomness). Inverse-CDF transform in plain
    * arithmetic, identical in both engines; ln rounded at 6 digits
    * absorbs libm ULP differences. */
  def qDpCount(spark: SparkSession, dir: String): DataFrame = {
    val counts = Tables.events(spark, dir)
      .groupBy(col("event_type")).agg(count(lit(1)).as("true_cnt"))
    // u ∈ (0,1): 31-bit LCG step on the key hash, never exactly 0/1
    val u = (pmod(graft.functions.VecMath.poly_hash(col("event_type")) * 1103515245L
      + 12345L, lit(2147483647L)).cast("double") + 0.5) / 2147483648.0
    val b = lit(1.0 / Epsilon)
    val centered = u - 0.5
    val noise = when(centered < 0.0, b * log(lit(1.0) + centered * 2.0))
      .otherwise(-b * log(lit(1.0) - centered * 2.0))
    counts.select(col("event_type"), col("true_cnt"),
      round(col("true_cnt").cast("double") + noise, 6).as("dp_cnt"))
  }

  val dpCountOracle: String =
    """WITH c AS (
      |  SELECT event_type, count(*) AS true_cnt,
      |    ((((list_sum(list_transform(string_split(event_type, ''), (ch, i) -> i * ascii(ch)))
      |        * 48271) % 2147483647) * 1103515245 + 12345) % 2147483647)::DOUBLE AS h
      |  FROM events GROUP BY event_type
      |)
      |SELECT event_type, true_cnt,
      |  round(true_cnt::DOUBLE + (CASE
      |    WHEN ((h + 0.5) / 2147483648.0 - 0.5) < 0.0
      |    THEN 2.0::DOUBLE * ln(1.0::DOUBLE + ((h + 0.5) / 2147483648.0 - 0.5) * 2.0)
      |    ELSE -2.0::DOUBLE * ln(1.0::DOUBLE - ((h + 0.5) / 2147483648.0 - 0.5) * 2.0)
      |    END), 6) AS dp_cnt
      |FROM c""".stripMargin

  private val KAnon = 25L

  /** k-anonymity suppression: (event_type × user-cohort) cells with
    * fewer than k members collapse into a per-type `__other__` bucket
    * instead of being published — the release rule that stops
    * small-group re-identification. Output cells all satisfy
    * cnt ≥ k OR carry the suppressed marker with the pooled
    * remainder. */
  def qKAnon(spark: SparkSession, dir: String): DataFrame = {
    val cells = Tables.events(spark, dir)
      .groupBy(col("event_type"), pmod(col("user_id"), lit(16L)).as("cohort"))
      .agg(count(lit(1)).as("cnt"))
    val kept = cells.filter(col("cnt") >= KAnon)
      .select(col("event_type"), col("cohort").cast("string").as("cohort"), col("cnt"))
    val pooled = cells.filter(col("cnt") < KAnon)
      .groupBy(col("event_type"))
      .agg(sum(col("cnt")).as("cnt"))
      .select(col("event_type"), lit("__other__").as("cohort"), col("cnt"))
    kept.unionByName(pooled)
  }

  val kAnonOracle: String =
    s"""WITH cells AS (
       |  SELECT event_type, user_id % 16 AS cohort, count(*) AS cnt
       |  FROM events GROUP BY 1, 2
       |)
       |SELECT event_type, cohort::VARCHAR AS cohort, cnt FROM cells WHERE cnt >= $KAnon
       |UNION ALL
       |SELECT event_type, '__other__' AS cohort, sum(cnt)::BIGINT AS cnt
       |FROM cells WHERE cnt < $KAnon GROUP BY event_type""".stripMargin
}
