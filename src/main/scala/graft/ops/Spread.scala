package graft.ops

import org.apache.spark.sql.DataFrame

/** Conditional widening for CPU-bound per-partition kernels.
  *
  * A narrow input (one small parquet split at test scale) starves a
  * CPU-bound `mapPartitions` kernel; but an unconditional
  * `repartition(defaultParallelism)` at the 100 TB design point is a
  * full corpus-sized exchange AND caps parallelism at one machine's
  * core count. So: repartition only when the input has materially
  * fewer partitions than the cluster has slots — a wide input runs
  * where it already lives, shuffle-free.
  */
object Spread {

  /** `df`, repartitioned to `defaultParallelism` only when it has
    * fewer than half that many partitions; otherwise unchanged. */
  def widen(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    val have = df.rdd.getNumPartitions
    if (have * 2 < target) df.repartition(target) else df
  }
}
