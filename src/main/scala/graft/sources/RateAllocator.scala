package graft.sources

/** Admission control: lag-proportional allocation of a per-trigger record
  * budget across partitions, with an optional static per-partition cap and
  * a floor of 1 record per partition.
  *
  * Reference semantics (re-implemented, not translated):
  * dis/DirectDISInputDStream.scala:129-161 — effective rate × batch
  * duration split proportionally to each partition's lag, capped by
  * `spark.streaming.dis.maxRatePerPartition`
  * (dis/PerPartitionConfig.scala:41-46), floored at 1 message
  * (line 156 — note: with more partitions than budget the floors can
  * exceed the global budget; that quirk is preserved and documented).
  * `clamp` is dis/DirectDISInputDStream.scala:223-232.
  */
object RateAllocator {

  /** Max records to admit per partition this trigger.
    *
    * @param lags              current lag (latest - committed) per partition
    * @param totalLimit        global per-trigger budget (e.g. maxRecordsPerTrigger)
    * @param perPartitionLimit static cap per partition (maxRatePerPartition × trigger)
    * @param partitionOverrides per-(stream,partition) cap taking precedence
    *   over the uniform cap — the PerPartitionConfig extension point
    *   (dis/PerPartitionConfig.scala:30-46, an overridable
    *   maxRatePerPartition(partition)); here a data-driven map so the
    *   policy travels to any cluster as plain options
    */
  def allocate(
      lags: Map[(String, Int), Long],
      totalLimit: Option[Long],
      perPartitionLimit: Option[Long],
      partitionOverrides: Map[(String, Int), Long] = Map.empty): Map[(String, Int), Long] = {
    val totalLag = math.max(lags.values.sum, 0L)
    lags.map { case (tp, lag) =>
      val proportional: Long = totalLimit match {
        case Some(budget) if totalLag > 0 =>
          // floor-div is fine: floors then the max(1) below keeps progress
          (budget.toDouble * lag / totalLag).toLong
        case Some(_) => 0L
        case None    => Long.MaxValue
      }
      val capped = partitionOverrides.get(tp).orElse(perPartitionLimit) match {
        case Some(cap) => math.min(proportional, cap)
        case None      => proportional
      }
      tp -> math.max(capped, 1L)
    }
  }

  /** End offsets for this trigger: advance each partition by its
    * allocation but never past `latest`. */
  def clamp(
      current: Map[(String, Int), Long],
      latest: Map[(String, Int), Long],
      allocation: Map[(String, Int), Long]): Map[(String, Int), Long] =
    latest.map { case (tp, lat) =>
      val cur = current.getOrElse(tp, lat)
      allocation.get(tp) match {
        // n can be Long.MaxValue (unbounded): compare against the
        // remaining lag instead of computing cur + n, which overflows
        case Some(n) if n < math.max(lat - cur, 0L) => tp -> math.max(cur, cur + n)
        case _                                      => tp -> math.max(cur, lat)
      }
    }
}
