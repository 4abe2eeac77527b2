package graft.sources

/** Adaptive admission control (backpressure) for the streaming source.
  *
  * The reference wires Spark Streaming's PID rate estimator into its
  * per-batch clamp (dis/DirectDISInputDStream.scala:120-127, 402-405,
  * `spark.streaming.backpressure.initialRate` :57-58). Structured
  * Streaming exposes no scheduling-delay signal to sources, so the
  * equivalent fit is a proportional controller on *measured trigger
  * throughput*: observe how many records the last trigger processed
  * and how long it took (wall time between `latestOffset` calls),
  * smooth with an EWMA, and size the next batch to hit
  * `targetTriggerMs` of processing.
  *
  * Deterministic and clock-injected for testability; thread-safe (one
  * instance per stream, called from the streaming thread).
  */
final class RateController(
    targetTriggerMs: Long = 1000L,
    alpha: Double = 0.3,
    minRecords: Long = 1L,
    initialRatePerSec: Option[Double] = None) {

  private var lastCallMs: Long = -1L
  private var lastAdmitted: Long = 0L
  // records per millisecond, EWMA-smoothed; -1 = no observation yet
  private var ewmaRate: Double = initialRatePerSec.map(_ / 1000.0).getOrElse(-1.0)

  /** Budget for the next trigger, given the current wall clock.
    * None until a rate estimate exists (first trigger: admit per the
    * static limits only, like the reference's initialRate=0 default). */
  def nextBudget(nowMs: Long): Option[Long] = synchronized {
    observe(nowMs)
    if (ewmaRate < 0) None
    else Some(math.max((ewmaRate * targetTriggerMs).toLong, minRecords))
  }

  /** Record how many records the trigger that is now being planned
    * will admit (observed as processed at the next call). */
  def admitted(n: Long, nowMs: Long): Unit = synchronized {
    lastAdmitted = n
    lastCallMs = nowMs
  }

  private def observe(nowMs: Long): Unit = {
    if (lastCallMs >= 0 && lastAdmitted > 0 && nowMs > lastCallMs) {
      val observed = lastAdmitted.toDouble / (nowMs - lastCallMs)
      ewmaRate = if (ewmaRate < 0) observed else alpha * observed + (1 - alpha) * ewmaRate
      lastAdmitted = 0L
    }
  }

  private[sources] def currentRatePerSec: Double = synchronized(ewmaRate * 1000.0)
}
