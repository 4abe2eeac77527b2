package graft.sources

/** Exponential backoff schedule, reference semantics:
  * `interval × multiplier^n`, capped at `maxInterval`; STOP = -1 when
  * `maxElapsed` is exhausted (reference: dis/ExponentialBackOff.scala:5-32,
  * dis/BackOffExecution.scala:3-12; the poll-retry instance uses
  * 100ms × 1.5 capped at 5000ms, dis/DISDataConsumer.scala:87-100).
  */
final class Backoff(
    initialIntervalMs: Long = 2000L,
    multiplier: Double = 1.5,
    maxIntervalMs: Long = 30000L,
    maxElapsedMs: Long = Long.MaxValue) {

  def execution(): Backoff.Execution =
    new Backoff.Execution(initialIntervalMs, multiplier, maxIntervalMs, maxElapsedMs)
}

object Backoff {
  /** Returned when the backoff budget is exhausted. */
  val Stop: Long = -1L

  /** Schedule for the empty-poll retry loop (dis/DISDataConsumer.scala:87-93). */
  def pollRetry(): Backoff = new Backoff(100L, 1.5, 5000L)

  final class Execution(initial: Long, multiplier: Double, max: Long, maxElapsed: Long) {
    private var current = initial
    private var elapsed = 0L

    /** Next sleep interval in ms, or [[Stop]] once cumulative intervals
      * exceed the elapsed budget. */
    def nextBackOff(): Long = {
      if (elapsed >= maxElapsed) return Stop
      val interval = math.min(current, max)
      elapsed += interval
      current = math.min((current * multiplier).toLong, max)
      interval
    }
  }
}
