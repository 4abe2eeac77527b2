package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Online rejection sampling — the streaming sibling of
  * [[graft.ops.RlQueries.qBestOfN]]: scored generation candidates
  * stream in, each (user_id, event_type) pool folds them into O(1)
  * keyed state (count + the top-2 by the batch ordering), and when the
  * WATERMARK closes the pool (`quietUs` past its last candidate) the
  * final best-of-N row is emitted — exactly the row the batch query
  * produces for that pool, so an RLHF pipeline can keep only winners
  * at ingest instead of re-scanning the full sample log.
  *
  * State shape — the deliberate contrast with [[StreamingSft]]: a
  * session transcript must BUFFER its turns (output needs every one),
  * but argmax-with-margin is an order-independent fold, so a pool's
  * state is five scalars no matter how many candidates stream through
  * it. Top-2 maintenance under the batch ordering (value desc,
  * event_id asc) is merge-commutative, so out-of-order arrival inside
  * the watermark cannot change the result — StreamingBestOfNSpec pins
  * closed rows equal to [[graft.ops.RlQueries.bestOfNOf]]
  * field-for-field across micro-batch boundaries and a checkpoint
  * restart. At 100 TB/day the operator shuffles once on the pool key
  * into the state store; everything else is per-key O(1). */
object StreamingBestOfN {

  /** (value desc, event_id asc) — one candidate beats another exactly
    * when the batch window would rank it first. */
  final case class Cand(value: Double, eventId: Long) {
    def beats(o: Cand): Boolean =
      value > o.value || (value == o.value && eventId < o.eventId)
  }

  /** n + top-2 + the pool's latest event time (for the close wake-up). */
  final case class PoolState(n: Long, best: Cand, second: Option[Cand], lastUs: Long)

  final case class BestOfNOut(user_id: Long, event_type: String,
      n_candidates: Long, best_event_id: Long, best_score: Double,
      margin: Double)

  private[streaming] def fold(st: PoolState, c: Cand): PoolState =
    if (c.beats(st.best)) st.copy(n = st.n + 1, best = c, second = Some(st.best))
    else if (st.second.forall(c.beats)) st.copy(n = st.n + 1, second = Some(c))
    else st.copy(n = st.n + 1)

  private[streaming] def close(userId: Long, eventType: String,
      st: PoolState): BestOfNOut =
    BestOfNOut(userId, eventType, st.n, st.best.eventId, st.best.value,
      // the batch margin: best minus the SECOND-HIGHEST VALUE in the
      // pool (a tied runner-up gives 0), singletons report 0
      st.best.value - st.second.map(_.value).getOrElse(st.best.value))

  /** The streaming query: `events` must carry (user_id, ts, event_id,
    * event_type, value). Emits one Append-mode row per watermark-closed
    * pool (`quietUs` micros with no new candidate). */
  def selectBest(
      spark: SparkSession,
      events: DataFrame,
      quietUs: Long = 30L * 60 * 1000000,
      watermark: String = "10 minutes"): Dataset[BestOfNOut] = {
    import spark.implicits._
    require(quietUs > 0, s"quietUs must be positive, got $quietUs")

    events
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
        col("event_id"), col("event_type"), col("value"))
      .withColumn("ts", timestamp_micros(col("ts_us")))
      .withWatermark("ts", watermark)
      .select(col("user_id"), col("ts"), col("ts_us"), col("event_id"),
        col("event_type"), col("value"))
      .as[(Long, java.sql.Timestamp, Long, Long, String, Double)]
      .groupByKey(r => (r._1, r._5))
      .flatMapGroupsWithState[PoolState, BestOfNOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case ((user, etype), rows, state: GroupState[PoolState]) =>
          // fold the batch's candidates into the O(1) pool summary;
          // a timeout wake-up simply delivers zero rows
          var st = state.getOption.orNull
          rows.foreach { case (_, _, tsUs, eid, _, value) =>
            val c = Cand(value, eid)
            st =
              if (st == null) PoolState(1L, c, None, tsUs)
              else fold(st.copy(lastUs = math.max(st.lastUs, tsUs)), c)
          }
          if (state.getCurrentWatermarkMs() * 1000L >= st.lastUs + quietUs) {
            state.remove()
            Iterator.single(close(user, etype, st))
          } else {
            state.update(st)
            // wake when the pool's quiet horizon could pass the watermark
            state.setTimeoutTimestamp(
              math.max((st.lastUs + quietUs) / 1000L + 1L,
                state.getCurrentWatermarkMs() + 1L))
            Iterator.empty
          }
      }
  }
}
