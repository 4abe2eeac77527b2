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

  final case class GrpoCand(eventId: Long, value: Double)
  final case class GrpoState(cands: List[GrpoCand], lastUs: Long)
  final case class GrpoOut(user_id: Long, event_type: String, event_id: Long,
      n: Long, adv: Double)

  /** Streaming GRPO advantages — the ingest-time sibling of
    * [[graft.ops.RlQueries.qGrpoAdv]]: a pool's candidates buffer in
    * keyed state (bounded by the generation fan-out N, a training-run
    * constant — unlike [[selectBest]]'s O(1) fold, every candidate must
    * reappear in the output with its own advantage), and when the
    * watermark closes the pool each candidate is emitted with its
    * pool-standardized advantage from the SAME explicit-moment
    * arithmetic as the batch query (Σv, Σv², the floor-rounding), so
    * closed pools equal the batch rows field-for-field. Summation runs
    * in (event_id) order regardless of arrival order, so the streamed
    * result is replay-deterministic; vs the batch side (which reduces
    * in scan order) the 4-decimal floor-rounding absorbs last-ULP
    * order differences — the same knife-edge-tie caveat the batch
    * oracle itself carries. */
  def advantages(
      spark: SparkSession,
      events: DataFrame,
      quietUs: Long = 30L * 60 * 1000000,
      watermark: String = "10 minutes"): Dataset[GrpoOut] = {
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
      .flatMapGroupsWithState[GrpoState, GrpoOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case ((user, etype), rows, state: GroupState[GrpoState]) =>
          var st = state.getOption.getOrElse(GrpoState(Nil, Long.MinValue))
          rows.foreach { case (_, _, tsUs, eid, _, value) =>
            st = GrpoState(GrpoCand(eid, value) :: st.cands,
              math.max(st.lastUs, tsUs))
          }
          if (st.cands.nonEmpty &&
              state.getCurrentWatermarkMs() * 1000L >= st.lastUs + quietUs) {
            state.remove()
            // deterministic summation order: by event_id, exactly the
            // file order the batch agg reduces at the fixture grain
            val ordered = st.cands.sortBy(_.eventId)
            val n = ordered.length.toLong
            var s = 0.0; var s2 = 0.0
            ordered.foreach { c => s += c.value; s2 += c.value * c.value }
            val varS = if (n > 1) (s2 - s * s / n) / (n - 1) else -1.0
            ordered.iterator.map { c =>
              val adv =
                if (varS <= 0.0) 0.0
                else math.floor((c.value - s / n) / math.sqrt(varS) * 1e4 + 0.5) / 1e4
              GrpoOut(user, etype, c.eventId, n, adv)
            }
          } else {
            state.update(st)
            state.setTimeoutTimestamp(
              math.max((st.lastUs + quietUs) / 1000L + 1L,
                state.getCurrentWatermarkMs() + 1L))
            Iterator.empty
          }
      }
  }

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
