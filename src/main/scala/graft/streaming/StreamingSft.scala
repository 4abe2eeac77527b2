package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Ingest-time SFT transcript assembly — the streaming sibling of
  * [[graft.ops.SftQueries.qSftAssemble]]: gap-defined user sessions
  * accumulate their turns in keyed state and, when the WATERMARK
  * closes a session (last event + gap behind the watermark), the final
  * chat-template transcript with its loss-mask summary is emitted —
  * exactly the row the batch query produces for that session, so a
  * training pipeline can consume transcripts as they complete instead
  * of re-running the batch assembly over a growing event log.
  *
  * Shares the batch kernel's constants and semantics (same
  * [[graft.ops.SftQueries.GapMicros]] gap, same `<|role|>type props`
  * template, parity roles in (ts, event_id) order, identical `floor
  * (x·1e4 + 0.5)/1e4` mask rounding), and emits the SAME per-user
  * `sid`: sessions of one user are disjoint in time, so they close in
  * start order and a per-user counter in state reproduces the batch
  * window's running session number — StreamingSftSpec pins closed rows
  * equal to the batch output field-for-field.
  *
  * State shape ([[StreamingQueries.sessionizeWithState]] pattern:
  * multiple open sessions per user, out-of-order merges inside the
  * watermark, EventTimeTimeout wake-ups): per user, the open sessions'
  * turn buffers — bounded by one human's activity inside gap windows,
  * never corpus-sized. At 100 TB/day the operator shuffles once on
  * user_id into the state store; everything else is per-key. */
object StreamingSft {

  final case class SftTurn(tsUs: Long, eventId: Long, eventType: String, props: String)
  final case class OpenSft(startUs: Long, lastUs: Long, turns: List[SftTurn])
  final case class SftState(nextSid: Long, open: List[OpenSft])
  final case class SftSessionOut(user_id: Long, sid: Long, n_turns: Long,
      transcript: String, transcript_chars: Long, assistant_chars: Long,
      mask_frac: Double)

  /** Assemble one CLOSED session — the per-session kernel both the
    * spec's expectations and the stateful operator share. Turns are
    * sorted by (ts, event_id); odd 1-based positions are `user`, even
    * `assistant`; char counts are code points (Spark `length`
    * semantics, so the row is bit-comparable to the batch query). */
  private[streaming] def assemble(userId: Long, sid: Long, s: OpenSft): SftSessionOut = {
    val ordered = s.turns.sortBy(t => (t.tsUs, t.eventId))
    val sb = new java.lang.StringBuilder
    var assistantChars = 0L
    var idx = 0
    ordered.foreach { t =>
      idx += 1
      val role = if (idx % 2 == 1) "user" else "assistant"
      val rendered = s"<|$role|>${t.eventType} ${t.props}"
      sb.append(rendered)
      if (role == "assistant")
        assistantChars += rendered.codePointCount(0, rendered.length).toLong
    }
    val transcript = sb.toString
    val tChars = transcript.codePointCount(0, transcript.length).toLong
    val frac = math.floor(assistantChars.toDouble /
      math.max(tChars, 1L).toDouble * 1e4 + 0.5) / 1e4
    SftSessionOut(userId, sid, ordered.length.toLong, transcript, tChars,
      assistantChars, frac)
  }

  /** The streaming query: `events` must carry (user_id, ts, event_id,
    * event_type, props). Emits one Append-mode row per watermark-closed
    * session. */
  def assembleSessions(
      spark: SparkSession,
      events: DataFrame,
      watermark: String = "10 minutes"): Dataset[SftSessionOut] = {
    import spark.implicits._
    val gapUs = graft.ops.SftQueries.GapMicros

    def mergeInto(sessions: List[OpenSft], t: SftTurn): List[OpenSft] = {
      // kept sorted by startUs; a turn joins a session when it lands
      // within gap of its span; bridging turns merge adjacent sessions
      val joined = OpenSft(t.tsUs, t.tsUs, List(t))
      val merged = (joined :: sessions).sortBy(_.startUs)
      merged.foldLeft(List.empty[OpenSft]) { (acc, s) =>
        acc match {
          case head :: tail if s.startUs < head.lastUs + gapUs =>
            OpenSft(head.startUs, math.max(head.lastUs, s.lastUs),
              head.turns ::: s.turns) :: tail
          case _ => s :: acc
        }
      }.reverse
    }

    // the watermarked event-time column must flow INTO the stateful
    // operator; the kernel reads exact micros from ts_us
    events
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
        col("event_id"), col("event_type"), col("props"))
      .withColumn("ts", timestamp_micros(col("ts_us")))
      .withWatermark("ts", watermark)
      .select(col("user_id"), col("ts"), col("ts_us"), col("event_id"),
        col("event_type"), col("props"))
      .as[(Long, java.sql.Timestamp, Long, Long, String, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[SftState, SftSessionOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (user, rows, state: GroupState[SftState]) =>
          var st = state.getOption.getOrElse(SftState(1L, Nil))
          rows.foreach { case (_, _, tsUs, eid, etype, props) =>
            st = st.copy(open = mergeInto(st.open,
              SftTurn(tsUs, eid, etype, if (props == null) "" else props)))
          }
          val watermarkUs = state.getCurrentWatermarkMs() * 1000L
          val (closed, open) = st.open.partition(_.lastUs + gapUs <= watermarkUs)
          val ordered = closed.sortBy(_.startUs)
          val out = ordered.zipWithIndex.map { case (s, i) =>
            assemble(user, st.nextSid + i, s)
          }
          val nextSid = st.nextSid + ordered.length
          if (open.nonEmpty) {
            state.update(SftState(nextSid, open))
            // wake when the earliest open session could close
            val wakeMs = (open.map(_.lastUs).min + gapUs) / 1000L + 1L
            state.setTimeoutTimestamp(math.max(wakeMs, state.getCurrentWatermarkMs() + 1L))
          } else if (nextSid > 1L) {
            // no open span to wake for, but the sid counter must
            // outlive the sessions (batch numbering counts from the
            // start of the log): one counter row per ever-active user,
            // no timeout — the next event for this user reads it back
            state.update(SftState(nextSid, Nil))
          } else {
            state.remove()
          }
          out.iterator
      }
  }
}
