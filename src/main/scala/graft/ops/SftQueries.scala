package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Instruction-tuning data assembly (north star — the reference has no
  * analytics surface of its own): turn event streams into chat-style
  * SFT transcripts with loss-mask spans, and rank-pair documents into
  * preference (chosen, rejected) training rows for reward-model data.
  *
  * Every step — gap sessionization, parity role assignment, ordered
  * concatenation, prefix-length span offsets, rank pairing — is exact
  * integer/string arithmetic, so all three queries sit under the full
  * DuckDB hash oracle.
  *
  * Scale shape: everything is ONE shuffle on the grouping key. The
  * session id, role, and span offsets are windows partitioned by
  * `user_id`; the per-session aggregation groups by (user_id, sid),
  * which `EnsureRequirements` satisfies with the window's existing
  * hash partitioning on the `user_id` prefix — no second exchange.
  * Per-group state is one user session (bounded by human activity, not
  * corpus size); transcripts are assembled per session, never globally.
  * Preference pairing is a window on (source, lang) + a same-prefix
  * re-agg: rows only ever meet their own stratum.
  */
object SftQueries {

  private val GapMicros = 30L * 60 * 1000000 // 30-minute session gap

  /** Events annotated with session id, turn index, role, and the
    * rendered chat-template turn — the shared prefix of the two SFT
    * queries. Roles alternate user/assistant in (ts, event_id) order
    * within each session (odd turn = user), the template is
    * `<|role|>event_type props`. */
  private def turns(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val isNew = when(lag(col("ts"), 1).over(byUser).isNull
      || unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(byUser)) >= GapMicros,
      1L).otherwise(0L)
    val withSid = Tables.events(spark, dir)
      .withColumn("__new", isNew)
      .withColumn("sid", sum(col("__new")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val bySession = Window.partitionBy(col("user_id"), col("sid"))
      .orderBy(col("ts"), col("event_id"))
    withSid
      .withColumn("turn_idx", row_number().over(bySession).cast("long"))
      .withColumn("role",
        when(col("turn_idx") % 2 === 1, lit("user")).otherwise(lit("assistant")))
      .withColumn("rendered",
        concat(lit("<|"), col("role"), lit("|>"), col("event_type"), lit(" "), col("props")))
  }

  /** Tie-proof 4-decimal rounding computed identically in both engines
    * (Spark round() is decimal-string HALF_UP, DuckDB's is binary —
    * they disagree exactly on the .00005 ties integer ratios land on). */
  private def round4(c: org.apache.spark.sql.Column) =
    floor(c * lit(1e4) + lit(0.5)) / lit(1e4)

  /** Chat-SFT transcript assembly: one row per session with the full
    * rendered transcript and the loss-mask summary — how many of its
    * characters belong to assistant turns (the spans a trainer leaves
    * unmasked). Ordered concatenation is a per-group sort of the
    * collected (ts, event_id, rendered) structs, so the output is
    * independent of partitioning and arrival order. */
  def qSftAssemble(spark: SparkSession, dir: String): DataFrame =
    turns(spark, dir)
      .groupBy(col("user_id"), col("sid"))
      .agg(
        count(lit(1)).as("n_turns"),
        array_join(transform(
          array_sort(collect_list(struct(col("ts"), col("event_id"), col("rendered")))),
          t => t.getField("rendered")), "").as("transcript"),
        sum(when(col("role") === "assistant", length(col("rendered")).cast("long"))
          .otherwise(0L)).as("assistant_chars"))
      .select(
        col("user_id"), col("sid"), col("n_turns"),
        col("transcript"),
        length(col("transcript")).cast("long").as("transcript_chars"),
        col("assistant_chars"),
        round4(col("assistant_chars").cast("double") /
          greatest(length(col("transcript")).cast("long"), lit(1L))).as("mask_frac"))

  /** Loss-mask span table: one row per turn with its [start, end) char
    * offsets inside the assembled transcript — start is the prefix sum
    * of preceding rendered-turn lengths (a window over the session,
    * same single user_id shuffle). A trainer masks the `user` spans
    * and trains on the `assistant` ones. */
  def qSftSpans(spark: SparkSession, dir: String): DataFrame = {
    val bySession = Window.partitionBy(col("user_id"), col("sid"))
      .orderBy(col("ts"), col("event_id"))
    turns(spark, dir)
      .withColumn("span_start", coalesce(
        sum(length(col("rendered")).cast("long")).over(
          bySession.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(
        col("user_id"), col("sid"), col("turn_idx"), col("role"),
        col("span_start"),
        (col("span_start") + length(col("rendered")).cast("long")).as("span_end"),
        col("rendered"))
  }

  /** Preference-pair construction for reward-model training data: rank
    * documents inside each (source, lang) stratum by length (desc,
    * doc_id tiebreak) and pair adjacent ranks — rank 2k−1 is `chosen`,
    * rank 2k `rejected`, so every document lands in at most one pair
    * and each pair's chosen side dominates its rejected side. An odd
    * stratum's last document has no partner and is dropped. */
  def qPrefPairs(spark: SparkSession, dir: String): DataFrame = {
    val byStratum = Window.partitionBy(col("source"), col("lang"))
      .orderBy(col("n_chars").desc, col("doc_id").asc)
    Tables.documents(spark, dir)
      .withColumn("__rn", row_number().over(byStratum).cast("long"))
      .withColumn("pair_idx", ((col("__rn") + 1L) / lit(2L)).cast("long"))
      .groupBy(col("source"), col("lang"), col("pair_idx"))
      .agg(
        max(when(col("__rn") % 2 === 1, col("doc_id"))).as("chosen_id"),
        max(when(col("__rn") % 2 === 0, col("doc_id"))).as("rejected_id"),
        max(when(col("__rn") % 2 === 1, col("n_chars"))).as("chosen_chars"),
        max(when(col("__rn") % 2 === 0, col("n_chars"))).as("rejected_chars"))
      .filter(col("rejected_id").isNotNull)
      .select(col("source"), col("lang"), col("pair_idx"),
        col("chosen_id"), col("rejected_id"), col("chosen_chars"),
        col("rejected_chars"),
        (col("chosen_chars") - col("rejected_chars")).as("gap"))
  }
}
