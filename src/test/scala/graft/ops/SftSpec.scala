package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Specs for the SFT data-assembly family (SftQueries). The gate
  * hash-checks each query against DuckDB; these pin the CROSS-query
  * invariants the per-query oracles cannot see — that the span table
  * actually tiles the assembled transcript, character for character.
  */
class SftSpec extends SparkTestBase {

  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("sft spans tile the transcript: contiguous, exact substrings, mask sums match") {
    val spans = SftQueries.qSftSpans(spark, dir).cache()
    val assembled = SftQueries.qSftAssemble(spark, dir).cache()

    // spans are contiguous per session: span_start == prev span_end, first starts at 0
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id", $"sid").orderBy($"turn_idx")
    val gaps = spans
      .withColumn("__prev_end", lag($"span_end", 1).over(w))
      .filter(
        (col("__prev_end").isNull && $"span_start" =!= 0L) ||
        (col("__prev_end").isNotNull && $"span_start" =!= col("__prev_end")))
      .count()
    assert(gaps === 0L, "spans must be contiguous from offset 0")

    // joined to the transcript, every span's substring equals its rendered turn
    val joined = spans.join(assembled, Seq("user_id", "sid"))
    val mismatches = joined.filter(
      expr("substring(transcript, span_start + 1, span_end - span_start) <> rendered"))
      .count()
    assert(mismatches === 0L, "span [start,end) must cut exactly its rendered turn")

    // per-session totals: last span_end == transcript_chars; assistant span
    // lengths sum to assistant_chars
    val totals = spans.groupBy($"user_id", $"sid").agg(
      max($"span_end").as("last_end"),
      count(lit(1)).as("n_turns_spans"),
      sum(when($"role" === "assistant", $"span_end" - $"span_start").otherwise(0L))
        .as("asst_len"))
    val bad = totals.join(assembled, Seq("user_id", "sid")).filter(
      $"last_end" =!= $"transcript_chars" ||
      $"n_turns_spans" =!= $"n_turns" ||
      $"asst_len" =!= $"assistant_chars").count()
    assert(bad === 0L, "span totals must reconcile with the assembled summary")

    // roles alternate starting at user
    val badRole = spans.filter(
      ($"turn_idx" % 2 === 1 && $"role" =!= "user") ||
      ($"turn_idx" % 2 === 0 && $"role" =!= "assistant")).count()
    assert(badRole === 0L)

    spans.unpersist(); assembled.unpersist()
  }

  test("sft assemble: mask_frac bounded and zero-assistant sessions are single-turn") {
    val assembled = SftQueries.qSftAssemble(spark, dir)
    assert(assembled.filter($"mask_frac" < 0.0 || $"mask_frac" > 1.0).count() === 0L)
    // a session with no assistant chars can only be a single (user) turn
    assert(assembled.filter($"assistant_chars" === 0L && $"n_turns" > 1L).count() === 0L)
  }

  test("pref pairs: dominance, disjoint membership, stratum pair counts") {
    val pairs = SftQueries.qPrefPairs(spark, dir).cache()

    // chosen dominates rejected (ties allowed: ordering breaks on doc_id)
    assert(pairs.filter($"chosen_chars" < $"rejected_chars").count() === 0L)
    assert(pairs.filter($"gap" =!= $"chosen_chars" - $"rejected_chars").count() === 0L)

    // every doc appears in at most one pair across the whole output
    val members = pairs.select(explode(array($"chosen_id", $"rejected_id")).as("doc_id"))
    assert(members.groupBy($"doc_id").count().filter($"count" > 1L).count() === 0L)

    // pair count per stratum == floor(stratum size / 2)
    val expected = Tables.documents(spark, dir)
      .groupBy($"source", $"lang").agg((count(lit(1)) / 2).cast("long").as("exp_pairs"))
    val actual = pairs.groupBy($"source", $"lang").agg(count(lit(1)).as("act_pairs"))
    val off = expected.join(actual, Seq("source", "lang"), "left")
      .filter(coalesce($"act_pairs", lit(0L)) =!= $"exp_pairs").count()
    assert(off === 0L)

    pairs.unpersist()
  }

  test("sft pack: packed spans tile the global stream gaplessly and agree " +
      "with assemble totals; straddling spans count their sequences") {
    val packed = SftQueries.qSftPack(spark, dir).cache()
    val assembled = SftQueries.qSftAssemble(spark, dir)

    // per session: packed spans are contiguous (turn k+1 starts where k
    // ends) and cover exactly transcript_chars
    val perSession = packed.groupBy($"user_id", $"sid").agg(
      min($"packed_start").as("lo"), max($"packed_end").as("hi"),
      sum($"packed_end" - $"packed_start").as("covered"))
    val joined = perSession.join(assembled, Seq("user_id", "sid"))
    assert(joined.filter($"covered" =!= $"transcript_chars").count() === 0L)
    assert(joined.filter($"hi" - $"lo" =!= $"transcript_chars").count() === 0L)

    // the global stream is gapless: session spans abut in (user, sid) order
    val sessions = perSession.orderBy($"lo").collect()
    sessions.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Long]("hi") === b.getAs[Long]("lo"),
          s"gap between sessions ${a} and ${b}")
      case _ =>
    }
    assert(sessions.head.getAs[Long]("lo") === 0L)

    // n_seqs is exactly the straddle count of [packed_start, packed_end)
    val bad = packed.filter($"n_seqs" =!=
      expr("(packed_end - 1) div 2048 - packed_start div 2048 + 1"))
    assert(bad.count() === 0L)
    // seq coordinates locate the first char
    assert(packed.filter($"seq_id" * 2048L + $"seq_off" =!= $"packed_start")
      .count() === 0L)
    packed.unpersist()
  }

  test("q_sft_pack_tokens: spans are in TOKEN units (regex counts), " +
      "gapless across the packed stream, and seq coordinates agree") {
    val packed = SftQueries.qSftPackTokens(spark, dir).cache()
    // each turn's packed span length is its regex token count
    val expectLen = SftQueries.turnsOf(Tables.events(spark, dir))
      .select($"user_id", $"sid", $"turn_idx",
        size(regexp_extract_all($"rendered",
          lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0))).cast("long").as("tl"))
    val bad = packed.join(expectLen, Seq("user_id", "sid", "turn_idx"))
      .filter($"packed_end" - $"packed_start" =!= $"tl").count()
    assert(bad === 0L, "span length != regex token count")
    // the global token stream is gapless from 0
    val perSession = packed.groupBy($"user_id", $"sid").agg(
      min($"packed_start").as("lo"), max($"packed_end").as("hi"))
    val sessions = perSession.orderBy($"lo").collect()
    sessions.sliding(2).foreach {
      case Array(a, b) => assert(a.getAs[Long]("hi") === b.getAs[Long]("lo"))
      case _ =>
    }
    assert(sessions.head.getAs[Long]("lo") === 0L)
    assert(packed.filter($"seq_id" * 2048L + $"seq_off" =!= $"packed_start")
      .count() === 0L)
    packed.unpersist()
  }

  test("sftPackTokensBpe: a LEARNED tokenizer's pack equals a sequential " +
      "replay of the same encoder lengths, and turn columns ride the " +
      "encode kernel unchanged") {
    val events = Tables.events(spark, dir)
    val t = SftQueries.turnsOf(events)
    val merges = Bpe.train(t, "rendered", 16)
    val budget = 64L
    val out = SftQueries.sftPackTokensBpe(events, merges, budget).cache()

    // sequential reference: the SAME encoder's per-turn counts, packed
    // by a driver-side walk in (user_id, sid, ts, event_id) order
    val enc = Bpe.encode(t, "event_id", "rendered", merges)
      .select($"event_id", $"n_tokens").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val turnRows = t.select($"user_id", $"sid", $"turn_idx", $"role",
        $"ts", $"event_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3),
        r.getTimestamp(4).getTime * 1000 + r.getTimestamp(4).getNanos / 1000 % 1000,
        r.getLong(5)))
      .sortBy(x => (x._1, x._2, x._5, x._6))
    val expected = scala.collection.mutable.Set[(Long, Long, Long, String, Long, Long, Long, Long, Long)]()
    var stream = 0L
    var cur = (-1L, -1L)
    var inSession = 0L
    var sessionOff = 0L
    turnRows.foreach { case (u, sid, ti, role, _, eid) =>
      if ((u, sid) != cur) { cur = (u, sid); sessionOff = stream; inSession = 0L }
      val tl = enc(eid)
      val s = sessionOff + inSession
      val e = s + tl
      expected += ((u, sid, ti, role, s, e, s / budget, s % budget,
        (e - 1) / budget - s / budget + 1))
      inSession += tl
      stream += tl
    }
    val got = out.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getString(3), r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7),
      r.getLong(8))).toSet
    assert(got === expected.toSet)
    out.unpersist()
  }
}
