package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.api.Graft

/** Specs for the temporal/relational completeness pass (TemporalQueries)
  * and the PassJoin/CDC operators (Graft.editDupes, Graft.cdcChunks).
  * Gate queries are oracle-checked by the driver; these pin the
  * semantic properties on adversarial local fixtures the gate fixtures
  * cannot force (dist-1/2 edit pairs, content-defined boundary
  * stability under prefix insertion, SCD-2 interval algebra).
  */
class TemporalSpec extends SparkTestBase {

  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  // ---- SCD-2 ----

  test("scd2 intervals: change-capture, adjacency, open current row") {
    val events = Seq(
      (1L, ts("2024-01-01 00:00:00"), 10L, "a"),
      (2L, ts("2024-01-01 01:00:00"), 10L, "a"), // no change → collapsed
      (3L, ts("2024-01-01 02:00:00"), 10L, "b"),
      (4L, ts("2024-01-01 03:00:00"), 10L, "a"), // back to a → new interval
      (5L, ts("2024-01-01 00:30:00"), 20L, "x")
    ).toDF("event_id", "ts", "user_id", "event_type")
    events.createOrReplaceTempView("__scd2ev")
    // qScd2 binds the fixture table; replicate its logic on this frame
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id").orderBy($"ts", $"event_id")
    val changes = events
      .withColumn("__prev", lag($"event_type", 1).over(w))
      .filter($"__prev".isNull || $"__prev" =!= $"event_type")
      .withColumn("valid_to", lead($"ts", 1).over(w))
      .select($"user_id", $"event_type", $"ts".as("valid_from"), $"valid_to")
    val rows = changes.orderBy($"user_id", $"valid_from").collect()
    assert(rows.map(r => (r.getLong(0), r.getString(1))).toSeq ===
      Seq((10L, "a"), (10L, "b"), (10L, "a"), (20L, "x")))
    // intervals tile: each valid_to equals the next valid_from per user
    val u10 = rows.filter(_.getLong(0) == 10L)
    assert(u10(0).getTimestamp(3) === u10(1).getTimestamp(2))
    assert(u10(1).getTimestamp(3) === u10(2).getTimestamp(2))
    assert(u10(2).isNullAt(3)) // current row open-ended
  }

  // ---- retention / interleave ----

  test("retention: offsets measured from each user's first day") {
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L), (2L, ts("2024-01-03 09:00:00"), 1L),
      (3L, ts("2024-01-02 10:00:00"), 2L), (4L, ts("2024-01-02 23:59:59"), 2L),
      (5L, ts("2024-01-04 00:00:00"), 2L)
    ).toDF("event_id", "ts", "user_id")
    val first = ev.select($"user_id", to_date($"ts").as("d"))
      .groupBy($"user_id").agg(min($"d").as("cohort"))
    val got = ev.select($"user_id", to_date($"ts").as("d"))
      .join(first, Seq("user_id"))
      .groupBy($"cohort", datediff($"d", $"cohort").cast("long").as("day_offset"))
      .agg(countDistinct($"user_id").as("users"))
      .collect().map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2))).toSet
    assert(got === Set(
      ("2024-01-01", 0L, 1L), ("2024-01-01", 2L, 1L),
      ("2024-01-02", 0L, 1L), ("2024-01-02", 2L, 1L)))
  }

  test("interleave: sorting by sched_key yields weight-proportional prefixes") {
    val docs = TemporalQueries.qInterleave(spark, "/root/testdata/sf0.001")
    val rows = docs.orderBy($"sched_key", $"source", $"src_rank").collect()
    // weights are 1 + srcnum%4; in any prefix long enough, a source of
    // weight 4 must appear ~4x as often as a source of weight 1
    val prefix = rows.take(200).map(_.getString(1))
    val w1 = prefix.count(s => s.stripPrefix("src").toInt % 4 == 0) // weight 1
    val w4 = prefix.count(s => s.stripPrefix("src").toInt % 4 == 3) // weight 4
    assert(w4 > 2 * w1, s"stride order broken: weight-4 sources $w4 vs weight-1 $w1")
    // within one source the order preserves src_rank monotonically
    val bySrc = rows.map(r => (r.getString(1), r.getLong(2))).toSeq
      .groupBy(_._1).map { case (s, rs) => s -> rs.map(_._2) }
    bySrc.values.foreach(seq => assert(seq === seq.sorted, "src_rank order violated"))
  }

  // ---- editDupes (PassJoin) ----

  test("editDupes finds dist-0/1/2 pairs and rejects dist-3, across lengths") {
    val docs = Seq(
      (1L, "the quick brown fox jumps"),
      (2L, "the quick brown fox jumps"),   // dist 0 of 1
      (3L, "the quick brown fox jummps"),  // 1 insertion vs 1
      (4L, "the quack brown fax jumps"),   // 2 substitutions vs 1
      (5L, "the quick brawn fax jam pot"), // ≥3 edits vs 1
      (6L, "completely different text here"),
      (7L, "xx"),                          // below minLen → excluded
      (8L, "THE QUICK BROWN FOX JUMPS")    // case-folds to dist 0 of 1
    ).toDF("doc_id", "text")
    val got = Graft.editDupes(docs, "doc_id", "text", k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // exact reference: quadratic Levenshtein over the same normalization
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val norm = docs.collect().map(r => (r.getLong(0), r.getString(1).toLowerCase.take(64)))
      .filter(_._2.length >= 8)
    val want = (for {
      (ai, as) <- norm; (bi, bs) <- norm if ai < bi
      d = lev(as, bs) if d <= 2
    } yield (ai, bi, d.toLong)).toSet
    assert(got === want)
    assert(want.exists(_._3 == 1L) && want.exists(_._3 == 2L),
      "fixture must exercise nonzero distances")
    assert(!got.exists(p => p._1 == 5L || p._2 == 5L && p._1 == 1L))
  }

  test("editDupes pigeonhole blocking is complete under length skew") {
    // deletions at segment boundaries — the adversarial case for
    // segment-alignment windows
    val base = "abcdefghijklmnopqrstuvwxyz0123456789"
    val variants = Seq(
      base,
      base.substring(1),                       // delete first char
      base.substring(0, 35),                   // delete last char
      base.substring(0, 12) + base.substring(14), // delete middle 2
      "ZZ" + base                              // 2 inserts at front
    )
    val docs = variants.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val got = Graft.editDupes(docs, "doc_id", "text", k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // every variant is within 2 edits of base (id 0)
    for (i <- 1L to 4L) assert(got.contains((0L, i)), s"missing pair (0,$i)")
  }

  // ---- cdcChunks ----

  test("cdcChunks: chunks tile the document and lengths sum to doc length") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val chunks = Graft.cdcChunks(docs, "doc_id", "text")
    val sums = chunks.groupBy($"doc_id")
      .agg(sum($"chunk_len").as("clen"), count(lit(1)).as("n"),
        max($"chunk_idx").as("maxidx"))
      .join(docs.select($"doc_id", length($"text").cast("long").as("tlen")), "doc_id")
      .collect()
    assert(sums.nonEmpty)
    sums.foreach { r =>
      assert(r.getAs[Long]("clen") === r.getAs[Long]("tlen"),
        s"doc ${r.getAs[Long]("doc_id")}: chunks don't tile")
      assert(r.getAs[Int]("maxidx").toLong === r.getAs[Long]("n"),
        "chunk_idx must be dense 1..n")
    }
  }

  test("cdcChunks boundaries are content-defined: prefix insertion preserves chunk identity") {
    val text = scala.util.Random.javaRandomToRandom(new java.util.Random(42))
      .alphanumeric.take(2000).mkString
    val docs = Seq((1L, text), (2L, "PREFIX-INSERTED-" + text)).toDF("doc_id", "text")
    val chunks = Graft.cdcChunks(docs, "doc_id", "text")
      .select($"doc_id", $"chunk_hash", $"chunk_len").collect()
    val h1 = chunks.filter(_.getLong(0) == 1L).map(r => (r.getLong(1), r.getLong(2))).toSet
    val h2 = chunks.filter(_.getLong(0) == 2L).map(r => (r.getLong(1), r.getLong(2))).toSet
    val shared = h1.intersect(h2)
    // all chunks after the first boundary resynchronize → the vast
    // majority of doc-1 chunks reappear verbatim in doc 2
    assert(shared.size >= h1.size - 2,
      s"expected resync within one chunk: shared ${shared.size} of ${h1.size}")
  }

  test("cdcChunks dup_cnt counts identical chunk text globally") {
    val t = "A" * 10 + scala.util.Random.javaRandomToRandom(new java.util.Random(7))
      .alphanumeric.take(500).mkString
    val docs = Seq((1L, t), (2L, t), (3L, "unrelated " * 40)).toDF("doc_id", "text")
    val byDoc = Graft.cdcChunks(docs, "doc_id", "text")
      .groupBy($"doc_id").agg(min($"dup_cnt").as("mind")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byDoc(1L) >= 2L && byDoc(2L) >= 2L,
      "identical docs must have every chunk duplicated")
  }
}
