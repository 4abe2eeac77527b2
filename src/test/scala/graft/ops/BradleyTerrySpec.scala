package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Bradley–Terry MM fit: ordering semantics, exact-arithmetic
  * invariance, and the match-construction rules. */
class BradleyTerrySpec extends SparkTestBase {
  import spark.implicits._

  /** Docs where quality is forced by token count alone (no stopwords):
    * source `strong` always out-scores `weak` in its pairs. Adjacent
    * ids pair up, so lay players out by id parity. */
  private def arena(nPairs: Int): org.apache.spark.sql.DataFrame = {
    val rows = (0 until nPairs).flatMap { i =>
      // even id: strong (9 tokens), odd id: weak (3 tokens)
      Seq((2L * i, "strong", (1 to 9).map(j => s"s$i$j").mkString(" ")),
          (2L * i + 1, "weak", (1 to 3).map(j => s"w$i$j").mkString(" ")))
    }
    rows.toDF("doc_id", "source", "text")
  }

  test("dominant source gets the higher strength") {
    val out = BradleyTerry.fit(arena(20)).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    val (sm, sw) = (out("strong"), out("weak"))
    assert(sm._1 == 20 && sw._1 == 20) // every pair is a match
    assert(sm._2 == 20 && sw._2 == 0)  // strong wins all
    assert(sm._3 > sw._3, s"strength(strong)=${sm._3} !> strength(weak)=${sw._3}")
    // all-loss hits the lower clamp rail immediately (W = 0); all-win
    // grows past the 1.0 init (the unnormalized MM update S' ≈ S_w+S_s
    // diverges only gradually, so no upper-rail expectation)
    assert(sw._3 == (1L << 10))
    assert(sm._3 > (1L << 20))
  }

  test("mixed record lands between the rails and is partitioning-invariant") {
    // three players on a quality cycle-free ladder: A > B > C by token
    // count; ids laid out so A-B, B-C and A-C pairs all occur
    val rows = Seq(
      (0L, "A", "a1 a2 a3 a4 a5 a6"), (1L, "B", "b1 b2 b3 b4"),
      (2L, "B", "b5 b6 b7 b8"), (3L, "C", "c1 c2"),
      (4L, "A", "a7 a8 a9 aa ab ac"), (5L, "C", "c3 c4"),
      (6L, "B", "b9 ba bb bc"), (7L, "A", "ad ae af ag ah ai"),
      (8L, "C", "c5 c6"), (9L, "B", "bd be bf bg"))
    val df = rows.toDF("doc_id", "source", "text")
    val fit1 = BradleyTerry.fit(df).collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(fit1("A") > fit1("B") && fit1("B") > fit1("C"),
      s"expected A>B>C, got $fit1")
    // B has both wins and losses: strictly inside the clamp rails
    assert(fit1("B") > (1L << 10) && fit1("B") < (1L << 30))
    // integer arithmetic => bit-identical across partitionings
    val fit8 = BradleyTerry.fit(df.repartition(8)).collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(fit8 == fit1)
  }

  test("same-source pairs and odd leftovers produce no match") {
    val rows = Seq(
      (0L, "X", "x1 x2 x3"), (1L, "X", "x4"),       // same source: dropped
      (2L, "X", "x5 x6 x7"), (3L, "Y", "y1"),       // real match
      (4L, "Y", "y2 y3"))                           // odd leftover: dropped
    val out = BradleyTerry.fit(rows.toDF("doc_id", "source", "text"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(out == Set(("X", 1L, 1L), ("Y", 1L, 0L)))
  }

  test("quality tie goes to the even (lower) id") {
    val rows = Seq((0L, "P", "t1 t2"), (1L, "Q", "u1 u2"))
    val out = BradleyTerry.fit(rows.toDF("doc_id", "source", "text"))
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(out("P") == 1L && out("Q") == 0L)
  }

  test("gate binding runs on the fixture and covers every source") {
    val out = BradleyTerry.qBtStrength(spark, "/root/testdata/sf0.001")
    val rows = out.collect()
    assert(rows.length > 1)
    assert(rows.forall { r =>
      val s = r.getLong(3); s >= (1L << 10) && s <= (1L << 30)
    })
    // matches are symmetric: total wins == total matches / 2
    val (m, w) = rows.foldLeft((0L, 0L)) { case ((am, aw), r) =>
      (am + r.getLong(1), aw + r.getLong(2))
    }
    assert(m == 2 * w, s"sum(n_matches)=$m should be 2*sum(n_wins)=$w")
  }
}
