package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.api.Graft

/** Data-selection / monitoring operators: DSIR importance weights,
  * Efraimidis–Spirakis weighted sampling, PSI drift, Unicode
  * normalization. */
class SelectionSpec extends SparkTestBase {
  import spark.implicits._

  // ----- dsirWeights -----

  private def corpus = Seq(
    (0L, "the cat sat on the mat", "tgt"),
    (1L, "the dog sat on the rug", "tgt"),
    (2L, "cat and dog play", "tgt"),
    (3L, "quantum flux capacitor engaged", "raw"),
    (4L, "the cat sat on the mat", "raw"), // identical to a target doc
    (5L, "flux capacitor quantum drive", "raw"),
    (6L, "", "raw"),
    (7L, null.asInstanceOf[String], "raw")
  ).toDF("id", "text", "kind")

  test("dsirWeights ranks target-like documents above target-unlike ones") {
    val df = corpus
    val out = Graft.dsirWeights(df, "id", "text",
        df.filter($"kind" === "tgt"), "text", buckets = 512)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out.size === 8)
    // doc 4 repeats a target doc verbatim; docs 3/5 share no target gram
    assert(out(4L) > out(3L) && out(4L) > out(5L),
      s"target-identical doc must outscore off-target docs: $out")
    // empty/null docs have no grams -> weight exactly 0
    assert(out(6L) === 0.0 && out(7L) === 0.0)
  }

  test("dsirWeights is partitioning-independent and matches a local replay") {
    val df = corpus
    val tgt = df.filter($"kind" === "tgt")
    val a = Graft.dsirWeights(df, "id", "text", tgt, "text", buckets = 256)
    val b = Graft.dsirWeights(df.repartition(7), "id", "text",
      tgt.repartition(3), "text", buckets = 256)
    assert(a.except(b).isEmpty && b.except(a).isEmpty)

    // local replay of the published arithmetic on one document
    val B = 256
    def buckets(s: String): Seq[Long] = {
      val t = s.split(" ").filter(_.nonEmpty).toSeq
      val grams = t ++ t.sliding(2).filter(_.size == 2).map(_.mkString(" "))
      grams.map(g => g.foldLeft(0L)((acc, c) => (acc * 31 + c.toLong) % 2147483648L) % B)
    }
    val docs = corpus.collect().map(r =>
      (r.getLong(0), Option(r.getString(1)).getOrElse(""), r.getString(2)))
    val tgtCounts = docs.filter(_._3 == "tgt").flatMap(d => buckets(d._2))
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val rawCounts = docs.flatMap(d => buckets(d._2))
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val tt = tgtCounts.values.sum; val tr = rawCounts.values.sum
    def lam(bk: Long): Double =
      math.log((tgtCounts.getOrElse(bk, 0L) + 1.0) / (tt + B)) -
        math.log((rawCounts.getOrElse(bk, 0L) + 1.0) / (tr + B))
    val expected0 = BigDecimal(buckets("the cat sat on the mat").map(lam).sum)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val got0 = Graft.dsirWeights(df, "id", "text", tgt, "text", buckets = 256)
      .filter($"id" === 0L).head().getDouble(1)
    assert(math.abs(got0 - expected0) < 1e-9, s"got $got0, expected $expected0")
  }

  test("dsirWeights scoring is shuffle-free (ratio table broadcast, corpus unshuffled)") {
    val df = corpus
    val plan = Graft.dsirWeights(df, "id", "text",
      df.filter($"kind" === "tgt"), "text", buckets = 128)
      .queryExecution.executedPlan.toString
    // the histograms run eagerly inside the call (driver-assembled lam
    // table); the RETURNED plan is the scoring pass alone — a kernel
    // over the corpus with no hash exchange at all (the only exchange
    // Spread.widen may add for a narrow test input is round-robin)
    assert(!plan.contains("Exchange hashpartitioning"),
      s"unexpected corpus shuffle in:\n$plan")
    assert(plan.contains("MapPartitions"), s"expected kernel scoring:\n$plan")
  }

  // ----- weightedSample -----

  test("weightedSample selects k rows, reproducibly, favoring heavy weights") {
    val df = (0L until 400L)
      .map(i => (i, if (i < 40) 1000.0 else 1.0)).toDF("id", "w")
    val out = Graft.weightedSample(df, "id", "w", 60).collect()
    assert(out.length === 60)
    assert(out.map(_.getLong(2)).sorted.toSeq === (1L to 60L))
    // the 40 heavy rows are ~1000x likelier: essentially all must appear
    val heavy = out.map(_.getLong(0)).count(_ < 40L)
    assert(heavy >= 38, s"expected nearly all heavy rows sampled, got $heavy")
    // deterministic across partitionings
    val again = Graft.weightedSample(df.repartition(11), "id", "w", 60).collect()
    assert(out.map(r => (r.getLong(0), r.getLong(2))).toSet ===
      again.map(r => (r.getLong(0), r.getLong(2))).toSet)
  }

  test("weightedSample excludes non-positive weights and plans a top-k, not a global sort") {
    val df = (0L until 100L).map(i => (i, if (i % 2 == 0) 0.0 else 2.0)).toDF("id", "w")
    val out = Graft.weightedSample(df, "id", "w", 100).collect()
    assert(out.length === 50 && out.forall(_.getLong(0) % 2 === 1))
    val plan = Graft.weightedSample(df, "id", "w", 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"expected top-k plan:\n$plan")
  }

  test("weightedSamplePerStratum: k per stratum, same key as the global sampler, " +
    "WindowGroupLimit plan") {
    val df = (0L until 300L)
      .map(i => (s"s${i % 3}", i, (i % 7 + 1).toDouble)).toDF("g", "id", "w")
    val out = Graft.weightedSamplePerStratum(df, "g", "id", "w", 15).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(3)))
    assert(out.length === 45)
    assert(out.groupBy(_._1).forall { case (_, rows) =>
      rows.map(_._3).sorted.toSeq == (1L to 15L) })
    // within one stratum the kept set equals the global sampler run on
    // that stratum alone (shared key => shared selection)
    val s0global = Graft.weightedSample(df.filter($"g" === "s0"), "id", "w", 15)
      .collect().map(_.getLong(0)).toSet
    assert(out.filter(_._1 == "s0").map(_._2).toSet === s0global)
    val plan = Graft.weightedSamplePerStratum(df, "g", "id", "w", 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), s"expected map-side top-k:\n$plan")
  }

  // ----- psiDrift -----

  test("psiDrift is ~0 for identical snapshots and large for disjoint ones") {
    val a = (0L until 300L).map(i => (i, s"c${i % 3}")).toDF("id", "cat")
    val same = Graft.psiDrift(a, a, "cat").agg(sum(abs($"psi"))).head().getDouble(0)
    assert(same < 1e-6, s"identical snapshots must have ~zero PSI, got $same")

    val b = (0L until 300L).map(i => (i, s"d${i % 3}")).toDF("id", "cat")
    val disj = Graft.psiDrift(a, b, "cat").agg(sum($"psi")).head().getDouble(0)
    assert(disj > 0.25, s"disjoint categories must flag major shift, got $disj")
  }

  test("psiDrift handles one-sided categories with finite terms and keeps counts") {
    val a = Seq((1L, "x"), (2L, "x"), (3L, "y")).toDF("id", "cat")
    val b = Seq((4L, "x"), (5L, "z")).toDF("id", "cat")
    val rows = Graft.psiDrift(a, b, "cat").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toList
    assert(rows.map(_._1).toSet === Set("x", "y", "z"))
    val y = rows.find(_._1 == "y").get
    assert((y._2, y._3) === ((1L, 0L)), "one-sided category keeps its raw counts")
    assert(rows.forall(r => !r._4.isNaN && !r._4.isInfinite),
      s"smoothing must keep every term finite: $rows")
    assert(rows.forall(_._4 >= 0.0), "PSI terms are non-negative by construction")
  }

  // ----- unicodeNormalize -----

  test("unicodeNormalize composes NFC and folds accents, passing through ß/Ł/œ") {
    val df = Seq(
      (0L, "Café naïve"), // decomposed e+acute, i+diaeresis
      (1L, "Café naïve"),             // precomposed — same NFC
      (2L, "straße Łódź cœur"),
      (3L, null.asInstanceOf[String])
    ).toDF("id", "text")
    val out = Graft.unicodeNormalize(df, "id", "text").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getString(2))).toMap
    assert(out(0L) === out(1L), "decomposed and precomposed input must normalize equal")
    assert(out(0L)._1 === "Café naïve")
    assert(out(0L)._2 === "Cafe naive")
    assert(out(2L)._2 === "straße Łodz cœur",
      "chars without a mark decomposition pass through the fold")
    assert(out(3L) === ("", ""))
  }
}
