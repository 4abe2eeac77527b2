package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Specs for the post-training data family (RlQueries). The gate
  * hash-checks each query against DuckDB; these pin the semantic
  * invariants the hash cannot articulate — argmax really is the group
  * max, hard negatives really are the nearest impostors, curriculum
  * stages really are monotone in difficulty.
  */
class RlSpec extends SparkTestBase {

  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("best-of-n: chosen is the group argmax, margin is the runner-up gap, " +
      "pools partition the event table") {
    val bon = RlQueries.qBestOfN(spark, dir).cache()
    val ev = Tables.events(spark, dir)
      .select($"user_id", $"event_type", $"event_id", $"value")

    // chosen score equals the group max, chosen id is IN the group
    val groupMax = ev.groupBy($"user_id", $"event_type")
      .agg(max($"value").as("true_max"), count(lit(1)).as("true_n"))
    val joined = bon.join(groupMax, Seq("user_id", "event_type"))
    assert(joined.filter($"best_score" =!= $"true_max").count() === 0L)
    assert(joined.filter($"n_candidates" =!= $"true_n").count() === 0L)
    assert(bon.join(ev,
      bon("user_id") === ev("user_id") && bon("event_type") === ev("event_type") &&
        bon("best_event_id") === ev("event_id") && bon("best_score") === ev("value"))
      .count() === bon.count())

    // margin: non-negative, zero iff the runner-up ties (or pool of 1),
    // and best_score - margin is an achievable score in the pool
    assert(bon.filter($"margin" < 0.0).count() === 0L)
    val multi = bon.filter($"n_candidates" > 1)
    val runnerUp = multi.join(ev, Seq("user_id", "event_type"))
      .filter($"event_id" =!= $"best_event_id")
      .groupBy($"user_id", $"event_type", $"best_score", $"margin")
      .agg(max($"value").as("second"))
    assert(runnerUp.filter($"best_score" - $"second" =!= $"margin").count() === 0L)

    // pools partition events: every (user, type) pair appears exactly once
    assert(bon.count() === ev.select($"user_id", $"event_type").distinct().count())
    bon.unpersist()
  }

  test("pass@k: matches the exact BigInt binomial estimator, clamps to 1 " +
      "when successes can't be avoided, NULL below pool size") {
    val pk = RlQueries.qPassAtK(spark, dir).cache()
    def choose(n: Long, k: Long): BigInt =
      if (k < 0 || k > n) BigInt(0)
      else (0L until k).map(i => BigInt(n - i)).product /
        (1L to k).map(BigInt(_)).product
    def exact(n: Long, c: Long, k: Long): Option[Double] =
      if (n < k) None
      else Some(1.0 - BigDecimal(choose(n - c, k)).toDouble / BigDecimal(choose(n, k)).toDouble)
    pk.collect().foreach { r =>
      val (n, c) = (r.getLong(2), r.getLong(3))
      Seq((4, 1L), (5, 5L), (6, 10L)).foreach { case (idx, k) =>
        val got = if (r.isNullAt(idx)) None else Some(r.getDouble(idx))
        val want = exact(n, c, k)
        assert(got === want, s"pass@$k for n=$n c=$c")
        // the estimator's boundary semantics
        if (n >= k && n - c < k) assert(got.contains(1.0))
        if (c === 0L && n >= k) assert(got.contains(0.0))
      }
    }
    assert(pk.filter($"pass_at_1" < 0.0 || $"pass_at_1" > 1.0).count() === 0L)
    pk.unpersist()
  }

  test("hard negatives: k nearest different-label vectors, verified " +
      "against a local brute force") {
    val k = 3
    val hn = RlQueries.qHardNegatives(spark, dir).cache()
    val emb = Tables.embeddings(spark, dir)
      .select($"vec_id", $"embedding", $"label").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray, r.getInt(2)))
    val anchors = emb.filter(_._1 < 64)
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) {
        d += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
        i += 1
      }
      BigDecimal(d / math.sqrt(na) / math.sqrt(nb))
        .setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val expected = anchors.flatMap { case (aid, av, albl) =>
      emb.filter(_._3 != albl)
        .map { case (nid, nv, nlbl) => (nid, nlbl.toLong, cos(av, nv)) }
        .sortBy { case (nid, _, c) => (-c, nid) }
        .take(k)
        .zipWithIndex
        .map { case ((nid, nlbl, c), i) => (aid, (i + 1).toLong, nid, nlbl, c) }
    }.toSet
    val got = hn.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
      .toSet
    assert(got === expected)

    // structural: labels always differ from the anchor's, ranks are 1..k
    val lbl = Tables.embeddings(spark, dir).select($"vec_id", $"label")
    assert(hn.join(lbl, hn("anchor_id") === lbl("vec_id"))
      .filter($"neg_label" === $"label".cast("long")).count() === 0L)
    assert(hn.groupBy($"anchor_id").agg(collect_set($"rank").as("rs"))
      .filter(array_sort($"rs") =!= array((1 to k).map(i => lit(i.toLong)): _*))
      .count() === 0L)
    hn.unpersist()
  }

  test("grpo advantages: zero-mean unit-variance per pool (within the " +
      "4-decimal rounding), degenerate pools emit exactly 0") {
    val adv = RlQueries.qGrpoAdv(spark, dir).cache()
    val ev = Tables.events(spark, dir)
      .select($"user_id", $"event_type", $"event_id", $"value")

    // one advantage per candidate, pools preserved
    assert(adv.count() === ev.count())

    // per non-degenerate pool: mean(adv) ~ 0 and var_samp(adv) ~ 1
    // (rounding each adv to 4 decimals moves a k-pool mean < 5e-5 and
    // the variance O(1e-4))
    val pools = adv.filter($"n" > 1)
      .groupBy($"user_id", $"event_type")
      .agg(avg($"adv").as("m"), variance($"adv").as("v"),
        sum(abs($"adv")).as("absum"))
    val nondeg = pools.filter($"absum" > 0.0)
    assert(nondeg.filter(abs($"m") > 5e-5).count() === 0L, "pool mean drifted")
    assert(nondeg.filter(abs($"v" - 1.0) > 1e-3).count() === 0L, "pool variance drifted")

    // degenerate pools (singletons or all-equal scores) are exactly 0
    val deg = ev.groupBy($"user_id", $"event_type")
      .agg(count(lit(1)).as("cnt"), countDistinct($"value").as("dv"))
      .filter($"cnt" === 1 || $"dv" === 1)
    val degAdv = adv.join(deg, Seq("user_id", "event_type"))
    assert(degAdv.filter($"adv" =!= 0.0).count() === 0L)

    // spot-check one pool against a local computation
    val sample = adv.limit(1).collect()(0)
    val (u, et) = (sample.getLong(0), sample.getString(1))
    val vals = ev.filter($"user_id" === u && $"event_type" === et)
      .collect().map(r => (r.getLong(2), r.getDouble(3)))
    val n = vals.length
    if (n > 1) {
      val s = vals.map(_._2).sum
      val s2 = vals.map(v => v._2 * v._2).sum
      val varS = (s2 - s * s / n) / (n - 1)
      val got = adv.filter($"user_id" === u && $"event_type" === et)
        .collect().map(r => (r.getLong(2), r.getDouble(4))).toMap
      vals.foreach { case (eid, v) =>
        val want =
          if (varS <= 0) 0.0
          else math.floor((v - s / n) / math.sqrt(varS) * 1e4 + 0.5) / 1e4
        assert(got(eid) === want, s"pool ($u,$et) event $eid")
      }
    }
    adv.unpersist()
  }

  test("reward drift: spearman of the tie-broken permutations matches a " +
      "local reference; bounds and degenerate pools hold") {
    val rd = RlQueries.qRewardDrift(spark, dir).cache()
    // rho in [-1, 1]; singleton pools NULL
    assert(rd.filter($"spearman" < -1.0 || $"spearman" > 1.0).count() === 0L)
    assert(rd.filter($"n" === 1 && $"spearman".isNotNull).count() === 0L)
    assert(rd.filter($"n" > 1 && $"spearman".isNull).count() === 0L)

    // local exact reference over every pool
    val ev = Tables.events(spark, dir)
      .select($"user_id", $"event_type", $"event_id",
        unix_micros($"ts").as("ts_us"), $"value")
      .collect()
      .map(r => ((r.getLong(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getDouble(4))))
      .groupBy(_._1).view.mapValues(_.map(_._2))
    val got = rd.collect().map(r => ((r.getLong(0), r.getString(1)),
      (r.getLong(2), if (r.isNullAt(3)) None else Some(r.getDouble(3))))).toMap
    ev.foreach { case (key, rows) =>
      val n = rows.length
      val rv = rows.sortBy(t => (t._3, t._1)).zipWithIndex
        .map { case ((eid, _, _), i) => eid -> (i + 1L) }.toMap
      val rt = rows.sortBy(t => (t._2, t._1)).zipWithIndex
        .map { case ((eid, _, _), i) => eid -> (i + 1L) }.toMap
      val d2 = rows.map(t => { val d = rv(t._1) - rt(t._1); d * d }).sum
      val want =
        if (n < 2) None
        else Some(1.0 - 6.0 * d2 / (n.toLong * (n.toLong * n.toLong - 1L)))
      assert(got(key) === ((n.toLong, want)), s"pool $key")
    }
    rd.unpersist()
  }

  test("hard negatives (ivf): probing every cell reproduces the exact " +
      "broadcast kernel bit-for-bit") {
    val emb = Tables.embeddings(spark, dir)
    val panel = emb.filter($"vec_id" < 64)
    val index = Ivf.strideIndex(emb, "vec_id", "embedding")
    val ivf = graft.api.Graft.hardNegativesIvf(
      emb, "vec_id", "embedding", "label", panel, "vec_id", "embedding", "label",
      k = 3, index, nprobe = index.nlist, corpusAssign = 1)
    val exact = graft.api.Graft.hardNegatives(
      emb, "vec_id", "embedding", "label", panel, "vec_id", "embedding", "label", k = 3)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.get(3).toString, r.getDouble(4)))
      .toSet
    assert(rows(ivf) === rows(exact))
  }

  test("hard negatives (ivf): gate parameters (nprobe=8, assign=2) hold " +
      "recall and hardness floors vs the exact kernel on the fixture") {
    val emb = Tables.embeddings(spark, dir)
    val panel = emb.filter(pmod($"vec_id", lit(20)) === 0)
    val exact = graft.api.Graft.hardNegatives(
      emb, "vec_id", "embedding", "label", panel, "vec_id", "embedding", "label", k = 3)
      .select($"anchor_id", $"neg_id", $"cos").cache()
    val ivf = RlQueries.qHardNegativesIvf(spark, dir)
      .select($"anchor_id", $"neg_id", $"cos").cache()
    // every anchor still emits a full k (the probed cells are never
    // so empty that mining starves)
    assert(ivf.groupBy($"anchor_id").count().filter($"count" =!= 3L).count() === 0L)
    val nExact = exact.count()
    val hits = ivf.join(exact, Seq("anchor_id", "neg_id")).count()
    val recall = hits.toDouble / nExact
    // isotropic random vectors are IVF's worst case (no cluster
    // structure to exploit); the floor is the measured behavior of the
    // fixed gate parameters, asserted so a kernel regression shows up
    assert(recall >= 0.25, s"ivf recall $recall collapsed on the fixture")
    // what mining actually needs: the mined negatives are nearly as
    // HARD as the exact ones — mean cos within 10% of the exact top-k
    val hExact = exact.agg(avg($"cos")).head.getDouble(0)
    val hIvf = ivf.agg(avg($"cos")).head.getDouble(0)
    assert(hIvf >= 0.9 * hExact,
      s"ivf hardness $hIvf vs exact $hExact — mined negatives are easy")
    exact.unpersist(); ivf.unpersist()
  }

  test("hard negatives (ivf): clustered corpora (the production case) " +
      "recover near-exact recall at the gate parameters") {
    // 10 tight clusters of 24 around deterministic centers; labels
    // alternate within a cluster so every anchor's hardest negatives
    // sit in its own neighborhood — the geometry IVF cells exploit
    val rng = new scala.util.Random(7)
    val centers = Array.fill(10)(Array.fill(8)(rng.nextGaussian()))
    val rows = (0 until 240).map { i =>
      val c = centers(i / 24)
      val v = c.map(x => (x + 0.05 * rng.nextGaussian()).toFloat)
      (i.toLong, v, i % 2)
    }
    val df = rng.shuffle(rows).toDF("vec_id", "embedding", "label")
    val panel = df.filter(pmod($"vec_id", lit(10)) === 0) // 10% — proportional
    val index = Ivf.strideIndex(df, "vec_id", "embedding")
    val ivf = graft.api.Graft.hardNegativesIvf(
      df, "vec_id", "embedding", "label", panel, "vec_id", "embedding", "label",
      k = 3, index, nprobe = 8, corpusAssign = 2)
      .select($"anchor_id", $"neg_id").cache()
    val exact = graft.api.Graft.hardNegatives(
      df, "vec_id", "embedding", "label", panel, "vec_id", "embedding", "label", k = 3)
      .select($"anchor_id", $"neg_id").cache()
    val recall = ivf.join(exact, Seq("anchor_id", "neg_id")).count().toDouble / exact.count()
    assert(recall >= 0.9, s"clustered recall $recall < 0.9")
    ivf.unpersist(); exact.unpersist()
  }

  test("hard negatives: NULL labels are null-safe mismatches — a " +
      "null-labeled row is a valid negative for a labeled anchor") {
    val df = Seq(
      (1L, Array(1.0f, 0.0f), Some("en")), (2L, Array(0.9f, 0.1f), None),
      (3L, Array(0.5f, 0.5f), Some("en")), (4L, Array(0.0f, 1.0f), None))
      .toDF("vec_id", "embedding", "label")
    val hn = graft.api.Graft.hardNegatives(
      df, "vec_id", "embedding", "label",
      df.filter($"vec_id" === 1L), "vec_id", "embedding", "label", k = 3)
      .collect()
    // negatives of the (1,0) "en" anchor: both null-labeled rows, and
    // NOT vec 3 (same label); nearest first
    assert(hn.map(_.getLong(2)).toSeq === Seq(2L, 4L))
    assert(hn.forall(_.isNullAt(3)))
    // a null-labeled anchor excludes only its null-labeled peers
    val hnNull = graft.api.Graft.hardNegatives(
      df, "vec_id", "embedding", "label",
      df.filter($"vec_id" === 2L), "vec_id", "embedding", "label", k = 3)
      .collect()
    assert(hnNull.map(_.getLong(2)).toSet === Set(1L, 3L))
  }

  test("hard negatives: string-labeled corpora work — labels keep their " +
      "source type instead of silently nulling through a numeric cast") {
    val df = Seq(
      (1L, Array(1.0f, 0.0f), "en"), (2L, Array(0.9f, 0.1f), "en"),
      (3L, Array(0.8f, 0.2f), "de"), (4L, Array(0.0f, 1.0f), "de"))
      .toDF("vec_id", "embedding", "label")
    val hn = graft.api.Graft.hardNegatives(
      df, "vec_id", "embedding", "label",
      df.filter($"vec_id" === 1L), "vec_id", "embedding", "label", k = 2)
      .collect()
    assert(hn.nonEmpty, "string labels silently emitted nothing")
    // nearest different-label vector to (1,0) is vec 3 (de), then vec 4
    assert(hn.map(r => (r.getLong(2), r.getString(3))).toSeq ===
      Seq((3L, "de"), (4L, "de")))
  }

  test("curriculum: bins are the bit length of difficulty, stages are " +
      "monotone easy-to-hard, and stage budgets cover the token mass") {
    val cur = RlQueries.qCurriculum(spark, dir).cache()
    // bin really is the bit length (floor(log2)+1) of the clamped
    // difficulty — checked with integer arithmetic, not float log
    cur.select($"difficulty", $"bin").distinct().collect().foreach { r =>
      val d = math.max(r.getLong(0), 1L)
      assert(r.getLong(1) === java.lang.Long.toBinaryString(d).length.toLong,
        s"difficulty $d binned as ${r.getLong(1)}")
    }
    // stage is monotone non-decreasing in bin and lands in [1, 4]
    val byBin = cur.groupBy($"bin").agg(min($"stage").as("lo"), max($"stage").as("hi"))
      .orderBy($"bin").collect()
    byBin.foreach(r => assert(r.getAs[Long]("lo") === r.getAs[Long]("hi"),
      s"bin ${r.get(0)} maps to two stages"))
    val stages = byBin.map(_.getAs[Long]("hi"))
    assert(stages.head >= 1L && stages.last <= 4L)
    stages.sliding(2).foreach {
      case Array(a, b) => assert(a <= b, "stage decreased with difficulty")
      case _ =>
    }
    // the stage containing a bin is where its cumulative mass falls:
    // replay the prefix locally over the tiny bin table
    val binTok = cur.groupBy($"bin").agg(sum($"difficulty").as("t"))
      .orderBy($"bin").collect().map(r => (r.getAs[Long]("bin"), r.getAs[Long]("t")))
    val total = binTok.map(_._2).sum
    var before = 0L
    binTok.zip(stages).foreach { case ((_, t), st) =>
      assert(st === math.min(before * 4 / math.max(total, 1L) + 1, 4L))
      before += t
    }
    // every document is staged exactly once
    assert(cur.count() ===
      Tables.documents(spark, dir).count())
    cur.unpersist()
  }
}
