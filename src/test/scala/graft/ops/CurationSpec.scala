package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.api.Graft

/** Round-9 third-pass operators: per-domain cap, canonical-URL dedup,
  * BM25 retrieval, bucketed interval join, salted skew join, SemDeDup. */
class CurationSpec extends SparkTestBase {
  import spark.implicits._

  // ----- domainCap -----

  test("domainCap keeps exactly min(k, |domain|) smallest ids per domain") {
    val df = (0L until 100L).map(i => (i, s"d${i % 3}")).toDF("id", "dom")
    val out = Graft.domainCap(df, "dom", "id", 5)
    assert(out.count() === 15)
    val perDom = out.groupBy("dom").agg(count(lit(1)).as("n"), max("id").as("mx"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    // domain d0 holds 0,3,6,...; its 5 smallest end at 12, etc.
    assert(perDom === Set(("d0", 5L, 12L), ("d1", 5L, 13L), ("d2", 5L, 14L)))
    val small = Graft.domainCap(df.filter($"id" < 7), "dom", "id", 5)
    assert(small.count() === 7) // caps never pad short domains
  }

  test("domainCap is partitioning-independent and ranks 1..k") {
    val df = (0L until 60L).map(i => (i, s"d${i % 4}")).toDF("id", "dom")
    val a = Graft.domainCap(df, "dom", "id", 7).select("id", "dom", "rank")
    val b = Graft.domainCap(df.repartition(13), "dom", "id", 7).select("id", "dom", "rank")
    assert(a.except(b).isEmpty && b.except(a).isEmpty)
    assert(a.groupBy("dom").agg(max("rank")).collect().forall(_.getLong(1) === 7L))
  }

  test("domainCap plans a WindowGroupLimit (map-side top-k pruning before the exchange)") {
    val df = (0L until 100L).map(i => (i, s"d${i % 3}")).toDF("id", "dom")
    val plan = Graft.domainCap(df, "dom", "id", 5).queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), s"expected WindowGroupLimit in:\n$plan")
  }

  // ----- urlDedup -----

  test("urlDedup collapses case/port/param-order/tracking variants to one keeper") {
    val df = Seq(
      (1L, "HTTP://Site.com/a?b=2&a=1#frag"),
      (2L, "http://site.com:80/a?a=1&b=2"),
      (3L, "http://site.com/a?a=1&utm_source=x&b=2"),
      (4L, "https://other.com/"),
      (5L, "junk"),
      (6L, "also not a url")).toDF("id", "url")
    val out = Graft.urlDedup(df, "id", "url")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getBoolean(2))).toSet
    assert(out === Set(
      (1L, "http://site.com/a?a=1&b=2", true),
      (2L, "http://site.com/a?a=1&b=2", false),
      (3L, "http://site.com/a?a=1&b=2", false),
      (4L, "https://other.com/", true),
      (5L, "", true),  // malformed rows are never dup-collapsed
      (6L, "", true)))
  }

  test("urlDedup keeps exactly one canonical row per parsed URL, all rows retained") {
    val df = (0L until 200L)
      .map(i => (i, s"https://s${i % 5}.com/p?x=${i % 3}")).toDF("id", "url")
    val out = Graft.urlDedup(df, "id", "url").cache()
    assert(out.count() === 200)          // annotation, not a filter
    assert(out.filter($"kept").count() === 15) // 5 hosts x 3 queries
    val keepers = out.filter($"kept").groupBy("norm_url").count().collect()
    assert(keepers.forall(_.getLong(1) === 1L))
    out.unpersist()
  }

  // ----- bm25Search -----

  test("bm25Search ranks the term-dense short doc first; no-match docs absent") {
    val df = Seq(
      (1L, "spark spark spark"),
      (2L, "spark flink other words here make this longer"),
      (3L, "nothing relevant at all"),
      (4L, "spark")).toDF("id", "text")
    val out = Graft.bm25Search(df, "id", "text", Seq("spark"), 10)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(out.map(_._1).toSet === Set(1L, 2L, 4L)) // doc 3 never matches
    assert(out.sortBy(_._2).map(_._1).head === 1L)  // tf=3, short doc wins
  }

  test("bm25Search sums per-term scores and respects k with id tie-break") {
    val df = (0L until 50L).map(i => (i, if (i % 2 == 0) "a b" else "a")).toDF("id", "text")
    val out = Graft.bm25Search(df, "id", "text", Seq("a", "b"), 7).collect()
    assert(out.length === 7)
    // two-term docs (even ids) outscore one-term docs; ties break on id
    assert(out.map(_.getLong(0)).toSeq === Seq(0L, 2L, 4L, 6L, 8L, 10L, 12L))
    assert(out.map(_.getLong(2)).toSeq === (1L to 7L))
  }

  // ----- rangeJoin -----

  test("rangeJoin equals the brute-force interval join (inclusive bounds)") {
    val ev = (0L until 300L)
      .map(i => (i, new java.sql.Timestamp(1700000000000L + i * 60000L)))
      .toDF("eid", "ts")
    val iv = (0L until 20L).map { j =>
      val s = 1700000000000L + j * 700000L
      (j, new java.sql.Timestamp(s), new java.sql.Timestamp(s + 1500000L))
    }.toDF("ivid", "s", "e")
    val fast = Graft.rangeJoin(ev, "ts", iv, "s", "e", 600L)
      .select("eid", "ivid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = ev.join(iv, $"ts" >= $"s" && $"ts" <= $"e")
      .select("eid", "ivid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(fast === brute && fast.nonEmpty)
    // inclusive on both ends: an event exactly at a boundary matches
    val bEv = Seq((99L, new java.sql.Timestamp(1700000000000L))).toDF("eid", "ts")
    val bIv = Seq((7L, new java.sql.Timestamp(1700000000000L),
      new java.sql.Timestamp(1700000000000L))).toDF("ivid", "s", "e")
    assert(Graft.rangeJoin(bEv, "ts", bIv, "s", "e", 3600L).count() === 1)
  }

  test("rangeJoin plans an equi-join on the bucket — no nested loop, no cartesian") {
    val ev = (0L until 50L)
      .map(i => (i, new java.sql.Timestamp(1700000000000L + i * 60000L))).toDF("eid", "ts")
    val iv = (0L until 5L).map { j =>
      (j, new java.sql.Timestamp(1700000000000L + j * 600000L),
        new java.sql.Timestamp(1700000000000L + j * 600000L + 900000L))
    }.toDF("ivid", "s", "e")
    val plan = Graft.rangeJoin(ev, "ts", iv, "s", "e", 600L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"interval join fell back to a nested loop:\n$plan")
  }

  // ----- skewJoin -----

  test("skewJoin result is exactly the plain equi-join, salts spread a hot key") {
    // one hot key (0) carrying 80% of the big side
    val big = (0L until 500L).map(i => (i, if (i < 400) 0L else i % 7)).toDF("rid", "k")
    val small = (0L until 7L).map(k => (k, s"v$k")).toDF("k", "payload")
    val salted = Graft.skewJoin(big, small, "k", "rid", 8)
      .select("rid", "k", "payload")
    val plain = big.join(small, "k").select("rid", "k", "payload")
    assert(salted.except(plain).isEmpty && plain.except(salted).isEmpty)
    assert(salted.count() === plain.count())
    // the hot key's rows really do land on multiple salts
    val saltsUsed = big.filter($"k" === 0L)
      .select(pmod(xxhash64($"rid"), lit(8L))).distinct().count()
    assert(saltsUsed > 4, s"salting failed to spread the hot key: $saltsUsed salts")
  }

  test("skewJoin holds without AQE/broadcast (the regime it exists for)") {
    val prev = (spark.conf.get("spark.sql.autoBroadcastJoinThreshold"),
      spark.conf.get("spark.sql.adaptive.enabled"))
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val big = (0L until 200L).map(i => (i, i % 3)).toDF("rid", "k")
      val small = (0L until 3L).map(k => (k, k * 10)).toDF("k", "ten")
      val salted = Graft.skewJoin(big, small, "k", "rid", 4).select("rid", "k", "ten")
      val plain = big.join(small, "k").select("rid", "k", "ten")
      assert(salted.except(plain).isEmpty && plain.except(salted).isEmpty)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev._1)
      spark.conf.set("spark.sql.adaptive.enabled", prev._2)
    }
  }

  // ----- semDedup -----

  /** Clustered fixture: `groups` tight clusters of `per` vectors each,
    * plus lone outliers — near-dups exist only within a cluster. */
  private def clusteredVecs(groups: Int, per: Int, dim: Int): Seq[(Long, Array[Float])] = {
    val rnd = new scala.util.Random(42)
    val centers = Array.fill(groups, dim)(rnd.nextGaussian().toFloat)
    (0 until groups).flatMap { g =>
      (0 until per).map { j =>
        val v = centers(g).map(c => c + 0.02f * rnd.nextGaussian().toFloat)
        ((g * per + j).toLong, v)
      }
    } ++ (0 until groups).map { g =>
      (1000L + g, Array.fill(dim)(rnd.nextGaussian().toFloat))
    }
  }

  test("semDedup: every dropped id has a kept lower-id cell-mate at cos >= tau; " +
    "kept rows have no lower-id cell-mate above tau") {
    val data = clusteredVecs(6, 8, 16)
    val df = data.toDF("vec_id", "embedding")
      .select($"vec_id", $"embedding".cast("array<float>").as("embedding"))
    val tau = 0.9
    val kept = Graft.semDedup(df, "vec_id", "embedding", tau,
      Ivf.Params(nlist = 8)).cache()
    val keptIds = kept.select("vec_id").as[Long].collect().toSet
    assert(keptIds.size < data.size, "fixture must actually drop near-dups")

    // reconstruct the home-cell assignment + exact cosines locally
    val cells = kept.collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    val byId = data.toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      d / math.sqrt(na) / math.sqrt(nb)
    }
    // kept witness-freedom: no kept pair in the SAME cell above tau with order violation
    for ((idA, cA) <- cells; (idB, cB) <- cells if idA < idB && cA == cB)
      assert(cos(byId(idA), byId(idB)) < tau + 1e-9,
        s"kept pair ($idA,$idB) in cell $cA above tau")
    kept.unpersist()
  }

  test("semDedup drops are a subset of complete embedNearDup participants " +
    "and the result is partitioning-independent") {
    val data = clusteredVecs(5, 6, 16)
    val df = data.toDF("vec_id", "embedding")
      .select($"vec_id", $"embedding".cast("array<float>").as("embedding"))
    val tau = 0.9
    val kept1 = Graft.semDedup(df, "vec_id", "embedding", tau, Ivf.Params(nlist = 8))
      .select("vec_id").as[Long].collect().toSet
    val kept2 = Graft.semDedup(df.repartition(11), "vec_id", "embedding", tau,
      Ivf.Params(nlist = 8)).select("vec_id").as[Long].collect().toSet
    assert(kept1 === kept2, "semDedup must be deterministic under repartitioning")
    val dropped = data.map(_._1).toSet -- kept1
    // completeness reference: every drop must be explainable by a real
    // near-dup pair (embedNearDup finds ALL pairs at cos >= tau)
    val pairs = Graft.embedNearDup(df, "vec_id", "embedding", tau)
      .select("id_a", "id_b").collect()
      .flatMap(r => Seq(r.getLong(0) -> r.getLong(1))).toSet
    for (d <- dropped)
      assert(pairs.exists { case (a, b) => b == d && a < d },
        s"dropped $d has no lower-id near-dup witness in the complete pair set")
  }
}
