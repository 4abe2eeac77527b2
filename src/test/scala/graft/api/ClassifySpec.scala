package graft.api

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Learning/aggregation semantics of the classification + profiling
  * operators. The gate pins cross-engine arithmetic; these pin that
  * the operators actually do their jobs: NB separates a separable
  * corpus, cross-dedup only ever pairs across sides, profile counts
  * what a hand count says. */
class ClassifySpec extends SparkTestBase {
  import spark.implicits._

  private def corpus(n: Int) = {
    // Two classes with disjoint vocabulary + shared filler: trivially
    // separable, so a working NB must score ≥ 90% held-out accuracy.
    val r = new scala.util.Random(42)
    (0 until n).map { i =>
      val cls = if (i % 2 == 0) "good" else "spam"
      val vocab =
        if (cls == "good") Array("insight", "method", "result", "proof", "data")
        else Array("buy", "click", "free", "winner", "offer")
      val words = Array.fill(12)(vocab(r.nextInt(vocab.length))) ++
        Array("the", "and") // shared filler both classes see
      (i.toLong, words.mkString(" "), cls)
    }.toDF("id", "body", "cls")
  }

  test("nbTrain/nbScore separate a separable corpus at >= 90% held-out accuracy") {
    val docs = corpus(200).cache()
    val train = docs.filter($"id" < 150)
    val test = docs.filter($"id" >= 150)
    val model = Graft.nbTrain(train, "cls", "body", numFeatures = 256)
    val scored = Graft.nbScore(test, "id", "body", model, numFeatures = 256)
    val joined = scored.join(docs.select($"id", $"cls"), "id")
    val acc = joined.filter($"pred_label" === $"cls").count().toDouble /
      joined.count()
    assert(acc >= 0.9, s"held-out accuracy $acc")
  }

  test("nbTrain model is bounded at labels x (numFeatures + 3) and priors sum to 1") {
    val docs = corpus(100)
    val model = Graft.nbTrain(docs, "cls", "body", numFeatures = 64).cache()
    assert(model.count() <= 2L * (64 + 3))
    // the hash width rides in the model (feature = -3) for nbScore to check
    assert(model.filter($"feature" === -3L && $"logprob" === 64d).count() === 2)
    // one prior row (feature = -1) and one unseen default (-2) per label
    val priors = model.filter($"feature" === -1L)
      .select($"label", exp($"logprob").as("p")).collect()
    assert(priors.length === 2)
    val mass = priors.map(_.getDouble(1)).sum
    assert(math.abs(mass - 1.0) < 1e-9, s"prior mass $mass")
    assert(model.filter($"feature" === -2L).count() === 2)
    // every likelihood is a proper log-probability (negative)
    assert(model.filter($"feature" >= 0L && $"logprob" >= 0d).count() === 0)
  }

  test("nbScore rejects a numFeatures that differs from the trained width") {
    val docs = corpus(40)
    val model = Graft.nbTrain(docs, "cls", "body", numFeatures = 64)
    for (wrong <- Seq(32, 128)) { // smaller would crash, larger would mis-hash
      val e = intercept[IllegalArgumentException] {
        Graft.nbScore(docs, "id", "body", model, wrong)
      }
      assert(e.getMessage.contains("numFeatures"))
    }
  }

  test("nbScore is partitioning-independent and scores empty/null docs by prior alone") {
    val docs = corpus(60)
    val model = Graft.nbTrain(docs, "cls", "body", numFeatures = 128)
    val withEmpty = docs.select($"id", $"body")
      .union(Seq((999L, "")).toDF("id", "body"))
      .union(Seq((998L, null.asInstanceOf[String])).toDF("id", "body"))
    val a = Graft.nbScore(withEmpty, "id", "body", model, 128)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    val b = Graft.nbScore(withEmpty.repartition(7), "id", "body", model, 128)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(a === b)
    // empty and NULL docs: score == round(ln(prior of predicted class), 4)
    val priors = model.filter($"feature" === -1L)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    for (docId <- Seq(999L, 998L)) {
      val empty = a.find(_._1 == docId).get
      assert(math.abs(empty._3 -
        BigDecimal(priors(empty._2)).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    }
  }

  test("crossNearDup pairs only across sides and agrees with self-join dedup") {
    val base = "the quick brown fox jumps over the lazy dog again and again for good measure today"
    val other = "completely different content about spark streams and offsets and backpressure windows"
    val newDf = Seq((1L, base + " ok"), (3L, other), (5L, "unique snowflake text nothing shared at all"))
      .toDF("k", "body")
    val refDf = Seq((2L, base), (4L, other + " indeed"), (6L, "another unrelated reference document entirely"))
      .toDF("k", "body")
    val pairs = Graft.crossNearDup(newDf, refDf, "k", "body", 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((1L, 2L), (3L, 4L)), pairs)
    // self-join on the union finds the same cross pairs (and possibly
    // same-side ones); cross must be exactly its cross-side subset
    val union = newDf.union(refDf)
    val self = Graft.minhashDupes(union, "k", "body", 0.5)
      .collect().flatMap(r => Seq((r.getLong(0), r.getLong(1)), (r.getLong(1), r.getLong(0)))).toSet
    val crossOfSelf = self.filter(p => p._1 % 2 == 1 && p._2 % 2 == 0)
    assert(pairs === crossOfSelf)
  }

  test("profile matches a hand count including nulls; approx variant tracks exact") {
    val df = Seq[(java.lang.Long, String)](
      (1L, "a"), (2L, "b"), (null, "b"), (4L, null), (4L, "c"))
      .toDF("num", "s")
    val p = Graft.profile(df, Seq("num"), Seq("s"))
      .collect().map(r => r.getString(0) -> r).toMap
    val num = p("num"); val s = p("s")
    assert(num.getLong(1) === 5 && num.getLong(2) === 1) // rows, nulls
    assert(num.getLong(3) === 3)                         // distinct non-null
    assert(num.getDouble(4) === 1.0 && num.getDouble(5) === 4.0)
    assert(s.getLong(2) === 1 && s.getLong(3) === 3)
    assert(s.getString(6) === "a" && s.getString(7) === "c")
    val ap = Graft.profileApprox(df, Seq("num"), Seq("s"))
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(ap("num") === 3 && ap("s") === 3) // HLL exact at tiny cardinality
  }
}
