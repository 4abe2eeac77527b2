package graft.ops

import graft.SparkTestBase

/** Distributed logistic regression vs a sequential reference: same
  * full-batch GD arithmetic locally, plus separable-corpus accuracy
  * and the scoring kernel's determinism. */
class LogRegSpec extends SparkTestBase {
  import spark.implicits._

  /** Sequential full-batch GD on the same featurization. */
  private def refTrain(docs: Seq[(Double, String)], numFeatures: Int,
                       epochs: Int, lr: Double): Array[Double] = {
    def featurize(t: String): Array[(Int, Double)] = {
      val m = scala.collection.mutable.HashMap.empty[Int, Double]
      t.split(" ").filter(_.nonEmpty).foreach { w =>
        val f = java.lang.Math.floorMod(
          graft.api.Graft.polyHash(w), numFeatures.toLong).toInt
        m.update(f, m.getOrElse(f, 0.0) + 1.0)
      }
      m.toArray.sortBy(_._1)
    }
    val w = new Array[Double](numFeatures + 1)
    val n = docs.size.toDouble
    for (_ <- 1 to epochs) {
      val grad = new Array[Double](numFeatures + 1)
      docs.foreach { case (y, t) =>
        val fs = featurize(t)
        var z = w(numFeatures)
        fs.foreach { case (f, tf) => z += w(f) * tf }
        val resid = 1.0 / (1.0 + math.exp(-z)) - y
        fs.foreach { case (f, tf) => grad(f) += resid * tf }
        grad(numFeatures) += resid
      }
      var i = 0
      while (i < w.length) { w(i) -= lr * grad(i) / n; i += 1 }
    }
    w
  }

  private def corpus(n: Int): Seq[(Long, Double, String)] = {
    val rnd = new scala.util.Random(41)
    val pos = Vector("good", "great", "clean", "clear", "useful")
    val neg = Vector("spam", "junk", "noise", "broken", "garbled")
    val common = Vector("the", "data", "row", "table", "query")
    (0 until n).map { i =>
      val y = i % 2
      val loaded = if (y == 1) pos else neg
      val words = (0 until 12).map { j =>
        if (j % 3 == 0) common(rnd.nextInt(common.size))
        else loaded(rnd.nextInt(loaded.size))
      }
      (i.toLong, y.toDouble, words.mkString(" "))
    }
  }

  test("train matches the sequential reference within 1e-6 per weight") {
    val docs = corpus(200)
    val df = docs.toDF("id", "y", "text").repartition(7)
    val got = LogReg.train(df, "y", "text", numFeatures = 64, epochs = 3)
    val want = refTrain(docs.map(d => (d._2, d._3)), 64, 3, 0.5)
    assert(got.length === want.length)
    got.zip(want).zipWithIndex.foreach { case ((g, w), i) =>
      assert(math.abs(g - w) < 1e-6, s"weight $i: $g vs $w")
    }
  }

  test("separable corpus: >= 95% held-out accuracy after 3 epochs") {
    val docs = corpus(300)
    val (trainD, test) = docs.splitAt(240)
    val w = LogReg.train(trainD.toDF("id", "y", "text"), "y", "text",
      numFeatures = 64, epochs = 3)
    val preds = LogReg.score(test.toDF("id", "y", "text"), "id", "text", w, 64)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val correct = test.count(d => preds(d._1) === d._2.toLong)
    assert(correct >= (test.size * 0.95).toInt, s"$correct/${test.size}")
  }

  test("score is partitioning-independent and rejects mis-sized weights") {
    val docs = corpus(50).toDF("id", "y", "text")
    val w = LogReg.train(docs, "y", "text", numFeatures = 64, epochs = 2)
    val a = LogReg.score(docs, "id", "text", w, 64).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSet
    val b = LogReg.score(docs.repartition(9), "id", "text", w, 64).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSet
    assert(a === b)
    intercept[IllegalArgumentException] {
      LogReg.score(docs, "id", "text", w, 128)
    }
  }

  test("trainFixed is partitioning-INVARIANT (exact longs, not a 1e-6 " +
      "tolerance) and learns the separable corpus") {
    val docs = corpus(240)
    val df = docs.toDF("id", "y", "text")
    val w1 = LogReg.trainFixed(df.repartition(1), "y", "text", numFeatures = 64)
    val w7 = LogReg.trainFixed(df.repartition(7), "y", "text", numFeatures = 64)
    assert(w1.toSeq === w7.toSeq,
      "fixed-point gradients are exact integer sums — any partitioning " +
        "must give bit-identical weights, unlike the float path")
    // the quantization must not cost the classifier its signal
    val test = corpus(300).drop(240)
    val preds = LogReg.scoreFixed(test.toDF("id", "y", "text"), "id", "text",
      w1, numFeatures = 64)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val correct = test.count(d => preds(d._1) === d._2.toLong)
    assert(correct >= (test.size * 0.95).toInt, s"$correct/${test.size}")
  }

  test("fixed path vs float path: same task, overwhelmingly agreeing " +
      "predictions (the rational sigmoid surrogate shifts probabilities, " +
      "not the learned separation)") {
    val docs = corpus(200)
    val df = docs.toDF("id", "y", "text")
    val wFloat = LogReg.train(df, "y", "text", numFeatures = 64, epochs = 3)
    val wFixed = LogReg.trainFixed(df, "y", "text", numFeatures = 64)
    val pFloat = LogReg.score(df, "id", "text", wFloat, 64)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val pFixed = LogReg.scoreFixed(df, "id", "text", wFixed, 64)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val agree = docs.count(d => pFloat(d._1) === pFixed(d._1))
    assert(agree >= (docs.size * 0.98).toInt, s"$agree/${docs.size}")
  }

  test("null/empty text scores by bias alone") {
    val docs = corpus(50).toDF("id", "y", "text")
    val w = LogReg.train(docs, "y", "text", numFeatures = 64, epochs = 2)
    val out = LogReg.score(
      Seq((1L, ""), (2L, null.asInstanceOf[String])).toDF("id", "text"),
      "id", "text", w, 64)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val bias = 1.0 / (1.0 + math.exp(-w(64)))
    val want = BigDecimal(bias).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(1L) === want && out(2L) === want)
  }
}
