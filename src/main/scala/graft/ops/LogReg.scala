package graft.ops

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.api.Graft

/** Distributed binary logistic regression over hashed token features —
  * the trainable quality classifier one step up from Naive Bayes
  * (fastText-shaped: bag of hashed tokens, linear model, sigmoid).
  *
  * Training is full-batch gradient descent: per epoch, one corpus pass
  * computes every document's margin under the broadcast weight vector
  * and aggregates the per-feature gradient with a keyed sum whose key
  * space is bounded by numFeatures — the corpus itself never shuffles,
  * and the weight vector (numFeatures+1 doubles, bias last) round-trips
  * through the driver once per epoch. That is the classic distributed
  * LR shape: epochs × (broadcast + bounded keyed agg), no per-row
  * state on the driver.
  *
  * Determinism: gradients are float sums over a shuffle — bit-identical
  * only per plan, so train() is reproducible but not
  * partitioning-invariant in the last ulp; tests compare against a
  * local reference within 1e-6. */
object LogReg {

  /** Hashed tf feature pairs of one document: (featureIdx, tf), bias
    * NOT included. */
  private def featurize(text: String, numFeatures: Int): Array[(Int, Double)] = {
    val counts = scala.collection.mutable.HashMap.empty[Int, Double]
    text.split(" ").foreach { w =>
      if (w.nonEmpty) {
        val f = java.lang.Math.floorMod(Graft.polyHash(w), numFeatures.toLong).toInt
        counts.update(f, counts.getOrElse(f, 0.0) + 1.0)
      }
    }
    counts.toArray.sortBy(_._1)
  }

  private def sigmoid(z: Double): Double = 1.0 / (1.0 + math.exp(-z))

  /** Train `epochs` full-batch GD steps from w = 0. `label` must be
    * 0/1 (castable to double). Returns numFeatures+1 weights, bias
    * last. */
  def train(df: DataFrame, label: String, text: String,
            numFeatures: Int = 256, epochs: Int = 3,
            learningRate: Double = 0.5): Array[Double] = {
    val data = df.select(col(label).cast("double"),
      coalesce(col(text), lit(""))).cache()
    val n = data.count().toDouble
    val sc = df.sparkSession.sparkContext
    val w = new Array[Double](numFeatures + 1)
    val enc = Encoders.row(StructType(Seq(
      StructField("f", IntegerType), StructField("g", DoubleType))))
    var epoch = 0
    while (epoch < epochs) {
      val bw = sc.broadcast(w.clone())
      val grad = data.mapPartitions { rows =>
        val wv = bw.value
        rows.flatMap { r =>
          val y = r.getDouble(0)
          val fs = featurize(r.getString(1), numFeatures)
          var z = wv(numFeatures)
          fs.foreach { case (f, tf) => z += wv(f) * tf }
          val resid = sigmoid(z) - y
          fs.iterator.map { case (f, tf) => Row(f, resid * tf) } ++
            Iterator(Row(numFeatures, resid)) // bias gradient
        }
      }(enc)
        .groupBy(col("f")).agg(sum(col("g")).as("g"))
        .collect() // bounded: numFeatures+1 rows
      grad.foreach { r =>
        w(r.getInt(0)) -= learningRate * r.getDouble(1) / n
      }
      epoch += 1
    }
    data.unpersist(false)
    w
  }

  /** Score with a trained weight vector: (id, prob rounded to 4 dp,
    * pred 0/1 at the 0.5 boundary). Broadcast weights + per-row
    * kernel — shuffle-free over a wide corpus ([[Spread.widen]]). */
  def score(df: DataFrame, id: String, text: String,
            weights: Array[Double], numFeatures: Int = 256): DataFrame = {
    require(weights.length == numFeatures + 1,
      s"weights.length ${weights.length} != numFeatures+1 ${numFeatures + 1}")
    val bw = df.sparkSession.sparkContext.broadcast(weights)
    val enc = Encoders.row(StructType(Seq(
      StructField(id, LongType), StructField("prob", DoubleType),
      StructField("pred", LongType))))
    Spread.widen(df.select(col(id).cast("long"), coalesce(col(text), lit(""))))
      .mapPartitions { rows =>
        val wv = bw.value
        rows.map { r =>
          val fs = featurize(r.getString(1), numFeatures)
          var z = wv(wv.length - 1)
          fs.foreach { case (f, tf) => z += wv(f) * tf }
          val p = sigmoid(z)
          Row(r.getLong(0),
            BigDecimal(p).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble,
            if (p >= 0.5) 1L else 0L)
        }
      }(enc)
  }

  /** Gate binding: is-English classifier trained on the fixture's lang
    * tag (en vs rest), 256 hashed features, 3 epochs — then the whole
    * corpus scored. Rows-only gate (iterative float training has no
    * SQL oracle); LogRegSpec pins local-reference parity + separable
    * accuracy. */
  def qLrClassify(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"),
        (col("lang") === "en").cast("double").as("y"))
    val w = train(docs, "y", "text", numFeatures = 256, epochs = 3)
    score(docs, "doc_id", "text", w, numFeatures = 256)
  }
}
