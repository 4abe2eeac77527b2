package graft.drive

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Timing evidence for IncrementalEmbedDedup's per-batch cost claim:
  * admission cost tracks the BATCH (plus candidates), not the admitted
  * history — vs the naive alternative of re-running corpus-wide
  * embedNearDup on every crawl drop, which must grow with history.
  *
  * The fixture embeddings are isotropic (no clusters, no near-dups —
  * the vacuous regime for an IVF index; see BASELINE.md), so the drive
  * derives a CLUSTERED corpus from them: 64 tight families (unit spike
  * on axis id%64 + 0.5·unit(fixture embedding) as within-family
  * spread), with ~6% of later vectors planted as near-dups of batch-1
  * vectors so history rejection does real work every trigger. Results
  * land in BASELINE.md. */
object AdmitScaleDrive {
  private val Dim = 64
  private val T = 0.92

  /** Clustered derivation: spike + half-weight unit noise from the
    * row's own fixture embedding. Amplified fixture ids are scattered
    * over [0, 9·10⁹], so rows are re-keyed by dense rank first — the
    * drive batches on contiguous id ranges. */
  private def clustered(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("vec_id"))
    val emb = graft.ops.Tables.embeddings(spark, dir)
      .select((row_number().over(w) - 1).cast("long").as("vec_id"), col("embedding"))
    val enc = org.apache.spark.sql.Encoders.row(StructType(Seq(
      StructField("vec_id", LongType), StructField("vec", ArrayType(FloatType)))))
    val base = emb.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val e = r.getSeq[Float](1).toArray
        var ss = 0.0
        var i = 0
        while (i < e.length) { ss += e(i) * e(i); i += 1 }
        val inv = if (ss == 0.0) 0.0 else 0.5 / math.sqrt(ss)
        val v = new Array[Float](Dim)
        i = 0
        while (i < Dim) { v(i) = (e(i % e.length) * inv).toFloat; i += 1 }
        val fam = (id % Dim).toInt
        v(fam) = v(fam) + 1.0f
        Row(id, v.toSeq)
      }
    }(enc)
    // plant near-dups: ids ≥ 2000 with id % 16 == 7 become a tiny
    // perturbation of a batch-1 vector, so every later batch carries
    // ~6% history near-dups
    val dupIds = base.filter(col("vec_id") >= 2000 && pmod(col("vec_id"), lit(16)) === 7)
      .select(col("vec_id").as("dup_id"),
        // deterministic batch-1 target, steered off the planted-dup ids
        when(pmod(col("vec_id") * 31 % 2000, lit(16)) === 7,
          col("vec_id") * 31 % 2000 - 1)
          .otherwise(col("vec_id") * 31 % 2000).as("base_id"))
    val dups = dupIds.join(base.withColumnRenamed("vec_id", "base_id"), Seq("base_id"))
      .select(col("dup_id").as("vec_id"),
        transform(col("vec"), (x, i) =>
          when(i === Dim - 1, x + lit(0.02f)).otherwise(x)).as("vec"))
    base.join(dupIds.select(col("dup_id").as("vec_id")), Seq("vec_id"), "left_anti")
      .unionByName(dups)
  }

  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "target/sf1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.streaming.IncrementalEmbedDedup

    val corpus = clustered(spark, dir).localCheckpoint(true)
    val n = corpus.count()
    val batchSize = 2000L
    val store = java.nio.file.Files.createTempDirectory("admitscale-").toString
    val ivf = graft.ops.Ivf.Params(nlist = Dim)

    println(s"ADMITSCALE dir=$dir n=$n batch=$batchSize t=$T")
    var k = 0L
    while (k * batchSize < n) {
      val batch = corpus.filter(col("vec_id") >= k * batchSize &&
        col("vec_id") < (k + 1) * batchSize)
      val histBefore = if (k == 0) 0L
        else IncrementalEmbedDedup.admittedVecs(spark, store).count()
      val t0 = System.nanoTime()
      val admitted = IncrementalEmbedDedup
        .admitBatch(batch, "vec_id", "vec", T, store, ivf).count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"ADMITSCALE batch=$k hist=$histBefore admitted=$admitted sec=$sec%.2f")
      k += 1
    }

    // the naive alternative at the same trigger points: re-run
    // corpus-wide embedNearDup over everything seen so far
    for (k <- Seq(1L, 3L, 5L, 10L)) {
      val seen = corpus.filter(col("vec_id") < k * batchSize)
      val t0 = System.nanoTime()
      val pairs = graft.api.Graft.embedNearDup(seen, "vec_id", "vec", T, ivf).count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"ADMITSCALE naive k=$k rows=${k * batchSize} pairs=$pairs sec=$sec%.2f")
    }
    spark.stop()
  }
}
