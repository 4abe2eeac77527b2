package graft.streaming

import java.nio.file.{Files, Path}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

import graft.SparkTestBase
import graft.api.Graft
import graft.sources.FileStreamClient

/** Streaming drift monitor ([[StreamingQueries.psiMonitorBatch]]):
  * each micro-batch's report equals the batch-level
  * [[Graft.psiDrift]] of (reference, batch) by construction, an
  * in-distribution batch scores ~0 while a shifted one alerts, and a
  * replayed batch reproduces its rows exactly (state-free). */
class PsiMonitorSpec extends SparkTestBase {
  import spark.implicits._

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("lang", StringType)))

  /** Reference corpus: en/de/fr at 60/30/10. */
  private def refCorpus =
    ((0 until 60).map(i => (i.toLong, "en")) ++
     (60 until 90).map(i => (i.toLong, "de")) ++
     (90 until 100).map(i => (i.toLong, "fr"))).toDF("doc_id", "lang")

  private def produce(root: Path, df: DataFrame): Unit =
    df.orderBy("doc_id")
      .select(to_json(struct(col("doc_id"), col("lang"))).as("value"),
        lit(0).cast("int").as("partition"))
      .coalesce(1)
      .write.format("dis")
      .option("client.root", root.toString).option("stream", "docs")
      .mode("append").save()

  private def readDocs(root: Path, perTrigger: Int): DataFrame =
    spark.readStream.format("dis")
      .option("client.root", root.toString)
      .option("stream", "docs")
      .option("startingOffsets", "earliest")
      .option("maxRecordsPerTrigger", perTrigger.toString)
      .load()
      .select(from_json(col("value").cast("string"), docSchema).as("d"))
      .select(col("d.*"))

  test("per-batch report equals the batch-level psiDrift and alerts on shift") {
    val root = Files.createTempDirectory("psi-stream-")
    new FileStreamClient(root).createStream("docs", 1)
    val out = Files.createTempDirectory("psi-out-").toString
    val ck = Files.createTempDirectory("psi-ck-")

    // batch 0: the reference mix exactly (60/30/10 scaled to 30/15/5);
    // batch 1: disjoint categories (all zh) — must alert
    val b0 = ((0 until 30).map(i => (i.toLong, "en")) ++
      (30 until 45).map(i => (i.toLong, "de")) ++
      (45 until 50).map(i => (i.toLong, "fr"))).toDF("doc_id", "lang")
    val b1 = (50 until 100).map(i => (i.toLong, "zh")).toDF("doc_id", "lang")
    produce(root, b0)
    produce(root, b1)

    val ref = refCorpus.groupBy(col("lang")).agg(count(lit(1)).as("n_a")).persist()
    val batches = scala.collection.mutable.Map[Long, DataFrame]()
    val q = readDocs(root, 50).writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        batches(id) = batch.persist()
        StreamingQueries.psiMonitorBatch(batch, id, "lang", ref)
          .write.mode("append").parquet(out)
      }
      .option("checkpointLocation", ck.toString)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(180000)

    val reports = spark.read.parquet(out)
    assert(reports.select(col("batch_id")).distinct().count() === 2)

    // row-identical to the batch operator applied to (reference, that batch)
    for ((id, b) <- batches) {
      val streamed = reports.filter(col("batch_id") === id).drop("batch_id")
      val direct = Graft.psiDrift(refCorpus, b, "lang")
      assert(streamed.except(direct).isEmpty && direct.except(streamed).isEmpty,
        s"batch $id report must equal psiDrift(reference, batch)")
    }

    // in-distribution batch ~0; disjoint batch over the 0.25 alert bar
    val totals = reports.groupBy(col("batch_id"))
      .agg(sum(abs(col("psi"))).as("t")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // the matching mix is not EXACTLY 0: add-1/2 smoothing acts over
    // different totals (50-doc batch vs 100-doc reference) — measured
    // 1.3e-4, far under the 0.1 "no shift" convention
    val (lo, hi) = (totals.values.min, totals.values.max)
    assert(lo < 0.01, s"matching mix must score ~0, got $totals")
    assert(hi > 0.25, s"disjoint mix must alert, got $totals")
  }
}
