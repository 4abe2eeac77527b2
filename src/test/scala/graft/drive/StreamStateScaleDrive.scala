package graft.drive

import java.nio.file.{Files, Path}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

/** Flat-cost evidence for the streaming state arms (the
  * AdmitScaleDrive/ChunkScaleDrive methodology applied to
  * [[graft.streaming.StreamingSft]], [[graft.streaming.StreamingBestOfN]]
  * and [[graft.streaming.StreamingRlMetrics]]): feed N equal-size
  * micro-batches through each query — history grows ~N× across the run
  * — and pin that PER-BATCH wall time stays flat, i.e. per-trigger cost
  * tracks the batch, not the processed history or the emitted output.
  * Each batch advances event time by an hour, so the watermark closes
  * the previous batch's sessions/pools every trigger and keyed state
  * stays bounded by one batch's open keys. Results land in BASELINE.md.
  */
object StreamStateScaleDrive {
  private val Users = 400
  private val PerBatch = 20000
  private val Hour = 3600L * 1000000L
  private val T0 = 1600000000L * 1000000L

  def main(args: Array[String]): Unit = {
    val nBatches = if (args.nonEmpty) args(0).toInt else 10
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.sources.FileStreamClient

    /** Batch k: every user gets PerBatch/Users turns 30 s apart inside
      * hour k — one gap-session per (user, batch), closed by batch k+1's
      * watermark. The pool key (event_type) is BATCH-SCOPED (`gen-k`):
      * a prompt's candidate pool is bounded in time, so batch k's pools
      * go quiet and the watermark closes them at batch k+1 — keyed
      * state stays one batch's open pools while history grows N×.
      * value is a deterministic pseudo-score. */
    def batchDf(k: Int): DataFrame = {
      val rows = (0 until PerBatch).map { i =>
        val u = (i % Users).toLong
        val seq = i / Users
        val ts = T0 + k * Hour + seq * 30L * 1000000L
        val eid = (k.toLong * PerBatch + i).toLong
        val v = ((eid * 1103515245L + 12345L) % 10000L).toDouble / 100.0
        (u, ts, eid, (if (i % 3 == 0) "gen-" else "chat-") + k,
          s"""{"k":$seq}""", v)
      }
      spark.createDataFrame(rows).toDF(
        "user_id", "ts_us", "event_id", "event_type", "props", "value")
    }

    def produce(root: Path, k: Int): Unit =
      batchDf(k)
        .select(to_json(struct(col("user_id"), col("ts_us"), col("event_id"),
          col("event_type"), col("props"), col("value"))).as("value"),
          lit(0).cast("int").as("partition"))
        .coalesce(1)
        .write.format("dis")
        .option("client.root", root.toString).option("stream", "ev")
        .mode("append").save()

    val evSchema = StructType(Seq(
      StructField("user_id", LongType), StructField("ts_us", LongType),
      StructField("event_id", LongType), StructField("event_type", StringType),
      StructField("props", StringType), StructField("value", DoubleType)))

    def readEvents(root: Path): DataFrame =
      spark.readStream.format("dis")
        .option("client.root", root.toString).option("stream", "ev")
        .option("startingOffsets", "earliest")
        .load()
        .select(from_json(col("value").cast("string"), evSchema).as("e"))
        .select(col("e.user_id"), timestamp_micros(col("e.ts_us")).as("ts"),
          col("e.event_id"), col("e.event_type"), col("e.props"), col("e.value"))

    // each arm gets its OWN stream root + checkpoint + sink (batches
    // are produced once per arm), so per-batch timings are fully
    // independent — no shared read path to contend on
    case class Arm(name: String, root: Path, ck: Path, out: String,
        build: DataFrame => DataFrame)
    def mkArm(name: String)(build: DataFrame => DataFrame): Arm = {
      val root = Files.createTempDirectory(s"ssd-$name-")
      new FileStreamClient(root).createStream("ev", 1)
      Arm(name, root, Files.createTempDirectory(s"ssd-$name-ck-"),
        Files.createTempDirectory(s"ssd-$name-out-").toString, build)
    }
    val arms = Seq(
      mkArm("sft")(ev => graft.streaming.StreamingSft
        .assembleSessions(spark, ev, watermark = "10 minutes").toDF()),
      mkArm("bon")(ev => graft.streaming.StreamingBestOfN
        .selectBest(spark, ev, quietUs = 30L * 60 * 1000000, watermark = "10 minutes").toDF()),
      mkArm("rlm")(ev => graft.streaming.StreamingRlMetrics
        .monitor(spark, ev, quietUs = 30L * 60 * 1000000, watermark = "10 minutes").toDF()))

    println(s"STREAMSCALE users=$Users perBatch=$PerBatch batches=$nBatches")
    val times = Array.fill(arms.length)(List.empty[Double])
    for (k <- 0 until nBatches) {
      arms.zipWithIndex.foreach { case (arm, ai) =>
        produce(arm.root, k)
        val t0 = System.nanoTime()
        val q = arm.build(readEvents(arm.root))
          .writeStream.format("parquet")
          .option("path", arm.out)
          .option("checkpointLocation", arm.ck.toString)
          .outputMode("append")
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination(300000)
        val sec = (System.nanoTime() - t0) / 1e9
        times(ai) ::= sec
        println(f"STREAMSCALE arm=${arm.name} batch=$k hist=${(k + 1) * PerBatch} sec=$sec%.2f")
      }
    }
    arms.zipWithIndex.foreach { case (arm, ai) =>
      val ts = times(ai).reverse.toArray
      val head = ts.take(3).min
      val tail = ts.takeRight(3).min
      val emitted = spark.read.parquet(arm.out).count()
      println(f"STREAMSCALE summary arm=${arm.name} firstMin=$head%.2f " +
        f"lastMin=$tail%.2f ratio=${tail / head}%.2f emitted=$emitted")
    }
    spark.stop()
  }
}
