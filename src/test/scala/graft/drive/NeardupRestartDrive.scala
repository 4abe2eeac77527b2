package graft.drive

import java.nio.file.Files
import java.util.concurrent.atomic.AtomicBoolean

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.sources.FileStreamClient
import graft.streaming.IncrementalDedup

/** Gate-level restart drill for the flagship admission arm (VERDICT
  * r16 item 6): the q_streaming_neardup shape — sf1 documents streamed
  * through the dis source in two id-ordered batches into
  * [[IncrementalDedup.admitBatch]] — is KILLED at the worst point
  * (batch 0's admitBatch fully ran, store appends landed, the
  * checkpoint commit never happened), then RESUMED from the same
  * checkpoint. Structured Streaming replays batch 0 against a store
  * that already contains its admitted docs; at-least-once admission
  * converges (replayed docs self-match at Jaccard 1.0 and are
  * rejected, nothing re-appends), batch 1 then runs normally, and the
  * final admitted table must equal the uninterrupted run's EXACTLY.
  *
  * Usage: Test/runMain graft.drive.NeardupRestartDrive [dir=target/sf1]
  */
object NeardupRestartDrive {

  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "target/sf1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // the binding's feed shape: one id-ordered partition, JSON payload
    val docs = graft.ops.Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"))
    val n = docs.count()
    val cap = math.max(250L, (n + 1) / 2) // two id-rank batches
    val root = Files.createTempDirectory("restart-feed-")
    new FileStreamClient(root).createStream("docstext", 1)
    docs.orderBy(col("doc_id"))
      .select(to_json(struct(col("doc_id"), col("text"))).as("value"),
        lit(0).as("partition"))
      .coalesce(1)
      .write.format("dis")
      .option("client.root", root.toString).option("stream", "docstext")
      .mode("append").save()
    println(s"RESTART dir=$dir docs=$n cap=$cap")

    def stream(): DataFrame = spark.readStream.format("dis")
      .option("client.root", root.toString).option("stream", "docstext")
      .option("maxRecordsPerTrigger", cap.toString)
      .load()
      .select(org.apache.spark.sql.functions.from_json(
        col("value").cast("string"),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("doc_id",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("text",
            org.apache.spark.sql.types.StringType)))).as("d"))
      .select(col("d.*"))

    def admittedSet(store: String): Set[Long] =
      IncrementalDedup.admittedDocs(spark, store)
        .select(col("doc_id")).collect().map(_.getLong(0)).toSet

    // ---- clean (uninterrupted) run ----
    val cleanStore = Files.createTempDirectory("restart-clean-").toString
    val q1 = stream().writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        IncrementalDedup.admitBatch(batch, "doc_id", "text", 0.8, cleanStore)
        ()
      }
      .option("checkpointLocation", Files.createTempDirectory("restart-ck-clean-").toString)
      .trigger(Trigger.AvailableNow()).start()
    require(q1.awaitTermination(1200000), "clean run timed out")
    q1.stop()
    val clean = admittedSet(cleanStore)
    println(s"RESTART clean admitted=${clean.size}")

    // ---- killed run: batch 0's admitBatch completes (store appends
    // landed), then the sink throws BEFORE the checkpoint commit ----
    val killStore = Files.createTempDirectory("restart-kill-").toString
    val ck = Files.createTempDirectory("restart-ck-kill-").toString
    val fail = new AtomicBoolean(true)
    val q2 = stream().writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        IncrementalDedup.admitBatch(batch, "doc_id", "text", 0.8, killStore)
        if (batchId == 0 && fail.getAndSet(false))
          throw new RuntimeException("injected kill after batch-0 store append")
        ()
      }
      .option("checkpointLocation", ck)
      .trigger(Trigger.AvailableNow()).start()
    val died = try { q2.awaitTermination(1200000); false }
      catch { case _: org.apache.spark.sql.streaming.StreamingQueryException => true }
    require(died, "injected failure did not kill the query")
    val afterKill = admittedSet(killStore).size
    println(s"RESTART killed after batch 0: store already holds $afterKill docs")

    // ---- resume from the same checkpoint: batch 0 replays against
    // its own output (all rejected), batch 1 runs fresh ----
    val q3 = stream().writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val admitted = IncrementalDedup
          .admitBatch(batch, "doc_id", "text", 0.8, killStore).count()
        println(s"RESTART resumed batch=$batchId rows=${batch.count()} admitted=$admitted")
        ()
      }
      .option("checkpointLocation", ck)
      .trigger(Trigger.AvailableNow()).start()
    require(q3.awaitTermination(1200000), "resumed run timed out")
    q3.stop()

    val resumed = admittedSet(killStore)
    val ok = resumed == clean
    println(s"RESTART final: resumed=${resumed.size} clean=${clean.size} equal=$ok" +
      (if (ok) "" else s" missing=${(clean -- resumed).take(5)} extra=${(resumed -- clean).take(5)}"))
    spark.stop()
    if (!ok) sys.exit(1)
  }
}
