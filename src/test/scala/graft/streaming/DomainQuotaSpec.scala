package graft.streaming

import java.nio.file.{Files, Path}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

import graft.SparkTestBase
import graft.api.Graft
import graft.sources.FileStreamClient

/** Streaming per-domain admission quota ([[StreamingQueries.domainQuota]]):
  * quota holds across micro-batches, agrees with the batch
  * [[Graft.domainCap]] when ids arrive in order, and survives a
  * checkpoint restart (a recovered query keeps enforcing counts
  * consumed before the crash). */
class DomainQuotaSpec extends SparkTestBase {
  import spark.implicits._

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("source", StringType)))

  /** (doc_id, source): 3 domains × 20 docs interleaved, id-ordered. */
  private def docs(from: Long, until: Long) =
    (from until until).map(i => (i, s"s${i % 3}")).toDF("doc_id", "source")

  private def produce(root: Path, df: DataFrame): Unit =
    df.orderBy("doc_id")
      .select(to_json(struct(col("doc_id"), col("source"))).as("value"),
        lit(0).cast("int").as("partition"))
      .coalesce(1)
      .write.format("dis")
      .option("client.root", root.toString).option("stream", "docs")
      .mode("append").save()

  private def readDocs(root: Path): DataFrame =
    spark.readStream.format("dis")
      .option("client.root", root.toString)
      .option("stream", "docs")
      .option("startingOffsets", "earliest")
      .option("maxRecordsPerTrigger", "10") // force several triggers
      .load()
      .select(from_json(col("value").cast("string"), docSchema).as("d"))
      .select(col("d.*"))

  private def runQuota(root: Path, ck: Path, name: String, k: Int): Unit = {
    val q = StreamingQueries.domainQuota(spark, readDocs(root), "source", "doc_id", k)
      .writeStream.format("memory").queryName(name)
      .outputMode("append")
      .option("checkpointLocation", ck.toString)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(180000)
  }

  test("quota is enforced across micro-batches and matches batch domainCap " +
    "for id-ordered arrival") {
    val root = Files.createTempDirectory("quota-stream-")
    new FileStreamClient(root).createStream("docs", 1)
    produce(root, docs(0, 60))
    runQuota(root, Files.createTempDirectory("quota-ck-"), "quota1", 7)

    val streamed = spark.table("quota1").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val batch = Graft.domainCap(docs(0, 60), "source", "doc_id", 7)
      .select(col("source"), col("doc_id"), col("rank")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(streamed === batch,
      "ordered arrival must reproduce the batch cap exactly (incl. ranks)")
    assert(streamed.groupBy(_._1).forall(_._2.size == 7))
  }

  test("quota counts survive a checkpoint restart — no double admission") {
    val root = Files.createTempDirectory("quota-restart-")
    new FileStreamClient(root).createStream("docs", 1)
    val ck = Files.createTempDirectory("quota-restart-ck-")
    val out = Files.createTempDirectory("quota-restart-out-").toString

    // the memory sink cannot recover a checkpoint; the restart path
    // needs a fault-tolerant sink, exactly as production would
    def runToParquet(k: Int): Unit = {
      val q = StreamingQueries.domainQuota(spark, readDocs(root), "source", "doc_id", k)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ck.toString)
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination(180000)
    }
    def admitted(): Set[(String, Long, Long)] = spark.read.parquet(out).collect()
      .map(r => (r.getAs[String]("domain"), r.getAs[Long]("id"), r.getAs[Long]("rank"))).toSet

    produce(root, docs(0, 15)) // 5 docs per domain
    runToParquet(7)            // admits all 15 (under quota)
    val run1 = admitted()
    assert(run1.size === 15)

    produce(root, docs(15, 60)) // 15 more per domain arrive later
    runToParquet(7)             // same checkpoint: only 2 more per domain fit
    val all = admitted()
    val run2 = all -- run1
    assert(run2.size === 6, s"expected 2 more admissions per domain, got $run2")
    // recovered counts continue the rank sequence instead of restarting at 1
    assert(run2.forall { case (_, _, rank) => rank == 6L || rank == 7L })
    // the union equals the batch cap over everything that ever arrived
    val batch = Graft.domainCap(docs(0, 60), "source", "doc_id", 7)
      .select(col("source"), col("doc_id"), col("rank")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(all === batch)
  }
}
