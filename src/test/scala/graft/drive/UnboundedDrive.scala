package graft.drive

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.Trigger
import graft.sources.FileStreamClient

/** Drives the previously-broken default path: streaming with NO rate
  * limit — catch up, new data arrives, resume must consume the delta
  * (the clamp overflow made end==start forever after the first batch). */
object UnboundedDrive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4").config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val root = Files.createTempDirectory("unb-")
    val c = new FileStreamClient(root)
    c.createStream("s", 2)
    (0 until 20).foreach(i => c.append("s", i % 2, null, s"a$i".getBytes))
    val ck = Files.createTempDirectory("unb-ck-").toString
    val out = Files.createTempDirectory("unb-out-").toString
    def run(): Unit = {
      val q = spark.readStream.format("dis")
        .option("client.root", root.toString).option("stream", "s")
        .load() // NO maxRecordsPerTrigger, NO backpressure — the default path
        .selectExpr("cast(value as string) AS value")
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ck)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(60000)
    }
    run()
    println("PHASE1-COUNT=" + spark.read.parquet(out).count())
    (0 until 7).foreach(i => c.append("s", i % 2, null, s"b$i".getBytes))
    run() // resumes from checkpoint with cur > 0: the overflow case
    println("PHASE2-COUNT=" + spark.read.parquet(out).count())
    println("PHASE2-DISTINCT=" + spark.read.parquet(out).select("value").distinct().count())
    spark.stop()
  }
}
