package graft.drive

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.Trigger
import graft.sources.FileStreamClient

/** Drives subscribePattern + backpressure at the format("dis") surface. */
object PatternDrive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val root = Files.createTempDirectory("pat-drive-")
    val c = new FileStreamClient(root)
    for ((s, n) <- Seq(("logs-app", 40), ("logs-web", 25), ("metrics", 99))) {
      c.createStream(s, 2)
      (0 until n).foreach(i => c.append(s, i % 2, null, s"$s#$i".getBytes))
    }
    // batch over pattern
    spark.read.format("dis").option("client.root", root.toString)
      .option("subscribePattern", "logs-.*").load()
      .groupBy("topic").count().collect()
      .foreach(r => println(s"BATCH-TOPIC ${r.getString(0)}=${r.getLong(1)}"))
    // streaming over pattern with backpressure
    val q = spark.readStream.format("dis").option("client.root", root.toString)
      .option("subscribePattern", "logs-.*")
      .option("maxRecordsPerTrigger", "20")
      .option("backpressureEnabled", "true").option("targetTriggerMs", "500")
      .load().selectExpr("topic", "cast(value as string) v")
      .writeStream.format("memory").queryName("pat")
      .option("checkpointLocation", Files.createTempDirectory("pat-ck-").toString)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    println("STREAM-BATCHES=" + q.recentProgress.length)
    spark.table("pat").groupBy("topic").count().collect()
      .foreach(r => println(s"STREAM-TOPIC ${r.getString(0)}=${r.getLong(1)}"))
    spark.stop()
  }
}
