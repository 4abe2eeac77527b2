package graft.drive

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.Trigger
import graft.sources.FileStreamClient
import graft.streaming.StreamingQueries

/** Manual drive of the streaming surface:
  * `sbt "Test/runMain graft.drive.StreamingDrive"`. */
object StreamingDrive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val root = Files.createTempDirectory("sdrive-")
    val client = new FileStreamClient(root)
    client.createStream("ev", 1)
    def js(id: Long, ts: String, v: Double) = {
      val us = java.sql.Timestamp.valueOf(ts).getTime * 1000L
      s"""{"event_id":$id,"ts_us":$us,"user_id":${id % 3},"event_type":"click","value":$v,"props":"{}"}"""
    }
    // 4 hours, one event per 2 minutes
    (0 until 120).foreach { i =>
      client.append("ev", 0, null, js(i, f"2024-05-01 0${i / 30}%d:${(i % 30) * 2}%02d:00", 1.0).getBytes)
    }
    // a 3-hour-late straggler appended at the very end
    client.append("ev", 0, null, js(777, "2024-05-01 00:13:00", 500.0).getBytes)

    val events = StreamingQueries.readEvents(spark, root.toString, "ev",
      Map("maxRecordsPerTrigger" -> "30"))
    val q = StreamingQueries.tumblingCounts(events, "1 hour", "5 minutes")
      .writeStream.format("memory").queryName("win").outputMode("append")
      .option("checkpointLocation", Files.createTempDirectory("ckd-").toString)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    println("BATCHES=" + q.recentProgress.length)
    q.recentProgress.foreach(p => println(s"  trigger rows=${p.numInputRows} watermark=${p.eventTime.get("watermark")}"))
    spark.table("win").orderBy("window_start").collect()
      .foreach(r => println(s"WINDOW ${r.getTimestamp(0)} cnt=${r.getLong(1)} sum=${r.getDouble(2)}"))
    spark.stop()
  }
}
