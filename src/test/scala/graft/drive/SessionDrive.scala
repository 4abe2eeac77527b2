package graft.drive

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.sources.FileStreamClient
import graft.streaming.StreamingQueries

/** Drives the custom-state sessionizer: two separated bursts, then an
  * out-of-order bridging event that must MERGE them into one session. */
object SessionDrive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4").config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val root = Files.createTempDirectory("sess-drive-")
    val c = new FileStreamClient(root)
    c.createStream("ev", 1)
    def js(id: Long, ts: String) = {
      val us = java.sql.Timestamp.valueOf(ts).getTime * 1000L
      s"""{"event_id":$id,"ts_us":$us,"user_id":1,"event_type":"c","value":1.0,"props":"{}"}"""
    }
    // burst A 10:00-10:05, burst B 10:40-10:45 (gap 35min > 30 => 2 sessions)
    c.append("ev", 0, null, js(1, "2024-06-01 10:00:00").getBytes)
    c.append("ev", 0, null, js(2, "2024-06-01 10:05:00").getBytes)
    c.append("ev", 0, null, js(3, "2024-06-01 10:40:00").getBytes)
    c.append("ev", 0, null, js(4, "2024-06-01 10:45:00").getBytes)
    // BRIDGE arrives late (within watermark): 10:25 joins A and B into ONE session
    c.append("ev", 0, null, js(5, "2024-06-01 10:25:00").getBytes)
    // advance watermark far past everything so the merged session closes
    c.append("ev", 0, null, js(6, "2024-06-01 14:00:00").getBytes)

    val events = StreamingQueries.readEvents(spark, root.toString, "ev",
      Map("maxRecordsPerTrigger" -> "2")) // several triggers; bridge in its own trigger
    val q = StreamingQueries
      .sessionizeWithState(spark, events, "30 minutes", "1 hour") // admits the 10:25 bridge, closes by 13:00
      .toDF()
      .select(col("user_id"), timestamp_micros(col("start_us")).as("s"),
        timestamp_micros(col("end_us")).as("e"), col("n_events"))
      .writeStream.format("memory").queryName("sess").outputMode("append")
      .option("checkpointLocation", Files.createTempDirectory("sess-ck-").toString)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    spark.table("sess").orderBy("s").collect()
      .foreach(r => println(s"SESSION ${r.getTimestamp(1)} -> ${r.getTimestamp(2)} n=${r.getLong(3)}"))
    spark.stop()
  }
}
