package graft.drive

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.Trigger
import graft.sources.FileStreamClient

/** Manual end-to-end drive of the format("dis") surface (not a test —
  * run with `sbt "Test/runMain graft.drive.ConnectorDrive"`). */
object ConnectorDrive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val root = Files.createTempDirectory("drive-")
    val client = new FileStreamClient(root)
    client.createStream("clicks", 3)
    for (i <- 0 until 90) client.append("clicks", i % 3, null, s"""{"n":$i}""".getBytes)

    val outRoot = Files.createTempDirectory("drive-out-")
    new FileStreamClient(outRoot).createStream("sink", 2)
    val q = spark.readStream.format("dis")
      .option("client.root", root.toString).option("stream", "clicks")
      .option("maxRecordsPerTrigger", "25").load()
      .selectExpr("cast(value as string) AS value", "cast(key as string) AS key")
      .writeStream.format("dis")
      .option("client.root", outRoot.toString).option("stream", "sink")
      .option("checkpointLocation", Files.createTempDirectory("ck-").toString)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    println("STREAM-PROGRESS-BATCHES=" + q.recentProgress.length)
    val back = spark.read.format("dis")
      .option("client.root", outRoot.toString).option("stream", "sink").load()
    println("SINK-READBACK-COUNT=" + back.count() +
      " DISTINCT=" + back.selectExpr("cast(value as string)").distinct().count())
    try spark.read.format("dis").option("stream", "clicks").load().count()
    catch { case e: Throwable => println("PROBE-MISSING-ROOT=" + e.getMessage.take(80)) }
    try spark.read.format("dis").option("client.root", root.toString).load().count()
    catch { case e: Throwable => println("PROBE-MISSING-STREAM=" + e.getMessage.take(80)) }
    try spark.read.format("dis").option("client.root", root.toString)
      .option("stream", "clicks").option("offsetRanges", "not-json").load().count()
    catch { case e: Throwable => println("PROBE-BAD-JSON=" + e.getMessage.take(110)) }
    spark.read.format("dis").option("client.root", root.toString)
      .option("stream", "clicks").load().groupBy("partition").count().explain()
    spark.stop()
  }
}
