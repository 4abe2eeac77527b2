package graft.drive

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import graft.sources.FileStreamClient

object SplitDrive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4").config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val root = Files.createTempDirectory("split-")
    val c = new FileStreamClient(root)
    c.createStream("s", 1)
    (0 until 50).foreach(i => c.append("s", 0, null, s"v$i".getBytes))
    def read(opts: (String, String)*) = {
      val r = spark.read.format("dis").option("client.root", root.toString).option("stream", "s")
      opts.foldLeft(r) { case (a, (k, v)) => a.option(k, v) }.load()
    }
    println("SPLIT-0=" + read("maxRecordsPerPartition" -> "0").rdd.getNumPartitions)       // 0 = no split
    println("SPLIT-NEG=" + read("maxRecordsPerPartition" -> "-5").rdd.getNumPartitions)    // negative = no split
    println("SPLIT-7=" + read("maxRecordsPerPartition" -> "7").rdd.getNumPartitions + " rows=" +
      read("maxRecordsPerPartition" -> "7").count())                                        // ceil(50/7)=8
    // combined with explicit ranges
    val ranged = read("maxRecordsPerPartition" -> "10", "offsetRanges" -> """{"s":{"0":[5,45]}}""")
    println("SPLIT-RANGED=" + ranged.rdd.getNumPartitions + " rows=" + ranged.count())      // 40 rows / 10 = 4 tasks
    try read("maxRecordsPerPartition" -> "abc").count()
    catch { case e: Throwable => println("SPLIT-BAD=" + e.getMessage.take(60)) }
    spark.stop()
  }
}
