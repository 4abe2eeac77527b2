package graft.drive

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import scala.collection.mutable

/** Job-count forensics for [[graft.streaming.IncrementalDedup.admitBatch]]
  * OUTSIDE the streaming wrapper: two direct half-corpus admissions with
  * job descriptions set at the call sites, so the per-phase job counts
  * and durations attribute cleanly. Usage:
  *   Test/runMain graft.drive.AdmitBatchJobsDrive <sfDir> */
object AdmitBatchJobsDrive {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val agg = mutable.Map[String, (Int, Long)]()
    val starts = mutable.Map[Int, (Long, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = starts.synchronized {
        val d = Option(js.properties).flatMap(p =>
          Option(p.getProperty("spark.job.description"))).getOrElse("?")
        starts(js.jobId) = (js.time, d)
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = starts.synchronized {
        starts.remove(je.jobId).foreach { case (t0, d) =>
          val (c, t) = agg.getOrElse(d, (0, 0L))
          agg(d) = (c + 1, t + (je.time - t0))
        }
      }
    })

    val docs = graft.ops.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).cache()
    val n = docs.count()
    val half = docs.filter(col("doc_id") < lit(n / 2)).localCheckpoint(true)
    val rest = docs.filter(col("doc_id") >= lit(n / 2)).localCheckpoint(true)
    val store = java.nio.file.Files.createTempDirectory("adm-jobs-").toString

    def timed(label: String)(f: => Unit): Unit = {
      spark.sparkContext.setJobDescription(label)
      val t0 = System.nanoTime()
      f
      println(f"== $label: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      spark.sparkContext.setJobDescription(null)
    }
    timed("batch1")(
      graft.streaming.IncrementalDedup.admitBatch(half, "doc_id", "text", 0.8, store))
    timed("batch2")(
      graft.streaming.IncrementalDedup.admitBatch(rest, "doc_id", "text", 0.8, store))

    Thread.sleep(500)
    println("== jobs by phase ==")
    agg.synchronized(agg.toVector).sortBy(-_._2._2).foreach { case (d, (c, t)) =>
      println(f"  ${t / 1e3}%7.2f s  x$c%-4d ${d.take(60)}")
    }
    spark.stop()
  }
}
