package graft.drive

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

import scala.collection.mutable

/** Job-level profile of the q_streaming_neardup gate binding: which of
  * [[graft.streaming.IncrementalDedup.admitBatch]]'s many small Spark
  * jobs actually carry the arm's fixed cost. Usage:
  *   Test/runMain graft.drive.NeardupArmProfileDrive <sfDir>
  * Prints every job with its duration and call site, sorted by cost. */
object NeardupArmProfileDrive {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val starts = mutable.Map[Int, (Long, String)]()
    val done = mutable.ArrayBuffer[(Int, Long, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        starts.synchronized {
          val stages = js.stageInfos.map(si =>
            si.name.takeWhile(_ != '\n').take(60)).mkString(" | ")
          val desc = Option(js.properties).flatMap(p =>
            Option(p.getProperty("spark.job.description"))).getOrElse("")
          starts(js.jobId) = (js.time, s"${desc.take(40)} :: $stages")
        }
      override def onJobEnd(je: SparkListenerJobEnd): Unit =
        starts.synchronized {
          starts.remove(je.jobId).foreach { case (t0, site) =>
            done += ((je.jobId, je.time - t0, site))
          }
        }
    })

    val stageAgg = mutable.Map[String, (Int, Long)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val dur = (for {a <- si.completionTime; b <- si.submissionTime}
          yield a - b).getOrElse(0L)
        val key = si.name.linesIterator.toSeq.headOption.getOrElse("?").take(70)
        stageAgg.synchronized {
          val (c, t) = stageAgg.getOrElse(key, (0, 0L))
          stageAgg(key) = (c + 1, t + dur)
        }
      }
    })

    val t0 = System.nanoTime()
    val out = graft.ops.ConnectorQueries.qStreamingNeardup(spark, sfDir)
    val n = out.count()
    val wall = (System.nanoTime() - t0) / 1e9
    Thread.sleep(500)
    val jobs = done.synchronized(done.toVector)
    println(f"== q_streaming_neardup: $n rows, wall $wall%.1f s, ${jobs.size} jobs ==")
    println(f"== sum of job durations: ${jobs.map(_._2).sum / 1e3}%.1f s ==")
    jobs.sortBy(-_._2).take(12).foreach { case (id, ms, site) =>
      println(f"  job $id%4d  ${ms / 1e3}%6.2f s  $site")
    }
    println("== stage aggregate (count, total s) ==")
    stageAgg.synchronized(stageAgg.toVector).sortBy(-_._2._2).take(35)
      .foreach { case (name, (c, t)) =>
        println(f"  ${t / 1e3}%7.2f s  x$c%-4d $name")
      }
    spark.stop()
  }
}
