package graft.drive

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the claim q_decontaminate_bloom exists for: the Bloom
  * prefilter cuts the SHUFFLE VOLUME of decontamination, not (at small
  * scale) its wall-clock. Runs exact and bloom decontamination on an
  * sf dir and reports total shuffle bytes written + elapsed for each.
  * `sbt "Test/runMain graft.drive.BloomDrive target/sf1"`. */
object BloomDrive {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "target/sf1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    @volatile var shuffleBytes = 0L
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        shuffleBytes += sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten
    })

    val docs = graft.ops.Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"))
    val bench = docs.filter(pmod(col("doc_id"), lit(97)) === 0)
    val train = docs.filter(pmod(col("doc_id"), lit(97)) =!= 0)

    def measure(name: String)(mk: => org.apache.spark.sql.DataFrame): Long = {
      // listener events are async: give the bus a beat to settle before
      // and after the measured action (a drive, not a unit test)
      Thread.sleep(1000)
      shuffleBytes = 0L
      val t0 = System.nanoTime()
      val hits = mk.agg(sum(col("contaminated"))).collect()(0).getLong(0)
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(1000)
      println(f"$name%-8s shuffleMB=${shuffleBytes / 1e6}%9.1f  sec=$sec%6.2f  contaminated=$hits")
      hits
    }

    // warm-up (file listing, codegen) outside the measured runs
    train.count(); bench.count()
    val e = measure("exact") {
      graft.api.Graft.decontaminate(train, "doc_id", "text", bench, "text", 4)
    }
    val b = measure("bloom") {
      graft.api.Graft.decontaminateBloom(train, "doc_id", "text", bench, "text", 4, 0.01)
    }
    require(e == b, s"exact ($e) and bloom ($b) disagree")
    spark.stop()
  }
}
