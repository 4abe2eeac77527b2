package graft.drive

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession

/** Dumps `.explain("formatted")` for the named queries to
  * plans/r19/<query>_<tag>.txt — the optimization round's before/after
  * plan evidence. Usage:
  *   sbt "Test/runMain graft.drive.PlanDumpR19 <tag> <q1,q2,...>"
  * Runs at sf0.01 (plan shape, not data scale, is the evidence; AQE
  * initial plans are identical across SFs for these queries).
  */
object PlanDumpR19 {
  def main(args: Array[String]): Unit = {
    val tag = if (args.nonEmpty) args(0) else "before"
    val names = if (args.length > 1) args(1).split(',').map(_.trim).filter(_.nonEmpty).toSeq
                else Seq.empty
    val dir = if (args.length > 2) args(2) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get("plans/r19"))
    names.foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, dir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.write(Paths.get(s"plans/r19/${name}_$tag.txt"), txt.getBytes("UTF-8"))
      println(s"wrote plans/r19/${name}_$tag.txt (${txt.length} chars)")
    }
    spark.stop()
  }
}
