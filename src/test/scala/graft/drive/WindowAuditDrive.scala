package graft.drive

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.window.WindowExec

/** One-off audit: dump every WindowExec's partition/order spec across
  * the whole gate so the PlanSpec stratum-window pin can be tuned
  * against the real corpus instead of guessed. */
object WindowAuditDrive {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def expand(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => p +: expand(a.executedPlan)
      case _ => p +: p.children.flatMap(expand)
    }
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val plan = fn(spark, dir).queryExecution.executedPlan
        expand(plan).collect { case w: WindowExec => w }.foreach { w =>
          val part = w.partitionSpec.map(_.sql).mkString(",")
          val ord = w.orderSpec.map(_.sql).mkString(",")
          val chunky = w.child.toString.contains("__chunk")
          val aggs = expand(w.child).collect {
            case a: org.apache.spark.sql.execution.aggregate.BaseAggregateExec =>
              a.groupingExpressions.map(_.sql).mkString("|")
          }
          val wgl = w.child.toString.contains("WindowGroupLimit")
          println(s"WIN\t$name\tpart=[$part]\torder=[$ord]\tchunkChild=$chunky" +
            s"\twgl=$wgl\taggGrains=[${aggs.mkString(" ; ")}]")
        }
      } catch { case e: Throwable =>
        println(s"ERR\t$name\t${e.getMessage}")
      }
    }
    spark.stop()
  }
}
