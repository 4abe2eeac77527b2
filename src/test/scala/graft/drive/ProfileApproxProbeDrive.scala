package graft.drive

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe: is q_profile_approx's cost driven by the HLL rsd
  * (register count) or by the per-row imperative update path? */
object ProfileApproxProbeDrive {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val ev = graft.ops.Tables.events(spark, dir)
    ev.count()
    def time(name: String)(body: => Unit): Unit = {
      val best = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
      }.min
      println(f"$name%-24s $best%6.2f s")
    }
    for (rsd <- Seq(0.05, 0.02, 0.01)) {
      time(s"profileApprox rsd=$rsd") {
        graft.api.Graft.profileApprox(ev,
          Seq("event_id", "user_id", "value"), Seq("event_type"), rsd)
          .write.format("noop").mode("overwrite").save()
      }
    }
    time("profile exact") {
      graft.api.Graft.profile(ev,
        Seq("event_id", "user_id", "value"), Seq("event_type"))
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
