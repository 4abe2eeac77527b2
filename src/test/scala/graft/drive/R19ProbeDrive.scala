package graft.drive

import org.apache.spark.sql.SparkSession

/** Round-19 optimization probes: interleaved in-JVM A/B timings that
  * survive this VM's multi-minute host-steal windows better than
  * separate bench invocations (inter-JVM variance measured 3.25→8.2 s
  * on an identical binary). Usage:
  *   Test/runMain graft.drive.R19ProbeDrive <probe> [reps]
  * Probes print `TIME <label>#i <sec>` lines plus a MIN summary.
  */
object R19ProbeDrive {
  def main(args: Array[String]): Unit = {
    val probe = if (args.nonEmpty) args(0) else "pagerank"
    val reps = if (args.length > 1) args(1).toInt else 5
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val best = scala.collection.mutable.LinkedHashMap[String, Double]()
    def t(name: String)(b: => Unit): Unit = {
      val t0 = System.nanoTime(); b
      val s = (System.nanoTime() - t0) / 1e9
      best(name) = math.min(best.getOrElse(name, Double.MaxValue), s)
      println(f"TIME $name $s%.3f")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    // untimed warm pass: codegen/parquet-footer first-touch
    noop(graft.SparkEntry.queries("q_join_enrich")(spark, dir))

    probe match {
      case "pagerank" =>
        for (i <- 1 to reps; bc <- Seq("false", "true")) {
          spark.conf.set("spark.graft.pagerank.noBroadcast", bc)
          val label = if (bc == "true") "shuffle" else "bcast"
          t(label) { noop(graft.ops.MiningQueries.qPagerank(spark, dir)) }
        }
      case q =>
        val fn = graft.SparkEntry.queries(q)
        for (i <- 1 to reps) t(q) { noop(fn(spark, dir)) }
    }
    for ((k, v) <- best) println(f"MIN $k $v%.3f")
    spark.stop()
  }
}
