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
      case "minhash" =>
        // variants OUTER, reps inner: once the "cache" variant registers
        // the signatures plan, CacheManager substitutes it into every
        // later identical subtree — so the clean variants must run first
        for (mat <- Seq("none", "ckpt", "cache"); i <- 1 to reps) {
          spark.conf.set("spark.graft.minhash.mat", mat)
          t(s"cluster_dedup+$mat") {
            noop(graft.ops.DedupQueries.qClusterDedup(spark, dir)) }
        }
      case "novelty-ab" =>
        // old join-form ngramNovelty inlined for a true in-JVM A/B
        import org.apache.spark.sql.functions._
        def cut4(c: org.apache.spark.sql.Column) =
          floor(c * lit(1e4) + lit(0.5)) / lit(1e4)
        def oldNovelty(): org.apache.spark.sql.DataFrame = {
          val d = graft.ops.Tables.documents(spark, dir)
            .select(col("doc_id"), col("text"))
          val toks = filter(split(col("text"), " "), t => t =!= "")
          val gramsArr = expr(
            "CASE WHEN size(__ts) < 3 THEN array() ELSE transform(sequence(0, size(__ts) - 3), i -> concat_ws(' ', slice(__ts, i + 1, 3))) END")
          val grams = d.select(col("doc_id"), toks.as("__ts"))
            .select(col("doc_id"), explode(array_distinct(gramsArr)).as("__s"))
            .select(col("doc_id"), xxhash64(col("__s")).as("__g"))
          val dfreq = grams.groupBy(col("__g")).agg(count(lit(1)).as("__df"))
          val per = grams.join(dfreq, Seq("__g"))
            .groupBy(col("doc_id"))
            .agg(count(lit(1)).as("__ng"),
              sum(when(col("__df") === 1L, lit(1L)).otherwise(lit(0L))).as("__nov"))
          d.select(col("doc_id")).join(per, Seq("doc_id"), "left")
            .select(col("doc_id"),
              coalesce(col("__ng"), lit(0L)).cast("long").as("n_grams"),
              coalesce(col("__nov"), lit(0L)).cast("long").as("novel_grams"),
              coalesce(cut4(col("__nov").cast("double") / col("__ng").cast("double")),
                lit(0.0)).as("novelty"))
        }
        for (i <- 1 to reps) {
          t("novelty-old-join") { noop(oldNovelty()) }
          t("novelty-new-window") {
            noop(graft.SparkEntry.queries("q_novelty")(spark, dir)) }
        }
      // (the r19 "mat-ab" ckpt-vs-persist probe ran here; outcomes are
      // hardcoded at the call sites now — ngram/phash keep the eager
      // ckpt (2.71 vs 4.33 s / 1.48 vs 2.32 s), packSpanTable persists
      // the span frame (1.29 -> 1.01 s))
      case "srank-ab" =>
        for (mat <- Seq("none", "cache"); i <- 1 to reps;
             q <- Seq("q_rank_funcs", "q_pref_pairs_quality", "q_ntile")) {
          spark.conf.set("spark.graft.srank.mat", mat)
          t(s"$q+$mat") { noop(graft.SparkEntry.queries(q)(spark, dir)) }
        }
      case "rouge-ab" =>
        import org.apache.spark.sql.functions._
        def oldRouge(): org.apache.spark.sql.DataFrame = {
          val d = graft.ops.Tables.documents(spark, dir)
            .select((col("doc_id") / 2).cast("long").as("pair_id"),
              pmod(col("doc_id"), lit(2)).as("side"),
              filter(split(col("text"), " "), t => t =!= "").as("__t"))
          def gramCounts(n: Int): org.apache.spark.sql.DataFrame = {
            val grams =
              if (n == 1) d.select(col("pair_id"), col("side"), explode(col("__t")).as("g"))
              else d.filter(size(col("__t")) >= n)
                .select(col("pair_id"), col("side"),
                  explode(transform(sequence(lit(1), size(col("__t")) - (n - 1)),
                    i => concat_ws(" ", element_at(col("__t"), i), element_at(col("__t"), i + 1)))).as("g"))
            grams.groupBy(col("pair_id"), col("side"), col("g")).agg(count(lit(1)).as("c"))
          }
          val totals = d.groupBy(col("pair_id")).agg(
            sum(when(col("side") === 0, size(col("__t")).cast("long")).otherwise(0L)).as("__tr1"),
            sum(when(col("side") === 1, size(col("__t")).cast("long")).otherwise(0L)).as("__tc1"),
            sum(when(col("side") === 0, greatest(size(col("__t")) - 1, lit(0)).cast("long")).otherwise(0L)).as("__tr2"),
            sum(when(col("side") === 1, greatest(size(col("__t")) - 1, lit(0)).cast("long")).otherwise(0L)).as("__tc2"))
          def overlap(n: Int, name: String): org.apache.spark.sql.DataFrame = {
            val gc = gramCounts(n)
            gc.filter(col("side") === 0).select(col("pair_id"), col("g"), col("c").as("cr"))
              .join(gc.filter(col("side") === 1)
                .select(col("pair_id"), col("g"), col("c").as("cc")), Seq("pair_id", "g"))
              .groupBy(col("pair_id")).agg(sum(least(col("cr"), col("cc"))).as(name))
          }
          def metrics(ov: String, tr: String, tc: String, pfx: String): Seq[org.apache.spark.sql.Column] = {
            val o = coalesce(col(ov), lit(0L)).cast("double")
            val p = when(col(tc) > 0L, o / col(tc).cast("double")).otherwise(0.0)
            val r = when(col(tr) > 0L, o / col(tr).cast("double")).otherwise(0.0)
            Seq(round(p, 6).as(s"${pfx}_p"), round(r, 6).as(s"${pfx}_r"),
              round(when(p + r > 0.0, lit(2.0) * p * r / (p + r)).otherwise(0.0), 6).as(s"${pfx}_f"))
          }
          totals.join(overlap(1, "__ov1"), Seq("pair_id"), "left")
            .join(overlap(2, "__ov2"), Seq("pair_id"), "left")
            .select(col("pair_id") +:
              (metrics("__ov1", "__tr1", "__tc1", "r1") ++
                metrics("__ov2", "__tr2", "__tc2", "r2")): _*)
        }
        for (i <- 1 to reps) {
          t("rouge-old-selfjoin") { noop(oldRouge()) }
          t("rouge-new-condagg") {
            noop(graft.SparkEntry.queries("q_rouge")(spark, dir)) }
        }
      case q =>
        val fn = graft.SparkEntry.queries(q)
        for (i <- 1 to reps) t(q) { noop(fn(spark, dir)) }
    }
    for ((k, v) <- best) println(f"MIN $k $v%.3f")
    spark.stop()
  }
}
