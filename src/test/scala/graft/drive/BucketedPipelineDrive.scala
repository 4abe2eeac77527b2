package graft.drive

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Times the repeated-join curation-pipeline shape (docs ⋈ dedup
  * verdicts ⋈ quality scores → filter → agg) at sf1 in its two
  * storage layouts:
  *
  *  - SHUFFLED: all three inputs plain parquet — every join exchanges
  *    both sides on doc_id (the default a naive pipeline pays on every
  *    re-join against the corpus);
  *  - BUCKETED: all three written `bucketBy(32, doc_id)` once — every
  *    subsequent join is exchange-free (asserted on the executed plan,
  *    the BucketedJoinSpec pipeline test's invariant at drive scale).
  *
  * At 100 TB the bucketed write is paid once per corpus version while
  * the pipeline re-joins per-doc side tables dozens of times, so the
  * per-join delta here is the recurring saving. Results → BASELINE.md.
  *
  * Timings are min-of-3 with autoBroadcastJoinThreshold = -1 on BOTH
  * forms: verdict/score tables are corpus-cardinality (one row per
  * doc), so at production scale neither side broadcasts — forcing the
  * non-broadcast path at sf1 measures the regime the layout targets.
  */
object BucketedPipelineDrive {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "target/sf1"
    val buckets = if (args.length > 1) args(1).toInt else 32

    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // the corpus side carries TEXT through the joins — the 100 TB
    // reality (the pipeline joins verdicts to decide which text to
    // keep): the shuffled form moves the wide column through every
    // doc_id exchange, the bucketed form never shuffles it at all
    val docs = graft.ops.Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"), col("lang"), col("n_chars"))
    def verdictsOf(d: DataFrame): DataFrame = d.select(col("doc_id"),
      (pmod(xxhash64(col("doc_id")), lit(100L)) < 80L).as("keep"))
    def scoresOf(d: DataFrame): DataFrame = d.select(col("doc_id"),
      (col("n_chars").cast("double") / 1000.0).as("score"))

    def pipeline(d: DataFrame, v: DataFrame, s: DataFrame): DataFrame =
      d.join(v, "doc_id").join(s, "doc_id")
        .filter(col("keep"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n"), round(sum(col("score")), 4).as("sum_score"),
          // text must SURVIVE the joins (column pruning would otherwise
          // drop it and hide the wide-shuffle cost being measured)
          sum(length(col("text")).cast("long")).as("chars"))

    def time(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    def minOf3(body: => Unit): Double = (1 to 3).map(_ => time(body)).min

    // ---- shuffled form (plain parquet inputs) ----
    // materialize the side tables as parquet too, so both forms read
    // the same bytes and differ ONLY in bucketing metadata
    verdictsOf(docs).write.mode("overwrite").parquet("target/bpd/verdicts_plain")
    scoresOf(docs).write.mode("overwrite").parquet("target/bpd/scores_plain")
    val vPlain = spark.read.parquet("target/bpd/verdicts_plain")
    val sPlain = spark.read.parquet("target/bpd/scores_plain")
    val shuffled = minOf3 {
      pipeline(docs, vPlain, sPlain)
        .write.format("noop").mode("overwrite").save()
    }
    val shuffledPlan = pipeline(docs, vPlain, sPlain)
      .queryExecution.executedPlan.toString
    val shuffledExchanges = "Exchange hashpartitioning\\(doc_id".r
      .findAllIn(shuffledPlan).size

    // ---- bucketed form ----
    // ONE file per bucket (pre-repartition on the bucket key): with
    // multiple files per bucket Spark must re-sort each bucket at read
    // time and the layout only saves the exchange; with exactly one
    // sorted file per bucket the scan exposes outputOrdering too and
    // the SMJ elides BOTH the exchanges and the sorts
    def writeBucketed(d: DataFrame, name: String): Unit =
      d.repartition(buckets, col("doc_id"))
        .write.bucketBy(buckets, "doc_id").sortBy("doc_id")
        .mode("overwrite").saveAsTable(name)
    val writeCost = time {
      writeBucketed(docs, "bpd_docs")
      writeBucketed(verdictsOf(docs), "bpd_verdicts")
      writeBucketed(scoresOf(docs), "bpd_scores")
    }
    val bucketedDf = pipeline(spark.table("bpd_docs"),
      spark.table("bpd_verdicts"), spark.table("bpd_scores"))
    val bucketedPlan = bucketedDf.queryExecution.executedPlan.toString
    val joinPart = bucketedPlan.substring(bucketedPlan.indexOf("Join"))
    require(!joinPart.contains("Exchange"),
      s"bucketed pipeline joins still exchange:\n$bucketedPlan")
    val bucketed = minOf3 {
      pipeline(spark.table("bpd_docs"), spark.table("bpd_verdicts"),
        spark.table("bpd_scores"))
        .write.format("noop").mode("overwrite").save()
    }

    // parity
    val a = bucketedDf.collect().map(_.toString).sorted.toSeq
    val b = pipeline(docs, vPlain, sPlain).collect().map(_.toString).sorted.toSeq
    require(a == b, "bucketed vs shuffled pipeline results diverge")

    println(s"""{"drive":"bucketed_pipeline","dir":"$dir","buckets":$buckets,""" +
      s""""shuffled_sec":$shuffled,"shuffled_doc_id_exchanges":$shuffledExchanges,""" +
      s""""bucketed_sec":$bucketed,"bucketed_join_exchanges":0,""" +
      s""""bucketed_write_sec":$writeCost,"rows":${a.length}}""")

    Seq("bpd_docs", "bpd_verdicts", "bpd_scores")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    spark.stop()
  }
}
