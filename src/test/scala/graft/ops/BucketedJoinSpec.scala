package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Co-located join via bucketing — the 100 TB pattern for repeated
  * fact⋈fact joins: both sides bucketed on the join key at write time
  * means the join needs NO shuffle exchange at read time. Proven at
  * the plan level. */
class BucketedJoinSpec extends SparkTestBase {

  test("join of two tables bucketed on the key plans without a shuffle exchange") {
    // default warehouse dir (static conf) is fine: tables dropped in finally
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force non-broadcast path
    try {
      val dir = "/root/testdata/sf0.001"
      Tables.lineitem(spark, dir)
        .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .mode("overwrite").saveAsTable("li_bucketed")
      Tables.orders(spark, dir)
        .withColumnRenamed("o_orderkey", "l_orderkey")
        .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .mode("overwrite").saveAsTable("ord_bucketed")

      val joined = spark.table("li_bucketed")
        .join(spark.table("ord_bucketed"), "l_orderkey")
        .groupBy("o_orderstatus").agg(sum("l_quantity").as("qty"))
      val plan = joined.queryExecution.executedPlan.toString

      assert(plan.contains("SortMergeJoin"), plan)
      // bucketed scans: the join itself needs no exchange (only the
      // final groupBy may shuffle)
      val joinPart = plan.substring(plan.indexOf("SortMergeJoin"))
      assert(!joinPart.contains("Exchange hashpartitioning(l_orderkey"),
        s"join required a shuffle despite bucketing:\n$plan")
      // and it still computes the right thing
      val viaBuckets = joined.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      val direct = Tables.lineitem(spark, dir)
        .join(Tables.orders(spark, dir),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderstatus").agg(sum("l_quantity").as("qty"))
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      assert(viaBuckets === direct)
    } finally {
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS ord_bucketed")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    }
  }

  test("curation pipeline joins (docs ⋈ verdicts ⋈ scores, all bucketed " +
      "on doc_id) plan with ZERO exchanges before the final aggregate") {
    // The repeated-join 100 TB pattern: a curation pipeline joins the
    // corpus against per-doc side tables (dedup verdicts, quality
    // scores) again and again; bucketing all of them on doc_id at
    // write time makes EVERY such join exchange-free, not just one.
    // BucketedPipelineDrive times this shape at sf1 (see BASELINE.md).
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val dir = "/root/testdata/sf0.001"
      val docs = Tables.documents(spark, dir)
        .select(col("doc_id"), col("lang"), col("n_chars"))
      docs.write.bucketBy(8, "doc_id").sortBy("doc_id")
        .mode("overwrite").saveAsTable("docs_b")
      // derived per-doc side tables, same key domain
      docs.select(col("doc_id"),
        (pmod(xxhash64(col("doc_id")), lit(100L)) < 80L).as("keep"))
        .write.bucketBy(8, "doc_id").sortBy("doc_id")
        .mode("overwrite").saveAsTable("verdicts_b")
      docs.select(col("doc_id"),
        (col("n_chars").cast("double") / 1000.0).as("score"))
        .write.bucketBy(8, "doc_id").sortBy("doc_id")
        .mode("overwrite").saveAsTable("scores_b")

      val pipeline = spark.table("docs_b")
        .join(spark.table("verdicts_b"), "doc_id")
        .join(spark.table("scores_b"), "doc_id")
        .filter(col("keep"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n"), round(sum(col("score")), 4).as("s"))
      val plan = pipeline.queryExecution.executedPlan.toString
      // two joins, and no exchange anywhere below the aggregate: the
      // only allowed Exchange is the groupBy(lang) one above both joins
      assert(plan.sliding("SortMergeJoin".length).count(_ == "SortMergeJoin") >= 1, plan)
      val joinPart = plan.substring(plan.indexOf("Join"))
      assert(!joinPart.contains("Exchange"),
        s"a pipeline join required a shuffle despite bucketing:\n$plan")

      // parity with the plain (shuffled) form
      val viaBuckets = pipeline.collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
      val d2 = Tables.documents(spark, dir).select(col("doc_id"), col("lang"), col("n_chars"))
      val plain = d2
        .join(d2.select(col("doc_id"),
          (pmod(xxhash64(col("doc_id")), lit(100L)) < 80L).as("keep")), "doc_id")
        .join(d2.select(col("doc_id"),
          (col("n_chars").cast("double") / 1000.0).as("score")), "doc_id")
        .filter(col("keep"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n"), round(sum(col("score")), 4).as("s"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
      assert(viaBuckets === plain)
    } finally {
      spark.sql("DROP TABLE IF EXISTS docs_b")
      spark.sql("DROP TABLE IF EXISTS verdicts_b")
      spark.sql("DROP TABLE IF EXISTS scores_b")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    }
  }

  test("MISMATCHED bucket counts (8 vs 4): the join re-shuffles by default; " +
      "coalesceBucketsInJoin bridges a power-of-two mismatch exchange-free") {
    // The 100 TB layout contract the exchange-free numbers rest on:
    // Spark's bucket join requires COMPATIBLE bucket counts. When a
    // corpus version doubles its bucket count (files-bounded growth)
    // while a side table keeps the old count, the default planner
    // re-shuffles one side — silently paying the exchange the layout
    // existed to avoid. coalesceBucketsInJoin (ratio <= 4 by default)
    // reads the finer table at the coarser count instead: still
    // exchange-free, at the coarser side's parallelism. Hence the
    // recipe: bucket counts grow by powers of two, never ad-hoc.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val dir = "/root/testdata/sf0.001"
      Tables.lineitem(spark, dir)
        .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .mode("overwrite").saveAsTable("li_b8")
      Tables.orders(spark, dir)
        .withColumnRenamed("o_orderkey", "l_orderkey")
        .write.bucketBy(4, "l_orderkey").sortBy("l_orderkey")
        .mode("overwrite").saveAsTable("ord_b4")
      def joined = spark.table("li_b8")
        .join(spark.table("ord_b4"), "l_orderkey")
        .groupBy("o_orderstatus").agg(sum("l_quantity").as("qty"))

      spark.conf.set("spark.sql.bucketing.coalesceBucketsInJoin.enabled", "false")
      val p1 = joined.queryExecution.executedPlan.toString
      val join1 = p1.substring(p1.indexOf("SortMergeJoin"))
      assert(join1.contains("Exchange hashpartitioning(l_orderkey"),
        s"expected the mismatch to force a shuffle by default:\n$p1")

      spark.conf.set("spark.sql.bucketing.coalesceBucketsInJoin.enabled", "true")
      val p2 = joined.queryExecution.executedPlan.toString
      val join2 = p2.substring(p2.indexOf("SortMergeJoin"))
      assert(!join2.contains("Exchange hashpartitioning(l_orderkey"),
        s"coalesced bucket join still shuffled:\n$p2")
      assert(p2.contains("SelectedBucketsCount") || p2.contains("Coalesced"),
        s"no coalesced-bucket marker in:\n$p2")

      // both plans compute the same result as the unbucketed join
      val direct = Tables.lineitem(spark, dir)
        .join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderstatus").agg(sum("l_quantity").as("qty"))
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      val viaCoalesced = joined.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      assert(viaCoalesced === direct)
    } finally {
      spark.sql("DROP TABLE IF EXISTS li_b8")
      spark.sql("DROP TABLE IF EXISTS ord_b4")
      spark.conf.set("spark.sql.bucketing.coalesceBucketsInJoin.enabled", "false")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    }
  }
}
