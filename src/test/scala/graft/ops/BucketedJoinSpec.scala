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
}
