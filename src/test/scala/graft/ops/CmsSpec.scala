package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.api.Graft

/** Count-Min sketch heavy hitters: the one-sided error guarantee and
  * zero false negatives vs exact counts. */
class CmsSpec extends SparkTestBase {
  import spark.implicits._

  private val Dir = "/root/testdata/sf0.001"

  test("estimates dominate exact counts; every true heavy hitter is found") {
    val docs = Tables.documents(spark, Dir).select(col("text"))
    val out = Graft.cmsHeavyHitters(docs, "text", denom = 100L).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out.nonEmpty)
    val exact = docs
      .select(explode(filter(split(col("text"), " "), t => t =!= "")).as("w"))
      .groupBy("w").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = exact.values.sum
    // CMS never underestimates (every occurrence lands in all d cells)
    out.foreach { case (w, est) =>
      assert(est >= exact(w), s"CMS underestimated '$w': $est < ${exact(w)}")
    }
    // and therefore misses no true >=1% hitter
    exact.filter { case (_, c) => c * 100 >= total }.keys.foreach { w =>
      assert(out.contains(w), s"true heavy hitter '$w' missing from CMS output")
    }
  }

  test("sketch error stays within the depth-4 collision envelope") {
    val docs = Tables.documents(spark, Dir).select(col("text"))
    val out = Graft.cmsHeavyHitters(docs, "text", denom = 10000L).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = docs
      .select(explode(filter(split(col("text"), " "), t => t =!= "")).as("w"))
      .groupBy("w").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = exact.values.sum
    // standard CMS bound: err <= e*N/width with prob 1-(1/e)^depth;
    // assert a loose 8x of N/width across the whole output
    val cap = 8L * n / 1024 + 1
    out.foreach { case (w, est) =>
      assert(est - exact(w) <= cap,
        s"'$w' error ${est - exact(w)} exceeds $cap (n=$n)")
    }
  }
}
