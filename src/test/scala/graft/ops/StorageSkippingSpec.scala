package graft.ops

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Storage-layout evidence: clustering data on the filter key at WRITE
  * time turns parquet min/max row-group statistics into a data-skipping
  * index — the reader proves selective scans touch a fraction of the
  * rows a scattered layout forces through. This is the single cheapest
  * 100 TB lever the engine controls (sort-on-write costs one shuffle
  * once; every selective scan after that skips forever). */
class StorageSkippingSpec extends SparkTestBase {

  private def scanRows(df: DataFrame): Long = {
    df.collect()
    def unwrap(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => unwrap(a.executedPlan)
      case s: FileSourceScanExec => Seq(s)
      case other => other.children.flatMap(unwrap)
    }
    unwrap(df.queryExecution.executedPlan).map(_.metrics("numOutputRows").value).sum
  }

  test("sorted-on-key writes let selective scans skip row groups; " +
      "scattered writes read everything") {
    val events = Tables.events(spark, "/root/testdata/sf0.01")
    val total = events.count()
    val root = Files.createTempDirectory("skip-").toString

    // tiny row groups so the 10k-row fixture has many min/max units
    events.orderBy(col("event_id"))
      .coalesce(1)
      .write.option("parquet.block.size", 64 * 1024)
      .parquet(s"$root/sorted")
    // same data, same row-group size, scattered order (hash of id)
    events.orderBy(pmod(col("event_id") * 2654435761L, lit(9973L)))
      .coalesce(1)
      .write.option("parquet.block.size", 64 * 1024)
      .parquet(s"$root/scattered")

    def selective(path: String): DataFrame =
      spark.read.parquet(path)
        .filter(col("event_id") >= 4000L && col("event_id") < 4400L)

    val sortedRead = scanRows(selective(s"$root/sorted"))
    val scatteredRead = scanRows(selective(s"$root/scattered"))
    val expected = selective(s"$root/sorted").count()

    assert(expected === selective(s"$root/scattered").count(),
      "layouts must hold identical data")
    // scattered: every row group overlaps [4000, 4400) → full read
    assert(scatteredRead >= (total * 9) / 10,
      s"scattered layout unexpectedly skipped: $scatteredRead of $total")
    // sorted: only the row groups covering the range survive the
    // min/max check — a small multiple of the true result
    assert(sortedRead < total / 4,
      s"sorted layout did not skip: $sortedRead of $total")
    assert(sortedRead >= expected, "scan cannot output fewer rows than the answer")
  }
}
