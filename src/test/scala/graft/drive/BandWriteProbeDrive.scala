package graft.drive

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Micro-probe of the band-store append cost: how much of
  * [[graft.streaming.IncrementalDedup.admitBatch]]'s per-trigger write
  * time is the dynamic-partition commit (∝ bucket-dir count) vs the
  * data itself. Usage: Test/runMain graft.drive.BandWriteProbeDrive */
object BandWriteProbeDrive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = spark.range(40000).select(col("id").as("doc_id"),
      (col("id") % 16).as("band"), (col("id") * 2654435761L % 1000003).as("bandhash"))
    for (buckets <- Seq(256, 64, 16)) {
      val d = df.withColumn("bucket", pmod(col("bandhash"), lit(buckets.toLong)).cast("int"))
        .localCheckpoint(true)
      val out = java.nio.file.Files.createTempDirectory(s"wt-$buckets-").toString
      val t0 = System.nanoTime()
      d.repartition(col("bucket")).write.mode("append").partitionBy("bucket").parquet(out)
      println(f"== partitionBy $buckets dirs, first append: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      val t1 = System.nanoTime()
      d.repartition(col("bucket")).write.mode("append").partitionBy("bucket").parquet(out)
      println(f"== partitionBy $buckets dirs, second append: ${(System.nanoTime() - t1) / 1e9}%.2f s")
    }
    // flat write baseline
    val flat = df.withColumn("bucket", pmod(col("bandhash"), lit(256L)).cast("int"))
      .localCheckpoint(true)
    val out = java.nio.file.Files.createTempDirectory("wt-flat-").toString
    val t0 = System.nanoTime()
    flat.repartition(col("bucket")).write.mode("append").parquet(out)
    println(f"== flat append: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    spark.stop()
  }
}
