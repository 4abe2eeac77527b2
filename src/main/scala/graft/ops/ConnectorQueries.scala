package graft.ops

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.FileStreamClient

/** Puts the DSv2 connector itself under the DuckDB oracle gate:
  * `events` rows are produced into a file-backed stream through the
  * sink (O22 analog), read back through the batch scan (O1), parsed
  * and aggregated. The oracle computes the same aggregate straight
  * from the raw table, so sink partitioning, offset assignment and
  * scan-side decoding are all on the hook for exactness. */
object ConnectorQueries {

  def qDisRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val root = Files.createTempDirectory("dis-roundtrip-")
    val parts = 8
    new FileStreamClient(root).createStream("events", parts)

    Tables.events(spark, dir)
      .select(
        col("event_id").cast("string").as("key"),
        col("event_type").as("value"),
        pmod(col("user_id"), lit(parts)).cast("int").as("partition"))
      .write.format("dis")
      .option("client.root", root.toString).option("stream", "events")
      .mode("append").save()

    spark.read.format("dis")
      .option("client.root", root.toString).option("stream", "events")
      .load()
      .select(col("partition"), col("value").cast("string").as("event_type"))
      .groupBy(col("partition"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
  }

  val oracle: String =
    """SELECT (user_id % 8)::INT AS partition, event_type, count(*) AS cnt
      |FROM events GROUP BY 1, 2""".stripMargin
}
