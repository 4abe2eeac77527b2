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

  // The sink write runs once per (spark app, source dir) — re-planning,
  // explain-then-execute and repeated driver calls reuse the same stream
  // root instead of re-running the write job and leaking a new temp dir.
  // Roots are registered for JVM-exit cleanup BEFORE the write job runs,
  // so a failed write cannot leak its directory; the write executes
  // under a plain lock (not inside ConcurrentHashMap.computeIfAbsent,
  // which would pin a bin lock for the duration of a Spark job).
  private val writtenRoots =
    scala.collection.mutable.Map[(String, String), java.nio.file.Path]()
  private val rootsToClean =
    java.util.concurrent.ConcurrentHashMap.newKeySet[java.nio.file.Path]()
  sys.addShutdownHook {
    rootsToClean.forEach { root =>
      def rm(p: java.nio.file.Path): Unit = {
        if (Files.isDirectory(p)) {
          val l = Files.list(p)
          try l.forEach(rm) finally l.close()
        }
        Files.deleteIfExists(p); ()
      }
      rm(root)
    }
  }

  private val parts = 8

  def qDisRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val root = writtenRoots.synchronized {
      writtenRoots.getOrElseUpdate((spark.sparkContext.applicationId, dir), {
        val r = Files.createTempDirectory("dis-roundtrip-")
        rootsToClean.add(r)
        new FileStreamClient(r).createStream("events", parts)
        Tables.events(spark, dir)
          .select(
            col("event_id").cast("string").as("key"),
            col("event_type").as("value"),
            pmod(col("user_id"), lit(parts)).cast("int").as("partition"))
          .write.format("dis")
          .option("client.root", r.toString).option("stream", "events")
          .mode("append").save()
        r
      })
    }

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
