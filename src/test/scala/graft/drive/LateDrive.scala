package graft.drive
import org.apache.spark.sql.SparkSession
object LateDrive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (sf <- Seq("sf0.001", "sf0.01")) {
      val df = graft.ops.CoreQueries.qLateData(spark, s"/root/testdata/$sf")
      df.coalesce(1).write.mode("overwrite").parquet(s"/tmp/late_$sf")
      println(s"LATE $sf rows=" + spark.read.parquet(s"/tmp/late_$sf").count())
    }
    spark.stop()
  }
}
