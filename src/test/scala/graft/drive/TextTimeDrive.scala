package graft.drive
import org.apache.spark.sql.SparkSession
object TextTimeDrive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t(name: String)(b: => Unit): Unit = {
      val t0 = System.nanoTime(); b; println(f"TIME $name ${(System.nanoTime()-t0)/1e9}%.2f")
    }
    val dir = "/root/testdata/sf0.1"
    for (i <- 1 to 3) {
      t(s"text_clean#$i") { graft.ops.TextQueries.qTextClean(spark, dir).write.format("noop").mode("overwrite").save() }
      t(s"quality#$i") { graft.ops.TextQueries.qQualityScore(spark, dir).write.format("noop").mode("overwrite").save() }
      t(s"ngram#$i") { graft.ops.DedupQueries.qNgramJaccard(spark, dir).write.format("noop").mode("overwrite").save() }
    }
    spark.stop()
  }
}
