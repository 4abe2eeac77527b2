package graft.drive
import org.apache.spark.sql.SparkSession
object SaltDrive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions","4").config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.api.Graft.saltedAgg(
      graft.ops.Tables.events(spark, "/root/testdata/sf0.001"),
      Seq("event_type"), "value", "event_id", 16)
    val plan = df.queryExecution.executedPlan.toString
    println("SALT-IN-SHUFFLE=" + plan.contains("hashpartitioning(event_type") )
    println("TWO-PHASE=" + ("HashAggregate".r.findAllIn(plan).size >= 4))
    println("SALT-KEY=" + plan.contains("__salt"))
    df.collect().sortBy(_.getString(0)).foreach(r => println(s"ROW ${r.getString(0)} sum=${r.getDouble(1)} cnt=${r.getLong(2)}"))
    spark.stop()
  }
}
