package graft.drive

import org.apache.spark.sql.SparkSession

/** Drives graft.GraftExtensions through the config-string route
  * (`spark.sql.extensions`) — the way a spark-submit user enables it. */
object ExtensionsDrive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    println("SQL-FLOAT-DOT=" + spark.sql(
      "SELECT float_dot(array(cast(1.5 as float), cast(2.0 as float))," +
        " array(cast(2.0 as float), cast(3.0 as float)))").collect().head.getDouble(0))
    // end-to-end over real data: SQL-only cosine on the embeddings table
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").createOrReplaceTempView("emb")
    val top = spark.sql(
      """SELECT a.vec_id, b.vec_id,
        |  float_dot(a.embedding, b.embedding)
        |    / sqrt(float_dot(a.embedding, a.embedding))
        |    / sqrt(float_dot(b.embedding, b.embedding)) AS cos
        |FROM emb a JOIN emb b ON a.vec_id < b.vec_id
        |ORDER BY cos DESC LIMIT 1""".stripMargin).collect().head
    println(s"SQL-TOP-PAIR=${top.getLong(0)},${top.getLong(1)} cos=${top.getDouble(2)}")
    spark.stop()
  }
}
