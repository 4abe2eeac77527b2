package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The SQL surface of the native functions: a session built with
  * GraftExtensions can call float_dot from plain SQL. (Own session —
  * extensions bind at session construction.) */
class GraftExtensionsSpec extends AnyFunSuite {
  test("float_dot is callable from SQL via GraftExtensions") {
    // extensions bind at construction: retire any shared session first
    SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession)
      .foreach(_.stop())
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("ext-spec")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      spark.sparkContext.setLogLevel("WARN")
      val r = spark.sql(
        "SELECT float_dot(array(cast(1.0 as float), cast(2.0 as float)), " +
          "array(cast(3.0 as float), cast(4.0 as float))) AS d")
        .collect().head.getDouble(0)
      assert(r === 11.0)
      val err = intercept[Exception](
        spark.sql("SELECT float_dot(array(cast(1.0 as float)))").collect())
      assert(err.getMessage.toLowerCase.contains("float_dot"))

      // int_dot: exact long accumulation over int codes
      val di = spark.sql(
        "SELECT int_dot(array(127, -127, 3), array(127, 127, 2)) AS d")
        .collect().head.getLong(0)
      assert(di === 127L * 127 - 127L * 127 + 6)

      // poly_hash: SQL surface == the kernel the Scala operators use
      for (s <- Seq("", "a", "table hash", "The quick brown fox! 123")) {
        val viaSql = spark.sql(s"SELECT poly_hash('${s.replace("'", "''")}')")
          .collect().head.getLong(0)
        assert(viaSql === graft.ops.DedupQueries.polyHashS(s), s"input '$s'")
      }
      // stays native: not a CodegenFallback
      val ph = graft.functions.PolyHash(
        org.apache.spark.sql.catalyst.expressions.Literal("x"))
      assert(!ph.isInstanceOf[
        org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback])

      // token_run_count: SQL surface == the byte-scan kernel == the
      // regex it replaces ('ab' run + ',' + '12' run + 'X' = 4)
      val trc = spark.sql("SELECT token_run_count('ab, 12 X') AS c")
        .collect().head.getInt(0)
      assert(trc === 4)
      assert(trc === "[a-z]+|[0-9]+|[^a-z0-9 ]".r.findAllIn("ab, 12 X").length)
    } finally {
      spark.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }
  }
}
