package graft.drive

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase-level timing for q_unigram_encode (train vs encode), with an
  * optional predecessor query, in a Bench-identical session.
  *
  * Round-12 finding this tool settled: the sf1 full-run drift flags on
  * q_unigram_encode (10–13 s vs the 3.58 pin) looked like a
  * predecessor "poisoning" effect — any pair run read ~13.6 s while
  * bare isolation read 3.7 s — but re-running the SAME pair minutes
  * later read 3.77 s, and this drive read 14 s with NO predecessor
  * inside the slow window. The box (a VM) shows sustained load ≈ 10
  * with zero runnable local processes: host-level CPU steal arrives in
  * multi-minute windows and multiplies whatever runs inside them.
  * Scheduling order is NOT a factor; the 3.58 pin reflects the
  * steal-free engine cost. */
object UnigramPhaseDrive {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/repo/target/sf1"
    val poison = args.length > 1 && args(1) == "poison"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t(label: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime()
      body
      println(f"PHASE $label%-14s ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    // warmup (Bench's)
    spark.read.parquet(s"$dir/lineitem.parquet")
      .groupBy("l_returnflag").count()
      .write.format("noop").mode("overwrite").save()
    if (poison)
      t("poison(tfidf)") {
        graft.SparkEntry.queries("q_tfidf")(spark, dir)
          .write.format("noop").mode("overwrite").save()
      }
    for (rep <- 1 to 2) {
      t(s"qUnigramEncode#$rep") {
        graft.ops.Unigram.qUnigramEncode(spark, dir)
          .write.format("noop").mode("overwrite").save()
      }
    }
    for (rep <- 1 to 2) {
      val docs = graft.ops.Tables.documents(spark, dir)
      var model: graft.ops.Unigram.Model = null
      t(s"train#$rep") {
        model = graft.ops.Unigram.train(
          docs.filter(pmod(col("doc_id"), lit(2)) === 0), "text",
          vocabSize = 192, emIters = 3, seedSize = 2048, maxPieceLen = 8)
      }
      t(s"encode#$rep") {
        graft.ops.Unigram.encode(docs, "doc_id", "text", model)
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
