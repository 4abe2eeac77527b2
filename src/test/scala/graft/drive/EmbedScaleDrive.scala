package graft.drive

import org.apache.spark.sql.SparkSession

/** Timing evidence for the embedNearDup threshold-geometry claim: the
  * angle-margin probe radius is 2·acos(t), so a production dedup cut
  * (t ≥ 0.9 ⇒ 52° margin) probes few cells while the loose fixture cut
  * (0.45 ⇒ 127°) degrades toward the exhaustive-but-distributed scan.
  * Run against an amplified dir (see AmplifyDrive) to measure both
  * regimes on the same corpus; results land in BASELINE.md. */
object EmbedScaleDrive {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "target/sf1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = graft.ops.Tables.embeddings(spark, dir)
      .select(org.apache.spark.sql.functions.col("vec_id"),
        org.apache.spark.sql.functions.col("embedding"))
    for (t <- Seq(0.45, 0.7, 0.9)) {
      val t0 = System.nanoTime()
      val n = graft.api.Graft.embedNearDup(emb, "vec_id", "embedding", t).count()
      println(f"EMBEDSCALE dir=$dir t=$t%.2f pairs=$n sec=${(System.nanoTime() - t0) / 1e9}%.2f")
    }
    spark.stop()
  }
}
