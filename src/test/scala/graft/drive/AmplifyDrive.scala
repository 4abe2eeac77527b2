package graft.drive

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-growth harness: amplifies an sf fixture directory ×FACTOR into
  * a local parquet dir so Bench can take one measured point above sf0.1
  * (the fixtures stop at sf0.1 and /root/testdata is read-only).
  *
  * Faithfulness rules — the point is that per-query work scales the way
  * real ×10 data would, not that rows merely multiply:
  *  - every key domain shifts by `copy × STRIDE`, so joins stay 1:1 with
  *    the original fan-out (no cross-copy matches, no dangling keys);
  *  - `nation`/`region` stay fixed (TPC-H dims don't scale with SF);
  *  - document text gets a per-copy suffix on every token: within-copy
  *    duplicate/near-dup structure is preserved exactly, cross-copy
  *    similarity collapses, so dedup candidate pairs scale ×FACTOR
  *    (linear) instead of ×FACTOR² (merged clusters);
  *  - embeddings are multiplied by a per-copy Rademacher ±1 sign pattern
  *    (copy 0 = identity): within-copy inner products are bit-preserved
  *    (⟨D·a, D·b⟩ = ⟨a,b⟩), cross-copy cosines concentrate near 0, so
  *    kNN/near-dup candidate structure replicates per copy;
  *  - `events.ts` is copied as whatever physical type the fixture
  *    carries (nanos-as-long on older generations, TIMESTAMP(MICROS)
  *    on current ones) — `Tables.events` dispatches on the scanned
  *    type, so the amplified dir round-trips unchanged;
  *    timestamps are NOT shifted — ×10 rows per window models a ×10
  *    event rate, which is what a bigger deployment looks like.
  */
object AmplifyDrive {
  private val Stride = 1000000000L

  def main(args: Array[String]): Unit = {
    val src = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val out = if (args.length > 1) args(1) else "target/sf1"
    val factor = if (args.length > 2) args(2).toInt else 10

    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def read(name: String): DataFrame = spark.read.parquet(s"$src/$name.parquet")

    /** Union `factor` copies, shifting the named long columns by copy×Stride
      * and applying `perCopy` to each copy's frame. */
    def amplify(df: DataFrame, keyCols: Seq[String])(
        perCopy: (DataFrame, Int) => DataFrame): DataFrame =
      (0 until factor).map { i =>
        val shifted = keyCols.foldLeft(df)((d, c) =>
          d.withColumn(c, col(c) + lit(i.toLong * Stride)))
        perCopy(shifted, i)
      }.reduce(_ unionAll _)

    def write(df: DataFrame, name: String): Unit = {
      df.write.mode("overwrite").parquet(s"$out/$name.parquet")
      println(s"### $name: ${spark.read.parquet(s"$out/$name.parquet").count()} rows")
    }

    val id = (d: DataFrame, _: Int) => d

    write(read("region"), "region")
    write(read("nation"), "nation")
    write(amplify(read("customer"), Seq("c_custkey"))(id), "customer")
    write(amplify(read("supplier"), Seq("s_suppkey"))(id), "supplier")
    write(amplify(read("part"), Seq("p_partkey"))(id), "part")
    write(amplify(read("orders"), Seq("o_orderkey", "o_custkey"))(id), "orders")
    write(amplify(read("lineitem"), Seq("l_orderkey", "l_partkey", "l_suppkey"))(id), "lineitem")
    write(amplify(read("events"), Seq("event_id", "user_id"))(id), "events")

    write(amplify(read("documents"), Seq("doc_id")) { (d, i) =>
      if (i == 0) d
      else d.withColumn("text", regexp_replace(col("text"), "(\\S+)", s"$$1_$i"))
        .withColumn("n_chars", length(col("text")).cast("long"))
    }, "documents")

    write(amplify(read("embeddings"), Seq("vec_id")) { (d, i) =>
      if (i == 0) d
      else d.withColumn("embedding", expr(
        // deterministic Rademacher signs from (dim index, copy): Knuth
        // multiplicative hash on k, xor'd with the copy id, parity bit
        s"transform(embedding, (x, k) -> CAST(x * (1 - 2 * ((hash(k, $i) & 1))) AS FLOAT))"))
    }, "embeddings")

    spark.stop()
  }
}
