package graft.drive

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.types._

import graft.api.Graft

/** The sf10 embedding-near-dup measurement in the regime the operator
  * is DESIGNED for — a clustered corpus — replacing the 28-minute
  * isotropic drill as the recurring pin (the isotropic number is kept
  * measure-on-demand in tools/bench_reference_sf10.json; BASELINE.md
  * round 14 explains why no complete algorithm beats the Θ(n²)
  * candidate floor there).
  *
  * Corpus: 200k 64-d vectors (the sf10 embedding count) in 500 planted
  * clusters of 400 — unit Gaussian centers (cross-cluster cos
  * concentrates near 0 ± 1/8, far under any useful τ) with σ=0.08
  * per-coordinate noise (within-cluster cos ≈ 0.71 ± tail, so τ=0.85
  * keeps a sparse real-duplicate subset). Deterministic: every vector
  * is a pure function of (seed, cluster, row) via per-row seeded RNGs,
  * so reruns measure the same problem.
  *
  * Evidence carried:
  *  - TIMING: min-of-3 of the production path (trained spherical
  *    k-means index, radius-complete probing) — the ×100-scale number
  *    for the regime the radius rule prunes. The auto √n ≈ 447 cells
  *    track the 500 natural clusters, so probe sets stay near 1 cell
  *    per vector and candidates stay within-cell: ~n²/nlist, ~500×
  *    under the isotropic all-pairs floor.
  *  - CORRECTNESS at scale: each cluster's first member is planted
  *    TWICE (exact copy, ids c*400 and c*400+1) — all 500 exact pairs
  *    must be recalled (completeness holds at any radius), and every
  *    reported pair must be within-cluster (cross-cluster cos cannot
  *    reach τ — a planted-precision check).
  *
  * Emits `target/neardup_clustered_sf10.json` with
  * {sec_min, pairs, planted_recall} and exits nonzero on a failed
  * planted check. */
object ClusteredNeardupDrive {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toInt else 200000
    val clusters = if (args.length > 1) args(1).toInt else 500
    val tau = if (args.length > 2) args(2).toDouble else 0.85
    val dim = 64
    val members = n / clusters
    val sigma = 0.08f

    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType))))
    val df = spark.createDataFrame(
      spark.sparkContext.range(0L, n.toLong, 1, 32).map { i =>
        val c = (i / members).toInt
        // members 0 and 1 of each cluster are the SAME row (exact dup)
        val rowInCluster = if (i % members == 1) 0L else i % members
        val cRnd = new java.util.Random(9000001L * (c + 1))
        val center = Array.fill(dim)(cRnd.nextGaussian())
        val cn = math.sqrt(center.map(x => x * x).sum)
        val vRnd = new java.util.Random(7000003L * (c * 100000L + rowInCluster + 1))
        val v = Array.tabulate(dim)(d =>
          (center(d) / cn + sigma * vRnd.nextGaussian()).toFloat)
        Row(i, v.toSeq)
      }, schema)
      .localCheckpoint(true) // materialize once; time the OPERATOR, not the synth

    def time(body: => Long): (Double, Long) = {
      val t0 = System.nanoTime(); val r = body
      ((System.nanoTime() - t0) / 1e9, r)
    }
    val runs = (1 to 3).map(_ => time {
      Graft.embedNearDup(df, "vec_id", "embedding", tau).count()
    })
    val pairs = runs.head._2
    require(runs.forall(_._2 == pairs), s"nondeterministic pair count: $runs")
    val secMin = runs.map(_._1).min

    // planted checks on one (untimed) run — aggregated distributed,
    // never collected (the pair table is millions of rows)
    val stats = Graft.embedNearDup(df, "vec_id", "embedding", tau)
      .selectExpr("least(id_a, id_b) AS a", "greatest(id_a, id_b) AS b")
      .selectExpr(
        s"count(CASE WHEN b = a + 1 AND a % $members = 0 THEN 1 END) AS planted",
        s"count(CASE WHEN a DIV $members <> b DIV $members THEN 1 END) AS cross")
      .collect()(0)
    val recalled = stats.getLong(0)
    val crossCluster = stats.getLong(1)
    val ok = recalled == clusters && crossCluster == 0

    val json = s"""{"drive":"neardup_clustered","n":$n,"clusters":$clusters,""" +
      s""""tau":$tau,"sec_min":$secMin,"sec_all":[${runs.map(_._1).mkString(",")}],""" +
      s""""pairs":$pairs,"planted_recall":"$recalled/$clusters",""" +
      s""""cross_cluster_pairs":$crossCluster}"""
    println(json)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get("target"))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("target/neardup_clustered_sf10.json"), json)
    spark.stop()
    if (!ok) sys.exit(1)
  }
}
