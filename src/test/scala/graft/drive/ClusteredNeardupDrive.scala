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
  * clusters of `members` — unit Gaussian centers (cross-cluster cos
  * concentrates near 0 ± 1/8, far under any useful τ) with
  * σ-per-coordinate noise. Deterministic: every vector is a pure
  * function of (seed, cluster, row) via per-row seeded RNGs, so reruns
  * measure the same problem.
  *
  * THE MARGIN ARITHMETIC PICKS THE REGIME (measured round 15, both
  * points recorded in BASELINE.md): the completeness rule probes every
  * cell within θ_top1 + 2·acos(τ) of a vector, where θ_top1 ≈ the
  * member-to-center angle ≈ atan(σ·√dim).
  *  - Defaults τ=0.95, σ=0.05: margin ≈ 22° + 36° = 58° ⇒ cells with
  *    cos > 0.53 — at dim 64 a measure-~10⁻⁵ cap of the random
  *    centroid sphere, so probing is effectively within-cell and the
  *    drill completes in minutes. This is the DESIGNED pruned regime
  *    (GraftApiSpec's production-cut geometry) and the recurring pin.
  *  - The round-14 parameters τ=0.85, σ=0.08 put the margin at
  *    ≈ 33° + 64° = 97° — over HALF the centroid sphere, i.e. the
  *    radius rule provably cannot prune (measured 1235 s vs the
  *    isotropic floor's 1656 s); kept measure-on-demand as the
  *    wide-margin stress point, not a pin.
  *
  * Evidence carried:
  *  - TIMING: min-of-3 of the production path (trained spherical
  *    k-means index, radius-complete probing) at the chosen
  *    (τ, σ) operating point.
  *  - CORRECTNESS at scale: each cluster's first member is planted
  *    TWICE (exact copy, ids c*400 and c*400+1) — all 500 exact pairs
  *    must be recalled (completeness holds at any radius), and every
  *    reported pair must be within-cluster (cross-cluster cos cannot
  *    reach τ — a planted-precision check).
  *
  * Emits the JSON artifact (default
  * `target/neardup_clustered_sf10.json`; args: n clusters tau sigma
  * outPath) with {sec_min, pairs, planted_recall} and exits nonzero
  * on a failed planted check. */
object ClusteredNeardupDrive {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toInt else 200000
    val clusters = if (args.length > 1) args(1).toInt else 500
    val tau = if (args.length > 2) args(2).toDouble else 0.95
    val sigma = if (args.length > 3) args(3).toFloat else 0.05f
    val outPath = if (args.length > 4) args(4) else "target/neardup_clustered_sf10.json"
    val dim = 64
    val members = n / clusters

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
      s""""tau":$tau,"sigma":$sigma,"sec_min":$secMin,"sec_all":[${runs.map(_._1).mkString(",")}],""" +
      s""""pairs":$pairs,"planted_recall":"$recalled/$clusters",""" +
      s""""cross_cluster_pairs":$crossCluster}"""
    println(json)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get("target"))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(outPath), json)
    spark.stop()
    if (!ok) sys.exit(1)
  }
}
