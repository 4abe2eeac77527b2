package graft.drive

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** ×10 planted-pair correctness for the two streaming ADMISSION arms
  * (q_streaming_neardup, q_streaming_embed_neardup), whose DuckDB
  * replays are all-pairs SQL and therefore sit on the documented
  * quadratic-oracle SKIP list at sf1 (VERDICT r16 item 4). The drive
  * plants known duplicate families into a copy of the sf1 fixture and
  * runs the UNMODIFIED gate bindings on it; ids are chosen so the
  * plants STRADDLE the bindings' two id-rank batches — negative ids
  * land in batch 1, ids ≥ 10¹¹ in batch 2 — so the assertions exercise
  * the cross-batch history path (batch-1 plant persisted to the store,
  * batch-2 partner rejected against it), not just within-batch
  * canonicalization.
  *
  * Text arm — the planted slice is an EXACT-SET oracle: planted docs
  * use globally unique vocabulary (no shingle can match the amplified
  * base corpus), so each family's admitted/rejected split is known
  * exactly.
  *
  * Vector arm — the fixture embeddings are isotropic and the binding's
  * τ = 0.45 sits ~3.6σ into the random-cosine tail, so ANY dense
  * planted vector accrues accidental base matches (p ≈ 1.6e-4 × 100k
  * comparisons); an exact-set oracle is impossible by construction.
  * The assertions are instead the admission THEOREMS that hold
  * whatever the base interactions: (1) two exact copies are never
  * BOTH admitted — cross-batch pairs pin the store round-trip (an
  * admitted batch-1 original is a radius-complete-probed cos-1.0
  * witness against its batch-2 copy), within-batch pairs pin
  * canonicalization ("rejected original ⇒ copy rejected" is NOT a
  * theorem: the original's rejection witness may be a non-admitted
  * member of a transitive τ-cluster, and at τ = 0.45 the isotropic
  * base graph has ~16 accidental neighbors per vector, so clusters
  * are the norm); (2) odd-id plants never appear (the binding gates
  * the even slice only).
  *
  * Usage: Test/runMain graft.drive.StreamingPlantedDrive \
  *   [src=target/sf1] [out=target/sf1sp] [json=target/planted_stream_sf1.json]
  */
object StreamingPlantedDrive {

  private val PBase = 100000000000L // batch-2 planted doc ids
  private val EBase = 500000000000L // batch-2 planted vec ids (even)

  private def words(tag: String, n: Int = 40): String =
    (0 until n).map(j => s"$tag$j").mkString(" ")
  private def nearDup(t: String, tag: String): String =
    t.split(" ").dropRight(1).mkString(" ") + s" ${tag}x" // J = 35/41 ≈ 0.854 ≥ 0.8

  def main(args: Array[String]): Unit = {
    val src = if (args.length > 0) args(0) else "target/sf1"
    val out = if (args.length > 1) args(1) else "target/sf1sp"
    val jsonOut = if (args.length > 2) args(2) else "target/planted_stream_sf1.json"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // amplified fixtures: a single admission trigger costs minutes at
    // sf10, so raise the gate's per-pass completion bound (30 min)
    spark.conf.set("spark.graft.gate.timeoutMs", "1800000")
    import spark.implicits._

    // ---------- planted documents (unique vocabulary) ----------
    // A: 8 cross-batch near-dup pairs — low (negative) id in batch 1,
    //    partner at PBase+i in batch 2 → partner rejected via the
    //    persisted band index
    val famA = (0 until 8).map { i =>
      val t = words(s"zspa${i}w")
      ((-1000L - i, t), (PBase + i, nearDup(t, s"zspa${i}w")))
    }
    // one cross-batch EXACT duplicate
    val dupT = words("zspdw")
    val famDup = ((-2000L, dupT), (PBase + 500L, dupT))
    // B: 5 within-batch-2 near-dup pairs → min id admitted
    val famB = (0 until 5).map { i =>
      val t = words(s"zspb${i}w")
      ((PBase + 1000 + 2L * i, t), (PBase + 1000 + 2L * i + 1, nearDup(t, s"zspb${i}w")))
    }
    // C: identical triple in batch 2 → one canonical
    val cT = words("zspcw")
    val famC = Seq(PBase + 2000L, PBase + 2001L, PBase + 2002L).map((_, cT))
    // D: within-batch-1 near-dup pair (both negative) → min id admitted
    val dT = words("zspdnw")
    val famD = Seq((-3000L, dT), (-2999L, nearDup(dT, "zspdnw")))

    val plantedDocs =
      (famA.flatMap(p => Seq(p._1, p._2)) ++ Seq(famDup._1, famDup._2) ++
        famB.flatMap(p => Seq(p._1, p._2)) ++ famC ++ famD)
        .map { case (id, t) => (id, t, "en", "plant0", t.length.toLong) }
    val expectedAdmitted: Set[Long] =
      famA.map(_._1._1).toSet + famDup._1._1 ++
        famB.map(_._1._1).toSet + famC.head._1 + famD.head._1
    val expectedRejected: Set[Long] =
      famA.map(_._2._1).toSet + famDup._2._1 ++
        famB.map(_._2._1).toSet ++ famC.tail.map(_._1).toSet + famD(1)._1

    // ---------- planted embeddings ----------
    val rnd = new java.util.Random(20260816L)
    def randVec(): Seq[Float] = {
      val v = Array.fill(64)(rnd.nextFloat() - 0.5f)
      val n = math.sqrt(v.map(x => x.toDouble * x).sum)
      v.map(x => (x / n).toFloat).toSeq
    }
    // A: 6 cross-batch exact-copy pairs (even ids both sides)
    val vecA = (0 until 6).map { i => (-(2L + 2 * i), EBase + 2L * i, randVec()) }
    // B: 3 within-batch-2 exact-copy pairs
    val vecB = (0 until 3).map { i =>
      (EBase + 1000 + 4L * i, EBase + 1000 + 4L * i + 2, randVec())
    }
    // odd-id plant: exact copy of a batch-1 vector — must be sliced out
    val vecOdd = (EBase + 9001L, vecA.head._3)
    val plantedVecs: Seq[(Long, Seq[Float])] =
      vecA.flatMap(p => Seq((p._1, p._3), (p._2, p._3))) ++
        vecB.flatMap(p => Seq((p._1, p._3), (p._2, p._3))) :+ vecOdd

    // ---------- write the planted fixture dir ----------
    val fsDir = new java.io.File(out)
    if (fsDir.exists()) {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm); f.delete(); ()
      }
      rm(fsDir)
    }
    val baseDocs = spark.read.parquet(s"$src/documents.parquet")
    require(baseDocs.agg(min(col("doc_id"))).collect()(0).getLong(0) >= 0L,
      "base corpus has negative doc ids — planted batch-1 ids would collide")
    baseDocs.write.parquet(s"$out/documents.parquet")
    plantedDocs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("append").parquet(s"$out/documents.parquet")
    val baseEmb = spark.read.parquet(s"$src/embeddings.parquet")
    require(baseEmb.agg(min(col("vec_id"))).collect()(0).getLong(0) >= 0L,
      "base embeddings have negative vec ids — planted batch-1 ids would collide")
    baseEmb.write.parquet(s"$out/embeddings.parquet")
    val embSchema = StructType(Seq(
      StructField("vec_id", LongType), StructField("embedding", ArrayType(FloatType)),
      StructField("label", IntegerType)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(plantedVecs.map { case (id, v) => Row(id, v, 99) }, 1),
      embSchema).write.mode("append").parquet(s"$out/embeddings.parquet")

    // ---------- run the unmodified gate bindings and assert ----------
    // per-trigger instrumentation (VERDICT r17 item 6): at amplified
    // scale the interesting number is the PER-TRIGGER ingest cost of
    // the admission arms, not just the end-to-end wall
    spark.streams.addListener(new org.apache.spark.sql.streaming.StreamingQueryListener {
      override def onQueryStarted(
          e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryProgress(
          e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryProgressEvent): Unit =
        if (e.progress.numInputRows > 0)
          println(f"PLANTED trigger batch=${e.progress.batchId} " +
            f"rows=${e.progress.numInputRows} " +
            f"sec=${e.progress.batchDuration / 1000.0}%.1f")
      override def onQueryTerminated(
          e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    })
    val results = scala.collection.mutable.LinkedHashMap.empty[String, (Boolean, String)]
    def check(name: String)(body: => (Boolean, String)): Unit = {
      val t0 = System.nanoTime()
      val r = try body catch { case e: Throwable => (false, s"exception: ${e.getMessage}") }
      val sec = (System.nanoTime() - t0) / 1e9
      results(name) = r
      println(f"PLANTED $name ok=${r._1} sec=$sec%.1f ${r._2}")
    }

    check("q_streaming_neardup") {
      val admitted = graft.SparkEntry.queries("q_streaming_neardup")(spark, out)
        .filter(col("doc_id") < 0L || col("doc_id") >= PBase)
        .collect().map(_.getLong(0)).toSet
      val ok = admitted == expectedAdmitted
      (ok, s"planted admitted ${admitted.size}/${expectedAdmitted.size} exact-set" +
        (if (ok) "" else s"; missing=${(expectedAdmitted -- admitted).toSeq.sorted.take(5)}" +
          s" extra=${(admitted -- expectedAdmitted).toSeq.sorted.take(5)}") +
        s"; rejected partners absent=${expectedRejected.intersect(admitted).isEmpty}")
    }

    check("q_streaming_embed_neardup") {
      val admitted = graft.SparkEntry.queries("q_streaming_embed_neardup")(spark, out)
        .filter(col("vec_id") < 0L || col("vec_id") >= EBase)
        .collect().map(_.getLong(0)).toSet
      val crossOk = vecA.forall(p =>
        !(admitted.contains(p._1) && admitted.contains(p._2)))
      val crossStoreHits = vecA.count(p =>
        admitted.contains(p._1) && !admitted.contains(p._2))
      val withinOk = vecB.forall(p =>
        !(admitted.contains(p._1) && admitted.contains(p._2)))
      val oddSliced = !admitted.contains(vecOdd._1)
      (crossOk && withinOk && oddSliced,
        s"cross-batch both-admitted violations=${vecA.count(p =>
          admitted.contains(p._1) && admitted.contains(p._2))}/6 " +
          s"(store round-trips exercised: $crossStoreHits admitted originals " +
          "rejected their batch-2 copies), " +
          s"within-batch violations=${vecB.count(p =>
            admitted.contains(p._1) && admitted.contains(p._2))}/3, " +
          s"odd plant sliced=$oddSliced")
    }

    // provenance stamp (ADVICE r17): check_oracle_sf1.py refuses to let
    // a stale planted file vouch for a later Verify run, and this meta
    // records which fixture generation the evidence came from
    val srcMtime = new java.io.File(s"$src/documents.parquet").lastModified()
    val meta =
      s""""_meta": {"src": "$src", "src_mtime_ms": $srcMtime, "written_ms": ${System.currentTimeMillis()}}"""
    val json = (results.map { case (k, (ok, d)) =>
      s""""$k": {"planted_ok": $ok, "detail": "${d.replace("\"", "'")}"}"""
    }.toSeq :+ meta).mkString("{", ", ", "}")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(jsonOut), json)
    val failed = results.filter(!_._2._1)
    println(s"PLANTED summary: ${results.size - failed.size}/${results.size} ok" +
      (if (failed.nonEmpty) s"; FAILED: ${failed.keys.mkString(",")}" else ""))
    spark.stop()
    if (failed.nonEmpty) sys.exit(1)
  }
}
