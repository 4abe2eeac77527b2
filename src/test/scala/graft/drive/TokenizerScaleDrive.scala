package graft.drive

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale evidence for the DISTRIBUTED tokenizer-training rounds
  * (VERDICT r11 #4): at gate scale the unit/word tables fit under
  * `maxLocalVocab` and training takes the driver-side path, so the
  * distributed rounds only carried unit-test parity. This drive forces
  * `maxLocalVocab = 0` on the ×10-amplified corpus — every BPE merge
  * and every EM iteration runs as Spark rounds over the distributed
  * count table — times both paths, and verifies they produce the
  * IDENTICAL model (merge list / piece table), then encodes the full
  * corpus with the distributed-trained model. Results land in
  * BASELINE.md. */
object TokenizerScaleDrive {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "target/sf1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.ops.{Bpe, Tables, Unigram}

    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
      .localCheckpoint(true)
    val n = docs.count()
    def time[A](body: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = body
      (a, (System.nanoTime() - t0) / 1e9)
    }

    // --- BPE: 64 merges, local vs forced-distributed ---
    val (mLocal, tBpeLocal) = time(Bpe.train(docs, "text", numMerges = 64))
    val (mDist, tBpeDist) = time(Bpe.train(docs, "text", numMerges = 64,
      maxLocalVocab = 0))
    require(mLocal == mDist,
      s"BPE paths diverge at scale: ${mLocal.diff(mDist).take(3)} ...")
    val (_, tBpeEnc) = time {
      Bpe.encode(docs, "doc_id", "text", mDist)
        .agg(sum(col("n_tokens"))).collect()
    }
    println(f"TOKSCALE bpe dir=$dir docs=$n merges=64 " +
      f"local=$tBpeLocal%.2fs dist=$tBpeDist%.2fs identical=true encode=$tBpeEnc%.2fs")

    // --- Unigram: 192-piece budget, 3 EM iters, local vs distributed ---
    val (uLocal, tUniLocal) = time(Unigram.train(docs, "text",
      vocabSize = 192, emIters = 3, seedSize = 2048, maxPieceLen = 8))
    val (uDist, tUniDist) = time(Unigram.train(docs, "text",
      vocabSize = 192, emIters = 3, seedSize = 2048, maxPieceLen = 8,
      maxLocalVocab = 0))
    require(uLocal.pieces == uDist.pieces,
      s"Unigram paths diverge at scale (|local|=${uLocal.pieces.size} " +
        s"|dist|=${uDist.pieces.size})")
    val (_, tUniEnc) = time {
      Unigram.encode(docs, "doc_id", "text", uDist)
        .agg(sum(col("n_tokens"))).collect()
    }
    println(f"TOKSCALE unigram dir=$dir docs=$n vocab=192 " +
      f"local=$tUniLocal%.2fs dist=$tUniDist%.2fs identical=true encode=$tUniEnc%.2fs")

    spark.stop()
  }
}
