package graft.streaming

import org.apache.spark.sql.SparkSession

/** Crash-safe maintenance for the append-only parquet stores the
  * incremental-dedup operators keep ([[IncrementalDedup]],
  * [[IncrementalEmbedDedup]]): each store is a directory of
  * subdirectories ("subs"), rewritten via a temp dir + two renames, with
  * roll-forward recovery on every entry point.
  *
  * Single-OPERATOR contract (see [[IncrementalDedup.compactStore]]):
  * writers AND readers both call [[recover]], so none of them may run
  * concurrently with an in-flight compaction — crash-vs-running is
  * undecidable from the filesystem alone. */
private[streaming] object AtomicStore {

  def exists(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** Roll the store forward past a compaction crash. Idempotent, cheap
    * (a few filesystem stats), and called by every store entry point:
    *  - crash after the live dir was moved aside but before the rewrite
    *    was swapped in → the live dir is missing: move the original
    *    back (the rewrite is discarded — it has identical content, but
    *    the original is the version whose swap never commenced);
    *  - crash before the swap started → live dir intact: stale
    *    `__compact_*` / `__old_*` artifacts are deleted so the next
    *    rewrite starts clean. */
  def recover(spark: SparkSession, storeDir: String, subs: Seq[String]): Unit = {
    val fs = new org.apache.hadoop.fs.Path(storeDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    for (sub <- subs) {
      val live = new org.apache.hadoop.fs.Path(s"$storeDir/$sub")
      val old = new org.apache.hadoop.fs.Path(s"$storeDir/__old_$sub")
      val tmp = new org.apache.hadoop.fs.Path(s"$storeDir/__compact_$sub")
      if (!fs.exists(live) && fs.exists(old))
        require(fs.rename(old, live), s"recover: could not restore $live")
      if (fs.exists(live)) {
        fs.delete(tmp, true)
        fs.delete(old, true)
      }
    }
  }

  /** Rewrite `storeDir/sub` via a temp dir and swap it in (two renames);
    * a crash at ANY point is rolled forward by [[recover]]. */
  def swapIn(spark: SparkSession, storeDir: String, sub: String)(
      rewrite: (String, String) => Unit): Unit = {
    val fs = new org.apache.hadoop.fs.Path(storeDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val live = s"$storeDir/$sub"
    if (!exists(spark, live)) return
    val tmp = s"$storeDir/__compact_$sub"
    val old = s"$storeDir/__old_$sub"
    rewrite(live, tmp)
    fs.delete(new org.apache.hadoop.fs.Path(old), true)
    require(fs.rename(new org.apache.hadoop.fs.Path(live), new org.apache.hadoop.fs.Path(old)),
      s"compact: could not move $live aside")
    require(fs.rename(new org.apache.hadoop.fs.Path(tmp), new org.apache.hadoop.fs.Path(live)),
      s"compact: could not swap in $tmp")
    fs.delete(new org.apache.hadoop.fs.Path(old), true)
  }
}
