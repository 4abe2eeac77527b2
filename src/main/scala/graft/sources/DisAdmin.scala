package graft.sources

import java.util.concurrent.Executors

import scala.util.Try

/** Operational surface over the connector, callable from driver code at
  * any time — the engine's parity for the reference's
  * `CanCommitOffsets` (commitAsync outside trigger progress,
  * dis/DirectDISInputDStream.scala:330-343) and the O(1) offset-algebra
  * count (dis/DISRDD.scala:89-105, countApprox :96-105 — exact here,
  * because offset arithmetic needs no timeout/confidence).
  *
  * Everything works on the same options map the DataFrame API takes
  * (`client.root`, `stream`, `groupId`, ...), so a migrated manual-
  * commit job keeps its structure: read with `commitOnTrigger` off,
  * then `DisAdmin.commitNow(opts, endOffsets)` wherever it used to call
  * `commitAsync`.
  */
object DisAdmin {

  private def withClient[T](options: Map[String, String])(body: StreamClient => T): T = {
    val opts = Dis.normalize(options)
    val client = StreamClient.forOptions(opts)
    try body(client) finally client.close()
  }

  /** Synchronous commit of arbitrary per-partition offsets for the
    * options' consumer group — reference `commitNow` semantics: takes
    * effect immediately, independent of any running query's triggers. */
  def commitNow(options: Map[String, String], offsets: Map[(String, Int), Long]): Unit =
    withClient(options) { client =>
      val group = Dis.groupId(Dis.normalize(options))
      offsets.groupBy(_._1._1).foreach { case (stream, offs) =>
        client.commit(stream, group, offs.map { case ((_, p), o) => p -> o })
      }
    }

  /** JSON-dialect overload: `{"stream":{"0":23}}` — the same codec the
    * streaming offsets use (O23). */
  def commitNow(options: Map[String, String], offsetsJson: String): Unit =
    commitNow(options, Offsets.partitionOffsets(offsetsJson))

  private lazy val committer = Executors.newSingleThreadExecutor { r =>
    val t = new Thread(r, "dis-commit-async")
    t.setDaemon(true)
    t
  }

  /** Fire-and-forget commit on a daemon thread (reference
    * `commitAsync` + callback shape). Commits are serialized through
    * one thread so they apply in submission order. */
  def commitAsync(options: Map[String, String], offsets: Map[(String, Int), Long],
      onComplete: Try[Unit] => Unit = _ => ()): Unit = {
    committer.submit(new Runnable {
      override def run(): Unit = onComplete(Try(commitNow(options, offsets)))
    })
    ()
  }

  // ---- queued commit (reference commitNextDurationAsync parity) ----
  // dis/DirectDISInputDStream.scala:286-328: ranges enqueue threadsafe,
  // drain at the NEXT compute — per partition the max untilOffset wins,
  // empty ranges are skipped, and only the most recent callback fires.
  private val pendingByGroup =
    new java.util.concurrent.ConcurrentHashMap[(String, String),
      java.util.concurrent.ConcurrentLinkedQueue[OffsetRange]]()
  private val pendingCallback =
    new java.util.concurrent.ConcurrentHashMap[(String, String), Try[Unit] => Unit]()

  private def groupKey(opts: Map[String, String]): (String, String) =
    (opts.getOrElse("client.root", ""), Dis.groupId(opts))

  /** Queue offset ranges for commit when the options' group's running
    * query fires its next trigger — the reference's enqueue-then-drain
    * `commitNextDurationAsync` contract, vs [[commitNow]] (immediate)
    * and `commitOnTrigger` (every trigger's own end offsets). Nothing
    * touches the consumer group until a trigger drains the queue.
    * Threadsafe; only the most recently supplied callback runs. */
  def commitOnNextTrigger(options: Map[String, String], ranges: Seq[OffsetRange],
      onComplete: Try[Unit] => Unit = _ => ()): Unit = {
    val key = groupKey(Dis.normalize(options))
    val q = pendingByGroup.computeIfAbsent(key,
      _ => new java.util.concurrent.ConcurrentLinkedQueue[OffsetRange]())
    ranges.foreach(q.add)
    pendingCallback.put(key, onComplete)
  }

  /** Drain this group's queued ranges through an already-open client —
    * called by the source at each trigger commit. Max untilOffset per
    * (stream, partition); from==until ranges carry no progress and are
    * dropped, exactly like the reference's commitAll. */
  private[sources] def drainQueued(client: StreamClient, root: String, group: String): Unit = {
    val key = (root, group)
    val q = pendingByGroup.get(key)
    if (q != null && !q.isEmpty) {
      val maxUntil = scala.collection.mutable.Map[(String, Int), Long]()
      var r = q.poll()
      while (r != null) {
        if (r.fromOffset != r.untilOffset) {
          val k = (r.stream, r.partition)
          maxUntil(k) = math.max(maxUntil.getOrElse(k, Long.MinValue), r.untilOffset)
        }
        r = q.poll()
      }
      if (maxUntil.nonEmpty) {
        val cb = Option(pendingCallback.remove(key)).getOrElse((_: Try[Unit]) => ())
        cb(Try {
          maxUntil.groupBy(_._1._1).foreach { case (stream, offs) =>
            client.commit(stream, group, offs.map { case ((_, p), o) => p -> o }.toMap)
          }
        })
      }
    }
  }

  /** Last committed offsets of the options' group for a stream. */
  def committed(options: Map[String, String], stream: String): Map[Int, Long] =
    withClient(options) { client =>
      client.committed(stream, Dis.groupId(Dis.normalize(options)))
    }

  /** Exact record count from offset algebra — O(partitions), zero data
    * reads. With an `offsetRanges` option the explicit (sentinel-
    * resolved) ranges are counted; otherwise the full earliest→latest
    * backlog of the subscribed streams. */
  def count(options: Map[String, String]): Long = {
    val opts = Dis.normalize(options)
    withClient(opts) { client =>
      opts.get("offsetranges") match {
        case Some(json) =>
          Offsets.partitionRanges(json).map { r =>
            val earliest = client.earliestOffset(r.stream, r.partition)
            val latest = client.latestOffset(r.stream, r.partition)
            OffsetRange(r.stream, r.partition,
              Offsets.resolve(r.fromOffset, earliest, latest),
              Offsets.resolve(r.untilOffset, earliest, latest)).count
          }.sum
        case None =>
          Dis.streamsFor(client, opts).flatMap { s =>
            client.partitionsFor(s).map(p =>
              client.latestOffset(s, p) - client.earliestOffset(s, p))
          }.sum
      }
    }
  }

  /** Timed-approximation bound on a count: (estimate, confidence, low,
    * high) — the shape of the reference's `countApprox` result
    * (dis/DISRDD.scala:96-105). */
  final case class BoundedCount(mean: Double, confidence: Double, low: Double, high: Double)

  /** Reference `countApprox(timeout, confidence)` parity
    * (dis/DISRDD.scala:96-105). For non-compacted ranges the reference
    * itself short-circuits to the EXACT offset-algebra count wrapped in
    * a degenerate [low=high] bound — no scan ever runs, so the timeout
    * never binds. This engine's offset algebra is O(partitions) metadata
    * in every mode, so the same dominant behavior applies universally:
    * the answer is exact, final, and faster than any timed
    * approximation could be. The timeout/confidence parameters are
    * accepted for drop-in API compatibility and recorded in the result's
    * confidence field. */
  def countApprox(options: Map[String, String], timeoutMs: Long,
      confidence: Double = 0.95): BoundedCount = {
    require(timeoutMs >= 0, s"timeout must be non-negative, got $timeoutMs")
    require(confidence >= 0.0 && confidence <= 1.0,
      s"confidence must be in [0,1], got $confidence")
    val c = count(options).toDouble
    BoundedCount(c, 1.0, c, c)
  }

  /** Per-partition consumer lag (latest − committed) for a stream;
    * partitions with no commit lag their full backlog from earliest. */
  def lag(options: Map[String, String], stream: String): Map[Int, Long] = {
    val opts = Dis.normalize(options)
    withClient(opts) { client =>
      val committed = client.committed(stream, Dis.groupId(opts))
      client.partitionsFor(stream).map { p =>
        val from = committed.getOrElse(p, client.earliestOffset(stream, p))
        p -> math.max(client.latestOffset(stream, p) - from, 0L)
      }.toMap
    }
  }
}
