package graft.sources

import java.{util => ju}

/** Sequential partition consumer with buffered get + seek-repair and
  * empty-poll backoff.
  *
  * Reference semantics: buffered `get(offset)` that re-seeks when the
  * requested offset misses the buffer (dis/DISDataConsumer.scala:139-170),
  * empty polls retried on an exponential backoff until `pollTimeoutMs`
  * (dis/DISDataConsumer.scala:214-255), and optional tolerance for
  * non-consecutive offsets — compacted/gappy streams
  * (dis/DISRDD.scala:266-315, flag `allowNonConsecutiveOffsets`).
  */
final class PartitionConsumer(
    val groupId: String,
    val stream: String,
    val partition: Int,
    client: StreamClient,
    fetchBatchSize: Int = 1024,
    pollTimeoutMs: Long = 10000L,
    allowNonConsecutiveOffsets: Boolean = false) extends AutoCloseable {

  private var nextOffset: Long = -1L
  private var buffer: Iterator[StreamRecord] = Iterator.empty

  @volatile private[sources] var inUse: Boolean = false
  @volatile private[sources] var markedForClose: Boolean = false

  /** Fetch the record at `offset`, seeking if the sequential position
    * doesn't match (task retries, range replays). Returns null when the
    * offset is unavailable within the poll timeout. */
  def get(offset: Long): StreamRecord = {
    if (offset != nextOffset) { // seek-repair
      buffer = Iterator.empty
      nextOffset = offset
    }
    if (!buffer.hasNext) poll(offset)
    if (!buffer.hasNext) return null
    var record = buffer.next()
    if (record.offset != offset) {
      if (!allowNonConsecutiveOffsets) {
        throw new IllegalStateException(
          s"Got wrong record for $groupId $stream-$partition: requested $offset " +
            s"got ${record.offset}. Non-consecutive offsets require " +
            "option allowNonConsecutiveOffsets=true")
      }
      // gappy stream: skip forward to the first record at/after `offset`
      while (record.offset < offset && buffer.hasNext) record = buffer.next()
      if (record.offset < offset) return null
    }
    nextOffset = record.offset + 1
    record
  }

  private def poll(fromOffset: Long): Unit = {
    val backoff = Backoff.pollRetry().execution()
    val deadline = System.nanoTime() + pollTimeoutMs * 1000000L
    var fetched = client.fetch(stream, partition, fromOffset, fetchBatchSize)
    while (fetched.isEmpty && System.nanoTime() < deadline) {
      val sleep = backoff.nextBackOff()
      if (sleep == Backoff.Stop) return
      Thread.sleep(math.min(sleep, math.max((deadline - System.nanoTime()) / 1000000L, 0L)))
      fetched = client.fetch(stream, partition, fromOffset, fetchBatchSize)
    }
    buffer = fetched.iterator
  }

  override def close(): Unit = client.close()
}

/** Executor-side JVM-wide LRU consumer cache.
  *
  * Reference semantics (dis/DISDataConsumer.scala:261-406): keyed
  * `(groupId, stream, partition)`; access-order LinkedHashMap evicting
  * the eldest not-in-use entry beyond `maxCapacity`; a consumer already
  * in use spawns an uncached instance; a task re-attempt invalidates the
  * cached entry (it may hold corrupt sequential state). Knobs mirror
  * `spark.streaming.dis.consumer.cache.*` (dis/DISRDD.scala:68-73).
  */
final class ReaderCache(initialCapacity: Int = 16, maxCapacity: Int = 64, loadFactor: Float = 0.75f) {
  import ReaderCache.Key

  private val cache = new ju.LinkedHashMap[Key, PartitionConsumer](initialCapacity, loadFactor, true)

  /** Evict least-recently-used entries past capacity, skipping any that
    * are mid-task (in use); those are reconsidered on a later acquire. */
  private def evict(): Unit = {
    val it = cache.entrySet().iterator()
    while (cache.size > maxCapacity && it.hasNext) {
      val e = it.next()
      if (!e.getValue.inUse) {
        e.getValue.close()
        it.remove()
      }
    }
  }

  /** Borrow a consumer for a task. `reattempt=true` (task attempt > 0)
    * invalidates any cached consumer for the key first. */
  def acquire(key: Key, reattempt: Boolean)(create: => PartitionConsumer): PartitionConsumer =
    synchronized {
      val existing = cache.get(key)
      if (reattempt && existing != null) {
        // cached state may be corrupt after a task failure: retire it
        if (existing.inUse) existing.markedForClose = true
        else { existing.close(); cache.remove(key) }
      }
      val cached = cache.get(key)
      if (cached == null) {
        val c = create
        c.inUse = true
        cache.put(key, c)
        evict()
        c
      } else if (cached.inUse) {
        val c = create // concurrent task on same partition: uncached instance
        c.inUse = true
        c.markedForClose = true
        c
      } else {
        cached.inUse = true
        cached
      }
    }

  def release(consumer: PartitionConsumer): Unit = synchronized {
    consumer.inUse = false
    if (consumer.markedForClose) {
      consumer.close()
      val it = cache.entrySet().iterator()
      var done = false
      while (!done && it.hasNext) {
        if (it.next().getValue eq consumer) { it.remove(); done = true }
      }
    }
  }

  def size: Int = synchronized(cache.size)
  private[sources] def containsKey(key: Key): Boolean = synchronized(cache.containsKey(key))
}

object ReaderCache {
  final case class Key(groupId: String, clientId: String, stream: String, partition: Int)

  /** JVM-wide instance used by executor-side reader factories. */
  lazy val global: ReaderCache = new ReaderCache()
}
