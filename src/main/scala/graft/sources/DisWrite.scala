package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.types._

/** Sink — the DISSink analog (dis/DISSink.scala:23-55): per-task lazy
  * producer, at-least-once delivery, no transactions / epoch fencing
  * (none exist in the reference either; its demo `.get()`s the send
  * Future for durability — we append synchronously).
  *
  * Accepted input schema (by column name, others ignored):
  *   value: STRING|BINARY (required) • key: STRING|BINARY (optional)
  *   partition: INT (optional; default hash(key) or round-robin)
  *   topic: STRING (optional; overrides the `stream` option per row)
  *
  * Opt-in idempotent read-back (`option("exactlyOnceKey", "true")`):
  * each record's key is wrapped in an `(epoch, task partition, seq)`
  * envelope — the idempotent-producer identity — and
  * [[DisExactlyOnce.view]] over a batch read keeps exactly one copy of
  * every identity, so replayed epochs and task retries deduplicate at
  * read time. Delivery stays at-least-once on the wire (faithful to
  * the reference's transactionless sink); the VIEW is the
  * exactly-once surface. Requires per-partition deterministic input
  * order (true of a deterministic plan replayed for the same epoch —
  * the standard idempotent-producer assumption); batch writes must
  * pass an explicit `exactlyOnceEpoch`, since only the streaming
  * engine supplies epochs. Every enveloped write also needs a writer
  * identity (`exactlyOnceWriterId`, or the `checkpointLocation` writer
  * option for streaming) scoping the sequence to one logical producer
  * — see [[DisExactlyOnce]]. Checkpoint-derived ids are URI-canonical
  * since round 13; upgrading a pre-existing query changes its derived
  * id ONCE — pin `exactlyOnceWriterId` (hashed as-is) or drain
  * in-flight batches across that upgrade
  * ([[DisExactlyOnce.canonicalCheckpoint]] documents the window). */
class DisWriteBuilder(options: Map[String, String], schema: StructType) extends WriteBuilder {
  override def build(): Write = new DisWrite(options, schema)
}

class DisWrite(options: Map[String, String], schema: StructType) extends Write {
  override def toBatch: BatchWrite = new DisBatchWrite(options, schema)
  override def toStreaming: StreamingWrite = new DisStreamingWrite(options, schema)
}

class DisBatchWrite(options: Map[String, String], schema: StructType) extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new DisWriterFactory(options, schema)
  override def commit(messages: Array[WriterCommitMessage]): Unit = ()
  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

class DisStreamingWrite(options: Map[String, String], schema: StructType) extends StreamingWrite {
  override def createStreamingWriterFactory(info: PhysicalWriteInfo): StreamingDataWriterFactory =
    new DisWriterFactory(options, schema)
  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = ()
  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit = ()
}

private case object DisCommitMessage extends WriterCommitMessage

class DisWriterFactory(options: Map[String, String], schema: StructType)
    extends DataWriterFactory with StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new DisDataWriter(options, schema, partitionId, None)
  override def createWriter(partitionId: Int, taskId: Long, epochId: Long): DataWriter[InternalRow] =
    new DisDataWriter(options, schema, partitionId, Some(epochId))
}

class DisDataWriter(options: Map[String, String], schema: StructType, taskPartitionId: Int,
    epochId: Option[Long])
    extends DataWriter[InternalRow] {
  // lazily created on first send, like the reference's producer
  // (dis/DISSink.scala:25)
  private lazy val client: StreamClient = StreamClient.forOptions(options)
  private val defaultStream = Dis.stream(options)

  private def idx(name: String): Int = schema.fieldNames.indexOf(name)
  private val valueIdx = {
    val i = idx("value")
    require(i >= 0, s"sink input must have a 'value' column, got ${schema.simpleString}")
    i
  }
  private val keyIdx = idx("key")
  private val partitionIdx = idx("partition")
  private val topicIdx = idx("topic")

  private def bytes(row: InternalRow, i: Int): Array[Byte] =
    if (i < 0 || row.isNullAt(i)) null
    else schema.fields(i).dataType match {
      case BinaryType => row.getBinary(i)
      case StringType => row.getUTF8String(i).getBytes
      case dt => throw new IllegalArgumentException(
        s"column '${schema.fields(i).name}' must be STRING or BINARY, got $dt")
    }

  // idempotent-identity envelope state (keys pre-normalized to lower case)
  private val xoEnabled = options.get("exactlyoncekey").exists(_.trim.toBoolean)
  private val xoEpoch: Long =
    if (!xoEnabled) -1L
    else epochId.orElse(options.get("exactlyonceepoch").map(_.trim.toLong)).getOrElse(
      throw new IllegalArgumentException(
        "exactlyOnceKey in a batch write needs an explicit exactlyOnceEpoch " +
          "(epochs come from the streaming engine)"))
  // Writer identity scoping the (epoch, partition, seq) sequence — the
  // idempotent-producer id. Must be stable across retries/restarts of
  // the SAME logical query and distinct between independent writers:
  // explicit exactlyOnceWriterId wins, else the streaming checkpoint
  // location (stable across restarts, unique per query). Epoch reuse
  // across writers without distinct ids is unsafe — identities collide
  // and the read-back view silently drops rows — hence fail-loudly.
  // Explicit ids hash as-is (opaque tokens); checkpoint paths are
  // canonicalized first so cosmetic differences across restarts
  // (trailing slash, scheme spelling, dot segments) can't change the
  // identity and duplicate a replayed batch through the view.
  private val xoWriterId: Long =
    if (!xoEnabled) -1L
    else options.get("exactlyoncewriterid").map(_.trim)
      .orElse(options.get("checkpointlocation")
        .map(DisExactlyOnce.canonicalCheckpoint))
      .map(DisExactlyOnce.writerId)
      .getOrElse(throw new IllegalArgumentException(
        "exactlyOnceKey needs a stable writer identity: pass exactlyOnceWriterId " +
          "(or, for streaming, set checkpointLocation as a writer option). Two " +
          "writers sharing an epoch without distinct ids mint colliding identities " +
          "and the exactly-once view would silently drop rows"))
  private var xoSeq = 0L

  private var roundRobin = taskPartitionId
  private val nPartsCache = scala.collection.mutable.Map[String, Int]()
  // buffered producer: records batched per (stream, partition), flushed
  // at flushThreshold and on commit — amortizes the per-send cost like
  // the reference's underlying producer buffering
  private val buffers =
    scala.collection.mutable.Map[(String, Int), scala.collection.mutable.ArrayBuffer[(Array[Byte], Array[Byte])]]()
  private val flushThreshold = 5000

  private def nParts(stream: String): Int =
    nPartsCache.getOrElseUpdate(stream, math.max(client.partitionsFor(stream).size, 1))

  override def write(row: InternalRow): Unit = {
    val stream = if (topicIdx >= 0 && !row.isNullAt(topicIdx))
      row.getUTF8String(topicIdx).toString else defaultStream
    val key = bytes(row, keyIdx)
    val value = bytes(row, valueIdx)
    require(value != null,
      s"null in the 'value' column cannot be produced to stream '$stream' " +
        "(keys may be null, values may not)")
    val n = nParts(stream)
    // placement always follows the USER key — the envelope only changes
    // the stored key bytes, never which partition a key routes to
    val partition =
      if (partitionIdx >= 0 && !row.isNullAt(partitionIdx)) row.getInt(partitionIdx)
      else if (key != null) java.lang.Math.floorMod(java.util.Arrays.hashCode(key), n)
      else { roundRobin += 1; java.lang.Math.floorMod(roundRobin, n) }
    val outKey =
      if (!xoEnabled) key
      else {
        val k = DisExactlyOnce.envelope(xoWriterId, xoEpoch, taskPartitionId, xoSeq, key)
        xoSeq += 1; k
      }
    val buf = buffers.getOrElseUpdate((stream, partition), scala.collection.mutable.ArrayBuffer())
    buf += ((outKey, value))
    if (buf.size >= flushThreshold) flush(stream, partition)
  }

  private def flush(stream: String, partition: Int): Unit = {
    val buf = buffers((stream, partition))
    client.appendAll(stream, partition, buf.toSeq)
    buf.clear()
  }

  override def commit(): WriterCommitMessage = {
    buffers.keys.toSeq.foreach { case (s, p) => flush(s, p) }
    DisCommitMessage
  }
  override def abort(): Unit = buffers.clear()
  override def close(): Unit = client.close()
}
