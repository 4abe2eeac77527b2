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
  */
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
    new DisDataWriter(options, schema, partitionId)
  override def createWriter(partitionId: Int, taskId: Long, epochId: Long): DataWriter[InternalRow] =
    new DisDataWriter(options, schema, partitionId)
}

class DisDataWriter(options: Map[String, String], schema: StructType, taskPartitionId: Int)
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
    val partition =
      if (partitionIdx >= 0 && !row.isNullAt(partitionIdx)) row.getInt(partitionIdx)
      else if (key != null) java.lang.Math.floorMod(java.util.Arrays.hashCode(key), n)
      else { roundRobin += 1; java.lang.Math.floorMod(roundRobin, n) }
    val buf = buffers.getOrElseUpdate((stream, partition), scala.collection.mutable.ArrayBuffer())
    buf += ((key, value))
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
