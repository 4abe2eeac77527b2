package graft.sources

import java.io.{BufferedReader, FileReader, FileWriter}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}

import scala.collection.mutable

import org.json4s._
import org.json4s.jackson.{JsonMethods, Serialization}

/** One record of a partitioned stream — the engine's analog of the
  * reference's `ConsumerRecord[K,V]` (dis/DISRDD.scala:53): bytes in,
  * bytes out, structure imposed downstream (SURVEY §1.2). */
final case class StreamRecord(
    stream: String,
    partition: Int,
    offset: Long,
    key: Array[Byte],
    value: Array[Byte],
    timestampMs: Long)

/** Client boundary to the partitioned message service. The reference
  * delegates this to its dis-kafka-adapter SDK; we define the minimal
  * surface the connector needs. Implementations must be cheap to
  * construct on executors from string options (no serialized state). */
trait StreamClient extends AutoCloseable {
  /** Names of all streams on the service (admin surface; backs
    * SubscribePattern, dis/ConsumerStrategy.scala:132-171). */
  def listStreams(): Seq[String]
  /** Readable partition ids of a stream (dis/DISUtils.scala:345-361). */
  def partitionsFor(stream: String): Seq[Int]
  /** First available offset (seekToBeginning analog). */
  def earliestOffset(stream: String, partition: Int): Long
  /** One past the last available offset (seekToEnd analog). */
  def latestOffset(stream: String, partition: Int): Long
  /** Sequential fetch of up to `maxRecords` starting at `fromOffset`. */
  def fetch(stream: String, partition: Int, fromOffset: Long, maxRecords: Int): Seq[StreamRecord]
  /** Append one record; returns its assigned offset (producer analog,
    * dis/DISSink.scala:27-34). At-least-once: no transactions. */
  def append(stream: String, partition: Int, key: Array[Byte], value: Array[Byte]): Long
  /** Batched append — the producer's buffered-send path; implementations
    * should amortize connection/open costs. */
  def appendAll(stream: String, partition: Int, records: Seq[(Array[Byte], Array[Byte])]): Unit =
    records.foreach { case (k, v) => append(stream, partition, k, v) }
  /** Commit consumer-group offsets (dis/OffsetRange.scala:60-91). */
  def commit(stream: String, groupId: String, offsets: Map[Int, Long]): Unit
  /** Last committed offsets for a group; empty if none. */
  def committed(stream: String, groupId: String): Map[Int, Long]
  override def close(): Unit = ()
}

object StreamClient {
  /** Factory from connector options — executors rebuild clients from
    * options rather than deserializing instances (same stance as the
    * reference's executorKafkaParams, dis/DISUtils.scala:222-237). */
  def forOptions(options: Map[String, String]): StreamClient = {
    val root = options.getOrElse("client.root",
      throw new IllegalArgumentException("option 'client.root' is required"))
    new FileStreamClient(Paths.get(root))
  }
}

/** File-backed stream service: `<root>/<stream>/p<k>.jsonl`, one JSON
  * line per record, offset = line number. Deterministic, network-free —
  * the test double standing in for the remote partitioned-stream service
  * (the reference tests only against a live endpoint; we refuse to).
  *
  * Thread-safety: appends/commits synchronize on a per-path JVM-wide
  * lock — sound for local[N] (one JVM); a multi-JVM deployment would
  * implement [[StreamClient]] against the real service instead.
  */
final class FileStreamClient(root: Path) extends StreamClient {
  private implicit val formats: Formats = Serialization.formats(NoTypeHints)

  private def streamDir(stream: String): Path = root.resolve(stream)

  override def listStreams(): Seq[String] = {
    if (!Files.isDirectory(root)) return Seq.empty
    val listing = Files.list(root)
    try listing.toArray.toSeq.map(_.asInstanceOf[Path])
      .filter(Files.isDirectory(_))
      .map(_.getFileName.toString).sorted
    finally listing.close()
  }
  private def partFile(stream: String, p: Int): Path = streamDir(stream).resolve(s"p$p.jsonl")

  override def partitionsFor(stream: String): Seq[Int] = {
    val dir = streamDir(stream)
    if (!Files.isDirectory(dir)) return Seq.empty
    val re = "^p(\\d+)\\.jsonl$".r
    val listing = Files.list(dir) // java Stream holds an FD: must close
    try listing.toArray.toSeq.map(_.asInstanceOf[Path].getFileName.toString)
      .collect { case re(p) => p.toInt }.sorted
    finally listing.close()
  }

  /** Create a stream with `n` partitions (admin analog for tests). */
  def createStream(stream: String, n: Int): Unit = {
    Files.createDirectories(streamDir(stream))
    (0 until n).foreach { p =>
      val f = partFile(stream, p)
      if (!Files.exists(f)) Files.createFile(f)
    }
  }

  override def earliestOffset(stream: String, partition: Int): Long = 0L

  override def latestOffset(stream: String, partition: Int): Long =
    FileStreamClient.withLock(partFile(stream, partition)) { f =>
      FileStreamClient.index(f).lines
    }

  // Reads take the same per-path lock as writes: appendAll writes through
  // a buffered writer that can flush mid-line, so an unlocked concurrent
  // read could observe a torn trailing JSON fragment.
  override def fetch(stream: String, partition: Int, fromOffset: Long, maxRecords: Int): Seq[StreamRecord] = {
    val f = partFile(stream, partition)
    if (!Files.exists(f)) return Seq.empty
    FileStreamClient.withLock(f) { _ =>
      // the line index turns the seek from O(fromOffset) line reads into
      // one byte-seek to the nearest anchor + ≤AnchorEvery line skips
      val idx = FileStreamClient.index(f)
      if (fromOffset >= idx.lines) return Seq.empty
      val anchorNo = math.min(fromOffset / FileStreamClient.AnchorEvery,
        idx.anchors.length - 1L).toInt
      val in = new java.io.FileInputStream(f.toFile)
      try {
        var toSkip = idx.anchors(anchorNo)
        while (toSkip > 0) toSkip -= in.skip(toSkip)
        val reader = new BufferedReader(
          new java.io.InputStreamReader(in, StandardCharsets.UTF_8))
        var skipped = anchorNo.toLong * FileStreamClient.AnchorEvery
        while (skipped < fromOffset && reader.readLine() != null) skipped += 1
        val out = mutable.ArrayBuffer[StreamRecord]()
        var offset = fromOffset
        var line = if (out.size < maxRecords) reader.readLine() else null
        while (line != null) {
          out += FileStreamClient.parseRecord(stream, partition, offset, line)
          offset += 1
          line = if (out.size < maxRecords) reader.readLine() else null
        }
        out.toSeq
      } finally in.close()
    }
  }

  override def append(stream: String, partition: Int, key: Array[Byte], value: Array[Byte]): Long =
    appendAllReturningFirst(stream, partition,
      Seq(key -> value))

  override def appendAll(stream: String, partition: Int, records: Seq[(Array[Byte], Array[Byte])]): Unit = {
    if (records.isEmpty) return
    appendAllReturningFirst(stream, partition, records)
    ()
  }

  private def appendAllReturningFirst(stream: String, partition: Int,
      records: Seq[(Array[Byte], Array[Byte])]): Long = {
    Files.createDirectories(streamDir(stream))
    FileStreamClient.withLock(partFile(stream, partition)) { f =>
      val offset = FileStreamClient.index(f).lines
      val now = System.currentTimeMillis()
      val w = new java.io.BufferedWriter(new FileWriter(f.toFile, true))
      try records.foreach { case (k, v) =>
        w.write(FileStreamClient.recordJson(k, v, now)); w.write('\n')
      } finally w.close()
      // the index refreshes incrementally from its last byte position on
      // the next lookup — no bookkeeping needed here
      offset
    }
  }

  override def commit(stream: String, groupId: String, offsets: Map[Int, Long]): Unit = {
    Files.createDirectories(streamDir(stream))
    val f = streamDir(stream).resolve(s".committed-$groupId.json")
    FileStreamClient.withLock(f) { _ =>
      val merged = committed(stream, groupId) ++ offsets
      Files.write(f, Serialization.write(merged.map { case (k, v) => k.toString -> v })
        .getBytes(StandardCharsets.UTF_8))
    }
  }

  override def committed(stream: String, groupId: String): Map[Int, Long] = {
    val f = streamDir(stream).resolve(s".committed-$groupId.json")
    if (!Files.exists(f)) Map.empty
    else Serialization.read[Map[String, Long]](new String(Files.readAllBytes(f), StandardCharsets.UTF_8))
      .map { case (k, v) => k.toInt -> v }
  }
}

object FileStreamClient {
  private val locks = new java.util.concurrent.ConcurrentHashMap[String, Object]()

  private def withLock[T](path: Path)(body: Path => T): T = {
    val lock = locks.computeIfAbsent(path.toAbsolutePath.toString, _ => new Object)
    lock.synchronized(body(path))
  }

  /** Incremental line index per partition file: (bytes scanned, line
    * count, byte anchor every AnchorEvery lines). A per-trigger
    * `latestOffset` over many partitions re-reads only bytes appended
    * since the last scan instead of every file from byte 0, and `fetch`
    * byte-seeks to an anchor instead of line-skipping from the top.
    * Must be called under the path's lock. Truncated/replaced files
    * (size shrank) trigger a full rescan. */
  private[sources] val AnchorEvery = 256L

  private[sources] final class LineIndex {
    var bytes = 0L
    var lines = 0L
    val anchorBuf = mutable.ArrayBuffer[Long](0L)
    def anchors: mutable.ArrayBuffer[Long] = anchorBuf
  }

  private val indices = new java.util.concurrent.ConcurrentHashMap[String, LineIndex]()

  private[sources] def index(f: Path): LineIndex = {
    val key = f.toAbsolutePath.toString
    var idx = indices.computeIfAbsent(key, _ => new LineIndex)
    if (!Files.exists(f)) {
      if (idx.bytes > 0) { idx = new LineIndex; indices.put(key, idx) }
      return idx
    }
    val size = Files.size(f)
    if (size < idx.bytes) { // truncated/replaced: rescan from scratch
      idx = new LineIndex
      indices.put(key, idx)
    }
    if (size > idx.bytes) {
      val in = new java.io.FileInputStream(f.toFile)
      try {
        var toSkip = idx.bytes
        while (toSkip > 0) toSkip -= in.skip(toSkip)
        val buf = new Array[Byte](64 * 1024)
        var pos = idx.bytes
        var n = in.read(buf)
        while (n > 0) {
          var i = 0
          while (i < n) {
            if (buf(i) == '\n') {
              idx.lines += 1
              if (idx.lines % AnchorEvery == 0) idx.anchorBuf += pos + i + 1
            }
            i += 1
          }
          pos += n
          n = in.read(buf)
        }
        idx.bytes = pos
      } finally in.close()
    }
    idx
  }

  private implicit val formats: Formats = Serialization.formats(NoTypeHints)

  private val b64e = java.util.Base64.getEncoder
  private val b64d = java.util.Base64.getDecoder

  // key/value are base64 in the JSONL records: the connector schema is
  // BinaryType (bytes in, bytes out), and routing arbitrary bytes through
  // new String(UTF_8) would corrupt non-UTF-8 payloads (invalid sequences
  // become U+FFFD).
  private[sources] def recordJson(key: Array[Byte], value: Array[Byte], tsMs: Long): String = {
    val k = if (key == null) JNull else JString(b64e.encodeToString(key))
    JsonMethods.compact(JsonMethods.render(JObject(
      "key" -> k,
      "value" -> JString(b64e.encodeToString(value)),
      "ts" -> JLong(tsMs))))
  }

  private[sources] def parseRecord(stream: String, partition: Int, offset: Long, line: String): StreamRecord = {
    val j = JsonMethods.parse(line)
    val key = j \ "key" match {
      case JString(s) => b64d.decode(s)
      case _          => null
    }
    val value = j \ "value" match {
      case JString(s) => b64d.decode(s)
      case _          => Array.emptyByteArray
    }
    val ts = j \ "ts" match {
      case JInt(n)  => n.toLong
      case JLong(n) => n
      case _        => 0L
    }
    StreamRecord(stream, partition, offset, key, value, ts)
  }
}
