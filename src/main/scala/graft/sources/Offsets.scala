package graft.sources

import org.json4s._
import org.json4s.jackson.Serialization

/** Offset algebra for the stream source.
  *
  * Semantics follow the reference's offset model:
  * half-open ranges `[fromOffset, untilOffset)` with `count = until - from`
  * (reference: dis/OffsetRange.scala:94-134), LATEST = -1 / EARLIEST = -2
  * sentinels (dis/DISUtils.scala:261-286, dis/JsonUtils.scala:58-84), and
  * the Kafka-compatible JSON dialects of dis/JsonUtils.scala:19-106.
  */
final case class OffsetRange(stream: String, partition: Int, fromOffset: Long, untilOffset: Long) {
  // sentinels (-1 latest / -2 earliest) are legal on either side until
  // resolution; the ordering invariant only applies to resolved offsets
  require(fromOffset < 0 || untilOffset < 0 || fromOffset <= untilOffset,
    s"Invalid range for $stream-$partition: from $fromOffset beyond until $untilOffset")
  def count: Long = untilOffset - fromOffset
  def isEmpty: Boolean = count == 0L
}

object Offsets {
  /** Sentinel: resolve to the partition's latest offset (seekToEnd). */
  val Latest: Long = -1L
  /** Sentinel: resolve to the partition's earliest offset (seekToBeginning). */
  val Earliest: Long = -2L

  private implicit val formats: Formats = Serialization.formats(NoTypeHints)

  /** `{"stream":{"0":23,"1":-1}}` → per-(stream,partition) offsets.
    * Same dialect as the reference's partitionOffsets codec
    * (dis/JsonUtils.scala:44-63) and Spark's Kafka source
    * `startingOffsets` JSON. */
  def partitionOffsets(json: String): Map[(String, Int), Long] =
    try {
      Serialization.read[Map[String, Map[String, Long]]](json).flatMap {
        case (stream, partOffsets) =>
          partOffsets.map { case (part, offset) => (stream, part.toInt) -> offset }
      }
    } catch {
      case _: Throwable =>
        throw new IllegalArgumentException(
          s"""Expected e.g. {"streamA":{"0":23,"1":-1},"streamB":{"0":-2}}, got $json""")
    }

  /** Inverse of [[partitionOffsets]]; partitions sorted for determinism
    * (reference sorts too: dis/JsonUtils.scala:98). */
  def partitionOffsetsJson(offsets: Map[(String, Int), Long]): String = {
    val grouped = offsets.groupBy(_._1._1).view.mapValues { inner =>
      // LinkedHashMap to keep sorted-by-partition order in the output
      val m = scala.collection.mutable.LinkedHashMap[String, Long]()
      inner.toSeq.sortBy(_._1._2).foreach { case ((_, p), o) => m.put(p.toString, o) }
      m
    }.toSeq.sortBy(_._1)
    val sb = new StringBuilder("{")
    grouped.zipWithIndex.foreach { case ((stream, parts), i) =>
      if (i > 0) sb.append(',')
      sb.append(Serialization.write(stream)).append(":{")
      parts.zipWithIndex.foreach { case ((p, o), j) =>
        if (j > 0) sb.append(',')
        sb.append('"').append(p).append("\":").append(o)
      }
      sb.append('}')
    }
    sb.append('}').toString
  }

  /** `{"stream":{"0":[100,200],"1":[-2,-1]}}` → offset ranges, sentinels
    * unresolved (reference: dis/JsonUtils.scala:74-86 +
    * dis/DISUtils.scala:240-303). */
  def partitionRanges(json: String): Seq[OffsetRange] =
    try {
      Serialization.read[Map[String, Map[String, Seq[Long]]]](json).toSeq.flatMap {
        case (stream, parts) =>
          parts.toSeq.map { case (part, range) =>
            require(range.length == 2, s"range must be [from,until], got $range")
            OffsetRange(stream, part.toInt, range.head, range.last)
          }
      }.sortBy(r => (r.stream, r.partition))
    } catch {
      case e: IllegalArgumentException => throw e
      case _: Throwable =>
        throw new IllegalArgumentException(
          s"""Expected e.g. {"streamA":{"0":[100,200],"1":[-2,-1]}}, got $json""")
    }

  /** `{"stream":[0,2]}` → explicit partition assignment per stream —
    * the Assign consumer-strategy dialect (reference
    * dis/ConsumerStrategy.scala:186-213; Kafka source `assign`). */
  def streamPartitions(json: String): Map[String, Seq[Int]] =
    try {
      val parsed = Serialization.read[Map[String, Seq[Int]]](json)
      require(parsed.nonEmpty && parsed.forall(_._2.nonEmpty))
      parsed.view.mapValues(_.distinct.sorted).toMap
    } catch {
      case _: Throwable =>
        throw new IllegalArgumentException(
          s"""Expected e.g. {"streamA":[0,2],"streamB":[1]} with at least one partition per stream, got $json""")
    }

  /** `{"stream":{"0":"host-a"}}` → per-(stream,partition) preferred
    * hosts — the PreferFixed location dialect
    * (dis/LocationStrategy.scala:59-74). */
  def partitionHosts(json: String): Map[(String, Int), String] =
    try {
      Serialization.read[Map[String, Map[String, String]]](json).flatMap {
        case (stream, parts) =>
          parts.map { case (part, host) => (stream, part.toInt) -> host }
      }
    } catch {
      case _: Throwable =>
        throw new IllegalArgumentException(
          s"""Expected e.g. {"streamA":{"0":"host-a","1":"host-b"}}, got $json""")
    }

  /** Resolve -1/-2 sentinels against actual earliest/latest offsets. */
  def resolve(offset: Long, earliest: => Long, latest: => Long): Long = offset match {
    case Latest   => latest
    case Earliest => earliest
    case o =>
      require(o >= 0, s"offset must be >= 0 or -1 (latest) / -2 (earliest), got $o")
      o
  }
}
