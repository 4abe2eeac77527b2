package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** The k-minimum-values sketch state (Bar-Yossef et al. 2002) as a
  * native aggregate: each buffer holds at most `k` smallest DISTINCT
  * hash values seen so far, as a sorted set. Output is the sorted
  * ascending long array (length ≤ k).
  *
  * Why an aggregate and not a window: the sketch is ASSOCIATIVE —
  * `merge` is set-union-then-trim — so Spark plans it as a partial
  * (map-side) aggregate followed by one final hash aggregate on the
  * grouping key. State per group is O(k) regardless of the group's
  * distinct count m, and nothing is ever sorted at the group's full
  * grain. The previous formulation (`row_number` over a
  * per-key-partitioned unbounded window) sorted every key's ENTIRE
  * distinct-hash stream in one task — O(m log m) with m growing with
  * the corpus, a single-task bottleneck at 100× when the key is a
  * fixed-cardinality stratum. This shape is the textbook KMV plan:
  * one exchange on the key, constant-size buffers, exactness below k
  * because the sketch is complete there.
  *
  * Buffer is a `java.util.TreeSet` (sorted + distinct, O(log k)
  * insert, O(1) trim of the max); serialization is a flat long array.
  */
case class KmvMinHashes(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
  with UnaryLike[Expression] {

  require(k >= 2, s"k must be >= 2, got $k")

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  override def update(
      buf: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      // skip values that cannot enter a full sketch — avoids the
      // add/poll churn on the common (h > current max) path
      if (buf.size() < k || h < buf.last()) {
        buf.add(h)
        if (buf.size() > k) buf.pollLast()
      }
    }
    buf
  }

  override def merge(
      buf: java.util.TreeSet[java.lang.Long],
      other: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = other.iterator()
    while (it.hasNext) {
      val h = it.next()
      if (buf.size() < k || h < buf.last()) {
        buf.add(h)
        if (buf.size() > k) buf.pollLast()
      }
    }
    buf
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val out = new Array[Long](buf.size())
    var i = 0
    val it = buf.iterator()
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.size())
    bb.putInt(buf.size())
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < n) { buf.add(bb.getLong); i += 1 }
    buf
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "kmv_min_hashes"

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvMinHashes =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvMinHashes =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvMinHashes =
    copy(child = newChild)
}

object KmvMinHashes {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** The ≤ k smallest distinct values of long column `c` within each
    * group, sorted ascending. */
  def kmv_min_hashes(c: Column, k: Int): Column =
    ColumnBridge.column(
      KmvMinHashes(ColumnBridge.expression(c), k).toAggregateExpression())
}
