package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/** Bucket index of a value against a SORTED boundary array: the number
  * of boundaries strictly below the value (values on a boundary fall in
  * the lower bucket, matching `sum_b (v > b)`).
  *
  * Replaces the fold-of-comparisons chunk assignment
  * (`boundaries.foldLeft(lit(0L))(acc + (col > b))`): the fold is O(n)
  * per row and its expression tree grows with the boundary count, which
  * stops being codegen-friendly once the chunk count scales with the
  * cluster (4 × defaultParallelism can be thousands on a real cluster).
  * This is O(log n) per row, a single expression node, and stays inside
  * whole-stage codegen at any boundary count — the boundary array rides
  * along as one reference object, not as plan nodes.
  */
case class SortedBucket(child: Expression, boundaries: Array[Double])
    extends UnaryExpression with ImplicitCastInputTypes {
  override def dataType: DataType = LongType
  override def inputTypes: Seq[DataType] = Seq(DoubleType)

  private def search(v: Double): Long = {
    var lo = 0
    var hi = boundaries.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (boundaries(mid) < v) lo = mid + 1 else hi = mid
    }
    lo.toLong
  }

  override def nullSafeEval(input: Any): Any = search(input.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bounds = ctx.addReferenceObj("bounds", boundaries, "double[]")
    nullSafeCodeGen(ctx, ev, v => {
      s"""
         |int lo = 0, hi = $bounds.length;
         |while (lo < hi) {
         |  int mid = (lo + hi) >>> 1;
         |  if ($bounds[mid] < $v) lo = mid + 1; else hi = mid;
         |}
         |${ev.value} = (long) lo;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SortedBucket {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** Bucket index (0-based count of boundaries strictly below) of `c`
    * against sorted `boundaries`. */
  def sorted_bucket(c: Column, boundaries: Array[Double]): Column =
    ColumnBridge.column(SortedBucket(ColumnBridge.expression(c), boundaries))
}
