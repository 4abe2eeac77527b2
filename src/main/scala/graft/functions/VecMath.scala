package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType, LongType}

/** Native Catalyst expression for float-vector dot products.
  *
  * Spark's higher-order-function route (`aggregate(zip_with(...))`) is
  * evaluated interpreted, allocating an intermediate array per call —
  * measured ~100× slower than this tight codegen'd loop on the
  * similarity workloads. Accumulation is left-to-right in double
  * (same order/precision as the SQL-oracle formulation, so results
  * stay bit-identical).
  *
  * This is the "custom Expression beats UDF" path: stays inside
  * whole-stage codegen, no boxing, no closure dispatch.
  */
case class FloatVecDot(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def dataType: DataType = DoubleType
  // array<double> inputs (e.g. SQL literals) are implicitly cast to
  // array<float>; mismatched types fail analysis instead of silently
  // misreading 8-byte slots as floats
  override def inputTypes: Seq[ArrayType] = // covariant: AbstractDataType is sql-private
    Seq(ArrayType(FloatType), ArrayType(FloatType))

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      s += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |int n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double acc = 0.0;
         |for (int i = 0; i < n; i++) {
         |  acc += (double) $a.getFloat(i) * (double) $b.getFloat(i);
         |}
         |${ev.value} = acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Exact integer dot product of two array<int> code vectors (the
  * scalar-quantized-ANN scoring kernel): long accumulation, so 64
  * int8-range codes can never overflow. Same codegen rationale as
  * [[FloatVecDot]] — the HOF route interprets per element; this stays
  * inside whole-stage codegen and moves 4× less data than the float
  * scan it approximates. */
case class IntVecDot(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def dataType: DataType = LongType
  override def inputTypes: Seq[ArrayType] =
    Seq(ArrayType(IntegerType), ArrayType(IntegerType))

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0L
    var i = 0
    while (i < n) {
      s += x.getInt(i).toLong * y.getInt(i).toLong
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |int n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long acc = 0L;
         |for (int i = 0; i < n; i++) {
         |  acc += (long) $a.getInt(i) * (long) $b.getInt(i);
         |}
         |${ev.value} = acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VecMath {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** Dot product of two array<float> columns as double. */
  def float_dot(a: Column, b: Column): Column =
    ColumnBridge.column(
      FloatVecDot(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Exact dot product of two array<int> columns as long. */
  def int_dot(a: Column, b: Column): Column =
    ColumnBridge.column(
      IntVecDot(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** The portable 31-bit text hash as a codegen'd column
    * (== DedupQueries.polyHashS; SQL surface: `poly_hash`). */
  def poly_hash(s: Column): Column =
    ColumnBridge.column(PolyHash(ColumnBridge.expression(s)))
}
