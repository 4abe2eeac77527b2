package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the engine's portable 31-bit text
  * hash ((Σ (i+1)·charᵢ) · 48271 mod 2147483647 — the
  * DedupQueries.polyHashS arithmetic, SQL-replicable in any engine).
  *
  * Exists so pure-SQL users get the same codegen'd kernel the Scala
  * operators use: the HOF formulation (aggregate∘zip_with∘split) is
  * evaluated interpreted and was the suite's last 9×-sensitive hot
  * spot before the kernels replaced it. Stays inside whole-stage
  * codegen; iterates UTF-16 code units exactly like the kernel, so
  * `poly_hash(s)` == polyHashS(s) byte-for-byte.
  */
case class PolyHash(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def dataType: DataType = LongType
  override def inputTypes: Seq[DataType] = Seq(StringType) // covariant: AbstractDataType is sql-private

  override def nullSafeEval(input: Any): Any =
    PolyHash.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.PolyHash.hash($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PolyHash {
  /** Static entry point shared by eval and generated code. */
  def hash(s: UTF8String): Long = {
    val str = s.toString
    var acc = 0L
    var i = 0
    while (i < str.length) { acc += (i + 1).toLong * str.charAt(i).toLong; i += 1 }
    java.lang.Math.floorMod(acc * 48271L, 2147483647L)
  }
}

/** Native Catalyst expression for the SHARED base-31 polynomial fold
  * ([[graft.api.GraftSelectionOps.polyExtend]]'s arithmetic:
  * acc ← (acc·31 + unit) mod 2³¹ over UTF-16 units) — the hash the
  * DSIR buckets, fixed-point LR featurizer and CMS sketch replay in
  * ANSI SQL via `list_reduce((acc,c) -> (acc*31+c) % 2147483648)`.
  * Same BMP replay scope as polyExtend. Distinct from [[PolyHash]]
  * (the weighted-sum Lehmer hash): the fold is position-sensitive in
  * a way the weighted sum is not ('the_2' vs 'agg_5' collide under
  * PolyHash — caught by the round-15 sf1 CMS gate). */
case class PolyFold(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def dataType: DataType = LongType
  override def inputTypes: Seq[DataType] = Seq(StringType)

  override def nullSafeEval(input: Any): Any =
    PolyFold.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.PolyFold.hash($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PolyFold {
  /** Static entry point shared by eval and generated code. */
  def hash(s: UTF8String): Long = {
    val str = s.toString
    var acc = 0L
    var i = 0
    while (i < str.length) {
      acc = (acc * 31L + str.charAt(i).toLong) % 2147483648L
      i += 1
    }
    acc
  }
}
