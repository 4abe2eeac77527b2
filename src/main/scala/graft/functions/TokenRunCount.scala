package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression counting BPE-ish pre-tokenizer tokens:
  * the number of matches of `[a-z]+|[0-9]+|[^a-z0-9 ]` — i.e. maximal
  * lowercase-letter runs + maximal digit runs + one per other
  * non-space CODE POINT (Java regex and RE2 both match classes at code
  * point granularity, so a 4-byte emoji is ONE token, exactly like the
  * regex forms this replaces).
  *
  * `regexp_count`/`size(regexp_extract_all(...))` pay the
  * java.util.regex matcher per row — alternation dispatch, region
  * bookkeeping, and (for extract_all) a match-array allocation. This
  * is a single byte-level pass over the UTF8String with no allocation,
  * the FloatVecDot argument applied to the tokenizer hot path: at
  * 100 TB the pre-tokenizer count IS the dominant map-side cost of
  * token-budget packing and token statistics. TokenRunCountSpec pins
  * equality with the regex on randomized inputs (ASCII, punctuation,
  * multi-byte including beyond-BMP) — the DuckDB oracles keep their
  * `len(regexp_extract_all(...))` formulation, so the gate hash proves
  * the equivalence on the fixtures every round. */
case class TokenRunCount(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def dataType: DataType = IntegerType
  override def inputTypes: Seq[StringType] = Seq(StringType)

  override def nullSafeEval(s: Any): Any =
    TokenRunCount.count(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TokenRunCount.count($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TokenRunCount {
  /** Byte-level scan: UTF-8 continuation bytes are skipped via the
    * leading byte's length, so multi-byte code points count once.
    * States: 0 = none, 1 = inside a letter run, 2 = inside a digit
    * run; a run contributes exactly one token at its first byte —
    * identical to the greedy regex alternation's scan order. */
  def count(s: UTF8String): Int = {
    val n = s.numBytes()
    var i = 0
    var cnt = 0
    var state = 0
    while (i < n) {
      val b = s.getByte(i)
      if (b >= 'a' && b <= 'z') {
        if (state != 1) { cnt += 1; state = 1 }
        i += 1
      } else if (b >= '0' && b <= '9') {
        if (state != 2) { cnt += 1; state = 2 }
        i += 1
      } else if (b == ' ') {
        state = 0
        i += 1
      } else if (b >= 0) { // other ASCII: one token per char
        cnt += 1
        state = 0
        i += 1
      } else { // multi-byte code point: one token, skip its bytes
        cnt += 1
        state = 0
        i += UTF8String.numBytesForFirstByte(b)
      }
    }
    cnt
  }

  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** The pre-tokenizer token count of a string column as int —
    * drop-in for `regexp_count(c, '[a-z]+|[0-9]+|[^a-z0-9 ]')`. */
  def token_run_count(c: Column): Column =
    ColumnBridge.column(TokenRunCount(ColumnBridge.expression(c)))
}
