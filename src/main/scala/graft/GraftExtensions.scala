package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{FloatVecDot, IntVecDot, PolyFold, PolyHash, TokenRunCount}

/** Session-extension entry point: registers the engine's native
  * Catalyst expressions as SQL functions, so pure-SQL users get the
  * codegen'd kernels too.
  *
  * {{{
  *   SparkSession.builder()
  *     .withExtensions(new GraftExtensions)
  *     // or: .config("spark.sql.extensions", "graft.GraftExtensions")
  *     .getOrCreate()
  *   spark.sql("SELECT float_dot(a.embedding, b.embedding) ...")
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("float_dot"),
      new ExpressionInfo(classOf[FloatVecDot].getName, "float_dot"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "float_dot(arrayA, arrayB) takes 2 arguments")
        FloatVecDot(children.head, children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("int_dot"),
      new ExpressionInfo(classOf[IntVecDot].getName, "int_dot"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "int_dot(arrayA, arrayB) takes 2 arguments")
        IntVecDot(children.head, children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("poly_hash"),
      new ExpressionInfo(classOf[PolyHash].getName, "poly_hash"),
      (children: Seq[Expression]) => {
        require(children.length == 1, "poly_hash(text) takes 1 argument")
        PolyHash(children.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("poly_fold"),
      new ExpressionInfo(classOf[PolyFold].getName, "poly_fold"),
      (children: Seq[Expression]) => {
        require(children.length == 1, "poly_fold(text) takes 1 argument")
        PolyFold(children.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("token_run_count"),
      new ExpressionInfo(classOf[TokenRunCount].getName, "token_run_count"),
      (children: Seq[Expression]) => {
        require(children.length == 1, "token_run_count(text) takes 1 argument")
        TokenRunCount(children.head)
      }))
  }
}
