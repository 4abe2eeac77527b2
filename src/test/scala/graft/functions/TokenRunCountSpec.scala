package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.SparkTestBase

/** TokenRunCount must be INDISTINGUISHABLE from
  * `regexp_count(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')` — the byte-scan
  * kernel replaces the regex in hot paths (tokenCounts,
  * qSftPackTokens) while every DuckDB oracle keeps the regex form, so
  * any divergence is a correctness bug, not a performance trade. */
class TokenRunCountSpec extends SparkTestBase {
  import spark.implicits._

  private val Re = "[a-z]+|[0-9]+|[^a-z0-9 ]".r
  private def regexCount(s: String): Int = Re.findAllIn(s).length

  test("hand-picked shapes: runs, boundaries, spaces, unicode, empties") {
    val cases = Seq(
      "", " ", "   ",
      "abc", "abc def", "a1b2", "123", "12 34",
      "ABC", "Hello, World!", "a-b_c", "<|user|>click {\"k\":3}",
      "émigré café", "日本語テキスト", "emoji 🎉🎊 mix",
      "𝔘𝔫𝔦𝔠𝔬𝔡𝔢", // beyond-BMP (surrogate pairs in UTF-16, 4-byte UTF-8)
      "a🎉b", "  leading and trailing  ", "\ttab\nnewline")
    cases.foreach { s =>
      assert(TokenRunCount.count(UTF8String.fromString(s)) === regexCount(s),
        s"mismatch on ${s.take(40)}")
    }
  }

  test("property: equals the regex count on randomized mixed-alphabet " +
      "strings (ASCII, punctuation, multi-byte, beyond-BMP)") {
    val rng = new scala.util.Random(42)
    val alphabets = Array(
      "abcdefz", "0123456789", " ", "ABCXYZ", ".,;!?-_()[]{}",
      "äöüßéñ日本語", new String(Character.toChars(0x1F600)) + new String(Character.toChars(0x1D54A)))
    (1 to 2000).foreach { _ =>
      val len = rng.nextInt(40)
      val s = (0 until len).map { _ =>
        val a = alphabets(rng.nextInt(alphabets.length))
        // pick a CODE POINT, not a char, so surrogate pairs stay whole
        val cps = a.codePoints().toArray
        new String(Character.toChars(cps(rng.nextInt(cps.length))))
      }.mkString
      assert(TokenRunCount.count(UTF8String.fromString(s)) === regexCount(s),
        s"mismatch on ${s.take(60)}")
    }
  }

  test("column path: codegen'd (not a fallback), matches regexp_count in " +
      "a plan, null in null out, and the SQL registration works") {
    val e = TokenRunCount(
      org.apache.spark.sql.catalyst.expressions.Literal.create("ab 12!",
        org.apache.spark.sql.types.StringType))
    assert(!e.isInstanceOf[org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback])
    assert(e.eval(null) === 3)

    val df = Seq(Some("hello 42 worlds!"), Some(""), None, Some("🎉 a1"))
      .toDF("t")
    val both = df.select(
      TokenRunCount.token_run_count(col("t")).as("kernel"),
      regexp_count(col("t"), lit("[a-z]+|[0-9]+|[^a-z0-9 ]")).as("re"))
    assert(both.filter(!(col("kernel") <=> col("re"))).count() === 0L)
    // (SQL registration is covered in GraftExtensionsSpec — extensions
    // bind at session construction, not on the shared test session)
  }
}
