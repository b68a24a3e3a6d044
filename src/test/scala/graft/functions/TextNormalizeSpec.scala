package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** All non-ASCII is spelled as \\u escapes — invisible literals in test
  * sources are exactly the trap this operator exists to remove.
  */
class TextNormalizeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private val ComposedCafe = "caf\u00E9" // café, NFC
  private val DecomposedCafe = "cafe\u0301" // e + combining acute

  private def canon(s: String): String = {
    import spark.implicits._
    Seq(Tuple1(s)).toDF("t")
      .select(TextNormalize.canonicalize(col("t")).as("c"))
      .collect().head.getString(0)
  }

  test("newlines canonicalize: CRLF and lone CR become LF") {
    assert(canon("a\r\nb\rc\nd") == "a\nb\nc\nd")
  }

  test("zero-width and control chars are stripped, tab and LF survive") {
    assert(canon("a\u200Bb\u200Cc\u200Dd\uFEFFe") == "abcde")
    assert(canon("a\u0000b\u0008c\td\ne\u007F") == "abc\td\ne")
  }

  test("NFC composes decomposed sequences; zero-width cannot block it") {
    assert(canon(DecomposedCafe) == ComposedCafe)
    // zero-width space BETWEEN base and mark is stripped first, so the
    // mark still composes (stripping after NFC would leave it bare)
    assert(canon("cafe\u200B\u0301") == ComposedCafe)
  }

  test("canonicalization is idempotent and identity on clean ASCII") {
    val ascii = "plain text stays exactly as it was.\nsecond line."
    assert(canon(ascii) == ascii)
    val once = canon(DecomposedCafe + "\r\nx\u200B")
    assert(canon(once) == once)
  }

  test("equal visible text hashes equal after canonicalization") {
    // the dedup motivation: composed vs decomposed vs zero-width-salted
    val variants = Seq(
      s"$ComposedCafe au lait",
      s"$DecomposedCafe au lait",
      s"$ComposedCafe\u200B au lait")
    assert(variants.map(canon).distinct.size == 1)
  }
}
