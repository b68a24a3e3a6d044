package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Property-style fuzz over the round-4 text kernels: thousands of random
  * inputs (ASCII, Unicode incl. supplementary planes, newlines, controls,
  * zero-width salts) must never crash and must keep each operator's core
  * invariants. Complements the example-based specs the way the media
  * decoders' mutation fuzz complements their goldens.
  */
class TextPropertySpec extends AnyFunSuite {

  private def randomText(rnd: scala.util.Random): String = {
    val len = rnd.nextInt(120)
    val sb = new StringBuilder
    (0 until len).foreach { _ =>
      rnd.nextInt(10) match {
        case 0 => sb.append('\n')
        case 1 => sb.append(' ')
        case 2 => sb.append((rnd.nextInt(26) + 'a').toChar)
        case 3 => sb.append((rnd.nextInt(0x20)).toChar) // C0 controls
        case 4 => sb.append("\u200B\u200C\u200D\uFEFF".charAt(rnd.nextInt(4)))
        case 5 => sb.append((0x4E00 + rnd.nextInt(100)).toChar) // CJK
        case 6 => sb.appendAll(Character.toChars(0x1F600 + rnd.nextInt(32))) // emoji
        case 7 => sb.append('\u0301') // combining mark
        case _ => sb.append((rnd.nextInt(94) + 33).toChar) // printable ASCII
      }
    }
    sb.toString
  }

  test("repetition stats: all fractions stay in [0,1] on 3k random inputs") {
    val rnd = new scala.util.Random(7)
    (0 until 3000).foreach { _ =>
      val s = RepetitionStats.compute(randomText(rnd))
      val fracs = Seq(s.dupLineFrac, s.dupLineCharFrac, s.top2gramFrac,
        s.top3gramFrac, s.dup5gramFrac)
      assert(s.nLines >= 0L)
      fracs.foreach(f => assert(f >= 0.0 && f <= 1.0, s"frac $f out of range"))
    }
  }

  test("canonicalizeString: idempotent and clean on 3k random inputs") {
    val rnd = new scala.util.Random(11)
    val banned = "\r\u200B\u200C\u200D\uFEFF\u0000\u0008\u000B\u000C\u007F"
    (0 until 3000).foreach { _ =>
      val once = TextNormalize.canonicalizeString(randomText(rnd))
      assert(TextNormalize.canonicalizeString(once) == once, "not idempotent")
      banned.foreach(c =>
        assert(once.indexOf(c) < 0, f"banned char U+${c.toInt}%04X survived"))
    }
  }

  test("bpe encode: lossless per word on 2k random inputs") {
    import BpeTokenizer.Merge
    // arbitrary merge list (need not come from training for the invariant)
    val merges = Seq(Merge("a", "b"), Merge("ab", "c"),
      Merge("e", "f" + BpeTokenizer.EndOfWord), Merge("x", "y"))
    val rnd = new scala.util.Random(13)
    (0 until 2000).foreach { _ =>
      val t = randomText(rnd)
      // expected words via the SAME derivation encode uses (the train()
      // contract): space-only trim + \s+ split + drop empties. Java .trim
      // would also strip non-whitespace control chars <= U+0020 and desync
      // from the tokenizer on inputs bounded by them.
      var b = 0
      var e = t.length
      while (b < e && t.charAt(b) == ' ') b += 1
      while (e > b && t.charAt(e - 1) == ' ') e -= 1
      val words = t.substring(b, e).toLowerCase(java.util.Locale.ROOT)
        .split("\\s+").filter(_.nonEmpty)
        .map(_.replace(BpeTokenizer.EndOfWord, "")).filter(_.nonEmpty)
      val rejoined = BpeTokenizer.encode(t, merges)
        .mkString.replace(BpeTokenizer.EndOfWord, "")
      assert(rejoined == words.mkString, "encode lost or invented characters")
    }
  }

  test("url canonicalize: never crashes, idempotent, fragment-free on 3k random inputs") {
    val spark = graft.SparkTestBase.spark
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(23)
    val urls = (0 until 3000).map(_ => randomText(rnd).replace("\n", ""))
    val rows = urls.toDF("url")
      .select(col("url"), UrlParts.canonicalize(col("url")).as("c"))
      .select(col("c"), UrlParts.canonicalize(col("c")).as("cc"))
      .collect()
    rows.foreach { r =>
      val c = r.getString(0)
      assert(c != null && !c.contains("#"), s"fragment survived: $c")
      assert(r.getString(1) == c, s"not idempotent: $c -> ${r.getString(1)}")
    }
  }

  test("url parts: never crash, host has no scheme/port/path on 3k random urls") {
    // exercised through the Column API in one batch (codegen path)
    val spark = graft.SparkTestBase.spark
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(17)
    val urls = (0 until 3000).map(_ => randomText(rnd).replace("\n", ""))
    val rows = urls.toDF("url")
      .select(UrlParts.host(col("url")).as("h"),
        UrlParts.registeredDomain(UrlParts.host(col("url"))).as("d"))
      .collect()
    rows.foreach { r =>
      val h = r.getString(0)
      assert(h != null && !h.contains("://") && !h.contains("/") &&
        !h.contains("?") && !h.contains("#"))
      assert(h == h.toLowerCase(java.util.Locale.ROOT))
    }
  }
}
