package graft.functions

import java.nio.charset.StandardCharsets
import java.util.Locale

/** Gopher-style repetition statistics — the standard "repetitious document"
  * quality-filter family for LLM training corpora (Rae et al. 2021, table A1;
  * also used by RefinedWeb/FineWeb): duplicate-line fractions and
  * most-frequent / duplicated word-n-gram character fractions. Boilerplate,
  * scraped navigation, and degenerate generator output score high; prose
  * scores near zero.
  *
  * One pass over the text per document (CLAUDE.md HOF gotcha: nested
  * higher-order functions re-evaluate outer subexpressions per element, so
  * per-line/per-gram counting via array HOFs would be quadratic — same
  * decision as [[TextHashing.minhashSignatureFromText]]). Embarrassingly
  * parallel: no shuffle, scales linearly with corpus bytes.
  *
  * Definitions (all deterministic and replayed exactly in the q3r DuckDB
  * oracle; "chars" = Unicode code points, matching DuckDB/Spark `length`):
  *
  *   - lines: text split on '\n', each trimmed of ' ' '\t' '\r', empties
  *     dropped.
  *   - `dupLineFrac`   = (n_lines − distinct_lines) / n_lines
  *   - `dupLineCharFrac` = chars in occurrences of repeated lines / chars in
  *     all line occurrences
  *   - tokens: `lower(trim(text))` split on `\s+` (the shared tokenizer
  *     contract of [[TextAnalysis.lowerTokens]], empty-string artifacts
  *     preserved for oracle parity with `regexp_split_to_array`).
  *   - `topNgramFrac(n)` (n=2,3): occurrences(top gram) × chars(top gram) /
  *     chars(space-joined tokens), capped at 1.0 (overlapping occurrences
  *     are occurrence-mass, not coverage — "spam spam spam…" saturates).
  *     Ties broken by smallest gram in UTF-8 byte order (= DuckDB's binary
  *     collation, NOT String.compareTo's UTF-16 order).
  *   - `dupNgramFrac(n)` (n=5): Σ occurrences×chars over grams occurring
  *     more than once / Σ occurrences×chars over all grams (≤ 1 by
  *     construction).
  *
  * Empty/null text and too-short docs score 0 everywhere (no evidence of
  * repetition is not repetition — mirrors the Curate null policy).
  */
object RepetitionStats {

  /** Struct-shaped result (one UDF call computes every stat in one parse). */
  case class Stats(
      nLines: Long,
      dupLineFrac: Double,
      dupLineCharFrac: Double,
      top2gramFrac: Double,
      top3gramFrac: Double,
      dup5gramFrac: Double)

  private val Empty = Stats(0L, 0.0, 0.0, 0.0, 0.0, 0.0)

  private val LineTrimChars = " \t\r"

  private def trimLine(s: String): String = {
    var a = 0
    var b = s.length
    while (a < b && LineTrimChars.indexOf(s.charAt(a)) >= 0) a += 1
    while (b > a && LineTrimChars.indexOf(s.charAt(b - 1)) >= 0) b -= 1
    s.substring(a, b)
  }

  /** Space-only trim, matching Spark/DuckDB `trim` (NOT String.trim, which
    * strips every char ≤ U+0020 including the '\n' the line stats need).
    */
  private def spaceTrim(s: String): String = {
    var a = 0
    var b = s.length
    while (a < b && s.charAt(a) == ' ') a += 1
    while (b > a && s.charAt(b - 1) == ' ') b -= 1
    s.substring(a, b)
  }

  /** Code-point count — DuckDB `len` / Spark `length` semantics (a
    * supplementary-plane char counts 1, not its 2 UTF-16 units).
    */
  private def cpLen(s: String): Long = s.codePointCount(0, s.length).toLong

  /** Unsigned lexicographic UTF-8 byte order — DuckDB's binary collation. */
  private def utf8Less(a: String, b: String): Boolean = {
    val x = a.getBytes(StandardCharsets.UTF_8)
    val y = b.getBytes(StandardCharsets.UTF_8)
    var i = 0
    val n = math.min(x.length, y.length)
    while (i < n) {
      val d = (x(i) & 0xFF) - (y(i) & 0xFF)
      if (d != 0) return d < 0
      i += 1
    }
    x.length < y.length
  }

  /** (occurrence-mass of repeated grams, total mass, top gram mass) for word
    * n-grams of `toks`; gram chars include the (n−1) joining spaces.
    */
  private def gramMasses(toks: Array[String], n: Int): (Long, Long, Long) = {
    val m = toks.length - n + 1
    if (m <= 0) return (0L, 0L, 0L)
    val counts = scala.collection.mutable.HashMap.empty[String, Int]
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < m) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      val g = sb.toString
      counts.update(g, counts.getOrElse(g, 0) + 1)
      i += 1
    }
    var dup = 0L
    var total = 0L
    var topMass = 0L
    var topCount = 0
    var topGram: String = null
    counts.foreach { case (g, c) =>
      val mass = c.toLong * cpLen(g)
      total += mass
      if (c > 1) dup += mass
      if (c > topCount || (c == topCount && utf8Less(g, topGram))) {
        topCount = c; topGram = g; topMass = mass
      }
    }
    (dup, total, topMass)
  }

  def compute(text: String): Stats = {
    if (text == null || text.isEmpty) return Empty

    // Line stats.
    val lines = text.split("\n", -1).iterator.map(trimLine).filter(_.nonEmpty).toArray
    var nLines = 0L
    var dupLineFrac = 0.0
    var dupLineCharFrac = 0.0
    if (lines.nonEmpty) {
      nLines = lines.length.toLong
      val counts = scala.collection.mutable.HashMap.empty[String, Int]
      lines.foreach(l => counts.update(l, counts.getOrElse(l, 0) + 1))
      dupLineFrac = (nLines - counts.size).toDouble / nLines
      var dupChars = 0L
      var totChars = 0L
      counts.foreach { case (l, c) =>
        val mass = c.toLong * cpLen(l)
        totChars += mass
        if (c > 1) dupChars += mass
      }
      dupLineCharFrac = if (totChars == 0L) 0.0 else dupChars.toDouble / totChars
    }

    // Token-gram stats over the shared lowercase-whitespace tokenization.
    val toks = spaceTrim(text).toLowerCase(Locale.ROOT).split("\\s+", -1)
    val tokLen = toks.map(cpLen)
    // chars of the space-joined token stream (= normalized text length).
    val normChars = tokLen.sum + math.max(0L, toks.length - 1L)
    def topFrac(n: Int): Double = {
      val (_, _, topMass) = gramMasses(toks, n)
      if (topMass == 0L || normChars == 0L) 0.0
      else math.min(1.0, topMass.toDouble / normChars)
    }
    val (dup5, total5, _) = gramMasses(toks, 5)
    val dup5Frac = if (total5 == 0L) 0.0 else dup5.toDouble / total5

    Stats(nLines, dupLineFrac, dupLineCharFrac, topFrac(2), topFrac(3), dup5Frac)
  }
}
