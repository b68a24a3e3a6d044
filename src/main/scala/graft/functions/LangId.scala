package graft.functions

/** N-gram/stopword-heuristic language identification (deterministic, no model).
  *
  * Scores each candidate language by its stopword hit count over whitespace
  * tokens, with a CJK-character fast path; ties break by fixed language order
  * so the result is stable. Returns "und" when nothing matches.
  */
object LangId {
  /** Fixed priority order — also the tiebreak order. */
  val Languages: Seq[String] = Seq("en", "es", "fr", "de", "zh")

  private val stopwords: Map[String, Set[String]] = Map(
    "en" -> Set("the", "and", "of", "to", "in", "is", "that", "it", "for", "with", "was", "on"),
    "es" -> Set("el", "la", "de", "que", "y", "en", "un", "una", "los", "las", "por", "con"),
    "fr" -> Set("le", "la", "les", "de", "des", "et", "en", "un", "une", "du", "que", "pour"),
    "de" -> Set("der", "die", "das", "und", "in", "den", "von", "zu", "mit", "auf", "ist", "ein"),
    "zh" -> Set.empty)

  /** RE2-class whitespace ([\t\n\f\r ]) — the exact set the q2b DuckDB
    * oracle's `\s` strips; Java's Character.isWhitespace (U+000B, U+3000,
    * Unicode separators) would silently diverge from it.
    */
  @inline private def isWs(cp: Int): Boolean =
    cp == ' ' || cp == '\t' || cp == '\n' || cp == '\f' || cp == '\r'

  /** BMP CJK Unified Ideographs + Extension A — the oracle-expressible Han
    * set (class `[\x{4e00}-\x{9fff}\x{3400}-\x{4dbf}]`).
    */
  @inline private def isHan(cp: Int): Boolean =
    (cp >= 0x4E00 && cp <= 0x9FFF) || (cp >= 0x3400 && cp <= 0x4DBF)

  def detect(text: String): String = {
    if (text == null || text.isEmpty) return "und"
    // CJK fast path: >10% CJK codepoints → zh (codepoint iteration so
    // surrogate pairs count once, matching DuckDB's length())
    var cjk = 0
    var total = 0
    var i = 0
    while (i < text.length) {
      val cp = text.codePointAt(i)
      if (!isWs(cp)) {
        total += 1
        if (isHan(cp)) cjk += 1
      }
      i += Character.charCount(cp)
    }
    if (total > 0 && cjk * 10 > total) return "zh"
    // Locale.ROOT: the default locale would turn 'I' into dotless-ı under
    // tr_TR and diverge from DuckDB's locale-independent lower()
    val toks = text.toLowerCase(java.util.Locale.ROOT).split("[ \\t\\n\\f\\r]+")
    var best = "und"
    var bestScore = 0
    for (lang <- Languages if lang != "zh") {
      val sw = stopwords(lang)
      var score = 0
      var j = 0
      while (j < toks.length) { if (sw.contains(toks(j))) score += 1; j += 1 }
      if (score > bestScore) { best = lang; bestScore = score }
    }
    best
  }
}
