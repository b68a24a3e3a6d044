package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level text analysis for large-scale training-data pipelines:
  * tokenization, quality scoring, language-ID heuristics, fingerprinting.
  *
  * Everything here is built from `org.apache.spark.sql.functions._` (codegen'd,
  * no UDFs in the hot path) so filters and projections stay inside
  * whole-stage codegen and push down to the scan.
  */
object TextAnalysis {

  /** Whitespace tokens of trimmed text. */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  /** Lowercased whitespace tokens — THE shared tokenizer contract for
    * lexical retrieval and decontamination (BM25's tf/dl and the n-gram
    * overlap check must tokenize identically or their semantics silently
    * drift apart).
    */
  def lowerTokens(text: Column): Column = split(lower(trim(text)), "\\s+")

  /** Whitespace token count (BIGINT; 0 for empty/blank text). */
  def tokenCount(text: Column): Column =
    when(length(trim(text)) === 0, lit(0L))
      .otherwise(size(tokens(text)).cast("long"))

  /** BPE-ish token count: letter runs, digit runs, single other non-space. */
  val BpeTokenPattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"
  def bpeTokenCount(text: Column): Column =
    regexp_count(text, lit(BpeTokenPattern)).cast("long")

  /** ASCII punctuation count. */
  def punctCount(text: Column): Column =
    (length(text) - length(regexp_replace(text, "[\\p{Punct}]", ""))).cast("long")

  /** English stopwords used for the quality heuristic (small, fixed). */
  val Stopwords: Seq[String] =
    Seq("the", "a", "an", "and", "of", "to", "in", "is", "it", "that", "for", "on", "with", "as")

  /** Count of stopword tokens (occurrences, not distinct). */
  def stopwordCount(text: Column): Column = {
    val isStop = (t: Column) => Stopwords.map(t === _).reduce(_ || _)
    size(filter(tokens(text), isStop)).cast("long")
  }

  /** Stopword ratio in [0,1]; 0 when no tokens. */
  def stopwordRatio(text: Column): Column = {
    val n = tokenCount(text)
    when(n === 0, lit(0.0)).otherwise(stopwordCount(text).cast("double") / n)
  }

  /** Mean whitespace-token length; 0 when no tokens. */
  def meanWordLen(text: Column): Column = {
    val n = tokenCount(text)
    val totalLen = aggregate(tokens(text), lit(0L), (acc, t) => acc + length(t))
    when(n === 0, lit(0.0)).otherwise(totalLen.cast("double") / n)
  }

  /** Document fingerprint: sha256 hex of whitespace-normalized lowercase text.
    * (The content-hash dedup key; the reference hashes raw file bytes with
    * SHA-256 at /root/reference/internal/drone/watcher/decision.go:101-115.)
    */
  def fingerprint(text: Column): Column =
    sha2(regexp_replace(lower(trim(text)), "\\s+", " "), 256)

  /** Exact-duplicate grouping key (md5 of raw text). */
  def exactDupKey(text: Column): Column = md5(text)

  /** Word n-gram shingles (distinct), the unit for Jaccard/MinHash dedup.
    * Texts with fewer than n tokens shingle to the whole trimmed text.
    */
  def wordShingles(text: Column, n: Int): Column = {
    val toks = tokens(text)
    val grams = transform(
      sequence(lit(0), size(toks) - n),
      i => concat_ws(" ", (0 until n).map(j => element_at(toks, i + j + 1)): _*))
    array_distinct(when(size(toks) >= n, grams).otherwise(array(trim(text))))
  }

  /** Exact Jaccard similarity of two shingle-set columns (double). */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") / size(array_union(a, b))

  /** Codepoints of `text` belonging to a Unicode script, counted — crawl
    * triage columns (a "zh" page that is 80% Latin is mislabeled or
    * boilerplate-dominated). `script` is the Unicode script name
    * ("Latin", "Han", "Cyrillic", "Arabic", …): Java regex spells it
    * `\p{IsLatin}`, RE2/DuckDB `\p{Latin}` — [[scriptCount]] speaks Java,
    * oracles must use the RE2 spelling. PARITY CAVEAT: the classes agree
    * only up to the engines' common Unicode version — codepoints assigned
    * to a script in a NEWER Unicode (e.g. U+A7C0, Latin in Unicode 14)
    * diverge between JRE and DuckDB builds. Established scripts over
    * real-world text are stable; audits of bleeding-edge codepoints are
    * not oracle-exact.
    */
  def scriptCount(text: Column, script: String): Column =
    length(regexp_replace(text, s"[^\\p{Is$script}]", ""))

  /** ASCII whitespace, spelled EXPLICITLY: Java `\s` includes U+000B but
    * RE2's does not, so a bare `\s` in an oracled expression diverges on
    * vertical tabs. Same class both engines: `[\t\n\x0B\f\r ]`.
    */
  val AsciiWsClass = "[\\t\\n\\x0B\\f\\r ]"

  /** Fraction of non-whitespace codepoints in `script` (0 when empty). */
  def scriptRatio(text: Column, script: String): Column = {
    val total = length(regexp_replace(text, AsciiWsClass, ""))
    when(total === 0, lit(0.0))
      .otherwise(scriptCount(text, script).cast("double") / total)
  }

  /** Intra-document duplicate-line removal: keep each line's FIRST
    * occurrence in order (`array_distinct` preserves first-seen order) —
    * the transform twin of [[RepetitionStats]]'s dup-line diagnostics, for
    * scraped navigation/boilerplate repeated inside one page. Lines
    * compare RAW (no trim), and repeated blank lines collapse to one —
    * both deliberate (and replayed by the q2g oracle). Narrow codegen,
    * no UDF.
    */
  def dedupLines(text: Column): Column =
    array_join(array_distinct(split(text, "\n")), "\n")
}
