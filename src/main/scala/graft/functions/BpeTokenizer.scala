package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer: TRAIN merges over a corpus with Spark,
  * APPLY them as a deterministic encode — the real thing behind
  * [[TextAnalysis.bpeTokenCount]]'s regex approximation (Sennrich et al.
  * 2016; the GPT-2 tokenizer family is this algorithm over bytes).
  *
  * Training operates on the WORD-FREQUENCY table, not the corpus: one
  * corpus-wide token count (a single shuffle — Zipf keeps the distinct-word
  * table orders of magnitude smaller than the corpus), then `nMerges`
  * iterations of: count adjacent symbol pairs weighted by word frequency →
  * take the argmax pair (count desc, then lexicographic — fully
  * deterministic) → rewrite the vocabulary's symbol sequences. Each
  * iteration is two narrow passes + one pair aggregate over the VOCABULARY
  * (not the corpus); `localCheckpoint` every few rounds truncates lineage
  * exactly like the connected-components loop. At 100 TB the standard
  * practice applies unchanged: train on the word-frequency table of a
  * sample or a frequency-floored vocabulary (`minWordCount`) — merges
  * converge on the head of the distribution, which a sample captures.
  *
  * The word boundary is the shared whitespace contract
  * ([[TextAnalysis.lowerTokens]]); an end-of-word marker ([[EndOfWord]])
  * attaches to each word's last symbol so merges never cross word
  * boundaries, per the original paper.
  */
object BpeTokenizer {

  /** End-of-word marker: U+FFFF, a Unicode NONCHARACTER — it cannot occur
    * in valid interchange text, and [[initialSymbols]] strips it from input
    * defensively, so no sequence of learned merges over corpus characters
    * can ever assemble a symbol string-equal to a boundary-tagged one (a
    * literal "</w>"-style marker WOULD collide on markup-heavy crawl text:
    * mid-word '<','/','w','>' runs merge into exactly the marker).
    */
  val EndOfWord = "\uFFFF"

  final case class Merge(a: String, b: String)

  /** Initial symbol sequence of a word: its characters, last one tagged
    * with the end-of-word marker. Literal marker chars in the input are
    * stripped (see [[EndOfWord]]).
    */
  private[graft] def initialSymbols(word: String): Seq[String] = {
    val clean = word.replace(EndOfWord, "")
    if (clean.isEmpty) return Seq.empty
    val cps = clean.codePoints().toArray.map(cp => new String(Character.toChars(cp)))
    cps.init.toSeq :+ (cps.last + EndOfWord)
  }

  /** Apply one learned merge to a symbol sequence (all occurrences,
    * left-to-right).
    */
  private[graft] def applyMerge(symbols: Seq[String], m: Merge): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < symbols.length) {
      if (i + 1 < symbols.length && symbols(i) == m.a && symbols(i + 1) == m.b) {
        out += (m.a + m.b)
        i += 2
      } else {
        out += symbols(i)
        i += 1
      }
    }
    out.toSeq
  }

  /** Learn `nMerges` merges from the corpus. Returns them in rank order
    * (earlier = higher priority for [[encode]]). Deterministic: ties on
    * pair count break lexicographically on (a, b).
    */
  def train(
      docs: DataFrame, textCol: String, nMerges: Int,
      minWordCount: Long = 1L): Seq[Merge] = {
    require(nMerges >= 0, s"nMerges must be >= 0, got $nMerges")
    val initUdf = udf((w: String) => initialSymbols(w))
    var vocab = docs
      .select(explode(TextAnalysis.lowerTokens(col(textCol))).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= minWordCount)
      .select(initUdf(col("word")).as("symbols"), col("cnt"))
      .localCheckpoint()

    val merges = Seq.newBuilder[Merge]
    var rank = 0
    var done = false
    while (rank < nMerges && !done) {
      // pair counts over the vocabulary, weighted by word frequency.
      // Fully-merged single-symbol words are filtered FIRST: sequence(0,-1)
      // descends and indexes symbols[-1], an ANSI-mode array error.
      val top = vocab
        .filter(size(col("symbols")) >= 2)
        .select(explode(expr(
          "transform(sequence(0, size(symbols) - 2), " +
            "i -> struct(symbols[i] as a, symbols[i + 1] as b))")).as("p"),
          col("cnt"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum("cnt").as("n"))
        .orderBy(col("n").desc, col("a"), col("b"))
        .limit(1)
        .collect()
      if (top.isEmpty) done = true
      else {
        val m = Merge(top.head.getString(0), top.head.getString(1))
        merges += m
        val mergeUdf = udf((s: Seq[String]) => applyMerge(s, m))
        vocab = vocab.select(mergeUdf(col("symbols")).as("symbols"), col("cnt"))
        // truncate lineage like the CC loop — iteration N must not replan 1..N-1
        if ((rank + 1) % 4 == 0) vocab = vocab.localCheckpoint()
        rank += 1
      }
    }
    merges.result()
  }

  private def rankMap(merges: Seq[Merge]): Map[(String, String), Int] =
    merges.zipWithIndex.map { case (m, i) => (m.a, m.b) -> i }.toMap

  private def encodeWith(
      text: String, merges: IndexedSeq[Merge],
      rankOf: Map[(String, String), Int]): Seq[String] = {
    if (text == null) return Seq.empty
    // word derivation MUST replicate train()'s pipeline — explode of
    // TextAnalysis.lowerTokens + length>0 filter. Spark trim strips SPACES
    // only; Java String.trim strips every char <= U+0020 (tabs, newlines),
    // so it would tokenize tab-bounded text differently than training did.
    // Space-only trim + the same \s+ split + drop-empties matches exactly.
    var b = 0
    var e = text.length
    while (b < e && text.charAt(b) == ' ') b += 1
    while (e > b && text.charAt(e - 1) == ' ') e -= 1
    val words = text.substring(b, e).toLowerCase(java.util.Locale.ROOT)
      .split("\\s+").filter(_.nonEmpty)
    words.toSeq.flatMap { w =>
      var symbols = initialSymbols(w)
      var continue = true
      while (continue && symbols.length > 1) {
        // the lowest-rank (earliest-learned) pair present in this word
        var best = Int.MaxValue
        var i = 0
        while (i + 1 < symbols.length) {
          rankOf.get((symbols(i), symbols(i + 1))).foreach { r =>
            if (r < best) best = r
          }
          i += 1
        }
        if (best == Int.MaxValue) continue = false
        else symbols = applyMerge(symbols, merges(best))
      }
      symbols
    }
  }

  /** Encode one text with a learned merge list: per word, start from
    * characters and apply the HIGHEST-RANKED applicable merge repeatedly
    * (the standard BPE apply — rank order, not left-to-right discovery
    * order). Pure function of (text, merges): embarrassingly parallel.
    */
  def encode(text: String, merges: Seq[Merge]): Seq[String] =
    encodeWith(text, merges.toIndexedSeq, rankMap(merges))

  /** Encoder UDF bound to a fixed merge list. The rank map is built ONCE
    * here and captured by the per-row lambda — building it per row would
    * dominate the actual encoding on a realistic 10k+-merge list (the
    * hot-path discipline of the other one-pass UDFs).
    */
  def encodeUdf(merges: Seq[Merge]): org.apache.spark.sql.expressions.UserDefinedFunction = {
    val ms = merges.toIndexedSeq
    val rankOf = rankMap(merges)
    udf((text: String) => encodeWith(text, ms, rankOf))
  }

  /** Token count under a learned tokenizer — the honest replacement for
    * the regex estimate when a merge list exists.
    */
  def tokenCount(merges: Seq[Merge])(textCol: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    size(encodeUdf(merges)(textCol))
}
