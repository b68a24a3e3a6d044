package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination: flag training documents that share word
  * n-grams with an evaluation/benchmark set (the standard n-gram overlap
  * test — a training doc containing a benchmark 8-gram is contaminated).
  *
  * Scale shape: the benchmark side is small by definition — its distinct
  * grams broadcast; the corpus is exploded once and semi-joined, so the
  * shuffle carries only (doc, matched-gram) rows. String grams (not hashes)
  * so the DuckDB oracle replays the check exactly.
  */
object Decontaminate {

  /** Distinct word n-grams per row: (idCol, gram). Tokenization is
    * [[graft.functions.TextAnalysis.lowerTokens]] — the same expression BM25
    * uses, by construction.
    */
  def ngrams(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    rawNgrams(df, idCol, textCol, n).distinct()

  /** [[ngrams]] without the distinct — narrow (explode only, no shuffle). */
  private def rawNgrams(
      df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame = {
    val toks = graft.functions.TextAnalysis.lowerTokens(col(textCol))
    df.select(col(idCol), toks.as("__toks"))
      .filter(size(col("__toks")) >= n)
      .select(col(idCol), explode(
        transform(sequence(lit(0), size(col("__toks")) - n),
          i => concat_ws(" ", slice(col("__toks"), i + 1, lit(n))))).as("gram"))
  }

  /** Per-corpus-doc count of distinct n-grams that appear in ANY benchmark
    * doc, plus the contamination flag (≥ `minShared` shared grams). Only
    * contaminated docs are returned — the droplist.
    *
    * The broadcast semi-join runs BEFORE any distinct: filtering corpus
    * grams down to benchmark hits first means the only shuffle is the
    * per-doc `countDistinct` over matched grams (a sliver of the corpus),
    * never a corpus-wide gram dedup. Semi-join-then-distinct ≡
    * distinct-then-semi-join, so results are unchanged (q3f stays
    * hash-exact).
    */
  def sharedNgrams(
      corpus: DataFrame, benchmark: DataFrame,
      idCol: String, textCol: String, n: Int = 8,
      minShared: Int = 1): DataFrame = {
    val benchGrams = ngrams(benchmark, idCol, textCol, n)
      .select(col("gram")).distinct()
    rawNgrams(corpus, idCol, textCol, n)
      .join(broadcast(benchGrams), Seq("gram"), "left_semi")
      .groupBy(col(idCol))
      .agg(countDistinct(col("gram")).as("n_shared_grams"))
      .filter(col("n_shared_grams") >= minShared)
  }

  /** [[sharedNgrams]] for benchmark sets too large to broadcast as strings
    * (full eval-suite unions: 10⁷ grams ≈ hundreds of MB of strings, but a
    * ~1% Bloom filter over them is ~12 MB): corpus grams pass a broadcast
    * `mightContain` pre-filter, then the surviving sliver — true hits plus
    * the fpp share of false positives — is verified by an EXACT join
    * against the benchmark grams (now a shuffle join of two small sides).
    * Results are identical to [[sharedNgrams]] by construction (the exact
    * join removes every false positive); the Bloom stage only bounds what
    * shuffles.
    */
  def sharedNgramsBloom(
      corpus: DataFrame, benchmark: DataFrame,
      idCol: String, textCol: String, n: Int = 8,
      minShared: Int = 1, fpp: Double = 0.01): DataFrame = {
    // Cached only across the two BUILD actions (count + bloomFilter), then
    // released — a persist held by the returned lazy plan would pin
    // hundreds of MB of gram blocks for the application lifetime on every
    // call. The verification join recomputes benchGrams once at execution:
    // 2 total passes over the benchmark instead of the naive 3, no leak.
    val benchGrams = ngrams(benchmark, idCol, textCol, n)
      .select(col("gram")).distinct()
    val cached = benchGrams.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val bloom =
      try {
        val expected = math.max(1L, cached.count())
        cached.stat.bloomFilter("gram", expected, fpp)
      } finally { cached.unpersist(blocking = false); () }
    val mightContain = udf((g: String) => g != null && bloom.mightContain(g))
    rawNgrams(corpus, idCol, textCol, n)
      .filter(mightContain(col("gram")))
      .join(benchGrams, Seq("gram"), "left_semi") // exact: kills false positives
      .groupBy(col(idCol))
      .agg(countDistinct(col("gram")).as("n_shared_grams"))
      .filter(col("n_shared_grams") >= minShared)
  }

  /** Corpus-wide repeated-span DISCOVERY — the inverse direction of
    * [[sharedNgrams]]: instead of checking the corpus against a known
    * droplist, find the spans that SHOULD be on one. Output: every word
    * n-gram appearing in at least `minDocs` distinct docs, with its doc
    * frequency and first (minimum-id) carrier — exactly the evidence a
    * curation run reviews before feeding a boilerplate droplist to
    * [[sharedNgrams]] or a cap to [[Dedup.passageOverlapPairs]].
    *
    * Scale shape: distinct (doc, gram) pairs then one map-side-combinable
    * aggregate keyed on the gram — a ubiquitous span partial-aggregates
    * inside every map task (no window, no skew serialization; the q5b
    * discipline). Callers bound output with `minDocs` and a top-k.
    */
  def repeatedSpans(
      df: DataFrame, idCol: String, textCol: String, n: Int,
      minDocs: Long = 2L): DataFrame = {
    require(minDocs >= 1, s"minDocs must be >= 1, got $minDocs")
    ngrams(df, idCol, textCol, n)
      .groupBy("gram")
      .agg(count(lit(1)).as("n_docs"), min(col(idCol)).as("first_doc"))
      .filter(col("n_docs") >= minDocs)
  }
}
