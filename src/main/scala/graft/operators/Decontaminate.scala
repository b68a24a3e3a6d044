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
  def ngrams(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame = {
    val toks = graft.functions.TextAnalysis.lowerTokens(col(textCol))
    df.select(col(idCol), toks.as("__toks"))
      .filter(size(col("__toks")) >= n)
      .select(col(idCol), explode(
        transform(sequence(lit(0), size(col("__toks")) - n),
          i => concat_ws(" ", slice(col("__toks"), i + 1, lit(n))))).as("gram"))
      .distinct()
  }

  /** Per-corpus-doc count of distinct n-grams that appear in ANY benchmark
    * doc, plus the contamination flag (≥ `minShared` shared grams). Only
    * contaminated docs are returned — the droplist.
    */
  def sharedNgrams(
      corpus: DataFrame, benchmark: DataFrame,
      idCol: String, textCol: String, n: Int = 8,
      minShared: Int = 1): DataFrame = {
    val benchGrams = ngrams(benchmark, idCol, textCol, n)
      .select(col("gram")).distinct()
    ngrams(corpus, idCol, textCol, n)
      .join(broadcast(benchGrams), Seq("gram"), "left_semi")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_shared_grams"))
      .filter(col("n_shared_grams") >= minShared)
  }
}
