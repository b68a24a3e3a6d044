package graft.operators

import graft.functions.TextAnalysis
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Unigram language-model quality scoring: per-document mean token surprisal
  * (−ln p(token) under the corpus unigram distribution) — the classic cheap
  * LM filter for training-data curation (low surprisal ⇒ repetitive/common
  * text, high ⇒ unusual token mix; both tails are filter candidates).
  *
  * Two-phase shape for 100 TB: [[unigramLm]] builds the vocabulary-sized
  * log-probability table once per corpus snapshot (one scan + one groupBy
  * shuffle on token; like the BM25 lens, a materialize-once artifact);
  * [[surprisalScores]] is then a token join + per-doc aggregation. The
  * per-token surprisal is rounded to 9 dp and accumulated as DECIMAL(28,9),
  * so per-doc sums are exact and order-free — float summation order across
  * partitions can never change a score (the same trick as the BM25
  * DECIMAL accumulation; this is what makes q3j hash-exact).
  */
object LmScore {

  /** Corpus unigram LM: (token, token_surprisal DECIMAL(28,9)) where
    * token_surprisal = round(−ln(count/total), 9). Tokenization is the
    * shared whitespace contract ([[TextAnalysis.tokens]] ≡ DuckDB
    * regexp_split_to_array(trim(text), '\s+')).
    */
  def unigramLm(docs: DataFrame, textCol: String): DataFrame = {
    val tok = docs.select(explode(TextAnalysis.tokens(col(textCol))).as("token"))
    val cnt = tok.groupBy("token").agg(count(lit(1)).as("cnt"))
    val tot = cnt.agg(sum("cnt").as("total"))
    cnt.crossJoin(broadcast(tot))
      .select(col("token"),
        round(-log(col("cnt").cast("double") / col("total").cast("double")), 9)
          .cast("decimal(28,9)").as("token_surprisal"))
  }

  /** Per-document mean token surprisal under `lm` (from [[unigramLm]], or a
    * reference corpus' LM for out-of-domain scoring): (id, surprisal,
    * n_tokens). Tokens absent from `lm` are ignored (inner join) — with an
    * in-corpus LM every token is present. `lm` is vocabulary-sized; pass
    * `broadcast(lm)` when it fits, otherwise the token join shuffles
    * (corpus tokens × 1 row each) — linear, no quadratic blowup.
    */
  def surprisalScores(
      docs: DataFrame, idCol: String, textCol: String,
      lm: DataFrame): DataFrame =
    docs.select(col(idCol), explode(TextAnalysis.tokens(col(textCol))).as("token"))
      .join(lm, Seq("token"))
      .groupBy(col(idCol))
      .agg(sum("token_surprisal").as("__ssum"), count(lit(1)).as("n_tokens"))
      .select(col(idCol),
        round(col("__ssum").cast("double") / col("n_tokens"), 6).as("surprisal"),
        col("n_tokens"))
}
