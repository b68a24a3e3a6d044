package graft.operators

import graft.functions.TextAnalysis
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
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
    *
    * `minTokenCount` > 1 drops tokens seen fewer times from the table —
    * the Zipf-head bound that keeps the LM broadcastable at any corpus
    * size (an unfloored vocabulary grows with the corpus per Heaps' law
    * and eventually exceeds the broadcast ceiling). The denominator stays
    * the FULL corpus token count, so surviving tokens keep exactly the
    * unfloored surprisal; floored-out tokens score as OOV downstream
    * (ignored by [[surprisalScores]]' inner join), which moves a doc's
    * mean only by the rare-token terms it loses.
    */
  def unigramLm(
      docs: DataFrame, textCol: String, minTokenCount: Long = 1L): DataFrame = {
    val tok = docs.select(explode(TextAnalysis.tokens(col(textCol))).as("token"))
    val cnt = tok.groupBy("token").agg(count(lit(1)).as("cnt"))
    val tot = cnt.agg(sum("cnt").as("total"))
    val kept = if (minTokenCount > 1L) cnt.filter(col("cnt") >= minTokenCount) else cnt
    kept.crossJoin(broadcast(tot))
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

  /** (id, token, prev) rows — every token position with its predecessor
    * (null at position 1). Built in the array domain (`zip_with` against the
    * 1-shifted array) so there is no per-position self-join and the lambda
    * only touches its own arguments (the HOF re-evaluation gotcha).
    */
  private def positions(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = docs.select(col(idCol), TextAnalysis.tokens(col(textCol)).as("t"))
    val shifted = concat(array(lit(null).cast("string")),
      slice(col("t"), lit(1), greatest(size(col("t")) - 1, lit(0))))
    toks
      .select(col(idCol),
        explode(zip_with(col("t"), shifted,
          (cur, prev) => struct(cur.as("token"), prev.as("prev")))).as("p"))
      .select(col(idCol), col("p.token").as("token"), col("p.prev").as("prev"))
  }

  /** Corpus unigram probabilities (token, p_uni DOUBLE) — the interpolation
    * floor for [[interpolatedSurprisalScores]] (raw probability, unlike
    * [[unigramLm]]'s pre-logged table, because interpolation mixes
    * probabilities, not logs).
    */
  def unigramProbs(docs: DataFrame, textCol: String): DataFrame = {
    val cnt = docs.select(explode(TextAnalysis.tokens(col(textCol))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("cnt"))
    val tot = cnt.agg(sum("cnt").as("total"))
    cnt.crossJoin(broadcast(tot))
      .select(col("token"),
        (col("cnt").cast("double") / col("total").cast("double")).as("p_uni"))
  }

  /** Corpus bigram conditional probabilities (prev, token, p_bi DOUBLE):
    * count(prev,token) / count(prev,·). One groupBy shuffle over token
    * pairs (corpus-linear) + a window over the vocabulary-sized count table
    * partitioned by `prev` — no quadratic stage anywhere.
    */
  def bigramLm(docs: DataFrame, textCol: String): DataFrame = {
    val cnt = positions(docs.select(lit(0L).as("__row"), col(textCol)), "__row", textCol)
      .filter(col("prev").isNotNull)
      .groupBy("prev", "token").agg(count(lit(1)).as("c"))
    cnt
      .withColumn("pc", sum("c").over(Window.partitionBy("prev")))
      .select(col("prev"), col("token"),
        (col("c").cast("double") / col("pc").cast("double")).as("p_bi"))
  }

  /** Per-document mean interpolated bigram surprisal — the step up from
    * [[surprisalScores]] that actually models local word order (boilerplate
    * and templated text score LOW, shuffled-token word salad scores HIGH,
    * which the unigram model cannot see). Position 1 scores as unigram;
    * positions ≥ 2 as −ln(λ_bi·p(tok|prev) + λ_uni·p(tok)). The λs are
    * EXPLICIT literals (not 1−λ arithmetic) so the oracle replays the exact
    * doubles. Same DECIMAL(28,9) order-free accumulation as the unigram
    * path. `uniProbs`/`biLm` are vocabulary-sized snapshot artifacts —
    * broadcast when they fit, shuffle-join otherwise.
    */
  def interpolatedSurprisalScores(
      docs: DataFrame, idCol: String, textCol: String,
      uniProbs: DataFrame, biLm: DataFrame,
      lambdaBi: Double = 0.7, lambdaUni: Double = 0.3): DataFrame =
    positions(docs, idCol, textCol)
      .join(uniProbs, Seq("token"))
      .join(biLm, Seq("prev", "token"), "left_outer")
      .withColumn("p",
        when(col("prev").isNull, col("p_uni"))
          .otherwise(lit(lambdaBi) * coalesce(col("p_bi"), lit(0.0)) +
            lit(lambdaUni) * col("p_uni")))
      .withColumn("s", round(-log(col("p")), 9).cast("decimal(28,9)"))
      .groupBy(col(idCol))
      .agg(sum("s").as("__ssum"), count(lit(1)).as("n_tokens"))
      .select(col(idCol),
        round(col("__ssum").cast("double") / col("n_tokens"), 6).as("surprisal"),
        col("n_tokens"))

  /** Per-document mean KNESER–NEY bigram surprisal — the standard smoothed
    * LM for curation filters, a strict upgrade over the fixed-λ
    * interpolation of [[interpolatedSurprisalScores]]: absolute
    * discounting (D) moves mass from SEEN bigrams to a learned per-context
    * back-off weight, and the back-off distribution is the CONTINUATION
    * probability (how many distinct contexts a word follows — "Francisco"
    * is frequent but follows only "San", so KN correctly scores it
    * surprising in fresh contexts, which raw unigram frequency cannot).
    *
    *   P(w|v) = max(c(v,w) − D, 0)/c(v) + (D·N1+(v,·)/c(v)) · P_cont(w),
    *   P_cont(w) = N1+(·,w) / |bigram types|
    *
    * Position 1 and unseen contexts score with P_cont alone. All inputs
    * are integer count tables (corpus-linear groupBys; windows only over
    * the vocabulary-sized bigram table) and the per-position surprisal
    * rides the q3s discipline — round(−ln p, 9) into DECIMAL(28,9) — so
    * the whole model replays hash-exact in SQL.
    */
  def kneserNeySurprisalScores(
      docs: DataFrame, idCol: String, textCol: String,
      discount: Double = 0.75): DataFrame = {
    require(discount > 0 && discount < 1, s"discount must be in (0,1), got $discount")
    val pos = positions(docs, idCol, textCol)
    val big = pos.filter(col("prev").isNotNull)
      .groupBy("prev", "token").agg(count(lit(1)).as("c"))
    // per-context totals + distinct-successor counts (vocabulary-sized)
    val prevStats = big.groupBy("prev")
      .agg(sum("c").as("cv"), count(lit(1)).as("n1pv"))
    // continuation counts: distinct predecessors per token, over total types
    val types = big.agg(count(lit(1)).as("t_types"))
    val contP = big.groupBy("token").agg(count(lit(1)).as("n1pw"))
      .crossJoin(broadcast(types))
      .select(col("token"),
        (col("n1pw").cast("double") / col("t_types").cast("double")).as("p_cont"))
    val d = lit(discount)
    pos
      .join(contP, Seq("token")) // in-corpus model: every token continues
      .join(big.select(col("prev"), col("token"), col("c")),
        Seq("prev", "token"), "left_outer")
      .join(prevStats, Seq("prev"), "left_outer")
      .withColumn("p",
        when(col("prev").isNull || col("cv").isNull, col("p_cont"))
          .otherwise(
            greatest(coalesce(col("c"), lit(0L)).cast("double") - d, lit(0.0)) /
              col("cv").cast("double") +
              (d * col("n1pv").cast("double") / col("cv").cast("double")) *
                col("p_cont")))
      .withColumn("s", round(-log(col("p")), 9).cast("decimal(28,9)"))
      .groupBy(col(idCol))
      .agg(sum("s").as("__ssum"), count(lit(1)).as("n_tokens"))
      .select(col(idCol),
        round(col("__ssum").cast("double") / col("n_tokens"), 6).as("surprisal"),
        col("n_tokens"))
  }
}
