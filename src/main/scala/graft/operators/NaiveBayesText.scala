package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multinomial Naive Bayes for text, trained and scored as pure
  * relational algebra — the classical add-one-smoothed formulation
  * (Manning/Raghavan/Schütze IR ch. 13), no model object anywhere:
  *
  *   score(d, c) = ln P(c) + Σ_t tf(t, d) · ln((cnt(c, t) + 1) / (tot_c + V))
  *
  * The "model" is the bounded (class, token) count table (Heaps-law
  * bounded vocabulary × a handful of classes), which Spark broadcasts
  * into the scoring join; the only data-proportional stages are the two
  * token explodes and their partial-aggregated counts. Log terms are
  * exact under the oracle contract (ln and division are bit-parity
  * proven; per-term products ride DECIMAL(28,12) so cross-token addition
  * order cannot perturb bits).
  */
object NaiveBayesText {

  /** Train on `train` (docId, tokens exploded from textCol by
    * single-space split), score `test` docs over the train vocabulary
    * (out-of-vocabulary tokens are ignored — the standard multinomial NB
    * treatment), and return one row per test doc:
    * (docId, labelCol actual, predicted, score) with score the winning
    * log-posterior rounded to 6. Ties break to the lexicographically
    * smallest label — deterministic in both engines. A test doc whose
    * every token is out-of-vocabulary has no scored rows and is absent
    * from the output (the caller sees exactly the scorable docs; an
    * anti-join against the output recovers the unscorable remainder).
    */
  def classify(train: DataFrame, test: DataFrame, docId: String,
      textCol: String, labelCol: String): DataFrame = {
    def toks(df: DataFrame, keep: Column*): DataFrame =
      df.select(keep :+ explode(split(col(textCol), " ")).as("tok"): _*)
        .filter(col("tok") =!= "")

    val trainToks = toks(train, col(docId), col(labelCol))
    val classTok = trainToks.groupBy(col(labelCol).as("cls"), col("tok"))
      .agg(count(lit(1)).as("cnt"))
    val classTot = classTok.groupBy(col("cls"))
      .agg(sum(col("cnt")).as("tot"))
    val vocab = classTok.select(col("tok")).distinct()
    val vocabSize = vocab.agg(count(lit(1)).as("v"))
    val priors = train.groupBy(col(labelCol).as("cls"))
      .agg(count(lit(1)).as("nd"))
      .crossJoin(broadcast(train.agg(count(lit(1)).as("ntot"))))
      .select(col("cls"),
        log(col("nd").cast("double") / col("ntot").cast("double"))
          .as("prior_ln"))

    val testToks = toks(test, col(docId), col(labelCol))
      .groupBy(col(docId), col(labelCol), col("tok"))
      .agg(count(lit(1)).as("tf"))
      .join(broadcast(vocab), Seq("tok")) // drop OOV tokens
    val classes = classTot.crossJoin(broadcast(vocabSize))
    val scored = testToks
      .crossJoin(broadcast(classes))
      .join(broadcast(classTok), Seq("cls", "tok"), "left")
      .withColumn("cnt0", coalesce(col("cnt"), lit(0L)))
      .withColumn("llr",
        log((col("cnt0") + lit(1L)).cast("double") /
          (col("tot") + col("v")).cast("double")))
      .withColumn("term",
        (col("tf").cast("double") * col("llr")).cast("decimal(28,12)"))
      .groupBy(col(docId), col(labelCol), col("cls"))
      .agg(sum(col("term")).as("toksum"))
      .join(broadcast(priors), Seq("cls"))
      .withColumn("score",
        col("prior_ln").cast("decimal(28,12)") + col("toksum"))
    val best = scored.groupBy(col(docId), col(labelCol))
      .agg(max(col("score")).as("best"))
    scored.join(best, Seq(docId, labelCol))
      .filter(col("score") === col("best"))
      .groupBy(col(docId), col(labelCol), col("best"))
      .agg(min(col("cls")).as("predicted"))
      .select(col(docId), col(labelCol).as("actual"), col("predicted"),
        round(col("best").cast("double"), 6).as("score"))
  }
}
