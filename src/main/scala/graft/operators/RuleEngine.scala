package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Rule evaluation (SURVEY.md §2.3 J3/J4, §2.10): every active rule applied to
  * every incoming document via a broadcast nested-loop join — rules are a tiny
  * dimension (the reference caches them in memory, rules/store.go:25-30; the
  * Spark equivalent is `broadcast()`).
  *
  * Answering is the reference's deterministic fallback
  * (analyst.go:269-292): case-insensitive keyword implication, first match
  * wins, default NO. The AI path is a pluggable [[LLMOracle]]; correctness
  * rests on this deterministic core.
  */
object RuleEngine {

  /** Demo rule set used by the query inventory (ids fixed). */
  val DemoRules: Seq[(Int, String)] = Seq(
    1 -> "Does this document mention confidential information?",
    2 -> "Does this document discuss pricing?",
    3 -> "Is there a secret project mentioned?",
    4 -> "Does this document reference spark streaming?")

  def demoRules(spark: SparkSession): DataFrame = {
    import spark.implicits._
    DemoRules.toDF("rule_id", "question")
  }

  /** Deterministic YES/NO fallback answer (analyst.go:269-292 semantics):
    * each keyword clause checked in order, fall-through on miss, default NO.
    */
  def fallbackAnswer(question: Column, content: Column): Column = {
    val q = lower(question)
    val c = lower(content)
    when(q.contains("confidential") && c.contains("confidential"), "YES")
      .when(q.contains("pricing") && (c.contains("pricing") || c.contains("price")), "YES")
      .when(q.contains("secret") && c.contains("secret"), "YES")
      .otherwise("NO")
  }

  /** Deterministic fallback tags (tagger.go:172-194 semantics): up to five
    * fixed keyword→tag clauses, concatenated in declaration order.
    */
  def fallbackTags(content: Column): Column = {
    val c = lower(content)
    def tagIf(cond: Column, tag: String) =
      when(cond, array(lit(tag))).otherwise(array().cast("array<string>"))
    concat(
      tagIf(c.contains("legal") || c.contains("law") || c.contains("contract"), "#legal"),
      tagIf(c.contains("invoice") || c.contains("billing") || c.contains("payment"), "#finance"),
      tagIf(c.contains("urgent") || c.contains("asap") || c.contains("immediate"), "#urgent"),
      tagIf(c.contains("proposal") || c.contains("quote"), "#proposal"),
      tagIf(c.contains("confidential") || c.contains("secret"), "#confidential"))
  }

  /** F7: rule-routing predicate (analyst.go:381-400) — rules whose question
    * implies comparing documents route to the cross-doc path.
    */
  val CrossDocKeywords: Seq[String] = Seq(
    "contradict", "conflict", "violate", "inconsistent", "match", "compare",
    "other document", "existing document", "across document")

  def isCrossDocRule(question: Column): Column =
    CrossDocKeywords.map(k => lower(question).contains(k)).reduce(_ || _)

  /** Rule × document broadcast join, answered deterministically. */
  def evaluate(docs: DataFrame, rules: DataFrame, contentCol: Column): DataFrame =
    docs.crossJoin(broadcast(rules))
      .withColumn("answer", fallbackAnswer(col("question"), contentCol))

  /** J4: cross-doc rule evaluation — rule × (doc × its top-k similar docs).
    * `pairs` is a k-NN join result (query_id, neighbor_id, score); each
    * cross-doc rule is answered over the CONCATENATION of the two documents'
    * texts (the reference prompts the model with both docs,
    * analyst.go:451-568; the deterministic fallback sees both contents).
    */
  def crossDocEvaluate(
      pairs: DataFrame, docs: DataFrame, idCol: String, textCol: String,
      rules: DataFrame): DataFrame = {
    val crossRules = rules.filter(isCrossDocRule(col("question")))
    pairs
      .join(docs.select(col(idCol).as("query_id"), col(textCol).as("text_a")), "query_id")
      .join(docs.select(col(idCol).as("neighbor_id"), col(textCol).as("text_b")), "neighbor_id")
      .crossJoin(broadcast(crossRules))
      .withColumn("answer",
        fallbackAnswer(col("question"), concat_ws("\n\n", col("text_a"), col("text_b"))))
  }

  /** Keyword alerting (F6 / hive_service.go:221-246): rows whose content
    * contains the alert keyword, as an alerts-shaped DataFrame.
    */
  def keywordAlerts(docs: DataFrame, contentCol: Column,
      keyword: String = "CONFIDENTIAL"): DataFrame =
    // keyword uppercased too: matching is case-insensitive for any input
    docs.filter(upper(contentCol).contains(keyword.toUpperCase))
      .withColumn("alert_type", lit("keyword"))
      .withColumn("alert_keyword", lit(keyword))
}

/** Pluggable AI oracle (§2.10): production implementations call an external
  * model per partition; the deterministic implementation is the defined
  * behavior for tests and offline runs.
  */
trait LLMOracle extends Serializable {
  def yesNo(question: String, content: String): Boolean
  def tags(content: String): Seq[String]
}

object DeterministicOracle extends LLMOracle {
  def yesNo(question: String, content: String): Boolean = {
    val q = question.toLowerCase(java.util.Locale.ROOT)
    val c = content.toLowerCase(java.util.Locale.ROOT)
    (q.contains("confidential") && c.contains("confidential")) ||
      (q.contains("pricing") && (c.contains("pricing") || c.contains("price"))) ||
      (q.contains("secret") && c.contains("secret"))
  }

  def tags(content: String): Seq[String] = {
    val c = content.toLowerCase(java.util.Locale.ROOT)
    val out = Seq.newBuilder[String]
    if (c.contains("legal") || c.contains("law") || c.contains("contract")) out += "#legal"
    if (c.contains("invoice") || c.contains("billing") || c.contains("payment")) out += "#finance"
    if (c.contains("urgent") || c.contains("asap") || c.contains("immediate")) out += "#urgent"
    if (c.contains("proposal") || c.contains("quote")) out += "#proposal"
    if (c.contains("confidential") || c.contains("secret")) out += "#confidential"
    out.result()
  }
}
