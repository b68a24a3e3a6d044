package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Document-relationship graph over an edge-list DataFrame
  * (SURVEY.md §1.1 Graph, §2.3 J5/J6 — graph.go:35-142). Plain DataFrames
  * suffice for the reference's semantics; nodes are derived, never stored.
  */
object GraphOps {

  /** J5: node set = DISTINCT sources ∪ DISTINCT targets (graph.go:123-142). */
  def nodes(edges: DataFrame): DataFrame =
    edges.select(col("source_doc_id").as("doc_id"))
      .union(edges.select(col("target_doc_id").as("doc_id")))
      .distinct()

  /** J6: edges touching a document (graph.go:99-120). */
  def edgesFor(edges: DataFrame, docId: String): DataFrame =
    edges.filter(col("source_doc_id") === docId || col("target_doc_id") === docId)

  /** Node-link response shape (graph_handler.go:34-90): nodes + edges with
    * degree per node.
    */
  def nodeLink(edges: DataFrame): (DataFrame, DataFrame) = {
    val degree = nodes(edges).join(
      edges.select(col("source_doc_id").as("doc_id"))
        .union(edges.select(col("target_doc_id").as("doc_id")))
        .groupBy("doc_id").agg(count(lit(1)).as("degree")),
      Seq("doc_id"), "left")
      .na.fill(0, Seq("degree"))
    (degree, edges)
  }

  /** Contradiction-graph construction (analyst.go:294-377 flow): k-NN
    * similar-document pairs judged by the oracle become typed edges.
    * `pairs` = (query_id, neighbor_id, score); judgment is deterministic
    * via [[LLMOracle]] in tests/offline.
    */
  def contradictionEdges(
      pairs: DataFrame, docs: DataFrame, idCol: String, textCol: String,
      oracle: LLMOracle): DataFrame = {
    val judge = udf((a: String, b: String) =>
      oracle.yesNo("Does document A contradict document B?", a + "\n" + b))
    pairs
      .join(docs.select(col(idCol).as("query_id"), col(textCol).as("text_a")), "query_id")
      .join(docs.select(col(idCol).as("neighbor_id"), col(textCol).as("text_b")), "neighbor_id")
      .filter(judge(col("text_a"), col("text_b")))
      .select(
        col("query_id").cast("string").as("source_doc_id"),
        col("neighbor_id").cast("string").as("target_doc_id"),
        lit("contradicts").as("relationship_type"),
        concat(lit("similarity="), col("score")).as("description"),
        current_timestamp().as("created_at"))
  }
}
