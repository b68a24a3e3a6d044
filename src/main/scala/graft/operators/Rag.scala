package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** RAG retrieval with citation assembly (SURVEY.md §3.3): top-k semantic
  * search → context concat → citation structs. Answer *generation* is a
  * pluggable side-effect (the reference stubs it too, chat_handler.go:145-150);
  * the engine's contract is retrieval + citation assembly.
  */
object Rag {

  /** Retrieval: top-k chunks for a query under a tenant (chat defaults k=5,
    * chat_handler.go:125).
    */
  def retrieve(
      chunks: DataFrame, queryText: String, k: Int = 5,
      organizationId: Option[String] = None,
      dim: Int = graft.functions.MockEmbedder.DefaultDim): DataFrame =
    VectorSearch.semanticSearch(chunks, queryText, k, organizationId, dim)

  /** Hybrid retrieval: reciprocal-rank fusion of the semantic ranking and a
    * BM25 lexical ranking over the same chunk table — the standard upgrade
    * over either alone (lexical catches exact identifiers/rare terms that
    * embeddings smear; semantic catches paraphrase the lexicon misses).
    * Both candidate lists are top-`poolK` (default 5×k) before fusion, so
    * fusion cost is independent of corpus size.
    */
  def retrieveHybrid(
      chunks: DataFrame, queryText: String, k: Int = 5,
      organizationId: Option[String] = None,
      dim: Int = graft.functions.MockEmbedder.DefaultDim,
      poolK: Int = 0): DataFrame = {
    val pool = if (poolK > 0) poolK else 5 * k
    val tenant = organizationId.fold(chunks)(o =>
      chunks.filter(col("organization_id") === o))
    val semantic = VectorSearch.semanticSearch(chunks, queryText, pool,
        organizationId, dim)
      .select(col("id").as("doc_id"), col("score"))
    val semRanked = KeywordSearch.ranked(semantic, "score").select("doc_id", "rn")
    val terms = queryText.toLowerCase(java.util.Locale.ROOT)
      .split("\\s+").toSeq.filter(_.nonEmpty)
    // blank query → no lexical signal; degrade to semantic-only rather than
    // throwing where plain retrieve() would have succeeded
    val rankings =
      if (terms.isEmpty) Seq(semRanked)
      else {
        val lexical = KeywordSearch.bm25(tenant, "id", "content", terms, k = pool)
        Seq(semRanked, KeywordSearch.ranked(lexical, "score").select("doc_id", "rn"))
      }
    KeywordSearch.reciprocalRankFusion(rankings, k)
      .withColumnRenamed("doc_id", "id")
      .join(tenant, Seq("id"))
      .select(col("id"), col("document_id"), col("content"),
        col("rrf_score").as("score"))
      .orderBy(col("score").desc, col("id"))
  }

  /** One-row result: concatenated context + ARRAY<STRUCT> citations
    * (chat_handler.go:135-143 context build; :170-180 citation shape
    * {document_id, chunk_id, content, score}). `collect_list` does not
    * guarantee upstream order, so citations are explicitly re-sorted by
    * (score desc, chunk_id) via a sortable struct (same pattern as the
    * ordered concat in q17).
    */
  def withCitations(hits: DataFrame): DataFrame = {
    val sortable = struct(
      (-col("score")).as("neg_score"),
      col("id").as("chunk_id"),
      col("document_id"),
      col("content"),
      col("score"))
    hits.agg(array_sort(collect_list(sortable)).as("__sorted"))
      .select(
        concat_ws("\n\n",
          transform(col("__sorted"), x => x.getField("content"))).as("context"),
        transform(col("__sorted"), x => struct(
          x.getField("document_id").as("document_id"),
          x.getField("chunk_id").as("chunk_id"),
          x.getField("content").as("content"),
          x.getField("score").as("score"))).as("citations"))
  }

  /** T6: matched-chunk display truncation (analyst.go:621-644): first
    * `maxChunks` chunks of a group, each clipped to `maxChars`.
    */
  def truncateForDisplay(
      grouped: DataFrame, chunksCol: String,
      maxChunks: Int = 3, maxChars: Int = 500): DataFrame =
    grouped.withColumn("display_chunks",
      transform(slice(col(chunksCol), 1, maxChunks),
        c => substring(c, 0, maxChars)))
}
