package graft.operators

import java.sql.Timestamp

import graft.SparkTestBase
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RagTimelineSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("RAG retrieve + citation assembly (§3.3)") {
    import spark.implicits._
    val chunks = Seq(
      ("c1", "alpha", "Project Alpha confidential report."),
      ("c2", "beta", "Beta analysis quarterly results."),
      ("c3", "gamma", "Gamma protocol implementation guide."))
      .toDF("id", "document_id", "content")
      .withColumn("vector", graft.functions.GraftFunctions.mockEmbed(col("content"), 64))
      .withColumn("organization_id", lit("org1"))
    val hits = Rag.retrieve(chunks, "Beta analysis quarterly results.",
      k = 2, organizationId = Some("org1"), dim = 64)
    val res = Rag.withCitations(hits).collect().head
    assert(res.getAs[String]("context").startsWith("Beta analysis"))
    val cits = res.getAs[scala.collection.Seq[Row]]("citations")
    assert(cits.length == 2)
    assert(cits.head.getAs[String]("document_id") == "beta")
    assert(cits.head.getAs[Double]("score") > 0.999)
    assert(cits.head.getAs[String]("chunk_id") == "c2")
  }

  test("display truncation: first 3 chunks, 500 chars each (T6)") {
    import spark.implicits._
    val grouped = Seq(
      (1, Seq("a" * 900, "b" * 100, "c" * 600, "d" * 10)))
      .toDF("id", "chunks")
    val r = Rag.truncateForDisplay(grouped, "chunks").collect().head
    val display = r.getAs[scala.collection.Seq[String]]("display_chunks")
    assert(display.length == 3)
    assert(display(0) == "a" * 500)
    assert(display(1) == "b" * 100)
    assert(display(2) == "c" * 500)
  }

  test("timeline: recent events desc-limited; audit tail filters (T3/T4)") {
    import spark.implicits._
    val events = (1 to 50).map(i =>
      (new Timestamp(i * 1000L), "ingest", s"doc$i", "")).toDF(
      "timestamp", "event_type", "document_name", "details")
    val recent = Timeline.recentEvents(events, limit = 5).collect()
    assert(recent.map(_.getAs[String]("document_name")).toSeq ==
      Seq("doc50", "doc49", "doc48", "doc47", "doc46"))

    val audit = Seq(
      (new Timestamp(1000L), "1.1.1.1", "SEARCH", "", "org1"),
      (new Timestamp(2000L), "1.1.1.2", "INGEST", "", "org1"),
      (new Timestamp(3000L), "1.1.1.3", "SEARCH", "", "org2")).toDF(
      "timestamp", "client_ip", "action", "details", "organization_id")
    assert(Timeline.auditTail(audit, action = Some("SEARCH")).count() == 2)
    assert(Timeline.auditTail(audit, action = Some("SEARCH"),
      organizationId = Some("org1")).count() == 1)
    assert(Timeline.listRules(
      Seq((1L, "q", true, "org1"), (2L, "r", true, "org1")).toDF("id", "query", "active", "organization_id"))
      .collect().head.getAs[Long]("id") == 2L)
  }

  test("usage rollup meters per tenant and month from the audit log") {
    import spark.implicits._
    val audit = Seq(
      (Timestamp.valueOf("2026-08-01 10:00:00"), "1.1.1.1", "SEARCH", "", "org1"),
      (Timestamp.valueOf("2026-08-02 10:00:00"), "1.1.1.1", "SEARCH", "", "org1"),
      (Timestamp.valueOf("2026-08-03 10:00:00"), "1.1.1.1", "INGEST", "", "org1"),
      (Timestamp.valueOf("2026-07-01 10:00:00"), "1.1.1.2", "SEARCH", "", "org2")).toDF(
      "timestamp", "client_ip", "action", "details", "organization_id")
    val usage = Timeline.usageRollup(audit).collect()
      .map(r => (r.getAs[String]("organization_id"), r.getAs[String]("period")) ->
        (r.getAs[Long]("n_searches"), r.getAs[Long]("n_ingests"))).toMap
    assert(usage(("org1", "2026-08")) == ((2L, 1L)))
    assert(usage(("org2", "2026-07")) == ((1L, 0L)))
  }

  test("graph ops: nodes, edges-for, node-link degrees (J5/J6)") {
    import spark.implicits._
    val edges = Seq(
      ("a", "b", "contradicts", "", new Timestamp(0L)),
      ("a", "c", "references", "", new Timestamp(0L)),
      ("b", "c", "contradicts", "", new Timestamp(0L))).toDF(
      "source_doc_id", "target_doc_id", "relationship_type", "description", "created_at")
    assert(GraphOps.nodes(edges).count() == 3)
    assert(GraphOps.edgesFor(edges, "b").count() == 2)
    val (nodes, _) = GraphOps.nodeLink(edges)
    val deg = nodes.collect().map(r =>
      r.getAs[String]("doc_id") -> r.getAs[Long]("degree")).toMap
    assert(deg == Map("a" -> 2L, "b" -> 2L, "c" -> 2L))
  }

  test("contradiction edges via deterministic oracle") {
    import spark.implicits._
    val pairs = Seq((1L, 2L, 0.9), (1L, 3L, 0.8)).toDF("query_id", "neighbor_id", "score")
    val docs = Seq(
      (1L, "the secret plan"), (2L, "another secret doc"), (3L, "public info"))
      .toDF("doc_id", "text")
    val oracle = new LLMOracle {
      def yesNo(q: String, c: String): Boolean = c.contains("secret doc")
      def tags(c: String): Seq[String] = Seq.empty
    }
    val edges = GraphOps.contradictionEdges(pairs, docs, "doc_id", "text", oracle).collect()
    assert(edges.length == 1)
    assert(edges.head.getAs[String]("source_doc_id") == "1")
    assert(edges.head.getAs[String]("target_doc_id") == "2")
    assert(edges.head.getAs[String]("relationship_type") == "contradicts")
  }
}
