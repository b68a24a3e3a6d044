package graft.tools

import java.nio.file.Files

import graft.operators.{RuleEngine, VectorSearch}
import graft.sources.Ingest
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Library quickstart: directory → ingest → chunks → semantic search →
  * keyword alerts, end-to-end through the public API.
  */
object Demo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val dir = Files.createTempDirectory("graft-demo")
    Files.write(dir.resolve("alpha.md"),
      ("Project Alpha confidential report. " + ("Alpha body sentence. " * 80)).getBytes)
    Files.write(dir.resolve("beta.txt"),
      "Beta analysis quarterly results with growth numbers.".getBytes)
    Files.write(dir.resolve("skip.tmp"), "temp file".getBytes)

    val chunks = Ingest.idempotent(
      Ingest.ingestDir(spark, dir.toString, organizationId = "demo",
        chunkSize = 200, overlap = 40, dim = 64)).cache()
    println(s"chunks: ${chunks.count()} from ${chunks.select("document_id").distinct().count()} docs")

    val hits = VectorSearch.semanticSearch(chunks,
      "Beta analysis quarterly results with growth numbers.", k = 3,
      organizationId = Some("demo"), dim = 64)
    println("top hits:")
    hits.select(col("score"), col("metadata")("filename").as("file"),
      substring(col("content"), 1, 40).as("snippet"))
      .collect().foreach(r => println(s"  $r"))

    val alerts = RuleEngine.keywordAlerts(
      chunks.filter(col("chunk_index") === 0), col("content"))
    println(s"alerts: ${alerts.count()}")
    alerts.select(col("metadata")("filename"), col("alert_keyword"))
      .collect().foreach(r => println(s"  $r"))

    // warehouse: tenant-partitioned landing, pruning, purge
    val wh = Files.createTempDirectory("graft-demo-wh").toString + "/chunks"
    graft.sources.Warehouse.writeChunks(chunks, wh)
    graft.sources.Warehouse.writeChunks(
      chunks.withColumn("organization_id", lit("other"))
        .withColumn("id", concat(lit("o-"), col("id"))), wh)
    val back = graft.sources.Warehouse.readChunks(spark, wh)
    val prunedPlan = back.filter(col("organization_id") === "demo")
      .queryExecution.executedPlan.toString
    println(s"warehouse rows: ${back.count()}; partition-pruned plan: " +
      prunedPlan.contains("PartitionFilters"))
    graft.sources.Warehouse.purgeOrganization(spark, wh, "other")
    println(s"after purge of 'other': ${graft.sources.Warehouse.readChunks(spark, wh).count()}")

    // RAG citations
    val rag = graft.operators.Rag.withCitations(
      graft.operators.Rag.retrieve(chunks, "Beta analysis quarterly results",
        k = 2, organizationId = Some("demo"), dim = 64)).collect().head
    println(s"rag context head: ${rag.getAs[String]("context").take(40)}")
    println(s"rag citations: ${rag.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("citations").length}")

    // incremental pipeline: run twice, second run must be a no-op
    val pwh = Files.createTempDirectory("graft-demo-pipe").toString
    val r1 = graft.Pipeline.runIngestOnce(spark, dir.toString, pwh,
      organizationId = "demo", chunkSize = 200, overlap = 40, dim = 32)
    val r2 = graft.Pipeline.runIngestOnce(spark, dir.toString, pwh,
      organizationId = "demo", chunkSize = 200, overlap = 40, dim = 32)
    println(s"pipeline run1: $r1")
    println(s"pipeline run2: $r2")
    spark.stop()
  }
}
