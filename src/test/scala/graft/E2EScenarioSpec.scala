package graft

import java.nio.file.Files

import graft.operators.RuleEngine
import graft.streaming.StreamingIngest
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The reference's E2E smoke scenario (cmd/integration-test/main.go:21-160,
  * FIXTURES.md §1), re-expressed over the streaming engine: add a rule,
  * stream-ingest a CONFIDENTIAL document, and assert both the keyword alert
  * and the rule match land within one processed batch.
  */
class E2EScenarioSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("rule + confidential doc → alert and rule match in one batch") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-e2e")
    Files.write(dir.resolve("test_confidential.txt"),
      "This document contains CONFIDENTIAL pricing information for Q4 2025.".getBytes)
    Files.write(dir.resolve("benign.md"),
      "A perfectly ordinary document about sorting algorithms.".getBytes)

    val rules = Seq(
      (1, "Does this document contain confidential pricing information?"))
      .toDF("rule_id", "question")

    val chunks = StreamingIngest.chunkStream(spark, dir.toString,
      chunkSize = 200, overlap = 40, dim = 16)

    var alerts = 0L
    var matches: Array[(Int, String, String)] = Array.empty
    val q = chunks.writeStream.outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val firstChunks = batch.filter(col("chunk_index") === 0).cache()
        alerts += RuleEngine.keywordAlerts(firstChunks, col("content")).count()
        matches ++= RuleEngine.evaluate(firstChunks, rules, col("content"))
          .filter(col("answer") === "YES")
          .select(col("rule_id"), col("answer"), col("metadata")("filename"))
          .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2)))
        ()
      }.start()
    try {
      q.processAllAvailable()
      assert(alerts == 1) // only the confidential doc, only chunk 0
      assert(matches.length == 1)
      assert(matches.head._1 == 1)
      assert(matches.head._3 == "test_confidential.txt")
    } finally q.stop()
  }
}
