package graft.sources

import java.nio.file.Files

import graft.SparkTestBase
import graft.functions.TextChunker
import org.scalatest.funsuite.AnyFunSuite

/** S6 markdownification semantics over a readable tabular format. */
class TabularSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private lazy val csvPath = {
    val d = Files.createTempDirectory("graft-tabular")
    Files.write(d.resolve("sheet.csv"),
      """id,name,amount,notes
        |1,alpha,100,first row
        |2,beta,,missing amount
        |3,gamma,300,
        |""".stripMargin.getBytes)
    d.resolve("sheet.csv").toString
  }

  test("row textualization: 'Row N: H: v' with empty cells skipped") {
    val sheet = Tabular.readCsv(spark, csvPath)
    val rows = Tabular.rowTexts(sheet, "id").collect()
      .map(r => r.getAs[Long]("row_idx") -> r.getAs[String]("text")).toMap
    assert(rows(1L) == "Row 1: id: 1, name: alpha, amount: 100, notes: first row")
    assert(rows(2L) == "Row 2: id: 2, name: beta, notes: missing amount") // empty amount skipped
    assert(rows(3L) == "Row 3: id: 3, name: gamma, amount: 300") // empty notes skipped
  }

  test("row numbering is distributed: no single-partition global-sort window") {
    import spark.implicits._
    // enough rows to span many partitions; numbering must stay contiguous
    val sheet = spark.range(1, 5001).select($"id", ($"id" % 7).as("v"))
    val out = Tabular.rowTexts(sheet.toDF(), "id")
    // physical plan: no Window over an empty partition spec (the scale trap)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"unexpected global window in plan:\n$plan")
    val idx = out.collect().map(_.getAs[Long]("row_idx")).sorted
    assert(idx.head == 1L && idx.last == 5000L && idx.distinct.length == 5000)
    // with AQE's small-data coalescing off, the numbering really runs on
    // many partitions (per-partition offsets, not one global task)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val parts = Tabular.rowTexts(sheet.toDF(), "id").rdd.getNumPartitions
      assert(parts > 1, s"expected multi-partition numbering, got $parts")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("sheet text feeds the chunk pipeline") {
    val sheet = Tabular.readCsv(spark, csvPath)
    val text = Tabular.sheetText(sheet, "sheet.csv", "id")
    assert(text.startsWith("Sheet: sheet.csv\nHeaders: id, name, amount, notes\nRow 1:"))
    val chunks = TextChunker.chunkSentenceAware(text, chunkSize = 80, overlap = 10)
    assert(chunks.nonEmpty)
    assert(chunks.forall(_.nonEmpty))
  }
}
