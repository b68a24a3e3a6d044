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
      .map(r => r.getAs[Int]("row_idx") -> r.getAs[String]("text")).toMap
    assert(rows(1) == "Row 1: id: 1, name: alpha, amount: 100, notes: first row")
    assert(rows(2) == "Row 2: id: 2, name: beta, notes: missing amount") // empty amount skipped
    assert(rows(3) == "Row 3: id: 3, name: gamma, amount: 300") // empty notes skipped
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
