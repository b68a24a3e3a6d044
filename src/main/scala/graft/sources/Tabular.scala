package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Structured→text flattening (SURVEY.md §2.1 S6): the reference's Excel
  * "markdownification" — per sheet a header line, then
  * `"Row N: Header1: v1, Header2: v2"` rows with empty cells skipped
  * (/root/reference/internal/parser/excel.go:13-94, row format :73).
  *
  * XLSX itself needs POI (absent offline; `Parsers.ExcelParser` is the
  * stub), but the *operator* is format-independent: any tabular DataFrame —
  * CSV/TSV/parquet "sheets" — textualizes the same way and feeds the chunk
  * pipeline. Keeping sheets as real DataFrames (and flattening only at the
  * ingest edge) is the capability upgrade SURVEY §2.1 S6 notes.
  */
object Tabular {

  /** Read a delimited "sheet" with header row. */
  def readCsv(spark: SparkSession, path: String, delimiter: String = ","): DataFrame =
    spark.read.option("header", "true").option("delimiter", delimiter).csv(path)

  /** Per-row textualization: `Row N: H1: v1, H2: v2` — null/empty cells
    * skipped, 1-based row numbers (excel.go:73 contract). Row order is
    * pinned by `orderCol` (a file has an implicit order; a DataFrame needs
    * an explicit one).
    */
  def rowTexts(sheet: DataFrame, orderCol: String): DataFrame = {
    val headers = sheet.columns
    val w = org.apache.spark.sql.expressions.Window.orderBy(col(orderCol))
    val cells = headers.map { h =>
      when(col(h).isNotNull && length(trim(col(h).cast("string"))) > 0,
        concat(lit(s"$h: "), col(h).cast("string")))
    }
    sheet
      .withColumn("__row_n", row_number().over(w))
      .select(col("__row_n").as("row_idx"),
        concat(lit("Row "), col("__row_n"), lit(": "),
          concat_ws(", ", cells: _*)).as("text"))
  }

  /** Whole-sheet text: header line + row lines, newline-joined — the exact
    * shape the reference hands to the chunker.
    */
  def sheetText(sheet: DataFrame, sheetName: String, orderCol: String): String = {
    val header = s"Sheet: $sheetName\nHeaders: ${sheet.columns.mkString(", ")}"
    val rows = rowTexts(sheet, orderCol)
      .orderBy(col("row_idx"))
      .collect().map(_.getString(1))
    (header +: rows).mkString("\n")
  }
}
