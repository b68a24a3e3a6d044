package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Structured→text flattening (SURVEY.md §2.1 S6): the reference's Excel
  * "markdownification" — per sheet a header line, then
  * `"Row N: Header1: v1, Header2: v2"` rows with empty cells skipped
  * (/root/reference/internal/parser/excel.go:13-94, row format :73).
  *
  * XLSX bytes are handled by the real `Parsers.ExcelParser` →
  * `OoxmlExtract.xlsxText` (ZIP + worksheet XML, zero deps); this operator
  * is the format-independent twin: any tabular DataFrame — CSV/TSV/parquet
  * "sheets" — textualizes the same way and feeds the chunk pipeline.
  * Keeping sheets as real DataFrames (and flattening only at the ingest
  * edge) is the capability upgrade SURVEY §2.1 S6 notes.
  */
object Tabular {

  /** Read a delimited "sheet" with header row. */
  def readCsv(spark: SparkSession, path: String, delimiter: String = ","): DataFrame =
    spark.read.option("header", "true").option("delimiter", delimiter).csv(path)

  /** Per-row textualization: `Row N: H1: v1, H2: v2` — null/empty cells
    * skipped, 1-based row numbers (excel.go:73 contract). Row order is
    * pinned by `orderCol` (a file has an implicit order; a DataFrame needs
    * an explicit one).
    *
    * Row numbers come from a range-repartition + per-partition index
    * (`zipWithIndex`), NOT a global `Window.orderBy` — a single-partition
    * window serializes a 10⁹-row "sheet" onto one task; this path keeps the
    * numbering distributed (one extra count job, no extra shuffle beyond the
    * range sort).
    */
  def rowTexts(sheet: DataFrame, orderCol: String): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.LongType
    val spark = sheet.sparkSession
    val sorted = sheet
      .repartitionByRange(col(orderCol))
      .sortWithinPartitions(col(orderCol))
    val withIdx = spark.createDataFrame(
      sorted.rdd.zipWithIndex().map { case (r, i) => Row.fromSeq(r.toSeq :+ (i + 1L)) },
      sorted.schema.add("__row_n", LongType, nullable = false))
    val cells = sheet.columns.map { h =>
      when(col(h).isNotNull && length(trim(col(h).cast("string"))) > 0,
        concat(lit(s"$h: "), col(h).cast("string")))
    }
    withIdx.select(col("__row_n").as("row_idx"),
      concat(lit("Row "), col("__row_n"), lit(": "),
        concat_ws(", ", cells.toIndexedSeq: _*)).as("text"))
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
