package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Change-data decisioning against the file catalog (SURVEY.md §2.9):
  * the drone's SHA-256 tracked-files state machine
  * (/root/reference/internal/drone/watcher/decision.go:43-99) re-expressed
  * as a join — `new` (no catalog row), `update` (hash changed), `skip`
  * (hash unchanged). One broadcast-or-shuffle join instead of N point
  * lookups; at 100 TB the catalog is bucketed by file_path.
  */
object FileCatalog {

  /** Content hash matching the reference (SHA-256 of raw bytes,
    * decision.go:101-115).
    */
  def withFileHash(files: DataFrame): DataFrame =
    files.withColumn("file_hash", sha2(col("content"), 256))

  /** Classify each incoming (path, file_hash) row against catalog state. */
  def decide(files: DataFrame, catalog: DataFrame): DataFrame = {
    val cat = catalog.select(
      col("file_path"), col("file_hash").as("catalog_hash"))
    files.join(cat, files("path") === cat("file_path"), "left")
      .withColumn("ingest_type",
        when(col("catalog_hash").isNull, "new")
          .when(col("file_hash") =!= col("catalog_hash"), "update")
          .otherwise("skip"))
      .drop("file_path", "catalog_hash")
  }

  /** Rows that need processing (decision.go:19-20 emits only new/update). */
  def toProcess(decided: DataFrame): DataFrame =
    decided.filter(col("ingest_type").isin("new", "update"))

  /** Next catalog state: processed files upserted over prior entries. */
  def updatedCatalog(catalog: DataFrame, processed: DataFrame): DataFrame = {
    val fresh = processed.select(
      col("path").as("file_path"), col("file_hash"),
      current_timestamp().as("last_processed"),
      lit("ingested").as("server_status"))
    fresh.unionByName(
        catalog.join(fresh.select(col("file_path").as("p")),
          col("file_path") === col("p"), "left_anti"))
  }
}
