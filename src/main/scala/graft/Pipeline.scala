package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType, TimestampType}

import graft.operators.RuleEngine
import graft.sources.{FileCatalog, Ingest, Warehouse}

/** One-call incremental ingest: the reference's entire drone→hive write path
  * (watch → hash-decide → parse → chunk → embed → upsert → alert → audit,
  * SURVEY.md §3.2/§3.4) as a single idempotent batch job over a warehouse
  * directory. Running it twice on unchanged input is a no-op; changed files
  * re-ingest under the same chunk ids (uuid5) and land as updates.
  *
  * Layout under `warehouseDir`: `chunks/` (partitioned by organization_id),
  * `alerts/`, `events/`, `file_catalog/`.
  */
object Pipeline {

  final case class IngestReport(
      nFiles: Long, nNew: Long, nUpdated: Long, nSkipped: Long,
      nChunks: Long, nAlerts: Long)

  private val catalogSchema = StructType(Seq(
    StructField("file_path", StringType, nullable = false),
    StructField("file_hash", StringType, nullable = false),
    StructField("last_processed", TimestampType, nullable = true),
    StructField("server_status", StringType, nullable = true)))

  def runIngestOnce(
      spark: SparkSession, inputDir: String, warehouseDir: String,
      organizationId: String = "default",
      chunkSize: Int = graft.functions.TextChunker.DefaultChunkSize,
      overlap: Int = graft.functions.TextChunker.DefaultOverlap,
      dim: Int = graft.functions.MockEmbedder.DefaultDim,
      alertKeyword: String = "CONFIDENTIAL"): IngestReport = {

    val catalogPath = s"$warehouseDir/file_catalog"
    val catalog = readOrEmpty(spark, catalogPath, catalogSchema)

    // decide: new / update / skip against prior state (F1-F3 + SHA-256).
    // Caches are scoped to this run and unpersisted in the finally below:
    // Spark's cache manager matches by canonicalized plan, so a cached scan
    // of the same input dir would poison a later run with stale bytes.
    val files = FileCatalog.withFileHash(
      Ingest.applyFilters(Ingest.readDir(spark, inputDir))).cache()
    val decided = FileCatalog.decide(files, catalog).cache()
    try {
    val byType = decided.groupBy(col("ingest_type")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val toProcess = FileCatalog.toProcess(decided)

    // parse → chunk → embed → land (idempotent ids)
    val chunks = Ingest.chunkAndEmbed(
      Ingest.parse(toProcess), organizationId, chunkSize, overlap, dim).cache()
    try {
    val nChunks = chunks.count()
    if (nChunks > 0) Warehouse.writeChunks(chunks, s"$warehouseDir/chunks")

    // alerts on first chunks (F6) + ingest events (S13)
    val firstChunks = chunks.filter(col("chunk_index") === 0)
    val alerts = RuleEngine.keywordAlerts(firstChunks, col("content"), alertKeyword)
      .select(col("document_id"),
        col("metadata")("filename").as("document_name"),
        col("alert_keyword"), col("organization_id"),
        current_timestamp().as("created_at"))
    val nAlerts = alerts.count()
    if (nAlerts > 0) alerts.write.mode("append").parquet(s"$warehouseDir/alerts")

    val events = decided.filter(col("ingest_type").isin("new", "update"))
      .select(current_timestamp().as("timestamp"),
        col("ingest_type").as("event_type"),
        col("filename").as("document_name"),
        col("path").as("details"))
    if (!events.isEmpty)
      events.write.mode("append").parquet(s"$warehouseDir/events")

    // advance catalog state (overwrite with merged view). nFiles comes from
    // byType (already materialized): counting `decided` after the swap would
    // recompute through the replaced catalog files on cache loss.
    val newCatalog = FileCatalog.updatedCatalog(catalog, toProcess)
    writeCatalogAtomically(spark, newCatalog, catalogPath)

    IngestReport(
      nFiles = byType.values.sum,
      nNew = byType.getOrElse("new", 0L),
      nUpdated = byType.getOrElse("update", 0L),
      nSkipped = byType.getOrElse("skip", 0L),
      nChunks = nChunks, nAlerts = nAlerts)
    } finally chunks.unpersist()
    } finally {
      files.unpersist()
      decided.unpersist()
    }
  }

  private def readOrEmpty(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) spark.read.schema(schema).parquet(path)
    else spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
  }

  /** Overwrite-in-place of state we are also reading requires a staging
    * write + swap (plain parquet has no transactions). The live catalog is
    * renamed aside (recoverable) before the staging copy is promoted, and
    * renames are checked — a crash between steps leaves either the old or
    * the new catalog intact, never neither.
    */
  private def writeCatalogAtomically(
      spark: SparkSession, catalog: DataFrame, path: String): Unit = {
    val live = new Path(path)
    val staging = new Path(path + "__staging")
    val retired = new Path(path + "__retired")
    catalog.write.mode("overwrite").parquet(staging.toString)
    val fs = live.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(retired)) fs.delete(retired, true)
    val hadLive = fs.exists(live)
    if (hadLive && !fs.rename(live, retired))
      throw new java.io.IOException(s"failed to retire catalog $live")
    if (!fs.rename(staging, live)) {
      if (hadLive) fs.rename(retired, live) // roll back; old state intact
      throw new java.io.IOException(s"failed to promote catalog $staging")
    }
    if (hadLive) fs.delete(retired, true)
  }
}
