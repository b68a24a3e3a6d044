package graft.sources

import graft.functions.GraftFunctions
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Batch ingest pipeline (SURVEY.md §3.2/§3.4): directory → filter →
  * parse → sentence-aware chunk explode → deterministic embed → idempotent
  * chunk ids → `chunks`-shaped DataFrame.
  *
  * The reference's drone/server tiers (fsnotify watcher, gRPC transport,
  * worker pools) collapse into this one declarative pipeline; Spark's file
  * source + DAG scheduler replace the custom topology. The streaming twin
  * ([[graft.streaming.StreamingIngest]]) reuses exactly these stages over
  * `readStream`.
  *
  * Scale: `binaryFile` scans parallelize per file; chunk explode is
  * narrow (no shuffle); the only wide stage is the optional idempotent
  * `dropDuplicates(id)`. Partition the sink by `organization_id`.
  */
object Ingest {

  /** F1: temp-file patterns (dispatcher.go:64-79): `~$*`, `._*`, `*.tmp`. */
  val TempFilePattern = "(^~\\$.*)|(^\\._.*)|(.*\\.tmp$)"

  /** Read a directory tree as (path, filename, ext, content bytes, length). */
  def readDir(spark: SparkSession, dir: String): DataFrame =
    spark.read.format("binaryFile")
      .option("recursiveFileLookup", "true")
      .load(dir)
      .select(
        col("path"),
        element_at(split(col("path"), "/"), -1).as("filename"),
        lower(element_at(split(col("path"), "\\."), -1)).as("ext"),
        col("content"),
        col("length"))

  /** F1+F2+F3: drop temp files, unsupported extensions, empty files. */
  def applyFilters(files: DataFrame): DataFrame =
    files
      .filter(!col("filename").rlike(TempFilePattern))
      .filter(col("ext").isin(Parsers.supportedExtensions: _*))
      .filter(col("length") > 0)

  private val parseUdf = udf((ext: String, bytes: Array[Byte]) =>
    Parsers.parseOrNone(ext, bytes))

  /** Parse bytes → `text` column; unparseable files are dropped (the
    * reference logs-and-skips, dispatcher.go:41-50).
    */
  def parse(files: DataFrame): DataFrame =
    parseWithStatus(files).filter(col("ok")).drop("content", "ok")

  /** Parse keeping failures as rows with `ok = false` — feeds the A4
    * success/failure tally ([[Warehouse.ingestTally]]).
    */
  def parseWithStatus(files: DataFrame): DataFrame =
    files.withColumn("text", parseUdf(col("ext"), col("content")))
      .withColumn("ok", col("text").isNotNull && length(col("text")) > 0)

  /** Full pipeline: returns a `chunks`-shaped DataFrame with idempotent
    * uuid5 ids — re-ingesting the same path yields identical ids, so the
    * sink MERGE/dropDuplicates is a no-op on unchanged content.
    */
  def ingestDir(
      spark: SparkSession, dir: String, organizationId: String = "default",
      chunkSize: Int = graft.functions.TextChunker.DefaultChunkSize,
      overlap: Int = graft.functions.TextChunker.DefaultOverlap,
      dim: Int = graft.functions.MockEmbedder.DefaultDim): DataFrame =
    chunkAndEmbed(parse(applyFilters(readDir(spark, dir))),
      organizationId, chunkSize, overlap, dim)

  /** Chunk + embed a parsed (path, filename, text) DataFrame. `total_chunks`
    * comes from the pre-explode array size — no window, no shuffle, and the
    * same plan is legal under Structured Streaming append mode.
    */
  def chunkAndEmbed(
      parsed: DataFrame, organizationId: String,
      chunkSize: Int, overlap: Int, dim: Int): DataFrame = {
    val chunked = parsed
      .withColumn("pieces", GraftFunctions.chunkText(col("text"), chunkSize, overlap))
      .withColumn("total_chunks", size(col("pieces")))
      .select(
        Seq(col("path"), col("filename"), col("total_chunks")) :+
          posexplode(col("pieces")).as(Seq("pos", "piece")): _*)
      .select(
        col("path"), col("filename"), col("total_chunks"),
        col("piece.chunk_index").as("chunk_index"),
        col("piece.content").as("content"))
    chunked
      .withColumn("id",
        GraftFunctions.uuid5(concat(col("path"), lit("-"), col("chunk_index"))))
      .withColumn("document_id", GraftFunctions.uuid5(col("path")))
      .withColumn("vector", GraftFunctions.mockEmbed(col("content"), dim))
      .withColumn("organization_id", lit(organizationId))
      .withColumn("created_at", current_timestamp())
      .withColumn("metadata", map(
        lit("filename"), col("filename"),
        lit("path"), col("path"),
        lit("total_chunks"), col("total_chunks").cast("string"),
        lit("chunk_index"), col("chunk_index").cast("string"),
        lit("organization_id"), col("organization_id")))
      .select("id", "document_id", "content", "chunk_index", "vector",
        "metadata", "organization_id", "created_at")
  }

  /** `df` with an `outCol` ARRAY<FLOAT> embedding of `textCol`, produced by
    * a pluggable [[BatchEmbedder]] through ONE mapPartitions pass: each
    * task groups its rows into ≤batchSize batches and makes one
    * `embedBatch` call per batch — the per-request cost amortizes across
    * the batch and request parallelism equals task parallelism (coalesce
    * upstream to rate-limit an external service). Null texts embed as
    * zero vectors without consuming a batch slot.
    *
    * This is the seam where [[HttpEmbedder]] replaces the deterministic
    * mock: `withEmbedding(df, "content", HttpEmbedder(...))` is the
    * production path, and with [[MockBatchEmbedder]] the output is
    * row-identical to the codegen `GraftFunctions.mockEmbed` column
    * (IngestSpec pins the equivalence).
    */
  def withEmbedding(
      df: DataFrame, textCol: String, embedder: BatchEmbedder,
      outCol: String = "vector"): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    val schema = df.schema.add(outCol, ArrayType(FloatType, containsNull = false))
    val idx = df.schema.fieldIndex(textCol)
    val batch = embedder.batchSize
    // degraded-batch observability (round-9 ADVICE): the accumulator rides
    // the serialized embedder into every task; implementations that fall
    // back to placeholder vectors add() per degraded batch, and the total
    // is queryable on the driver (spark.sparkContext.statusTracker /
    // named-accumulator UIs) after the job.
    if (embedder.degradedBatches.isEmpty)
      embedder.degradedBatches = Some(df.sparkSession.sparkContext
        .longAccumulator("graft.embedder.degradedBatches"))
    val rdd = df.rdd.mapPartitions { it =>
      it.grouped(batch).flatMap { rows =>
        val texts = rows.map(r => if (r.isNullAt(idx)) null else r.getString(idx))
        val live = texts.filter(_ != null)
        val embeddedSeq = embedder.embedBatch(live)
        // the trait contract is one vector per input text; a misbehaving
        // implementation must fail loudly here, not throw
        // NoSuchElementException mid-zip or silently misalign rows
        require(embeddedSeq.length == live.length,
          s"BatchEmbedder returned ${embeddedSeq.length} vectors for " +
            s"${live.length} texts — one vector per input is the contract")
        val embedded = embeddedSeq.iterator
        rows.zip(texts).map { case (r, t) =>
          val v = if (t == null) new Array[Float](embedder.dim) else embedded.next()
          Row.fromSeq(r.toSeq :+ v.toSeq)
        }
      }
    }
    df.sparkSession.createDataFrame(rdd, schema)
  }

  /** [[chunkAndEmbed]] with a pluggable embedder instead of the codegen
    * mock column — the production ingest path ([[HttpEmbedder]] here, the
    * batching/timeout/fallback contract of the reference's embedding
    * clients). Identical output contract; with [[MockBatchEmbedder]] the
    * rows match the column-function path exactly.
    */
  def chunkAndEmbedWith(
      parsed: DataFrame, organizationId: String,
      chunkSize: Int, overlap: Int, embedder: BatchEmbedder): DataFrame = {
    val base = chunkAndEmbed(parsed, organizationId, chunkSize, overlap,
      dim = embedder.dim)
    withEmbedding(base.drop("vector"), "content", embedder)
      .select("id", "document_id", "content", "chunk_index", "vector",
        "metadata", "organization_id", "created_at")
  }

  /** Idempotent landing: drop duplicate ids (INSERT OR REPLACE semantics of
    * hive_service.go:81-91; with a transactional table format this becomes a
    * MERGE keyed on id).
    */
  def idempotent(chunks: DataFrame): DataFrame = chunks.dropDuplicates("id")

  /** One WARC archive's parse result: extracted docs + file-level error. */
  private case class WarcParsed(docs: Seq[WarcExtract.WarcDoc], error: String)

  private val warcUdf = udf((bytes: Array[Byte]) =>
    try WarcParsed(WarcExtract.documents(bytes), null)
    catch {
      case e: IllegalArgumentException => WarcParsed(Seq.empty, e.getMessage)
    })

  /** Web-archive ingest: every text-bearing record of the `.warc`/`.warc.gz`
    * files under `dir` as (path, target_uri, warc_date, text, error) rows —
    * the Common Crawl entry point of the curation pipeline (feed the result
    * into [[chunkAndEmbed]] or `operators.Curate`). One archive = one task
    * (WARC is not splittable mid-stream; Common Crawl ships ~1 GB archives
    * so the file is the parallelism unit). A corrupt archive yields one row
    * with a non-null `error` instead of killing the scan.
    */
  def readWarcDir(spark: SparkSession, dir: String): DataFrame =
    spark.read.format("binaryFile")
      .option("recursiveFileLookup", "true")
      .option("pathGlobFilter", "*.warc*")
      .load(dir)
      .select(col("path"), warcUdf(col("content")).as("w"))
      .select(col("path"), explode_outer(col("w.docs")).as("doc"), col("w.error").as("error"))
      // explode_outer exists to preserve ERROR rows; a healthy archive with
      // zero text-bearing records must not emit a phantom null-text row
      .filter(col("error").isNotNull || col("doc").isNotNull)
      .select(
        col("path"),
        col("doc.target_uri").as("target_uri"),
        col("doc.warc_date").as("warc_date"),
        col("doc.text").as("text"),
        col("error"))
}
