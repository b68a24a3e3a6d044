package graft.streaming

import graft.sources.Ingest
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}
import org.apache.spark.sql.Row

/** Streaming ingest (SURVEY.md §2.9): the fsnotify watcher + 500 ms debounce
  * (manager.go:324-371, :68) becomes a Structured Streaming file source —
  * discovery, backfill and incremental pickup are unified.
  *
  * Producer contract: files must land ATOMICALLY in the watch dir (write to
  * a temp location, then move) — Spark's file source never re-reads a path
  * it has seen, so a file copied in place non-atomically would be ingested
  * half-written and its completed content never picked up. The batch path
  * does not share this constraint (its SHA-256 decide re-ingests changed
  * files).
  *
  * The transform stages are the *same* functions as batch ingest
  * ([[graft.sources.Ingest]]) — one pipeline, two execution modes.
  */
object StreamingIngest {

  /** `readStream` over a directory of text/markdown documents. */
  def readDirStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream
      .format("text")
      .option("wholetext", "true")
      .option("pathGlobFilter", "*.{txt,md}")
      .load(dir)
      .select(col("value").as("text"))
      .withColumn("path", input_file_name())
      .withColumn("filename", element_at(split(col("path"), "/"), -1))
      .filter(length(col("text")) > 0)

  /** Streaming chunks: same chunk/embed stages as batch. */
  def chunkStream(
      spark: SparkSession, dir: String, organizationId: String = "default",
      chunkSize: Int = graft.functions.TextChunker.DefaultChunkSize,
      overlap: Int = graft.functions.TextChunker.DefaultOverlap,
      dim: Int = graft.functions.MockEmbedder.DefaultDim): DataFrame =
    Ingest.chunkAndEmbed(readDirStream(spark, dir),
      organizationId, chunkSize, overlap, dim)

  /** Streaming quality gate: the SAME narrow per-doc filters the batch
    * curation pipeline runs (Gopher repetition cap, C4 page rules, Unicode
    * canonicalization before any downstream hashing) applied to a streaming
    * ingest frame. Every predicate here is stateless and per-row — legal in
    * append mode with no watermark, and the streaming twin can never drift
    * from batch semantics because it IS the batch column functions.
    */
  def qualityGate(
      docs: DataFrame, textCol: String = "text",
      maxDup5gramFrac: Option[Double] = Some(0.9),
      c4PageRules: Boolean = false,
      canonicalize: Boolean = true): DataFrame = {
    var cur = docs
    if (canonicalize)
      cur = cur.withColumn(textCol,
        graft.functions.TextNormalize.canonicalize(col(textCol)))
    maxDup5gramFrac.foreach { t =>
      cur = cur.filter(
        graft.functions.GraftFunctions.repetitionStatsUdf(col(textCol))
          .getField("dup5gramFrac") <= t)
    }
    // null text passes here too (keepPage(null) is null → filter would
    // silently drop) — the shared unevaluable-docs policy of the batch
    // pipeline applies to every stage of the gate
    if (c4PageRules)
      cur = cur.filter(
        graft.functions.C4Rules.keepPage(col(textCol)) || col(textCol).isNull)
    cur
  }

  /** Streaming URL-key dedup — the canonical-URL tier of incremental
    * ingest (the content tier is [[StreamingDedup]]): one row per
    * canonical URL ([[graft.functions.UrlParts.canonicalize]]) within the
    * watermark window survives, later spellings of the same page are
    * dropped. Null-URL rows always pass (the shared unevaluable-rows
    * policy — and a null dedup key would otherwise collapse ALL of them
    * into one).
    *
    * Semantics, honestly stated vs the batch stage (Curate url_dedup,
    * min-id representative):
    *  - the survivor is the first row the state operator SEES per key:
    *    deterministic across micro-batches (earlier batch wins), arbitrary
    *    among duplicates inside one micro-batch (operator order after the
    *    key shuffle) — an online dedup cannot know the eventual min id;
    *  - standard watermark loss applies: a row arriving with event time
    *    already below the watermark is dropped by
    *    `dropDuplicatesWithinWatermark` EVEN IF ITS KEY IS NEW (while a
    *    late null-URL row still passes through the stateless branch), so
    *    the stream's survivor set can undercount the batch stage's on
    *    heavily out-of-order input — replaying the store in batch remains
    *    the ground truth, the same caveat as [[StreamingFunnel]];
    *  - state is bounded by the delay: a canonical key is remembered only
    *    until the watermark passes its event time — a years-running stream
    *    holds a window of keys, not the crawl history; re-crawls past the
    *    delay re-admit the page (by design — they ARE new snapshots).
    */
  def urlDedupStream(
      docs: DataFrame, urlCol: String, tsCol: String,
      watermarkDelay: String): DataFrame = {
    val marked = docs.withWatermark(tsCol, watermarkDelay)
    val deduped = marked.filter(col(urlCol).isNotNull)
      .withColumn("__canon",
        graft.functions.UrlParts.canonicalize(col(urlCol)))
      .dropDuplicatesWithinWatermark("__canon")
      .drop("__canon")
    deduped.unionByName(marked.filter(col(urlCol).isNull))
  }

  /** Alert sink (hive_service.go:221-246 → WebSocket push): keyword hits
    * appended per micro-batch via foreachBatch; the push transport is a
    * serving-layer concern, the engine lands an `alerts` table.
    */
  def alertWriter(
      chunks: DataFrame, keyword: String = "CONFIDENTIAL")(
      onBatch: (DataFrame, Long) => Unit): DataStreamWriter[Row] =
    chunks
      .filter(upper(col("content")).contains(keyword.toUpperCase) &&
        col("chunk_index") === 0)
      .writeStream
      .outputMode("append")
      .trigger(Trigger.ProcessingTime("1 second"))
      .foreachBatch { (batch: DataFrame, id: Long) => onBatch(batch, id) }
}
