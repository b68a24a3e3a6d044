package graft.streaming

import graft.sources.Ingest
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}
import org.apache.spark.sql.Row

/** Streaming ingest (SURVEY.md §2.9): the fsnotify watcher + 500 ms debounce
  * (manager.go:324-371, :68) becomes a Structured Streaming file source —
  * discovery, backfill and incremental pickup are unified; the debounce is
  * subsumed by the trigger interval (the file source only lists stable
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

  /** Alert sink (hive_service.go:221-246 → WebSocket push): keyword hits
    * appended per micro-batch via foreachBatch; the push transport is a
    * serving-layer concern, the engine lands an `alerts` table.
    */
  def alertWriter(
      chunks: DataFrame, keyword: String = "CONFIDENTIAL")(
      onBatch: (DataFrame, Long) => Unit): DataStreamWriter[Row] =
    chunks
      .filter(upper(col("content")).contains(keyword) && col("chunk_index") === 0)
      .writeStream
      .outputMode("append")
      .trigger(Trigger.ProcessingTime("1 second"))
      .foreachBatch { (batch: DataFrame, id: Long) => onBatch(batch, id) }
}
