package graft.streaming

import graft.functions.GraftFunctions
import graft.operators.Dedup
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental near-duplicate dedup for a continuously arriving corpus —
  * the production LLM-pipeline pattern: each micro-batch is deduped
  * (1) within itself (exact + MinHash-LSH near-dup), then (2) against the
  * ACCUMULATED signature store via an LSH band join, and survivors'
  * signatures are appended to the store.
  *
  * The store is a table (parquet/lakehouse), not executor memory: restart
  * safety, compaction and TTL come from the storage layer, and the per-batch
  * work is one band-key join against a bucketed table — O(batch × bands)
  * lookups regardless of corpus size, the only shape that survives a corpus
  * that has already ingested 100 TB.
  */
object StreamingDedup {

  /** Exploded band-signature rows for a batch: (doc_id, band_idx, band_key,
    * sig). The store holds exactly these columns.
    */
  def bandRows(docs: DataFrame, idCol: String, textCol: String, n: Int = 3): DataFrame =
    Dedup.minhashSignatures(docs, idCol, textCol, n)
      .select(col(idCol).as("doc_id"), col("sig"),
        posexplode(col("bands")).as(Seq("band_idx", "band_key")))

  /** One batch against one store state (pure — unit-testable without a
    * stream): returns (survivors, newStoreRows).
    *
    *  - within-batch near-dups collapse to their min-id representative
    *  - a batch doc whose estimated Jaccard vs ANY stored signature sharing
    *    an LSH band is ≥ `minEstJaccard` is dropped as a duplicate
    */
  def processBatch(
      batch: DataFrame, store: DataFrame, idCol: String, textCol: String,
      minEstJaccard: Double = 0.8, n: Int = 3): (DataFrame, DataFrame) = {
    // (1) within-batch: exact + near-dup → drop everything but min-id reps
    val withinPairs = Dedup.minhashCandidatePairs(batch, idCol, textCol,
      minEstJaccard, n)
    val dropWithin = Dedup.dropSet(withinPairs)
    val batchDeduped = batch.join(
      dropWithin.withColumnRenamed("doc_id", idCol), Seq(idCol), "left_anti")

    // (2) against the store: band-key equality join, signature refine
    val newBands = bandRows(batchDeduped, idCol, textCol, n)
    val hits = newBands.as("nb")
      .join(store.as("st"), Seq("band_idx", "band_key"))
      .filter(GraftFunctions.minhashJaccardUdf(col("nb.sig"), col("st.sig"))
        >= minEstJaccard)
      .select(col("nb.doc_id").as(idCol)).distinct()
    val survivors = batchDeduped.join(hits, Seq(idCol), "left_anti")

    (survivors, bandRows(survivors, idCol, textCol, n))
  }

  /** Streaming wiring: foreachBatch drives [[processBatch]] with a parquet
    * signature store and writes survivors to `outPath`. Batch boundaries
    * give exactly-once per-batch semantics on restart when the sink is
    * idempotent (survivors carry deterministic ids).
    */
  def run(
      spark: SparkSession, docsStream: DataFrame, idCol: String, textCol: String,
      storePath: String, outPath: String, checkpoint: String,
      minEstJaccard: Double = 0.8): org.apache.spark.sql.streaming.StreamingQuery = {
    val storeSchema = "doc_id LONG, sig ARRAY<BIGINT>, band_idx INT, band_key LONG"
    docsStream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val store =
          try spark.read.parquet(storePath)
          catch { case _: Exception => spark.createDataFrame(
            spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
            org.apache.spark.sql.types.StructType.fromDDL(storeSchema)) }
        val (survivors, newRows) = processBatch(
          batch, store, idCol, textCol, minEstJaccard)
        survivors.write.mode(SaveMode.Append).parquet(outPath)
        newRows.select(col("doc_id").cast("long").as("doc_id"), col("sig"),
            col("band_idx"), col("band_key"))
          .write.mode(SaveMode.Append).parquet(storePath)
        ()
      }
      .start()
  }
}
