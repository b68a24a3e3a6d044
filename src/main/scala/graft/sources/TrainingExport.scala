package graft.sources

import graft.operators.DataMix
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The pipeline's last mile: a curated corpus → token-budgeted JSONL shards,
  * the layout trainers actually consume (one JSON object per line, shards of
  * ~equal token mass so data-parallel readers stay balanced).
  *
  * Sharding is [[DataMix.packByTokenBudget]]'s exclusive-prefix-sum bin
  * computed WITHIN each `groupCol` partition (source, language, dump…) —
  * the prefix-sum window parallelizes across groups, so there is no global
  * sequential scan; a single-group corpus degenerates to one window
  * partition and is only appropriate at moderate scale (documented, not
  * silent: pick a groupCol with enough cardinality to spread the windows).
  * Shard identity is (group, bin) and assignment is deterministic given a
  * unique `orderCol`, so re-exporting the same snapshot is byte-identical.
  *
  * Rows are serialized with `to_json(struct(...))` — schema changes are
  * additive JSON keys, not format breaks. Each shard directory is written
  * by one task (range partition on the shard key + partitionBy), so no
  * shard splits across files.
  */
object TrainingExport {

  /** Write JSONL shards of ~`tokenBudget` tokens under
    * `path/shard=<group>-<bin>/`; returns the shard count. `orderCol` MUST
    * be unique within each group (content-derived id) — ties would make
    * bin assignment depend on shuffle arrival order.
    */
  def writeJsonlShards(
      docs: DataFrame, groupCol: String, orderCol: String, tokensCol: String,
      tokenBudget: Long, path: String, cols: Seq[String]): Long = {
    // explicit whole-path delete BEFORE the write: with
    // partitionOverwriteMode=dynamic an overwrite only replaces the shard
    // dirs this export produces, leaving stale shard= dirs from a previous
    // larger export both on disk AND in the directory-listing count below.
    // Guarded: only a path that looks like a previous export (shard= dirs,
    // _SUCCESS, Spark marker files) is wiped — a typo'd path pointing at
    // unrelated data must fail loudly, not silently destroy it.
    val fsPath = new org.apache.hadoop.fs.Path(path)
    val fs = fsPath.getFileSystem(docs.sparkSession.sparkContext.hadoopConfiguration)
    if (fs.exists(fsPath)) {
      val foreign = fs.listStatus(fsPath).filterNot { s =>
        val n = s.getPath.getName
        // shard dirs + commit markers from a COMPLETED export, and the
        // staging/marker debris a KILLED export leaves behind (FileOutput-
        // Committer `_temporary`, DataSource `_started_`/`_committed_`
        // ids) — a crashed run must stay self-healing on re-run, only
        // genuinely foreign data refuses
        (s.isDirectory && n.startsWith("shard=")) || n == "_SUCCESS" ||
          n.startsWith("._") || n == "_temporary" ||
          n.startsWith("_started_") || n.startsWith("_committed_")
      }
      require(foreign.isEmpty,
        s"refusing to overwrite $path: it contains entries that are not a " +
          s"previous export (${foreign.take(3).map(_.getPath.getName).mkString(", ")}" +
          s"${if (foreign.length > 3) ", …" else ""}) — delete it explicitly first")
      fs.delete(fsPath, true)
    }
    val binned = DataMix.packByTokenBudget(
      docs, groupCol = groupCol, orderCol = orderCol, tokensCol = tokensCol,
      budget = tokenBudget)
      .withColumn("__shard", concat_ws("-", col(groupCol), col("bin")))
    binned
      .withColumn("line", to_json(struct(cols.map(col): _*)))
      .repartitionByRange(col("__shard"))
      .sortWithinPartitions(col("__shard"), col(orderCol))
      .select(col("__shard").as("shard"), col("line").as("value"))
      .write.partitionBy("shard").mode("overwrite").text(path)
    // shard count from the COMMITTED output directories (safe: the path was
    // wiped above, so only this export's dirs exist) — re-running the
    // binning pipeline for a scalar would double the whole job's cost
    fs.listStatus(fsPath)
      .count(s => s.isDirectory && s.getPath.getName.startsWith("shard="))
      .toLong
  }

  /** Convenience: budget-sharded (id, text) export grouped by `groupCol`,
    * token counts from the shared whitespace contract.
    */
  def exportCorpus(
      docs: DataFrame, idCol: String, textCol: String, groupCol: String,
      tokenBudget: Long, path: String): Long = {
    val withTokens = docs.withColumn("__tokens",
      graft.functions.TextAnalysis.tokenCount(col(textCol)))
    writeJsonlShards(withTokens, groupCol, idCol, "__tokens", tokenBudget,
      path, cols = Seq(idCol, textCol))
  }

  /** Read an export back (diagnostics / round-trip specs); `shard` is
    * recovered from the partition directory.
    */
  def readJsonlShards(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path)
}
