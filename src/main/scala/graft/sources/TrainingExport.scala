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

  /** Schema-enforced PERMISSIVE JSONL read — the ingest side of the shard
    * format (and of any external JSONL corpus): well-formed lines parse
    * against `schema`, malformed or schema-violating lines survive in
    * `_corrupt_record` with their raw text (the WARC error-column
    * convention: at 100 TB a bad shard must neither kill the job nor
    * silently vanish — both engines of data loss). `source_file` rides
    * along for provenance/debugging.
    *
    * Deliberately `text` + `from_json` rather than `spark.read.json`:
    * the scan-level corrupt column is an INTERNAL column Spark refuses to
    * query on its own (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_
    * COLUMN — the documented workaround is caching, a non-starter at
    * corpus scale), while the expression form is an ordinary column with
    * identical permissive semantics and remains one narrow codegen pass.
    */
  def readJsonlPermissive(
      spark: SparkSession, path: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame = {
    require(!schema.fieldNames.contains("_corrupt_record"),
      "_corrupt_record is reserved for the permissive-read error column")
    val withErr = schema.add("_corrupt_record",
      org.apache.spark.sql.types.StringType)
    spark.read
      .option("recursiveFileLookup", "true")
      .text(path)
      .select(
        from_json(col("value"), withErr,
          Map("mode" -> "PERMISSIVE",
            "columnNameOfCorruptRecord" -> "_corrupt_record")).as("__p"),
        input_file_name().as("source_file"))
      .select(col("__p.*"), col("source_file"))
  }

  /** The quarantine view: raw text + provenance of every line that failed
    * the schema. Feed it to a dead-letter sink; COUNT it as the ingest
    * health metric.
    */
  def corruptLines(parsed: DataFrame): DataFrame =
    parsed.filter(col("_corrupt_record").isNotNull)
      .select(col("source_file"), col("_corrupt_record").as("raw_line"))
}
