package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Timeline / audit / stats queries and their append sinks
  * (SURVEY.md §2.1 S13, §2.4 A1-A2, §2.5 T3-T5).
  */
object Timeline {

  /** T3: recent events — `ORDER BY timestamp DESC LIMIT n`
    * (events.go:65-90; default 100 at timeline_handler.go:22-27).
    * Lowers to TakeOrderedAndProject: no global sort at any scale.
    */
  def recentEvents(events: DataFrame, limit: Int = 100): DataFrame =
    events.orderBy(col("timestamp").desc).limit(limit)

  /** T4: audit tail with optional action/org filters (audit_log.go:124-166). */
  def auditTail(
      audit: DataFrame, action: Option[String] = None,
      organizationId: Option[String] = None, limit: Int = 100): DataFrame = {
    val a = action.fold(lit(true))(col("action") === _)
    val o = organizationId.fold(lit(true))(col("organization_id") === _)
    audit.filter(a && o).orderBy(col("timestamp").desc).limit(limit)
  }

  /** T5: rules listing, newest first (rules/store.go:168-175). */
  def listRules(rules: DataFrame): DataFrame = rules.orderBy(col("id").desc)

  /** A1/A2: store stats — one row of counts (stats_handler.go:50-62; with a
    * single chunks table the "SQL count" and "vector count" are one number).
    */
  def stats(chunks: DataFrame, documents: DataFrame): DataFrame = {
    val c = chunks.agg(count(lit(1)).as("n_chunks"))
    val d = documents.agg(count(lit(1)).as("n_documents"))
    // both sides are 1-row aggregates; pin the product as a broadcast
    // nested loop so planner drift can never shuffle it
    c.crossJoin(broadcast(d))
  }

  /** Usage metering (the engine-side of the reconstructed UsageStore):
    * per-tenant, per-month action counts derived from the audit log — the
    * audit table IS the usage ledger, no separate counter store.
    */
  def usageRollup(audit: DataFrame): DataFrame =
    audit.groupBy(col("organization_id"),
        date_format(col("timestamp"), "yyyy-MM").as("period"))
      .agg(
        count(when(col("action") === "SEARCH", 1)).as("n_searches"),
        count(when(col("action") === "INGEST", 1)).as("n_ingests"))

  /** S13: append event rows (events.go:53-63) — append-only parquet sink;
    * at scale partition by date.
    */
  def appendEvents(events: DataFrame, path: String): Unit =
    events.write.mode("append").parquet(path)

  /** S13: append audit rows (audit_log.go:109-120), partitioned by tenant. */
  def appendAudit(audit: DataFrame, path: String): Unit =
    audit.write.mode("append").partitionBy("organization_id").parquet(path)
}
