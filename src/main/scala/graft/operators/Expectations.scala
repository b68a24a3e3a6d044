package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations (the Deequ-shaped check suite a
  * 100 TB ingest gate needs): row-local predicates evaluate in ONE
  * aggregate pass over the table however many checks are declared;
  * uniqueness rides the two-phase exact-distinct shape (no per-key set
  * state); referential integrity is a broadcast-able left-anti count.
  * Every check lands in one long-format report row so the suite output is
  * bounded by the check count, never the data.
  *
  * The reference validates ad hoc at its handlers (e.g. payload shape in
  * vectordb.go); this makes the contract declarative and auditable for
  * the §2.12 pipeline north star.
  */
object Expectations {

  /** Row-local checks: each (name, predicate) pair is counted in a single
    * shared aggregation job — `n_violations` counts rows where the
    * predicate is NOT satisfied (null predicate = violation, the
    * conservative reading).
    */
  def rowChecks(df: DataFrame, checks: Seq[(String, Column)]): DataFrame = {
    require(checks.nonEmpty, "need at least one check")
    val aggs = count(lit(1)).as("__n") +:
      checks.map { case (name, pred) =>
        sum(when(coalesce(pred, lit(false)), 0L).otherwise(1L)).as(s"__v_$name")
      }
    val row = df.agg(aggs.head, aggs.tail: _*)
    val stacked = checks.map { case (name, _) =>
      struct(lit(name).as("check_name"), lit("row").as("kind"),
        col("__n").as("n_rows"), col(s"__v_$name").as("n_violations"))
    }
    row.select(explode(array(stacked: _*)).as("c")).select(col("c.*"))
      .withColumn("passed", col("n_violations") === 0L)
  }

  /** Uniqueness of a key tuple: violations = rows beyond the first per
    * duplicated key. Two map-side-combinable aggregates (the
    * [[ScaleOps.exactDistinctCount]] discipline) — no distinct-set state.
    */
  def uniqueCheck(df: DataFrame, name: String, keyCols: Seq[String]): DataFrame =
    df.groupBy(keyCols.map(col): _*).agg(count(lit(1)).as("__dup"))
      .agg(sum(col("__dup")).as("n_rows"),
        (sum(col("__dup")) - count(lit(1))).as("n_violations"))
      .select(lit(name).as("check_name"), lit("unique").as("kind"),
        coalesce(col("n_rows"), lit(0L)).as("n_rows"),
        coalesce(col("n_violations"), lit(0L)).as("n_violations"))
      .withColumn("passed", col("n_violations") === 0L)

  /** Referential integrity: child rows whose key tuple has no match in
    * `parent` (null child keys count as violations, matching the anti
    * join). Catalyst picks broadcast for a bounded parent side.
    */
  def refCheck(child: DataFrame, parent: DataFrame, name: String,
      childKeys: Seq[String], parentKeys: Seq[String]): DataFrame = {
    val p = parent.select(parentKeys.zip(childKeys).map {
      case (pk, ck) => col(pk).as(s"__p_$ck")
    }: _*).distinct()
    val cond = childKeys.map(ck => child(ck) === p(s"__p_$ck")).reduce(_ && _)
    val orphans = child.join(p, cond, "left_anti")
    val n = child.agg(count(lit(1))).collect()(0).getLong(0)
    orphans.agg(count(lit(1)).as("n_violations"))
      .select(lit(name).as("check_name"), lit("ref").as("kind"),
        lit(n).as("n_rows"), col("n_violations"))
      .withColumn("passed", col("n_violations") === 0L)
  }

  /** Union the report rows of any mix of check kinds. */
  def suite(reports: Seq[DataFrame]): DataFrame =
    reports.reduce(_.unionByName(_))

  /** Mergeable image of [[rowChecks]] — (n, per-check violation counts) as
    * plain longs, the streaming-twin currency (the momentsImage /
    * mergeBatchProfile pattern): images from micro-batches ADD, and
    * [[imageToReport]] of the merged image equals the batch [[rowChecks]]
    * bit-for-bit because both are the same integer sums.
    */
  def rowCheckImage(df: DataFrame, checks: Seq[(String, Column)]): RowCheckImage = {
    require(checks.nonEmpty, "need at least one check")
    val aggs = count(lit(1)).as("__n") +:
      checks.map { case (name, pred) =>
        sum(when(coalesce(pred, lit(false)), 0L).otherwise(1L)).as(s"__v_$name")
      }
    val r = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    val viol = checks.zipWithIndex.map { case ((name, _), i) =>
      name -> (if (r.isNullAt(i + 1)) 0L else r.getLong(i + 1))
    }
    RowCheckImage(r.getLong(0), scala.collection.immutable.ListMap(viol: _*))
  }

  final case class RowCheckImage(n: Long, violations: scala.collection.immutable.ListMap[String, Long]) {
    def merge(o: RowCheckImage): RowCheckImage = {
      require(violations.keySet == o.violations.keySet,
        "images declare different checks — not mergeable")
      RowCheckImage(n + o.n,
        violations.map { case (k, v) => k -> (v + o.violations(k)) })
    }
  }

  /** Replay a (merged) image as the long-format report [[rowChecks]]
    * emits. */
  def imageToReport(spark: org.apache.spark.sql.SparkSession,
      img: RowCheckImage): DataFrame = {
    import scala.jdk.CollectionConverters._
    val rows = img.violations.toSeq.map { case (name, v) =>
      org.apache.spark.sql.Row(name, "row", img.n, v, v == 0L)
    }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("check_name",
        org.apache.spark.sql.types.StringType, nullable = false),
      org.apache.spark.sql.types.StructField("kind",
        org.apache.spark.sql.types.StringType, nullable = false),
      org.apache.spark.sql.types.StructField("n_rows",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("n_violations",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("passed",
        org.apache.spark.sql.types.BooleanType, nullable = false)))
    spark.createDataFrame(new java.util.ArrayList(rows.asJava), schema)
  }
}
