package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * One parquet file per table under `sfDir`. All query functions take the
  * `sfDir` so the same code runs at any scale factor; at cluster scale the
  * same layout generalizes to partitioned parquet/table directories.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    if (name == "events") {
      // events.ts has shipped as TIMESTAMP(NANOS) (which Spark rejects by
      // default — read nanos as long, truncate to micros with integer
      // division; double division would lose precision on ~1.7e18 ns epoch
      // values) and as TIMESTAMP(MICROS, isAdjustedToUTC=false) (which Spark
      // reads as TIMESTAMP_NTZ — cast to the session-zone TIMESTAMP; sessions
      // here pin spark.sql.session.timeZone=UTC, so the naive wall clock is
      // interpreted exactly like DuckDB's epoch_ms over the same file).
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(s"$sfDir/$name.parquet")
      raw.schema("ts").dataType match {
        case LongType => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
        case _ => raw
      }
    } else spark.read.parquet(s"$sfDir/$name.parquet")
  }

  /** Register every table as a temp view (for spark.sql users). */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => apply(spark, sfDir, n).createOrReplaceTempView(n))
}
