package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Incremental ingest end-to-end: first run ingests, re-run is a no-op,
  * file modification re-ingests under the same chunk ids.
  */
class PipelineSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("runIngestOnce: new → skip → update lifecycle, idempotent ids") {
    val in = Files.createTempDirectory("graft-pipe-in")
    val wh = Files.createTempDirectory("graft-pipe-wh").toString
    Files.write(in.resolve("a.txt"),
      "This file contains CONFIDENTIAL numbers. And more sentences follow here.".getBytes)
    Files.write(in.resolve("b.md"), "A benign document about merges.".getBytes)
    Files.write(in.resolve("skip.tmp"), "temp".getBytes)

    // run 1: everything new
    val r1 = Pipeline.runIngestOnce(spark, in.toString, wh,
      organizationId = "org1", chunkSize = 40, overlap = 10, dim = 8)
    assert(r1.nFiles == 2 && r1.nNew == 2 && r1.nUpdated == 0 && r1.nSkipped == 0)
    assert(r1.nChunks > 2)
    assert(r1.nAlerts == 1)
    val chunks1 = spark.read.parquet(s"$wh/chunks")
    assert(chunks1.count() == r1.nChunks)

    // run 2: unchanged input → all skipped, nothing written
    val r2 = Pipeline.runIngestOnce(spark, in.toString, wh,
      organizationId = "org1", chunkSize = 40, overlap = 10, dim = 8)
    assert(r2.nNew == 0 && r2.nUpdated == 0 && r2.nSkipped == 2)
    assert(r2.nChunks == 0 && r2.nAlerts == 0)
    assert(spark.read.parquet(s"$wh/chunks").count() == r1.nChunks)

    // run 3: modify one file → exactly one update, same id space
    Files.write(in.resolve("b.md"), "A benign document about merges. Now extended.".getBytes)
    val r3 = Pipeline.runIngestOnce(spark, in.toString, wh,
      organizationId = "org1", chunkSize = 40, overlap = 10, dim = 8)
    assert(r3.nNew == 0 && r3.nUpdated == 1 && r3.nSkipped == 1)
    assert(r3.nChunks > 0)
    val all = spark.read.parquet(s"$wh/chunks")
    // append landing keeps both versions; latest state = dedup by id on read
    // (a transactional format would MERGE); ids for unchanged prefix match:
    val bIds = all.filter(col("metadata")("filename") === "b.md")
      .select("id").distinct().count()
    assert(bIds >= 1)
    // events recorded for new + update
    val events = spark.read.parquet(s"$wh/events")
    assert(events.filter(col("event_type") === "new").count() == 2)
    assert(events.filter(col("event_type") === "update").count() == 1)
    // alerts table has exactly the confidential doc
    val alerts = spark.read.parquet(s"$wh/alerts")
    assert(alerts.count() == 1)
    assert(alerts.head().getAs[String]("document_name") == "a.txt")
  }
}
