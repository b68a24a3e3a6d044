package graft

import graft.operators.{Merge, TableDiff}
import graft.sources.Manifest
import graft.streaming.StreamingMerge
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end warehouse change lifecycle — the round-7 CDC family
  * composed: nightly snapshot N and N+1 diffed (TableDiff), the diff
  * converted to a versioned changeset, streamed through the
  * merge-on-read store (StreamingMerge) in micro-batches, compacted,
  * and the resolved state laid out with a skipping manifest — with the
  * invariant checked at every step: resolved state ≡ snapshot N+1.
  */
class WarehouseLifecycleSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def snapshotN: DataFrame =
    (1L to 500L).map(k => (k, s"v$k", k % 13)).toDF("k", "v", "g")

  private def snapshotN1: DataFrame =
    ((1L to 500L).filterNot(_ % 17 == 0) // deletes
      .map(k => (k, if (k % 5 == 0) s"v$k-upd" else s"v$k", k % 13)) ++
      (501L to 530L).map(k => (k, s"new$k", k % 13))) // inserts
      .toDF("k", "v", "g")

  private def snap(df: DataFrame): Seq[(Long, String, Long)] =
    df.orderBy("k").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq

  test("diff → changeset → streamed merge → compaction ≡ snapshot N+1") {
    val store = java.nio.file.Files
      .createTempDirectory("graft-lifecycle").toString + "/store"

    // 1. the diff knows exactly what changed
    val d = TableDiff.diff(snapshotN, snapshotN1, Seq("k"), Seq("v", "g"))
    val classes = d.groupBy("change").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(classes("added") == 30)
    assert(classes("removed") == (1L to 500L).count(_ % 17 == 0))
    // every changed row names column v (g = k%13 never changes)
    assert(d.filter(col("change") === "changed")
      .filter(col("changed_columns") =!= "v").count() == 0)

    // 2. diff → versioned changeset (upserts carry the N+1 row)
    val changes = d.join(snapshotN1, Seq("k"), "left")
      .select(col("k"),
        coalesce(col("v"), lit("")).as("v"),
        coalesce(col("g"), lit(0L)).as("g"),
        lit(1L).as("version"),
        when(col("change") === "removed", lit("delete"))
          .otherwise(lit("upsert")).as("op"))

    // 3. stream it through the merge store in 3 uneven micro-batches,
    //    base-lining snapshot N first
    StreamingMerge.appendBatch(
      snapshotN.withColumn("version", lit(0L))
        .withColumn("op", lit("upsert")), store, 0L)
    val parts = Seq(changes.limit(40), changes.offset(40).limit(100),
      changes.offset(140))
    parts.zipWithIndex.foreach { case (b, i) =>
      StreamingMerge.appendBatch(b, store, (i + 1).toLong)
    }
    val resolved = StreamingMerge.currentState(
      spark, store, Seq("k"), "version", "op")
    assert(snap(resolved) == snap(snapshotN1), "merge-on-read state drifted")

    // 4. compaction preserves the state and clears the log
    StreamingMerge.compact(spark, store, Seq("k"), "version", "op")
    val compacted = StreamingMerge.currentState(
      spark, store, Seq("k"), "version", "op")
    assert(snap(compacted) == snap(snapshotN1), "compaction drifted")

    // 5. the resolved state laid out with a skipping manifest: a narrow
    //    key range reads a strict file subset and the right rows
    val servePath = store + "-serving"
    Manifest.writeWithManifest(compacted, servePath, Seq("k"), nFiles = 6)
    val (slice, rep) = Manifest.readSkipping(spark, servePath, "k", 100L, 140L)
    assert(rep.filesRead < rep.filesTotal && !rep.stale)
    val expect = snap(snapshotN1).filter(r => r._1 >= 100L && r._1 <= 140L)
    assert(snap(slice) == expect)

    // 6. and the round-trip diff of the served state vs N+1 is empty
    assert(TableDiff.diff(compacted, snapshotN1, Seq("k"), Seq("v", "g"))
      .count() == 0)
  }

  test("a second day of changes replays incrementally on the compacted base") {
    val store = java.nio.file.Files
      .createTempDirectory("graft-lifecycle2").toString + "/store"
    StreamingMerge.appendBatch(
      snapshotN1.withColumn("version", lit(0L))
        .withColumn("op", lit("upsert")), store, 0L)
    StreamingMerge.compact(spark, store, Seq("k"), "version", "op")
    // day-2 changes: touch 10 keys, delete 2
    val day2 = (Seq((3L, "day2", 3L, 1L, "upsert"),
      (8L, "day2", 8L, 1L, "upsert"),
      (14L, "", 0L, 1L, "delete")))
      .toDF("k", "v", "g", "version", "op")
    StreamingMerge.appendBatch(day2, store, 1L)
    val state = StreamingMerge.currentState(
      spark, store, Seq("k"), "version", "op")
    val m = snap(state).map(r => r._1 -> r._2).toMap
    assert(m(3L) == "day2" && m(8L) == "day2")
    assert(!m.contains(14L))
    assert(m(4L) == "v4") // untouched carryover
  }
}
