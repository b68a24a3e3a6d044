package graft.sources

import graft.SparkTestBase
import graft.streaming.StreamingMerge
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Versioned-commit warehouse lifecycle (round 9, VERDICT r8 task 3): the
  * chunks table as a SnapshotStore root — a read racing a compaction keeps
  * its pinned version, time travel reaches retained history, tenant
  * partitioning survives inside every snapshot, and the streaming-merge
  * fold publishes base versions the same way.
  */
class WarehouseLifecycleSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def chunk(id: String, org: String, doc: String, content: String) =
    (id, doc, content, 0, s"2024-01-0${1 + id.length % 8}", org)

  private def chunksDf(rows: (String, String, String, Int, String, String)*) = {
    import spark.implicits._
    rows.toSeq.toDF("id", "document_id", "content", "chunk_index",
      "created_at", "organization_id")
  }

  test("read racing a compaction: pinned version survives; time travel " +
      "reaches the pre-compaction snapshot; expire retires it loudly") {
    val root = java.nio.file.Files.createTempDirectory("graft-wlc").toString
    val v1 = Warehouse.writeChunksVersioned(spark,
      chunksDf(chunk("a1", "acme", "d1", "alpha"),
        chunk("b1", "beta", "d2", "bravo")), root)
    val v2 = Warehouse.writeChunksVersioned(spark,
      chunksDf(chunk("a2", "acme", "d1", "charlie")), root)
    assert(v1 == 1 && v2 == 2)

    // reader opens BEFORE the compaction and pins v2's manifest
    val pinned = Warehouse.readChunksVersioned(spark, root)
    val before = pinned.select("id").collect().map(_.getString(0)).toSet
    assert(before == Set("a1", "b1", "a2"))

    val v3 = Warehouse.compactChunksVersioned(spark, root)
    assert(v3 == 3)

    // the pinned reader still reads ITS dirs — same rows, mid-compaction
    // or after, because the old data dirs are never touched
    assert(pinned.select("id").collect().map(_.getString(0)).toSet == before)
    // fresh reads resolve the compacted version with identical content
    assert(Warehouse.readChunksVersioned(spark, root)
      .select("id").collect().map(_.getString(0)).toSet == before)
    // time travel: v1 predates the second append
    assert(Warehouse.readChunksVersioned(spark, root, Some(1))
      .select("id").collect().map(_.getString(0)).toSet == Set("a1", "b1"))

    // tenant partitioning survives the snapshot layout: the org predicate
    // prunes to the tenant's rows and the partition column reads back
    val acme = Warehouse.readChunksVersioned(spark, root)
      .filter(col("organization_id") === "acme")
    assert(acme.select("id").collect().map(_.getString(0)).toSet == Set("a1", "a2"))

    // retire history: only the compacted version remains readable
    SnapshotStore.expireSnapshots(spark, root, keepLast = 1)
    assert(Warehouse.readChunksVersioned(spark, root)
      .select("id").collect().map(_.getString(0)).toSet == before)
    intercept[IllegalArgumentException] {
      Warehouse.readChunksVersioned(spark, root, Some(1)).collect()
    }
  }

  test("writeChunksVersioned is idempotent per commit and collides loudly " +
      "on a stale expectedBase") {
    val root = java.nio.file.Files.createTempDirectory("graft-wlc2").toString
    Warehouse.writeChunksVersioned(spark,
      chunksDf(chunk("x1", "acme", "d1", "one"),
        chunk("x1", "acme", "d1", "one-dup")), root)
    // dropDuplicates("id") landed a single row
    assert(Warehouse.readChunksVersioned(spark, root).count() == 1)
    // a writer that planned against version 0 after someone committed v1
    // must fail, not silently rebase
    intercept[java.io.IOException] {
      Warehouse.writeChunksVersioned(spark,
        chunksDf(chunk("x2", "acme", "d1", "two")), root,
        expectedBase = Some(0))
    }
    assert(Warehouse.readChunksVersioned(spark, root).count() == 1)
  }

  test("StreamingMerge.compactVersioned: fold publishes a base version; " +
      "pinned readers and time travel survive; re-fold is idempotent") {
    import spark.implicits._
    val store = java.nio.file.Files.createTempDirectory("graft-wlc3").toString
    val keys = Seq("k")
    def log(batchId: Long, rows: (String, Long, String, String)*): Unit =
      StreamingMerge.appendBatch(
        rows.toSeq.toDF("k", "v", "payload", "op"), store, batchId)

    log(0L, ("k1", 1L, "p1", "upsert"), ("k2", 1L, "q1", "upsert"))
    val folded1 = StreamingMerge.compactVersioned(
      spark, store, keys, "v", "op")
    assert(folded1.contains(1))
    // changelog is gone; the state reads purely from the base snapshot
    assert(StreamingMerge.currentStateVersioned(spark, store, keys, "v", "op")
      .select("k", "payload").as[(String, String)].collect().toSet ==
      Set(("k1", "p1"), ("k2", "q1")))

    // a reader resolves base v1 and keeps it across the next fold
    val pinned = StreamingMerge.currentStateVersioned(
      spark, store, keys, "v", "op", version = Some(1))

    log(1L, ("k1", 2L, "p2", "upsert"), ("k2", 2L, null, "delete"))
    val folded2 = StreamingMerge.compactVersioned(
      spark, store, keys, "v", "op")
    assert(folded2.contains(2))
    assert(StreamingMerge.currentStateVersioned(spark, store, keys, "v", "op")
      .select("k", "payload").as[(String, String)].collect().toSet ==
      Set(("k1", "p2")))
    // the pinned pre-fold view is intact (old base dirs never touched)
    assert(pinned.select("k", "payload").as[(String, String)].collect().toSet ==
      Set(("k1", "p1"), ("k2", "q1")))
    // time travel re-resolves the retained v1
    assert(StreamingMerge.currentStateVersioned(
      spark, store, keys, "v", "op", version = Some(1))
      .select("k", "payload").as[(String, String)].collect().toSet ==
      Set(("k1", "p1"), ("k2", "q1")))

    // nothing to fold → None, state unchanged
    assert(StreamingMerge.compactVersioned(spark, store, keys, "v", "op").isEmpty)

    // crash-window replay: the changelog survived a fold (deleted AFTER
    // the commit); re-folding the same changes reproduces the same winners
    log(2L, ("k1", 2L, "p2", "upsert"))
    val refolded = StreamingMerge.compactVersioned(spark, store, keys, "v", "op")
    assert(refolded.contains(3))
    assert(StreamingMerge.currentStateVersioned(spark, store, keys, "v", "op")
      .select("k", "payload").as[(String, String)].collect().toSet ==
      Set(("k1", "p2")))
  }
}
