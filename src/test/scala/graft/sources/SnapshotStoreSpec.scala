package graft.sources

import graft.SparkTestBase
import org.apache.hadoop.fs.Path
import org.scalatest.funsuite.AnyFunSuite

/** The manifest-pointer protocol's contracts: reader isolation across a
  * compaction, loud refusal on a concurrent commit race, time travel while
  * retained, and garbage collection of expired snapshots + orphans.
  */
class SnapshotStoreSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def freshRoot(): String =
    java.nio.file.Files.createTempDirectory("graft-snap").toString

  test("append/read roundtrip with time travel to a retained version") {
    val root = freshRoot()
    val v1 = SnapshotStore.append(spark, root,
      Seq((1L, "a"), (2L, "b")).toDF("id", "s"))
    val v2 = SnapshotStore.append(spark, root, Seq((3L, "c")).toDF("id", "s"))
    assert(v1 == 1 && v2 == 2)
    assert(SnapshotStore.read(spark, root).count() == 3)
    assert(SnapshotStore.read(spark, root, Some(1)).count() == 2)
    assert(SnapshotStore.currentVersion(spark, root).contains(2))
  }

  test("a reader opened before a compaction still reads its snapshot") {
    val root = freshRoot()
    SnapshotStore.append(spark, root, (1L to 10L).map((_, "x")).toDF("id", "s"))
    SnapshotStore.append(spark, root, (11L to 20L).map((_, "y")).toDF("id", "s"))
    val reader = SnapshotStore.read(spark, root) // resolves v2's dirs NOW
    val v3 = SnapshotStore.compact(spark, root, nFiles = 1)
    assert(v3 == 3)
    // the compaction rewrote everything into a new dir and moved the
    // pointer — but the dirs the open reader resolved are immutable and
    // still on disk, so it reads ITS snapshot, not absence or a mix
    assert(reader.count() == 20)
    assert(SnapshotStore.read(spark, root).count() == 20)
    assert(SnapshotStore.versions(spark, root) == Seq(1, 2, 3))
  }

  test("a concurrent commit to the same next version refuses loudly") {
    val root = freshRoot()
    SnapshotStore.append(spark, root, Seq((1L, "a")).toDF("id", "s"))
    // another writer wins the race to v2
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val stolen = new Path(root, "_manifests/v00000002.manifest")
    val out = fs.create(stolen, false)
    out.write("data/s2-stolen\n".getBytes("UTF-8")); out.close()
    // this writer planned against v1 (expectedBase) — its commit targets
    // v2 and must collide with the winner, not silently rebase onto data
    // it never validated against
    val e = intercept[java.io.IOException] {
      SnapshotStore.append(spark, root, Seq((2L, "b")).toDF("id", "s"),
        expectedBase = Some(1))
    }
    assert(e.getMessage.contains("concurrent writer"))
    // the loser's data dir is an unreferenced orphan, nothing was clobbered
    fs.delete(stolen, false)
    assert(SnapshotStore.currentVersion(spark, root).contains(1))
    assert(SnapshotStore.read(spark, root).count() == 1)
  }

  test("expireSnapshots retires old versions and sweeps unreferenced dirs") {
    val root = freshRoot()
    SnapshotStore.append(spark, root, Seq((1L, "a")).toDF("id", "s"))
    SnapshotStore.append(spark, root, Seq((2L, "b")).toDF("id", "s"))
    SnapshotStore.compact(spark, root, nFiles = 1)
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    // plant a lost-race orphan (version <= current: its commit lost to
    // someone else's v2) and an IN-FLIGHT writer's dir (version =
    // current + 1: its parquet write is running, manifest not yet
    // committed) — expire must sweep the former and never the latter
    fs.mkdirs(new Path(root, "data/s2-orphan"))
    fs.mkdirs(new Path(root, "data/s4-inflight"))
    val (mDel, dDel) = SnapshotStore.expireSnapshots(spark, root, keepLast = 1)
    assert(mDel == 2, "v1 and v2 manifests retired")
    // v1's and v2's data dirs are unreferenced by v3 (compact rewrote),
    // plus the planted lost-race orphan; the in-flight dir survives
    assert(dDel == 3, s"expected 3 swept dirs, got $dDel")
    assert(fs.exists(new Path(root, "data/s4-inflight")),
      "expire swept an in-flight writer's data dir")
    assert(!fs.exists(new Path(root, "data/s2-orphan")),
      "expire left a lost-race orphan behind")
    assert(SnapshotStore.read(spark, root).count() == 2)
    intercept[IllegalArgumentException] {
      SnapshotStore.read(spark, root, Some(1))
    }
  }
}
