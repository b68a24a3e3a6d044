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

  test("an EMPTY partitioned append must not brick the store: later reads " +
      "of every version keep working") {
    val root = freshRoot()
    val rows = Seq((1L, "a", "x"), (2L, "b", "y")).toDF("id", "part", "v")
    SnapshotStore.append(spark, root, rows, partitionBy = Seq("part"))
    // the empty-delta tick (e.g. an ingest with no new chunks): a
    // partitioned write of zero rows emits no parquet files — the store
    // must still read at this and every later version
    SnapshotStore.append(spark, root, rows.limit(0), partitionBy = Seq("part"))
    val v3 = SnapshotStore.append(spark, root,
      Seq((3L, "a", "z")).toDF("id", "part", "v"), partitionBy = Seq("part"))
    assert(v3 == 3)
    assert(SnapshotStore.read(spark, root).count() == 3)
    assert(SnapshotStore.read(spark, root, Some(2)).count() == 2)
    // partition pruning still works across the mixed dirs
    assert(SnapshotStore.read(spark, root)
      .filter(org.apache.spark.sql.functions.col("part") === "a").count() == 2)
  }

  test("partitioned compact fans each leaf across ~nFiles files instead " +
      "of funneling the table through one task") {
    val root = freshRoot()
    val rows = spark.range(400)
      .selectExpr("id", "CAST(id % 2 AS STRING) AS part", "CAST(id AS STRING) AS v")
    SnapshotStore.append(spark, root, rows, partitionBy = Seq("part"))
    SnapshotStore.compact(spark, root, nFiles = 4, partitionBy = Seq("part"))
    val dataRoot = new java.io.File(s"$root/data")
    val compactedDir = dataRoot.listFiles
      .filter(f => f.isDirectory && f.getName.startsWith("s2-")).head
    val leaf = new java.io.File(compactedDir, "part=0")
    val files = leaf.listFiles.count(_.getName.endsWith(".parquet"))
    assert(files > 1 && files <= 4,
      s"expected 2..4 files in the leaf (content-salted fanout), got $files")
    assert(SnapshotStore.read(spark, root).count() == 400)
  }

  test("partition-column type conflicts between dirs normalize to string " +
      "instead of failing the union") {
    val root = freshRoot()
    // dir 1: a non-numeric partition value infers STRING
    SnapshotStore.append(spark, root,
      Seq((1L, "acme", "x")).toDF("id", "part", "v"), partitionBy = Seq("part"))
    // dir 2: a numeric-looking value would infer INT on its own
    SnapshotStore.append(spark, root,
      Seq((2L, "123", "y")).toDF("id", "part", "v"), partitionBy = Seq("part"))
    val df = SnapshotStore.read(spark, root)
    assert(df.schema("part").dataType ==
      org.apache.spark.sql.types.StringType)
    assert(df.select("part").collect().map(_.getString(0)).toSet ==
      Set("acme", "123"))
  }

  /** Recursively list (relative path, length) of every data file under a
    * dir — the byte-identity fingerprint for the replace-commit gates.
    */
  private def fileSig(root: String, rel: String): Set[(String, Long)] = {
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val base = if (rel.isEmpty) new Path(root) else new Path(root, rel)
    val it = fs.listFiles(base, true)
    val out = scala.collection.mutable.Set.empty[(String, Long)]
    while (it.hasNext) {
      val s = it.next()
      if (s.getPath.getName.endsWith(".parquet"))
        out += ((s.getPath.toString.stripPrefix(base.toString),
          s.getLen))
    }
    out.toSet
  }

  test("replacePartitions rewrites ONLY the touched partitions: untouched " +
      "partition files are byte-identical (re-referenced, never rewritten), " +
      "pinned old versions still serve the old rows, and reads stay " +
      "partition-pruned") {
    val root = freshRoot()
    val v1 = SnapshotStore.overwrite(spark, root,
      (0L until 40L).map(i => (i, (i % 4).toInt, s"old$i")).toDF("id", "b", "v"),
      partitionBy = Seq("b"))
    assert(v1 == 1)
    val before = fileSig(root, "")
    // replace buckets 1 and 3 with 2 rows each
    val v2 = SnapshotStore.replacePartitions(spark, root,
      Seq((100L, 1, "new100"), (101L, 1, "new101"),
        (300L, 3, "new300"), (301L, 3, "new301")).toDF("id", "b", "v"), "b")
    assert(v2 == 2)
    // every pre-existing file is still on disk with identical length —
    // the commit ADDED a dir, it rewrote nothing
    val after = fileSig(root, "")
    assert(before.subsetOf(after), "replace must not rewrite any old file")
    // current version: untouched buckets keep their 10 rows each, touched
    // buckets hold exactly the replacement rows
    val cur = SnapshotStore.read(spark, root)
    assert(cur.count() == 24, s"10+10 untouched + 2+2 replaced, got ${cur.count()}")
    assert(cur.filter($"b" === 1).select("id").collect().map(_.getLong(0)).toSet
      == Set(100L, 101L))
    assert(cur.filter($"b" === 0).count() == 10)
    // pinned v1 still serves the old content in full
    assert(SnapshotStore.read(spark, root, Some(1)).count() == 40)
    // a partition predicate still reaches the scans as a PartitionFilter
    val explained = cur.where($"b" === 0).queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(explained.contains("PartitionFilters"),
      s"bucket filter did not reach the scan:\n$explained")
    // a second replace on bucket 1 drops the first replacement's rows
    val v3 = SnapshotStore.replacePartitions(spark, root,
      Seq((200L, 1, "newer")).toDF("id", "b", "v"), "b")
    assert(v3 == 3)
    val cur3 = SnapshotStore.read(spark, root)
    assert(cur3.filter($"b" === 1).select("id").collect().map(_.getLong(0)).toSet
      == Set(200L))
    assert(cur3.count() == 23)
  }

  test("replacePartitions dropPartitions removes a partition that the " +
      "rewrite emptied: its old rows vanish at the new version, survive at " +
      "the pinned one, and a malformed leaf name refuses loudly") {
    val root = freshRoot()
    SnapshotStore.overwrite(spark, root,
      (0L until 30L).map(i => (i, (i % 3).toInt, s"old$i")).toDF("id", "b", "v"),
      partitionBy = Seq("b"))
    // bucket 2's rewrite produced zero rows: a hive write cannot emit an
    // empty dir, so the commit must name it dropped explicitly
    val v2 = SnapshotStore.replacePartitions(spark, root,
      Seq((100L, 1, "new100")).toDF("id", "b", "v"), "b",
      dropPartitions = Set("b=2"))
    assert(v2 == 2)
    val cur = SnapshotStore.read(spark, root)
    assert(cur.filter($"b" === 2).isEmpty, "dropped partition must be empty")
    assert(cur.filter($"b" === 0).count() == 10, "untouched partition intact")
    assert(cur.filter($"b" === 1).count() == 1)
    assert(SnapshotStore.read(spark, root, Some(1)).filter($"b" === 2).count() == 10)
    val err = intercept[IllegalArgumentException] {
      SnapshotStore.replacePartitions(spark, root,
        Seq((7L, 0, "x")).toDF("id", "b", "v"), "b",
        dropPartitions = Set("c=2"))
    }
    assert(err.getMessage.contains("b=<value>"))
  }

  test("expireSnapshots keeps a data dir alive while any retained manifest " +
      "references any of its partition LEAVES") {
    val root = freshRoot()
    SnapshotStore.overwrite(spark, root,
      (0L until 20L).map(i => (i, (i % 2).toInt)).toDF("id", "b"),
      partitionBy = Seq("b"))
    SnapshotStore.replacePartitions(spark, root,
      Seq((100L, 0)).toDF("id", "b"), "b")
    // keepLast = 1 retains only v2, whose manifest references v1's dir via
    // the surviving b=1 LEAF — the dir must not be swept
    val (_, dDel) = SnapshotStore.expireSnapshots(spark, root, keepLast = 1)
    assert(dDel == 0, "leaf-referenced dir must survive expiry")
    val cur = SnapshotStore.read(spark, root)
    assert(cur.filter($"b" === 1).count() == 10)
    assert(cur.filter($"b" === 0).select("id").collect().map(_.getLong(0)).toSet
      == Set(100L))
  }

  test("dir tags are durable in the _tags sidecar: a tagged append's tag " +
      "survives expireSnapshots retiring its manifest (the streaming " +
      "replay-guard horizon)") {
    val root = freshRoot()
    SnapshotStore.append(spark, root, Seq((1L, "a")).toDF("id", "s"),
      dirTag = Some("b7"))
    SnapshotStore.compact(spark, root) // v2 references only the rewritten dir
    SnapshotStore.compact(spark, root) // v3
    SnapshotStore.expireSnapshots(spark, root, keepLast = 1)
    // the tagged dir and its manifests are gone…
    assert(!SnapshotStore.allCommittedDirs(spark, root).exists(_.contains("-b7-")))
    // …but the durable tag record remains
    assert(SnapshotStore.committedTags(spark, root).contains("b7"))
  }

  test("read with commitCol stamps each row with its data dir's commit " +
      "version; absentDefaults backfills columns older dirs lack") {
    val root = freshRoot()
    SnapshotStore.append(spark, root, Seq((1L, "a")).toDF("id", "s"))
    SnapshotStore.append(spark, root,
      Seq((2L, "b", "U")).toDF("id", "s", "op"))
    val df = SnapshotStore.read(spark, root, commitCol = Some("__commit"),
      absentDefaults = Seq("op" -> org.apache.spark.sql.functions.lit("U")))
    val rows = df.select("id", "__commit", "op").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    assert(rows == Set((1L, 1, "U"), (2L, 2, "U")))
  }

  test("nested-layout replacePartitions (round 11): a level-1 replace on a " +
      "(b, o) store carries BOTH dimensions in the rewrite dir, a level-2 " +
      "replace carries sibling tenants as deeper leaf refs, untouched files " +
      "are never rewritten, and both dimensions keep pruning") {
    import org.apache.spark.sql.functions.col
    val root = freshRoot()
    // 3 buckets × 2 orgs, 5 rows per (b, o) leaf
    val v1 = SnapshotStore.overwrite(spark, root,
      (0L until 30L).map(i => (i, (i % 3).toInt, (i % 2).toInt, s"old$i"))
        .toDF("id", "b", "o", "v"),
      partitionBy = Seq("b", "o"))
    assert(SnapshotStore.partitionLayout(spark, root) == Seq("b", "o"),
      "the store's own dirs must reveal the nested layout")
    val before = fileSig(root, "")
    // level-1 replace of bucket 1 (both orgs replaced together — the
    // refreshCells shape on a tenant store)
    val v2 = SnapshotStore.replacePartitions(spark, root,
      Seq((100L, 1, 0, "n0"), (101L, 1, 1, "n1")).toDF("id", "b", "o", "v"),
      "b", extraPartitionCols = Seq("o"))
    assert(v2 == v1 + 1)
    assert(before.subsetOf(fileSig(root, "")),
      "replace must not rewrite any old file")
    assert(SnapshotStore.partitionLayout(spark, root) == Seq("b", "o"),
      "the rewrite dir must preserve the tenant dimension")
    val cur = SnapshotStore.read(spark, root)
    assert(cur.count() == 22, s"10+10 untouched + 2 replaced, got ${cur.count()}")
    assert(cur.filter(col("b") === 1).select("id").collect()
      .map(_.getLong(0)).toSet == Set(100L, 101L))
    // both partition dimensions reach every scan as PartitionFilters
    val explained = cur.where(col("b") === 0 && col("o") === 1)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    val pf = explained.linesIterator.filter(_.contains("PartitionFilters")).toSeq
    assert(pf.nonEmpty && pf.forall(l => l.contains("b") && l.contains("o")),
      s"both dimensions must prune:\n$explained")
    // level-2 replace: ONLY (b=0, o=1); the sibling tenant (b=0, o=0)
    // must survive as a deeper leaf ref, untouched
    val v3 = SnapshotStore.replacePartitions(spark, root,
      Seq((200L, 0, 1, "nn")).toDF("id", "b", "o", "v"),
      "b", extraPartitionCols = Seq("o"), replaceLevels = 2)
    val cur3 = SnapshotStore.read(spark, root)
    assert(cur3.filter(col("b") === 0 && col("o") === 1).select("id")
      .collect().map(_.getLong(0)).toSet == Set(200L))
    assert(cur3.filter(col("b") === 0 && col("o") === 0).count() == 5,
      "sibling tenant in the same bucket must be untouched")
    assert(cur3.count() == 18, s"10 + 2 + 5 + 1, got ${cur3.count()}")
    val dirs = SnapshotStore.committedDirs(spark, root, Some(v3))
    assert(dirs.exists(e => e.split('/').length == 4 && e.endsWith("o=0")),
      s"v3 must reference the sibling tenant as a depth-2 leaf: $dirs")
    // pinned versions intact; expiry keeps dirs any retained ref names
    assert(SnapshotStore.read(spark, root, Some(v1)).count() == 30)
    assert(SnapshotStore.read(spark, root, Some(v2)).count() == 22)
    val (_, dDel) = SnapshotStore.expireSnapshots(spark, root, keepLast = 1)
    assert(dDel == 0, "deep-leaf-referenced dirs must survive expiry")
    assert(SnapshotStore.read(spark, root).count() == 18)
    // dropPartitions at the wrong depth refuses loudly
    val err = intercept[IllegalArgumentException] {
      SnapshotStore.replacePartitions(spark, root,
        Seq((1L, 0, 0, "x")).toDF("id", "b", "o", "v"),
        "b", extraPartitionCols = Seq("o"), replaceLevels = 2,
        dropPartitions = Set("b=2"))
    }
    assert(err.getMessage.contains("b=<value>/o=<value>"))
  }

  test("mayContainPartition (round 12, r11 ADVICE): a Spark-job-free probe " +
      "that is exactly false on partitioned stores without the value, true " +
      "once any commit carries it, version-pinned, and conservative (true) " +
      "on non-partitioned dirs") {
    import org.apache.spark.sql.functions.col
    val root = freshRoot()
    val v1 = SnapshotStore.append(spark, root,
      Seq((1L, 0, "a"), (2L, 1, "b")).toDF("id", "b", "v"),
      partitionBy = Seq("b"))
    assert(!SnapshotStore.mayContainPartition(spark, root, "b", "-1"))
    assert(SnapshotStore.mayContainPartition(spark, root, "b", "0"))
    assert(SnapshotStore.mayContainPartition(spark, root, "b", "1"))
    // a tombstone-style commit flips the probe at the new version only
    val v2 = SnapshotStore.append(spark, root,
      Seq((1L, -1, "t")).toDF("id", "b", "v"), partitionBy = Seq("b"))
    assert(SnapshotStore.mayContainPartition(spark, root, "b", "-1"))
    assert(!SnapshotStore.mayContainPartition(spark, root, "b", "-1", Some(v1)),
      "the pinned old version must still answer from ITS entry set")
    // an overwrite that folds the tombstones away flips it back
    val v3 = SnapshotStore.overwrite(spark, root,
      Seq((1L, 0, "a"), (2L, 1, "b")).toDF("id", "b", "v"),
      partitionBy = Seq("b"))
    assert(!SnapshotStore.mayContainPartition(spark, root, "b", "-1"))
    assert(SnapshotStore.mayContainPartition(spark, root, "b", "-1", Some(v2)))
    // leaf refs (replacePartitions manifests) answer from their own path
    SnapshotStore.replacePartitions(spark, root,
      Seq((9L, 0, "z")).toDF("id", "b", "v"), "b")
    assert(!SnapshotStore.mayContainPartition(spark, root, "b", "-1"))
    assert(SnapshotStore.mayContainPartition(spark, root, "b", "1"),
      "the untouched partition survives as a ref the probe must see")
    // non-partitioned dirs (the zero-row empty-append guard) answer TRUE —
    // conservative, never wrong-to-fold
    val root2 = freshRoot()
    SnapshotStore.append(spark, root2,
      Seq((1L, 0, "a")).toDF("id", "b", "v").filter(col("id") < 0),
      partitionBy = Seq("b"))
    assert(SnapshotStore.mayContainPartition(spark, root2, "b", "-1"))
    // nested layouts: the level-1 probe sees through (b, o) chains
    val root3 = freshRoot()
    SnapshotStore.append(spark, root3,
      Seq((1L, 2, 7, "a")).toDF("id", "b", "o", "v"),
      partitionBy = Seq("b", "o"))
    assert(!SnapshotStore.mayContainPartition(spark, root3, "b", "-1"))
    assert(SnapshotStore.mayContainPartition(spark, root3, "b", "2"))
    assert(SnapshotStore.mayContainPartition(spark, root3, "o", "7"),
      "a level-2 column probes through the level-1 chain")
    assert(!SnapshotStore.mayContainPartition(spark, root3, "o", "8"))
    // fresh root: nothing committed, nothing possible
    assert(!SnapshotStore.mayContainPartition(spark, freshRoot(), "b", "-1"))
  }

  test("discardVersion (round 12, VERDICT r11 task 4): undoing the newest " +
      "commit restores the prior version with untouched files byte-" +
      "identical, removes only the discarded commit's dirs, and refuses " +
      "non-current versions") {
    import org.apache.spark.sql.functions.col
    val root = freshRoot()
    val v1 = SnapshotStore.append(spark, root,
      Seq((1L, 0, "a"), (2L, 1, "b")).toDF("id", "b", "v"),
      partitionBy = Seq("b"))
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def files(): Map[String, Long] = {
      val it = fs.listFiles(new org.apache.hadoop.fs.Path(root), true)
      val out = scala.collection.mutable.Map.empty[String, Long]
      while (it.hasNext) {
        val s = it.next()
        if (s.getPath.getName.endsWith(".parquet"))
          out += (s.getPath.toString -> s.getLen)
      }
      out.toMap
    }
    val baseFiles = files()
    val v2 = SnapshotStore.append(spark, root,
      Seq((3L, 0, "c")).toDF("id", "b", "v"), partitionBy = Seq("b"))
    assert(SnapshotStore.read(spark, root).count() == 3)
    // a stale version refuses: only the CURRENT commit can be discarded
    val err = intercept[IllegalArgumentException] {
      SnapshotStore.discardVersion(spark, root, v1)
    }
    assert(err.getMessage.contains("not the current version"))
    SnapshotStore.discardVersion(spark, root, v2)
    // prior version is current again and serves exactly its rows
    assert(SnapshotStore.currentVersion(spark, root).contains(v1))
    assert(SnapshotStore.read(spark, root)
      .select(col("id")).collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L))
    // v1's files untouched byte-for-byte; v2's data dirs gone
    val afterFiles = files()
    assert(afterFiles == baseFiles,
      s"discard must restore the exact v1 file set: ${afterFiles.keySet diff baseFiles.keySet}")
    // the store keeps working: a fresh append reuses the freed version slot
    val v3 = SnapshotStore.append(spark, root,
      Seq((4L, 1, "d")).toDF("id", "b", "v"), partitionBy = Seq("b"))
    assert(v3 == v2 && SnapshotStore.read(spark, root).count() == 3)
  }
}
