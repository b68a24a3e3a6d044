package graft.streaming

import graft.{SparkTestBase, Tables}
import graft.operators.GraphAnn
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Continuous graph-index upsert (round 11): per-batch corpus + graph
  * delta commits with per-store replay guards, semantic equality to the
  * direct appendNodesToStore sequence, crash-window composition, and
  * serving through the fully-bucketed search path mid-stream.
  */
class StreamingGraphIndexSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val sf = "/root/testdata/sf0.01"
  private lazy val emb = Tables(spark, sf, "embeddings")

  private def edgesOf(root: String): Set[(Long, Long)] =
    GraphAnn.readGraphStoreLatest(spark, root)
      .select(col("src").cast("long"), col("dst").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  private def freshStores(base: org.apache.spark.sql.DataFrame,
      cfg: StreamingGraphIndex.Config): (String, String) = {
    val dir = java.nio.file.Files.createTempDirectory("graft-sgi")
    val graphRoot = s"$dir/g"
    val vectorRoot = s"$dir/v"
    GraphAnn.writeVectorStore(spark, vectorRoot, base, "vec_id",
      nBuckets = cfg.idBuckets)
    GraphAnn.writeGraphStore(spark, graphRoot,
      GraphAnn.buildGraph(base, "vec_id", "embedding", m = cfg.m),
      nBuckets = cfg.nBuckets)
    (graphRoot, vectorRoot)
  }

  test("per-batch corpus + graph deltas accumulate; the result equals the " +
      "direct appendNodesToStore sequence; replays of either leg are " +
      "no-ops; new nodes serve through the fully-bucketed search") {
    val cfg = StreamingGraphIndex.Config(
      m = 8, maxDegree = 24, nBuckets = 16, idBuckets = 8)
    val base = emb.filter(col("vec_id") < 300)
      .select(col("vec_id"), col("embedding"))
    val b0 = emb.filter(col("vec_id") >= 300 && col("vec_id") < 306)
      .select(col("vec_id"), col("embedding"))
    val b1 = emb.filter(col("vec_id") >= 306 && col("vec_id") < 310)
      .select(col("vec_id"), col("embedding"))
    val (graphRoot, vectorRoot) = freshStores(base, cfg)

    assert(StreamingGraphIndex.processBatch(
      spark, b0, 0L, graphRoot, vectorRoot, "vec_id", "embedding", cfg).nonEmpty)
    assert(GraphAnn.readVectorStoreLatest(spark, vectorRoot, "vec_id")
      .count() == 306)
    assert(StreamingGraphIndex.processBatch(
      spark, b1, 1L, graphRoot, vectorRoot, "vec_id", "embedding", cfg).nonEmpty)
    assert(GraphAnn.readVectorStoreLatest(spark, vectorRoot, "vec_id")
      .count() == 310)
    val streamed = edgesOf(graphRoot)
    // every new node is navigable (has out-edges in the live graph)
    (300L until 310L).foreach(id =>
      assert(streamed.exists(_._1 == id), s"node $id must be linked"))

    // equality with the DIRECT sequence (same batches, same knobs, flat
    // corpus frames): the streaming wrapper adds replay plumbing, not
    // semantics
    val (gr2, vr2) = freshStores(base, cfg)
    GraphAnn.upsertToVectorStore(spark, vr2, b0, "vec_id", cfg.idBuckets)
    GraphAnn.appendNodesToStore(spark, gr2,
      GraphAnn.readVectorStoreLatest(spark, vr2, "vec_id")
        .join(b0.select(col("vec_id")), Seq("vec_id"), "left_anti"),
      b0, "vec_id", "embedding", m = cfg.m, maxDegree = cfg.maxDegree,
      nBuckets = cfg.nBuckets, idBuckets = Some(cfg.idBuckets))
    GraphAnn.upsertToVectorStore(spark, vr2, b1, "vec_id", cfg.idBuckets)
    GraphAnn.appendNodesToStore(spark, gr2,
      GraphAnn.readVectorStoreLatest(spark, vr2, "vec_id")
        .join(b1.select(col("vec_id")), Seq("vec_id"), "left_anti"),
      b1, "vec_id", "embedding", m = cfg.m, maxDegree = cfg.maxDegree,
      nBuckets = cfg.nBuckets, idBuckets = Some(cfg.idBuckets))
    assert(edgesOf(gr2) == streamed,
      "streamed graph must equal the direct append sequence")

    // replays: both legs committed -> full no-op, stores unchanged
    val vBefore = graft.sources.SnapshotStore.currentVersion(spark, vectorRoot)
    val gBefore = graft.sources.SnapshotStore.currentVersion(spark, graphRoot)
    assert(StreamingGraphIndex.processBatch(
      spark, b1, 1L, graphRoot, vectorRoot, "vec_id", "embedding", cfg).isEmpty)
    assert(graft.sources.SnapshotStore.currentVersion(spark, vectorRoot) == vBefore)
    assert(graft.sources.SnapshotStore.currentVersion(spark, graphRoot) == gBefore)
    assert(edgesOf(graphRoot) == streamed)

    // serving mid-stream: the fully-bucketed path returns a new node's
    // nearest neighbors for its own vector, and the new node appears as a
    // neighbor of whatever its beam linked it to
    val q = emb.filter(col("vec_id") === 305)
      .select(col("vec_id").as("q_id"), col("embedding").as("qv"))
    val hits = GraphAnn.searchMany(
      GraphAnn.readGraphStoreLatest(spark, graphRoot),
      GraphAnn.readVectorStoreLatest(spark, vectorRoot, "vec_id"),
      q, "q_id", "qv", "vec_id", "embedding",
      k = 5, beamWidth = 24, maxHops = 12, nSeeds = 4,
      srcBuckets = Some(cfg.nBuckets), idBuckets = Some(cfg.idBuckets))
      .collect()
    assert(hits.length == 5, "the streamed store must serve k results")
    assert(hits.forall(_.getLong(0) == 305L))
  }

  test("re-ingest (round 12, r11 ADVICE): a batch carrying an EXISTING id " +
      "replaces its vector — exactly one live corpus row, the new vector " +
      "served, the node's edges re-derived from the new vector, and the " +
      "distributed/local search twins stay identical; insert-only mode " +
      "refuses the same batch loudly") {
    val cfg = StreamingGraphIndex.Config(
      m = 8, maxDegree = 24, nBuckets = 16, idBuckets = 8)
    val base = emb.filter(col("vec_id") < 200)
      .select(col("vec_id"), col("embedding"))
    val (graphRoot, vectorRoot) = freshStores(base, cfg)
    // id 7 re-ingested with a DIFFERENT vector (id 150's embedding — a
    // deterministic stand-in for an edited document's new embedding)
    val newVec = emb.filter(col("vec_id") === 150).select(col("embedding"))
      .crossJoin(emb.filter(col("vec_id") === 7).select(col("vec_id")))
      .select(col("vec_id"), col("embedding"))
    assert(StreamingGraphIndex.processBatch(
      spark, newVec, 0L, graphRoot, vectorRoot, "vec_id", "embedding",
      cfg).nonEmpty)
    val live = GraphAnn.readVectorStoreLatest(spark, vectorRoot, "vec_id")
    assert(live.count() == 200, "re-ingest must not grow the corpus")
    val row7 = live.filter(col("vec_id") === 7).collect()
    assert(row7.length == 1, "exactly one live row for the re-ingested id")
    val served = row7.head.getAs[scala.collection.Seq[Float]]("embedding")
    val expected = emb.filter(col("vec_id") === 150)
      .collect().head.getAs[scala.collection.Seq[Float]]("embedding")
    assert(served == expected, "the NEW vector must be served")
    // the node's out-edges were re-derived: its new top neighbors score
    // against the new vector (its beam ran with the replacement)
    assert(edgesOf(graphRoot).exists(_._1 == 7L), "node 7 stays navigable")
    // twins agree over the latest view (the ADVICE divergence scenario)
    val q = newVec.select(col("vec_id").as("q_id"), col("embedding").as("qv"))
    def hitsOf(small: Int) = GraphAnn.searchMany(
      GraphAnn.readGraphStoreLatest(spark, graphRoot),
      GraphAnn.readVectorStoreLatest(spark, vectorRoot, "vec_id"),
      q, "q_id", "qv", "vec_id", "embedding",
      k = 5, beamWidth = 24, maxHops = 12, nSeeds = 4,
      srcBuckets = Some(cfg.nBuckets), idBuckets = Some(cfg.idBuckets),
      smallBatchBound = small)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(hitsOf(0) == hitsOf(64),
      "distributed and driver-hosted twins must agree after re-ingest")
    // insert-only mode: the same pre-existing id refuses loudly
    val (gr3, vr3) = freshStores(base, cfg)
    val strict = cfg.copy(upsert = false)
    val err = intercept[IllegalArgumentException] {
      StreamingGraphIndex.processBatch(
        spark, newVec, 0L, gr3, vr3, "vec_id", "embedding", strict)
    }
    assert(err.getMessage.contains("pre-existing"))
    // while genuinely-new ids still append fine in insert-only mode
    val fresh = emb.filter(col("vec_id") >= 200 && col("vec_id") < 203)
      .select(col("vec_id"), col("embedding"))
    assert(StreamingGraphIndex.processBatch(
      spark, fresh, 1L, gr3, vr3, "vec_id", "embedding", strict).nonEmpty)
    assert(GraphAnn.readVectorStoreLatest(spark, vr3, "vec_id").count() == 203)
  }

  test("crash window: corpus leg committed, graph leg lost — the replay " +
      "skips the corpus append and completes the graph insert against the " +
      "IDENTICAL corpus image (no double-insert, same edges)") {
    val cfg = StreamingGraphIndex.Config(
      m = 8, maxDegree = 24, nBuckets = 16, idBuckets = 8)
    val base = emb.filter(col("vec_id") < 200)
      .select(col("vec_id"), col("embedding"))
    val b0 = emb.filter(col("vec_id") >= 200 && col("vec_id") < 205)
      .select(col("vec_id"), col("embedding"))
    val (graphRoot, vectorRoot) = freshStores(base, cfg)
    // simulate the crash: ONLY the corpus upsert landed (tag v0)
    GraphAnn.upsertToVectorStore(spark, vectorRoot, b0, "vec_id",
      cfg.idBuckets, dirTag = Some("v0"))
    val vAfterCrash = graft.sources.SnapshotStore.currentVersion(spark, vectorRoot)
    // the replay completes the batch
    assert(StreamingGraphIndex.processBatch(
      spark, b0, 0L, graphRoot, vectorRoot, "vec_id", "embedding", cfg).nonEmpty)
    assert(graft.sources.SnapshotStore.currentVersion(spark, vectorRoot)
      == vAfterCrash, "replay must not double-append the corpus")
    assert(GraphAnn.readVectorStoreLatest(spark, vectorRoot, "vec_id")
      .count() == 205)
    // and the graph equals the no-crash run
    val (gr2, vr2) = freshStores(base, cfg)
    assert(StreamingGraphIndex.processBatch(
      spark, b0, 0L, gr2, vr2, "vec_id", "embedding", cfg).nonEmpty)
    assert(edgesOf(graphRoot) == edgesOf(gr2),
      "crash-replayed graph must equal the clean run")
  }

  test("ring maintenance in-stream (round 12): with Config(ringRoot) every " +
      "micro-batch keeps ring coverage at 1.0; a graph-committed/roster-" +
      "lost crash window is swept by the replay; and the maintenance hook " +
      "auto-applies stitch_region for stores appended before the ring era") {
    import graft.operators.{GraphAnn => GA, IndexMaintenance, RingRoster}
    val dir = java.nio.file.Files.createTempDirectory("graft-sgi-ring")
    val ringRoot = s"$dir/ring"
    val cfg = StreamingGraphIndex.Config(
      m = 8, maxDegree = 32, nBuckets = 8, idBuckets = 8,
      ringRoot = Some(ringRoot), rosterBuckets = 16)
    val base = emb.filter(col("vec_id") < 150)
      .select(col("vec_id"), col("embedding"))
    val (graphRoot, vectorRoot) = freshStores(base, cfg)
    RingRoster.write(spark, ringRoot, base.select(col("vec_id")), "vec_id",
      nBuckets = 16)
    val b0 = emb.filter(col("vec_id") >= 150 && col("vec_id") < 156)
      .select(col("vec_id"), col("embedding"))
    val b1 = emb.filter(col("vec_id") >= 156 && col("vec_id") < 160)
      .select(col("vec_id"), col("embedding"))
    assert(StreamingGraphIndex.processBatch(
      spark, b0, 0L, graphRoot, vectorRoot, "vec_id", "embedding", cfg).nonEmpty)
    assert(StreamingGraphIndex.processBatch(
      spark, b1, 1L, graphRoot, vectorRoot, "vec_id", "embedding", cfg).nonEmpty)
    val roster = () => RingRoster.read(spark, ringRoot)
    assert(roster().count() == 160, "both batches must join the roster")
    assert(GA.ringCoverage(
      GA.readGraphStoreLatest(spark, graphRoot), roster(), "id") == 1.0)
    assert(IndexMaintenance.planGraph(spark, graphRoot, roster(), "id").isEmpty)
    // crash window: both store legs committed (tags v2/g2) but the roster
    // append was lost — the REPLAY of the batch sweeps the roster
    val b2 = emb.filter(col("vec_id") >= 160 && col("vec_id") < 164)
      .select(col("vec_id"), col("embedding"))
    GA.upsertToVectorStore(spark, vectorRoot, b2, "vec_id",
      cfg.idBuckets, dirTag = Some("v2"))
    GA.appendNodesToStore(spark, graphRoot,
      GA.readVectorStoreLatest(spark, vectorRoot, "vec_id")
        .join(b2.select(col("vec_id")), Seq("vec_id"), "left_anti"),
      b2, "vec_id", "embedding", m = cfg.m, maxDegree = cfg.maxDegree,
      nBuckets = cfg.nBuckets, idBuckets = Some(cfg.idBuckets),
      dirTag = Some("g2")) // NO ringRoot: simulates the lost roster append
    assert(roster().count() == 160, "crash window: roster missing batch 2")
    assert(StreamingGraphIndex.processBatch(
      spark, b2, 2L, graphRoot, vectorRoot, "vec_id", "embedding", cfg).isEmpty,
      "both legs committed -> replay is a store no-op")
    assert(roster().count() == 164, "the replay must sweep the roster")
    // maintenance hook auto-applies the middle rung: strand a batch the
    // pre-ring way (no roster, no sweep), then run one window
    val b3 = emb.filter(col("vec_id") >= 164 && col("vec_id") < 180 &&
      col("vec_id") % 8 < 2).select(col("vec_id"), col("embedding"))
    GA.upsertToVectorStore(spark, vectorRoot, b3, "vec_id", cfg.idBuckets)
    GA.appendNodesToStore(spark, graphRoot,
      GA.readVectorStoreLatest(spark, vectorRoot, "vec_id")
        .join(b3.select(col("vec_id")), Seq("vec_id"), "left_anti"),
      b3, "vec_id", "embedding", m = cfg.m, maxDegree = cfg.maxDegree,
      nBuckets = cfg.nBuckets, idBuckets = Some(cfg.idBuckets))
    val maintain = StreamingGraphIndex.Maintain(
      every = 1, buildIds = roster, buildIdCol = "id",
      thresholds = IndexMaintenance.Thresholds(ringCoverageRebuild = 0.999))
    val ds = StreamingGraphIndex.applyMaintenance(
      spark, graphRoot, cfg, maintain)
    assert(ds.exists(_.action == "stitch_region"),
      s"stranded nodes must plan the regional stitch: $ds")
    assert(GA.ringCoverage(
      GA.readGraphStoreLatest(spark, graphRoot), roster(), "id") == 1.0,
      "the hook must have applied the repair inline")
    assert(StreamingGraphIndex.applyMaintenance(
      spark, graphRoot, cfg, maintain).isEmpty)
  }

  test("maintenance hook: delete debt streamed past the fold-waste cut " +
      "triggers an AUTOMATIC compaction between micro-batches; ring-" +
      "coverage rebuilds are surfaced via onPlan but never auto-applied") {
    val cfg = StreamingGraphIndex.Config(
      m = 8, maxDegree = 24, nBuckets = 16, idBuckets = 8)
    val base = emb.filter(col("vec_id") < 200)
      .select(col("vec_id"), col("embedding"))
    val (graphRoot, vectorRoot) = freshStores(base, cfg)
    // delete debt: tombstone a third of the nodes — every incident edge
    // becomes scan-and-discard weight for the latest read
    GraphAnn.deleteNodesFromStore(spark, graphRoot,
      base.filter(col("vec_id") % 3 === 0).select(col("vec_id")), "vec_id")
    val liveBefore = edgesOf(graphRoot)
    val planned = scala.collection.mutable.ArrayBuffer
      .empty[Seq[graft.operators.IndexMaintenance.Decision]]
    val maintain = StreamingGraphIndex.Maintain(
      every = 1, buildIds = () => base.select(col("vec_id")),
      buildIdCol = "vec_id",
      thresholds = graft.operators.IndexMaintenance.Thresholds(
        compactFoldWaste = 0.05, ringCoverageRebuild = 0.0),
      onPlan = ds => { planned += ds; () })
    val decisions = StreamingGraphIndex.applyMaintenance(
      spark, graphRoot, cfg, maintain)
    assert(decisions.exists(_.action == "compact"),
      s"delete debt must plan a compaction: $decisions")
    assert(planned.flatten == decisions, "onPlan must see the full list")
    // applied: tombstone partition physically gone, live edges unchanged
    val raw = graft.sources.SnapshotStore.read(spark, graphRoot)
    assert(raw.filter(col("src_bucket") === -1).isEmpty,
      "the hook must have folded the tombstones physically")
    assert(edgesOf(graphRoot) == liveBefore)
    // a second window over the clean store plans nothing
    assert(StreamingGraphIndex.applyMaintenance(
      spark, graphRoot, cfg, maintain).isEmpty)
    // growth past the ring cut: rebuild SURFACED, store untouched
    val strict = maintain.copy(thresholds = maintain.thresholds.copy(
      ringCoverageRebuild = 1.1, compactFoldWaste = 1e9))
    val vBefore = graft.sources.SnapshotStore.currentVersion(spark, graphRoot)
    val ds2 = StreamingGraphIndex.applyMaintenance(spark, graphRoot, cfg, strict)
    assert(ds2.exists(_.action == "rebuild"), s"expected a rebuild: $ds2")
    assert(graft.sources.SnapshotStore.currentVersion(spark, graphRoot)
      == vBefore, "a rebuild decision must not be auto-applied")
  }

  test("MemoryStream end-to-end: micro-batches land as paired delta " +
      "versions in both stores") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val cfg = StreamingGraphIndex.Config(
      m = 8, maxDegree = 24, nBuckets = 16, idBuckets = 8)
    val base = emb.filter(col("vec_id") < 150)
      .select(col("vec_id"), col("embedding"))
    val (graphRoot, vectorRoot) = freshStores(base, cfg)
    val dir = java.nio.file.Files.createTempDirectory("graft-sgi-e2e")
    val rows = emb.filter(col("vec_id") >= 150 && col("vec_id") < 158)
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])].collect()
    val input = MemoryStream[(Long, Array[Float])]
    val q = StreamingGraphIndex.run(spark,
      input.toDF().toDF("vec_id", "embedding"),
      graphRoot, vectorRoot, "vec_id", "embedding", s"$dir/ckpt", cfg)
    try {
      input.addData(rows.take(4).toIndexedSeq)
      q.processAllAvailable()
      assert(GraphAnn.readVectorStoreLatest(spark, vectorRoot, "vec_id")
        .count() == 154)
      input.addData(rows.drop(4).toIndexedSeq)
      q.processAllAvailable()
      assert(GraphAnn.readVectorStoreLatest(spark, vectorRoot, "vec_id")
        .count() == 158)
      val live = edgesOf(graphRoot)
      (150L until 158L).foreach(id =>
        assert(live.exists(_._1 == id), s"streamed node $id must be linked"))
      // two corpus deltas + two graph replace commits on top of the builds
      assert(graft.sources.SnapshotStore.versions(spark, vectorRoot) == Seq(1, 2, 3))
      assert(graft.sources.SnapshotStore.versions(spark, graphRoot) == Seq(1, 2, 3))
    } finally q.stop()
  }
}
