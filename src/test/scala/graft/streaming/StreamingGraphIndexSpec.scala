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
    assert(GraphAnn.readVectorStore(spark, vectorRoot).count() == 306)
    assert(StreamingGraphIndex.processBatch(
      spark, b1, 1L, graphRoot, vectorRoot, "vec_id", "embedding", cfg).nonEmpty)
    assert(GraphAnn.readVectorStore(spark, vectorRoot).count() == 310)
    val streamed = edgesOf(graphRoot)
    // every new node is navigable (has out-edges in the live graph)
    (300L until 310L).foreach(id =>
      assert(streamed.exists(_._1 == id), s"node $id must be linked"))

    // equality with the DIRECT sequence (same batches, same knobs, flat
    // corpus frames): the streaming wrapper adds replay plumbing, not
    // semantics
    val (gr2, vr2) = freshStores(base, cfg)
    GraphAnn.appendToVectorStore(spark, vr2, b0, "vec_id", cfg.idBuckets)
    GraphAnn.appendNodesToStore(spark, gr2,
      GraphAnn.readVectorStore(spark, vr2)
        .join(b0.select(col("vec_id")), Seq("vec_id"), "left_anti"),
      b0, "vec_id", "embedding", m = cfg.m, maxDegree = cfg.maxDegree,
      nBuckets = cfg.nBuckets, idBuckets = Some(cfg.idBuckets))
    GraphAnn.appendToVectorStore(spark, vr2, b1, "vec_id", cfg.idBuckets)
    GraphAnn.appendNodesToStore(spark, gr2,
      GraphAnn.readVectorStore(spark, vr2)
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
      GraphAnn.readVectorStore(spark, vectorRoot),
      q, "q_id", "qv", "vec_id", "embedding",
      k = 5, beamWidth = 24, maxHops = 12, nSeeds = 4,
      srcBuckets = Some(cfg.nBuckets), idBuckets = Some(cfg.idBuckets))
      .collect()
    assert(hits.length == 5, "the streamed store must serve k results")
    assert(hits.forall(_.getLong(0) == 305L))
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
    // simulate the crash: ONLY the corpus append landed (tag v0)
    GraphAnn.appendToVectorStore(spark, vectorRoot, b0, "vec_id",
      cfg.idBuckets, dirTag = Some("v0"))
    val vAfterCrash = graft.sources.SnapshotStore.currentVersion(spark, vectorRoot)
    // the replay completes the batch
    assert(StreamingGraphIndex.processBatch(
      spark, b0, 0L, graphRoot, vectorRoot, "vec_id", "embedding", cfg).nonEmpty)
    assert(graft.sources.SnapshotStore.currentVersion(spark, vectorRoot)
      == vAfterCrash, "replay must not double-append the corpus")
    assert(GraphAnn.readVectorStore(spark, vectorRoot).count() == 205)
    // and the graph equals the no-crash run
    val (gr2, vr2) = freshStores(base, cfg)
    assert(StreamingGraphIndex.processBatch(
      spark, b0, 0L, gr2, vr2, "vec_id", "embedding", cfg).nonEmpty)
    assert(edgesOf(graphRoot) == edgesOf(gr2),
      "crash-replayed graph must equal the clean run")
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
      assert(GraphAnn.readVectorStore(spark, vectorRoot).count() == 154)
      input.addData(rows.drop(4).toIndexedSeq)
      q.processAllAvailable()
      assert(GraphAnn.readVectorStore(spark, vectorRoot).count() == 158)
      val live = edgesOf(graphRoot)
      (150L until 158L).foreach(id =>
        assert(live.exists(_._1 == id), s"streamed node $id must be linked"))
      // two corpus deltas + two graph replace commits on top of the builds
      assert(graft.sources.SnapshotStore.versions(spark, vectorRoot) == Seq(1, 2, 3))
      assert(graft.sources.SnapshotStore.versions(spark, graphRoot) == Seq(1, 2, 3))
    } finally q.stop()
  }
}
