package graft.operators

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Graph-ANN beam tier (round 9, VERDICT r8 task 5): deterministic
  * bounded-degree graph build, distributed-vs-local search equivalence
  * (the contract that lets [[AnnTuner]] measure curves locally after real
  * distributed builds), and the cross-method tuner selecting among IVF and
  * graph points on one cost axis.
  */
class GraphAnnSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val sf = "/root/testdata/sf0.01"
  private lazy val emb = Tables(spark, sf, "embeddings")

  test("buildGraph is deterministic, self-loop-free, out-degree-bounded") {
    def edges() = GraphAnn.buildGraph(emb, "vec_id", "embedding", m = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val e1 = edges()
    assert(e1 == edges(), "two builds over the same corpus must be identical")
    assert(e1.forall { case (s, d) => s != d }, "no self loops")
    val n = emb.count()
    val ringLevels = Iterator.iterate(1L)(_ << 2).takeWhile(_ < n).size
    val maxOut = e1.groupBy(_._1).map(_._2.size).max
    info(s"n=$n edges=${e1.size} maxOutDegree=$maxOut " +
      s"(bound ${8 + 2 * ringLevels})")
    assert(maxOut <= 8 + 2 * ringLevels,
      s"out-degree $maxOut exceeds m + 2·ringLevels = ${8 + 2 * ringLevels}")
    // navigable: every node is someone's source (ring guarantees it)
    assert(e1.map(_._1).size.toLong == n, "every node must have out-edges")
  }

  test("searchMany (distributed, IterCheckpoint frontier loop) returns " +
      "exactly localBeam's hits per query") {
    val graph = GraphAnn.buildGraph(emb, "vec_id", "embedding", m = 8)
      .localCheckpoint()
    val adj = GraphAnn.collectAdjacency(graph)
    val vecs = graft.tools.RecallHarness.collectVecs(emb).toMap
    val seeds = GraphAnn.entryPoints(emb, "vec_id", nSeeds = 4)
    val queries = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("embedding").as("qv"))
    val dist = GraphAnn.searchMany(
      graph, emb, queries, "q_id", "qv", "vec_id", "embedding",
      k = 10, beamWidth = 24, maxHops = 12, nSeeds = 4, expandPerHop = 4)
      .collect()
      .groupBy(_.getLong(0))
      .map { case (q, rows) =>
        q -> rows.sortBy(_.getInt(3)).map(r => (r.getLong(1), r.getDouble(2))).toSeq
      }
    (0L until 5L).foreach { qid =>
      val local = GraphAnn.localBeam(vecs, adj, seeds, vecs(qid), Some(qid),
        k = 10, beamWidth = 24, maxHops = 12, expandPerHop = 4)
      assert(dist(qid) == local.hits,
        s"query $qid: distributed ${dist(qid)} != local ${local.hits}")
    }
  }

  test("beam search recall/cost at sf0.01: high recall at bounded " +
      "evaluation cost; cost is corpus-size-independent state") {
    val adj = GraphAnn.collectAdjacency(
      GraphAnn.buildGraph(emb, "vec_id", "embedding", m = 12))
    val vecsArr = graft.tools.RecallHarness.collectVecs(emb)
    val vecs = vecsArr.toMap
    val seeds = GraphAnn.entryPoints(emb, "vec_id", nSeeds = 4)
    val k = 10
    val queries = vecsArr.take(30)
    val per = queries.map { case (qid, qv) =>
      val exact = vecsArr.filter(_._1 != qid).map { case (id, v) =>
        (IvfIndex.roundHalfUp(IvfIndex.cosineScalar(v, qv), 6), id)
      }.sortBy { case (s, id) => (-s, id) }.take(k).map(_._2).toSet
      val r = GraphAnn.localBeam(vecs, adj, seeds, qv, Some(qid),
        k, beamWidth = 48, maxHops = 12, expandPerHop = 4)
      ((exact intersect r.hits.map(_._1).toSet).size.toDouble / k,
        r.scored.toDouble / vecsArr.length)
    }
    val recall = per.map(_._1).sum / per.length
    val costFrac = per.map(_._2).sum / per.length
    info(f"graph-ann m=12 beam=48: recall@10 $recall%.4f, " +
      f"mean scored fraction $costFrac%.4f over ${vecsArr.length} vectors")
    assert(recall >= 0.95, f"graph-ann recall $recall%.4f below 0.95 gate")
    assert(costFrac < 1.0, "beam search must not score the whole corpus")
  }

  test("NN-descent refinement lifts edge quality and beam recall at a " +
      "fixed degree budget") {
    import graft.tools.RecallHarness
    def meanEdgeCosine(g: org.apache.spark.sql.DataFrame): Double = {
      val vecs = emb.select(col("vec_id").cast("long").as("src"),
        col("embedding").as("sv"))
      g.join(vecs, "src")
        .join(emb.select(col("vec_id").cast("long").as("dst"),
          col("embedding").as("dv")), "dst")
        .agg(avg(round(graft.functions.VectorFunctions
          .cosine(col("sv"), col("dv")), 6)))
        .head().getDouble(0)
    }
    val g0 = GraphAnn.buildGraph(emb, "vec_id", "embedding", m = 8)
      .localCheckpoint()
    val g1 = GraphAnn.buildGraph(emb, "vec_id", "embedding", m = 8,
      refineIters = 2).localCheckpoint()
    val (q0, q1) = (meanEdgeCosine(g0), meanEdgeCosine(g1))
    info(f"mean edge cosine: LSH-built $q0%.4f, NN-descent refined $q1%.4f")
    assert(q1 > q0, "refinement must lift mean neighbor similarity")

    val vecs = RecallHarness.collectVecs(emb).toMap
    val vecsArr = RecallHarness.collectVecs(emb)
    val seeds = GraphAnn.entryPoints(emb, "vec_id", nSeeds = 4)
    def recallOf(adj: Map[Long, Array[Long]]): Double = {
      val per = vecsArr.take(30).map { case (qid, qv) =>
        val exact = vecsArr.filter(_._1 != qid).map { case (id, v) =>
          (IvfIndex.roundHalfUp(IvfIndex.cosineScalar(v, qv), 6), id)
        }.sortBy { case (s, id) => (-s, id) }.take(10).map(_._2).toSet
        val r = GraphAnn.localBeam(vecs, adj, seeds, qv, Some(qid),
          k = 10, beamWidth = 32, maxHops = 12, expandPerHop = 4)
        (exact intersect r.hits.map(_._1).toSet).size.toDouble / 10
      }
      per.sum / per.length
    }
    val (r0, r1) = (recallOf(GraphAnn.collectAdjacency(g0)),
      recallOf(GraphAnn.collectAdjacency(g1)))
    info(f"beam recall@10 (m=8, beam=32): LSH graph $r0%.4f, refined $r1%.4f")
    assert(r1 >= r0, "refined graph must not lose beam recall")
  }

  test("bucketed graph store: searchMany over the versioned layout equals " +
      "the in-memory graph, and the bucket predicate prunes partitions") {
    val graph = GraphAnn.buildGraph(emb, "vec_id", "embedding", m = 8)
      .localCheckpoint()
    val root = java.nio.file.Files.createTempDirectory("graft-gann-store").toString
    val v = GraphAnn.writeGraphStore(spark, root, graph, nBuckets = 8)
    assert(v == 1)
    val store = GraphAnn.readGraphStore(spark, root)
    val queries = emb.filter(col("vec_id") < 3)
      .select(col("vec_id").as("q_id"), col("embedding").as("qv"))
    def run(g: org.apache.spark.sql.DataFrame, nb: Option[Int]) =
      GraphAnn.searchMany(g, emb, queries, "q_id", "qv", "vec_id", "embedding",
        k = 10, beamWidth = 24, maxHops = 12, nSeeds = 4, expandPerHop = 4,
        srcBuckets = nb)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
        .sortBy(t => (t._1, t._4))
    assert(run(store, Some(8)).sameElements(run(graph, None)),
      "bucketed-store search must equal the in-memory graph search")
    // the hop-shaped slice must land its bucket predicate as a
    // PartitionFilter on the store scan (the IvfSpec gate technique)
    val sliced = store.where(col("src_bucket").isin(0, 3))
    val explained = sliced.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(explained.contains("PartitionFilters"),
      s"bucket filter did not reach the scan:\n$explained")
    val pf = explained.linesIterator.find(_.contains("PartitionFilters")).get
    assert(pf.contains("src_bucket"), s"partition filter not on src_bucket: $pf")
  }

  test("appendNodes (HNSW-insert shape): new nodes wire in via the graph's " +
      "own beam search; recall drifts within tolerance of a fresh rebuild; " +
      "degree stays capped; the grown graph is deterministic") {
    import graft.tools.RecallHarness
    val base = emb.filter(col("vec_id") < 400)
    val delta = emb.filter(col("vec_id") >= 400)
    val g0 = GraphAnn.buildGraph(base, "vec_id", "embedding", m = 12)
      .localCheckpoint()
    def grow() = GraphAnn.appendNodes(g0, base, delta, "vec_id", "embedding",
      m = 12, maxDegree = 36)
    val grown = grow().localCheckpoint()
    // deterministic growth
    def edgeSet(g: org.apache.spark.sql.DataFrame) =
      g.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(edgeSet(grown) == edgeSet(grow()))
    val adj = GraphAnn.collectAdjacency(grown)
    // every node (old and new) has out-edges; degree cap holds
    assert(adj.size == 500, s"expected 500 sources, got ${adj.size}")
    assert(adj.values.map(_.length).max <= 36, "degree cap violated")

    // recall drift vs a fresh full rebuild
    val fresh = GraphAnn.collectAdjacency(
      GraphAnn.buildGraph(emb, "vec_id", "embedding", m = 12))
    val vecsArr = RecallHarness.collectVecs(emb)
    val vecs = vecsArr.toMap
    val seeds = GraphAnn.entryPoints(emb, "vec_id", nSeeds = 4)
    def recallOf(a: Map[Long, Array[Long]]): Double = {
      val per = vecsArr.take(30).map { case (qid, qv) =>
        val exact = vecsArr.filter(_._1 != qid).map { case (id, v) =>
          (IvfIndex.roundHalfUp(IvfIndex.cosineScalar(v, qv), 6), id)
        }.sortBy { case (s, id) => (-s, id) }.take(10).map(_._2).toSet
        val r = GraphAnn.localBeam(vecs, a, seeds, qv, Some(qid),
          k = 10, beamWidth = 48, maxHops = 12, expandPerHop = 4)
        (exact intersect r.hits.map(_._1).toSet).size.toDouble / 10
      }
      per.sum / per.length
    }
    val (rGrown, rFresh) = (recallOf(adj), recallOf(fresh))
    info(f"beam recall@10: appended graph $rGrown%.4f vs fresh rebuild $rFresh%.4f")
    assert(rGrown >= rFresh - 0.05,
      f"appended-graph recall $rGrown%.4f drifted > 0.05 below fresh $rFresh%.4f")
    // new nodes are actually reachable as results: at least one query's
    // exact top-10 contains a delta node and the beam finds delta nodes
    assert(adj.keySet.exists(_ >= 400L))

    // versioned composition: base store -> grow commit -> pinned v1 intact
    val root = java.nio.file.Files.createTempDirectory("graft-gann-grow").toString
    assert(GraphAnn.writeGraphStore(spark, root, g0, nBuckets = 8) == 1)
    val v2 = GraphAnn.appendNodesToStore(spark, root, base, delta,
      "vec_id", "embedding", m = 12, maxDegree = 36, nBuckets = 8)
    assert(v2 == 2)
    assert(edgeSet(GraphAnn.readGraphStore(spark, root)
      .select(col("src"), col("dst"))) == edgeSet(grown))
    assert(edgeSet(GraphAnn.readGraphStore(spark, root, Some(1))
      .select(col("src"), col("dst"))) == edgeSet(g0.select(
      col("src").cast("long"), col("dst").cast("long"))))
  }

  test("appendNodesToStore commits DELTA-SIZED bytes: untouched buckets' " +
      "files are byte-identical across the append, and the result equals " +
      "appendNodes") {
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
    val base = emb.filter(col("vec_id") < 480)
    // a 4-node delta touches few srcs — with 64 buckets most stay untouched
    val delta = emb.filter(col("vec_id") >= 480 && col("vec_id") < 484)
    val g0 = GraphAnn.buildGraph(base, "vec_id", "embedding", m = 8)
      .localCheckpoint()
    val root = java.nio.file.Files.createTempDirectory("graft-gann-delta").toString
    GraphAnn.writeGraphStore(spark, root, g0, nBuckets = 64)
    val before = files(root)
    val v2 = GraphAnn.appendNodesToStore(spark, root, base, delta,
      "vec_id", "embedding", m = 8, maxDegree = 24, nBuckets = 64)
    assert(v2 == 2)
    val after = files(root)
    assert(before.subsetOf(after),
      "append must never rewrite an existing file")
    // the commit added strictly fewer bucket dirs than a full rewrite:
    // at least one v1 bucket leaf is still REFERENCED by v2 (not only on
    // disk for the pinned reader)
    val v2dirs = graft.sources.SnapshotStore.committedDirs(spark, root, Some(2))
    val leafRefs = v2dirs.count(_.split('/').length >= 3)
    info(s"v2 manifest: ${v2dirs.length} entries, $leafRefs untouched-leaf refs")
    assert(leafRefs > 0, "v2 must re-reference untouched v1 bucket leaves")
    // semantics: the store's current graph equals the in-memory appendNodes
    val grown = GraphAnn.appendNodes(g0, base, delta, "vec_id", "embedding",
      m = 8, maxDegree = 24)
    def edges(df: org.apache.spark.sql.DataFrame) =
      df.select(col("src"), col("dst")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(edges(GraphAnn.readGraphStore(spark, root)) == edges(grown))
    // pinned v1 still serves the pre-append graph
    assert(edges(GraphAnn.readGraphStore(spark, root, Some(1))) ==
      edges(g0.select(col("src").cast("long"), col("dst").cast("long"))))
    // a concurrent commit landing between the read and the publish
    // collides loudly (round-10 ADVICE: the expectedBase capture) — the
    // append planned against v2 while someone else committed v3
    val stolen = new org.apache.hadoop.fs.Path(root, "_manifests/v00000003.manifest")
    val out = fs.create(stolen, false)
    out.write("data/s3-stolen\n".getBytes("UTF-8")); out.close()
    val e = intercept[java.io.IOException] {
      graft.sources.SnapshotStore.replacePartitions(spark, root,
        GraphAnn.readGraphStore(spark, root, Some(2)).limit(4),
        "src_bucket", expectedBase = Some(2))
    }
    assert(e.getMessage.contains("concurrent writer"))
  }

  test("searchMany chunks an oversized query batch and returns results " +
      "identical to the unchunked path (bounded query broadcast)") {
    val graph = GraphAnn.buildGraph(emb, "vec_id", "embedding", m = 8)
      .localCheckpoint()
    val queries = emb.filter(col("vec_id") < 40)
      .select(col("vec_id").as("q_id"), col("embedding").as("qv"))
    def run(maxB: Int) = GraphAnn.searchMany(
      graph, emb, queries, "q_id", "qv", "vec_id", "embedding",
      k = 5, beamWidth = 16, maxHops = 8, nSeeds = 4, expandPerHop = 4,
      maxBroadcastQueries = maxB)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .toSet
    // 40 queries at a 16-query bound -> 3 slices; must equal one broadcast
    assert(run(16) == run(4096),
      "chunked traversal must equal the unchunked answer")
  }

  test("degree prune reserves long links: a touched node's lowest-cosine " +
      "pre-existing edges survive an append that would otherwise evict them") {
    val base = emb.filter(col("vec_id") < 400)
    val delta = emb.filter(col("vec_id") >= 400 && col("vec_id") < 420)
    val g0 = GraphAnn.buildGraph(base, "vec_id", "embedding", m = 12)
      .localCheckpoint()
    val vecs = graft.tools.RecallHarness.collectVecs(emb).toMap
    // per pre-existing src: its reserveLong lowest-cosine edges (the ring
    // lives here) ranked exactly like the prune (score asc, dst desc)
    val reserveLong = 4
    val pre = GraphAnn.collectAdjacency(g0)
    def lowEdges(s: Long): Seq[(Long, Long)] =
      pre(s).map { d =>
        (IvfIndex.roundHalfUp(IvfIndex.cosineScalar(vecs(s), vecs(d)), 6), d)
      }.sortBy { case (sc, d) => (sc, -d) }.take(reserveLong)
        .map { case (_, d) => (s, d) }.toSeq
    val grown = GraphAnn.appendNodes(g0, base, delta, "vec_id", "embedding",
      m = 12, maxDegree = 20, reserveLong = reserveLong)
    val grownSet = grown.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val adj = GraphAnn.collectAdjacency(grown)
    // cap holds for every REWRITTEN (touched) src; untouched build nodes
    // legitimately keep their build degree (m + 2·ringLevels may exceed
    // this test's deliberately tight maxDegree)
    val newNodeEdges = grownSet.filter { case (s, d) => s >= 400 || d >= 400 }
    val touchedSrcs = newNodeEdges.map(_._1) ++ newNodeEdges.map(_._2).filter(adj.contains)
    assert(touchedSrcs.forall(s => adj(s).length <= 20),
      "degree cap must hold on every rewritten src")
    // every touched pre-existing src keeps its reserved low-cosine edges
    val touchedPre = grownSet.map(_._1).filter(s => s < 400 && pre.contains(s))
    val violations = touchedPre.toSeq.flatMap { s =>
      lowEdges(s).filterNot(grownSet.contains)
    }
    assert(violations.isEmpty,
      s"reserved long links evicted by the prune: ${violations.take(5)}")
  }

  test("staleness probes drift in the documented direction on a severely " +
      "appended vs fresh graph: ring coverage falls as 1/growth; beam " +
      "health degrades (the rebuild alarm fires)") {
    // several-fold growth — the exact case the appendNodes staleness
    // contract says to rebuild for: only 60/500 nodes carry ring links
    val base = emb.filter(col("vec_id") < 60)
    val delta = emb.filter(col("vec_id") >= 60)
    val g0 = GraphAnn.buildGraph(base, "vec_id", "embedding", m = 12)
      .localCheckpoint()
    val grown = GraphAnn.appendNodes(g0, base, delta, "vec_id", "embedding",
      m = 12, maxDegree = 36).localCheckpoint()
    val fresh = GraphAnn.buildGraph(emb, "vec_id", "embedding", m = 12)
      .localCheckpoint()
    // ring coverage: 1.0 on the fresh build, 60/500 on the grown graph —
    // far below the documented ~0.7 rebuild threshold
    val covFresh = GraphAnn.ringCoverage(fresh, emb, "vec_id")
    val covGrown = GraphAnn.ringCoverage(grown,
      base.select(col("vec_id")), "vec_id")
    info(f"ring coverage: fresh $covFresh%.4f grown $covGrown%.4f")
    assert(covFresh == 1.0, "every fresh-build node is ring-linked")
    assert(math.abs(covGrown - 0.12) < 0.01,
      s"grown coverage should be 60/500, got $covGrown")
    assert(covGrown < 0.7, "the documented rebuild threshold must fire")
    // beam health on the same audit sample: at this growth the appended
    // graph must not strictly beat the fresh build on routing (hops +
    // scored fraction together) — the drift direction a deployment
    // alarms on, alongside the decisive coverage ratio above
    val vecsArr = graft.tools.RecallHarness.collectVecs(emb)
    val vecs = vecsArr.toMap
    val seeds = GraphAnn.entryPoints(emb, "vec_id", nSeeds = 4)
    val queries = vecsArr.take(30).toSeq
    val hFresh = GraphAnn.graphHealth(vecs,
      GraphAnn.collectAdjacency(fresh), seeds, queries)
    val hGrown = GraphAnn.graphHealth(vecs,
      GraphAnn.collectAdjacency(grown), seeds, queries)
    info(s"health fresh: $hFresh")
    info(s"health grown: $hGrown")
    assert(hGrown.meanHops + 1e-9 >= hFresh.meanHops ||
      hGrown.meanScoredFrac + 1e-9 >= hFresh.meanScoredFrac,
      "severely appended graph must not strictly beat fresh on both " +
        "hops and scored cost")
    assert(hFresh.convergedFrac == 1.0,
      "fresh build must converge within the hop budget on the fixture")
  }

  test("graph-store node delete (round 10): tombstones fold every edge " +
      "incident to the deleted node out of the live view; a pinned old " +
      "version still serves it; a later append re-links it at a newer " +
      "commit; a touched-bucket rewrite cleans dead rows physically") {
    import spark.implicits._
    val g0 = GraphAnn.buildGraph(emb, "vec_id", "embedding", m = 8)
      .localCheckpoint()
    val root = java.nio.file.Files.createTempDirectory("graft-gann-del").toString
    GraphAnn.writeGraphStore(spark, root, g0, nBuckets = 16)
    val victim = 42L
    val v2 = GraphAnn.deleteNodesFromStore(spark, root,
      Seq(victim).toDF("vec_id"), "vec_id")
    assert(v2 == 2)
    val live = GraphAnn.readGraphStoreLatest(spark, root)
    assert(live.filter(col("src") === victim || col("dst") === victim).isEmpty,
      "no live edge may touch the deleted node")
    // the rest of the graph is untouched
    val g0Set = g0.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val liveSet = live.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(liveSet == g0Set.filterNot { case (s, d) => s == victim || d == victim })
    // pinned v1 still serves the node
    assert(GraphAnn.readGraphStoreLatest(spark, root, Some(1))
      .filter(col("src") === victim).count() > 0)
    // searches over the folded view never return the deleted node
    val qv = emb.filter(col("vec_id") === victim)
      .select(col("vec_id").as("q_id"), col("embedding").as("qv"))
    val hits = GraphAnn.searchMany(live, emb, qv, "q_id", "qv",
      "vec_id", "embedding", k = 10, beamWidth = 24, maxHops = 12,
      nSeeds = 4, expandPerHop = 4)
      .select("neighbor_id").collect().map(_.getLong(0)).toSet
    assert(!hits.contains(victim))
    // re-append the node: its fresh edges commit NEWER than the tombstone,
    // so it is live again (the upsert-resurrection semantics)
    val v3 = GraphAnn.appendNodesToStore(spark, root,
      emb.filter(col("vec_id") =!= victim), emb.filter(col("vec_id") === victim),
      "vec_id", "embedding", m = 8, maxDegree = 24, nBuckets = 16)
    assert(v3 == 3)
    val relinked = GraphAnn.readGraphStoreLatest(spark, root)
    assert(relinked.filter(col("src") === victim).count() > 0,
      "re-appended node must be navigable again")
    // physical fold: compaction drops the tombstone partition while the
    // resolved live view is unchanged
    val relinkedSet = relinked.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val v4 = GraphAnn.compactGraphStore(spark, root, nBuckets = 16)
    assert(v4 == 4)
    val raw4 = graft.sources.SnapshotStore.read(spark, root, Some(4))
    assert(raw4.filter(col("src_bucket") === -1).isEmpty,
      "compaction must fold tombstones physically")
    assert(GraphAnn.readGraphStoreLatest(spark, root).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet == relinkedSet)
  }

  test("filtered searchMany (tenant predicate compiled into the search): " +
      "distributed equals localBeam with the same keep; every hit matches; " +
      "k rows come back for the tenant; per-tenant recall is gated") {
    val graph = GraphAnn.buildGraph(emb, "vec_id", "embedding", m = 12)
      .localCheckpoint()
    val adj = GraphAnn.collectAdjacency(graph)
    val vecsArr = graft.tools.RecallHarness.collectVecs(emb)
    val vecs = vecsArr.toMap
    val seeds = GraphAnn.entryPoints(emb, "vec_id", nSeeds = 4)
    val keepOrg2: Long => Boolean = id => id % 4 == 2
    val queries = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("embedding").as("qv"))
    val dist = GraphAnn.searchMany(
      graph, emb, queries, "q_id", "qv", "vec_id", "embedding",
      k = 10, beamWidth = 48, maxHops = 12, nSeeds = 4, expandPerHop = 4,
      resultFilter = Some(pmod(col("vec_id"), lit(4L)) === 2L))
      .collect()
      .groupBy(_.getLong(0))
      .map { case (q, rows) =>
        q -> rows.sortBy(_.getInt(3)).map(r => (r.getLong(1), r.getDouble(2))).toSeq
      }
    (0L until 5L).foreach { qid =>
      val local = GraphAnn.localBeam(vecs, adj, seeds, vecs(qid), Some(qid),
        k = 10, beamWidth = 48, maxHops = 12, expandPerHop = 4,
        keep = keepOrg2)
      assert(dist(qid) == local.hits,
        s"query $qid: distributed ${dist(qid)} != local ${local.hits}")
      assert(dist(qid).length == 10, "the tenant must get k rows")
      assert(dist(qid).forall(_._1 % 4 == 2), "only tenant rows")
    }
    // per-tenant recall vs per-tenant exact brute force (the RecallSpec
    // discipline): the filtered beam must recover most of the tenant's
    // true top-k even though routing is tenant-blind
    val per = vecsArr.take(30).map { case (qid, qv) =>
      val exact = vecsArr.filter(t => t._1 != qid && keepOrg2(t._1))
        .map { case (id, v) =>
          (IvfIndex.roundHalfUp(IvfIndex.cosineScalar(v, qv), 6), id)
        }.sortBy { case (s, id) => (-s, id) }.take(10).map(_._2).toSet
      val got = GraphAnn.localBeam(vecs, adj, seeds, qv, Some(qid),
        k = 10, beamWidth = 48, maxHops = 12, expandPerHop = 4,
        keep = keepOrg2).hits.map(_._1).toSet
      (exact intersect got).size.toDouble / 10
    }
    val recall = per.sum / per.length
    info(f"per-tenant filtered-beam recall@10: $recall%.4f")
    assert(recall >= 0.85, f"per-tenant recall $recall%.4f below gate")
  }

  test("AnnTuner: one curve across IVF and graph tiers, cheapest point " +
      "meeting the target is selected") {
    val tune = AnnTuner.tune(emb, "vec_id", "embedding",
      targetRecall = 0.90, k = 10,
      nCellsGrid = Seq(16), graphGrid = Seq((12, 48)),
      pqFracGrid = Seq(0.10), nQueries = 20)
    assert(tune.curve.exists(_.method == "ivf"), "curve must carry IVF points")
    assert(tune.curve.exists(_.method == "graph"), "curve must carry graph points")
    assert(tune.curve.exists(_.method == "pq-rerank"), "curve must carry PQ points")
    // nProbe = nCells probes everything -> recall 1.0, so a best always exists
    assert(tune.best.nonEmpty, "a full-probe IVF point guarantees a best")
    val best = tune.best.get
    info(s"tuner best: ${best.method} ${best.config} " +
      f"recall ${best.recall}%.4f cost ${best.costFrac}%.4f")
    assert(best.recall >= 0.90)
    assert(tune.curve.forall(p => p.costFrac >= 0 && p.costFrac <= 1.0001))
  }

  test("searchManyLocal (round 11, VERDICT r10 task 4): the driver-hosted " +
      "small-batch twin returns EXACTLY searchMany's rows across plain / " +
      "capped / filtered / bucketed-store configs, and searchMany " +
      "delegates below smallBatchBound") {
    val graph = GraphAnn.buildGraph(emb, "vec_id", "embedding", m = 8)
      .localCheckpoint()
    val root = java.nio.file.Files.createTempDirectory("gann-local").toString
    GraphAnn.writeGraphStore(spark, root, graph, nBuckets = 16)
    val store = GraphAnn.readGraphStore(spark, root)
    val queries = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("embedding").as("qv"))
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    val configs: Seq[(String, () => org.apache.spark.sql.DataFrame,
        () => org.apache.spark.sql.DataFrame)] = Seq(
      ("plain",
        () => GraphAnn.searchMany(graph, emb, queries, "q_id", "qv",
          "vec_id", "embedding", k = 10, beamWidth = 24, maxHops = 12, nSeeds = 4),
        () => GraphAnn.searchManyLocal(graph, emb, queries, "q_id", "qv",
          "vec_id", "embedding", k = 10, beamWidth = 24, maxHops = 12, nSeeds = 4)),
      ("capped",
        () => GraphAnn.searchMany(graph, emb, queries, "q_id", "qv",
          "vec_id", "embedding", k = 10, beamWidth = 24, maxHops = 12,
          nSeeds = 4, expandPerHop = 4),
        () => GraphAnn.searchManyLocal(graph, emb, queries, "q_id", "qv",
          "vec_id", "embedding", k = 10, beamWidth = 24, maxHops = 12,
          nSeeds = 4, expandPerHop = 4)),
      ("filtered",
        () => GraphAnn.searchMany(graph, emb, queries, "q_id", "qv",
          "vec_id", "embedding", k = 10, beamWidth = 48, maxHops = 12,
          nSeeds = 4, expandPerHop = 4,
          resultFilter = Some(pmod(col("vec_id"), lit(4L)) === 2L)),
        () => GraphAnn.searchManyLocal(graph, emb, queries, "q_id", "qv",
          "vec_id", "embedding", k = 10, beamWidth = 48, maxHops = 12,
          nSeeds = 4, expandPerHop = 4,
          resultFilter = Some(pmod(col("vec_id"), lit(4L)) === 2L))),
      ("bucketed-store",
        () => GraphAnn.searchMany(store, emb, queries, "q_id", "qv",
          "vec_id", "embedding", k = 10, beamWidth = 24, maxHops = 12,
          nSeeds = 4, srcBuckets = Some(16)),
        () => GraphAnn.searchManyLocal(store, emb, queries, "q_id", "qv",
          "vec_id", "embedding", k = 10, beamWidth = 24, maxHops = 12,
          nSeeds = 4, srcBuckets = Some(16))))
    configs.foreach { case (name, dist, local) =>
      assert(rows(dist()) == rows(local()),
        s"config '$name': local twin must equal the distributed answer")
    }
    // delegation: a batch at or under the bound takes the local path and
    // must still equal the distributed answer
    assert(rows(GraphAnn.searchMany(graph, emb, queries, "q_id", "qv",
        "vec_id", "embedding", k = 10, beamWidth = 24, maxHops = 12,
        nSeeds = 4, smallBatchBound = 16))
      == rows(GraphAnn.searchMany(graph, emb, queries, "q_id", "qv",
        "vec_id", "embedding", k = 10, beamWidth = 24, maxHops = 12,
        nSeeds = 4)))
  }

  test("graph-tier tenant purge (round 11, VERDICT r10 task 2): one " +
      "roster-derived tombstone commit removes every edge incident to the " +
      "tenant's nodes, beams never return the tenant, a pinned version " +
      "still serves it, re-append resurrects, compaction folds physically") {
    val corpus = emb.filter(col("vec_id") < 300)
    val roster = corpus.withColumn("org", pmod(col("vec_id"), lit(4L)).cast("int"))
    val g0 = GraphAnn.buildGraph(corpus, "vec_id", "embedding", m = 8)
      .localCheckpoint()
    val root = java.nio.file.Files.createTempDirectory("gann-purge").toString
    val v1 = GraphAnn.writeGraphStore(spark, root, g0, nBuckets = 16)
    val nOrg1 = roster.filter(col("org") === 1).count()
    assert(nOrg1 > 0)
    val v2 = GraphAnn.purgeTenantFromGraphStore(
      spark, root, roster, "vec_id", "org", 1)
    assert(v2 == v1 + 1)
    // delta-sized: the purge commit added exactly the tenant's tombstones
    assert(graft.sources.SnapshotStore.read(spark, root, Some(v2))
      .filter(col("src_bucket") === -1).count() == nOrg1)
    val live = GraphAnn.readGraphStoreLatest(spark, root)
    assert(live.filter(col("src") % 4 === 1 || col("dst") % 4 === 1).isEmpty,
      "no live edge may touch a purged node")
    assert(live.count() > 0, "other tenants' graph must survive")
    // a beam over the purged store never returns the tenant (the serving
    // corpus excludes the purged chunks too — the warehouse purge is the
    // same commit family)
    val queries = emb.filter(col("vec_id") === 0)
      .select(col("vec_id").as("q_id"), col("embedding").as("qv"))
    val hits = GraphAnn.searchMany(live,
      corpus.filter(col("vec_id") % 4 =!= 1), queries, "q_id", "qv",
      "vec_id", "embedding", k = 10, beamWidth = 24, maxHops = 12, nSeeds = 4)
      .collect().map(_.getLong(1))
    assert(hits.nonEmpty && hits.forall(_ % 4 != 1))
    // pinned v1 still serves the tenant (the GDPR grace window)
    assert(GraphAnn.readGraphStoreLatest(spark, root, Some(v1))
      .filter(col("src") % 4 === 1).count() > 0)
    // re-ingest one purged node: newer commit outlives the tombstone
    val back = corpus.filter(col("vec_id") === 1)
    GraphAnn.appendNodesToStore(spark, root,
      corpus.filter(col("vec_id") % 4 =!= 1), back,
      "vec_id", "embedding", m = 8, maxDegree = 24, nBuckets = 16)
    val relinked = GraphAnn.readGraphStoreLatest(spark, root)
    assert(relinked.filter(col("src") === 1).count() > 0,
      "re-ingested node must re-link")
    assert(relinked.filter((col("src") % 4 === 1 && col("src") =!= 1) ||
      (col("dst") % 4 === 1 && col("dst") =!= 1)).isEmpty,
      "only the re-ingested id resurrects")
    // physical fold: no tombstone partition, no purged edges in the raw dir
    GraphAnn.compactGraphStore(spark, root, nBuckets = 16)
    val raw = graft.sources.SnapshotStore.read(spark, root)
    assert(raw.filter(col("src_bucket") === -1).isEmpty,
      "compaction must fold the tombstone partition away")
    assert(rowsOf(raw) == rowsOf(relinked), "fold must preserve live edges")
  }

  private def rowsOf(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select(col("src").cast("long"), col("dst").cast("long")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("bucketed corpus store (round 11): searchMany/searchManyLocal with " +
      "idBuckets prune the candidate-vector scan by partition and return " +
      "EXACTLY the flat-corpus answer") {
    val graph = GraphAnn.buildGraph(emb, "vec_id", "embedding", m = 8)
      .localCheckpoint()
    val groot = java.nio.file.Files.createTempDirectory("gann-vsg").toString
    GraphAnn.writeGraphStore(spark, groot, graph, nBuckets = 16)
    val store = GraphAnn.readGraphStore(spark, groot)
    val vroot = java.nio.file.Files.createTempDirectory("gann-vstore").toString
    GraphAnn.writeVectorStore(spark, vroot, emb, "vec_id", nBuckets = 8)
    val vstore = GraphAnn.readVectorStore(spark, vroot)
    // the pruned fetch shape: an id_bucket literal predicate reaches the
    // corpus scan as a PartitionFilter
    val explained = vstore.where(col("id_bucket").isin(0, 3))
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(explained.linesIterator.exists(l =>
      l.contains("PartitionFilters") && l.contains("id_bucket")),
      s"id_bucket must prune the corpus scan:\n$explained")
    val queries = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("embedding").as("qv"))
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    val flat = rows(GraphAnn.searchMany(store, emb, queries, "q_id", "qv",
      "vec_id", "embedding", k = 10, beamWidth = 24, maxHops = 12,
      nSeeds = 4, srcBuckets = Some(16)))
    assert(rows(GraphAnn.searchMany(store, vstore, queries, "q_id", "qv",
      "vec_id", "embedding", k = 10, beamWidth = 24, maxHops = 12,
      nSeeds = 4, srcBuckets = Some(16), idBuckets = Some(8))) == flat,
      "distributed bucketed-corpus search must equal the flat answer")
    assert(rows(GraphAnn.searchManyLocal(store, vstore, queries, "q_id", "qv",
      "vec_id", "embedding", k = 10, beamWidth = 24, maxHops = 12,
      nSeeds = 4, srcBuckets = Some(16), idBuckets = Some(8))) == flat,
      "local bucketed-corpus search must equal the flat answer")
    // filtered mode composes with the bucketed corpus
    val flatF = rows(GraphAnn.searchMany(store, emb, queries, "q_id", "qv",
      "vec_id", "embedding", k = 10, beamWidth = 48, maxHops = 12,
      nSeeds = 4, srcBuckets = Some(16),
      resultFilter = Some(pmod(col("vec_id"), lit(4L)) === 2L)))
    assert(rows(GraphAnn.searchMany(store, vstore, queries, "q_id", "qv",
      "vec_id", "embedding", k = 10, beamWidth = 48, maxHops = 12,
      nSeeds = 4, srcBuckets = Some(16), idBuckets = Some(8),
      resultFilter = Some(pmod(col("vec_id"), lit(4L)) === 2L))) == flatF)
    // guard: idBuckets against a flat corpus refuses loudly
    val err = intercept[IllegalArgumentException] {
      GraphAnn.searchMany(store, emb, queries, "q_id", "qv",
        "vec_id", "embedding", k = 10, beamWidth = 24, idBuckets = Some(8))
    }
    assert(err.getMessage.contains("id_bucket"))
  }

  test("size-guarded graph tombstone fold (round 11): a bulk node delete " +
      "past the broadcast bound degrades to an unhinted join with " +
      "IDENTICAL live edges") {
    import spark.implicits._
    val corpus = emb.filter(col("vec_id") < 300)
    val g0 = GraphAnn.buildGraph(corpus, "vec_id", "embedding", m = 8)
    val root = java.nio.file.Files.createTempDirectory("gann-guard").toString
    GraphAnn.writeGraphStore(spark, root, g0, nBuckets = 16)
    GraphAnn.deleteNodesFromStore(spark, root,
      (0L until 80L).map(_ * 3 + 1).toDF("vec_id"), "vec_id")
    def edges(maxB: Long) = rowsOf(
      GraphAnn.readGraphStoreLatest(spark, root, maxBroadcastTombstones = maxB))
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val guarded = GraphAnn.readGraphStoreLatest(
        spark, root, maxBroadcastTombstones = 0L)
      assert(!guarded.queryExecution.executedPlan.toString
        .contains("BroadcastHashJoin"),
        "guarded fold must not plan a broadcast")
      assert(GraphAnn.readGraphStoreLatest(spark, root)
        .queryExecution.executedPlan.toString.contains("BroadcastHashJoin"),
        "small-tombstone fold must keep the broadcast fast path")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
    assert(edges(0L) == edges(IvfIndex.DefaultMaxBroadcastTombstones),
      "guarded and broadcast folds must return identical live edges")
    val del = (0L until 80L).map(_ * 3 + 1).toSet
    assert(edges(0L).nonEmpty &&
      edges(0L).forall { case (s, d) => !del(s) && !del(d) })
  }
}
