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
    def edges(maxB: Long, maxDriver: Long) = rowsOf(
      GraphAnn.readGraphStoreLatest(spark, root,
        maxBroadcastTombstones = maxB, maxDriverTombstoneRows = maxDriver))
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val guarded = GraphAnn.readGraphStoreLatest(
        spark, root, maxBroadcastTombstones = 0L, maxDriverTombstoneRows = 0L)
      assert(!guarded.queryExecution.executedPlan.toString
        .contains("BroadcastHashJoin"),
        "guarded fold must not plan a broadcast")
      assert(GraphAnn.readGraphStoreLatest(spark, root,
          maxDriverTombstoneRows = 0L)
        .queryExecution.executedPlan.toString.contains("BroadcastHashJoin"),
        "small-tombstone join fold must keep the broadcast fast path")
      // round 12: the DEFAULT path folds small tombstone sets as a
      // driver-literal scan predicate — join-free consumer plans
      assert(!GraphAnn.readGraphStoreLatest(spark, root)
        .queryExecution.executedPlan.toString.contains("Join"),
        "driver-literal fold must plan no join at all")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
    // all three tiers — driver literal (default), broadcast join,
    // shuffle join — return identical live edges
    val viaLiteral = edges(IvfIndex.DefaultMaxBroadcastTombstones,
      GraphAnn.MaxDriverTombstoneRows)
    assert(viaLiteral == edges(IvfIndex.DefaultMaxBroadcastTombstones, 0L),
      "driver-literal and broadcast folds must return identical live edges")
    assert(viaLiteral == edges(0L, 0L),
      "driver-literal and shuffle folds must return identical live edges")
    val del = (0L until 80L).map(_ * 3 + 1).toSet
    assert(viaLiteral.nonEmpty &&
      viaLiteral.forall { case (s, d) => !del(s) && !del(d) })
  }

  test("ring-stitched append (round 12, VERDICT r11 task 1): append waves " +
      "totaling MORE than the build size keep ring coverage at 1.0 and " +
      "beam recall within tolerance of a fresh rebuild — WITHOUT ever " +
      "calling buildGraph — while the same waves un-stitched plan the old " +
      "full rebuild; stitched fingers survive the degree prune") {
    import graft.tools.RecallHarness
    val base = emb.filter(col("vec_id") < 150)
    val root = java.nio.file.Files.createTempDirectory("graft-stitch").toString
    val ringRoot = java.nio.file.Files
      .createTempDirectory("graft-stitch-ring").toString
    val g0 = GraphAnn.buildGraph(base, "vec_id", "embedding", m = 8)
    GraphAnn.writeGraphStore(spark, root, g0, nBuckets = 8)
    RingRoster.write(spark, ringRoot, base.select(col("vec_id")), "vec_id",
      nBuckets = 16)
    // four 50-node waves: 150 -> 350 (2.3x the build — past the documented
    // several-fold staleness cliff)
    val waves = (0 until 4).map(w =>
      emb.filter(col("vec_id") >= 150 + w * 50 && col("vec_id") < 200 + w * 50))
    // pin the roster version before the LAST wave so its expected fingers
    // are replayable after the append mutates the roster
    var rosterVBeforeLast = 0
    waves.zipWithIndex.foreach { case (delta, i) =>
      if (i == 3) rosterVBeforeLast = graft.sources.SnapshotStore
        .currentVersion(spark, ringRoot).get
      GraphAnn.appendNodesToStore(spark, root, emb.filter(col("vec_id") < 150 + i * 50),
        delta, "vec_id", "embedding", m = 8, maxDegree = 32, nBuckets = 8,
        ringRoot = Some(ringRoot), rosterBuckets = 16)
    }
    val live = GraphAnn.readGraphStoreLatest(spark, root)
    // 1) every live source is a ring member: coverage vs the roster is 1.0
    val roster = RingRoster.read(spark, ringRoot)
    assert(RingRoster.read(spark, ringRoot).count() == 350)
    val cov = GraphAnn.ringCoverage(live, roster, "id")
    assert(cov == 1.0, f"stitched coverage must be 1.0, got $cov%.3f")
    // 2) the planner never reaches a ring decision on the stitched store
    val plan = IndexMaintenance.planGraph(spark, root, roster, "id")
    assert(!plan.exists(d => d.action == "rebuild" || d.action == "stitch_region"),
      s"stitched store must plan no ring repair: $plan")
    // ...while the SAME growth un-stitched (legacy roster = build ids)
    // crosses the cliff and plans the full rebuild
    val legacyPlan = IndexMaintenance.planGraph(
      spark, root, base.select(col("vec_id")), "vec_id")
    assert(legacyPlan.exists(_.action == "rebuild"),
      s"un-rostered view of 2.3x growth must plan a rebuild: $legacyPlan")
    // 3) the last wave's fingers (replayed against the pinned pre-append
    // roster) all survived the prune, both directions
    val expected = RingRoster.stitchFingers(spark, ringRoot,
      waves(3).select(col("vec_id")), "vec_id", ringStride = 2,
      nBuckets = 16, version = Some(rosterVBeforeLast))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(expected.nonEmpty, "the last wave must have stitched fingers")
    val edgeSet = live.select(col("src"), col("dst"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    expected.foreach { case (s, d) =>
      assert(edgeSet.contains((s, d)) && edgeSet.contains((d, s)),
        s"stitched finger ($s,$d) must survive the prune in both directions")
    }
    // 4) recall within tolerance of a fresh rebuild over the grown corpus
    val adj = GraphAnn.collectAdjacency(
      live.select(col("src"), col("dst")))
    val grownCorpus = emb.filter(col("vec_id") < 350)
    val fresh = GraphAnn.collectAdjacency(
      GraphAnn.buildGraph(grownCorpus, "vec_id", "embedding", m = 8))
    val vecsArr = RecallHarness.collectVecs(grownCorpus)
    val vecs = vecsArr.toMap
    val seeds = GraphAnn.entryPoints(grownCorpus, "vec_id", nSeeds = 4)
    def recallOf(a: Map[Long, Array[Long]]): Double = {
      val per = vecsArr.take(30).map { case (qid, qv) =>
        val exact = vecsArr.filter(_._1 != qid).map { case (id, v) =>
          (IvfIndex.roundHalfUp(IvfIndex.cosineScalar(v, qv), 6), id)
        }.sortBy { case (s, id) => (-s, id) }.take(10).map(_._2).toSet
        val r = GraphAnn.localBeam(vecs, a, seeds, qv, Some(qid),
          k = 10, beamWidth = 48, maxHops = 16, expandPerHop = 4)
        (exact intersect r.hits.map(_._1).toSet).size.toDouble / 10
      }
      per.sum / per.length
    }
    val (rStitched, rFresh) = (recallOf(adj), recallOf(fresh))
    info(f"recall@10 after 2.3x stitched growth: $rStitched%.4f vs fresh " +
      f"rebuild $rFresh%.4f")
    assert(rStitched >= rFresh - 0.05,
      f"stitched recall $rStitched%.4f drifted > 0.05 below fresh $rFresh%.4f")
  }

  test("driver-hosted append rewrite (round 12 optimization): a small-delta " +
      "appendNodesToStore through the driver twin commits the IDENTICAL " +
      "store image as the distributed rewrite — ring stitch and bucketed " +
      "corpus armed, warm cache on the driver side") {
    val base = emb.filter(col("vec_id") < 200)
    val delta = emb.filter(col("vec_id") >= 200 && col("vec_id") < 212)
    def build(tag: String): (String, String, String) = {
      val root = java.nio.file.Files.createTempDirectory(s"graft-dar-$tag").toString
      val vroot = java.nio.file.Files.createTempDirectory(s"graft-dar-v-$tag").toString
      val rroot = java.nio.file.Files.createTempDirectory(s"graft-dar-r-$tag").toString
      GraphAnn.writeGraphStore(spark, root,
        GraphAnn.buildGraph(base, "vec_id", "embedding", m = 8), nBuckets = 8)
      GraphAnn.writeVectorStore(spark, vroot, base.select(col("vec_id"),
        col("embedding")), "vec_id", nBuckets = 8)
      RingRoster.write(spark, rroot, base.select(col("vec_id")), "vec_id",
        nBuckets = 16)
      (root, vroot, rroot)
    }
    def append(roots: (String, String, String), bound: Int,
        cache: Option[GraphAnn.ServingCache]): Int = {
      val (root, vroot, rroot) = roots
      GraphAnn.appendNodesToStore(spark, root,
        GraphAnn.readVectorStore(spark, vroot), delta,
        "vec_id", "embedding", m = 8, maxDegree = 24, nBuckets = 8,
        beamWidth = 16, maxHops = 8, smallBatchBound = bound,
        idBuckets = Some(8), ringRoot = Some(rroot), rosterBuckets = 16,
        servingCache = cache)
    }
    def image(root: String): Set[(Long, Long, Int)] =
      GraphAnn.readGraphStore(spark, root)
        .select(col("src"), col("dst"), col("src_bucket"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val fastRoots = build("fast")
    val distRoots = build("dist")
    val cache = new GraphAnn.ServingCache
    cache.ensure(fastRoots._2, 1, fastRoots._1, 1)
    append(fastRoots, bound = 64, cache = Some(cache)) // driver twin (12 <= 64)
    append(distRoots, bound = 0, cache = None) // distributed rewrite forced
    assert(image(fastRoots._1) == image(distRoots._1),
      "driver-hosted rewrite must commit the identical store image")
    // the roster advanced identically on both sides
    def rosterIds(r: String): Set[Long] = RingRoster.read(spark, r)
      .select(col("id")).collect().map(_.getLong(0)).toSet
    assert(rosterIds(fastRoots._3) == rosterIds(distRoots._3))
    // and a SECOND wave through the warm handle still matches (the cache
    // advance path: masked ids, merged seeds, dropped touched adjacency)
    val delta2 = emb.filter(col("vec_id") >= 212 && col("vec_id") < 220)
    def append2(roots: (String, String, String), bound: Int,
        cache: Option[GraphAnn.ServingCache]): Int = {
      val (root, vroot, rroot) = roots
      GraphAnn.appendNodesToStore(spark, root,
        GraphAnn.readVectorStore(spark, vroot), delta2,
        "vec_id", "embedding", m = 8, maxDegree = 24, nBuckets = 8,
        beamWidth = 16, maxHops = 8, smallBatchBound = bound,
        idBuckets = Some(8), ringRoot = Some(rroot), rosterBuckets = 16,
        servingCache = cache)
    }
    cache.ensure(fastRoots._2, 1, fastRoots._1,
      graft.sources.SnapshotStore.currentVersion(spark, fastRoots._1).get)
    append2(fastRoots, bound = 64, cache = Some(cache))
    append2(distRoots, bound = 0, cache = None)
    assert(image(fastRoots._1) == image(distRoots._1),
      "second warm-cache wave must stay identical to the distributed path")
  }

  test("AnnTuner.tuneBeam (round 12, VERDICT r11 task 6): the serving-knob " +
      "grid measures recall/cost/hops per config on the audit sample, the " +
      "selection is the cheapest point meeting the target, and the winning " +
      "knobs thread straight into the serving paths") {
    val corpus = emb.filter(col("vec_id") < 300)
    val graph = GraphAnn.buildGraph(corpus, "vec_id", "embedding", m = 12)
      .localCheckpoint()
    def key(p: AnnTuner.BeamPoint) = (p.costFrac, p.meanHops,
      p.beamWidth.toDouble, p.maxHops.toDouble, p.nSeeds.toDouble,
      p.expandPerHop.toDouble)
    val t = AnnTuner.tuneBeam(corpus, "vec_id", "embedding", graph,
      targetRecall = 0.5, k = 10,
      beamGrid = Seq(16, 48), hopsGrid = Seq(2, 24),
      seedsGrid = Seq(4), expandGrid = Seq(0), nQueries = 20)
    assert(t.curve.length == 4, "the full grid must be measured")
    assert(t.curve.forall(p =>
      p.recall >= 0 && p.recall <= 1 && p.costFrac > 0 && p.costFrac <= 1))
    // fixture sanity: truncating the hop budget must actually cost recall,
    // so the selection has something to trade off
    val (minR, maxR) = (t.curve.map(_.recall).min, t.curve.map(_.recall).max)
    assert(minR < maxR, s"grid must span a recall range, got $minR..$maxR")
    // the selection invariant at a target the range straddles: best meets
    // it, every strictly cheaper point does not
    val target = (minR + maxR) / 2
    val t2 = AnnTuner.tuneBeam(corpus, "vec_id", "embedding", graph,
      targetRecall = target, k = 10,
      beamGrid = Seq(16, 48), hopsGrid = Seq(2, 24),
      seedsGrid = Seq(4), expandGrid = Seq(0), nQueries = 20)
    val best = t2.best.getOrElse(fail(s"a point above $target exists"))
    assert(best.recall >= target)
    import scala.math.Ordering.Implicits._
    assert(t2.curve.filter(p => key(p) < key(best)).forall(_.recall < target),
      "no strictly cheaper point may meet the target")
    // a floor target forces the globally cheapest point
    val t3 = AnnTuner.tuneBeam(corpus, "vec_id", "embedding", graph,
      targetRecall = 1e-9, k = 10,
      beamGrid = Seq(16, 48), hopsGrid = Seq(2, 24),
      seedsGrid = Seq(4), expandGrid = Seq(0), nQueries = 20)
    assert(t3.best.contains(t3.curve.minBy(key)))
    // the winner's knobs serve: k rows per query through searchManyLocal
    val q = emb.filter(col("vec_id") === 0)
      .select(col("vec_id").as("q_id"), col("embedding").as("qv"))
    val served = GraphAnn.searchManyLocal(
      graph, corpus, q, "q_id", "qv", "vec_id", "embedding",
      k = 10, beamWidth = best.beamWidth, maxHops = best.maxHops,
      nSeeds = best.nSeeds, expandPerHop = best.expandPerHop)
    assert(served.count() == 10)
  }

  test("warm serving cache (round 12, VERDICT r11 task 3): version-keyed " +
      "adjacency/vector/seed reuse returns EXACTLY the cold results, " +
      "survives this process's own insert commits via surgical advance, " +
      "and a foreign commit invalidates it through ensure()") {
    import spark.implicits._
    val base = emb.filter(col("vec_id") < 200)
      .select(col("vec_id"), col("embedding"))
    val dir = java.nio.file.Files.createTempDirectory("graft-warm")
    val groot = s"$dir/g"; val vroot = s"$dir/v"
    GraphAnn.writeGraphStore(spark, groot,
      GraphAnn.buildGraph(base, "vec_id", "embedding", m = 8), nBuckets = 8)
    GraphAnn.writeVectorStore(spark, vroot, base, "vec_id", nBuckets = 8)
    val queries = emb.filter(col("vec_id") < 3)
      .select(col("vec_id").as("q_id"), col("embedding").as("qv"))
    def gv = graft.sources.SnapshotStore.currentVersion(spark, groot).get
    def vv = graft.sources.SnapshotStore.currentVersion(spark, vroot).get
    def run(c: Option[GraphAnn.ServingCache],
        filter: Option[org.apache.spark.sql.Column] = None) =
      GraphAnn.searchManyLocal(
        GraphAnn.readGraphStore(spark, groot),
        GraphAnn.readVectorStoreLatest(spark, vroot, "vec_id"),
        queries, "q_id", "qv", "vec_id", "embedding",
        k = 8, beamWidth = 24, maxHops = 12, nSeeds = 4,
        srcBuckets = Some(8), idBuckets = Some(8),
        resultFilter = filter, cache = c)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
          r.getInt(3))).toSet
    val cold = run(None)
    val cache = new GraphAnn.ServingCache
    cache.ensure(vroot, vv, groot, gv)
    assert(run(Some(cache)) == cold, "first (filling) warm run must equal cold")
    assert(cache.vecCache.nonEmpty && cache.adjCache.nonEmpty &&
      cache.seedImage.nonEmpty, "the handle must be warm now")
    assert(run(Some(cache)) == cold, "fully-warm run must equal cold")
    // filtered searches bypass the handle (predicate-specific keep flags)
    val filt = Some(col("vec_id") % 2 === 0)
    assert(run(Some(cache), filt) == run(None, filt),
      "filtered warm must equal filtered cold (cache bypassed)")
    assert(run(Some(cache)) == cold, "bypass must not have corrupted the handle")

    // this process's own insert: processBatch advances the handle
    // surgically (mask -> insert -> advance), no reset
    val delta = emb.filter(col("vec_id") >= 200 && col("vec_id") < 204)
      .select(col("vec_id"), col("embedding"))
    val cfg = graft.streaming.StreamingGraphIndex.Config(
      m = 8, maxDegree = 32, nBuckets = 8, idBuckets = 8)
    assert(graft.streaming.StreamingGraphIndex.processBatch(
      spark, delta, 0L, groot, vroot, "vec_id", "embedding", cfg,
      Some(cache)).nonEmpty)
    assert(cache.corpusKey.contains((vroot, vv)) &&
      cache.graphKey.contains((groot, gv)),
      "the advance must stamp the post-commit versions")
    // the merged seed image is EXACTLY entryPoints over the grown corpus
    assert(cache.seedImage.get._2.map(_._2) == GraphAnn.entryPoints(
      GraphAnn.readVectorStoreLatest(spark, vroot, "vec_id"), "vec_id", 4),
      "seed merge must equal a fresh entryPoints draw")
    val coldGrown = run(None)
    assert(run(Some(cache)) == coldGrown,
      "post-insert warm results must equal a cold run over the new stores")
    // the inserted node actually serves warm: a probe query carrying node
    // 201's own vector (under another query id) must return 201 at rank 1
    val probe = emb.filter(col("vec_id") === 201).select(col("embedding").as("qv"))
      .crossJoin(emb.filter(col("vec_id") === 0).select(col("vec_id").as("q_id")))
    val top = GraphAnn.searchManyLocal(
      GraphAnn.readGraphStore(spark, groot),
      GraphAnn.readVectorStoreLatest(spark, vroot, "vec_id"),
      probe, "q_id", "qv", "vec_id", "embedding",
      k = 1, beamWidth = 24, maxHops = 12, nSeeds = 4,
      srcBuckets = Some(8), idBuckets = Some(8), cache = Some(cache))
      .collect()
    assert(top.length == 1 && top.head.getLong(1) == 201L,
      s"warm serve must find the inserted node, got ${top.toSeq}")

    // foreign commits (a delete this handle never saw): ensure() resets
    GraphAnn.deleteNodesFromStore(spark, groot,
      Seq(7L).toDF("vec_id"), "vec_id")
    GraphAnn.deleteFromVectorStore(spark, vroot,
      Seq(7L).toDF("vec_id"), "vec_id")
    cache.ensure(vroot, vv, groot, gv)
    assert(cache.vecCache.isEmpty && cache.adjCache.isEmpty &&
      cache.seedImage.isEmpty, "ensure must reset on a version mismatch")
    val coldDel = run(None)
    assert(run(Some(cache)) == coldDel,
      "post-invalidation warm results must equal cold over the folded view")
    assert(coldDel.forall(_._2 != 7L), "the deleted node must not serve")
  }

  test("corpus-store upsert/delete/compact (round 12, r11 ADVICE): a " +
      "re-ingested id replaces its vector in the latest view, pinned " +
      "versions still serve the old one, deletes fold out, compaction " +
      "folds physically, and a never-deleted-from store answers the " +
      "tombstone probe false") {
    import spark.implicits._
    val corpus = emb.filter(col("vec_id") < 120)
      .select(col("vec_id"), col("embedding"))
    val root = java.nio.file.Files.createTempDirectory("graft-vstore").toString
    val v1 = GraphAnn.writeVectorStore(spark, root, corpus, "vec_id", nBuckets = 8)
    // fresh store: the probe says no tombstone partition can exist, and the
    // latest view equals the raw view
    assert(!graft.sources.SnapshotStore.mayContainPartition(
      spark, root, "id_bucket", "-1"))
    assert(GraphAnn.readVectorStoreLatest(spark, root, "vec_id").count() == 120)
    // upsert id 3 with id 90's embedding
    val replacement = emb.filter(col("vec_id") === 90).select(col("embedding"))
      .crossJoin(Seq(3L).toDF("vec_id"))
      .select(col("vec_id"), col("embedding"))
    val v2 = GraphAnn.upsertToVectorStore(spark, root, replacement, "vec_id",
      nBuckets = 8)
    val live = GraphAnn.readVectorStoreLatest(spark, root, "vec_id")
    assert(live.count() == 120, "upsert of an existing id must not grow")
    val got = live.filter(col("vec_id") === 3)
      .collect().map(_.getAs[scala.collection.Seq[Float]]("embedding"))
    val want = emb.filter(col("vec_id") === 90)
      .collect().head.getAs[scala.collection.Seq[Float]]("embedding")
    assert(got.length == 1 && got.head == want, "latest view serves the NEW vector")
    // pinned v1 still serves the OLD vector (GDPR-style time travel)
    val old = GraphAnn.readVectorStoreLatest(spark, root, "vec_id", Some(v1))
      .filter(col("vec_id") === 3).collect()
      .map(_.getAs[scala.collection.Seq[Float]]("embedding"))
    val orig = emb.filter(col("vec_id") === 3)
      .collect().head.getAs[scala.collection.Seq[Float]]("embedding")
    assert(old.length == 1 && old.head == orig)
    // delete folds the id out; raw still carries the bytes
    GraphAnn.deleteFromVectorStore(spark, root,
      Seq(5L, 7L).toDF("vec_id"), "vec_id")
    assert(GraphAnn.readVectorStoreLatest(spark, root, "vec_id")
      .count() == 118)
    assert(GraphAnn.readVectorStore(spark, root)
      .filter(col("id_bucket") =!= -1).filter(col("vec_id") === 5)
      .count() == 1, "logical delete leaves bytes for pinned readers")
    // delete-then-reingest resurrects at the newer commit
    GraphAnn.upsertToVectorStore(spark, root,
      emb.filter(col("vec_id") === 5).select(col("vec_id"), col("embedding")),
      "vec_id", nBuckets = 8)
    assert(GraphAnn.readVectorStoreLatest(spark, root, "vec_id")
      .filter(col("vec_id") === 5).count() == 1)
    // compaction folds physically: no -1 partition, no superseded copies
    GraphAnn.compactVectorStore(spark, root, "vec_id", nBuckets = 8)
    val raw = GraphAnn.readVectorStore(spark, root)
    assert(raw.filter(col("id_bucket") === -1).isEmpty)
    assert(raw.count() == 119 && raw.filter(col("vec_id") === 7).isEmpty)
    assert(v2 == v1 + 1)
  }
}
