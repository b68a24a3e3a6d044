package graft.operators

import graft.functions.VectorFunctions
import graft.operators.IterCheckpoint.Pinnable
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Graph-based approximate nearest-neighbor search (VERDICT r8 task 5 —
  * the HNSW-equivalent tier; reference parity target: the Qdrant default
  * index behind `internal/vectordb/vectordb.go:94-104`): a materialized
  * navigable neighbor graph searched by iterative beam expansion. The
  * public idea is NSW/HNSW (Malkov & Yashunin, 2016) re-expressed in
  * Spark's execution model:
  *
  *   - '''build''' = one LSH-candidate sweep (the [[VectorSearch]] banding
  *     machinery — linear shuffle, quadratic only inside buckets) keeps
  *     the top-m true-cosine neighbors per node, unioned with a
  *     deterministic '''skip ring''' — nodes sorted by (md5(id), id) and
  *     linked at power-of-two offsets — giving the O(log n)-diameter
  *     long-range links an insertion-order-grown HNSW gets from its upper
  *     layers. Both legs are deterministic (seeded hyperplanes, md5 draw),
  *     so the graph is replayable; out-degree is bounded by m (the
  *     per-src top-m cap) + 2·ringLevels.
  *   - '''search''' = beam traversal. Per hop, the unexpanded beam members
  *     join the edge table for their neighbors (an equality join that
  *     partition-prunes when the graph is stored partitioned by src
  *     bucket), unseen neighbors are scored against the query, and the
  *     beam keeps the global top-beamWidth. Terminates when no beam
  *     member is unexpanded (the HNSW ef-search stopping rule in hop
  *     form) or at maxHops. Cost is O(beam · degree · hops) distance
  *     evaluations '''independent of corpus size''' — the property that
  *     puts a ≥0.95-recall point on the tuner's curve at a probe cost IVF
  *     needs nProbe≈nCells to reach.
  *
  * [[searchMany]] is the batch path: all queries traverse simultaneously
  * as (query, node) state DataFrames with per-round [[IterCheckpoint]]
  * pinning — the same iterative-frontier discipline as PageRank/k-core.
  * [[localBeam]] is the bit-identical driver-side twin (the
  * tuneForRecall audit-sample contract) used by [[AnnTuner]] to measure
  * recall/cost curves; GraphAnnSpec proves the two paths agree per query.
  */
object GraphAnn {

  /** Build the navigable neighbor graph: directed edges (src, dst), the
    * union of per-node top-`m` LSH-candidate cosine neighbors
    * (symmetrized — an undirected near edge is navigable from both ends)
    * and the deterministic skip ring. Store partitioned/bucketed by `src`
    * so per-hop adjacency lookups prune at the source.
    *
    * `ringStride` spaces the ring levels (offsets 2^0, 2^stride,
    * 2^2·stride, … < n): stride 2 halves the long-link degree while
    * keeping the diameter logarithmic. Out-degree per node is bounded by
    * m + 2·⌈log2(n)/stride⌉ regardless of corpus size.
    *
    * '''nBits is the build's scale knob''': the candidate stage is
    * quadratic INSIDE each of the 2^nBits buckets per table, so nBits
    * must grow with the corpus to hold per-bucket membership bounded
    * (~10³-10⁴ rows — the fixture default 2 is sized for 10³-scale test
    * tables, a 10⁹-row corpus wants ~18-20 bits). Fewer collisions per
    * table lose near-edge recall; compensate with `nTables` (linear
    * cost), and note the skip ring keeps the graph navigable even where
    * LSH under-links a node — beam recall degrades gracefully, gated in
    * RecallSpec at the fixture operating point.
    */
  def buildGraph(
      emb: DataFrame, idCol: String, vecCol: String,
      m: Int = 12, nBits: Int = 2, dim: Int = 64, nTables: Int = 4,
      ringStride: Int = 2, scoreScale: Int = 6,
      refineIters: Int = 0): DataFrame = {
    require(m > 0, s"m must be positive, got $m")
    require(ringStride >= 1, s"ringStride must be >= 1, got $ringStride")
    require(refineIters >= 0, s"refineIters must be >= 0, got $refineIters")
    // near leg: LSH candidate pairs scored exactly, symmetrized, top-m per
    // src — the banded (never all-pairs) candidate machinery, then a
    // per-node window (partitioned by src: no single-partition exchange)
    val pairs = VectorSearch.cosinePairsLsh(
      emb, idCol, vecCol, threshold = -1.0, nBits, dim, nTables, scoreScale)
    val sym = pairs.select(col("vec_a").as("src"), col("vec_b").as("dst"), col("score"))
      .unionByName(pairs.select(col("vec_b").as("src"), col("vec_a").as("dst"), col("score")))
    val w = Window.partitionBy(col("src")).orderBy(col("score").desc, col("dst").asc)
    val near0 = sym.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= m)
      .select(col("src"), col("dst"))
    val near =
      if (refineIters == 0) near0
      else refineNearEdges(emb, idCol, vecCol,
        near0.select(col("src").cast("long"), col("dst").cast("long")),
        m, refineIters, scoreScale)

    // long leg: the skip ring. Nodes take a deterministic ring position by
    // (md5(id), id) — the centroidsByDraw ordering — via the
    // range-partitioned global row number (repo discipline: no
    // single-partition sort), then link to ±2^(j·stride) ring neighbors.
    val ring = ScaleOps.globalRowNumber(
      emb.select(col(idCol).cast("long").as("id"),
        md5(col(idCol).cast("string")).as("__d")),
      Seq(col("__d"), col("id")), as = "rn")
      .select(col("id"), col("rn"))
      .localCheckpoint() // pin ONE range cut: rn is joined against itself
    val n = ring.count()
    val offsets = Iterator.iterate(1L)(_ << ringStride)
      .takeWhile(o => o < n).toSeq
    val hops = ring
      .withColumn("__off", explode(typedLit(offsets)))
      .withColumn("rn2", pmod(col("rn") - 1 + col("__off"), lit(n)) + 1)
    val longLinks = hops.as("a")
      .join(ring.select(col("rn").as("rn2"), col("id").as("dst")), "rn2")
      .select(col("a.id").as("src"), col("dst"))
    val back = longLinks.select(col("dst").as("src"), col("src").as("dst"))

    near.select(col("src").cast("long"), col("dst").cast("long"))
      .unionByName(longLinks).unionByName(back)
      .filter(col("src") =!= col("dst"))
      .distinct()
  }

  /** NN-descent refinement of the near-edge list (Dong, Charikar & Li,
    * 2011 — "a neighbor of a neighbor is likely a neighbor"): each round
    * proposes every node's reversed edges and two-hop neighbors as
    * candidates, scores them exactly, and keeps the top-m per node. The
    * candidate volume per node is bounded by degree² — corpus-size-
    * independent — and each round is two equality self-joins plus the
    * per-node window, pinned with [[IterCheckpoint]]. On LSH-built graphs
    * the first round recovers most of the true-kNN edges the bucketing
    * missed (GraphAnnSpec measures mean neighbor cosine strictly rising),
    * which is the cheapest recall lift available to [[searchMany]]:
    * better edges beat a wider beam.
    */
  def refineNearEdges(
      emb: DataFrame, idCol: String, vecCol: String, near: DataFrame,
      m: Int, iters: Int, scoreScale: Int = 6): DataFrame = {
    require(m > 0 && iters >= 0, s"bad refine config m=$m iters=$iters")
    val vecs = emb.select(col(idCol).cast("long").as("__vid"),
      VectorFunctions.asFloatArray(col(vecCol)).as("__v"))
    val w = Window.partitionBy(col("src")).orderBy(col("score").desc, col("dst").asc)
    var g = near.select(col("src").cast("long"), col("dst").cast("long"))
      .iterCheckpoint()
    for (_ <- 1 to iters) {
      val twoHop = g.as("a").join(g.as("b"), col("a.dst") === col("b.src"))
        .select(col("a.src").as("src"), col("b.dst").as("dst"))
      val cand = g
        .unionByName(g.select(col("dst").as("src"), col("src").as("dst")))
        .unionByName(twoHop)
        .filter(col("src") =!= col("dst"))
        .distinct()
      g = cand
        .join(vecs.withColumnRenamed("__vid", "src"), "src")
        .withColumnRenamed("__v", "__sv")
        .join(vecs.withColumnRenamed("__vid", "dst"), "dst")
        .withColumn("score",
          round(VectorFunctions.cosine(col("__sv"), col("__v")), scoreScale))
        .withColumn("__rn", row_number().over(w))
        .filter(col("__rn") <= m)
        .select(col("src"), col("dst"))
        .iterCheckpoint()
    }
    g
  }

  /** Incremental node insertion — the HNSW-insert shape (reference: the
    * continuous upsert path behind vectordb.go:117-193, which inserts
    * points into a live graph index): each NEW node finds its top-m
    * neighbors by running the existing graph's OWN batch beam search
    * ([[searchMany]] with the new vectors as the query batch — delta-sized
    * work, never a rebuild), links both directions, and chains to its
    * predecessor in (md5(id), id) order so a batch of new nodes stays
    * connected even where beam links are weak. Back-edges onto existing
    * nodes are then DEGREE-PRUNED: any src whose out-degree exceeds
    * `maxDegree` keeps its top-`maxDegree` edges by exact cosine — the
    * HNSW neighbor-list shrink, bounded to the touched nodes.
    *
    * Returns the updated edge list. Determinism: searchMany, the chain
    * order and the prune ranking are all (round-6 score, id)-ordered, so
    * the grown graph is replayable. Staleness contract: repeated appends
    * preserve navigability (the chain + pruned near edges), but the skip
    * ring is NOT extended (ring positions are a build-time total order) —
    * after the corpus grows several-fold, rebuild via [[buildGraph]]; the
    * GraphAnnSpec drift gate measures the appended graph's beam recall
    * against a fresh rebuild.
    */
  def appendNodes(
      graph: DataFrame, corpus: DataFrame, newVecs: DataFrame,
      idCol: String, vecCol: String,
      m: Int = 12, maxDegree: Int = 48, beamWidth: Int = 24,
      maxHops: Int = 12, nSeeds: Int = 4, expandPerHop: Int = 0,
      scoreScale: Int = 6): DataFrame = {
    require(m > 0 && maxDegree >= m, s"need maxDegree >= m > 0, got $maxDegree/$m")
    val g = graph.select(col("src").cast("long"), col("dst").cast("long"))
    // 1) each new node's top-m neighbors among the EXISTING corpus, found
    //    by the graph's own search (delta-sized: one batch traversal)
    val queries = newVecs.select(col(idCol).cast("long").as("q_id"),
      col(vecCol).as("qv"))
    val nn = searchMany(g, corpus, queries, "q_id", "qv", idCol, vecCol,
      k = m, beamWidth = beamWidth, maxHops = maxHops, nSeeds = nSeeds,
      expandPerHop = expandPerHop, scoreScale = scoreScale)
      .select(col("query_id").as("src"), col("neighbor_id").as("dst"))
    // 2) intra-batch chain in (md5(id), id) order — connectivity insurance
    //    for the batch itself (new nodes may be each other's best links)
    val ordered = ScaleOps.globalRowNumber(
      newVecs.select(col(idCol).cast("long").as("id"),
        md5(col(idCol).cast("string")).as("__d")),
      Seq(col("__d"), col("id")), as = "rn")
      .select(col("id"), col("rn")).localCheckpoint()
    val chain = ordered.as("a")
      .join(ordered.select((col("rn") - 1).as("rn"), col("id").as("dst")), "rn")
      .select(col("a.id").as("src"), col("dst"))
    val newEdges = nn
      .unionByName(nn.select(col("dst").as("src"), col("src").as("dst")))
      .unionByName(chain)
      .unionByName(chain.select(col("dst").as("src"), col("src").as("dst")))
      .filter(col("src") =!= col("dst"))
    val grown = g.unionByName(newEdges).distinct().localCheckpoint()
    // 3) degree prune, bounded to the srcs the append touched: re-rank
    //    their edge lists by exact cosine and keep top-maxDegree
    val touched = newEdges.select("src").distinct()
    val all = corpus.select(col(idCol).cast("long").as("__vid"),
        VectorFunctions.asFloatArray(col(vecCol)).as("__v"))
      .unionByName(newVecs.select(col(idCol).cast("long").as("__vid"),
        VectorFunctions.asFloatArray(col(vecCol)).as("__v")))
    val touchedEdges = grown.join(touched, "src")
    val w = Window.partitionBy(col("src")).orderBy(col("score").desc, col("dst").asc)
    val pruned = touchedEdges
      .join(all.withColumnRenamed("__vid", "src"), "src")
      .withColumnRenamed("__v", "__sv")
      .join(all.withColumnRenamed("__vid", "dst"), "dst")
      .withColumn("score",
        round(VectorFunctions.cosine(col("__sv"), col("__v")), scoreScale))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= maxDegree)
      .select(col("src"), col("dst"))
    grown.join(touched, Seq("src"), "left_anti").unionByName(pruned)
  }

  /** [[appendNodes]] against a versioned store: read the current graph,
    * grow it with the delta, publish the result as a NEW snapshot version
    * (degree pruning rewrites touched nodes' lists, so the commit is an
    * overwrite, not an append — readers pinned to the old version are
    * untouched until expire). Returns the committed version.
    */
  def appendNodesToStore(
      spark: org.apache.spark.sql.SparkSession, root: String,
      corpus: DataFrame, newVecs: DataFrame, idCol: String, vecCol: String,
      m: Int = 12, maxDegree: Int = 48, nBuckets: Int = 64): Int = {
    val g = readGraphStore(spark, root).select(col("src"), col("dst"))
    writeGraphStore(spark, root,
      appendNodes(g, corpus, newVecs, idCol, vecCol, m, maxDegree), nBuckets)
  }

  /** Persist the neighbor graph as a [[graft.sources.SnapshotStore]] root
    * partitioned by `src_bucket = pmod(src, nBuckets)` — the serving
    * layout: a hop's adjacency lookup reads only the frontier's buckets
    * (≤ nBuckets dirs, the StreamingDedup store discipline), and rebuilds
    * commit as new versions readers never race. Returns the version.
    */
  def writeGraphStore(
      spark: org.apache.spark.sql.SparkSession, root: String,
      graph: DataFrame, nBuckets: Int = 64): Int = {
    require(nBuckets > 0, s"nBuckets must be positive, got $nBuckets")
    graft.sources.SnapshotStore.overwrite(spark, root,
      graph.withColumn("src_bucket",
        pmod(col("src"), lit(nBuckets.toLong)).cast("int")),
      partitionBy = Seq("src_bucket"))
  }

  /** Open the versioned graph store for [[searchMany]] (pass the matching
    * `srcBuckets = Some(nBuckets)` so hops prune partitions).
    */
  def readGraphStore(
      spark: org.apache.spark.sql.SparkSession, root: String,
      version: Option[Int] = None): DataFrame =
    graft.sources.SnapshotStore.read(spark, root, version)

  /** Deterministic entry points: the `nSeeds` corpus ids with the smallest
    * (md5(id), id) — the same RNG-free draw as IVF's centroid selection,
    * so every search (and the DuckDB-replayable queries downstream) starts
    * from the same nodes. One TakeOrdered job, driver image ≤ nSeeds.
    */
  def entryPoints(
      emb: DataFrame, idCol: String, nSeeds: Int): Seq[Long] = {
    require(nSeeds > 0, s"nSeeds must be positive, got $nSeeds")
    emb.select(md5(col(idCol).cast("string")).as("__d"),
        col(idCol).cast("long").as("__id"))
      .orderBy(col("__d"), col("__id"))
      .limit(nSeeds)
      .collect().map(_.getLong(1)).toSeq
  }

  /** Batch beam search: every row of `queries` traverses the graph
    * simultaneously. Returns (query_id, neighbor_id, score, rn) — the
    * [[VectorSearch.knnJoin]] shape, k rows per query.
    *
    * Iteration state is two DataFrames pinned per round with the
    * [[IterCheckpoint]] discipline: `beam` (query × candidate × score ×
    * expanded flag, ≤ beamWidth rows per query) and `visited` (query ×
    * node ever scored, ≤ beam·degree·hops rows per query — bounded by the
    * SEARCH PARAMETERS, not the corpus). Per hop: unexpanded beam members
    * look up their adjacency (equality join on src), unseen neighbors are
    * anti-joined against `visited`, fetched from the corpus by id
    * (equality join — AQE broadcasts the small side), scored against
    * their query's vector, and the beam re-tops. Self-matches
    * (candidate == query id) are excluded like knnJoin.
    *
    * `expandPerHop` caps how many unexpanded members expand per hop
    * (best-first order): 0 expands the whole frontier; small values
    * approach the sequential ef-search's evaluation economy at more hops.
    *
    * `srcBuckets`: when `graph` is a [[writeGraphStore]] layout, pass its
    * nBuckets and every hop restricts the edge scan to the frontier's
    * `src_bucket` values FIRST (a partition-pruning literal predicate —
    * one bounded ≤ nBuckets driver image per hop) before the equality
    * join on src; GraphAnnSpec plan-gates the PartitionFilter.
    */
  def searchMany(
      graph: DataFrame, corpus: DataFrame, queries: DataFrame,
      qId: String, qVec: String, idCol: String, vecCol: String,
      k: Int, beamWidth: Int = 32, maxHops: Int = 12, nSeeds: Int = 4,
      expandPerHop: Int = 0, scoreScale: Int = 6,
      srcBuckets: Option[Int] = None): DataFrame = {
    require(k > 0 && beamWidth >= k, s"need beamWidth >= k > 0, got $beamWidth/$k")
    srcBuckets.foreach(nb => require(nb > 0 && graph.columns.contains("src_bucket"),
      s"srcBuckets=Some($nb) needs a writeGraphStore layout with src_bucket"))
    val seeds = entryPoints(corpus, idCol, nSeeds)
    val c = corpus.select(col(idCol).cast("long").as("id"),
      VectorFunctions.asFloatArray(col(vecCol)).as("__cv"))
    val q = queries.select(col(qId).cast("long").as("__qid"),
      VectorFunctions.asFloatArray(col(qVec)).as("__qv"))
    val g = graph.select(
      col("src").cast("long") +: col("dst").cast("long") +:
        (if (srcBuckets.isDefined) Seq(col("src_bucket")) else Nil): _*)

    def score(cand: DataFrame): DataFrame =
      cand.join(c, "id")
        .join(broadcast(q), "__qid")
        .select(col("__qid"), col("id"),
          round(VectorFunctions.cosine(col("__cv"), col("__qv")), scoreScale)
            .as("score"))
        .filter(col("id") =!= col("__qid"))

    val seedCand = q.select(col("__qid"))
      .withColumn("id", explode(typedLit(seeds)))
    var beam = score(seedCand)
      .withColumn("expanded", lit(false)).iterCheckpoint(false)
    var visited = seedCand.iterCheckpoint(false)

    val beamW = Window.partitionBy(col("__qid"))
      .orderBy(col("score").desc, col("id").asc)
    var hop = 0
    var frontierRows = beam.filter(!col("expanded")).count()
    while (hop < maxHops && frontierRows > 0) {
      val unexp = beam.filter(!col("expanded"))
      // pinned LAZILY: the checkpoint node breaks lineage at analysis
      // time (which is what defuses the ambiguous filter-of-self join
      // against `beam`), while materialization folds into this hop's one
      // real job — the beam pin below — instead of costing its own job;
      // the hop loop is driver-latency-bound locally, so job count IS
      // the entry's cost
      val frontier = (
        if (expandPerHop <= 0) unexp
        else unexp.withColumn("__fr", row_number().over(beamW))
          .filter(col("__fr") <= expandPerHop).drop("__fr")
      ).iterCheckpoint(false)
      // with a bucketed store: restrict the edge scan to the frontier's
      // buckets first — a literal partition predicate (bounded driver
      // image, ≤ nBuckets ints per hop), the actual match stays the join
      val gSlice = srcBuckets match {
        case Some(nb) =>
          val buckets = frontier
            .select(pmod(col("id"), lit(nb.toLong)).cast("int").as("__b"))
            .distinct().collect().map(_.getInt(0)).toSeq
          g.where(col("src_bucket").isin(buckets: _*)).drop("src_bucket")
        case None => g
      }
      val nbrs = frontier.select(col("__qid"), col("id").as("src"))
        .join(gSlice, "src")
        .select(col("__qid"), col("dst").as("id"))
        .distinct()
        .join(visited, Seq("__qid", "id"), "left_anti")
      val fresh = score(nbrs).withColumn("expanded", lit(false))
      val expandedIds = frontier.select(col("__qid"), col("id"))
      val marked = beam.as("b").join(expandedIds.as("e"),
          col("b.__qid") === col("e.__qid") && col("b.id") === col("e.id"),
          "left_semi")
        .withColumn("expanded", lit(true))
        .unionByName(beam.join(expandedIds, Seq("__qid", "id"), "left_anti"))
      beam = marked.unionByName(fresh)
        .withColumn("__rn", row_number().over(beamW))
        .filter(col("__rn") <= beamWidth)
        .drop("__rn")
        .iterCheckpoint(false)
      visited = visited.unionByName(nbrs).iterCheckpoint(false)
      // the loop-control count is the hop's ONE materializing action —
      // it computes the (lazy) beam pin; the visited pin computes inside
      // the next hop's first job
      frontierRows = beam.filter(!col("expanded")).count()
      hop += 1
    }
    beam.withColumn("rn", row_number().over(beamW))
      .filter(col("rn") <= k)
      .select(col("__qid").as("query_id"), col("id").as("neighbor_id"),
        col("score"), col("rn").cast("int").as("rn"))
  }

  /** Result of one [[localBeam]] search: ranked (id, score) plus the
    * evaluation count (distinct nodes actually SCORED — the probe cost;
    * the excluded query id and adjacency targets absent from the audit
    * sample enter `visited` but cost nothing and are not counted).
    */
  final case class BeamResult(hits: Seq[(Long, Double)], scored: Int, hops: Int)

  /** The driver-side twin of [[searchMany]] for ONE query over a collected
    * audit sample — hop-for-hop the same algorithm (expand the unexpanded
    * beam, cap at `expandPerHop` best-first, score unseen neighbors with
    * round-6 cosine, keep top beamWidth by (score desc, id asc)), so the
    * distributed and local paths return identical hits (GraphAnnSpec).
    * [[AnnTuner]] measures recall/cost curves with this, exactly like
    * `IvfIndex.tuneForRecall` measures IVF locally after real distributed
    * assignment passes.
    */
  def localBeam(
      vecs: Map[Long, Array[Float]], adj: Map[Long, Array[Long]],
      seeds: Seq[Long], queryVec: Array[Float], excludeId: Option[Long],
      k: Int, beamWidth: Int = 32, maxHops: Int = 12,
      expandPerHop: Int = 0): BeamResult = {
    require(k > 0 && beamWidth >= k, s"need beamWidth >= k > 0, got $beamWidth/$k")
    def sc(id: Long): Double =
      IvfIndex.roundHalfUp(IvfIndex.cosineScalar(vecs(id), queryVec), 6)
    val ord = Ordering.by[(Long, Double), (Double, Long)] {
      case (id, s) => (-s, id)
    }
    val visited = scala.collection.mutable.Set.empty[Long]
    visited ++= seeds
    val seedScored = seeds.filterNot(excludeId.contains)
      .filter(vecs.contains).map(id => (id, sc(id)))
    var scoredCount = seedScored.length
    var beam = seedScored.sorted(ord).take(beamWidth)
    var expanded = Set.empty[Long]
    var hop = 0
    var frontier = beam.map(_._1).filterNot(expanded)
    while (hop < maxHops && frontier.nonEmpty) {
      val batch =
        if (expandPerHop <= 0) frontier else frontier.take(expandPerHop)
      val nbrs = batch.flatMap(id => adj.getOrElse(id, Array.empty[Long]))
        .distinct.filterNot(visited)
      visited ++= nbrs
      val fresh = nbrs.filterNot(excludeId.contains)
        .filter(vecs.contains).map(id => (id, sc(id)))
      scoredCount += fresh.length
      expanded ++= batch
      beam = (beam ++ fresh).sorted(ord).take(beamWidth)
      frontier = beam.map(_._1).filterNot(expanded)
      hop += 1
    }
    BeamResult(beam.take(k), scoredCount, hop)
  }

  /** Collect a (bounded) graph into an adjacency map for [[localBeam]] —
    * the audit-sample leg of the tuner. Caller bounds the input.
    */
  def collectAdjacency(graph: DataFrame): Map[Long, Array[Long]] =
    graph.select(col("src").cast("long"), col("dst").cast("long"))
      .collect()
      .groupBy(_.getLong(0))
      .map { case (s, rows) => s -> rows.map(_.getLong(1)).sorted }
}
