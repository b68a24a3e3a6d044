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
      scoreScale: Int = 6, reserveLong: Int = 8,
      smallBatchBound: Int = 64): DataFrame = {
    val g = graph.select(col("src").cast("long"), col("dst").cast("long"))
    val (touched, pruned) = appendRewrite(g, g, None, corpus, newVecs,
      idCol, vecCol, m, maxDegree, beamWidth, maxHops, nSeeds, expandPerHop,
      scoreScale, reserveLong, smallBatchBound, idBuckets = None)
    g.join(touched, Seq("src"), "left_anti").unionByName(pruned)
  }

  /** The append's delta kernel: (touched srcs, their REWRITTEN edge lists).
    * Everything here is delta-sized — the existing graph is only consulted
    * via (a) the batch beam traversal (bounded by search parameters) and
    * (b) a left-semi join fetching the TOUCHED srcs' current edges; the
    * union/dedup/prune all run over touched-src rows, never the full edge
    * table (VERDICT r9 task 1: the old whole-graph `distinct()` is gone).
    *
    * Degree prune with long-link reservation (round-10 ADVICE): ranking
    * purely by cosine evicts exactly the edges the ring exists for — a
    * build node's long-range links are its LOWEST-cosine edges by design,
    * so repeated appends would erode the O(log n) diameter faster than the
    * documented staleness contract. Per touched src the prune therefore
    * exempts (a) the intra-batch chain edges (the delta's connectivity
    * insurance) and (b) the `reserveLong` lowest-cosine PRE-EXISTING edges
    * (where the ring links live); the remaining budget fills by best
    * cosine. Total stays ≤ maxDegree; ordering is (exempt DESC, round-6
    * score DESC, dst ASC) — fully deterministic.
    */
  private def appendRewrite(
      g: DataFrame, searchGraph: DataFrame, srcBuckets: Option[Int],
      corpus: DataFrame, newVecs: DataFrame,
      idCol: String, vecCol: String,
      m: Int, maxDegree: Int, beamWidth: Int, maxHops: Int, nSeeds: Int,
      expandPerHop: Int, scoreScale: Int,
      reserveLong: Int, smallBatchBound: Int,
      idBuckets: Option[Int],
      stitched: Option[DataFrame] = None,
      cache: Option[ServingCache] = None): (DataFrame, DataFrame) = {
    require(m > 0 && maxDegree >= m, s"need maxDegree >= m > 0, got $maxDegree/$m")
    require(reserveLong >= 0 && reserveLong + 2 <= maxDegree,
      s"need 0 <= reserveLong <= maxDegree - 2, got $reserveLong/$maxDegree")
    // 1) each new node's top-m neighbors among the EXISTING corpus, found
    //    by the graph's own search (delta-sized: one batch traversal over
    //    `searchGraph` — the bucketed store layout when available, so each
    //    hop's edge scan partition-prunes to the frontier's buckets; small
    //    deltas take the driver-hosted twin — the hop-latency fix)
    val queries = newVecs.select(col(idCol).cast("long").as("q_id"),
      col(vecCol).as("qv"))
    val nn = searchMany(searchGraph, corpus, queries, "q_id", "qv", idCol,
      vecCol, k = m, beamWidth = beamWidth, maxHops = maxHops,
      nSeeds = nSeeds, expandPerHop = expandPerHop, scoreScale = scoreScale,
      srcBuckets = srcBuckets, smallBatchBound = smallBatchBound,
      idBuckets = idBuckets, cache = cache)
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
    val chainBoth = chain
      .unionByName(chain.select(col("dst").as("src"), col("src").as("dst")))
    // ring-stitched finger edges (round 12): symmetrized like the build's
    // long leg and EXEMPT from the degree prune like the chain — they are
    // the O(log n)-diameter insurance the prune must never evict
    val stitchBoth = stitched.map(sdf =>
      sdf.select(col("src").cast("long"), col("dst").cast("long"))
        .unionByName(sdf.select(col("dst").cast("long").as("src"),
          col("src").cast("long").as("dst"))))
    val exempt = stitchBoth.fold(chainBoth)(chainBoth.unionByName(_))
    val newEdges = nn
      .unionByName(nn.select(col("dst").as("src"), col("src").as("dst")))
      .withColumn("__chain", lit(false))
      .unionByName(exempt.withColumn("__chain", lit(true)))
      .filter(col("src") =!= col("dst"))
      .localCheckpoint()
    // 3) candidate edge lists of the TOUCHED srcs only: their pre-existing
    //    edges + the new edges, deduped per (src, dst) — a bucket-scoped
    //    aggregation, not a whole-graph distinct
    val touched = newEdges.select("src").distinct()
    val preExisting = g.join(touched, Seq("src"), "left_semi")
    val candidate0 = preExisting
      .withColumn("__pre", lit(true)).withColumn("__chain", lit(false))
      .unionByName(newEdges.withColumn("__pre", lit(false)))
      .groupBy(col("src"), col("dst"))
      .agg(max(col("__pre")).as("__pre"), max(col("__chain")).as("__chain"))
    // pinned when a bucketed corpus needs the endpoints' bucket image (the
    // collect below) — one materialization shared with the scoring joins
    val candidate =
      if (idBuckets.isDefined) candidate0.localCheckpoint() else candidate0
    // 4) degree prune with reservation: exact round-6 cosine per edge,
    //    chain + reserved-long edges sort first, budget fills by score.
    //    With a bucketed corpus store the vector fetch for the scoring
    //    joins is id_bucket-pruned to the candidate endpoints' buckets
    //    (candidate is delta-bounded, so the bucket image is too) —
    //    without it this is the append's one full-corpus scan.
    val corpusForScore = idBuckets match {
      case Some(nb) =>
        val buckets = candidate
          .select(pmod(col("src"), lit(nb.toLong)).cast("int").as("__b"))
          .union(candidate
            .select(pmod(col("dst"), lit(nb.toLong)).cast("int").as("__b")))
          .distinct().collect().map(_.getInt(0)).toSeq
        corpus.where(col("id_bucket").isin(buckets: _*))
      case None => corpus
    }
    val all = corpusForScore.select(col(idCol).cast("long").as("__vid"),
        VectorFunctions.asFloatArray(col(vecCol)).as("__v"))
      .unionByName(newVecs.select(col(idCol).cast("long").as("__vid"),
        VectorFunctions.asFloatArray(col(vecCol)).as("__v")))
    val scored = candidate
      .join(all.withColumnRenamed("__vid", "src"), "src")
      .withColumnRenamed("__v", "__sv")
      .join(all.withColumnRenamed("__vid", "dst"), "dst")
      .withColumn("score",
        round(VectorFunctions.cosine(col("__sv"), col("__v")), scoreScale))
      .select(col("src"), col("dst"), col("score"), col("__pre"), col("__chain"))
    val wLow = Window.partitionBy(col("src"))
      .orderBy(col("score").asc, col("dst").desc)
    val reserved = scored.filter(col("__pre"))
      .withColumn("__rl", row_number().over(wLow))
      .filter(col("__rl") <= reserveLong)
      .select(col("src"), col("dst"), lit(true).as("__res"))
    val wMain = Window.partitionBy(col("src"))
      .orderBy(col("__ex").desc, col("score").desc, col("dst").asc)
    val pruned = scored
      .join(reserved, Seq("src", "dst"), "left")
      .withColumn("__ex", col("__chain") || coalesce(col("__res"), lit(false)))
      .withColumn("__rn", row_number().over(wMain))
      .filter(col("__rn") <= maxDegree)
      .select(col("src"), col("dst"))
    (touched, pruned)
  }

  /** Spark-identical md5 hex of a long id (lowercase, 32 chars) — the
    * driver twin of `md5(col.cast("string"))`, shared by the serving
    * cache's seed image and the driver-hosted rewrite's chain order.
    */
  private[operators] def md5hexOf(id: Long): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(id.toString.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  /** The DRIVER-HOSTED twin of [[appendRewrite]] for SMALL deltas (round
    * 12 optimization — the searchManyLocal philosophy applied to the
    * insert's rewrite leg): the distributed rewrite executes ~40 AQE
    * stage-jobs of joins/windows per micro-insert to prune a few hundred
    * candidate edges, a fixed scheduling latency that dominates every
    * store insert (profiled ~100 stage-jobs/batch on the streaming-insert
    * bench entries). This kernel computes the SAME (touched, pruned) sets
    * with two bounded cluster reads — the touched srcs' current edges
    * (src_bucket-pruned point lookup) and the candidate endpoints'
    * vectors (id_bucket-pruned when available, reusing the serving
    * cache's vector map) — and the prune arithmetic on the driver:
    * identical scores (`IvfIndex.cosineScalar`/`roundHalfUp`, the proven
    * equivalents of the codegen round-6 cosine), identical orderings
    * (exempt desc, score desc, dst asc / score asc, dst desc), so the
    * rewritten edge lists are row-identical (GraphAnnSpec gates the full
    * store image against the distributed path). Driver image is bounded
    * by delta × (m + 2 + ring levels) srcs × maxDegree edges — the
    * smallBatchBound serving contract; large deltas stay distributed.
    */
  private def driverAppendRewrite(
      store: DataFrame, corpus: DataFrame,
      delta: IndexedSeq[(Long, Array[Float])],
      idCol: String, vecCol: String,
      m: Int, maxDegree: Int, beamWidth: Int, maxHops: Int, nSeeds: Int,
      expandPerHop: Int, scoreScale: Int, reserveLong: Int,
      srcBuckets: Int, idBuckets: Option[Int],
      stitchedRows: Seq[(Long, Long)],
      cache: Option[ServingCache]): (Seq[Long], Seq[(Long, Long)]) = {
    require(m > 0 && maxDegree >= m, s"need maxDegree >= m > 0, got $maxDegree/$m")
    require(reserveLong >= 0 && reserveLong + 2 <= maxDegree,
      s"need 0 <= reserveLong <= maxDegree - 2, got $reserveLong/$maxDegree")
    // 1) each new node's top-m neighbors by the graph's own beam search —
    //    the searchManyLocal kernel, rows staying on the driver
    val nn = searchManyLocalRows(store, corpus, delta, idCol, vecCol,
      k = m, beamWidth = beamWidth, maxHops = maxHops, nSeeds = nSeeds,
      expandPerHop = expandPerHop, scoreScale = scoreScale,
      srcBuckets = Some(srcBuckets), resultFilter = None,
      idBuckets = idBuckets, cache = cache)
      .map { case (qid, id, _, _) => (qid, id) }
    // 2) intra-batch chain in (md5(id), id) order (hex ASCII compares
    //    identically to Spark's binary string ordering)
    val ordered = delta.map(_._1).distinct
      .sortBy(id => (md5hexOf(id), id))
    val chain = ordered.zip(ordered.drop(1))
    // 3) merged candidate flags per (src, dst): pre-existing edges of the
    //    touched srcs + new edges (nn symmetrized, chain + stitched
    //    symmetrized and prune-exempt) — the appendRewrite groupBy/max
    val flags = scala.collection.mutable.Map.empty[(Long, Long), (Boolean, Boolean)]
    def mark(src: Long, dst: Long, pre: Boolean, chainF: Boolean): Unit =
      if (src != dst) {
        val (p0, c0) = flags.getOrElse((src, dst), (false, false))
        flags((src, dst)) = (p0 || pre, c0 || chainF)
      }
    nn.foreach { case (s, d) => mark(s, d, pre = false, chainF = false)
      mark(d, s, pre = false, chainF = false) }
    (chain ++ stitchedRows).foreach { case (s, d) =>
      mark(s, d, pre = false, chainF = true)
      mark(d, s, pre = false, chainF = true) }
    val touched = flags.keysIterator.map(_._1).toSeq.distinct.sorted
    val touchedBuckets = touched
      .map(id => (((id % srcBuckets) + srcBuckets) % srcBuckets).toInt).distinct
    // the touched srcs' current edge lists: one src_bucket-pruned point
    // lookup (the distributed path's left-semi join, as a literal scan)
    store.where(col("src_bucket").isin(touchedBuckets: _*))
      .where(col("src").isInCollection(touched))
      .select(col("src").cast("long"), col("dst").cast("long"))
      .collect()
      .foreach { r =>
        val (s, d) = (r.getLong(0), r.getLong(1))
        val (_, c0) = flags.getOrElse((s, d), (false, false))
        flags((s, d)) = (true, c0)
      }
    // 4) vectors for scoring: batch vectors (driver-held) + corpus point
    //    lookups (id_bucket-pruned, reusing the serving cache's map — an
    //    id absent from the corpus view drops its edges, exactly like the
    //    distributed inner scoring join)
    val batchVec = delta.toMap
    val vecCache = cache.map(_.vecCache).getOrElse(
      scala.collection.mutable.Map.empty[Long, Option[(Array[Float], Boolean)]])
    val endpoints = flags.keysIterator
      .flatMap { case (s, d) => Iterator(s, d) }.toSeq.distinct
    val missing = endpoints
      .filterNot(batchVec.contains).filterNot(vecCache.contains)
    if (missing.nonEmpty) {
      val cBase = corpus.select(
        col(idCol).cast("long").as("__vid") +:
          VectorFunctions.asFloatArray(col(vecCol)).as("__v") +:
          (if (idBuckets.isDefined) Seq(col("id_bucket")) else Nil): _*)
      val slice = idBuckets match {
        case Some(nb) =>
          val buckets = missing.map(id => (((id % nb) + nb) % nb).toInt).distinct
          cBase.where(col("id_bucket").isin(buckets: _*)).drop("id_bucket")
        case None => cBase
      }
      slice.where(col("__vid").isInCollection(missing)).collect().foreach { r =>
        vecCache(r.getLong(0)) =
          Some((r.getAs[scala.collection.Seq[Float]](1).toArray, true))
      }
      missing.foreach(id => vecCache.getOrElseUpdate(id, None))
    }
    def vecOf(id: Long): Option[Array[Float]] =
      batchVec.get(id).orElse(vecCache.get(id).flatMap(_.map(_._1)))
    // 5) score + degree prune with reservation, per touched src — the
    //    distributed windows' exact orderings on driver collections
    final case class Edge(dst: Long, score: Double, pre: Boolean, chainF: Boolean)
    val bySrc = flags.toSeq.flatMap { case ((s, d), (pre, chainF)) =>
      for (sv <- vecOf(s); dv <- vecOf(d)) yield
        s -> Edge(d, IvfIndex.roundHalfUp(
          IvfIndex.cosineScalar(sv, dv), scoreScale), pre, chainF)
    }.groupBy(_._1)
    val pruned = bySrc.toSeq.flatMap { case (s, es0) =>
      val es = es0.map(_._2)
      val reserved = es.filter(_.pre)
        .sortBy(e => (e.score, -e.dst))(
          Ordering.Tuple2(Ordering.Double.TotalOrdering, Ordering.Long))
        .take(reserveLong).map(_.dst).toSet
      es.map(e => (e, e.chainF || reserved.contains(e.dst)))
        .sortBy { case (e, ex) => (!ex, -e.score, e.dst) }(
          Ordering.Tuple3(Ordering.Boolean,
            Ordering.Double.TotalOrdering, Ordering.Long))
        .take(maxDegree)
        .map { case (e, _) => (s, e.dst) }
    }
    (touched, pruned)
  }

  /** [[appendNodes]] against a versioned store, committing DELTA-SIZED
    * bytes (VERDICT r9 task 1 — the `IvfIndex.appendToStore` discipline
    * applied to the graph tier): the rewrite is confined to the
    * `src_bucket` partitions holding touched srcs, and the commit is a
    * [[graft.sources.SnapshotStore.replacePartitions]] that re-references
    * every untouched bucket's files AS-IS — untouched partitions are never
    * rewritten, readers pinned to the old version are untouched until
    * expire. The bucket scan feeding the rewrite is itself
    * partition-pruned to the touched buckets.
    *
    * Optimistic concurrency (round-10 ADVICE): the base version is
    * captured BEFORE the read and threaded through as `expectedBase`, so a
    * commit landing between this read-modify-write's read and publish
    * collides loudly instead of being silently discarded.
    *
    * Savings scale as touchedBuckets/nBuckets: a micro-delta touches
    * ~(delta·(m+2)) srcs spread over min(that, nBuckets) buckets — size
    * nBuckets well above the typical delta's touched-src count (e.g. 512+
    * for streaming micro-batches), exactly like sizing IVF nCells.
    *
    * `beamWidth`/`maxHops`/`nSeeds`/`expandPerHop` are the insertion-
    * search knobs (VERDICT r10 task 6): they thread straight into the
    * delta's neighbor search, trading insert cost against link quality
    * exactly like the serving-side [[searchMany]] knobs. Defaults match
    * the previous hardcoded values.
    *
    * `ringRoot` (round 12, VERDICT r11 task 1 — retires the append
    * staleness contract): a [[RingRoster]] root created at build time
    * (`RingRoster.write` beside [[writeGraphStore]]). When set, every
    * inserted node ALSO receives its deterministic finger long links
    * (Chord-style circular successors across the `2^(j·ringStride)` draw
    * ladder — the insertable equivalent of the build's positional skip
    * ring), symmetrized and exempt from the degree prune, and the batch
    * joins the roster in the same call. Sustained growth then keeps
    * `ringCoverage(live, RingRoster.read(...))` at 1.0 and the planner
    * never reaches the full-rebuild rung — Qdrant-HNSW upsert parity
    * (vectordb.go:117-193). `rosterBuckets` must match the roster build;
    * `ringStride` the graph build's. Without it the pre-round-12
    * staleness contract (appends un-ringed, rebuild after several-fold
    * growth) still applies.
    */
  def appendNodesToStore(
      spark: org.apache.spark.sql.SparkSession, root: String,
      corpus: DataFrame, newVecs: DataFrame, idCol: String, vecCol: String,
      m: Int = 12, maxDegree: Int = 48, nBuckets: Int = 64,
      reserveLong: Int = 8,
      beamWidth: Int = 24, maxHops: Int = 12, nSeeds: Int = 4,
      expandPerHop: Int = 0, smallBatchBound: Int = 64,
      idBuckets: Option[Int] = None,
      dirTag: Option[String] = None,
      ringRoot: Option[String] = None,
      rosterBuckets: Int = 64, ringStride: Int = 2,
      servingCache: Option[ServingCache] = None): Int = {
    val baseV = graft.sources.SnapshotStore.currentVersion(spark, root)
      .getOrElse(throw new IllegalStateException(
        s"no committed graph at $root — build via writeGraphStore first"))
    // folded view: tombstoned nodes' edges are invisible to the traversal
    // and to the bucket rewrite (which thereby cleans touched buckets'
    // dead rows physically as a side effect)
    val store = readGraphStoreLatest(spark, root, Some(baseV))
    val g = store.select(col("src").cast("long"), col("dst").cast("long"))
    // ring maintenance (round 12, VERDICT r11 task 1): with a RingRoster
    // root, each inserted node also gets its FINGER long links — the
    // Chord-style circular successors of its draw ladder — so appended
    // nodes are first-class ring members and ringCoverage (measured
    // against the roster) never decays toward the full-rebuild cliff.
    // Fingers are computed against the roster MINUS this batch (replay-
    // stable) and ride the rewrite as prune-exempt edges.
    val storeView = store.select(col("src").cast("long"),
      col("dst").cast("long"), col("src_bucket"))
    // small deltas take the DRIVER-HOSTED rewrite twin (round 12
    // optimization): one bounded collect decides, and the whole
    // join/window prune DAG collapses to two point-lookup reads + driver
    // arithmetic — spec-gated row-identical to the distributed rewrite
    val deltaImage: Option[IndexedSeq[(Long, Array[Float])]] =
      if (smallBatchBound <= 0) None
      else {
        val rows = newVecs.select(col(idCol).cast("long"),
            graft.functions.VectorFunctions.asFloatArray(col(vecCol)))
          .limit(smallBatchBound + 1).collect()
        if (rows.length > smallBatchBound) None
        else Some(rows.toIndexedSeq.map(r =>
          r.getLong(0) -> r.getAs[scala.collection.Seq[Float]](1).toArray))
      }
    val bucketOf = pmod(col("src"), lit(nBuckets.toLong)).cast("int")
    val (v, touchedForCache) = deltaImage match {
      case Some(delta) =>
        // driver-hosted stitch twin: targets + arcs computed on the
        // driver, one argmin aggregate job (RingRosterSpec-gated
        // identical to the distributed stitch)
        val stitchedRows = ringRoot.map(rr => RingRoster.stitchFingersLocal(
            spark, rr, delta.map(_._1), ringStride, rosterBuckets))
          .getOrElse(Seq.empty)
        val (touchedSeq, prunedRows) = driverAppendRewrite(
          storeView, corpus, delta, idCol, vecCol,
          m, maxDegree, beamWidth, maxHops, nSeeds, expandPerHop,
          scoreScale = 6, reserveLong = reserveLong,
          srcBuckets = nBuckets, idBuckets = idBuckets,
          stitchedRows = stitchedRows, cache = servingCache)
        val touchedBuckets = touchedSeq
          .map(id => (((id % nBuckets) + nBuckets) % nBuckets).toInt).distinct
        val edgeSchema = org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("src",
            org.apache.spark.sql.types.LongType, nullable = true),
          org.apache.spark.sql.types.StructField("dst",
            org.apache.spark.sql.types.LongType, nullable = true)))
        val prunedDf = spark.createDataFrame(
          spark.sparkContext.parallelize(
            prunedRows.map { case (s, d) => org.apache.spark.sql.Row(s, d) }, 1),
          edgeSchema)
        // carried: same-bucket untouched srcs, as a literal anti-filter
        // (partition-pruned scan, no join)
        val carried = store
          .where(col("src_bucket").isin(touchedBuckets: _*))
          .select(col("src").cast("long"), col("dst").cast("long"))
          .where(!col("src").isInCollection(touchedSeq))
        val replacement = prunedDf.unionByName(carried)
          .withColumn("src_bucket", bucketOf)
          .repartition(col("src_bucket"))
        (graft.sources.SnapshotStore.replacePartitions(
          spark, root, replacement, "src_bucket", expectedBase = Some(baseV),
          dirTag = dirTag), touchedSeq)
      case None =>
        val stitched = ringRoot.map(rr => RingRoster.stitchFingers(
          spark, rr, newVecs.select(col(idCol)), idCol, ringStride,
          rosterBuckets))
        val (touched, pruned) = appendRewrite(
          g, storeView, Some(nBuckets),
          corpus, newVecs, idCol, vecCol,
          m, maxDegree, beamWidth = beamWidth, maxHops = maxHops,
          nSeeds = nSeeds, expandPerHop = expandPerHop, scoreScale = 6,
          reserveLong = reserveLong, smallBatchBound = 0,
          idBuckets = idBuckets, stitched = stitched, cache = servingCache)
        val touchedBuckets = touched.select(bucketOf.as("__b"))
          .distinct().collect().map(_.getInt(0)).toSeq // bounded: ≤ nBuckets ints
        // complete new content of the touched buckets = rewritten touched-src
        // rows + same-bucket untouched srcs carried unchanged (the store scan
        // below partition-prunes to exactly the touched buckets); bucket rows
        // are shuffled together pre-write (the writeGraphStore file-fanout rule)
        val carried = store
          .where(col("src_bucket").isin(touchedBuckets: _*))
          .select(col("src").cast("long"), col("dst").cast("long"))
          .join(touched, Seq("src"), "left_anti")
        val replacement = pruned.unionByName(carried)
          .withColumn("src_bucket", bucketOf)
          .repartition(col("src_bucket"))
        val ver = graft.sources.SnapshotStore.replacePartitions(
          spark, root, replacement, "src_bucket", expectedBase = Some(baseV),
          dirTag = dirTag)
        // warm-cache advance needs the touched srcs — one delta-bounded
        // collect on the distributed path (driver path knows them already)
        (ver, if (servingCache.isDefined)
          touched.select(col("src")).collect().map(_.getLong(0)).toIndexedSeq
        else Seq.empty[Long])
    }
    // roster append AFTER the graph commit (idempotent — already-rostered
    // ids anti-join out), so a crash mid-write leaves the roster honest;
    // the one crash window left (graph committed, roster not) reads as
    // per-bucket coverage loss that planGraph's stitch_region repair
    // closes — self-healing, never corrupting. Small deltas take the
    // driver-ids variant (no bucket collect / checkpoint / isEmpty probe).
    ringRoot.foreach { rr =>
      deltaImage match {
        case Some(delta) =>
          RingRoster.appendIds(spark, rr, delta.map(_._1), rosterBuckets)
        case None =>
          RingRoster.append(spark, rr, newVecs.select(col(idCol)), idCol,
            rosterBuckets)
      }
      ()
    }
    // warm-cache advance (round 12): exactly the rewritten srcs' adjacency
    // changed at this commit
    servingCache.foreach(_.advanceGraph(root, v, touchedForCache))
    v
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
    // shuffle each bucket's rows together BEFORE the partitioned write:
    // without it every write task emits a file into every bucket dir it
    // touches — tasks × nBuckets tiny files whose listing cost then taxes
    // every later scan (measured 5× on the bench maintenance entries)
    graft.sources.SnapshotStore.overwrite(spark, root,
      graph.withColumn("src_bucket",
          pmod(col("src"), lit(nBuckets.toLong)).cast("int"))
        .repartition(col("src_bucket")),
      partitionBy = Seq("src_bucket"))
  }

  /** Open the versioned graph store for [[searchMany]] (pass the matching
    * `srcBuckets = Some(nBuckets)` so hops prune partitions). RAW view —
    * on a store that has seen [[deleteNodesFromStore]], use
    * [[readGraphStoreLatest]] so tombstoned nodes' edges fold out.
    */
  def readGraphStore(
      spark: org.apache.spark.sql.SparkSession, root: String,
      version: Option[Int] = None): DataFrame =
    graft.sources.SnapshotStore.read(spark, root, version)

  /** Persist the CORPUS (id + vector + payload columns) as a snapshot
    * root partitioned by `id_bucket = pmod(id, nBuckets)` — the
    * point-lookup layout for the beam tier's OTHER per-hop read (round
    * 11): scoring a hop's candidates needs their vectors by id, and
    * against a flat corpus that is a full-corpus scan per hop even though
    * only frontier × degree rows are wanted. With this layout and
    * `searchMany(idBuckets = Some(nBuckets))` the candidate fetch prunes
    * to the candidates' buckets exactly like the edge scan prunes to the
    * frontier's `src_bucket`s — at 100 TB the hop cost becomes two sets
    * of point lookups, zero full scans. Same file-fanout discipline and
    * snapshot semantics as [[writeGraphStore]]. Returns the version.
    */
  def writeVectorStore(
      spark: org.apache.spark.sql.SparkSession, root: String,
      corpus: DataFrame, idCol: String, nBuckets: Int = 64): Int = {
    require(nBuckets > 0, s"nBuckets must be positive, got $nBuckets")
    graft.sources.SnapshotStore.overwrite(spark, root,
      corpus.withColumn("id_bucket",
          pmod(col(idCol).cast("long"), lit(nBuckets.toLong)).cast("int"))
        .repartition(col("id_bucket")),
      partitionBy = Seq("id_bucket"))
  }

  /** Open the versioned corpus store for [[searchMany]]/[[searchManyLocal]]
    * (pass the matching `idBuckets = Some(nBuckets)` so candidate fetches
    * prune partitions).
    */
  def readVectorStore(
      spark: org.apache.spark.sql.SparkSession, root: String,
      version: Option[Int] = None): DataFrame =
    graft.sources.SnapshotStore.read(spark, root, version)

  /** Append new vectors to a [[writeVectorStore]] root as one bucketed
    * delta commit — the corpus half of a streaming graph upsert
    * ([[graft.streaming.StreamingGraphIndex]]). `nBuckets` MUST match the
    * build's (the `id_bucket` value is pmod(id, nBuckets) — a mismatched
    * append would park rows where readers' pruning never looks, the
    * StreamingDedup store constant rule). Returns the committed version.
    */
  def appendToVectorStore(
      spark: org.apache.spark.sql.SparkSession, root: String,
      newVecs: DataFrame, idCol: String, nBuckets: Int = 64,
      expectedBase: Option[Int] = None,
      dirTag: Option[String] = None): Int = {
    require(nBuckets > 0, s"nBuckets must be positive, got $nBuckets")
    graft.sources.SnapshotStore.append(spark, root,
      newVecs.withColumn("id_bucket",
          pmod(col(idCol).cast("long"), lit(nBuckets.toLong)).cast("int"))
        .repartition(col("id_bucket")),
      expectedBase, partitionBy = Seq("id_bucket"), dirTag = dirTag)
  }

  /** Upsert vectors by id into a [[writeVectorStore]] root in ONE commit
    * (round 12, r11 ADVICE — the corpus half of a streaming graph
    * RE-INGEST; reference parity: upsert-by-id replaces the point,
    * internal/vectordb/vectordb.go:117-193): a tombstone row per incoming
    * id (parked in the never-probed `id_bucket = -1`, so data scans stay
    * partition-pruned) plus the replacement rows — the
    * `IvfIndex.upsertToStore` protocol with the graph store's minimal
    * tombstone shape (no op marker needed: ANY `-1` row is a kill).
    * Strictly-older copies of the id fold out of
    * [[readVectorStoreLatest]]; the same-commit replacement survives
    * (commit >= its own tombstone). One row per id per batch is the
    * caller's contract, as with the IVF twin. Returns the version.
    */
  def upsertToVectorStore(
      spark: org.apache.spark.sql.SparkSession, root: String,
      newVecs: DataFrame, idCol: String, nBuckets: Int = 64,
      expectedBase: Option[Int] = None,
      dirTag: Option[String] = None): Int = {
    require(nBuckets > 0, s"nBuckets must be positive, got $nBuckets")
    val data = newVecs.withColumn("id_bucket",
      pmod(col(idCol).cast("long"), lit(nBuckets.toLong)).cast("int"))
    graft.sources.SnapshotStore.append(spark, root,
      data.unionByName(vectorTombstonesLike(data, newVecs.select(col(idCol)), idCol))
        .repartition(col("id_bucket")),
      expectedBase, partitionBy = Seq("id_bucket"), dirTag = dirTag)
  }

  /** Delete vectors by id from a [[writeVectorStore]] root: one
    * tombstone-only commit. A later [[upsertToVectorStore]] of the same id
    * resurrects it (newer commit wins); [[compactVectorStore]] folds the
    * tombstone away physically. Returns the committed version.
    */
  def deleteFromVectorStore(
      spark: org.apache.spark.sql.SparkSession, root: String,
      ids: DataFrame, idCol: String,
      expectedBase: Option[Int] = None): Int = {
    val shape = graft.sources.SnapshotStore.read(spark, root).limit(0)
    graft.sources.SnapshotStore.append(spark, root,
      vectorTombstonesLike(shape, ids.select(col(idCol)), idCol),
      expectedBase, partitionBy = Seq("id_bucket"))
  }

  /** Tombstone rows shaped like `dataDf`: id kept, `id_bucket = -1`,
    * every other column null.
    */
  private def vectorTombstonesLike(
      dataDf: DataFrame, ids: DataFrame, idCol: String): DataFrame =
    dataDf.schema.fields.foldLeft(ids) { (d, f) =>
      if (f.name == idCol) d
      else if (f.name == "id_bucket") d.withColumn(f.name, lit(-1))
      else d.withColumn(f.name, lit(null).cast(f.dataType))
    }.select(dataDf.columns.map(col).toIndexedSeq: _*)

  /** Row bound for the DRIVER-LITERAL tombstone fold (round 12
    * optimization): at or below this many tombstone rows the fold
    * collects them once (≤ ~1 MB driver image) and becomes a pure scan
    * predicate — no aggregate, no join — in EVERY job that consumes the
    * live view (the streaming insert loop re-executes the fold in each
    * of its per-hop point-lookup collects, so the join fold was paid
    * many times per batch). Above the bound the size-guarded join fold
    * runs unchanged.
    */
  private[operators] val MaxDriverTombstoneRows = 65536L

  /** Collect (key, commit) tombstone rows when within `bound`: the
    * per-key NEWEST tombstone commit, or None when the set is too large
    * for a driver literal (fall back to the join fold).
    */
  private def driverTombMax(
      tombRows: DataFrame, bound: Long): Option[Map[Long, Int]] = {
    val rows = tombRows.limit(bound.toInt + 1).collect()
    if (rows.length > bound) None
    else Some(rows.foldLeft(Map.empty[Long, Int]) { (m, r) =>
      val id = r.getLong(0)
      m.updated(id, math.max(r.getInt(1), m.getOrElse(id, Int.MinValue)))
    })
  }

  /** The literal kill predicate of a collected tombstone image: a row
    * dies iff its key has a STRICTLY newer tombstone — grouped by
    * distinct tombstone commit so each per-dir scan (whose commit column
    * is a literal) constant-folds most clauses away.
    */
  private def killPred(
      key: org.apache.spark.sql.Column, ccCol: org.apache.spark.sql.Column,
      tombMax: Map[Long, Int]): org.apache.spark.sql.Column =
    tombMax.groupBy(_._2).foldLeft(lit(false)) { case (p, (v, ids)) =>
      p || (ccCol < lit(v) && key.isInCollection(ids.keys.toSeq))
    }

  /** The corpus store's LIVE rows at a version: a data row survives unless
    * some tombstone for its id carries a STRICTLY newer commit (a
    * same-commit upsert replacement outlives its own tombstone). Mirrors
    * [[readGraphStoreLatest]]: stores never deleted from skip the whole
    * fold via the manifest probe (no Spark job); small tombstone sets
    * fold as a driver-literal scan predicate ([[MaxDriverTombstoneRows]]
    * — one bounded collect at construction, join-free consumer plans);
    * large sets keep the size-guarded join, never contract-trusted. This
    * is the serving view for upsert-mode corpora — [[readVectorStore]]
    * stays the raw view for insert-only stores.
    */
  def readVectorStoreLatest(
      spark: org.apache.spark.sql.SparkSession, root: String, idCol: String,
      version: Option[Int] = None,
      maxBroadcastTombstones: Long = IvfIndex.DefaultMaxBroadcastTombstones,
      maxDriverTombstoneRows: Long = MaxDriverTombstoneRows): DataFrame = {
    val cc = graft.sources.SnapshotStore.CommitCol
    val raw = graft.sources.SnapshotStore.read(spark, root, version,
      commitCol = Some(cc))
    if (!graft.sources.SnapshotStore.mayContainPartition(
        spark, root, "id_bucket", "-1", version))
      return raw.filter(col("id_bucket") =!= -1).drop(cc)
    val data = raw.filter(col("id_bucket") =!= -1)
    val fast =
      if (maxDriverTombstoneRows > 0 &&
          raw.schema(idCol).dataType == org.apache.spark.sql.types.LongType)
        driverTombMax(raw.filter(col("id_bucket") === -1)
          .select(col(idCol), col(cc)), maxDriverTombstoneRows)
      else None
    fast match {
      case Some(tm) =>
        (if (tm.isEmpty) data else data.filter(!killPred(col(idCol), col(cc), tm)))
          .drop(cc)
      case None =>
        val tombs = raw.filter(col("id_bucket") === -1)
          .groupBy(col(idCol)).agg(max(col(cc)).as("__tv"))
        val hint = IvfIndex.sizeGuardedHint(tombs, maxBroadcastTombstones)
        data
          .join(hint(tombs), Seq(idCol), "left")
          .filter(col("__tv").isNull || col(cc) >= col("__tv"))
          .drop("__tv", cc)
    }
  }

  /** Fold corpus tombstones PHYSICALLY: rewrite the live rows as one fresh
    * bucketed snapshot — superseded copies and the tombstone partition do
    * not survive. The corpus twin of [[compactGraphStore]] (and like it,
    * NOT the generic `SnapshotStore.compact`). Returns the version.
    */
  def compactVectorStore(
      spark: org.apache.spark.sql.SparkSession, root: String, idCol: String,
      nBuckets: Int = 64, expectedBase: Option[Int] = None): Int = {
    val base = expectedBase.orElse(
      graft.sources.SnapshotStore.currentVersion(spark, root))
    val live = readVectorStoreLatest(spark, root, idCol, base)
      .drop("id_bucket")
      .withColumn("id_bucket",
        pmod(col(idCol).cast("long"), lit(nBuckets.toLong)).cast("int"))
      .repartition(col("id_bucket"))
    graft.sources.SnapshotStore.overwrite(spark, root, live, base,
      partitionBy = Seq("id_bucket"))
  }

  /** Delete nodes by id from a versioned graph store (VERDICT r9 task 2,
    * graph half; reference parity: point deletes,
    * internal/vectordb/vectordb.go:382-400): one tombstone-only commit —
    * rows `(src = id, dst = id, src_bucket = -1)` parked in the
    * never-probed bucket −1, so data scans stay partition-pruned while
    * [[readGraphStoreLatest]] folds every edge INCIDENT to a deleted node
    * (either endpoint) out of the live view. A later
    * [[appendNodesToStore]] of the same id re-links it at a newer commit,
    * which outlives the older tombstone. Pinned older versions still
    * serve the node until expiry. Returns the committed version.
    */
  def deleteNodesFromStore(
      spark: org.apache.spark.sql.SparkSession, root: String,
      ids: DataFrame, idCol: String,
      expectedBase: Option[Int] = None): Int = {
    val t = ids.select(col(idCol).cast("long").as("src"))
      .withColumn("dst", col("src"))
      .withColumn("src_bucket", lit(-1))
    graft.sources.SnapshotStore.append(spark, root, t, expectedBase,
      partitionBy = Seq("src_bucket"))
  }

  /** Tenant purge for the graph tier (VERDICT r10 task 2; reference
    * parity: org-scoped point removal, internal/vectordb/vectordb.go:
    * 488-591 — the whole organization's points leave the index by a
    * filter, not by caller-side id enumeration). Graph stores index EDGES
    * and carry no tenant column, so — unlike `IvfIndex
    * .purgeTenantFromStore`'s one-row marker — the purge is an ID-SET
    * purge composed from the tenant's ROSTER: the corpus/chunks table the
    * graph was built from (every deployment has it — it fed
    * [[buildGraph]]), filtered to the tenant, committed as ONE
    * tombstone-only version via [[deleteNodesFromStore]]. Delta-sized in
    * the TENANT (|roster ∩ org| tombstone rows), never the store; the
    * enumeration is one partition-prunable scan of the roster, not of the
    * edge table.
    *
    * Semantics inherited from the tombstone protocol: every edge INCIDENT
    * to a purged node folds out of [[readGraphStoreLatest]] at this
    * commit (either-endpoint rule — the tenant is unreachable AND
    * unreturnable); pinned older versions still serve it until expiry
    * (the GDPR two-step); a LATER [[appendNodesToStore]] of the same ids
    * re-links them at a newer commit (re-ingest-after-purge resurrect);
    * bytes leave disk at [[compactGraphStore]]. Returns the committed
    * version.
    */
  def purgeTenantFromGraphStore(
      spark: org.apache.spark.sql.SparkSession, root: String,
      roster: DataFrame, rosterIdCol: String,
      orgCol: String, orgValue: Any,
      expectedBase: Option[Int] = None): Int =
    deleteNodesFromStore(spark, root,
      roster.filter(col(orgCol) === lit(orgValue)).select(col(rosterIdCol)),
      rosterIdCol, expectedBase)

  /** The graph store's LIVE edges at a version: an edge survives unless
    * either endpoint carries a tombstone from a STRICTLY newer commit than
    * the edge's own data dir (commit versions come from the snapshot
    * protocol's dir names — nothing is stored).
    *
    * Tombstones are small between compactions BY CONTRACT, but the fold
    * must not trust the contract with executor memory (VERDICT r10 task
    * 3): one cheap partition-pruned count over the tombstone partition
    * (`src_bucket = -1`) picks the join strategy — broadcast below
    * `maxBroadcastTombstones` distinct tombstoned ids, an unhinted
    * (shuffle-capable) join above it, so a bulk delete cannot OOM the
    * very fold that is supposed to clean it up. Results are identical
    * either way (GraphAnnSpec gates equality with the guard forced to 0).
    * Fold physically via [[compactGraphStore]].
    */
  def readGraphStoreLatest(
      spark: org.apache.spark.sql.SparkSession, root: String,
      version: Option[Int] = None,
      maxBroadcastTombstones: Long = IvfIndex.DefaultMaxBroadcastTombstones,
      maxDriverTombstoneRows: Long = MaxDriverTombstoneRows): DataFrame = {
    val cc = graft.sources.SnapshotStore.CommitCol
    val raw = graft.sources.SnapshotStore.read(spark, root, version,
      commitCol = Some(cc))
    // a never-deleted-from store skips the whole fold — decided by a
    // driver-side manifest/dir listing, NOT a Spark job (round-11 ADVICE:
    // the eager strategy count taxed every serving-path read)
    if (!graft.sources.SnapshotStore.mayContainPartition(
        spark, root, "src_bucket", "-1", version))
      return raw.filter(col("src_bucket") =!= -1).drop(cc)
        .select(col("src"), col("dst"), col("src_bucket"))
    val data = raw.filter(col("src_bucket") =!= -1)
    // small tombstone sets become a driver-literal scan predicate over
    // BOTH endpoints (round 12 optimization — join-free consumer plans);
    // large sets keep the size-guarded join fold
    val fast =
      if (maxDriverTombstoneRows > 0 &&
          raw.schema("src").dataType == org.apache.spark.sql.types.LongType)
        driverTombMax(raw.filter(col("src_bucket") === -1)
          .select(col("src"), col(cc)), maxDriverTombstoneRows)
      else None
    fast match {
      case Some(tm) =>
        (if (tm.isEmpty) data
         else data.filter(!killPred(col("src"), col(cc), tm) &&
           !killPred(col("dst"), col(cc), tm)))
          .drop(cc)
          .select(col("src"), col("dst"), col("src_bucket"))
      case None =>
        val tombs = raw.filter(col("src_bucket") === -1)
          .groupBy(col("src")).agg(max(col(cc)).as("__tv"))
        // the strategy probe: one small job over the pruned -1 partition
        val hint = IvfIndex.sizeGuardedHint(tombs, maxBroadcastTombstones)
        data
          .join(hint(tombs), Seq("src"), "left")
          .filter(col("__tv").isNull || col(cc) >= col("__tv"))
          .drop("__tv")
          .join(hint(tombs.withColumnRenamed("src", "dst")
            .withColumnRenamed("__tv", "__dtv")), Seq("dst"), "left")
          .filter(col("__dtv").isNull || col(cc) >= col("__dtv"))
          .drop("__dtv", cc)
          .select(col("src"), col("dst"), col("src_bucket"))
    }
  }

  /** Fold graph tombstones PHYSICALLY: rewrite the resolved live edges as
    * one fresh bucketed snapshot — deleted nodes' edges and the tombstone
    * partition do not survive into the new dir. The graph twin of
    * `IvfIndex.compactStore` (and like it, NOT the generic
    * `SnapshotStore.compact`, which would collapse commit versions and
    * resurrect deleted nodes). Pins one version as both the read snapshot
    * and the commit base, so an interleaving commit collides loudly.
    * Returns the committed version.
    */
  def compactGraphStore(
      spark: org.apache.spark.sql.SparkSession, root: String,
      nBuckets: Int = 64, expectedBase: Option[Int] = None): Int = {
    val base = expectedBase.orElse(
      graft.sources.SnapshotStore.currentVersion(spark, root))
    val live = readGraphStoreLatest(spark, root, base)
      .select(col("src"), col("dst"))
      .withColumn("src_bucket",
        pmod(col("src"), lit(nBuckets.toLong)).cast("int"))
      .repartition(col("src_bucket"))
    graft.sources.SnapshotStore.overwrite(spark, root, live, base,
      partitionBy = Seq("src_bucket"))
  }

  /** Region-scoped ring repair (round 12, VERDICT r11 task 2 — the
    * planner's MIDDLE RUNG between compaction and a full rebuild): for the
    * live source nodes of the named `buckets` that are NOT in the ring
    * roster (appended before round 12, or stranded by the
    * graph-committed/roster-lost crash window), draw their fingers against
    * the current roster ([[RingRoster.stitchFingers]]) and commit them in
    * ONE `replacePartitions` that rewrites ONLY those buckets — fingers
    * stay FORWARD-only here precisely so the commit footprint is the
    * repaired region (a back-edge would land in its target's arbitrary
    * bucket; outbound fingers alone restore the O(log n) routing ladder,
    * and the nodes' own append-time back-edges keep them findable). The
    * repaired ids then join the roster (idempotent append), so per-bucket
    * ring coverage returns to 1 and `IndexMaintenance.planGraph` stops
    * planning for them. Returns the graph commit version (None = nothing
    * uncovered — the region was already healthy).
    */
  def repairRingRegion(
      spark: org.apache.spark.sql.SparkSession, root: String,
      ringRoot: String, buckets: Seq[Int], nBuckets: Int = 64,
      rosterBuckets: Int = 64, ringStride: Int = 2): Option[Int] = {
    require(buckets.nonEmpty, "repairRingRegion needs at least one bucket")
    val baseV = graft.sources.SnapshotStore.currentVersion(spark, root)
      .getOrElse(throw new IllegalStateException(
        s"no committed graph at $root"))
    val live = readGraphStoreLatest(spark, root, Some(baseV))
      .where(col("src_bucket").isin(buckets: _*))
      .select(col("src").cast("long"), col("dst").cast("long"))
    val roster = RingRoster.read(spark, ringRoot)
    val uncovered = live.select(col("src")).distinct()
      .join(roster.select(col("id").as("src")), Seq("src"), "left_anti")
      .localCheckpoint() // pinned: drives the stitch, the union, the append
    if (uncovered.isEmpty) return None
    val fingers = RingRoster.stitchFingers(
      spark, ringRoot, uncovered, "src", ringStride, rosterBuckets)
    // complete new content of the repaired buckets: carried live rows +
    // forward fingers, deduped (bucket-scoped, never whole-graph)
    val replacement = live
      .unionByName(fingers.select(col("src"), col("dst")))
      .distinct()
      .withColumn("src_bucket", pmod(col("src"), lit(nBuckets.toLong)).cast("int"))
      .repartition(col("src_bucket"))
    val v = graft.sources.SnapshotStore.replacePartitions(
      spark, root, replacement, "src_bucket", expectedBase = Some(baseV))
    RingRoster.append(spark, ringRoot, uncovered, "src", rosterBuckets)
    Some(v)
  }

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
    *
    * `idBuckets` (round 11): when `corpus` is a [[writeVectorStore]]
    * layout, pass its nBuckets and every candidate-vector fetch (seed
    * scoring and each hop's fresh scoring) restricts the corpus scan to
    * the candidates' `id_bucket` values first — the srcBuckets discipline
    * applied to the OTHER per-hop read. Without it, scoring a hop's
    * frontier × degree candidates joins against the FULL corpus scan
    * every hop, which is the remaining full-table touch in the beam tier
    * at 100 TB; with it, both per-hop reads are partition-pruned point
    * lookups. Costs one bounded ≤ nBuckets driver image per hop (the
    * candidates' bucket set); results identical (GraphAnnSpec-gated).
    *
    * `maxBroadcastQueries` bounds the query-side broadcast (VERDICT r9
    * task 3): per-hop scoring ships the query batch to every executor, so
    * an unbounded batch — e.g. a large [[appendNodes]] delta — would die
    * at the broadcast limit. Batches above the bound are sliced by a
    * strictly-bounded global row number and traversed slice by slice
    * (results are per-query independent, so the union is IDENTICAL to the
    * unchunked answer — GraphAnnSpec gates it); the common small batch
    * keeps the single-broadcast fast path.
    *
    * `smallBatchBound` (VERDICT r10 task 4): batches of at most this many
    * queries run on the DRIVER-HOSTED twin [[searchManyLocal]] — identical
    * results (GraphAnnSpec gates equality per query and config), a
    * fraction of the latency: the distributed loop pays ~1 s of job/
    * window/checkpoint machinery per hop regardless of data volume, which
    * is the measured ~12 s batch-1 floor; the local twin's per-hop cost is
    * two bounded collects. Default 0 keeps every caller distributed
    * unless it opts in ([[appendNodesToStore]] opts in at 64 — insert
    * deltas are the canonical small batch).
    *
    * `resultFilter` is the FILTERED search (VERDICT r9 task 4 — the
    * tenant predicate compiled into the search, reference parity
    * vectordb.go:216-234): a boolean predicate over `corpus` rows. The
    * beam ROUTES over the full graph (cross-tenant nodes still navigate —
    * restricting traversal to a tenant's subgraph would disconnect it),
    * but the returned top-k is the running best-k of the MATCHING nodes
    * scored anywhere along the traversal, so a small tenant gets k rows
    * instead of the scraps left after post-filtering a global beam. With
    * no filter this running top-k provably equals the final beam's top-k
    * (the beam IS the running top-beamWidth of everything scored), so the
    * unfiltered path is unchanged.
    */
  def searchMany(
      graph: DataFrame, corpus: DataFrame, queries: DataFrame,
      qId: String, qVec: String, idCol: String, vecCol: String,
      k: Int, beamWidth: Int = 32, maxHops: Int = 12, nSeeds: Int = 4,
      expandPerHop: Int = 0, scoreScale: Int = 6,
      srcBuckets: Option[Int] = None,
      maxBroadcastQueries: Int = 4096,
      resultFilter: Option[org.apache.spark.sql.Column] = None,
      smallBatchBound: Int = 0,
      idBuckets: Option[Int] = None,
      cache: Option[ServingCache] = None): DataFrame = {
    require(k > 0 && beamWidth >= k, s"need beamWidth >= k > 0, got $beamWidth/$k")
    require(maxBroadcastQueries > 0,
      s"maxBroadcastQueries must be positive, got $maxBroadcastQueries")
    srcBuckets.foreach(nb => require(nb > 0 && graph.columns.contains("src_bucket"),
      s"srcBuckets=Some($nb) needs a writeGraphStore layout with src_bucket"))
    idBuckets.foreach(nb => require(nb > 0 && corpus.columns.contains("id_bucket"),
      s"idBuckets=Some($nb) needs a writeVectorStore layout with id_bucket"))
    val q0 = queries.select(col(qId).cast("long").as("__qid"),
      VectorFunctions.asFloatArray(col(qVec)).as("__qv"))
    val nq = q0.count()
    if (nq <= smallBatchBound)
      return searchManyLocal(graph, corpus, queries, qId, qVec, idCol, vecCol,
        k, beamWidth, maxHops, nSeeds, expandPerHop, scoreScale, srcBuckets,
        resultFilter, idBuckets, cache)
    if (nq > maxBroadcastQueries) {
      // strictly-bounded slices (≤ maxBroadcastQueries each) via the
      // range-partitioned global row number; pinned ONCE so every slice
      // filter sees the same range cut (the RangePartitioner-seed lesson)
      val nSlices = math.ceil(nq.toDouble / maxBroadcastQueries).toInt
      val sliced = ScaleOps.globalRowNumber(q0, Seq(col("__qid")), as = "__rn")
        .withColumn("__slice",
          ((col("__rn") - 1) / lit(maxBroadcastQueries.toLong)).cast("int"))
        .localCheckpoint()
      return (0 until nSlices).map { s =>
        searchMany(graph, corpus,
          sliced.filter(col("__slice") === s).select(col("__qid"), col("__qv")),
          "__qid", "__qv", idCol, vecCol, k, beamWidth, maxHops, nSeeds,
          expandPerHop, scoreScale, srcBuckets, maxBroadcastQueries,
          resultFilter, smallBatchBound = 0, idBuckets = idBuckets)
      }.reduce(_.unionByName(_))
    }
    val seeds = entryPoints(corpus, idCol, nSeeds)
    val c = corpus.select(
      col(idCol).cast("long").as("id") +:
        VectorFunctions.asFloatArray(col(vecCol)).as("__cv") +:
        resultFilter.getOrElse(lit(true)).cast("boolean").as("__keep") +:
        (if (idBuckets.isDefined) Seq(col("id_bucket")) else Nil): _*)
    val q = q0
    val g = graph.select(
      col("src").cast("long") +: col("dst").cast("long") +:
        (if (srcBuckets.isDefined) Seq(col("src_bucket")) else Nil): _*)

    // with a bucketed corpus store: restrict the candidate-vector scan to
    // the candidates' id_bucket values first (a literal partition
    // predicate, bounded driver image ≤ nBuckets ints per hop — the
    // srcBuckets discipline applied to the corpus side); the actual match
    // stays the equality join on id
    def score(cand: DataFrame, candBuckets: Option[Seq[Int]]): DataFrame = {
      val cSlice = (idBuckets, candBuckets) match {
        case (Some(_), Some(bs)) =>
          c.where(col("id_bucket").isin(bs: _*)).drop("id_bucket")
        case (Some(_), None) => c.drop("id_bucket")
        case _ => c
      }
      cand.join(cSlice, "id")
        .join(broadcast(q), "__qid")
        .select(col("__qid"), col("id"),
          round(VectorFunctions.cosine(col("__cv"), col("__qv")), scoreScale)
            .as("score"), col("__keep"))
        .filter(col("id") =!= col("__qid"))
    }
    def bucketOf(id: Long, nb: Int): Int = (((id % nb) + nb) % nb).toInt

    val seedCand = q.select(col("__qid"))
      .withColumn("id", explode(typedLit(seeds)))
    var beam = score(seedCand,
        idBuckets.map(nb => seeds.map(bucketOf(_, nb)).distinct))
      .withColumn("expanded", lit(false)).iterCheckpoint(false)
    var visited = seedCand.iterCheckpoint(false)

    val beamW = Window.partitionBy(col("__qid"))
      .orderBy(col("score").desc, col("id").asc)
    // filtered mode: the running top-k of MATCHING scored nodes, pinned
    // per hop exactly like the beam (unfiltered mode skips the extra
    // state — the final beam already IS the running top-k)
    val filtered = resultFilter.isDefined
    var results: DataFrame =
      if (!filtered) null
      else beam.filter(col("__keep"))
        .select(col("__qid"), col("id"), col("score"))
        .withColumn("__rn", row_number().over(beamW))
        .filter(col("__rn") <= k).drop("__rn")
        .iterCheckpoint(false)
    var hop = 0
    var frontierRows = beam.filter(!col("expanded")).count()
    while (hop < maxHops && frontierRows > 0) {
      val unexp = beam.filter(!col("expanded"))
      // pinned LAZILY: the checkpoint node breaks lineage at analysis
      // time (which is what defuses the ambiguous filter-of-self join
      // against `beam`), while materialization folds into this hop's one
      // real job — the beam pin below — instead of costing its own job;
      // the hop loop is driver-latency-bound locally, so job count IS
      // the entry's cost. (A round-10 attempt to merge the loop-control
      // count into the frontier-bucket collect measured 70% SLOWER on
      // the bench search entries — probing the derived frontier instead
      // of the beam reorders which job materializes the heavy window
      // stages; keep the count-on-beam shape.)
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
      val nbrs0 = frontier.select(col("__qid"), col("id").as("src"))
        .join(gSlice, "src")
        .select(col("__qid"), col("dst").as("id"))
        .distinct()
        .join(visited, Seq("__qid", "id"), "left_anti")
      // a bucketed corpus needs the candidates' bucket set (one bounded
      // collect); pin nbrs LAZILY first so the collect, the scoring join
      // and the visited union share one materialization instead of
      // recomputing the anti-join three times. The default path keeps the
      // round-10-tuned job shape untouched.
      val nbrs =
        if (idBuckets.isDefined) nbrs0.iterCheckpoint(false) else nbrs0
      val candBuckets = idBuckets.map { nb =>
        nbrs.select(pmod(col("id"), lit(nb.toLong)).cast("int").as("__b"))
          .distinct().collect().map(_.getInt(0)).toSeq
      }
      val fresh = score(nbrs, candBuckets).withColumn("expanded", lit(false))
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
      if (filtered) results = results
        .unionByName(fresh.filter(col("__keep"))
          .select(col("__qid"), col("id"), col("score")))
        .withColumn("__rn", row_number().over(beamW))
        .filter(col("__rn") <= k).drop("__rn")
        .iterCheckpoint(false)
      visited = visited.unionByName(nbrs).iterCheckpoint(false)
      // the loop-control count is the hop's ONE materializing action —
      // it computes the (lazy) beam pin; the visited pin computes inside
      // the next hop's first job
      frontierRows = beam.filter(!col("expanded")).count()
      hop += 1
    }
    (if (filtered) results else beam)
      .withColumn("rn", row_number().over(beamW))
      .filter(col("rn") <= k)
      .select(col("__qid").as("query_id"), col("id").as("neighbor_id"),
        col("score"), col("rn").cast("int").as("rn"))
  }

  /** Store-version-keyed WARM SERVING CACHE for the driver-hosted beam
    * (round 12, VERDICT r11 task 3): [[searchManyLocal]]'s adjacency and
    * vector caches — and the seed image — used to die with each call, so
    * a steady-state serve/insert loop re-read them per batch against an
    * unchanged store version. This handle carries them across calls,
    * keyed by (root, version) per store and invalidated on any foreign
    * commit ([[ensure]] resets on a key mismatch) or advanced SURGICALLY
    * by the commits this process makes itself ([[advanceGraph]] drops
    * exactly the rewritten srcs; [[advanceCorpus]] merges the upserted
    * vectors and the seed image — the seed merge is exact because
    * top-n(A ∪ B) = top-n(top-n(A) ∪ B)).
    *
    * Correctness contract: results with a warm cache are IDENTICAL to a
    * cold run (GraphAnnSpec gates it) because entries are immutable within
    * a store version — the cache only changes WHEN reads happen, never
    * what they return. Filtered searches (`resultFilter`) bypass the cache
    * entirely: the cached keep-flag is filter-specific, so sharing it
    * across different predicates would be wrong. Driver-memory bound:
    * vectors/adjacency ever touched by this handle's searches — the
    * serving working set, not the corpus ([[reset]] when in doubt).
    */
  final class ServingCache {
    private[operators] var corpusKey: Option[(String, Int)] = None
    private[operators] var graphKey: Option[(String, Int)] = None
    private[operators] val vecCache =
      scala.collection.mutable.Map.empty[Long, Option[(Array[Float], Boolean)]]
    private[operators] val adjCache =
      scala.collection.mutable.Map.empty[Long, Array[Long]]
    // (nSeeds, the top-nSeeds (md5-hex, id) pairs ascending) — the exact
    // entryPoints image, merge-maintainable
    private[operators] var seedImage: Option[(Int, Seq[(String, Long)])] = None

    /** Spark-identical md5 hex of an id (lowercase, full 32 chars). */
    private def md5hex(id: Long): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString

    def reset(): Unit = {
      vecCache.clear(); adjCache.clear(); seedImage = None
      corpusKey = None; graphKey = None
    }

    /** Validate against the CURRENT store versions — resets the
      * corresponding side on any mismatch (foreign commit, first use,
      * different root). Call before each warm search/insert.
      */
    def ensure(
        corpusRoot: String, corpusVersion: Int,
        graphRoot: String, graphVersion: Int): Unit = {
      if (!corpusKey.contains((corpusRoot, corpusVersion))) {
        vecCache.clear(); seedImage = None
        corpusKey = Some((corpusRoot, corpusVersion))
      }
      if (!graphKey.contains((graphRoot, graphVersion))) {
        adjCache.clear()
        graphKey = Some((graphRoot, graphVersion))
      }
    }

    /** Mark `ids` ABSENT for the next search — the corpus-minus-batch
      * image an insert leg searches (a re-ingested id's cached pre-batch
      * vector must not serve while its replacement is in flight).
      * [[advanceCorpus]] afterwards overwrites the mask with the new
      * vectors.
      */
    def maskAbsent(ids: Iterable[Long]): Unit =
      ids.foreach(id => vecCache(id) = None)

    /** This process committed `upserted` (id, vector) rows at
      * `newVersion`: fold them into the cache instead of resetting —
      * vectors overwrite (upsert semantics), the seed image merges
      * exactly. Only exact for append/upsert commits; deletes need
      * [[reset]]/[[ensure]].
      */
    def advanceCorpus(
        corpusRoot: String, newVersion: Int,
        upserted: Seq[(Long, Array[Float])]): Unit = {
      if (corpusKey.exists(_._1 == corpusRoot)) {
        upserted.foreach { case (id, v) => vecCache(id) = Some((v, true)) }
        seedImage = seedImage.map { case (n, cur) =>
          val merged = (cur ++ upserted.map { case (id, _) => (md5hex(id), id) })
            .distinct.sorted.take(n)
          (n, merged)
        }
        corpusKey = Some((corpusRoot, newVersion))
      }
    }

    /** This process rewrote `touchedSrcs` at graph `newVersion`: drop
      * exactly their adjacency, keep everything else warm.
      */
    def advanceGraph(
        graphRoot: String, newVersion: Int, touchedSrcs: Seq[Long]): Unit = {
      if (graphKey.exists(_._1 == graphRoot)) {
        touchedSrcs.foreach(adjCache.remove)
        graphKey = Some((graphRoot, newVersion))
      }
    }

    private[operators] def seedsFor(nSeeds: Int): Option[Seq[Long]] =
      seedImage.collect { case (n, s) if n == nSeeds => s.map(_._2) }

    private[operators] def recordSeeds(nSeeds: Int, ids: Seq[Long]): Unit =
      seedImage = Some((nSeeds, ids.map(id => (md5hex(id), id)).sorted))
  }

  /** The driver-hosted twin of [[searchMany]] for SMALL query batches
    * (VERDICT r10 task 4 — the batch-1 latency fix): hop-for-hop the same
    * algorithm with the same arithmetic ([[IvfIndex.cosineScalar]] /
    * [[IvfIndex.roundHalfUp]] — the proven equivalents of the codegen
    * round-6 cosine), so results are IDENTICAL per query (GraphAnnSpec
    * gates it across filtered / capped / bucketed configs). What changes
    * is only WHERE the bookkeeping runs: beam/visited state lives on the
    * driver (bounded by nQueries × search parameters, never the corpus),
    * and each hop issues exactly two bounded cluster reads —
    *
    *   1. the frontier's adjacency: edge rows `src ∈ frontier` (≤
    *      frontier × maxDegree rows; with a [[writeGraphStore]] layout
    *      the scan is FIRST partition-pruned to the frontier's
    *      `src_bucket` values, same as the distributed hop), and
    *   2. the unseen candidates' vectors: corpus rows `id ∈ candidates`
    *      (≤ frontier × degree rows), evaluated with the resultFilter
    *      predicate server-side.
    *
    * Both reads cache across hops (an id's vector and a node's edge list
    * are immutable within one search), so later hops fetch only genuinely
    * new ids. The distributed loop pays per-hop window/checkpoint/join
    * DAGs whose fixed cost dominates small batches (the measured ~12 s
    * batch-1 floor, GraphBatchCurve); this twin's per-hop floor is two
    * small jobs. Scale contract: queries × beamWidth × degree × hops
    * driver rows — the [[AnnTuner]] audit-sample discipline; large
    * batches belong on [[searchMany]] (which delegates here below
    * `smallBatchBound` and runs distributed above it).
    */
  def searchManyLocal(
      graph: DataFrame, corpus: DataFrame, queries: DataFrame,
      qId: String, qVec: String, idCol: String, vecCol: String,
      k: Int, beamWidth: Int = 32, maxHops: Int = 12, nSeeds: Int = 4,
      expandPerHop: Int = 0, scoreScale: Int = 6,
      srcBuckets: Option[Int] = None,
      resultFilter: Option[org.apache.spark.sql.Column] = None,
      idBuckets: Option[Int] = None,
      cache: Option[ServingCache] = None): DataFrame = {
    require(k > 0 && beamWidth >= k, s"need beamWidth >= k > 0, got $beamWidth/$k")
    srcBuckets.foreach(nb => require(nb > 0 && graph.columns.contains("src_bucket"),
      s"srcBuckets=Some($nb) needs a writeGraphStore layout with src_bucket"))
    idBuckets.foreach(nb => require(nb > 0 && corpus.columns.contains("id_bucket"),
      s"idBuckets=Some($nb) needs a writeVectorStore layout with id_bucket"))
    val spark = queries.sparkSession
    val qs = queries.select(col(qId).cast("long"),
        VectorFunctions.asFloatArray(col(qVec)))
      .collect()
      .map(r => r.getLong(0) -> r.getAs[scala.collection.Seq[Float]](1).toArray)
      .toIndexedSeq
    // output schema matches the distributed path's (nullable columns,
    // RDD-backed relation): a non-nullable LocalRelation head changes the
    // downstream plan shape — empirically it trips Catalyst's Union
    // constraint rewrite inside appendRewrite's prune self-join — and the
    // driver's parallelize(rows) pattern (the qkn discipline) sidesteps
    // ConvertToLocalRelation folding entirely
    val outSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("query_id",
        org.apache.spark.sql.types.LongType, nullable = true),
      org.apache.spark.sql.types.StructField("neighbor_id",
        org.apache.spark.sql.types.LongType, nullable = true),
      org.apache.spark.sql.types.StructField("score",
        org.apache.spark.sql.types.DoubleType, nullable = true),
      org.apache.spark.sql.types.StructField("rn",
        org.apache.spark.sql.types.IntegerType, nullable = true)))
    if (qs.isEmpty)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], outSchema)
    val out = searchManyLocalRows(graph, corpus, qs, idCol, vecCol, k,
      beamWidth, maxHops, nSeeds, expandPerHop, scoreScale, srcBuckets,
      resultFilter, idBuckets, cache)
      .map { case (qid, id, s, rn) => org.apache.spark.sql.Row(qid, id, s, rn) }
    spark.createDataFrame(spark.sparkContext.parallelize(out, 1), outSchema)
  }

  /** [[searchManyLocal]]'s kernel with driver-side inputs and outputs —
    * the round-12 optimization seam: the driver-hosted append rewrite
    * consumes (query, neighbor) rows directly, so the insert path no
    * longer round-trips them through parallelize + re-collect.
    */
  private[graft] def searchManyLocalRows(
      graph: DataFrame, corpus: DataFrame,
      qs: IndexedSeq[(Long, Array[Float])],
      idCol: String, vecCol: String,
      k: Int, beamWidth: Int, maxHops: Int, nSeeds: Int,
      expandPerHop: Int, scoreScale: Int,
      srcBuckets: Option[Int],
      resultFilter: Option[org.apache.spark.sql.Column],
      idBuckets: Option[Int],
      cache: Option[ServingCache]): Seq[(Long, Long, Double, Int)] = {
    // warm-cache handle (round 12): filtered searches bypass it — the
    // cached keep-flag is predicate-specific. Seeds come from the cached
    // image when present (exact: the caller's ensure/advance protocol
    // keeps it equal to entryPoints over this corpus), else one
    // TakeOrdered job that warms it.
    val warm = cache.filter(_ => resultFilter.isEmpty)
    val seeds = warm.flatMap(_.seedsFor(nSeeds)).getOrElse {
      val s = entryPoints(corpus, idCol, nSeeds)
      warm.foreach(_.recordSeeds(nSeeds, s))
      s
    }
    val cBase = corpus.select(
      col(idCol).cast("long").as("__vid") +:
        VectorFunctions.asFloatArray(col(vecCol)).as("__v") +:
        resultFilter.getOrElse(lit(true)).cast("boolean").as("__keep") +:
        (if (idBuckets.isDefined) Seq(col("id_bucket")) else Nil): _*)
    val gBase = graph.select(
      col("src").cast("long") +: col("dst").cast("long") +:
        (if (srcBuckets.isDefined) Seq(col("src_bucket")) else Nil): _*)

    // vector/filter cache: id -> (vec, keep); None marks "not in corpus"
    // so later hops never re-probe an absent id. With a writeVectorStore
    // corpus the fetch is id_bucket-pruned first (partition predicate),
    // the point lookup stays the isInCollection filter. With a warm
    // handle the maps OUTLIVE this call — entries are immutable within a
    // store version, so reuse changes cost, never results.
    val vecCache = warm.map(_.vecCache).getOrElse(
      scala.collection.mutable.Map.empty[Long, Option[(Array[Float], Boolean)]])
    def fetchVecs(ids: Iterable[Long]): Unit = {
      val missing = ids.iterator.filterNot(vecCache.contains).toSeq.distinct
      if (missing.nonEmpty) {
        val slice = idBuckets match {
          case Some(nb) =>
            val buckets = missing.map(id => (((id % nb) + nb) % nb).toInt).distinct
            cBase.where(col("id_bucket").isin(buckets: _*)).drop("id_bucket")
          case None => cBase
        }
        slice.where(col("__vid").isInCollection(missing)).collect().foreach { r =>
          vecCache(r.getLong(0)) = Some((
            r.getAs[scala.collection.Seq[Float]](1).toArray,
            !r.isNullAt(2) && r.getBoolean(2)))
        }
        missing.foreach(id => vecCache.getOrElseUpdate(id, None))
      }
    }
    // adjacency cache: src -> out-edges, fetched per hop for the union of
    // all queries' frontiers; bucket-pruned first on a store layout
    val adjCache = warm.map(_.adjCache).getOrElse(
      scala.collection.mutable.Map.empty[Long, Array[Long]])
    def fetchAdj(ids: Iterable[Long]): Unit = {
      val missing = ids.iterator.filterNot(adjCache.contains).toSeq.distinct
      if (missing.nonEmpty) {
        val sliced = srcBuckets match {
          case Some(nb) =>
            val buckets = missing.map(id =>
              (((id % nb) + nb) % nb).toInt).distinct
            gBase.where(col("src_bucket").isin(buckets: _*)).drop("src_bucket")
          case None => gBase
        }
        val rows = sliced.where(col("src").isInCollection(missing)).collect()
        rows.groupBy(_.getLong(0)).foreach { case (s, rs) =>
          adjCache(s) = rs.map(_.getLong(1)).distinct.sorted
        }
        missing.foreach(id => adjCache.getOrElseUpdate(id, Array.empty[Long]))
      }
    }

    // per-query beam state, mirroring the distributed loop exactly:
    // (score desc, id asc) ordering, whole-frontier (or capped best-first)
    // expansion, visited = every id ever CANDIDATE (scored or not)
    final class QState(val qid: Long, val qv: Array[Float]) {
      var beam: Vector[(Long, Double, Boolean)] = Vector.empty // (id, score, expanded)
      val visited: scala.collection.mutable.Set[Long] =
        scala.collection.mutable.Set.empty[Long]
      var results: Vector[(Long, Double)] = Vector.empty // filtered mode only
    }
    def scoreOf(st: QState, id: Long): Option[(Long, Double, Boolean)] =
      if (id == st.qid) None
      else vecCache(id).map { case (v, keep) =>
        (id, IvfIndex.roundHalfUp(IvfIndex.cosineScalar(v, st.qv), scoreScale), keep)
      }
    val filtered = resultFilter.isDefined
    fetchVecs(seeds)
    val states = qs.map { case (qid, qv) =>
      val st = new QState(qid, qv)
      st.visited ++= seeds
      val seedScored = seeds.flatMap(scoreOf(st, _))
      st.beam = seedScored.map { case (id, s, _) => (id, s, false) }.toVector
      if (filtered)
        st.results = seedScored.filter(_._3).map { case (id, s, _) => (id, s) }
          .toVector.sortBy(t => (-t._2, t._1)).take(k)
      st
    }
    var hop = 0
    var anyFrontier = states.exists(_.beam.exists(!_._3))
    while (hop < maxHops && anyFrontier) {
      val frontiers = states.map { st =>
        val unexp = st.beam.filter(!_._3)
        val f =
          if (expandPerHop <= 0) unexp
          else unexp.sortBy(t => (-t._2, t._1)).take(expandPerHop)
        st -> f.map(_._1)
      }
      fetchAdj(frontiers.iterator.flatMap(_._2).toSeq)
      val perQueryNbrs = frontiers.map { case (st, f) =>
        val nbrs = f.flatMap(adjCache(_)).distinct
          .filterNot(st.visited)
        st -> (f, nbrs)
      }
      fetchVecs(perQueryNbrs.iterator.flatMap(_._2._2).toSeq)
      perQueryNbrs.foreach { case (st, (f, nbrs)) =>
        val fresh = nbrs.flatMap(scoreOf(st, _))
        val fSet = f.toSet
        val marked = st.beam.map { case (id, s, e) =>
          (id, s, e || fSet.contains(id))
        }
        st.beam = (marked ++ fresh.map { case (id, s, _) => (id, s, false) })
          .sortBy(t => (-t._2, t._1)).take(beamWidth)
        if (filtered)
          st.results = (st.results ++
            fresh.filter(_._3).map { case (id, s, _) => (id, s) })
            .sortBy(t => (-t._2, t._1)).take(k)
        st.visited ++= nbrs
      }
      anyFrontier = states.exists(_.beam.exists(!_._3))
      hop += 1
    }
    states.toSeq.flatMap { st =>
      val ranked =
        if (filtered) st.results
        else st.beam.map { case (id, s, _) => (id, s) }
          .sortBy(t => (-t._2, t._1)).take(k)
      ranked.zipWithIndex.map { case ((id, s), i) => (st.qid, id, s, i + 1) }
    }
  }

  /** Result of one [[localBeam]] search: ranked (id, score) plus the
    * evaluation count (distinct nodes actually SCORED — the probe cost;
    * the excluded query id and adjacency targets absent from the audit
    * sample enter `visited` but cost nothing and are not counted).
    * `converged` = the beam settled (no unexpanded member) before the hop
    * budget ran out — the per-query health signal [[graphHealth]] rolls up.
    */
  final case class BeamResult(
      hits: Seq[(Long, Double)], scored: Int, hops: Int,
      converged: Boolean = true)

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
      expandPerHop: Int = 0, keep: Long => Boolean = _ => true): BeamResult = {
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
    // running top-k of MATCHING scored nodes — the searchMany filtered-
    // search twin; with the default keep this equals the final beam's
    // top-k (the beam is the running top-beamWidth of everything scored)
    var results = seedScored.filter(t => keep(t._1)).sorted(ord).take(k)
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
      results = (results ++ fresh.filter(t => keep(t._1))).sorted(ord).take(k)
      frontier = beam.map(_._1).filterNot(expanded)
      hop += 1
    }
    BeamResult(results, scoredCount, hop, converged = frontier.isEmpty)
  }

  /** Rolled-up beam-tier health from an audit query sample — the graph
    * tier's `IvfIndex.assignQuality` analog (VERDICT r9 task 5): mean hops
    * to converge, mean scored fraction, and the converged fraction. All
    * three drift in a KNOWN DIRECTION as frozen-build structure goes stale
    * under appends (appended nodes carry no skip-ring links, so routes
    * lengthen: hops and scored fraction rise, convergence within the hop
    * budget falls — GraphAnnSpec gates the direction on an appended-vs-
    * fresh graph). Rebuild guidance: re-run the probe on the build-time
    * audit sample after appends and rebuild via [[buildGraph]] when
    * meanHops exceeds the build-time baseline by ~1.5× or convergedFrac
    * drops below ~0.9 — alongside the cheap [[ringCoverage]] ratio, which
    * needs no queries at all. Audit-sample contract as [[AnnTuner]]:
    * vecs/adj are a bounded collected sample, builds stay distributed.
    */
  final case class GraphHealth(
      meanHops: Double, meanScoredFrac: Double, convergedFrac: Double,
      nQueries: Int)

  /** Measure [[GraphHealth]] with [[localBeam]] over `queries` (id, vec)
    * pairs — one beam per query against the collected audit adjacency.
    */
  def graphHealth(
      vecs: Map[Long, Array[Float]], adj: Map[Long, Array[Long]],
      seeds: Seq[Long], queries: Seq[(Long, Array[Float])],
      k: Int = 10, beamWidth: Int = 32, maxHops: Int = 12,
      expandPerHop: Int = 4): GraphHealth = {
    require(queries.nonEmpty, "graphHealth needs a non-empty query sample")
    require(vecs.nonEmpty, "graphHealth needs a non-empty audit sample")
    val rs = queries.map { case (qid, qv) =>
      localBeam(vecs, adj, seeds, qv, Some(qid), k, beamWidth, maxHops,
        expandPerHop)
    }
    GraphHealth(
      meanHops = rs.map(_.hops.toDouble).sum / rs.length,
      meanScoredFrac = rs.map(_.scored.toDouble / vecs.size).sum / rs.length,
      convergedFrac = rs.count(_.converged).toDouble / rs.length,
      nQueries = rs.length)
  }

  /** The ring-coverage ratio — the zero-query staleness probe: the
    * fraction of the graph's live source nodes that were present at BUILD
    * time (`buildIds`: the build corpus' id column — the roster every
    * deployment has, since it fed [[buildGraph]]). Only build nodes carry
    * skip-ring long links, so coverage IS the ring-linked fraction; it
    * falls as 1/growth under appends. Documented threshold: rebuild below
    * ~0.7 (several-fold growth, matching the [[appendNodes]] staleness
    * contract). Cost: one column-pruned distinct + a broadcast-ranged
    * semi-join — cheap enough to run on every append.
    */
  def ringCoverage(
      graph: DataFrame, buildIds: DataFrame, buildIdCol: String): Double = {
    val live = graph.select(col("src").cast("long")).distinct()
    val build = buildIds.select(col(buildIdCol).cast("long").as("src")).distinct()
    val row = live
      .join(build, Seq("src"), "left_semi")
      .agg(count(lit(1))).head()
    val covered = row.getLong(0)
    val total = live.count()
    if (total == 0) 1.0 else covered.toDouble / total
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
