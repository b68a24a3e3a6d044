package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cross-method ANN auto-tuner (VERDICT r8 task 5, closing the loop on r7
  * task 2): one recall/cost curve spanning BOTH index families — IVF
  * (coarse cells, cost = fraction of the corpus the probed partitions
  * hold) and the [[GraphAnn]] beam tier (cost = fraction of the corpus
  * whose vectors the traversal actually scores) — and the cheapest
  * configuration meeting a target recall across all of them. This is what
  * lets a deployment ask "recall ≥ 0.95 at minimum probe cost" and get
  * back `graph m=12 beam=48` when the beam tier genuinely beats every IVF
  * point, instead of being confined to whichever family the caller
  * thought to tune (the reference's Qdrant default is the graph tier;
  * `internal/vectordb/vectordb.go:94-104`).
  *
  * Cost is the same unit on both sides — the fraction of corpus vectors
  * whose float data a query touches — so points are comparable: an IVF
  * probe reads its cells' rows; a beam search reads the rows it scores.
  *
  * Audit-sample contract (identical to `IvfIndex.tuneForRecall`): `corpus`
  * is a bounded deterministic sample (≲10⁵ rows); index BUILDS run the
  * real distributed paths (centroid draw + refineExact, LSH-banded graph
  * build), measurement runs on the collected sample with the
  * spec-proven-equivalent local arithmetic, and the chosen config
  * transfers to the full-scale build.
  *
  * Maintenance probes (when to re-tune/rebuild, per family): IVF —
  * `IvfIndex.assignQuality` per append delta (falling mean member→centroid
  * cosine = the corpus moved off the frozen centroids); graph —
  * `GraphAnn.ringCoverage` per append (ring-linked fraction of live nodes;
  * rebuild below ~0.7) and `GraphAnn.graphHealth` on the build-time audit
  * sample (rising mean hops / falling converged fraction). Past tolerance
  * the answer in every family is a rebuild commit into the same versioned
  * root, then re-run this tuner on the fresh audit sample.
  */
object AnnTuner {

  /** One measured configuration: `method` ∈ {"ivf", "graph"}, a
    * human-readable `config`, recall@k over the query sample, and the
    * mean fraction of corpus vectors a query touches.
    */
  final case class AnnPoint(
      method: String, config: String, recall: Double, costFrac: Double)

  /** Tuner output: the full measured multi-method curve plus the cheapest
    * point meeting the target (None when nothing reaches it).
    */
  final case class AnnTune(best: Option[AnnPoint], curve: Seq[AnnPoint]) {
    def curveDf(spark: org.apache.spark.sql.SparkSession): DataFrame = {
      import spark.implicits._
      curve.map(p => (p.method, p.config, p.recall, p.costFrac))
        .toDF("method", "config", "recall", "cost_frac")
    }
  }

  /** Measure the IVF grid (delegating to [[IvfIndex.tuneForRecall]]), a
    * [[GraphAnn]] (m, beamWidth) grid, and a PQ two-stage-rerank shortlist
    * ladder on the same query sample, and pick the cheapest point with
    * recall ≥ `targetRecall`. PQ cost on the shared axis is honest about
    * BOTH stages: the full codes pass costs m/(4·dim) float-equivalents
    * (m bytes vs 4·dim float bytes per row) plus the r/N float fetch of
    * the re-rank — on locality-free corpora this is usually the winning
    * tier, on clustered corpora the pruning tiers overtake it, and the
    * tuner is what tells a deployment which regime it is in. Ties break
    * to the smaller config string — deterministic output for a
    * deterministic corpus. Pass an empty grid to skip a family.
    */
  def tune(
      corpus: DataFrame, idCol: String, vecCol: String,
      targetRecall: Double, k: Int,
      nCellsGrid: Seq[Int] = Seq(8, 16, 32, 64),
      graphGrid: Seq[(Int, Int)] = Seq((12, 48), (16, 96)),
      pqFracGrid: Seq[Double] = Seq(0.05, 0.10),
      pqM: Int = 16, pqCodes: Int = 64, pqRefineIters: Int = 3,
      nQueries: Int = 30, refineIters: Int = 2, nSeeds: Int = 4,
      maxHops: Int = 24, expandPerHop: Int = 8): AnnTune = {
    require(targetRecall > 0 && targetRecall <= 1, s"bad target $targetRecall")
    val ivf = IvfIndex.tuneForRecall(
      corpus, idCol, vecCol, targetRecall, k, nCellsGrid, nQueries, refineIters)
    val ivfPoints = ivf.curve.map(p => AnnPoint("ivf",
      s"nCells=${p.nCells},nProbe=${p.nProbe}", p.recall, p.scanFrac))

    // shared exact ground truth for the graph leg (the tuneForRecall shape)
    val vecsArr = corpus
      .select(col(idCol).cast("long").as("id"),
        graft.functions.VectorFunctions.asFloatArray(col(vecCol)).as("v"))
      .collect()
      .map(r => r.getLong(0) -> r.getAs[scala.collection.Seq[Float]](1).toArray)
      .sortBy(_._1)
    require(vecsArr.length > k, s"audit sample smaller than k=$k")
    val vecs = vecsArr.toMap
    val queries = vecsArr.take(nQueries)
    val exactByQ = queries.map { case (qid, qv) =>
      qid -> vecsArr.filter(_._1 != qid).map { case (id, v) =>
        (IvfIndex.roundHalfUp(IvfIndex.cosineScalar(v, qv), 6), id)
      }.sortBy { case (s, id) => (-s, id) }.take(k).map(_._2).toSet
    }.toMap
    val seeds = GraphAnn.entryPoints(corpus, idCol, nSeeds)
    val n = vecsArr.length.toDouble

    val graphPoints = graphGrid.map { case (m, bw) =>
      // REAL distributed graph build per config; local beam measurement
      // (GraphAnnSpec proves local == distributed per query)
      val adj = GraphAnn.collectAdjacency(
        GraphAnn.buildGraph(corpus, idCol, vecCol, m = m))
      val per = queries.map { case (qid, qv) =>
        val r = GraphAnn.localBeam(vecs, adj, seeds, qv, Some(qid),
          k, beamWidth = bw, maxHops = maxHops, expandPerHop = expandPerHop)
        val got = r.hits.map(_._1).toSet
        ((exactByQ(qid) intersect got).size.toDouble / k, r.scored / n)
      }
      AnnPoint("graph", s"m=$m,beam=$bw",
        per.map(_._1).sum / per.length, per.map(_._2).sum / per.length)
    }

    val pqPoints =
      if (pqFracGrid.isEmpty) Seq.empty
      else {
        // pqMeanRecall runs the REAL distributed searchRerank per query —
        // the same shared-harness discipline as the other legs; it reads
        // the (vec_id, embedding) shape, so normalize the caller's names
        val pqCorpus = corpus.select(
          col(idCol).cast("long").as("vec_id"), col(vecCol).as("embedding"))
        val cb = PqIndex.refineCodebook(pqCorpus, "embedding",
          PqIndex.codebookByDraw(pqCorpus, "vec_id", "embedding", pqM, pqCodes),
          pqRefineIters)
        val dim = vecsArr.head._2.length
        val codesPass = pqM.toDouble / (4.0 * dim)
        pqFracGrid.map { f =>
          val r = math.max(k, math.ceil(f * (vecsArr.length - 1)).toInt)
          val rec = graft.tools.RecallHarness.pqMeanRecall(
            pqCorpus, cb, rerank = Some(r), nQueries = nQueries, k = k)
          // cost from the EFFECTIVE shortlist actually passed to
          // searchRerank — when k dominates ceil(f·(N−1)) the nominal f
          // understates the measured configuration and would mis-rank PQ
          // against the IVF/graph points on the shared axis
          val rFrac = r.toDouble / (vecsArr.length - 1)
          AnnPoint("pq-rerank", s"m=$pqM,rOverN=$f", rec, codesPass + rFrac)
        }
      }

    val curve = ivfPoints ++ graphPoints ++ pqPoints
    val best = curve.filter(_.recall >= targetRecall)
      .sortBy(p => (p.costFrac, p.config)).headOption
    AnnTune(best, curve)
  }

  /** One measured beam serving configuration over a FIXED graph (round 12,
    * VERDICT r11 task 6): the four serving/insert knobs, recall@k over the
    * query sample, mean scored corpus fraction (the shared cost axis),
    * and mean hops to converge (the LATENCY proxy in the driver-hosted
    * regime, where each hop is a fixed-cost round trip — the
    * GraphBatchCurve lesson that hop count, not data volume, prices the
    * small-batch path).
    */
  final case class BeamPoint(
      beamWidth: Int, maxHops: Int, nSeeds: Int, expandPerHop: Int,
      recall: Double, costFrac: Double, meanHops: Double) {
    def config: String =
      s"beam=$beamWidth,hops=$maxHops,seeds=$nSeeds,expand=$expandPerHop"
  }

  final case class BeamTune(best: Option[BeamPoint], curve: Seq[BeamPoint])

  /** Grid-measure the BEAM SERVING KNOBS on a bounded audit sample —
    * the graph-tier axis [[tune]] does not cover (it tunes the BUILD:
    * m/beamWidth per graph; this tunes serving/insert against ONE built
    * graph, which is what a deployment re-tunes as the corpus drifts
    * without paying a rebuild). Same audit-sample contract: the graph
    * and ground truth are real, measurement runs [[GraphAnn.localBeam]]
    * — the spec-proven twin of both serving paths.
    *
    * Selection: cheapest point with recall ≥ `targetRecall`, cost ranked
    * by (scored fraction, mean hops, knobs) — scored work prices the
    * distributed path, hops price the driver-hosted one; ranking cost
    * first with hops as the tiebreak picks configs good for both. Use the
    * winner's knobs in `searchMany`/`searchManyLocal`/insert calls (e.g.
    * via `StreamingGraphIndex.Config(beamWidth = p.beamWidth, ...)`).
    */
  def tuneBeam(
      corpus: DataFrame, idCol: String, vecCol: String, graph: DataFrame,
      targetRecall: Double, k: Int,
      beamGrid: Seq[Int] = Seq(16, 32, 48),
      hopsGrid: Seq[Int] = Seq(8, 24),
      seedsGrid: Seq[Int] = Seq(2, 4),
      expandGrid: Seq[Int] = Seq(0, 8),
      nQueries: Int = 30): BeamTune = {
    require(targetRecall > 0 && targetRecall <= 1, s"bad target $targetRecall")
    val vecsArr = corpus
      .select(col(idCol).cast("long").as("id"),
        graft.functions.VectorFunctions.asFloatArray(col(vecCol)).as("v"))
      .collect()
      .map(r => r.getLong(0) -> r.getAs[scala.collection.Seq[Float]](1).toArray)
      .sortBy(_._1)
    require(vecsArr.length > k, s"audit sample smaller than k=$k")
    val vecs = vecsArr.toMap
    val queries = vecsArr.take(nQueries)
    val exactByQ = queries.map { case (qid, qv) =>
      qid -> vecsArr.filter(_._1 != qid).map { case (id, v) =>
        (IvfIndex.roundHalfUp(IvfIndex.cosineScalar(v, qv), 6), id)
      }.sortBy { case (s, id) => (-s, id) }.take(k).map(_._2).toSet
    }.toMap
    val adj = GraphAnn.collectAdjacency(graph)
    val n = vecsArr.length.toDouble
    val curve = for {
      bw <- beamGrid; if bw >= k
      mh <- hopsGrid
      ns <- seedsGrid
      ex <- expandGrid
    } yield {
      val seeds = GraphAnn.entryPoints(corpus, idCol, ns)
      val per = queries.map { case (qid, qv) =>
        val r = GraphAnn.localBeam(vecs, adj, seeds, qv, Some(qid),
          k, beamWidth = bw, maxHops = mh, expandPerHop = ex)
        ((exactByQ(qid) intersect r.hits.map(_._1).toSet).size.toDouble / k,
          r.scored / n, r.hops.toDouble)
      }
      BeamPoint(bw, mh, ns, ex,
        recall = per.map(_._1).sum / per.length,
        costFrac = per.map(_._2).sum / per.length,
        meanHops = per.map(_._3).sum / per.length)
    }
    val best = curve.filter(_.recall >= targetRecall)
      .sortBy(p => (p.costFrac, p.meanHops,
        p.beamWidth, p.maxHops, p.nSeeds, p.expandPerHop)).headOption
    BeamTune(best, curve.toSeq)
  }
}
