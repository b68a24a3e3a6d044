package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Power-iteration PageRank: hand-computed ranks, probability-mass
  * conservation (the dangling-redistribution invariant), input hygiene
  * (duplicate edges, self-loops), and partition invariance.
  */
class PageRankSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestBase.spark
  import spark.implicits._

  private def ranks(edges: Seq[(Long, Long)], iters: Int): Map[Long, Double] =
    GraphOps.pageRank(edges.toDF("src", "dst"), iterations = iters)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

  test("one iteration matches the hand-computed ranks") {
    // 1→2, 2→1, 1→3; node 3 is dangling. N=3, d=0.85, pr0 = 1/3 each:
    //   dangling mass = 1/3, base = 0.15/3 = 0.05, dm/N = 1/9
    //   pr(1) = 0.05 + 0.85·(1/3 + 1/9)  = 0.427777778
    //   pr(2) = 0.05 + 0.85·(1/6 + 1/9)  = 0.286111111
    //   pr(3) = pr(2)                     (same in-contribution)
    val pr = ranks(Seq((1L, 2L), (2L, 1L), (1L, 3L)), iters = 1)
    assert(math.abs(pr(1L) - 0.427777778) < 1e-8)
    assert(math.abs(pr(2L) - 0.286111111) < 1e-8)
    assert(math.abs(pr(3L) - 0.286111111) < 1e-8)
  }

  test("rank mass stays a probability distribution across iterations") {
    // star + chain + a dangling sink: redistribution must conserve mass
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (3L, 4L), (4L, 5L))
    for (k <- 1 to 4) {
      val pr = ranks(edges, iters = k)
      assert(math.abs(pr.values.sum - 1.0) < 1e-6, s"mass drifted at iter $k")
      assert(pr.values.forall(_ > 0))
    }
  }

  test("duplicate edges and self-loops do not change the result") {
    val clean = ranks(Seq((1L, 2L), (2L, 3L), (3L, 1L)), iters = 3)
    val noisy = ranks(
      Seq((1L, 2L), (1L, 2L), (2L, 3L), (3L, 1L), (2L, 2L), (3L, 3L)), iters = 3)
    assert(clean == noisy)
  }

  test("a well-linked node outranks the periphery") {
    // everyone points at 9; 9 points at 1
    val edges = (1L to 8L).map(i => (i, 9L)) :+ ((9L, 1L))
    val pr = ranks(edges, iters = 3)
    assert(pr(9L) == pr.values.max)
    assert((2L to 8L).forall(i => pr(9L) > pr(i)))
  }

  test("partition-invariant: repartitioned edges produce identical ranks") {
    val edges = (1L to 40L).map(i => (i % 7, (i * 3) % 11)).filter(e => e._1 != e._2)
    val df = edges.toDF("src", "dst")
    val a = GraphOps.pageRank(df, iterations = 3)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    val b = GraphOps.pageRank(df.repartition(13), iterations = 3)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(a == b)
  }

  test("personalized: mass stays on the seed's component, seed dominates a cycle") {
    // cycle 1→2→3→1 (mass recirculates to the seed) + off-seed island 10→11
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (10L, 11L)).toDF("src", "dst")
    val seeds = Seq(1L).toDF("node")
    val pr = GraphOps.personalizedPageRank(edges, seeds, iterations = 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(pr.values.sum - 1.0) < 1e-6) // still a distribution
    assert(pr(1L) == pr.values.max) // recirculation: the seed dominates
    assert(pr(2L) > 0 && pr(3L) > 0)
    // the island is unreachable from the seed: zero rank, exactly
    assert(pr(10L) == 0.0 && pr(11L) == 0.0)
    // every node keeps at least its restart floor: seed ≥ (1−d)
    assert(pr(1L) >= 0.15 - 1e-9)
  }

  test("personalized: a seed outside the edge set still carries its mass") {
    val edges = Seq((1L, 2L)).toDF("src", "dst")
    val seeds = Seq(99L).toDF("node")
    val pr = GraphOps.personalizedPageRank(edges, seeds, iterations = 2)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(pr.contains(99L) && pr(99L) > 0.9) // dangling seed: keeps ~all mass
    assert(math.abs(pr.values.sum - 1.0) < 1e-6)
    intercept[IllegalArgumentException](
      GraphOps.personalizedPageRank(edges, Seq.empty[Long].toDF("node")))
  }

  private def wranks(edges: Seq[(Long, Long, Double)], iters: Int): Map[Long, Double] =
    GraphOps.weightedPageRank(edges.toDF("src", "dst", "w"), iterations = iters)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

  test("weighted: equal weights reproduce the unweighted ranks") {
    val base = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L))
    val u = ranks(base, iters = 3)
    val w = wranks(base.map { case (a, b) => (a, b, 1.0) }, iters = 3)
    // pr·(w/wsum) vs pr/outdeg differ by one double rounding step; the
    // 9-decimal grid keeps them within an ulp of the grid
    assert(u.keySet == w.keySet)
    assert(u.keySet.forall(k => math.abs(u(k) - w(k)) < 1e-8))
  }

  test("weighted: the heavier edge pulls more rank") {
    val w = wranks(Seq((1L, 2L, 9.0), (1L, 3L, 1.0), (2L, 1L, 1.0), (3L, 1L, 1.0)),
      iters = 3)
    assert(w(2L) > w(3L))
    assert(math.abs(w.values.sum - 1.0) < 1e-6) // still a distribution
  }

  test("weighted: parallel edges collapse by summing weights") {
    val split = wranks(Seq((1L, 2L, 1.0), (1L, 2L, 1.0), (1L, 2L, 1.0),
      (1L, 3L, 1.0), (3L, 1L, 1.0)), iters = 3)
    val merged = wranks(Seq((1L, 2L, 3.0), (1L, 3L, 1.0), (3L, 1L, 1.0)), iters = 3)
    assert(split == merged)
  }

  test("weighted: non-positive weights are dropped") {
    val clean = wranks(Seq((1L, 2L, 2.0), (2L, 1L, 1.0)), iters = 2)
    val noisy = wranks(Seq((1L, 2L, 2.0), (2L, 1L, 1.0),
      (1L, 3L, 0.0), (2L, 3L, -5.0)), iters = 2)
    assert(clean == noisy)
  }

  test("validation: empty graph, bad damping, bad iterations refuse") {
    intercept[IllegalArgumentException](
      GraphOps.pageRank(Seq.empty[(Long, Long)].toDF("src", "dst")))
    intercept[IllegalArgumentException](
      GraphOps.pageRank(Seq((1L, 2L)).toDF("src", "dst"), damping = 1.0))
    intercept[IllegalArgumentException](
      GraphOps.pageRank(Seq((1L, 2L)).toDF("src", "dst"), iterations = 0))
  }
}
