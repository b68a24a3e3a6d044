package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Directed BFS seed distances: hand-computed chains, shortest-path min,
  * direction, hop cap, multi-seed union, and off-graph seeds.
  */
class SeedDistanceSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestBase.spark
  import spark.implicits._

  private def dists(edges: Seq[(Long, Long)], seeds: Seq[Long],
      hops: Int): Map[Long, Long] =
    GraphOps.seedDistances(
        edges.toDF("src", "dst"), seeds.toDF("node"), maxHops = hops)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("chain distances respect the hop cap") {
    val chain = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L))
    val d = dists(chain, Seq(1L), hops = 3)
    assert(d == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L)) // 5, 6 beyond cap
  }

  test("the shortest of several paths wins") {
    // 1→2→3 and the shortcut 1→3
    val d = dists(Seq((1L, 2L), (2L, 3L), (1L, 3L)), Seq(1L), hops = 3)
    assert(d == Map(1L -> 0L, 2L -> 1L, 3L -> 1L))
  }

  test("edges are directed: upstream nodes stay unreached") {
    val d = dists(Seq((2L, 1L), (3L, 2L)), Seq(1L), hops = 3)
    assert(d == Map(1L -> 0L))
  }

  test("multiple seeds take the min frontier; islands stay absent") {
    // two chains, one seeded at each end; 100→101 is an unreachable island
    val edges = Seq((1L, 2L), (2L, 3L), (10L, 3L), (100L, 101L))
    val d = dists(edges, Seq(1L, 10L), hops = 3)
    assert(d == Map(1L -> 0L, 10L -> 0L, 2L -> 1L, 3L -> 1L)) // 3 via 10, not 1→2→3
    assert(!d.contains(100L) && !d.contains(101L))
  }

  test("an off-graph seed is emitted at distance zero") {
    val d = dists(Seq((1L, 2L)), Seq(1L, 99L), hops = 2)
    assert(d == Map(1L -> 0L, 2L -> 1L, 99L -> 0L))
  }

  private def wdists(edges: Seq[(Long, Long, Long)], seeds: Seq[Long],
      hops: Int): Map[Long, Long] =
    GraphOps.weightedSeedDistances(
        edges.toDF("src", "dst", "w"), seeds.toDF("node"), maxHops = hops)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("weighted: a longer-hop cheap detour beats the direct heavy edge") {
    // 1→4 costs 10; 1→2→3→4 costs 1+1+1 = 3
    val g = Seq((1L, 4L, 10L), (1L, 2L, 1L), (2L, 3L, 1L), (3L, 4L, 1L))
    val d = wdists(g, Seq(1L), hops = 4)
    assert(d(4L) == 3L)
    // with only 1 relaxation round the heavy direct edge is the best ≤1-hop walk
    assert(wdists(g, Seq(1L), hops = 1)(4L) == 10L)
  }

  test("weighted: multi-seed min and unreachable absence") {
    val g = Seq((1L, 2L, 5L), (10L, 2L, 1L), (20L, 21L, 1L))
    val d = wdists(g, Seq(1L, 10L), hops = 3)
    assert(d(2L) == 1L) // seed 10's cheaper edge wins
    assert(!d.contains(21L) && !d.contains(20L))
  }

  test("weighted equals unweighted BFS when every weight is 1") {
    val chain = Seq((1L, 2L), (2L, 3L), (3L, 4L))
    val w1 = chain.map { case (a, b) => (a, b, 1L) }
    assert(wdists(w1, Seq(1L), 3) == dists(chain, Seq(1L), 3))
  }

  test("validation: a non-positive hop cap refuses") {
    intercept[IllegalArgumentException](
      GraphOps.seedDistances(
        Seq((1L, 2L)).toDF("src", "dst"), Seq(1L).toDF("node"), maxHops = 0))
  }
}
