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

  test("validation: a non-positive hop cap refuses") {
    intercept[IllegalArgumentException](
      GraphOps.seedDistances(
        Seq((1L, 2L)).toDF("src", "dst"), Seq(1L).toDF("node"), maxHops = 0))
  }
}
