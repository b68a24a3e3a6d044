package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Harmonic centrality and bounded-radius Brandes betweenness:
  * hand-computed truths on path/diamond/tie graphs, truncation
  * semantics, hygiene, partition invariance.
  */
class CentralitySpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestBase.spark
  import spark.implicits._

  private def harmonic(edges: Seq[(Long, Long)], seeds: Seq[Long],
      maxHops: Int = 4): Map[Long, (Long, Long, Double)] =
    GraphOps.harmonicCentrality(edges.toDF("src", "dst"),
        seeds.toDF("node"), maxHops)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap

  private def btw(edges: Seq[(Long, Long)], sources: Seq[Long],
      maxDepth: Int = 3): Map[Long, Double] =
    GraphOps.betweennessFromSources(edges.toDF("src", "dst"),
        sources.toDF("node"), maxDepth)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

  test("harmonic on a path: 1 + 1/2 + 1/3, exact integer distance sums") {
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L))
    val h = harmonic(path, Seq(1L, 2L, 4L))
    assert(h(1L) == ((3L, 6L, 1.833333)))   // d=1,2,3
    assert(h(2L) == ((2L, 3L, 1.5)))        // d=1,2
    assert(!h.contains(4L))                 // sink seed: absent = 0
  }

  test("harmonic hop cap truncates the sum; BFS takes the SHORTEST route") {
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L))
    assert(harmonic(path, Seq(1L), maxHops = 1)(1L) == ((1L, 1L, 1.0)))
    // shortcut 1->3 beats 1->2->3: d(3)=1 not 2
    val shortcut = path :+ (1L, 3L)
    assert(harmonic(shortcut, Seq(1L))(1L) == ((3L, 4L, 2.5))) // 1+1+1/2
  }

  test("betweenness on a diamond: the two middle nodes split the pair") {
    // 1->2->4, 1->3->4: sigma(4)=2, delta(2)=delta(3)=1/2
    val diamond = Seq((1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L))
    val b = btw(diamond, Seq(1L), maxDepth = 3)
    assert(b == Map(2L -> 0.5, 3L -> 0.5, 4L -> 0.0))
  }

  test("betweenness chains dependencies through levels (diamond + tail)") {
    // diamond then 4->5: full Brandes from source 1 gives
    // delta(4)=1, delta(2)=delta(3)=(1/2)(1+1)=1, delta(5)=0
    val g = Seq((1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L), (4L, 5L))
    val b = btw(g, Seq(1L), maxDepth = 4)
    assert(b == Map(2L -> 1.0, 3L -> 1.0, 4L -> 1.0, 5L -> 0.0))
    // radius 3 truncates: node 5 is the frontier (excluded), and 4's
    // dependency is cut to the frontier's delta=0
    val t3 = btw(g, Seq(1L), maxDepth = 3)
    assert(t3 == Map(2L -> 1.0, 3L -> 1.0, 4L -> 1.0))
  }

  test("betweenness sums over sources; revisits stay off the DAG") {
    // path 1->2->3 from both ends of 3<-2<-1 reversed edges too:
    // sources 1 and 3 on the bidirected path 1-2-3
    val bidi = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L))
    val b = btw(bidi, Seq(1L, 3L), maxDepth = 3)
    // from 1: delta(2)=1 (path to 3); from 3: delta(2)=1 (path to 1);
    // endpoints are sources (excluded) or carry 0
    assert(b(2L) == 2.0)
    assert(b(1L) == 0.0 && b(3L) == 0.0)
  }

  test("hygiene: self-loops and duplicate edges don't change sigma") {
    val noisy = Seq((1L, 2L), (1L, 2L), (1L, 1L), (1L, 3L), (2L, 4L), (3L, 4L))
    val b = btw(noisy, Seq(1L), maxDepth = 3)
    assert(b == Map(2L -> 0.5, 3L -> 0.5, 4L -> 0.0))
  }

  test("partition invariance") {
    val edges = (1L to 120L).map(i => (i % 13, (i * 7) % 23))
      .filter(e => e._1 != e._2)
    val df = edges.toDF("src", "dst")
    val seeds = Seq(0L, 1L, 2L, 3L).toDF("node")
    val h1 = harmonic(edges, Seq(0L, 1L, 2L, 3L))
    val h2 = GraphOps.harmonicCentrality(df.repartition(7), seeds)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(h1 == h2)
    val b1 = btw(edges, Seq(0L, 1L, 2L))
    val b2 = GraphOps.betweennessFromSources(df.repartition(11),
        Seq(0L, 1L, 2L).toDF("node"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(b1 == b2)
  }
}
