package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** k-truss peeling: hand graphs pin the support threshold, the
  * multi-round cascade, recomputed final supports, hygiene, fixpoint
  * equivalence, and partition invariance.
  */
class KTrussSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestBase.spark
  import spark.implicits._

  private def truss(edges: Seq[(Long, Long)], k: Int, maxRounds: Int = 3)
      : Map[(Long, Long), Long] =
    GraphOps.kTruss(edges.toDF("src", "dst"), k, maxRounds)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap

  private val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
    (3L, 4L))

  test("K4 is its own 4-truss, every edge in exactly 2 triangles") {
    val t = truss(k4, k = 4)
    assert(t.size == 6 && t.values.forall(_ == 2L))
  }

  test("pendant triangle peels off K4; shared edge's support recomputes") {
    // triangle (1,2,5) glued to K4 on edge (1,2): (1,2) has support 3
    // before the peel, 2 after (1,5)/(2,5) drop (support 1 < 2)
    val t = truss(k4 ++ Seq((1L, 5L), (2L, 5L)), k = 4)
    assert(t.keySet == k4.toSet)
    assert(t((1L, 2L)) == 2L)
  }

  test("two triangles sharing an edge cascade to empty at k=4") {
    // (1,2,3) and (1,2,4): round 1 peels the support-1 edges, round 2
    // peels the now-triangle-less (1,2) — a single filter would keep it
    val g = Seq((1L, 2L), (1L, 3L), (2L, 3L), (1L, 4L), (2L, 4L))
    assert(truss(g, k = 4).isEmpty)
    // ...and bounding to 1 round shows the intermediate state
    val partial = truss(g, k = 4, maxRounds = 1)
    assert(partial == Map((1L, 2L) -> 0L))
  }

  test("3-truss keeps any triangle, drops tree edges; hygiene") {
    val noisy = Seq((1L, 2L), (2L, 1L), (3L, 3L), (2L, 3L), (1L, 3L),
      (3L, 9L))
    val t = truss(noisy, k = 3)
    assert(t == Map((1L, 2L) -> 1L, (2L, 3L) -> 1L, (1L, 3L) -> 1L))
  }

  test("bounded peel reaches the fixpoint on a small graph") {
    val edges = (1L to 90L).map(i => (i % 11, (i * 7) % 13))
      .filter(e => e._1 != e._2)
    assert(truss(edges, k = 4, maxRounds = 4) ==
      truss(edges, k = 4, maxRounds = 10))
  }

  test("partition invariance") {
    val edges = (1L to 120L).map(i => (i % 13, (i * 5) % 17))
      .filter(e => e._1 != e._2)
    val df = edges.toDF("src", "dst")
    val a = GraphOps.kTruss(df.repartition(1), 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    val b = GraphOps.kTruss(df.repartition(13), 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    assert(a == b)
  }
}
