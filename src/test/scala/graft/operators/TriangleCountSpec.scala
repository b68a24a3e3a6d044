package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Degree-ordered triangle counting: hand-computed counts on known shapes,
  * input hygiene (direction, duplicates, self-loops), triangle-free
  * graphs, and partition invariance.
  */
class TriangleCountSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestBase.spark
  import spark.implicits._

  private def counts(edges: Seq[(Long, Long)]): Map[Long, Long] =
    GraphOps.triangleCounts(edges.toDF("src", "dst"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("K4: four triangles, every vertex on three of them") {
    val k4 = for {
      i <- 1L to 4L; j <- 1L to 4L if i < j
    } yield (i, j)
    assert(counts(k4) == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("triangle with a pendant vertex: the pendant is absent") {
    val c = counts(Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L)))
    assert(c == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("two triangles sharing an edge") {
    // {1,2,3} and {2,3,4}: the shared edge's endpoints sit on both
    val c = counts(Seq((1L, 2L), (2L, 3L), (3L, 1L), (2L, 4L), (3L, 4L)))
    assert(c == Map(1L -> 1L, 2L -> 2L, 3L -> 2L, 4L -> 1L))
  }

  test("triangle-free graphs return no rows") {
    assert(counts(Seq((1L, 2L), (1L, 3L), (1L, 4L))).isEmpty) // star
    assert(counts(Seq((1L, 2L), (2L, 3L), (3L, 4L))).isEmpty) // path
    // C4: a cycle of length 4 has no triangle
    assert(counts(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L))).isEmpty)
  }

  test("direction, duplicate edges and self-loops do not change counts") {
    val clean = counts(Seq((1L, 2L), (2L, 3L), (3L, 1L)))
    val noisy = counts(Seq(
      (2L, 1L), (1L, 2L), // reversed + duplicate of the same undirected edge
      (2L, 3L), (3L, 2L),
      (3L, 1L), (1L, 1L), (2L, 2L))) // self-loops dropped
    assert(clean == noisy)
    assert(clean == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("partition-invariant: repartitioned edges produce identical counts") {
    val edges = (1L to 60L).map(i => (i % 9, (i * 5) % 13)).filter(e => e._1 != e._2)
    val df = edges.toDF("src", "dst")
    val a = GraphOps.triangleCounts(df)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = GraphOps.triangleCounts(df.repartition(17))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a == b && a.nonEmpty)
  }

  private def ccs(edges: Seq[(Long, Long)]): Map[Long, (Long, Long, Double)] =
    GraphOps.clusteringCoefficients(edges.toDF("src", "dst"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap

  test("clustering: K4 is fully clustered, every node cc = 1") {
    val k4 = for { i <- 1L to 4L; j <- 1L to 4L if i < j } yield (i, j)
    val c = ccs(k4)
    assert(c.keySet == Set(1L, 2L, 3L, 4L))
    assert(c.values.forall { case (d, t, cc) => d == 3L && t == 3L && cc == 1.0 })
  }

  test("clustering: triangle + pendant covers all the regimes") {
    val c = ccs(Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L)))
    assert(c(1L) == ((2L, 1L, 1.0)))
    assert(c(2L) == ((2L, 1L, 1.0)))
    assert(c(3L)._1 == 3L && c(3L)._2 == 1L)
    assert(math.abs(c(3L)._3 - 1.0 / 3.0) < 1e-12) // 2·1/(3·2)
    assert(c(4L) == ((1L, 0L, 0.0))) // degree < 2 ⇒ 0 by convention
  }

  test("clustering: triangle-free nodes are emitted with cc = 0") {
    val c = ccs(Seq((1L, 2L), (1L, 3L), (1L, 4L))) // star
    assert(c.keySet == Set(1L, 2L, 3L, 4L))
    assert(c(1L) == ((3L, 0L, 0.0))) // open wedges only
    assert(c(2L) == ((1L, 0L, 0.0)))
  }

  test("hub-heavy graph: counts match the naive all-triples reference") {
    // one high-degree hub plus random chords — the degree-ordering path
    // (hub ranked last) must agree with a brute-force triple check
    val edges = ((2L to 20L).map(i => (1L, i)) ++
      (2L to 20L).map(i => (i, (i % 19) + 2L))).filter(e => e._1 != e._2)
    val und = edges.map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).toSet
    val nodesAll = und.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
    val naive = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    for {
      a <- nodesAll; b <- nodesAll if a < b; c <- nodesAll if b < c
      if und((a, b)) && und((b, c)) && und((a, c))
    } { naive(a) += 1; naive(b) += 1; naive(c) += 1 }
    assert(counts(edges) == naive.toMap)
  }
}
