package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Assortativity and modularity against textbook closed forms: stars and
  * paths are perfectly disassortative (r = −1), regular graphs null out,
  * two clean triangles score Q = 0.5, one-community partitions score 0.
  */
class GraphStatsSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestBase.spark
  import spark.implicits._

  private def edges(pairs: (Long, Long)*) = pairs.toDF("src", "dst")

  test("star graph is perfectly disassortative") {
    val star = edges((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L))
    val r = GraphOps.degreeAssortativity(star).collect().head
    assert(r.getAs[Long]("m2") == 8L)
    assert(r.getAs[Double]("mean_degree") == 2.5)
    assert(r.getAs[Double]("assortativity") == -1.0)
  }

  test("path P3 is perfectly disassortative; direction/dup edges collapse") {
    val p3 = edges((1L, 2L), (2L, 3L), (2L, 1L), (1L, 2L), (1L, 1L))
    val r = GraphOps.degreeAssortativity(p3).collect().head
    assert(r.getAs[Long]("m2") == 4L)
    assert(r.getAs[Double]("assortativity") == -1.0)
  }

  test("regular graph has zero degree variance: null assortativity") {
    val c4 = edges((0L, 1L), (1L, 2L), (2L, 3L), (3L, 0L))
    val r = GraphOps.degreeAssortativity(c4).collect().head
    assert(r.isNullAt(r.fieldIndex("assortativity")))
    assert(r.getAs[Double]("mean_degree") == 2.0)
  }

  test("two clean triangles with the true partition: Q = 0.5") {
    val tri2 = edges((0L, 1L), (1L, 2L), (2L, 0L), (10L, 11L), (11L, 12L),
      (12L, 10L))
    val labels = Seq((0L, 0L), (1L, 0L), (2L, 0L), (10L, 1L), (11L, 1L),
      (12L, 1L)).toDF("node", "label")
    val rows = GraphOps.modularity(tri2, labels).orderBy("community").collect()
    assert(rows.length == 2)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_nodes") == 3L)
      assert(r.getAs[Long]("internal_edges") == 3L)
      assert(r.getAs[Long]("degree_sum") == 6L)
      assert(r.getAs[Double]("q_term") == 0.25)
      assert(r.getAs[Double]("modularity") == 0.5)
    }
  }

  test("everything-in-one-community scores zero") {
    val tri2 = edges((0L, 1L), (1L, 2L), (2L, 0L), (10L, 11L), (11L, 12L),
      (12L, 10L))
    val labels = Seq(0L, 1L, 2L, 10L, 11L, 12L).toDF("node")
      .selectExpr("node", "CAST(9 AS BIGINT) AS label")
    val rows = GraphOps.modularity(tri2, labels).collect()
    assert(rows.length == 1)
    assert(rows.head.getAs[Double]("modularity") == 0.0)
  }

  test("a community with no internal edges contributes a negative term") {
    // bipartite split of P3 across communities: all edges cross
    val p3 = edges((1L, 2L), (2L, 3L))
    val labels = Seq((1L, 0L), (3L, 0L), (2L, 1L)).toDF("node", "label")
    val rows = GraphOps.modularity(p3, labels).orderBy("community").collect()
    assert(rows.forall(_.getAs[Long]("internal_edges") == 0L))
    assert(rows.forall(_.getAs[Double]("q_term") < 0))
    assert(rows.head.getAs[Double]("modularity") == -0.5)
  }

  test("LPA labels feed modularity end to end and beat the trivial split") {
    val tri2 = edges((0L, 1L), (1L, 2L), (2L, 0L), (10L, 11L), (11L, 12L),
      (12L, 10L))
    val lpa = GraphOps.labelPropagation(tri2, iterations = 3)
    val q = GraphOps.modularity(tri2, lpa).collect()
      .head.getAs[Double]("modularity")
    assert(q == 0.5) // LPA finds the two triangles exactly
  }

  test("partition invariance") {
    val es = (0 until 400).map(i => ((i % 37).toLong, (i % 53).toLong))
    val df1 = es.toDF("src", "dst").repartition(1)
    val df9 = es.toDF("src", "dst").repartition(9)
    assert(GraphOps.degreeAssortativity(df1).collect().toSeq ==
      GraphOps.degreeAssortativity(df9).collect().toSeq)
  }

  test("neighborhood function: sketch balls track the exact BFS balls") {
    // path 1→2→3→4 plus isolated-ish 5→4: exact ball sizes
    //   h=0: all 1 (n=5, total 5)
    //   h=1: 1:{1,2} 2:{2,3} 3:{3,4} 4:{4} 5:{5,4} -> total 9
    //   h=2: 1:{1,2,3} 2:{2,3,4} 3:{3,4} 4:{4} 5:{5,4} -> total 11
    val e = edges((1L, 2L), (2L, 3L), (3L, 4L), (5L, 4L))
    val nf = GraphOps.neighborhoodFunction(e, maxHops = 2)
      .collect().map(r => r.getAs[Int]("h") ->
        (r.getAs[Long]("n_nodes"), r.getAs[Double]("total_reach"),
          r.getAs[Double]("mean_reach"))).toMap
    assert(nf.keySet == Set(0, 1, 2))
    val exact = Map(0 -> 5.0, 1 -> 9.0, 2 -> 11.0)
    exact.foreach { case (h, tot) =>
      val (n, got, mean) = nf(h)
      assert(n == 5L)
      // at these cardinalities the small-range linear-counting branch is
      // active: estimates sit within ~1% of exact ball sizes
      assert(math.abs(got - tot) / tot < 0.01, s"h=$h est $got vs exact $tot")
      assert(math.abs(mean - tot / 5) < 0.01)
    }
    // monotone: balls only grow with h
    assert(nf(0)._2 <= nf(1)._2 && nf(1)._2 <= nf(2)._2)
  }

  test("neighborhood function is partition-invariant (decimal-summed estimates)") {
    val es = (0 until 300).map(i => ((i % 41).toLong, ((i * 7 + 3) % 41).toLong))
    def run(parts: Int) = GraphOps.neighborhoodFunction(
      es.toDF("src", "dst").repartition(parts), maxHops = 2)
      .collect().map(_.toString).sorted.toSeq
    assert(run(1) == run(8))
  }
}
