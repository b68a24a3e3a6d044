package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** HITS hubs/authorities: hand-computed half-steps, L1 invariants,
  * mutual-reinforcement shape, and input hygiene.
  */
class HitsSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestBase.spark
  import spark.implicits._

  private def scores(edges: Seq[(Long, Long)], iters: Int)
      : Map[Long, (Double, Double)] =
    GraphOps.hits(edges.toDF("src", "dst"), iterations = iters)
      .collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2))))
      .toMap

  test("one iteration matches the hand-computed half-steps") {
    // 1→3, 2→3, 3→4: hub₀ = 1 everywhere.
    //   auth raw: 3 ← 2, 4 ← 1, total 3 → auth = (0, 0, 2/3, 1/3)
    //   hub raw: 1 ← 2/3, 2 ← 2/3, 3 ← 1/3, total 5/3 → hub = (0.4, 0.4, 0.2, 0)
    val s = scores(Seq((1L, 3L), (2L, 3L), (3L, 4L)), iters = 1)
    assert(math.abs(s(1L)._1 - 0.4) < 1e-8 && math.abs(s(2L)._1 - 0.4) < 1e-8)
    assert(math.abs(s(3L)._1 - 0.2) < 1e-8 && s(4L)._1 == 0.0)
    assert(s(1L)._2 == 0.0 && s(2L)._2 == 0.0)
    assert(math.abs(s(3L)._2 - 2.0 / 3.0) < 1e-8)
    assert(math.abs(s(4L)._2 - 1.0 / 3.0) < 1e-8)
  }

  test("hub and auth each stay an L1 distribution across iterations") {
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L), (4L, 1L), (2L, 4L))
    for (k <- 1 to 4) {
      val s = scores(edges, iters = k)
      assert(math.abs(s.values.map(_._1).sum - 1.0) < 1e-6, s"hub mass, iter $k")
      assert(math.abs(s.values.map(_._2).sum - 1.0) < 1e-6, s"auth mass, iter $k")
      assert(s.values.forall { case (h, a) => h >= 0 && a >= 0 })
    }
  }

  test("the cited page is the authority; the citing pages are the hubs") {
    // 1..8 all cite 9; 9 cites nothing else (dangling authority)
    val edges = (1L to 8L).map(i => (i, 9L))
    val s = scores(edges, iters = 2)
    assert(s(9L)._2 == s.values.map(_._2).max) // max authority
    assert(s(9L)._1 == 0.0)                    // no out-links ⇒ zero hub
    assert((1L to 8L).forall(i => s(i)._1 > 0 && s(i)._2 == 0.0))
  }

  test("duplicate edges and self-loops do not change the result") {
    val clean = scores(Seq((1L, 2L), (2L, 3L), (3L, 1L)), iters = 2)
    val noisy = scores(
      Seq((1L, 2L), (1L, 2L), (2L, 3L), (3L, 1L), (1L, 1L), (3L, 3L)), iters = 2)
    assert(clean == noisy)
  }

  test("validation: empty graph and bad iteration counts refuse") {
    intercept[IllegalArgumentException](
      GraphOps.hits(Seq.empty[(Long, Long)].toDF("src", "dst")))
    intercept[IllegalArgumentException](
      GraphOps.hits(Seq((1L, 2L)).toDF("src", "dst"), iterations = 0))
  }
}
