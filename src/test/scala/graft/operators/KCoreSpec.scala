package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** k-core peeling: degree recomputation inside the survivors, multi-round
  * cascades, empty cores, hygiene, partition invariance.
  */
class KCoreSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestBase.spark
  import spark.implicits._

  private def core(edges: Seq[(Long, Long)], k: Int, maxRounds: Int = 10)
      : Map[Long, Long] =
    GraphOps.kCore(edges.toDF("src", "dst"), k, maxRounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("triangle survives 2-core, pendant peels and hub degree drops") {
    // triangle 1-2-3 plus pendant 4 on node 3: node 4 peels (degree 1),
    // node 3's degree then recomputes from 3 to 2 INSIDE the survivors
    val l = core(Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L)), k = 2)
    assert(l == Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
  }

  test("peeling cascades: a path empties under k=2, one end at a time") {
    // 1-2-3-4-5: ends are degree-1 every round -> whole path peels away,
    // needing multiple rounds (not a single degree filter)
    assert(core(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)), k = 2).isEmpty)
    // ...but a single degree filter would have kept 2,3,4 — prove the
    // cascade by capping rounds at 1 and seeing the partial peel
    val partial = core(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)),
      k = 2, maxRounds = 1)
    assert(partial.keySet == Set(3L))
  }

  test("clique is its own max core; direction/dup/self-loop hygiene") {
    val clique = for { i <- 1L to 5L; j <- 1L to 5L if i < j } yield (i, j)
    val noisy = clique ++ Seq((2L, 1L), (3L, 3L), (1L, 2L))
    val l = core(noisy, k = 4)
    assert(l == (1L to 5L).map(_ -> 4L).toMap)
    assert(core(clique, k = 5).isEmpty)
  }

  test("converged early-stop equals a larger round budget (fixed point)") {
    val edges = (1L to 60L).map(i => (i % 13, (i * 5) % 17)).filter(e => e._1 != e._2)
    assert(core(edges, k = 3, maxRounds = 4) == core(edges, k = 3, maxRounds = 10))
  }

  test("partition invariance") {
    val edges = (1L to 80L).map(i => (i % 11, (i * 7) % 19)).filter(e => e._1 != e._2)
    val df = edges.toDF("src", "dst")
    val a = GraphOps.kCore(df, 2).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = GraphOps.kCore(df.repartition(13), 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a == b && a.nonEmpty)
  }

  test("validation") {
    intercept[IllegalArgumentException](
      GraphOps.kCore(Seq((1L, 2L)).toDF("src", "dst"), k = 0))
    intercept[IllegalArgumentException](
      GraphOps.kCore(Seq((1L, 2L)).toDF("src", "dst"), k = 2, maxRounds = 0))
  }
}
