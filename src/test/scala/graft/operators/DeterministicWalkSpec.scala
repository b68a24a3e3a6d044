package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Deterministic hash-draw walks: forced paths, dangling stops, edge
  * membership, and partition invariance (the property seeded-RNG walks
  * cannot give).
  */
class DeterministicWalkSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestBase.spark
  import spark.implicits._

  private def walks(edges: Seq[(Long, Long)], steps: Int)
      : Map[Long, Seq[Option[Long]]] =
    GraphOps.deterministicWalks(edges.toDF("src", "dst"), steps = steps)
      .collect()
      .map(r => r.getLong(0) ->
        (1 to steps).map(i => if (r.isNullAt(i)) None else Some(r.getLong(i))))
      .toMap

  test("a chain forces the only possible walk; dangling walkers stop") {
    val w = walks(Seq((1L, 2L), (2L, 3L), (3L, 4L)), steps = 3)
    assert(w(1L) == Seq(Some(2L), Some(3L), Some(4L)))
    assert(w(2L) == Seq(Some(3L), Some(4L), None)) // ran off the end
    assert(w(4L) == Seq(None, None, None))         // dangling from the start
  }

  test("every hop follows an edge of the graph") {
    val edges = (1L to 60L).map(i => (i % 10, (i * 7) % 13)).filter(e => e._1 != e._2)
    val eset = edges.toSet
    val w = walks(edges, steps = 3)
    w.foreach { case (walker, path) =>
      val hops = (Some(walker) +: path).sliding(2).toSeq
      hops.foreach {
        case Seq(Some(a), Some(b)) => assert(eset.contains((a, b)), s"$a->$b")
        case Seq(None, Some(b))    => fail(s"walk resumed after stopping at $b")
        case _                     => // stopped: rest must stay None
      }
    }
  }

  test("walks are partition-invariant") {
    val edges = (1L to 80L).map(i => (i % 11, (i * 5) % 17)).filter(e => e._1 != e._2)
    val df = edges.toDF("src", "dst")
    val a = GraphOps.deterministicWalks(df, steps = 3)
      .collect().map(r => r.toSeq).toSet
    val b = GraphOps.deterministicWalks(df.repartition(13), steps = 3)
      .collect().map(r => r.toSeq).toSet
    assert(a == b && a.nonEmpty)
  }

  test("validation: step counts outside [1,8] refuse") {
    intercept[IllegalArgumentException](
      GraphOps.deterministicWalks(Seq((1L, 2L)).toDF("src", "dst"), steps = 0))
    intercept[IllegalArgumentException](
      GraphOps.deterministicWalks(Seq((1L, 2L)).toDF("src", "dst"), steps = 9))
  }
}
