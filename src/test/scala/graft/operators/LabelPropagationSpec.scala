package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Deterministic synchronous label propagation: clique convergence,
  * component separation, min-label tie-break, hygiene, invariance.
  */
class LabelPropagationSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestBase.spark
  import spark.implicits._

  private def labels(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] =
    GraphOps.labelPropagation(edges.toDF("src", "dst"), iterations = iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  private def clique(ids: Seq[Long]): Seq[(Long, Long)] =
    for { i <- ids; j <- ids if i < j } yield (i, j)

  test("a clique converges to its min label within two rounds") {
    // round 1: node 1 → 2 (min of its neighbors), everyone else → 1;
    // round 2: label 1 dominates every vote
    val l = labels(clique(Seq(1L, 2L, 3L, 4L)), iters = 2)
    assert(l == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L))
  }

  test("disjoint cliques keep disjoint communities") {
    val l = labels(clique(Seq(1L, 2L, 3L, 4L)) ++ clique(Seq(11L, 12L, 13L, 14L)),
      iters = 3)
    assert(Set(1L, 2L, 3L, 4L).map(l) == Set(1L))
    assert(Set(11L, 12L, 13L, 14L).map(l) == Set(11L))
  }

  test("one round matches the hand-computed min-label tie-break votes") {
    // path 1-2-3: node 2 sees {1, 3} once each → tie → min = 1;
    // the leaves each see only node 2 → 2
    assert(labels(Seq((1L, 2L), (2L, 3L)), iters = 1) ==
      Map(1L -> 2L, 2L -> 1L, 3L -> 2L))
  }

  test("direction, duplicates and self-loops do not change communities") {
    val clean = labels(Seq((1L, 2L), (2L, 3L), (3L, 1L)), iters = 2)
    val noisy = labels(
      Seq((2L, 1L), (1L, 2L), (2L, 3L), (3L, 1L), (1L, 1L), (2L, 2L)), iters = 2)
    assert(clean == noisy)
  }

  test("partition-invariant: repartitioned edges produce identical labels") {
    val edges = (1L to 80L).map(i => (i % 11, (i * 7) % 17)).filter(e => e._1 != e._2)
    val df = edges.toDF("src", "dst")
    val a = GraphOps.labelPropagation(df, iterations = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = GraphOps.labelPropagation(df.repartition(13), iterations = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a == b && a.nonEmpty)
  }

  test("validation: bad iteration counts refuse") {
    intercept[IllegalArgumentException](
      GraphOps.labelPropagation(Seq((1L, 2L)).toDF("src", "dst"), iterations = 0))
  }

  test("per-round plan picks winners with aggregates, not a per-node window") {
    // A supernode's distinct neighbor labels ≈ its degree in early rounds,
    // so a Window.partitionBy(node) would serialize a 10^7-degree hub's
    // votes into one partition. The winner must come from map-side-
    // combinable HashAggregates (min over struct(-n, label)) only.
    import org.apache.spark.sql.functions.col
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L)).toDF("src", "dst")
    val und = GraphOps.canonicalUndirected(edges)
    val adj = und.select(col("u").as("node"), col("v").as("nbr"))
      .union(und.select(col("v").as("node"), col("u").as("nbr")))
    val labels = adj.select(col("node")).distinct().withColumn("label", col("node"))
    val round = GraphOps.lpaRound(adj, labels)
    val plan = round.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"winner selection regressed to a window:\n$plan")
    assert(plan.contains("HashAggregate") || plan.contains("SortAggregate"))
    // and the de-windowed round still computes the same labels: hub node 3
    // sees {1, 2, 4} once each -> tie -> min label 1
    val out = round.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(3L) == 1L)
  }

  test("supernode star: hub adopts min leaf label, leaves adopt hub") {
    // star with hub 100 and 40 leaves — every leaf label is distinct, the
    // exact shape whose votes the old window serialized into one partition
    val edges = (1L to 40L).map(l => (100L, l))
    val l = labels(edges, iters = 1)
    assert(l(100L) == 1L)
    assert((1L to 40L).forall(leaf => l(leaf) == 100L))
  }
}
