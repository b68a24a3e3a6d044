package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The graph operators compose into the per-node profile a crawl-quality
  * pipeline derives from one shared link graph: PageRank authority,
  * community membership, local density, and seed distance, joined on the
  * node key. Two planted communities (a dense clique and a sparse ring)
  * bridged by one edge make every signal discriminative.
  */
class GraphPipelineSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestBase.spark
  import spark.implicits._

  // clique 1-5 (dense, high clustering), ring 11-16 (sparse, zero
  // triangles), one bridge 5→11; directed edges both ways inside each
  // group so the undirected view matches the directed reachability
  private val clique = for { i <- 1L to 5L; j <- 1L to 5L if i != j } yield (i, j)
  private val ring = (0 until 6).flatMap { k =>
    val a = 11L + k; val b = 11L + ((k + 1) % 6); Seq((a, b), (b, a))
  }
  private val edges = (clique ++ ring :+ ((5L, 11L))).toDF("src", "dst")

  test("profile join: every node carries all four signals coherently") {
    val pr = GraphOps.pageRank(edges, iterations = 3)
    val comm = GraphOps.labelPropagation(edges, iterations = 3)
      .withColumnRenamed("label", "community")
    val cc = GraphOps.clusteringCoefficients(edges)
    val depth = GraphOps.seedDistances(edges, Seq(1L).toDF("node"), maxHops = 8)

    val profile = pr.join(comm, "node").join(cc, "node")
      .join(depth, Seq("node"), "left")
      .collect().map(r => r.getLong(0) -> r).toMap

    // one row per node, no signal dropped by the joins
    assert(profile.keySet == ((1L to 5L) ++ (11L to 16L)).toSet)

    // clustering separates the planted structures: clique interior 1.0
    // (nodes 1-4; node 5 carries the bridge), ring exactly 0
    assert((1L to 4L).forall(n => profile(n).getAs[Double]("clustering") == 1.0))
    assert((11L to 16L).forall(n => profile(n).getAs[Double]("clustering") == 0.0))

    // communities: the clique coalesces to one label distinct from the
    // ring side of the bridge
    val cliqueLabels = (1L to 5L).map(profile(_).getAs[Long]("community")).toSet
    assert(cliqueLabels.size == 1)
    assert(!(11L to 16L).map(profile(_).getAs[Long]("community")).contains(cliqueLabels.head))

    // BFS from node 1 reaches everything (bridge + ring is connected);
    // ring antipode is the farthest at 2 (bridge) + 3 (half the ring)
    assert((1L to 5L).forall(n => profile(n).getAs[Long]("dist") <= 1))
    assert(profile(14L).getAs[Long]("dist") == 5L)

    // PageRank mass is a distribution over the whole profile
    val mass = profile.values.map(_.getAs[Double]("pr")).sum
    assert(math.abs(mass - 1.0) < 1e-6)
  }
}
