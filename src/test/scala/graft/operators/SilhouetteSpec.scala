package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Silhouette semantics on designed geometry: two tight, well-separated
  * clusters score near 1, a point assigned to the WRONG cluster scores
  * negative, singletons score 0.
  */
class SilhouetteSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestBase.spark
  import spark.implicits._

  private def score(rows: Seq[(Long, Array[Float], Int)]) =
    Silhouette.cosineSilhouette(rows.toDF("id", "vec", "cell"),
        "id", "vec", "cell")
      .collect().map(r => r.getAs[Int]("cell") ->
        (r.getAs[Long]("n"), r.getAs[Double]("mean_silhouette"))).toMap

  test("two tight orthogonal clusters silhouette near 1") {
    val a = Seq.tabulate(4)(i =>
      (i.toLong, Array(1f, 0.01f * i, 0f, 0f), 0))
    val b = Seq.tabulate(4)(i =>
      (10L + i, Array(0f, 0.01f * i, 1f, 0f), 1))
    val m = score(a ++ b)
    assert(m(0)._1 == 4L && m(1)._1 == 4L)
    assert(m(0)._2 > 0.9, s"got ${m(0)._2}")
    assert(m(1)._2 > 0.9)
  }

  test("a single-cluster panel scores 0 with the full denominator, not null debris") {
    // b_mean is null everywhere (no other cluster); greatest() skips the
    // null, so without the explicit isNull branch s would go null and the
    // mean would sum over fewer rows than it counts
    val m = score(Seq.tabulate(4)(i =>
      (i.toLong, Array(1f, 0.01f * i, 0f, 0f), 7)))
    assert(m(7) == ((4L, 0.0)))
  }

  test("a point assigned to the wrong cluster drags its mean negative") {
    val a = Seq.tabulate(3)(i => (i.toLong, Array(1f, 0.01f * i, 0f, 0f), 0))
    val b = Seq.tabulate(3)(i => (10L + i, Array(0f, 0.01f * i, 1f, 0f), 1))
    // id 99 sits geometrically in cluster 0 but is labeled 1
    val m = score(a ++ b :+ ((99L, Array(1f, 0.02f, 0f, 0f), 1)))
    val clusterOne = m(1)._2
    assert(clusterOne < m(0)._2)
    val perPoint = Silhouette.cosineSilhouette(
      (a ++ b :+ ((99L, Array(1f, 0.02f, 0f, 0f), 1)))
        .toDF("id", "vec", "cell"), "id", "vec", "cell")
    assert(perPoint.collect().nonEmpty)
  }

  test("singleton clusters score exactly 0 by convention") {
    val rows = Seq(
      (1L, Array(1f, 0f, 0f, 0f), 0),
      (2L, Array(0.9f, 0.1f, 0f, 0f), 0),
      (3L, Array(0f, 0f, 1f, 0f), 7))
    val m = score(rows)
    assert(m(7) == ((1L, 0.0)))
  }
}
