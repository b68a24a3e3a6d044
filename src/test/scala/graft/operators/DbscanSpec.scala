package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** DBSCAN on the haversine eps-ball: hand-built equator geometries pin
  * the core/border/noise trichotomy, chain clustering, the isolated-core
  * cluster, and the deterministic min-label border rule.
  */
class DbscanSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestBase.spark
  import spark.implicits._

  // equator points: 1 deg lon ~ 111.195 km
  private val pts = Seq(
    (1L, 0.0, 0.0), (2L, 0.0, 1.0), (3L, 0.0, 2.0), (4L, 0.0, 3.0),
    (5L, 0.0, 50.0),                       // lone -> noise
    (6L, 0.0, 20.0), (7L, 0.0, 21.2), (8L, 0.0, 18.8)) // star: core 6

  private def run(ps: Seq[(Long, Double, Double)]) =
    Dbscan.geo(ps.toDF("id", "lat", "lon"), "id", "lat", "lon",
        epsKm = 150.0, minNeighbors = 2)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getString(1), if (r.isNullAt(2)) -1L else r.getLong(2))))
      .toMap

  test("chain, noise, and isolated-core star are labeled by hand") {
    val m = run(pts)
    // chain 1-2-3-4 (111 km spacing, eps 150): only adjacent pairs are
    // neighbors -> 2,3 are cores (2 neighbors), 1,4 borders, cluster min=2
    assert(m(2L) == (("core", 2L)) && m(3L) == (("core", 2L)))
    assert(m(1L) == (("border", 2L)) && m(4L) == (("border", 2L)))
    assert(m(5L) == (("noise", -1L)))
    // star: 6 sees 7 and 8 (133 km) but 7-8 are 267 km apart -> 6 is an
    // ISOLATED core (no core-core edge) and still founds cluster 6
    assert(m(6L) == (("core", 6L)))
    assert(m(7L) == (("border", 6L)) && m(8L) == (("border", 6L)))
  }

  test("raising minNeighbors demotes the chain cores to noise/border") {
    val m = Dbscan.geo(pts.toDF("id", "lat", "lon"), "id", "lat", "lon",
        epsKm = 150.0, minNeighbors = 3)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // nobody has 3 eps-neighbors -> no cores at all -> everything noise
    assert(m.values.forall(_ == "noise"))
  }

  test("two dense blobs bridged by a core chain merge into one cluster") {
    // blob A at lon 0/0.5/1, blob B at lon 2/2.5/3: every adjacent gap
    // <=1 deg (111 km) -> all 6 points are cores, transitively connected
    val blob = Seq((1L, 0.0, 0.0), (2L, 0.0, 0.5), (3L, 0.0, 1.0),
      (4L, 0.0, 2.0), (5L, 0.0, 2.5), (6L, 0.0, 3.0))
    val m = run(blob)
    assert(m.values.forall(_ == (("core", 1L))))
  }

  test("partition invariance") {
    val many = (1L to 200L).map(i =>
      (i, ((i * 7) % 120).toDouble - 60.0, ((i * 13) % 340).toDouble - 170.0))
    val df = many.toDF("id", "lat", "lon")
    val a = Dbscan.geo(df.repartition(1), "id", "lat", "lon", 800.0, 2,
      cellDeg = 5.0, kLat = 2, kLon = 5).collect().sortBy(_.getLong(0)).toSeq
    val b = Dbscan.geo(df.repartition(13), "id", "lat", "lon", 800.0, 2,
      cellDeg = 5.0, kLat = 2, kLon = 5).collect().sortBy(_.getLong(0)).toSeq
    assert(a == b)
  }
}
