package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Geo primitives against public ground truths: the classic geohash
  * worked examples, known great-circle distances, antimeridian wrap, and
  * the load-bearing claim — the cell-bucketed radius join returns
  * exactly the naive all-pairs result.
  */
class GeoSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestBase.spark
  import spark.implicits._

  private def gh(lat: Double, lon: Double): String =
    Seq((lat, lon)).toDF("lat", "lon")
      .select(Geo.geohash5(col("lat"), col("lon")).as("gh"))
      .collect()(0).getString(0)

  test("geohash5 reproduces the published worked examples") {
    // Wikipedia's canonical example: ezs42 ≙ (42.605, −5.603)
    assert(gh(42.605, -5.603) == "ezs42")
    // geohash.org's original README example: (57.64911, 10.40744) → u4pru…
    assert(gh(57.64911, 10.40744) == "u4pru")
  }

  test("geohash5 covers the extremes and the zero point") {
    assert(gh(0.0, 0.0) == "s0000")
    assert(gh(-90.0, -180.0) == "00000")
    // exact +90/+180 folds into the top cell instead of overflowing
    assert(gh(90.0, 180.0) == "zzzzz")
    assert(gh(89.999, 179.999) == "zzzzz")
  }

  test("haversineKm matches known city distances within a kilometre") {
    val d = Seq((48.8566, 2.3522, 51.5074, -0.1278))
      .toDF("lat1", "lon1", "lat2", "lon2")
      .select(Geo.haversineKm(col("lat1"), col("lon1"), col("lat2"),
        col("lon2")).as("d")).collect()(0).getDouble(0)
    // Paris ↔ London great-circle ≈ 343.5 km on the R=6371 sphere
    assert(math.abs(d - 343.5) < 1.0, s"got $d")
    val zero = Seq((10.0, 20.0, 10.0, 20.0)).toDF("a", "b", "c", "e")
      .select(Geo.haversineKm(col("a"), col("b"), col("c"), col("e")).as("d"))
      .collect()(0).getDouble(0)
    assert(zero == 0.0)
  }

  test("radius join finds antimeridian pairs via the longitude ring") {
    val a = Seq((1L, 0.0, 179.9)).toDF("a_id", "a_lat", "a_lon")
    val b = Seq((2L, 0.0, -179.9)).toDF("b_id", "b_lat", "b_lon")
    val out = Geo.radiusJoinCells(a, "a_lat", "a_lon", b, "b_lat", "b_lon",
      radiusKm = 100.0, cellDeg = 5.0, kLat = 1, kLon = 1).collect()
    assert(out.length == 1)
    // 0.2° of longitude at the equator ≈ 22.26 km
    assert(math.abs(out(0).getAs[Double]("dist_km") - 22.26) < 0.1)
  }

  test("cell-bucketed radius join equals the naive cross filter") {
    val pts = graft.Tables(spark, "/root/testdata/sf0.001", "customer")
      .select(col("c_custkey"),
        ((conv(substring(md5(concat(col("c_custkey").cast("string"),
          lit("lat"))), 1, 12), 16, 10).cast("long") % 180000L)
          .cast("double") / 1000.0 - 90.0).as("lat"),
        ((conv(substring(md5(concat(col("c_custkey").cast("string"),
          lit("lon"))), 1, 12), 16, 10).cast("long") % 360000L)
          .cast("double") / 1000.0 - 180.0).as("lon"))
      .filter(abs(col("lat")) <= 70.0)
    val a = pts.select(col("c_custkey").as("a_id"), col("lat").as("a_lat"),
      col("lon").as("a_lon"))
    val b = pts.select(col("c_custkey").as("b_id"), col("lat").as("b_lat"),
      col("lon").as("b_lon"))
    val bucketed = Geo.radiusJoinCells(a, "a_lat", "a_lon", b, "b_lat",
        "b_lon", radiusKm = 800.0, cellDeg = 5.0, kLat = 2, kLon = 5)
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"), col("dist_km"))
    val naive = a.crossJoin(b).filter(col("a_id") < col("b_id"))
      .withColumn("dist_km", round(Geo.haversineKm(col("a_lat"),
        col("a_lon"), col("b_lat"), col("b_lon")), 6))
      .filter(col("dist_km") <= 800.0)
      .select(col("a_id"), col("b_id"), col("dist_km"))
    assert(bucketed.count() > 0)
    assert(bucketed.exceptAll(naive).isEmpty && naive.exceptAll(bucketed).isEmpty,
      "bucketed radius join must equal the naive all-pairs filter")
  }

  test("radiusJoinCells rejects ill-formed grids and column collisions") {
    val a = Seq((1L, 0.0, 0.0)).toDF("a_id", "a_lat", "a_lon")
    val b = Seq((2L, 0.0, 0.0)).toDF("b_id", "b_lat", "b_lon")
    intercept[IllegalArgumentException] {
      Geo.radiusJoinCells(a, "a_lat", "a_lon", b, "b_lat", "b_lon",
        radiusKm = 10.0, cellDeg = 7.0, kLat = 1, kLon = 1) // 360 % 7 ≠ 0
    }
    intercept[IllegalArgumentException] {
      Geo.radiusJoinCells(a, "a_lat", "a_lon",
        a.withColumnRenamed("a_id", "x_id"), "a_lat", "a_lon",
        radiusKm = 10.0, cellDeg = 5.0, kLat = 1, kLon = 1) // shared names
    }
    // neighbor window wider than the ring: pmod would alias distinct
    // longitude offsets onto the same cell → duplicate candidate pairs
    intercept[IllegalArgumentException] {
      Geo.radiusJoinCells(a, "a_lat", "a_lon", b, "b_lat", "b_lon",
        radiusKm = 10.0, cellDeg = 90.0, kLat = 0, kLon = 2) // 5 > ring of 4
    }
    intercept[IllegalArgumentException] {
      Geo.radiusJoinCells(a, "a_lat", "a_lon", b, "b_lat", "b_lon",
        radiusKm = 10.0, cellDeg = 90.0, kLat = 1, kLon = 1) // 3 > 2 lat cells
    }
  }

  test("widest legal longitude window emits each pair exactly once") {
    val a = Seq((1L, 0.0, 10.0)).toDF("a_id", "a_lat", "a_lon")
    val b = Seq((2L, 0.0, 11.0)).toDF("b_id", "b_lat", "b_lon")
    // ring = 4 cells of 90°, window 2*1+1 = 3 ≤ 4: legal, and the pair
    // must appear once, not once per offset
    val got = Geo.radiusJoinCells(a, "a_lat", "a_lon", b, "b_lat", "b_lon",
      radiusKm = 500.0, cellDeg = 90.0, kLat = 0, kLon = 1)
    assert(got.count() == 1L)
  }
}
