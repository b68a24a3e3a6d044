package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Geospatial primitives under the exact-oracle contract: standard
  * geohash encoding (Niemeyer's public scheme — base-32 over interleaved
  * lon/lat bits, longitude first), great-circle distance by the haversine
  * formula, and a radius join that replaces the O(n·m) cross product with
  * a grid-cell equality join.
  *
  * Float parity: sin/cos/asin/radians are bit-identical between the JVM
  * and DuckDB on this toolchain (probed raw-bit equal; atan2 is NOT — one
  * ulp off — which is why distance uses the asin haversine form, never
  * the atan2 Vincenty form). Everything else is IEEE arithmetic with
  * mirrored expression shape, so distances replay hash-exact.
  *
  * Scale: geohashing is a pure per-row codegen expression (no UDF, no
  * shuffle). The radius join shuffles on the cell key only; the
  * candidate-pair explosion is bounded by the (2·kLat+1)·(2·kLon+1)
  * neighbor window, and the full cross product never materializes. Cell
  * size and the latitude band are the caller's contract: with cells of
  * `cellDeg` degrees, kLat must cover radius/(111.32·cellDeg) and kLon
  * must cover radius/(111.32·cos(latMax)·cellDeg) — polar caps get their
  * own dedicated band/run at scale, exactly like skewed keys get salting.
  */
object Geo {

  /** Standard geohash base-32 alphabet (public scheme). */
  val Alphabet = "0123456789bcdefghjkmnpqrstuvwxyz"

  val EarthRadiusKm = 6371.0

  /** 5-character geohash (25 bits: 13 longitude + 12 latitude,
    * interleaved longitude-first from the MSB) as a pure codegen column
    * expression — shifts, masks and an array-literal lookup, no UDF.
    */
  def geohash5(lat: Column, lon: Column): Column = {
    val lonIdxRaw = floor((lon + lit(180.0)) / lit(360.0) * lit(8192.0))
    val latIdxRaw = floor((lat + lit(90.0)) / lit(180.0) * lit(4096.0))
    // exact +90/+180 boundary folds into the top cell
    val lonIdx = when(lonIdxRaw > 8191L, lit(8191L)).otherwise(lonIdxRaw)
    val latIdx = when(latIdxRaw > 4095L, lit(4095L)).otherwise(latIdxRaw)
    val lonBits = (0 to 12).map(i =>
      shiftright(lonIdx, 12 - i).bitwiseAND(lit(1L)) * lit(1L << (24 - 2 * i)))
    val latBits = (0 to 11).map(i =>
      shiftright(latIdx, 11 - i).bitwiseAND(lit(1L)) * lit(1L << (23 - 2 * i)))
    val v = (lonBits ++ latBits).reduce(_ + _)
    val alpha = array(Alphabet.map(ch => lit(ch.toString)): _*)
    concat((0 until 5).map(k =>
      element_at(alpha,
        (shiftright(v, 20 - 5 * k).bitwiseAND(lit(31L)) + lit(1L))
          .cast("int"))): _*)
  }

  /** DuckDB twin of the 25-bit interleave, over pre-computed integer
    * index columns (compute lonIdx/latIdx once in a CTE — inlining the
    * floor() into 25 terms would blow the plan up, the q29 lesson).
    */
  def interleave25Sql(lonIdx: String, latIdx: String): String = {
    val lonTerms = (0 to 12).map(i =>
      s"((($lonIdx >> ${12 - i}) & 1) * ${1L << (24 - 2 * i)})")
    val latTerms = (0 to 11).map(i =>
      s"((($latIdx >> ${11 - i}) & 1) * ${1L << (23 - 2 * i)})")
    (lonTerms ++ latTerms).mkString(" + ")
  }

  /** DuckDB twin of the base-32 rendering of a 25-bit geohash value. */
  def base32Sql(v: String): String =
    (0 until 5).map(k =>
      s"substr('$Alphabet', CAST((($v >> ${20 - 5 * k}) & 31) AS INT) + 1, 1)")
      .mkString(" || ")

  /** Great-circle distance in km, haversine form:
    * 12742 · asin(sqrt(sin²(Δφ/2) + cosφ₁·cosφ₂·sin²(Δλ/2))).
    * The Δλ term makes antimeridian wrap exact (sin(179.9°) ≡ sin(0.1°)).
    * Oracles must mirror this exact operation order.
    */
  def haversineKm(lat1: Column, lon1: Column, lat2: Column,
      lon2: Column): Column = {
    val sdlat = sin(radians(lat2 - lat1) / lit(2.0))
    val sdlon = sin(radians(lon2 - lon1) / lit(2.0))
    val h = sdlat * sdlat +
      cos(radians(lat1)) * cos(radians(lat2)) * sdlon * sdlon
    lit(2.0 * EarthRadiusKm) * asin(sqrt(h))
  }

  /** Radius join by grid cells: right-side rows are exploded to their
    * (2·kLat+1)·(2·kLon+1) neighbor cells, the join is a plain equality
    * join on the cell key (broadcast- and AQE-eligible), and the exact
    * haversine predicate filters candidates. Longitude cells wrap modulo
    * the ring (360 must divide evenly by cellDeg) so antimeridian pairs
    * are found; latitude never wraps.
    *
    * Returns left.* ++ right.* ++ dist_km (rounded to 6). The caller
    * guarantees the band contract (see object doc) and disjoint column
    * names between the two sides.
    */
  def radiusJoinCells(left: DataFrame, latL: String, lonL: String,
      right: DataFrame, latR: String, lonR: String,
      radiusKm: Double, cellDeg: Double, kLat: Int, kLon: Int): DataFrame = {
    require(cellDeg > 0 && radiusKm > 0, "radius and cell size must be positive")
    require(math.abs(360.0 / cellDeg - math.round(360.0 / cellDeg)) < 1e-9,
      s"cellDeg=$cellDeg must divide 360 so longitude cells form a ring")
    val overlap = left.columns.toSet intersect right.columns.toSet
    require(overlap.isEmpty, s"column collision between sides: $overlap")
    val scratch = Seq("__cr", "__cc", "__dlat", "__dlon")
    val clash = (left.columns ++ right.columns).toSet intersect scratch.toSet
    require(clash.isEmpty, s"reserved scratch columns in input: $clash")
    val ring = math.round(360.0 / cellDeg)
    // the neighbor window must fit the ring: with 2·kLon+1 > ring, pmod
    // maps distinct longitude offsets onto the SAME cell and every
    // candidate pair is emitted once per aliased offset — duplicate output
    // rows (and double-counted neighbor degrees downstream in Dbscan.geo)
    require(2L * kLon + 1 <= ring,
      s"longitude window 2*$kLon+1 exceeds the $ring-cell ring")
    // latitude never wraps, so over-wide kLat can't alias cells — but a
    // window wider than the pole-to-pole cell count is a sizing bug
    require(2L * kLat + 1 <= math.max(1L, math.round(180.0 / cellDeg)),
      s"latitude window 2*$kLat+1 exceeds the pole-to-pole cell count")
    val l = left
      .withColumn("__cr", floor(col(latL) / lit(cellDeg)))
      .withColumn("__cc", pmod(floor(col(lonL) / lit(cellDeg)), lit(ring)))
    val spark = right.sparkSession
    import spark.implicits._
    val offsets = for { i <- -kLat to kLat; j <- -kLon to kLon } yield (i, j)
    val r = right
      .crossJoin(broadcast(offsets.toDF("__dlat", "__dlon")))
      .withColumn("__cr", floor(col(latR) / lit(cellDeg)) + col("__dlat"))
      .withColumn("__cc",
        pmod(floor(col(lonR) / lit(cellDeg)) + col("__dlon"), lit(ring)))
      .drop("__dlat", "__dlon")
    l.join(r, Seq("__cr", "__cc"))
      .drop("__cr", "__cc")
      .withColumn("dist_km",
        round(haversineKm(col(latL), col(lonL), col(latR), col(lonR)), 6))
      .filter(col("dist_km") <= lit(radiusKm))
  }
}
