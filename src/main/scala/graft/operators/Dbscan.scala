package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import IterCheckpoint.Pinnable

/** DBSCAN (Ester et al. 1996) — density-based clustering with the
  * core / border / noise trichotomy that centroid methods (q4y k-means)
  * lack: clusters are arbitrary-shape density ridges, sparse points are
  * labeled noise instead of being force-assigned to the nearest mean.
  *
  * Decomposition into the engine's proven primitives:
  *   1. eps-neighbor pairs from [[Geo.radiusJoinCells]] — cell-bucketed
  *      candidates, NEVER all-pairs (the qa6 shape; the caller owns the
  *      band contract kLat·cellDeg ≥ eps-lat-span etc.);
  *   2. core points by neighbor count (one map-side-combinable count);
  *   3. clusters = connected components over core–core eps-edges via
  *      [[Dedup.connectedComponents]] (pointer-jumping, per-round
  *      localCheckpoint);
  *   4. border points attach to the MINIMUM cluster label among their
  *      core neighbors (deterministic — plain DBSCAN's border
  *      assignment is scan-order-dependent, which is not reproducible
  *      on a cluster; the min rule is our pinned convention).
  *
  * Convention: `minNeighbors` counts eps-neighbors EXCLUDING the point
  * itself (classic minPts counts the point: minPts = minNeighbors + 1).
  */
object Dbscan {

  /** DBSCAN over (id, lat, lon) points with the haversine eps-ball.
    * Output: one row per input point — (id, role ∈ core|border|noise,
    * cluster = component min-id, null for noise).
    */
  def geo(points: DataFrame, idCol: String, latCol: String, lonCol: String,
      epsKm: Double, minNeighbors: Int,
      cellDeg: Double = 5.0, kLat: Int = 1, kLon: Int = 3): DataFrame = {
    require(epsKm > 0, s"epsKm must be positive, got $epsKm")
    require(minNeighbors >= 1, s"minNeighbors must be >= 1, got $minNeighbors")
    val a = points.select(col(idCol).cast("long").as("a_id"),
      col(latCol).as("a_lat"), col(lonCol).as("a_lon"))
    val b = points.select(col(idCol).cast("long").as("b_id"),
      col(latCol).as("b_lat"), col(lonCol).as("b_lon"))
    val pairs = Geo.radiusJoinCells(a, "a_lat", "a_lon", b, "b_lat", "b_lon",
        epsKm, cellDeg, kLat, kLon)
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"))
      .iterCheckpoint()
    val deg = pairs.select(col("a_id").as("id"))
      .union(pairs.select(col("b_id").as("id")))
      .groupBy("id").agg(count(lit(1)).as("nn"))
    val core = deg.filter(col("nn") >= minNeighbors).select(col("id"))
      .iterCheckpoint()
    val coreEdges = pairs
      .join(core.select(col("id").as("a_id")), Seq("a_id"))
      .join(core.select(col("id").as("b_id")), Seq("b_id"))
      .select(col("a_id").as("doc_a"), col("b_id").as("doc_b"))
    val cc = Dedup.connectedComponents(coreEdges)
    // isolated cores (dense ball of non-core neighbors, no core peer)
    // are their own single-core cluster
    val coreLabeled = core
      .join(cc.withColumnRenamed("doc_id", "id"), Seq("id"), "left")
      .select(col("id"), coalesce(col("component_id"), col("id")).as("cluster"))
      .iterCheckpoint()
    val borderLabel = pairs.select(col("a_id").as("id"), col("b_id").as("nbr"))
      .union(pairs.select(col("b_id").as("id"), col("a_id").as("nbr")))
      .join(coreLabeled.select(col("id").as("nbr"), col("cluster")), Seq("nbr"))
      .groupBy("id").agg(min(col("cluster")).as("bcluster"))
    points.select(col(idCol).cast("long").as("id"))
      .join(coreLabeled.withColumnRenamed("cluster", "ccluster"), Seq("id"), "left")
      .join(borderLabel, Seq("id"), "left")
      .select(col("id"),
        when(col("ccluster").isNotNull, lit("core"))
          .when(col("bcluster").isNotNull, lit("border"))
          .otherwise(lit("noise")).as("role"),
        when(col("ccluster").isNotNull, col("ccluster"))
          .otherwise(col("bcluster")).as("cluster"))
  }
}
