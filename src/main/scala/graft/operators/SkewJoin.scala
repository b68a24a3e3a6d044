package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Key-salting for skewed large×large equi-joins — the manual lever for the
  * case AQE's skew-join split cannot fix: ONE reducer key so hot (a null-ish
  * sentinel, a boilerplate hash, an empty-text md5) that any partition
  * containing it alone exceeds executor memory.
  *
  * The skewed side gets a deterministic salt in [0, nSalts); the other side
  * is replicated once per salt value; the join runs on (key, salt), so a hot
  * key's rows spread over nSalts reducer partitions. Result set is EXACTLY
  * the plain equi-join's (SkewJoinSpec proves equivalence including
  * duplicates and null keys); the price is an nSalts× replication of the
  * other side's matching rows in the shuffle — pick nSalts ≈ (hot-key rows /
  * healthy-partition rows), not a big constant.
  *
  * The salt derives from a hash of the skewed side's whole row (not RNG, not
  * a row id): deterministic across retries and partitionings — a salt is a
  * SHUFFLE KEY, and a nondeterministic shuffle key silently loses or
  * duplicates rows when a map task is recomputed after a fetch failure.
  * The limit of that choice: EXACT-duplicate rows hash identically and land
  * in ONE salt bucket, so a hot key whose rows are all byte-identical (the
  * empty-document case) does not spread. `collapseDuplicates = true` is the
  * deterministic answer for that shape: identical rows pre-aggregate into
  * (row, multiplicity) — partial aggregation combines them MAP-SIDE, so the
  * hot partition never ships its duplicates anywhere — the join runs on the
  * now-skewless distinct rows, and the result re-expands by multiplicity.
  * Result set is exactly the plain join's in both modes. Join types: inner /
  * left / left_semi / left_anti (the replicated side's unmatched rows are
  * meaningless, so right/full outer are rejected loudly).
  */
object SkewJoin {

  def saltedEquiJoin(
      skewed: DataFrame, other: DataFrame, key: String, nSalts: Int,
      joinType: String = "inner", collapseDuplicates: Boolean = false): DataFrame = {
    require(nSalts > 0, s"nSalts must be positive, got $nSalts")
    val allowed = Set("inner", "left", "left_outer", "leftouter", "left_semi",
      "leftsemi", "left_anti", "leftanti")
    require(allowed.contains(joinType.toLowerCase(java.util.Locale.ROOT)),
      s"salted join supports $allowed, got '$joinType' " +
        "(replicated-side outer rows would be duplicated)")
    val reserved = Seq("__salt", "__n", "__i")
    val clash = (skewed.columns ++ other.columns).filter(reserved.contains)
    require(clash.isEmpty,
      s"input columns collide with salted-join internals: ${clash.distinct.mkString(", ")}")
    val skewedCols = skewed.columns.toIndexedSeq
    // the salt hashes only HASHABLE columns — xxhash64 rejects MapType at
    // analysis (map equality is undefined); skipping maps keeps the salt
    // deterministic, it just can't draw spread from map-only differences
    def hashable(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
      case _: org.apache.spark.sql.types.MapType => false
      case s: org.apache.spark.sql.types.StructType => s.fields.forall(f => hashable(f.dataType))
      case a: org.apache.spark.sql.types.ArrayType => hashable(a.elementType)
      case _ => true
    }
    val saltCols = skewed.schema.fields.filter(f => hashable(f.dataType)).map(f => col(f.name))
    require(saltCols.nonEmpty,
      "every skewed-side column is map-typed — no deterministic salt source")
    // collapse groups by EVERY column — Spark rejects grouping on maps, and
    // silently excluding them would merge rows that differ only in the map
    require(!collapseDuplicates || saltCols.length == skewedCols.length,
      "collapseDuplicates cannot group map-typed columns: " +
        skewed.schema.fields.filterNot(f => hashable(f.dataType))
          .map(_.name).mkString(", "))
    def withSalt(df: DataFrame): DataFrame = df.withColumn("__salt",
      pmod(xxhash64(struct(saltCols.toIndexedSeq: _*)), lit(nSalts)).cast("int"))
    val replicated = other.withColumn("__salt",
      explode(sequence(lit(0), lit(nSalts - 1))))
    if (!collapseDuplicates)
      withSalt(skewed).join(replicated, Seq(key, "__salt"), joinType).drop("__salt")
    else {
      val collapsed = skewed.groupBy(skewedCols.map(col): _*)
        .agg(count(lit(1)).as("__n"))
      withSalt(collapsed).join(replicated, Seq(key, "__salt"), joinType)
        .drop("__salt")
        .withColumn("__i", explode(sequence(lit(1L), col("__n"))))
        .drop("__n", "__i")
    }
  }

  /** SELECTIVE salting: only the listed hot keys pay the salt/replication
    * tax; everything else joins plain. This is the production shape —
    * blanket salting replicates the ENTIRE other side nSalts×, but skew is
    * by definition a handful of keys, so the replicated slice should be
    * just those keys' rows. Branches are disjoint by key, so the union of
    * the two joins is exactly the plain join's result (null keys fall to
    * the cold branch, whose plain join already handles them).
    */
  def selectiveSalted(
      skewed: DataFrame, other: DataFrame, key: String, hotKeys: Seq[Any],
      nSalts: Int, joinType: String = "inner",
      collapseDuplicates: Boolean = false): DataFrame = {
    require(hotKeys.nonEmpty, "selectiveSalted needs at least one hot key " +
      "(use a plain join when nothing is hot)")
    require(!hotKeys.contains(null),
      "null is never a join-hot key (equi-joins drop null keys to the cold branch)")
    val isHot = col(key).isin(hotKeys: _*)
    val hot = saltedEquiJoin(
      skewed.filter(isHot), other.filter(isHot), key, nSalts, joinType,
      collapseDuplicates)
    val cold = skewed.filter(!isHot || col(key).isNull)
      .join(other, Seq(key), joinType)
    hot.unionByName(cold)
  }

  /** Skew handling end-to-end: detect hot keys with the count-min sketch
    * (one cheap pass + an exact confirmation confined to the CMS candidate
    * slice — [[CmSketch.heavyHitters]]'s contract), then
    * [[selectiveSalted]]. The driver-side hot-key list is bounded by
    * construction: at most total/threshold keys can exceed `threshold`.
    * Returns the joined frame and the detected hot keys (for logging /
    * plan capture). Long-castable keys only (the CMS contract); falls
    * back to a plain join when nothing is hot.
    */
  def autoSalted(
      skewed: DataFrame, other: DataFrame, key: String, threshold: Long,
      nSalts: Int, joinType: String = "inner",
      collapseDuplicates: Boolean = false): (DataFrame, Seq[Long]) = {
    val hot = CmSketch.heavyHitters(skewed, key, threshold)
      .collect().map(_.getLong(0)).toSeq.sorted
    if (hot.isEmpty) (skewed.join(other, Seq(key), joinType), hot)
    else (selectiveSalted(skewed, other, key, hot, nSalts, joinType,
      collapseDuplicates), hot)
  }
}
