package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Edit-distance similarity self-join — "all pairs of distinct strings within
  * Levenshtein distance ≤ d": catalog/entity reconciliation (product names
  * that differ by a typo), spelling-variant mining over a corpus vocabulary,
  * and the pair generator for [[graft.operators.Dedup.connectedComponents]]
  * entity-resolution clustering.
  *
  * Scale shape — the whole point of this operator:
  *
  *  1. '''Distinct-first.''' Real catalogs repeat each string thousands of
  *     times (the driver's `part` table has 20k rows over 64 names at
  *     sf0.1). Joining raw rows squares the duplication (5.5M raw pairs vs
  *     24 distinct pairs on that fixture); collapsing to distinct strings
  *     first and re-attaching multiplicity by equality join afterwards is
  *     the same collapse/re-expand discipline as
  *     [[graft.operators.SkewJoin]]`.collapseDuplicates`.
  *  2. '''Segment-signature equi-join, never all-pairs.''' PassJoin-style
  *     candidate generation (Li, Deng & Feng, "PASS-JOIN: a partition-based
  *     method for similarity joins", VLDB 2011 — public literature): split
  *     each indexed string into d+1 contiguous segments; by pigeonhole, any
  *     string within distance d contains at least one segment '''exactly''',
  *     shifted by at most d positions. Each string therefore emits d+1 index
  *     keys and a bounded set of probe substrings ((2d+1) candidate lengths
  *     × (d+1) slots × ≤(2d+1) positions, deduplicated), and candidates come
  *     from a pure EQUI-join on (length, slot, segment) — shuffle keyed by
  *     short segment signatures, AQE-managed, no CartesianProduct and no
  *     per-string nested loop at any size.
  *  3. '''Bounded verify.''' Candidates are deduplicated as (string, string)
  *     pairs before the exact check, and the check itself is Spark's codegen
  *     `levenshtein(a, b, threshold)` with early abandon — cost per pair is
  *     O(d·min(len)) not O(len²).
  *
  * Strings shorter than d+1 characters cannot be cut into d+1 non-empty
  * segments; they fall into a dedicated short band (all strings of length
  * ≤ d indexed under one key, probed by all strings of length ≤ 2d — a
  * bounded slice, since any partner of a ≤ d-length string is ≤ 2d long).
  *
  * Candidate generation operates on codepoints (surrogate-safe supersets);
  * the final verdict is Spark's `levenshtein`. Fixture/oracle parity is
  * ASCII-proven (DuckDB `levenshtein` agrees on ASCII; both engines count
  * single edits).
  */
object FuzzyJoin {

  /** Segment (start, len) per slot for a length-`l` string cut into `k`
    * contiguous pieces: the first k - (l % k) segments get floor(l/k)
    * codepoints, the rest get one more. Requires l >= k.
    */
  private[operators] def segmentation(l: Int, k: Int): Array[(Int, Int)] = {
    val base = l / k
    val rem = l % k
    val out = new Array[(Int, Int)](k)
    var start = 0
    var i = 0
    while (i < k) {
      val len = if (i < k - rem) base else base + 1
      out(i) = (start, len)
      start += len
      i += 1
    }
    out
  }

  /** Index keys for string s under threshold d: its own d+1 segments keyed
    * (length, slot, segment), or the short-band key for length ≤ d.
    */
  private[operators] def indexKeys(s: String, d: Int): Array[(Int, Int, String)] = {
    val cps = s.codePoints().toArray
    val l = cps.length
    val k = d + 1
    if (l < k) Array((-1, -1, ""))
    else segmentation(l, k).zipWithIndex.map { case ((start, len), i) =>
      (l, i, new String(cps, start, len))
    }
  }

  /** Probe keys for string t under threshold d: for every candidate partner
    * length l ∈ [|t|-d, |t|+d] with l ≥ d+1, every slot of the length-l
    * segmentation, the substrings of t with that slot's length starting
    * within ±d of the slot's start; plus the short-band key when |t| ≤ 2d.
    * Deduplicated before return (adjacent slots share substrings).
    */
  private[operators] def probeKeys(t: String, d: Int): Array[(Int, Int, String)] = {
    val cps = t.codePoints().toArray
    val m = cps.length
    val k = d + 1
    val out = scala.collection.mutable.LinkedHashSet.empty[(Int, Int, String)]
    if (m <= 2 * d) out += ((-1, -1, ""))
    var l = math.max(k, m - d)
    while (l <= m + d) {
      val segs = segmentation(l, k)
      var i = 0
      while (i < k) {
        val (pi, li) = segs(i)
        var p = math.max(0, pi - d)
        val hi = math.min(m - li, pi + d)
        while (p <= hi) {
          out += ((l, i, new String(cps, p, li)))
          p += 1
        }
        i += 1
      }
      l += 1
    }
    out.toArray
  }

  private val indexKeysUdf = udf((s: String, d: Int) => indexKeys(s, d))
  private val probeKeysUdf = udf((s: String, d: Int) => probeKeys(s, d))

  /** All unordered pairs of '''distinct''' non-null values of `strCol` with
    * Levenshtein distance in [1, maxDist]. Output: `str_a < str_b`
    * (lexicographic), `edit_distance` (int). Callers re-attach row-level
    * multiplicity or payloads by equality join on the string.
    *
    * maxDist is capped at 4: probe fan-out grows as (2d+1)²(d+1) and the
    * segment signatures shorten toward uselessness — past edit distance ~4
    * you want token-level similarity ([[graft.operators.Dedup]] n-gram
    * Jaccard / MinHash), not character-level.
    */
  def editDistancePairs(df: DataFrame, strCol: String, maxDist: Int): DataFrame = {
    require(maxDist >= 1 && maxDist <= 4,
      s"maxDist must be in [1, 4], got $maxDist (use token-level dedup beyond)")
    val strs = df.select(col(strCol).cast("string").as("__s"))
      .filter(col("__s").isNotNull)
      .distinct()
    val d = lit(maxDist)
    val idx = strs.select(col("__s").as("__a"),
        explode(indexKeysUdf(col("__s"), d)).as("__k"))
      .select(col("__a"), col("__k._1").as("__l"), col("__k._2").as("__i"),
        col("__k._3").as("__g"))
    val prb = strs.select(col("__s").as("__b"),
        explode(probeKeysUdf(col("__s"), d)).as("__k"))
      .select(col("__b"), col("__k._1").as("__l"), col("__k._2").as("__i"),
        col("__k._3").as("__g"))
    idx.join(prb, Seq("__l", "__i", "__g"))
      .filter(col("__a") =!= col("__b"))
      .select(least(col("__a"), col("__b")).as("str_a"),
        greatest(col("__a"), col("__b")).as("str_b"))
      .distinct()
      // threshold form early-abandons at d+1 and returns -1 above it
      .withColumn("edit_distance", levenshtein(col("str_a"), col("str_b"), maxDist))
      .filter(col("edit_distance") >= 1)
  }
}
