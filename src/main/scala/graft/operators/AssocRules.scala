package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Market-basket co-occurrence analytics — frequent item pairs with
  * support / confidence / lift (Agrawal & Srikant's association-rule
  * measures, from the public literature): "parts bought together",
  * tag co-occurrence, co-cited documents.
  *
  * Scale shape:
  *
  *  1. '''Distinct-first.''' (basket, item) rows collapse before anything
  *     else — a basket listing the same item on five lines contributes one
  *     membership, and the self-join never squares row-level duplication
  *     (the SkewJoin/FuzzyJoin collapse discipline).
  *  2. '''Per-basket pair fan-out is the quadratic hazard''', not the join
  *     itself: a basket of k items emits k(k-1)/2 pairs. Baskets larger
  *     than `maxBasketSize` are dropped whole via a left-anti join against
  *     the (tiny, broadcast) oversized-basket list — a documented,
  *     deliberate truncation, loud in the operator contract rather than a
  *     silent OOM at 100 TB. Real transaction data has bounded baskets;
  *     a "basket" with 10^6 items is a crawler artifact, not a signal.
  *  3. '''The self-join is basket-keyed and exchange-reused''': both sides
  *     are the same DataFrame shuffled once on `__basket` (Spark plans a
  *     ReusedExchange for the second side), pairs ordered `item_a < item_b`
  *     inside the join condition so each unordered pair materializes once.
  *  4. '''All counts are map-side-combinable aggregates'''; the basket
  *     total joins back as a broadcast 1-row aggregate (never a driver
  *     collect), and item supports re-attach by two item-keyed equality
  *     joins.
  *
  * Measures (raw doubles; callers round for cross-engine replay):
  * support = n_ab / n_baskets, confidence(a→b) = n_ab / n_a,
  * lift = n_ab·n_baskets / (n_a·n_b).
  */
object AssocRules {

  private def requireNoScratchClash(df: DataFrame, reserved: String*): Unit = {
    val clash = df.columns.filter(reserved.contains)
    require(clash.isEmpty,
      s"input columns collide with AssocRules internals: ${clash.mkString(", ")}")
  }

  /** Frequent item-pair statistics over (basketCol, itemCol) rows.
    *
    * Output: `item_a`, `item_b` (item_a < item_b), `n_ab`, `n_a`, `n_b`,
    * `n_baskets`, `support`, `conf_a_b`, `conf_b_a`, `lift` — one row per
    * unordered pair co-occurring in at least `minPairCount` baskets.
    */
  def pairStats(
      df: DataFrame, basketCol: String, itemCol: String,
      minPairCount: Long = 1L, maxBasketSize: Int = 10000): DataFrame = {
    require(minPairCount >= 1L, s"minPairCount must be >= 1, got $minPairCount")
    require(maxBasketSize >= 2, s"maxBasketSize must be >= 2, got $maxBasketSize")
    requireNoScratchClash(df, "__basket", "__basket_b", "__item", "__n_i", "__nb")

    val bi = df
      .select(col(basketCol).as("__basket"), col(itemCol).as("__item"))
      .filter(col("__basket").isNotNull && col("__item").isNotNull)
      .distinct()

    val oversized = bi.groupBy(col("__basket"))
      .agg(count(lit(1)).as("__n_i"))
      .filter(col("__n_i") > maxBasketSize)
      .select(col("__basket"))
    val kept = bi.join(broadcast(oversized), Seq("__basket"), "left_anti")

    val nBaskets = kept.agg(countDistinct(col("__basket")).as("__nb"))

    val itemCounts = kept.groupBy(col("__item"))
      .agg(count(lit(1)).as("__n_i"))

    // explicit rename on one side: self-join attribute ids stay unambiguous
    val a = kept.select(col("__basket"), col("__item").as("item_a"))
    val b = kept.select(col("__basket").as("__basket_b"), col("__item").as("item_b"))
    val pairs = a.join(b,
        col("__basket") === col("__basket_b") && col("item_a") < col("item_b"))
      .groupBy(col("item_a"), col("item_b"))
      .agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minPairCount)

    pairs
      .join(itemCounts.select(col("__item").as("item_a"), col("__n_i").as("n_a")),
        Seq("item_a"))
      .join(itemCounts.select(col("__item").as("item_b"), col("__n_i").as("n_b")),
        Seq("item_b"))
      .crossJoin(broadcast(nBaskets))
      .select(
        col("item_a"), col("item_b"), col("n_ab"), col("n_a"), col("n_b"),
        col("__nb").as("n_baskets"),
        (col("n_ab").cast("double") / col("__nb").cast("double")).as("support"),
        (col("n_ab").cast("double") / col("n_a").cast("double")).as("conf_a_b"),
        (col("n_ab").cast("double") / col("n_b").cast("double")).as("conf_b_a"),
        (col("n_ab").cast("double") * col("__nb").cast("double") /
          (col("n_a").cast("double") * col("n_b").cast("double"))).as("lift"))
  }

  /** Item-item top-k neighbor lists — the classic co-occurrence
    * collaborative-filtering recommender (Sarwar et al. 2001, public
    * literature): neighbors ranked by cosine over basket memberships,
    * cos(a,b) = n_ab / √(n_a·n_b), computed from [[pairStats]]'s counts
    * (sqrt/division parity is proven engine-wide, 6-rounded).
    *
    * Output, k rows per item: `item`, `neighbor`, `n_ab`, `cosine`,
    * `rank` — ties broken (cosine desc, n_ab desc, neighbor asc), fully
    * deterministic.
    *
    * Scale shape: the pair table symmetrizes (each unordered pair feeds
    * both items' lists) and ONE row_number window keyed on `item` picks
    * the top k — a rank-like function with a constant limit, so Spark
    * plants WindowGroupLimit and per-task state is a k-element heap, not
    * the item's full neighbor list (the deterministicWalks discipline).
    */
  def topNeighbors(
      df: DataFrame, basketCol: String, itemCol: String, k: Int,
      minPairCount: Long = 1L, maxBasketSize: Int = 10000): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val pairs = pairStats(df, basketCol, itemCol, minPairCount, maxBasketSize)
    val sym = pairs.select(col("item_a").as("item"),
        col("item_b").as("neighbor"), col("n_ab"),
        col("n_a").as("__ni"), col("n_b").as("__nn"))
      .union(pairs.select(col("item_b").as("item"),
        col("item_a").as("neighbor"), col("n_ab"),
        col("n_b").as("__ni"), col("n_a").as("__nn")))
      .withColumn("cosine", round(col("n_ab").cast("double") /
        sqrt(col("__ni").cast("double") * col("__nn").cast("double")), 6))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("item"))
      .orderBy(col("cosine").desc, col("n_ab").desc, col("neighbor"))
    sym.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("item"), col("neighbor"), col("n_ab"), col("cosine"),
        col("rank"))
  }
}
