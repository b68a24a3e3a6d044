package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Market-basket pair statistics: exact hand-computed values, distinct-first
  * semantics, the oversized-basket guard, minPairCount threshold, plan shape
  * (no unhinted cartesian), and partition invariance.
  */
class AssocRulesSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestBase.spark
  import spark.implicits._

  // 4 baskets: {m,b,e}, {m,b}, {m,e}, {b}
  private def fixture = Seq(
    (1L, "milk"), (1L, "bread"), (1L, "eggs"),
    (2L, "milk"), (2L, "bread"),
    (3L, "milk"), (3L, "eggs"),
    (4L, "bread")).toDF("basket", "item")

  private def statsMap(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => ((r.getString(0), r.getString(1)),
      (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
        r.getDouble(6), r.getDouble(7), r.getDouble(8), r.getDouble(9)))).toMap

  test("exact values on the textbook fixture") {
    val got = statsMap(AssocRules.pairStats(fixture, "basket", "item"))
    // supports: milk 3, bread 3, eggs 2; n_baskets 4
    // pairs: (bread,milk) 2, (bread,eggs) 1, (eggs,milk) 2
    assert(got.keySet == Set(("bread", "milk"), ("bread", "eggs"), ("eggs", "milk")))
    val (nab, na, nb, n, supp, cab, cba, lift) = got(("bread", "milk"))
    assert(nab == 2L && na == 3L && nb == 3L && n == 4L)
    assert(supp == 0.5)
    assert(cab == 2.0 / 3.0 && cba == 2.0 / 3.0)
    assert(lift == 2.0 * 4.0 / (3.0 * 3.0))
    val (nab2, na2, nb2, _, _, _, _, lift2) = got(("eggs", "milk"))
    assert(nab2 == 2L && na2 == 2L && nb2 == 3L)
    assert(lift2 == 2.0 * 4.0 / (2.0 * 3.0)) // eggs perfectly predict milk
  }

  test("distinct-first: repeated (basket, item) lines count once") {
    val dup = fixture.union(fixture).union(
      Seq((1L, "milk"), (1L, "milk")).toDF("basket", "item"))
    assert(statsMap(AssocRules.pairStats(dup, "basket", "item")) ==
      statsMap(AssocRules.pairStats(fixture, "basket", "item")))
  }

  test("minPairCount filters singleton pairs") {
    val got = statsMap(AssocRules.pairStats(fixture, "basket", "item",
      minPairCount = 2L))
    assert(got.keySet == Set(("bread", "milk"), ("eggs", "milk")))
  }

  test("oversized baskets are dropped whole, not truncated") {
    val big = (1 to 50).map(i => (9L, s"item_$i")).toDF("basket", "item")
    val got = statsMap(AssocRules.pairStats(fixture.union(big), "basket", "item",
      maxBasketSize = 10))
    // basket 9 contributes no pairs AND no item/basket support
    assert(got == statsMap(AssocRules.pairStats(fixture, "basket", "item")))
    // but with a big enough cap it does
    val loose = AssocRules.pairStats(fixture.union(big), "basket", "item",
      maxBasketSize = 50)
    assert(loose.filter(col("item_a") === "item_1").count() > 0)
    assert(loose.select(max(col("n_baskets"))).head().getLong(0) == 5L)
  }

  test("null baskets and items are ignored") {
    val withNulls = fixture.union(
      Seq((None: Option[Long], Option("milk")), (Some(7L), None: Option[String]))
        .toDF("basket", "item"))
    assert(statsMap(AssocRules.pairStats(withNulls, "basket", "item")) ==
      statsMap(AssocRules.pairStats(fixture, "basket", "item")))
  }

  test("scratch-column collision refused") {
    val bad = Seq((1L, "a", 2L)).toDF("basket", "item", "__nb")
    intercept[IllegalArgumentException](
      AssocRules.pairStats(bad, "basket", "item"))
  }

  test("plan: the only cartesian is the broadcast 1-row total") {
    val plan = AssocRules.pairStats(fixture, "basket", "item")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
  }

  test("partition invariance") {
    val a = statsMap(AssocRules.pairStats(fixture.repartition(1), "basket", "item"))
    val b = statsMap(AssocRules.pairStats(fixture.repartition(7), "basket", "item"))
    assert(a == b)
  }

  test("topNeighbors: cosine ranking and symmetry on the fixture") {
    // n_milk=3, n_bread=3, n_eggs=2; n(b,m)=2, n(b,e)=1, n(e,m)=2
    val got = AssocRules.topNeighbors(fixture, "basket", "item", k = 5)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3), r.getInt(4))).toMap
    // each unordered pair appears in BOTH items' lists
    assert(got.keySet == Set(
      ("bread", "milk"), ("milk", "bread"),
      ("bread", "eggs"), ("eggs", "bread"),
      ("eggs", "milk"), ("milk", "eggs")))
    val r6 = (x: Double) => java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    assert(got(("bread", "milk"))._2 == r6(2.0 / math.sqrt(9.0)))
    assert(got(("eggs", "milk"))._2 == r6(2.0 / math.sqrt(6.0)))
    assert(got(("bread", "eggs"))._2 == r6(1.0 / math.sqrt(6.0)))
    // milk's list: eggs (0.816) before bread (0.666)
    assert(got(("milk", "eggs"))._3 == 1 && got(("milk", "bread"))._3 == 2)
  }

  test("topNeighbors: k truncates per item, rank-like window plan") {
    val out = AssocRules.topNeighbors(fixture, "basket", "item", k = 1)
    val rows = out.collect()
    assert(rows.map(_.getString(0)).distinct.length == rows.length) // 1 per item
    assert(rows.forall(_.getInt(4) == 1))
    // row_number + constant limit => WindowGroupLimit in the physical plan
    assert(out.queryExecution.executedPlan.toString.contains("WindowGroupLimit"))
  }
}
