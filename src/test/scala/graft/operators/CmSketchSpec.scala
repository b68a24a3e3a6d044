package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Count-min sketch: never-underestimate guarantee, exactness without
  * collisions, partition-invariant merge, null handling, validation.
  */
class CmSketchSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestBase.spark
  import spark.implicits._

  private val keys: Seq[Long] =
    (1L to 40L).flatMap(k => Seq.fill((k % 7 + 1).toInt)(k))
  private lazy val df = keys.toDF("k")
  private lazy val exact: Map[Long, Long] =
    keys.groupBy(identity).map { case (k, v) => k -> v.size.toLong }

  private def ests(width: Int, probes: Seq[Long]): Map[Long, Long] = {
    val sk = CmSketch.sketch(df, "k", depth = 4, width = width)
    CmSketch.estimates(sk, probes, depth = 4, width = width)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("estimates never undercount, and are exact when nothing collides") {
    val tight = ests(width = 16, probes = 1L to 40L)   // forced collisions
    assert((1L to 40L).forall(k => tight(k) >= exact(k)))
    val roomy = ests(width = 4096, probes = 1L to 40L) // 40 keys, 4096 cells
    assert((1L to 40L).forall(k => roomy(k) == exact(k)))
  }

  test("an unseen probe reads zero when its cells are clean") {
    val e = ests(width = 4096, probes = Seq(999L))
    assert(e(999L) == 0L)
  }

  test("the sketch is partition-invariant") {
    val a = CmSketch.sketch(df, "k", depth = 4, width = 64)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).toSet
    val b = CmSketch.sketch(df.repartition(13), "k", depth = 4, width = 64)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).toSet
    assert(a == b && a.nonEmpty)
  }

  test("each depth row of the sketch accounts for every observation") {
    val sk = CmSketch.sketch(df, "k", depth = 4, width = 32)
      .collect().map(r => (r.getInt(0), r.getLong(2)))
    val perDepth = sk.groupBy(_._1).map { case (d, rows) => d -> rows.map(_._2).sum }
    assert(perDepth == Map(0 -> keys.size.toLong, 1 -> keys.size.toLong,
      2 -> keys.size.toLong, 3 -> keys.size.toLong))
  }

  test("null keys are skipped, not counted") {
    val withNulls = (keys.map(Option(_)) ++ Seq(None, None)).toDF("k")
    val a = CmSketch.sketch(withNulls, "k", depth = 2, width = 64)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).toSet
    val b = CmSketch.sketch(df, "k", depth = 2, width = 64)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).toSet
    assert(a == b)
  }

  test("heavy hitters equal brute force even under heavy collisions") {
    // width 8 forces the candidate set to inflate with false positives;
    // the exact-count pass must prune them all
    for (t <- Seq(1L, 3L, 6L, 8L)) {
      val hh = CmSketch.heavyHitters(df, "k", threshold = t, depth = 4, width = 8)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val brute = exact.filter(_._2 >= t).toSet
      assert(hh == brute, s"threshold $t")
    }
  }

  test("validation: bad depth, width, and empty probes refuse") {
    intercept[IllegalArgumentException](CmSketch.sketch(df, "k", depth = 0))
    intercept[IllegalArgumentException](CmSketch.sketch(df, "k", width = 1000))
    intercept[IllegalArgumentException](
      CmSketch.estimates(CmSketch.sketch(df, "k"), Seq.empty))
  }

  test("innerProductEstimate upper-bounds the exact join size, tight when roomy") {
    import spark.implicits._
    val a = (1 to 2000).map(i => (i % 50).toLong).toDF("k")
    val b = (1 to 900).map(i => (i % 30).toLong).toDF("k")
    val exact = a.groupBy("k").count().withColumnRenamed("count", "ca")
      .join(b.groupBy("k").count().withColumnRenamed("count", "cb"), Seq("k"))
      .agg(org.apache.spark.sql.functions.sum(
        org.apache.spark.sql.functions.col("ca") *
          org.apache.spark.sql.functions.col("cb")))
      .collect().head.getLong(0)
    val est = CmSketch.innerProductEstimate(
      CmSketch.sketch(a, "k", 4, 4096), CmSketch.sketch(b, "k", 4, 4096))
      .collect().head.getLong(0)
    assert(est >= exact, s"AMS estimate $est below exact $exact")
    // 80 distinct keys in 4096 buckets: collisions are rare, the bound tight
    assert(est <= (exact * 1.2).toLong, s"estimate $est too loose vs $exact")
  }
}
