package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Fixed-grid histogram quantiles: exact rank semantics on hand data,
  * clamping, null hygiene, the rank-error bound vs exact percentiles,
  * mergeability, validation.
  */
class HistogramSketchSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestBase.spark
  import spark.implicits._

  private val Bins = 10
  private val Lo = 0L
  private val Hi = 100L // width 10.0

  private def quants(values: Seq[(String, Long)], qs: Seq[Int])
      : Map[(String, Long), Double] = {
    val df = values.toDF("g", "v")
    val h = HistogramSketch.histogram(df, "g", col("v"), Bins, Lo, Hi)
    HistogramSketch.quantiles(h, qs, Bins, Lo, Hi)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(2)).toMap
  }

  test("hand case: median and p95 read off the right bins") {
    // 10 values 5,15,...,95 -> one per bin. ceil(10*0.5)=5 -> bin 4 (edge 40);
    // ceil(10*0.95)=10 -> bin 9 (edge 90)
    val vs = (0 until 10).map(i => ("a", i * 10L + 5L))
    val q = quants(vs, Seq(500, 950))
    assert(q(("a", 500L)) == 40.0)
    assert(q(("a", 950L)) == 90.0)
  }

  test("all values in one bin: every quantile is that bin's edge") {
    val q = quants(Seq.fill(7)(("a", 33L)), Seq(10, 500, 1000))
    assert(q.values.toSet == Set(30.0))
  }

  test("out-of-domain values clamp to the edge bins; nulls drop") {
    val df = Seq(("a", Some(-50L)), ("a", Some(500L)), ("a", None))
      .toDF("g", "v")
    val h = HistogramSketch.histogram(df, "g", col("v"), Bins, Lo, Hi)
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(h == Map(0L -> 1L, 9L -> 1L))
  }

  test("rank-error bound: estimate within one bin width of the exact quantile") {
    val rnd = new scala.util.Random(11)
    val vs = (1 to 500).map(_ => ("a", rnd.nextInt(100).toLong))
    val sorted = vs.map(_._2).sorted
    for (qpm <- Seq(100, 500, 900, 950)) {
      val exact = sorted(math.ceil(sorted.size * qpm / 1000.0).toInt - 1)
      val est = quants(vs, Seq(qpm))(("a", qpm.toLong))
      assert(math.abs(est - exact) <= (Hi - Lo).toDouble / Bins,
        s"p$qpm: est $est vs exact $exact")
    }
  }

  test("merge: sketch of the union == bin-wise sum of shard sketches") {
    val all = (1 to 200).map(i => ("g" + (i % 3), (i * 7 % 100).toLong))
    val (s1, s2) = all.splitAt(120)
    def hist(vs: Seq[(String, Long)]) =
      HistogramSketch.histogram(vs.toDF("g", "v"), "g", col("v"), Bins, Lo, Hi)
    val merged = HistogramSketch.merge(hist(s1), hist(s2))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val whole = hist(all)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(merged == whole)
  }

  test("per-group state is bounded by bins") {
    val vs = (1 to 1000).map(i => ("a", (i % 100).toLong))
    val h = HistogramSketch.histogram(vs.toDF("g", "v"), "g", col("v"), Bins, Lo, Hi)
    assert(h.count() <= Bins)
  }

  test("validation") {
    val df = Seq(("a", 1L)).toDF("g", "v")
    intercept[IllegalArgumentException](
      HistogramSketch.histogram(df, "g", col("v"), 0, Lo, Hi))
    intercept[IllegalArgumentException](
      HistogramSketch.histogram(df, "g", col("v"), Bins, 5L, 5L))
    val h = HistogramSketch.histogram(df, "g", col("v"), Bins, Lo, Hi)
    intercept[IllegalArgumentException](
      HistogramSketch.quantiles(h, Seq.empty, Bins, Lo, Hi))
    intercept[IllegalArgumentException](
      HistogramSketch.quantiles(h, Seq(0), Bins, Lo, Hi))
  }
}
