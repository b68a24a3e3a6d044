package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Deterministic training-mix sampling + token-budget sharding. */
class DataMixSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("deterministic sample: reproducible, salt-sensitive, rate-accurate") {
    import spark.implicits._
    val df = (0L until 2000L).toDF("id")
    val s1 = DataMix.deterministicSample(df, "id", 0.3, "saltA")
      .select("id").as[Long].collect().toSet
    val s2 = DataMix.deterministicSample(df, "id", 0.3, "saltA")
      .select("id").as[Long].collect().toSet
    assert(s1 == s2) // same key+salt → same members, any run, any partitioning
    val sB = DataMix.deterministicSample(df, "id", 0.3, "saltB")
      .select("id").as[Long].collect().toSet
    assert(s1 != sB) // new salt redraws
    assert(math.abs(s1.size / 2000.0 - 0.3) < 0.05) // expected fraction
    // nested property: a higher-rate sample with the same salt is a superset
    val s50 = DataMix.deterministicSample(df, "id", 0.5, "saltA")
      .select("id").as[Long].collect().toSet
    assert(s1.subsetOf(s50))
    assert(DataMix.deterministicSample(df, "id", 0.0, "x").count() == 0)
    assert(DataMix.deterministicSample(df, "id", 1.0, "x").count() == 2000)
  }

  test("mixBySource: explicit whitelist, per-source rates") {
    import spark.implicits._
    val df = (0L until 900L).map(i => (i, Seq("web", "books", "code")(i.toInt % 3)))
      .toDF("id", "src")
    val mixed = DataMix.mixBySource(df, "src", "id",
      rates = Map("web" -> 0.2, "books" -> 1.0), salt = "m")
    val bySrc = mixed.groupBy("src").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!bySrc.contains("code")) // unlisted source dropped
    assert(bySrc("books") == 300L) // rate 1.0 keeps all
    assert(bySrc("web") < 120 && bySrc("web") > 20) // ~60 expected of 300
  }

  test("capPerGroup: bound per group, small groups intact, deterministic") {
    import spark.implicits._
    // group g0: 50 rows, g1: 5 rows, g2: 1 row
    val df = ((0L until 50L).map(i => (i, "g0")) ++
      (50L until 55L).map(i => (i, "g1")) ++ Seq((55L, "g2")))
      .toDF("id", "grp")
    val capped = DataMix.capPerGroup(df, "grp", "id", n = 10, salt = "s1")
    val byGrp = capped.groupBy("grp").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byGrp === Map("g0" -> 10L, "g1" -> 5L, "g2" -> 1L))
    // kept set is exactly the n smallest by (draw, id) — replay locally
    val md = java.security.MessageDigest.getInstance("MD5")
    def draw(id: Long) = md.digest(s"${id}s1".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(8)
    val expectG0 = (0L until 50L).sortBy(i => (draw(i), i)).take(10).toSet
    val gotG0 = capped.filter($"grp" === "g0").select("id").as[Long]
      .collect().toSet
    assert(gotG0 === expectG0)
    // partition-invariant and salt-redrawable
    val repart = DataMix.capPerGroup(df.repartition(7), "grp", "id", 10, "s1")
      .select("id").as[Long].collect().toSet
    assert(repart === capped.select("id").as[Long].collect().toSet)
    val redraw = DataMix.capPerGroup(df, "grp", "id", 10, "s2")
      .filter($"grp" === "g0").select("id").as[Long].collect().toSet
    assert(redraw !== gotG0)
    // columns pass through unchanged (no helper columns leak)
    assert(capped.columns.toSeq === Seq("id", "grp"))
  }

  test("packByTokenBudget: exclusive prefix bins, straddlers start in-place") {
    import spark.implicits._
    val df = Seq(
      ("g", 1L, 900L), ("g", 2L, 900L), ("g", 3L, 900L), // 0,900,1800 → bins 0,0,0
      ("g", 4L, 100L), // cum-before 2700 → bin 1
      ("g", 5L, 5000L), // cum-before 2800 → bin 1 (straddles, starts in 1)
      ("h", 6L, 10L)) // separate group restarts at bin 0
      .toDF("grp", "id", "toks")
    val bins = DataMix.packByTokenBudget(df, "grp", "id", "toks", budget = 2000L)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("bin")).toMap
    assert(bins == Map(1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 1L, 5L -> 1L, 6L -> 0L))
  }

  test("perGroupQuantileBands: group-relative bands, ANSI remainder, tie determinism") {
    import spark.implicits._
    // group g: 6 rows with k=4 -> band sizes 2,2,1,1 (remainder leads);
    // group h: one row -> band 1. Scores tie inside g (30,30) -> id breaks.
    val df = Seq(
      ("g", 1L, 10L), ("g", 2L, 20L), ("g", 3L, 30L),
      ("g", 4L, 30L), ("g", 5L, 40L), ("g", 6L, 50L),
      ("h", 7L, 999L))
      .toDF("src", "id", "score")
    def run() = DataMix.perGroupQuantileBands(df, "src", "score", "id", 4)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Int]("band")).toMap
    val bands = run()
    assert(bands == Map(1L -> 1, 2L -> 1, 3L -> 2, 4L -> 2, 5L -> 3, 6L -> 4, 7L -> 1))
    assert(run() == bands) // deterministic under re-run
    // group-relative: the BEST doc of a weak group outranks its own group's
    // cutoff even though its absolute score is below g's top band
    val weak = Seq(("g", 1L, 100L), ("g", 2L, 200L), ("w", 3L, 5L), ("w", 4L, 1L))
      .toDF("src", "id", "score")
    val wb = DataMix.perGroupQuantileBands(weak, "src", "score", "id", 2)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Int]("band")).toMap
    assert(wb(3L) == 2 && wb(2L) == 2) // each group has its own top band
  }

  test("deterministic split: disjoint-total, proportional, growth-stable") {
    import spark.implicits._
    val w = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val small = (1L to 2000L).toDF("id")
    val labels = DataMix.deterministicSplit(small, "id", w, "s1")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(labels.size == 2000) // total: every row labeled exactly once
    val frac = labels.values.groupBy(identity).view.mapValues(_.size / 2000.0).toMap
    assert(math.abs(frac("train") - 0.8) < 0.05)
    assert(math.abs(frac("val") - 0.1) < 0.03)
    assert(math.abs(frac("test") - 0.1) < 0.03)
    // growing the corpus never relabels existing keys (held-out stays out)
    val grown = DataMix.deterministicSplit((1L to 4000L).toDF("id"), "id", w, "s1")
      .filter(col("id") <= 2000).collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(grown == labels)
    // salt redraw changes the assignment
    val redrawn = DataMix.deterministicSplit(small, "id", w, "s2")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(redrawn != labels)
    // weights must sum to 1
    intercept[IllegalArgumentException](
      DataMix.deterministicSplit(small, "id", Seq("a" -> 0.5, "b" -> 0.4), "s"))
  }

  test("approx quantile bands agree >= 0.9 with exact ntile on real data") {
    val docs = graft.Tables(spark, "/root/testdata/sf0.01", "documents")
      .select(col("doc_id"), col("source"), col("n_chars"))
    val exact = DataMix.perGroupQuantileBands(docs, "source", "n_chars", "doc_id", 4)
      .select(col("doc_id"), col("band").as("b_exact"))
    val approx = DataMix.perGroupQuantileBandsApprox(docs, "source", "n_chars", 4)
      .select(col("doc_id"), col("band").as("b_approx"))
    val joined = exact.join(approx, "doc_id")
    val n = joined.count().toDouble
    val agree = joined.filter(col("b_exact") === col("b_approx")).count() / n
    assert(n == 500.0)
    assert(agree >= 0.9, s"band agreement $agree below gate")
    // bands must still span the full 1..k range per variant
    assert(approx.select("b_approx").distinct().count() == 4)
  }

  test("weightedSampleTopK: deterministic, partition-invariant, weight-biased") {
    import spark.implicits._
    val rows = (1L to 200L).map(i => (i, if (i == 7L) 500.0 else 1.0))
    val df = rows.toDF("id", "w")
    def ids(d: org.apache.spark.sql.DataFrame, salt: String) =
      DataMix.weightedSampleTopK(d, "id", "w", 20, salt)
        .collect().map(_.getLong(0)).toSet
    // deterministic across runs and partitionings
    assert(ids(df, "s1") == ids(df.repartition(17), "s1"))
    // redraws on salt change
    assert((1 to 9).map(i => ids(df, s"s$i")).distinct.size > 1)
    // weight bias: the 500x row wins the k=1 draw on most salts (its
    // exact A-Res selection probability is 500/699 ≈ 0.72)
    val wins = (1 to 40).count { i =>
      DataMix.weightedSampleTopK(df, "id", "w", 1, s"t$i")
        .head().getLong(0) == 7L
    }
    assert(wins > 20, s"heavy row won only $wins/40 single-draws")
  }

  test("weightedCapPerGroup: per-group bound, weight bias inside each group") {
    import spark.implicits._
    // two groups; in g1 row 5 carries 100x the weight of its 49 peers
    val rows = (1L to 50L).map(i => ("g1", i, if (i == 5L) 100.0 else 1.0)) ++
      (51L to 60L).map(i => ("g2", i, 1.0))
    val df = rows.toDF("src", "id", "w")
    def run(salt: String) =
      DataMix.weightedCapPerGroup(df, "src", "id", "w", 5, salt)
    val got = run("c1").collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.count(_._1 == "g1") == 5)
    assert(got.count(_._1 == "g2") == 5) // cap never deletes small groups below n... 10 > 5
    // deterministic + partition invariant
    assert(run("c1").collect().map(_.getLong(1)).toSet ==
      DataMix.weightedCapPerGroup(df.repartition(7), "src", "id", "w", 5, "c1")
        .collect().map(_.getLong(1)).toSet)
    // the heavy row survives g1's 5-of-50 cap on most salts (P ≈ uniform
    // 10% without weighting; with 100x weight it is near-certain)
    val survives = (1 to 20).count(i =>
      run(s"d$i").filter(col("id") === 5L).count() == 1)
    assert(survives >= 15, s"heavy row survived only $survives/20 caps")
  }

  test("weightedSampleTopK: non-positive weights excluded, k past population") {
    import spark.implicits._
    val df = Seq((1L, 2.0), (2L, 0.0), (3L, -1.0), (4L, 5.0)).toDF("id", "w")
    val got = DataMix.weightedSampleTopK(df, "id", "w", 10, "s")
      .collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 4L)) // zero/negative never sampled; k caps at pop
    intercept[IllegalArgumentException](
      DataMix.weightedSampleTopK(df, "id", "w", 0, "s"))
    // NaN weights: NaN > 0 is TRUE under Spark's NaN ordering and the NaN
    // sort key would rank FIRST under desc — they must be excluded, not
    // deterministically fill the sample
    val withNan = Seq((1L, 2.0), (2L, Double.NaN), (3L, 1.0)).toDF("id", "w")
    assert(DataMix.weightedSampleTopK(withNan, "id", "w", 2, "s")
      .collect().map(_.getLong(0)).toSet == Set(1L, 3L))
    assert(DataMix.weightedCapPerGroup(
        withNan.withColumn("g", lit("g")), "g", "id", "w", 2, "s")
      .collect().map(_.getLong(0)).toSet == Set(1L, 3L))
  }

  test("approx bands keep null-group rows (agree with the exact twin's row set)") {
    import spark.implicits._
    val df = Seq(("g", 1L, 10L), ("g", 2L, 20L),
      (null.asInstanceOf[String], 3L, 5L), (null.asInstanceOf[String], 4L, 50L))
      .toDF("src", "id", "score")
    val exact = DataMix.perGroupQuantileBands(df, "src", "score", "id", 2)
    val approx = DataMix.perGroupQuantileBandsApprox(df, "src", "score", 2)
    assert(exact.count() == 4 && approx.count() == 4)
    val nullBands = approx.filter(col("src").isNull)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Int]("band")).toMap
    assert(nullBands == Map(3L -> 1, 4L -> 2)) // banded within their own group
  }

  test("stratified sample: exact ceil targets, every stratum represented") {
    import spark.implicits._
    // strata sizes 25, 4, 1 at 1/10 => ceil targets 3, 1, 1
    val rows = (1 to 25).map(i => ("big", i.toLong)) ++
      (26 to 29).map(i => ("mid", i.toLong)) ++ Seq(("tiny", 30L))
    val out = DataMix.stratifiedSample(rows.toDF("strat", "id"),
      "strat", "id", num = 1, den = 10, salt = "s")
    val bySize = out.collect().groupBy(_.getString(0)).view.mapValues(_.length)
    assert(bySize.toMap == Map("big" -> 3, "mid" -> 1, "tiny" -> 1))
  }

  test("stratified sample: deterministic across partitionings and salts redraw") {
    import spark.implicits._
    val rows = (1 to 200).map(i => (s"s${i % 5}", i.toLong))
    val a = DataMix.stratifiedSample(rows.toDF("strat", "id").repartition(1),
      "strat", "id", 1, 4, "x").collect().map(_.getLong(1)).toSet
    val b = DataMix.stratifiedSample(rows.toDF("strat", "id").repartition(9),
      "strat", "id", 1, 4, "x").collect().map(_.getLong(1)).toSet
    assert(a == b && a.size == 50) // 5 strata of 40 => 10 each
    val c = DataMix.stratifiedSample(rows.toDF("strat", "id"),
      "strat", "id", 1, 4, "y").collect().map(_.getLong(1)).toSet
    assert(c != a) // different salt, different draw
  }

  test("stratified sample: null stratum kept as its own group; guards") {
    import spark.implicits._
    val df = Seq((null.asInstanceOf[String], 1L),
      (null.asInstanceOf[String], 2L), ("g", 3L)).toDF("strat", "id")
    val out = DataMix.stratifiedSample(df, "strat", "id", 1, 2, "s")
    assert(out.count() == 2) // ceil(2/2)=1 null-stratum row + ceil(1/2)=1
    intercept[IllegalArgumentException](
      DataMix.stratifiedSample(df, "strat", "id", 3, 2, "s"))
    intercept[IllegalArgumentException](
      DataMix.stratifiedSample(df.withColumn("__rn", lit(1)),
        "strat", "id", 1, 2, "s"))
  }
}
