package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Statistical diagnostics against closed-form ground truths: moment
  * identities, Gini extremes, Benford digit extraction, ACF of a pure
  * alternating series — plus the degenerate-input contracts.
  */
class StatsSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestBase.spark
  import spark.implicits._

  test("moments: symmetric data has zero skew; constants null out") {
    val sym = Seq(1.0, 2.0, 3.0, 4.0, 5.0).map(("g", _)) ++
      Seq(7.0, 7.0, 7.0).map(("c", _))
    val out = Stats.groupedMoments(sym.toDF("g", "x"), "g", "x")
      .orderBy("g").collect()
    val c = out(0)
    assert(c.getAs[Double]("variance") == 0.0)
    assert(c.isNullAt(c.fieldIndex("skewness")))
    assert(c.isNullAt(c.fieldIndex("kurtosis")))
    val g = out(1)
    assert(g.getAs[Double]("mean") == 3.0)
    assert(g.getAs[Double]("variance") == 2.0)
    assert(g.getAs[Double]("skewness") == 0.0)
    // discrete uniform over 5 points: excess kurtosis = -1.3
    assert(math.abs(g.getAs[Double]("kurtosis") - (-1.3)) < 1e-9)
  }

  test("moments: a planted right tail is positively skewed") {
    val skewed = (Seq.fill(50)(1.0) ++ Seq(100.0)).map(("g", _))
    val out = Stats.groupedMoments(skewed.toDF("g", "x"), "g", "x").collect()
    assert(out.head.getAs[Double]("skewness") > 3.0)
  }

  test("gini: uniform is 0, total concentration approaches 1") {
    val uniform = (1 to 10).flatMap(k => Seq.fill(5)(k.toLong)).toDF("k")
    val g0 = Stats.giniOfCounts(uniform, "k").collect().head
    assert(g0.getAs[Double]("gini") == 0.0)
    val concentrated = (Seq.fill(991)(1L) ++ (2L to 10L)).toDF("k")
    val g1 = Stats.giniOfCounts(concentrated, "k").collect().head
    assert(g1.getAs[Double]("gini") > 0.85)
    assert(g1.getAs[Long]("n_keys") == 10L && g1.getAs[Long]("total") == 1000L)
  }

  test("benford: digits come from exact cents; expectations sum to N") {
    val vals = Seq(1.23, 19.99, 100.0, 0.07, 923.45, 2.50, 30.01, 455.0, 6.66)
    val out = Stats.benfordProfile(vals.map(("r", _)).toDF("r", "v"), "v")
      .orderBy("digit").collect()
    val byDigit = out.map(r => r.getInt(0) -> r.getLong(1)).toMap
    // leading digits: 1(1.23), 1(19.99), 1(100.0), 7(0.07=7 cents), 9, 2, 3, 4, 6
    assert(byDigit == Map(1 -> 3L, 2 -> 1L, 3 -> 1L, 4 -> 1L, 6 -> 1L,
      7 -> 1L, 9 -> 1L))
    val expSum = out.map(_.getAs[Double]("expected")).sum
    // expectations over PRESENT digits only; full 1..9 would sum to N=9.
    assert(expSum < 9.0 + 1e-6)
    assert(out.map(_.getAs[Double]("chi2")).distinct.length == 1)
  }

  test("benford: a benford-ish sample scores lower chi2 than uniform digits") {
    // geometric spread -> benford-like; linear spread -> uniform-ish digits
    val benford = (1 to 400).map(i => ("b", math.pow(1.02, i)))
    val uniformD = (1 to 400).map(i => ("u", 100.0 + i)) // digits 1-4 heavy
    val cb = Stats.benfordProfile(benford.toDF("g", "v"), "v")
      .collect().head.getAs[Double]("chi2")
    val cu = Stats.benfordProfile(uniformD.toDF("g", "v"), "v")
      .collect().head.getAs[Double]("chi2")
    assert(cb < cu, s"benford-ish chi2 $cb should beat uniform $cu")
  }

  test("streaming moments: any micro-batch split folds to the batch table") {
    val d = (1 to 500).map(i => (s"g${i % 3}", (i % 47).toDouble))
      .toDF("g", "x")
    val batch = Stats.groupedMoments(d, "g", "x")
      .orderBy("g").collect().map(_.toSeq)
    val splits = Seq(d.limit(77), d.offset(77).limit(200), d.offset(277))
    val img = splits.map(b => Stats.momentsImage(b, "g", "x"))
      .reduce(Stats.mergeMoments)
    val streamed = Stats.imageToMoments(spark, img)
      .orderBy("g").collect().map(_.toSeq)
    assert(streamed.toSeq == batch.toSeq)
    // merge order does not matter
    val img2 = splits.reverse.map(b => Stats.momentsImage(b, "g", "x"))
      .reduce(Stats.mergeMoments)
    assert(Stats.imageToMoments(spark, img2).orderBy("g")
      .collect().map(_.toSeq).toSeq == batch.toSeq)
  }

  test("trend: an exact line recovers slope/intercept with r2 = 1") {
    val line = (0 to 99).map(i => ("g", (i + 1000).toLong, 3.0 + 2.0 * i))
    val out = Stats.groupedTrend(line.toDF("g", "x", "y"), "g", "x", "y")
      .collect().head
    assert(out.getAs[Double]("slope") == 2.0)
    assert(out.getAs[Double]("intercept") == 3.0) // at the re-based origin
    assert(out.getAs[Double]("r2") == 1.0)
  }

  test("trend: zero x-variance nulls out; noise lowers r2 but not the sign") {
    val flat = Seq(("f", 5L, 1.0), ("f", 5L, 2.0))
    val noisy = (0 to 199).map(i =>
      ("n", i.toLong, 1.0 * i + (if (i % 2 == 0) 40.0 else -40.0)))
    val out = Stats.groupedTrend((flat ++ noisy).toDF("g", "x", "y"),
      "g", "x", "y").orderBy("g").collect()
    val f = out(0)
    assert(f.isNullAt(f.fieldIndex("slope")))
    val n = out(1)
    assert(n.getAs[Double]("slope") > 0.9 && n.getAs[Double]("slope") < 1.1)
    assert(n.getAs[Double]("r2") < 0.9)
  }

  test("autocorrelation: pure alternation gives acf_1 near -1, acf_2 near +1") {
    val series = (1 to 200).map(i => (i.toLong, if (i % 2 == 0) 10.0 else 20.0))
      .toDF("t", "v")
    val r = Stats.autocorrelation(series, "t", "v", maxLag = 2).collect().head
    assert(math.abs(r.getAs[Double]("acf_1") - (-1.0)) < 0.02)
    assert(math.abs(r.getAs[Double]("acf_2") - 1.0) < 0.02)
    assert(r.getAs[Long]("n") == 200L)
  }

  test("autocorrelation: partition invariance (decimal sums are order-free)") {
    val series = (1 to 300).map(i => (i.toLong, (i % 7).toDouble + i * 0.01))
      .toDF("t", "v")
    def run(df: org.apache.spark.sql.DataFrame) =
      Stats.autocorrelation(df, "t", "v", 3).collect().head.toSeq
    assert(run(series) == run(series.repartition(13, col("v"))))
  }

  private def r6(x: Double) = java.math.BigDecimal.valueOf(x)
    .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  test("lorenz: quintiles of 1..10 walk the exact cumulative shares") {
    val per = (1 to 10).map(i => (i.toLong, i.toDouble)).toDF("k", "v")
    val rows = Stats.lorenzCurve(per, "k", "v", k = 5).orderBy("bin").collect()
    assert(rows.map(_.getAs[Double]("bin_value")).toSeq ==
      Seq(3.0, 7.0, 11.0, 15.0, 19.0))
    assert(rows.map(_.getAs[Long]("n_keys")).toSeq == Seq.fill(5)(2L))
    val shares = rows.map(_.getAs[Double]("cum_value_share")).toSeq
    assert(shares == Seq(3.0 / 55, 10.0 / 55, 21.0 / 55, 36.0 / 55, 1.0)
      .map(r6))
  }

  test("welch: textbook groups recover t and Satterthwaite dof") {
    val df = (Seq(1, 2, 3, 4, 5).map(("a", _)) ++
      Seq(2, 4, 6, 8, 10).map(("b", _))).map { case (g, v) => (g, v.toDouble) }
      .toDF("g", "v")
    val out = Stats.welchTTest(df, "g", "v").collect().head
    assert(out.getAs[String]("group_a") == "a")
    assert(out.getAs[Double]("mean_a") == 3.0)
    assert(out.getAs[Double]("var_a") == 2.5)
    assert(out.getAs[Double]("var_b") == 10.0)
    assert(math.abs(out.getAs[Double]("t") - (-3.0 / math.sqrt(2.5))) < 1e-6)
    assert(math.abs(out.getAs[Double]("dof")
      - 6.25 / (0.0625 + 1.0)) < 1e-3)
  }

  test("welch: singleton group nulls the statistic") {
    val df = Seq(("a", 1.0), ("b", 2.0), ("b", 3.0)).toDF("g", "v")
    val out = Stats.welchTTest(df, "g", "v").collect().head
    assert(out.isNullAt(out.fieldIndex("t")))
  }

  test("mann-whitney: separated samples and tie correction by hand") {
    val sep = (Seq(1, 2, 3).map((0, _)) ++ Seq(4, 5, 6).map((1, _)))
      .map { case (g, v) => (g, v.toDouble) }.toDF("g", "v")
    val out = Stats.mannWhitneyU(sep, "g", "v").collect().head
    assert(out.getAs[Double]("u1") == 0.0)
    assert(out.getAs[Double]("u2") == 9.0)
    assert(math.abs(out.getAs[Double]("z")
      - (-4.5 / math.sqrt(5.25))) < 1e-6)
    // ties: a={1,1}, b={1,2} -> U1=1, sigma=1, z=-1 exactly
    val tied = Seq((0, 1.0), (0, 1.0), (1, 1.0), (1, 2.0)).toDF("g", "v")
    val out2 = Stats.mannWhitneyU(tied, "g", "v").collect().head
    assert(out2.getAs[Double]("u1") == 1.0)
    assert(out2.getAs[Double]("z") == -1.0)
  }

  test("cusum: level shift flags the pre-shift trough exactly") {
    val series = Seq((1L, 1.0), (2L, 1.0), (3L, 5.0), (4L, 5.0)).toDF("t", "v")
    val rows = Stats.cusum(series, "t", "v").orderBy("t").collect()
    assert(rows.map(_.getAs[Double]("cusum")).toSeq ==
      Seq(-2.0, -4.0, -2.0, 0.0))
    assert(rows.map(_.getAs[Boolean]("is_changepoint")).toSeq ==
      Seq(false, true, false, false))
  }

  test("new stats: partition invariance") {
    val df = (0 until 400).map(i => (i % 2, (i % 23).toDouble + i % 5))
      .toDF("g", "v")
    assert(Stats.welchTTest(df.repartition(1), "g", "v").collect().toSeq ==
      Stats.welchTTest(df.repartition(9), "g", "v").collect().toSeq)
    assert(Stats.mannWhitneyU(df.repartition(1), "g", "v").collect().toSeq ==
      Stats.mannWhitneyU(df.repartition(9), "g", "v").collect().toSeq)
  }

  test("weightedQuantiles picks the exact cumulative-weight crossing") {
    import spark.implicits._
    // group a: values 1..4 with weights 1,1,2,4 (total 8):
    //   median target 4.0 -> first value with cumw>=4 is 3; p90 target 7.2 -> 4
    // group b: single row
    val df = Seq(
      ("a", 1.0, "1.00", 1L), ("a", 2.0, "1.00", 2L), ("a", 3.0, "2.00", 3L),
      ("a", 4.0, "4.00", 4L), ("b", 9.0, "5.00", 5L))
      .toDF("g", "v", "w", "id")
      .withColumn("w", col("w").cast("decimal(18,2)"))
    val got = Stats.weightedQuantiles(df, Seq("g"), col("v"), col("w"),
      Seq(500, 900), Seq(col("id")))
      .orderBy("g").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2))).toSeq
    assert(got == Seq(("a", 3.0, 4.0), ("b", 9.0, 9.0)))
  }

  test("weightedQuantiles is partition-invariant") {
    import spark.implicits._
    val df = (1 to 1200).map(i =>
      (s"g${i % 3}", (i * 7 % 100).toDouble, BigDecimal((i % 9) + 1).setScale(2), i.toLong))
      .toDF("g", "v", "w", "id")
      .withColumn("w", col("w").cast("decimal(18,2)"))
    val a = Stats.weightedQuantiles(df.repartition(1), Seq("g"), col("v"),
      col("w"), Seq(250, 500, 750), Seq(col("id"))).orderBy("g").collect().map(_.toSeq).toSeq
    val b = Stats.weightedQuantiles(df.repartition(13), Seq("g"), col("v"),
      col("w"), Seq(250, 500, 750), Seq(col("id"))).orderBy("g").collect().map(_.toSeq).toSeq
    assert(a == b)
  }

  test("correlationMatrix: perfect, inverse and zero-variance pairs") {
    import spark.implicits._
    val df = (1 to 100).map(i => (i.toDouble, 2.0 * i + 3, -1.0 * i, 7.0))
      .toDF("a", "b", "c", "k")
    val got = Stats.correlationMatrix(df, Seq("a", "b", "c", "k"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        Option(r.get(3)).map(_.asInstanceOf[Double])).toMap
    assert(got(("a", "b")).get == 1.0)
    assert(got(("a", "c")).get == -1.0)
    assert(got(("a", "k")).isEmpty)   // zero variance -> null, not NaN
    assert(got.size == 6)
  }

  test("correlationMatrix: underscore-bearing names cannot collide scratch aliases") {
    import spark.implicits._
    // name-concatenated aliases would make ("x","y_z") and ("x_y","z")
    // both scratch as __sp_x_y_z; index-keyed aliases stay unique
    val df = (1 to 50).map(i =>
      (i.toDouble, 2.0 * i, 3.0 * i + 1, -1.0 * i)).toDF("x", "y_z", "x_y", "z")
    val got = Stats.correlationMatrix(df, Seq("x", "y_z", "x_y", "z"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        r.getAs[Double]("r")).toMap
    assert(got.size == 6)
    assert(got(("x", "y_z")) == 1.0 && got(("x_y", "z")) == -1.0)
  }

  test("mutualInformation: independent columns give ~zero, copies give H(X)") {
    import spark.implicits._
    // X uniform over 2 values, Y = X: MI = ln 2
    val dep = (1 to 400).map(i => (s"x${i % 2}", s"y${i % 2}")).toDF("a", "b")
    val miDep = Stats.mutualInformation(dep, col("a"), col("b"))
      .select("mi_total").distinct().collect()(0).getDouble(0)
    assert(math.abs(miDep - math.log(2)) < 1e-5)
    // independent: MI exactly 0 on a balanced grid
    val ind = (0 until 400).map(i => (s"x${i % 2}", s"y${(i / 2) % 2}")).toDF("a", "b")
    val miInd = Stats.mutualInformation(ind, col("a"), col("b"))
      .select("mi_total").distinct().collect()(0).getDouble(0)
    assert(math.abs(miInd) < 1e-9)
  }

  test("loglogFit recovers a known power-law exponent") {
    import spark.implicits._
    // y = 10 * x^(-0.7), exact on the 9-grid within rounding
    val df = (1 to 200).map { i =>
      (i.toDouble, 10.0 * math.pow(i.toDouble, -0.7))
    }.toDF("x", "y")
    val r = Stats.loglogFit(df, col("x"), col("y")).collect()(0)
    assert(r.getAs[Long]("n_points") == 200L)
    assert(math.abs(r.getAs[Double]("slope") - (-0.7)) < 1e-4)
    assert(math.abs(r.getAs[Double]("intercept") - math.log(10.0)) < 1e-4)
    // non-positive rows are dropped, not ln-poled
    val withZero = df.union(Seq((0.0, 5.0), (3.0, -1.0)).toDF("x", "y"))
    assert(Stats.loglogFit(withZero, col("x"), col("y"))
      .collect()(0).getAs[Long]("n_points") == 200L)
  }

  test("semiLogFit recovers a known exponential decay rate") {
    import spark.implicits._
    // y = 0.9 * exp(-0.35 x)
    val df = (1 to 60).map(i => (i.toDouble, 0.9 * math.exp(-0.35 * i)))
      .toDF("x", "y")
    val r = Stats.semiLogFit(df, col("x"), col("y")).collect()(0)
    assert(math.abs(r.getAs[Double]("slope") - (-0.35)) < 1e-4)
    assert(math.abs(r.getAs[Double]("intercept") - math.log(0.9)) < 1e-3)
    // zero/negative y rows are dropped, not ln-poled
    val dirty = df.union(Seq((99.0, 0.0), (100.0, -1.0)).toDF("x", "y"))
    assert(Stats.semiLogFit(dirty, col("x"), col("y"))
      .collect()(0).getAs[Long]("n_points") == 60L)
  }
}
