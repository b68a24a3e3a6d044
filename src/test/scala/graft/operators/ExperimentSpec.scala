package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** CUPED and two-proportion-z ground truths: a noise-free linear covariate
  * collapses adjusted variance to ~0 with θ recovered exactly; balanced
  * conversions give z = 0; a planted lift is significant with the right
  * sign. Plus degenerate/robustness contracts.
  */
class ExperimentSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestBase.spark
  import spark.implicits._

  test("cuped: post = 2*pre + arm effect gives theta=2, full variance kill") {
    // identical pre distribution per arm => pooled theta exactly 2
    val units = (1 to 4).flatMap { p =>
      Seq((0, p.toDouble, 2.0 * p), (1, p.toDouble, 2.0 * p + 1.0))
    }
    val out = Experiment.cuped(units.toDF("arm", "pre", "post"),
      "arm", "pre", "post").orderBy("arm").collect()
    val a0 = out(0); val a1 = out(1)
    assert(a0.getAs[Long]("n") == 4L && a1.getAs[Long]("n") == 4L)
    // adjusted metric is constant per arm: 2*mean_pre and 2*mean_pre+1
    assert(a0.getAs[Double]("mean_adjusted") == 5.0)
    assert(a1.getAs[Double]("mean_adjusted") == 6.0)
    assert(a0.getAs[Double]("var_adjusted") == 0.0)
    assert(a1.getAs[Double]("var_adjusted") == 0.0)
    assert(a0.getAs[Double]("var_reduction") == 1.0)
    // raw post variance was NOT zero — the reduction is real
    assert(a0.getAs[Double]("var_post") > 0)
    // unadjusted means preserved
    assert(a0.getAs[Double]("mean_post") == 5.0)
    assert(a1.getAs[Double]("mean_post") == 6.0)
  }

  test("cuped: uncorrelated covariate leaves variance roughly unchanged") {
    // pre is constant => theta degenerate; use near-constant variation
    // orthogonal to post instead: pre cycles 1,2 while post cycles 10,10,20,20
    val units = (0 until 40).map { i =>
      (i % 2, (1 + i % 2).toDouble, if ((i / 2) % 2 == 0) 10.0 else 20.0)
    }
    val out = Experiment.cuped(units.toDF("arm", "pre", "post"),
      "arm", "pre", "post").orderBy("arm").collect()
    // |reduction| small — no systematic relationship to exploit
    out.foreach { r =>
      assert(math.abs(r.getAs[Double]("var_reduction")) < 0.2)
    }
  }

  test("cuped: null rows are dropped, arms ordered deterministically") {
    val df = Seq((Some(0), Some(1.0), Some(2.0)), (Some(1), None, Some(3.0)),
      (None, Some(1.0), Some(2.0)), (Some(1), Some(2.0), None),
      (Some(1), Some(3.0), Some(7.0)), (Some(0), Some(2.0), Some(4.0)))
      .toDF("arm", "pre", "post")
    val out = Experiment.cuped(df, "arm", "pre", "post").orderBy("arm").collect()
    assert(out.map(_.getAs[Int]("arm")).toSeq == Seq(0, 1))
    assert(out.map(_.getAs[Long]("n")).toSeq == Seq(2L, 1L))
  }

  test("two-proportion z: balanced arms give z = 0, not significant") {
    val units = (0 until 20).map(i => (i % 2, if (i < 10) 1 else 0))
    val out = Experiment.twoProportionZ(units.toDF("arm", "conv"),
      "arm", "conv").collect().head
    assert(out.getAs[Long]("n_a") == 10L && out.getAs[Long]("n_b") == 10L)
    assert(out.getAs[Long]("x_a") == 5L && out.getAs[Long]("x_b") == 5L)
    assert(out.getAs[Double]("z") == 0.0)
    assert(!out.getAs[Boolean]("significant_5pct"))
  }

  test("two-proportion z: a planted lift is significant with the right sign") {
    // arm 0 converts 50/100, arm 1 converts 90/100
    val units = (0 until 100).map(i => (0, if (i < 50) 1 else 0)) ++
      (0 until 100).map(i => (1, if (i < 90) 1 else 0))
    val out = Experiment.twoProportionZ(units.toDF("arm", "conv"),
      "arm", "conv").collect().head
    assert(out.getAs[Double]("p_a") == 0.5 && out.getAs[Double]("p_b") == 0.9)
    assert(out.getAs[Double]("z") < -1.96)
    assert(out.getAs[Boolean]("significant_5pct"))
    // hand value: p̂=0.7, se=sqrt(.7*.3*(2/100)), z=-0.4/se ≈ -6.17
    assert(math.abs(out.getAs[Double]("z") + 6.172134) < 1e-5)
  }

  test("two-proportion z: degenerate pool yields null z, never an abort") {
    val all = Seq((0, 1), (0, 1), (1, 1), (1, 1)).toDF("arm", "conv")
    val out = Experiment.twoProportionZ(all, "arm", "conv").collect().head
    assert(out.isNullAt(out.fieldIndex("z")))
    assert(out.isNullAt(out.fieldIndex("significant_5pct")))
    val none = Seq((0, 0), (1, 0)).toDF("arm", "conv")
    val out2 = Experiment.twoProportionZ(none, "arm", "conv").collect().head
    assert(out2.isNullAt(out2.fieldIndex("z")))
  }

  test("two-proportion z: arm labels order as min/max") {
    val units = Seq(("treat", 1), ("treat", 0), ("ctrl", 1), ("ctrl", 1))
    val out = Experiment.twoProportionZ(units.toDF("arm", "conv"),
      "arm", "conv").collect().head
    assert(out.getAs[String]("arm_a") == "ctrl")
    assert(out.getAs[String]("arm_b") == "treat")
    assert(out.getAs[Long]("x_a") == 2L && out.getAs[Long]("x_b") == 1L)
  }

  test("mde: hand-checked normal approximation, degenerate null") {
    // p = 30/200 = 0.15, n_eff = 100 (equal arms)
    val units = (0 until 100).map(i => (0, if (i < 10) 1 else 0)) ++
      (0 until 100).map(i => (1, if (i < 20) 1 else 0))
    val out = Experiment.minDetectableEffect(units.toDF("arm", "conv"),
      "arm", "conv").collect().head
    assert(out.getAs[Long]("n_eff") == 100L)
    assert(out.getAs[Double]("p_base") == 0.15)
    val expected = (1.959964 + 0.841621) *
      math.sqrt(2.0 * 0.15 * 0.85 / 100.0)
    assert(math.abs(out.getAs[Double]("mde_abs") - expected) < 1e-6)
    assert(math.abs(out.getAs[Double]("mde_rel")
      - expected / 0.15) < 1e-5)
    // smaller arm drives n_eff conservatively
    val skewed = units ++ (0 until 300).map(i => (1, 0))
    val out2 = Experiment.minDetectableEffect(skewed.toDF("arm", "conv"),
      "arm", "conv").collect().head
    assert(out2.getAs[Long]("n_eff") == 100L)
    val degenerate = Seq((0, 0), (1, 0)).toDF("arm", "conv")
    val out3 = Experiment.minDetectableEffect(degenerate, "arm", "conv")
      .collect().head
    assert(out3.isNullAt(out3.fieldIndex("mde_abs")))
  }

  test("partition invariance") {
    val units = (0 until 300).map(i => (i % 2, (i % 7).toDouble,
      (i % 5).toDouble * 2 + i % 2))
    val df1 = units.toDF("arm", "pre", "post").repartition(1)
    val df7 = units.toDF("arm", "pre", "post").repartition(7)
    assert(Experiment.cuped(df1, "arm", "pre", "post").orderBy("arm")
      .collect().toSeq ==
      Experiment.cuped(df7, "arm", "pre", "post").orderBy("arm")
        .collect().toSeq)
  }
}
