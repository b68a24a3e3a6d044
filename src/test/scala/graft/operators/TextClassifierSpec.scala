package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Trainable linear classifier contracts: feature hashing replay, a
  * hand-computed first GD step, actual learning on a separable corpus, and
  * bit-identical training across partitionings (the property that makes
  * q5a's training loop oracle-able). Driver-level hash-exactness is
  * q5a_quality_classifier.
  */
class TextClassifierSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import org.apache.spark.sql.DataFrame

  private def fixture: DataFrame = {
    import spark.implicits._
    // separable: label-1 docs speak "alpha/beta", label-0 docs "gamma/delta"
    val rows = (0 until 40).map { i =>
      if (i % 2 == 0) (i.toLong, "alpha beta alpha beta alpha", 1)
      else (i.toLong, "gamma delta gamma delta gamma", 0)
    }
    rows.toDF("doc_id", "text", "y")
  }

  test("featureBuckets: poly-31 codepoint fold mod 1e9+7 mod dim, one per token") {
    def poly(tok: String): Long =
      tok.codePoints().toArray.foldLeft(0L)((a, c) => (a * 31 + c) % 1000000007L)
    val got = TextClassifier.featureBuckets("alpha beta  alpha", 32).toSeq
    val expect = Seq("alpha", "beta", "alpha").map(t => (poly(t) % 32).toInt)
    assert(got === expect)
    assert(TextClassifier.featureBuckets("", 32).isEmpty)
    assert(TextClassifier.featureBuckets("   ", 32).isEmpty)
    assert(TextClassifier.featureBuckets(null, 32).isEmpty)
    // non-ASCII and supplementary-plane tokens fold by CODEPOINT (one
    // step per character, surrogate pairs consumed whole) — the contract
    // DuckDB's unicode(ch) fold shares
    val emoji = new String(Character.toChars(0x1F600))
    assert(TextClassifier.featureBuckets(s"$emoji a", 32).toSeq ===
      Seq((0x1F600 % 1000000007L % 32).toInt, ('a'.toLong % 32).toInt))
    assert(TextClassifier.featureBuckets("héllo 漢字", 32).toSeq ===
      Seq("héllo", "漢字").map(t => (poly(t) % 32).toInt))
  }

  test("hashedFeatures: normalized counts plus a bias row for every doc") {
    import spark.implicits._
    val docs = Seq((1L, "alpha alpha beta", 1), (2L, "", 0)).toDF("doc_id", "text", "y")
    val feats = TextClassifier.hashedFeatures(docs, "doc_id", "text", "y", dim = 32)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getDouble(3)))
    // doc 1: two distinct token buckets with x = 2/3 and 1/3, plus bias
    val d1 = feats.filter(_._1 == 1L)
    assert(d1.count(_._3 == 32) === 1)
    assert(d1.filter(_._3 != 32).map(_._4).sorted.toSeq === Seq(1.0 / 3, 2.0 / 3))
    // the empty doc still gets its bias row (and nothing else)
    val d2 = feats.filter(_._1 == 2L)
    assert(d2.toSeq === Seq((2L, 0, 32, 1.0)))
  }

  test("first GD step from zero weights matches the closed form") {
    import spark.implicits._
    // one doc, one token: x = (j: 1.0, bias: 1.0), y = 1. With w0 = 0:
    // p = 0.5, g_j = (0.5 - 1)·1 = -0.5, w1_j = 0 - lr·(-0.5/1) = lr/2
    val docs = Seq((1L, "tok", 1)).toDF("doc_id", "text", "y")
    val feats = TextClassifier.hashedFeatures(docs, "doc_id", "text", "y", dim = 8)
    val m = TextClassifier.train(feats, dim = 8, iters = 1, lr = 0.5)
    val j = TextClassifier.featureBuckets("tok", 8).head
    assert(m.weights(j) === 0.25)
    assert(m.weights(8) === 0.25) // bias sees the same gradient here
    assert(m.weights.zipWithIndex.filter { case (_, i) => i != j && i != 8 }
      .forall(_._1 === 0.0))
  }

  test("training separates a separable corpus (accuracy 1.0, loss shrinks)") {
    val feats = TextClassifier.hashedFeatures(fixture, "doc_id", "text", "y", dim = 32)
      .cache()
    try {
      val m0 = TextClassifier.Model(Array.fill(33)(0.0))
      val m = TextClassifier.train(feats, dim = 32, iters = 10, lr = 2.0)
      def scored(model: TextClassifier.Model) =
        TextClassifier.score(feats, model).collect()
          .map(r => (r.getInt(1), r.getDouble(2)))
      val after = scored(m)
      assert(after.forall { case (y, s) => (s >= 0.5) == (y == 1) },
        "separable corpus must classify perfectly")
      // squared-error loss strictly below the all-0.5 start
      def loss(xs: Array[(Int, Double)]) =
        xs.map { case (y, s) => (s - y) * (s - y) }.sum
      assert(loss(after) < loss(scored(m0)) * 0.5)
    } finally feats.unpersist()
  }

  test("training is bit-identical across partitionings") {
    def weights(parts: Int): Seq[Double] = {
      val feats = TextClassifier.hashedFeatures(
        fixture.repartition(parts), "doc_id", "text", "y", dim = 32)
      TextClassifier.train(feats, dim = 32, iters = 3, lr = 0.5).weights.toSeq
    }
    assert(weights(1) === weights(13))
  }

  test("zero iterations yields the zero model; every score is exactly 0.5") {
    val feats = TextClassifier.hashedFeatures(fixture, "doc_id", "text", "y", dim = 16)
    val m = TextClassifier.train(feats, dim = 16, iters = 0, lr = 0.5)
    assert(m.weights.forall(_ === 0.0))
    val scores = TextClassifier.score(feats, m).collect().map(_.getDouble(2))
    assert(scores.nonEmpty && scores.forall(_ === 0.5))
  }

  test("uniform labels push every touched weight the same direction") {
    import spark.implicits._
    // all-positive corpus: gradient (p − 1)·x is negative everywhere, so
    // weights only grow — scores must end strictly above the 0.5 start
    val docs = (0L until 20L).map(i => (i, "tok other", 1)).toDF("doc_id", "text", "y")
    val feats = TextClassifier.hashedFeatures(docs, "doc_id", "text", "y", dim = 16)
    val m = TextClassifier.train(feats, dim = 16, iters = 3, lr = 1.0)
    val scores = TextClassifier.score(feats, m).collect().map(_.getDouble(2))
    assert(scores.forall(_ > 0.5))
  }

  test("saveModel/loadModel round-trips weights bit-exactly; junk tables refuse") {
    val feats = TextClassifier.hashedFeatures(fixture, "doc_id", "text", "y", dim = 32)
    val m = TextClassifier.train(feats, dim = 32, iters = 3, lr = 0.5)
    val dir = java.nio.file.Files.createTempDirectory("clf-model")
      .resolve("m").toString
    TextClassifier.saveModel(m, dir, spark)
    val back = TextClassifier.loadModel(dir, spark)
    assert(back.weights.toSeq === m.weights.toSeq)
    assert(back.dim === m.dim)
    // and scoring under the reloaded model is bit-identical
    val a = TextClassifier.score(feats, m).collect().map(_.getDouble(2)).toSeq
    val b = TextClassifier.score(feats, back).collect().map(_.getDouble(2)).toSeq
    assert(a === b)
    // a table with an index gap is not a model
    import spark.implicits._
    val junkDir = java.nio.file.Files.createTempDirectory("clf-junk")
      .resolve("m").toString
    Seq((0, 0.1), (2, 0.2)).toDF("j", "w").write.parquet(junkDir)
    assertThrows[IllegalArgumentException] {
      TextClassifier.loadModel(junkDir, spark)
    }
  }

  test("scores lie on the (0,1) fast-sigmoid range and the 6-decimal grid") {
    val feats = TextClassifier.hashedFeatures(fixture, "doc_id", "text", "y", dim = 32)
    val m = TextClassifier.train(feats, dim = 32, iters = 2, lr = 0.5)
    val scores = TextClassifier.score(feats, m).collect().map(_.getDouble(2))
    assert(scores.forall(s => s > 0.0 && s < 1.0))
    assert(scores.forall(s => s === IvfIndex.roundHalfUp(s, 6)))
  }
}
