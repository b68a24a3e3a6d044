package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Unigram-LM surprisal: hand-computed values, DECIMAL order-free sums,
  * partition invariance. Driver-level hash-exactness is q3j_lm_surprisal.
  */
class LmScoreSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("known values on a tiny corpus; partition-invariant") {
    import spark.implicits._
    val docs = Seq((1L, "a a b"), (2L, "b c")).toDF("doc_id", "text")
    // counts: a=2 b=2 c=1, total=5
    // s(a)=s(b)=round(-ln(0.4),9)=0.916290732, s(c)=round(-ln(0.2),9)=1.609437912
    val lm = LmScore.unigramLm(docs, "text")
    val lmMap = lm.collect()
      .map(r => r.getString(0) -> r.getDecimal(1).doubleValue()).toMap
    assert(lmMap("a") === 0.916290732)
    assert(lmMap("b") === 0.916290732)
    assert(lmMap("c") === 1.609437912)

    def scores(d: org.apache.spark.sql.DataFrame) =
      LmScore.surprisalScores(d, "doc_id", "text", lm).collect()
        .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).sortBy(_._1).toSeq
    val got = scores(docs)
    // doc1: (0.916290732*2 + 0.916290732)/3; doc2: (0.916290732+1.609437912)/2
    assert(got === Seq((1L, 0.916291, 3L), (2L, 1.262864, 2L)))
    assert(scores(docs.repartition(13)) === got)
  }

  test("minTokenCount floor: surviving tokens keep exact surprisal; band membership preserved") {
    import spark.implicits._
    val docs = graft.Tables(spark, "/root/testdata/sf0.001", "documents")
    val full = LmScore.unigramLm(docs, "text")
    // floor just above the fixture's rarest token count, so the floor
    // provably drops the rare tail (the fixture vocabulary has no hapaxes)
    val minCnt = docs
      .select(explode(graft.functions.TextAnalysis.tokens(col("text"))).as("t"))
      .groupBy("t").count().agg(min("count")).collect().head.getLong(0)
    val floored = LmScore.unigramLm(docs, "text", minTokenCount = minCnt + 1)
    // the floor only removes rows — every surviving token keeps the exact
    // unfloored surprisal (denominator is the full corpus either way)
    val fullMap = full.collect().map(r => r.getString(0) -> r.getDecimal(1)).toMap
    val flooredRows = floored.collect().map(r => r.getString(0) -> r.getDecimal(1))
    assert(flooredRows.nonEmpty && flooredRows.length < fullMap.size)
    flooredRows.foreach { case (t, s) => assert(fullMap(t) == s) }

    // band membership on the fixture: the quality band a doc lands in is
    // unchanged under the floored LM (hapax tokens are a vanishing share of
    // any real doc's mass; the wide band Curate's bench uses is (0,100))
    def band(lm: org.apache.spark.sql.DataFrame): Set[Long] =
      LmScore.surprisalScores(docs, "doc_id", "text", lm)
        .filter(col("surprisal").between(2.0, 9.0))
        .collect().map(_.getLong(0)).toSet
    assert(band(floored) == band(full))
  }

  test("out-of-vocabulary tokens are ignored against a foreign LM") {
    import spark.implicits._
    val lm = LmScore.unigramLm(Seq((1L, "a b")).toDF("doc_id", "text"), "text")
    val out = LmScore.surprisalScores(
      Seq((9L, "a zz b zz")).toDF("doc_id", "text"), "doc_id", "text", lm)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(out === Array((9L, 2L))) // only a and b scored
  }

  test("bigram LM: hand-computed conditional probabilities") {
    import spark.implicits._
    // corpus "a b a b" + "a c": pairs (a,b)x2, (b,a)x1, (a,c)x1
    // p(b|a)=2/3, p(c|a)=1/3, p(a|b)=1
    val docs = Seq((1L, "a b a b"), (2L, "a c")).toDF("doc_id", "text")
    val bi = LmScore.bigramLm(docs, "text").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(bi.size == 3)
    assert(bi(("a", "b")) === 2.0 / 3)
    assert(bi(("a", "c")) === 1.0 / 3)
    assert(bi(("b", "a")) === 1.0)
  }

  test("interpolated surprisal: hand-computed, word-order-aware, partition-invariant") {
    import spark.implicits._
    val docs = Seq((1L, "a b a b"), (2L, "a c")).toDF("doc_id", "text")
    val uni = LmScore.unigramProbs(docs, "text")
    val bi = LmScore.bigramLm(docs, "text")
    // unigram: a 3/6, b 2/6, c 1/6
    // doc1 positions: a(uni 0.5); b|a .7*2/3+.3*1/3=0.566...; a|b .7*1+.3*.5=0.85;
    //   b|a 0.566...
    val pb_a = 0.7 * (2.0 / 3) + 0.3 * (2.0 / 6)
    val pa_b = 0.7 * 1.0 + 0.3 * (3.0 / 6)
    def r9(x: Double) = BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).doubleValue
    val d1 = BigDecimal(r9(-math.log(0.5))) + BigDecimal(r9(-math.log(pb_a))) * 2 +
      BigDecimal(r9(-math.log(pa_b)))
    val exp1 = (d1 / 4).setScale(6, BigDecimal.RoundingMode.HALF_UP).doubleValue

    def run(d: org.apache.spark.sql.DataFrame) =
      LmScore.interpolatedSurprisalScores(d, "doc_id", "text", uni, bi)
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).sortBy(_._1).toSeq
    val got = run(docs)
    assert(got.head == ((1L, exp1, 4L)))
    assert(run(docs.repartition(7)) == got)

    // Word order matters: the bigram-coherent doc scores strictly lower
    // than the same tokens shuffled into an unseen order.
    val coherent = Seq((10L, "a b a b a b")).toDF("doc_id", "text")
    val salad = Seq((10L, "b b b a a a")).toDF("doc_id", "text")
    val sc = run(coherent).head._2
    val ss = run(salad).head._2
    assert(sc < ss)
    // ...while the unigram model cannot tell them apart (same token bag).
    val uLm = LmScore.unigramLm(docs, "text")
    val us = LmScore.surprisalScores(coherent, "doc_id", "text", uLm).collect().head.getDouble(1)
    val uu = LmScore.surprisalScores(salad, "doc_id", "text", uLm).collect().head.getDouble(1)
    assert(us == uu)
  }

  test("kneser-ney: hand-computed smoothing, continuation beats raw frequency") {
    import spark.implicits._
    // corpus "a b a b" + "a c": bigrams (a,b)x2, (b,a)x1, (a,c)x1
    // types T=3; c(a)=3, N1+(a,.)=2; c(b)=1, N1+(b,.)=1
    // P_cont: b follows {a} -> 1/3; a follows {b} -> 1/3; c follows {a} -> 1/3
    val docs = Seq((1L, "a b a b"), (2L, "a c")).toDF("doc_id", "text")
    val D = 0.75
    val pcont = 1.0 / 3
    // doc1: pos1 a -> p_cont(a)=1/3
    //       b|a -> (2-D)/3 + (D*2/3)*1/3
    //       a|b -> (1-D)/1 + (D*1/1)*1/3
    val pb_a = (2 - D) / 3 + (D * 2 / 3) * pcont
    val pa_b = (1 - D) / 1 + D * 1 * pcont
    def r9(x: Double) = BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).doubleValue
    val d1 = BigDecimal(r9(-math.log(pcont))) +
      BigDecimal(r9(-math.log(pb_a))) * 2 + BigDecimal(r9(-math.log(pa_b)))
    val exp1 = (d1 / 4).setScale(6, BigDecimal.RoundingMode.HALF_UP).doubleValue
    def run(d: org.apache.spark.sql.DataFrame) =
      LmScore.kneserNeySurprisalScores(d, "doc_id", "text")
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
        .sortBy(_._1).toSeq
    val got = run(docs)
    assert(got.head == ((1L, exp1, 4L)))
    assert(run(docs.repartition(5)) == got, "partition-invariant")
    // every probability is a proper sub-distribution value in (0, 1]
    assert(got.forall(_._2 > 0))

    // The KN signature: a frequent token locked to ONE context ("francisco"
    // only ever follows "san") gets LOW continuation probability — in a
    // fresh context it scores MORE surprising than an equally frequent
    // token seen after many contexts, which raw bigram interpolation
    // under-penalizes.
    val kn = Seq(
      (1L, "san francisco san francisco san francisco san francisco"),
      (2L, "a milk b milk c milk d milk"),
      (3L, "x francisco"), (4L, "x milk")) // fresh context 'x' for both
      .toDF("doc_id", "text")
    val scores = LmScore.kneserNeySurprisalScores(kn, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // same shape (2 tokens, unseen-context backoff at position 2), so the
    // difference is exactly the continuation probability
    assert(scores(3L) > scores(4L),
      s"francisco (1 context) must out-surprise milk (4 contexts): $scores")
  }
}
