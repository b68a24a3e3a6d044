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

  test("out-of-vocabulary tokens are ignored against a foreign LM") {
    import spark.implicits._
    val lm = LmScore.unigramLm(Seq((1L, "a b")).toDF("doc_id", "text"), "text")
    val out = LmScore.surprisalScores(
      Seq((9L, "a zz b zz")).toDF("doc_id", "text"), "doc_id", "text", lm)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(out === Array((9L, 2L))) // only a and b scored
  }
}
