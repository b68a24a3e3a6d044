package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The sketch family composed with the text stack — corpus profiling the
  * way a 100 TB pipeline would run it: explode documents to token-hash
  * keys (TextHashing.hash64, the minhash family's base hash), then answer
  * frequency and cardinality questions from sketches, cross-checked
  * against exact aggregation on the same keys.
  */
class SketchTextProfileSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestBase.spark
  import spark.implicits._

  private lazy val tokenKeys = {
    val h64 = udf((t: String) => graft.functions.TextHashing.hash64(t))
    graft.Tables(spark, "/root/testdata/sf0.001", "documents")
      .select(explode(graft.functions.TextAnalysis.lowerTokens(col("text"))).as("tok"))
      .filter(col("tok") =!= "")
      // hash64 maps into the full signed-long space; shift to non-negative
      // by clearing the sign bit so the CMS/HLL key contract holds
      .select((h64(col("tok")).bitwiseAND(Long.MaxValue)).as("k"))
      .cache()
  }

  test("heavy-hitter token hashes equal the exact frequency tail") {
    val exact = tokenKeys.groupBy("k").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= 200)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val viaSketch = CmSketch.heavyHitters(tokenKeys, "k", threshold = 200L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaSketch == exact)
    assert(exact.nonEmpty) // the fixture corpus has a real frequency head
  }

  test("vocabulary size estimate lands inside the HLL envelope") {
    val actual = tokenKeys.distinct().count().toDouble
    val est = HllSketch.estimate(HllSketch.registers(tokenKeys, "k"))
      .collect()(0).getAs[Double]("est_distinct")
    // the fixture corpus is word salad over a small wordlist (~31 distinct
    // tokens) — tiny cardinalities sit in HLL's most accurate regime
    assert(actual >= 20)
    assert(math.abs(est - actual) < math.max(3.0, actual * 0.13),
      s"est=$est actual=$actual")
  }
}
