package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bloom membership: the no-false-negative guarantee (incl. under a
  * deliberately saturated filter), definitive absence, per-key distinct-bit
  * semantics, bounded image, partition invariance, validation.
  */
class BloomFilterSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestBase.spark
  import spark.implicits._

  private def verdicts(members: Seq[Long], probes: Seq[Long], k: Int, m: Int)
      : Map[Long, (Long, Long, Int)] = {
    val image = BloomFilter.bits(members.toDF("k"), "k", k, m)
    BloomFilter.mightContain(probes.toDF("k"), "k", image, k, m)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getInt(3))))
      .toMap
  }

  test("no false negatives, definitive absence on a roomy filter") {
    val members = (1L to 100L).toSeq
    val out = verdicts(members, 1L to 400L, k = 4, m = 65536)
    members.foreach(k => assert(out(k)._3 == 1, s"false negative on $k"))
    // with 400 bits set of 65536, most non-members must come back definite-no
    val absent = (101L to 400L).count(k => out(k)._3 == 0)
    assert(absent > 250, s"only $absent definitive-absent of 300")
  }

  test("no false negatives even on a saturated filter (tiny m)") {
    val members = (1L to 500L).toSeq
    val out = verdicts(members, members, k = 4, m = 64)
    members.foreach(k => assert(out(k)._3 == 1, s"false negative on $k"))
  }

  test("per-key positions are DISTINCT bits; image is bounded by m") {
    val image = BloomFilter.bits((1L to 2000L).toDF("k"), "k", k = 8, m = 256)
    val bitsSet = image.collect().map(_.getInt(0))
    assert(bitsSet.length == bitsSet.distinct.length)
    assert(bitsSet.forall(b => b >= 0 && b < 256))
    assert(bitsSet.length <= 256)
    // n_hit can never exceed n_positions, and n_positions <= k
    val out = verdicts((1L to 50L).toSeq, 1L to 80L, k = 8, m = 256)
    out.values.foreach { case (np, nh, _) =>
      assert(np >= 1 && np <= 8 && nh <= np)
    }
  }

  test("nulls are skipped on both sides") {
    val members = Seq(Some(1L), None, Some(2L)).toDF("k")
    val image = BloomFilter.bits(members, "k", 4, 1024)
    val probes = Seq(Some(1L), None, Some(9L)).toDF("k")
    val out = BloomFilter.mightContain(probes, "k", image, 4, 1024)
      .collect().map(r => r.getLong(0) -> r.getInt(3)).toMap
    assert(out.keySet == Set(1L, 9L))
    assert(out(1L) == 1)
  }

  test("partition invariance") {
    val members = (1L to 300L).toDF("k")
    def run(df: org.apache.spark.sql.DataFrame) =
      BloomFilter.bits(df, "k", 4, 2048).collect().map(_.getInt(0)).toSet
    assert(run(members) == run(members.repartition(17)) && run(members).nonEmpty)
  }

  test("prefilterJoin: result equals the plain join and rows were pruned") {
    val big = (1L to 10000L).map(k => (k, s"row$k")).toDF("k", "payload")
    val small = (1L to 10000L).filter(_ % 211 == 0).map(k => (k, s"dim$k"))
      .toDF("k", "tag")
    val plain = big.join(small, Seq("k"), "inner")
      .collect().map(_.mkString("|")).sorted.toSeq
    val viaBloom = BloomFilter.prefilterJoin(big, small, "k", k = 4, m = 65536)
      .collect().map(_.mkString("|")).sorted.toSeq
    assert(viaBloom == plain)
    // pruning is real: a roomy filter keeps ~matches + tiny fp tail,
    // far below the 10k input
    val kept = BloomFilter.prefilter(big, "k",
      BloomFilter.bits(small, "k", 4, 65536), 4, 65536).count()
    assert(kept >= small.count() && kept < 1000,
      s"prefilter kept $kept of 10000")
  }

  test("prefilter drops null keys (inner-equi-join semantics)") {
    val big = Seq(Some(5L), None, Some(7L)).toDF("k")
    val bitsDf = BloomFilter.bits(Seq(5L).toDF("k"), "k")
    val kept = BloomFilter.prefilter(big, "k", bitsDf).collect()
    assert(kept.forall(!_.isNullAt(0)), "a null key survived the prefilter")
    assert(kept.map(_.getLong(0)).contains(5L))
  }

  test("validation") {
    val df = Seq(1L).toDF("k")
    intercept[IllegalArgumentException](BloomFilter.bits(df, "k", k = 0, m = 64))
    intercept[IllegalArgumentException](BloomFilter.bits(df, "k", k = 4, m = 100))
    intercept[IllegalArgumentException](
      BloomFilter.mightContain(df, "k", df.toDF("bit"), k = 4, m = 100))
  }
}
