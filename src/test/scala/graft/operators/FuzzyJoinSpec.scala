package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** PassJoin-style edit-distance self-join: exact parity with a brute-force
  * DP oracle on random strings (the completeness proof of the segment
  * filter), short-string band behavior, distinct-first semantics, the
  * equi-join plan shape, and partition invariance.
  */
class FuzzyJoinSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestBase.spark
  import spark.implicits._

  /** Codepoint-level Levenshtein DP — the local oracle. */
  private def lev(a: String, b: String): Int = {
    val x = a.codePoints().toArray
    val y = b.codePoints().toArray
    val dp = Array.tabulate(y.length + 1)(identity)
    for (i <- 1 to x.length) {
      var prev = dp(0); dp(0) = i
      for (j <- 1 to y.length) {
        val cur = dp(j)
        dp(j) = math.min(math.min(dp(j) + 1, dp(j - 1) + 1),
          prev + (if (x(i - 1) == y(j - 1)) 0 else 1))
        prev = cur
      }
    }
    dp(y.length)
  }

  private def brute(strs: Seq[String], d: Int): Set[(String, String, Int)] =
    (for {
      a <- strs.distinct; b <- strs.distinct
      if a < b
      dist = lev(a, b)
      if dist >= 1 && dist <= d
    } yield (a, b, dist)).toSet

  private def run(strs: Seq[String], d: Int): Set[(String, String, Int)] =
    FuzzyJoin.editDistancePairs(strs.toDF("s"), "s", d)
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet

  test("jaroWinkler reproduces the textbook values bit-for-bit") {
    // expected doubles pinned against DuckDB's jaro_winkler_similarity
    assert(FuzzyJoin.jaroWinkler("MARTHA", "MARHTA") == 0.9611111111111111)
    assert(FuzzyJoin.jaroWinkler("DIXON", "DICKSONX") == 0.8133333333333332)
    assert(FuzzyJoin.jaroWinkler("DWAYNE", "DUANE") == 0.8400000000000001)
    assert(FuzzyJoin.jaroWinkler("ABCVWXYZ", "CABVWXYZ") == 0.9583333333333334)
    assert(FuzzyJoin.jaroWinkler("A", "B") == 0.0)
    assert(FuzzyJoin.jaroWinkler("AB", "BA") == 0.0) // window excludes both
    assert(FuzzyJoin.jaroWinkler("same", "same") == 1.0)
    assert(FuzzyJoin.jaroWinkler("", "x") == 0.0)
  }

  test("jaroWinkler is symmetric and bounded") {
    val ws = Seq("kitten", "sitting", "a", "", "abcd", "dcba", "aabbcc")
    for (a <- ws; b <- ws) {
      val s = FuzzyJoin.jaroWinkler(a, b)
      assert(s >= 0.0 && s <= 1.0)
      assert(s == FuzzyJoin.jaroWinkler(b, a))
    }
  }

  test("jaroWinklerPairs: distinct-first, threshold, vocabulary guard") {
    import spark.implicits._
    val df = (Seq.fill(50)("martha") ++ Seq.fill(30)("marhta") ++
      Seq("zzzz")).toDF("s")
    val out = FuzzyJoin.jaroWinklerPairs(df, "s", 0.9).collect()
    assert(out.length == 1)
    assert(out.head.getString(0) == "marhta" && out.head.getString(1) == "martha")
    assert(out.head.getDouble(2) == 0.961111)
    intercept[IllegalArgumentException] {
      FuzzyJoin.jaroWinklerPairs(df, "s", 0.9, maxVocab = 2).collect()
    }
  }

  test("segmentation covers the string in k contiguous non-empty pieces") {
    for (l <- 1 to 20; k <- 1 to math.min(l, 5)) {
      val segs = FuzzyJoin.segmentation(l, k)
      assert(segs.length == k)
      assert(segs.head._1 == 0)
      assert(segs.map(_._2).sum == l)
      assert(segs.forall(_._2 >= 1))
      segs.sliding(2).foreach {
        case Array((s1, l1), (s2, _)) => assert(s2 == s1 + l1)
        case _ =>
      }
    }
  }

  test("parity with brute force: random short strings, d = 1, 2, 3") {
    val rnd = new scala.util.Random(7)
    val strs = (1 to 80).map(_ =>
      (0 until rnd.nextInt(10)).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString)
      .filter(_.nonEmpty).distinct
    for (d <- 1 to 3) {
      assert(run(strs, d) == brute(strs, d), s"mismatch at d=$d")
    }
    assert(brute(strs, 2).nonEmpty) // the fixture actually exercises pairs
  }

  test("parity on realistic tokens including transposition-like typos") {
    val strs = Seq("kitten", "sitten", "sitting", "mitten", "widget",
      "widgte", "wigdet", "blue bolt", "blue bot", "blue colt", "red bolt")
    for (d <- 1 to 4) assert(run(strs, d) == brute(strs, d), s"d=$d")
  }

  test("short band: strings of length <= d pair with everything near them") {
    val strs = Seq("", "a", "b", "ab", "abc", "abcd")
    for (d <- 1 to 3) {
      // empty string is null-ish but still a value; distance to "a" is 1
      assert(run(strs, d) == brute(strs, d), s"d=$d")
    }
  }

  test("surrogate pairs: candidate generation is codepoint-safe") {
    val clef = new String(Character.toChars(0x1D11E)) // musical G clef
    val strs = Seq(s"ab${clef}cd", "abcd", s"ab${clef}ce", s"${clef}${clef}")
    for (d <- 1 to 2) assert(run(strs, d) == brute(strs, d), s"d=$d")
  }

  test("distinct-first: duplicated input rows do not duplicate pairs") {
    val strs = Seq.fill(50)("abc") ++ Seq.fill(30)("abd") ++ Seq("xyz")
    val got = run(strs, 1)
    assert(got == Set(("abc", "abd", 1)))
  }

  test("nulls are dropped; non-string column is cast") {
    val df = Seq(Some(11), None, Some(12), Some(121)).toDF("s")
    val got = FuzzyJoin.editDistancePairs(df, "s", 1)
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    assert(got == Set(("11", "12", 1), ("11", "121", 1), ("12", "121", 1)))
  }

  test("maxDist bounds are enforced") {
    val df = Seq("a").toDF("s")
    intercept[IllegalArgumentException](FuzzyJoin.editDistancePairs(df, "s", 0))
    intercept[IllegalArgumentException](FuzzyJoin.editDistancePairs(df, "s", 5))
  }

  test("plan: equi-join on segment signatures, no cartesian/nested loop") {
    val df = Seq("abcdef", "abcdeg", "zzzzzz").toDF("s")
    val plan = FuzzyJoin.editDistancePairs(df, "s", 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }

  test("partition invariance") {
    val rnd = new scala.util.Random(13)
    val strs = (1 to 60).map(_ =>
      (0 until (1 + rnd.nextInt(8))).map(_ => ('a' + rnd.nextInt(4)).toChar).mkString)
    val df = strs.toDF("s")
    val a = FuzzyJoin.editDistancePairs(df.repartition(1), "s", 2)
      .collect().map(_.toSeq).toSet
    val b = FuzzyJoin.editDistancePairs(df.repartition(7), "s", 2)
      .collect().map(_.toSeq).toSet
    assert(a == b)
  }

  test("sortedNeighborhoodPairs equals the brute-force rank-window pairing") {
    import spark.implicits._
    val strs = Seq("alpha", "alphb", "alpha", "beta", "betas", "betaz",
      "gamma", "gamme", "zeta")
    val df = strs.toDF("s")
    val got = FuzzyJoin.sortedNeighborhoodPairs(df, "s", windowSize = 2,
      minSim = 0.85).collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2))).toSet
    val vocab = strs.distinct.sorted
    val expected = (for {
      i <- vocab.indices; j <- (i + 1) to math.min(i + 2, vocab.size - 1)
      jw = FuzzyJoin.jaroWinkler(vocab(i), vocab(j)) if jw >= 0.85
    } yield (vocab(i), vocab(j),
      BigDecimal(jw).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)).toSet
    assert(got == expected)
    assert(got.nonEmpty)
  }

  test("sortedNeighborhoodPairs is partition-invariant") {
    import spark.implicits._
    val df = (1 to 500).map(i => f"name$i%04d").toDF("s")
    val a = FuzzyJoin.sortedNeighborhoodPairs(df.repartition(1), "s", 3, 0.9)
      .collect().map(_.toSeq).toSet
    val b = FuzzyJoin.sortedNeighborhoodPairs(df.repartition(11), "s", 3, 0.9)
      .collect().map(_.toSeq).toSet
    assert(a == b)
  }
}
