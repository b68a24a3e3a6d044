package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Dedup tiers over a fixture corpus with planted exact + near duplicates. */
class DedupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def fixture = {
    import spark.implicits._
    val base = (1 to 120).map(i => s"alpha$i beta$i gamma$i").mkString(" ")
    val nearDup = base.split(" ").drop(6).mkString(" ") // ~95% shingle overlap
    val unrelated1 = (1 to 120).map(i => s"delta$i epsilon$i zeta$i").mkString(" ")
    val unrelated2 = (1 to 120).map(i => s"eta$i theta$i iota$i").mkString(" ")
    Seq(
      (1L, base), (2L, base), // exact dups
      (3L, nearDup), // near dup of 1/2
      (4L, unrelated1), (5L, unrelated2)).toDF("doc_id", "text")
  }

  test("exactGroups finds the planted exact duplicate") {
    val groups = Dedup.exactGroups(fixture, col("doc_id"), col("text"))
    val dups = groups.filter(col("n_copies") > 1).collect()
    assert(dups.length == 1)
    assert(dups.head.getAs[Long]("canonical_id") == 1L)
    assert(dups.head.getAs[Long]("n_copies") == 2L)
    assert(groups.count() == 4) // 4 distinct contents
  }

  test("ngram jaccard pairs rank the near-dup at the top") {
    val withBlock = fixture.withColumn("block", lit("b"))
    val pairs = Dedup.ngramJaccardPairs(withBlock, "doc_id", "text", Seq("block"))
      .orderBy(col("jaccard").desc).collect()
    val top = pairs.head
    assert(Set(top.getAs[Long]("doc_a"), top.getAs[Long]("doc_b")) == Set(1L, 2L))
    assert(top.getAs[Double]("jaccard") == 1.0)
    val second = pairs(1)
    assert(second.getAs[Double]("jaccard") > 0.8) // near dup pair (1,3)/(2,3)
    assert(pairs.count(_.getAs[Double]("jaccard") > 0.5) == 3) // (1,2),(1,3),(2,3)
  }

  test("connectedComponents converges on a 2000-node chain (deep diameter)") {
    import spark.implicits._
    // worst case for label propagation: a single path graph — naive
    // propagation needs O(diameter) rounds; pointer jumping must finish a
    // 2000-hop chain comfortably inside maxIter=20 (~log2 rounds)
    val chain = (0L until 1999L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    // maxDriverPairs = 0 pins the DISTRIBUTED loop — this test exists to
    // prove ITS convergence, which the r12 driver fast path would bypass
    val labels = Dedup.connectedComponents(chain, maxIter = 20,
      maxDriverPairs = 0L).collect()
    assert(labels.length == 2000)
    assert(labels.forall(_.getAs[Long]("component_id") == 0L))
    // and a forest of 100 separate 20-node chains keeps components apart
    val forest = (for (c <- 0L until 100L; i <- 0L until 19L)
      yield (c * 100 + i, c * 100 + i + 1)).toDF("doc_a", "doc_b")
    val fLabels = Dedup.connectedComponents(forest, maxIter = 20,
      maxDriverPairs = 0L).collect()
    assert(fLabels.length == 2000)
    assert(fLabels.forall(r =>
      r.getAs[Long]("component_id") == (r.getAs[Long]("doc_id") / 100) * 100))
  }

  test("driver-hosted union-find (round 12) returns EXACTLY the distributed " +
      "loop's labels, and the fast path engages only under the pair bound") {
    import spark.implicits._
    // chains + stars + a dense clique + singleton-free isolation, ids
    // deliberately out of order so min-labels do real work
    val mixed = (Seq((7L, 3L), (3L, 9L), (20L, 15L), (15L, 16L), (16L, 21L)) ++
      (0 until 6).flatMap(i => (i + 1 until 6).map(j => (100L + i, 100L + j))) ++
      Seq((55L, 54L))).toDF("doc_a", "doc_b")
    val dist = Dedup.connectedComponents(mixed, maxIter = 20, maxDriverPairs = 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val drv = Dedup.connectedComponents(mixed, maxIter = 20)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(drv == dist, s"driver union-find diverged: ${drv diff dist} / ${dist diff drv}")
    // the deep chain agrees too (path-halving vs pointer-jumping)
    val chain2 = (0L until 500L).map(i => (i + 1, i)).toDF("doc_a", "doc_b")
    assert(Dedup.connectedComponents(chain2).collect()
      .forall(_.getAs[Long]("component_id") == 0L))
    // non-long ids (string docs) always take the distributed loop
    val strPairs = Seq(("a", "b"), ("b", "c")).toDF("doc_a", "doc_b")
    val strLabels = Dedup.connectedComponents(strPairs).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(strLabels == Set(("a", "a"), ("b", "a"), ("c", "a")))
  }

  test("blank documents produce no jaccard pairs (no NaN, no phantom clusters)") {
    import spark.implicits._
    val docs = Seq(
      (1L, "same near dup text body here same near dup text"),
      (2L, "same near dup text body here same near dup text"),
      (3L, ""), (4L, "   "), (5L, "\t\n")) // blank: must pair with nothing
      .toDF("doc_id", "text").withColumn("block", lit("b"))
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text", Seq("block")).collect()
    assert(pairs.length == 1)
    assert(Set(pairs.head.getAs[Long]("doc_a"), pairs.head.getAs[Long]("doc_b")) == Set(1L, 2L))
    assert(!pairs.exists(r => r.getAs[Double]("jaccard").isNaN))
  }

  test("minhash LSH candidates cover all high-jaccard pairs, skip unrelated") {
    val cands = Dedup.minhashCandidatePairs(fixture, "doc_id", "text",
      minEstJaccard = 0.5).collect()
    val pairSet = cands.map(r =>
      Set(r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    assert(pairSet.contains(Set(1L, 2L)))
    assert(pairSet.contains(Set(1L, 3L)))
    assert(pairSet.contains(Set(2L, 3L)))
    assert(!pairSet.exists(_.contains(4L)))
    assert(!pairSet.exists(_.contains(5L)))
    // exact-dup pair estimates 1.0
    val exact = cands.find(r =>
      Set(r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) == Set(1L, 2L)).get
    assert(exact.getAs[Double]("est_jaccard") == 1.0)
  }

  test("connected components turn pairs into transitive clusters + drop set") {
    import spark.implicits._
    // chain 1-2, 2-3 (one cluster) and 10-11 (another); 99 untouched
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("doc_a", "doc_b")
    val comps = Dedup.connectedComponents(pairs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("component_id")).toMap
    assert(comps == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
    val drops = Dedup.dropSet(pairs).collect().map(_.getLong(0)).toSet
    assert(drops == Set(2L, 3L, 11L))
  }

  test("connected components: a 30-node chain converges (lineage bounded)") {
    import spark.implicits._
    // previously OOM'd (exponential plan growth) / silently mislabeled
    val pairs = (1L until 30L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val comps = Dedup.connectedComponents(pairs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("component_id"))
    assert(comps.length == 30)
    assert(comps.forall(_._2 == 1L)) // one component, min id everywhere
  }

  test("end-to-end near-dedup: pairs → clusters → surviving corpus") {
    val pairs = Dedup.minhashCandidatePairs(fixture, "doc_id", "text",
      minEstJaccard = 0.5)
    val drops = Dedup.dropSet(pairs)
    val survivors = fixture.join(drops.withColumnRenamed("doc_id", "d"),
      col("doc_id") === col("d"), "left_anti")
    // docs 1,2,3 are one near-dup cluster → only doc 1 survives; 4,5 kept
    val ids = survivors.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids == Set(1L, 4L, 5L))
  }

  test("passage overlap pairs: a copied paragraph links low-Jaccard docs") {
    import spark.implicits._
    val passage = (1 to 40).map(i => s"quoted$i boiler$i plate$i").mkString(" ")
    def body(tag: String) = (1 to 80).map(i => s"$tag$i own$tag$i").mkString(" ")
    val docs = Seq(
      (1L, body("aa") + " " + passage), // shares ONLY the embedded passage
      (2L, passage + " " + body("bb")),
      (3L, body("cc")), // no passage
      (4L, body("dd")))
      .toDF("doc_id", "text")
    // whole-doc similarity is low (distinct 120-word bodies) but the copied
    // passage produces many shared winnowing minima
    val pairs = Dedup.passageOverlapPairs(docs, "doc_id", "text",
      minShared = 8, maxDocsPerFp = 20)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.map(p => (p._1, p._2)).toSet == Set((1L, 2L)))
    assert(pairs.head._3 >= 8) // the passage contributes a block of minima
    // sanity: the same docs do NOT meet a 0.5 whole-doc Jaccard bar
    val whole = Dedup.ngramJaccardPairs(
      docs.withColumn("blk", lit(1)), "doc_id", "text", Seq("blk"))
      .filter(col("jaccard") >= 0.5)
    assert(whole.count() == 0)
    // ubiquitous fingerprints are capped out: with every doc sharing the
    // passage and the cap below the corpus size, no pair survives
    val all = Seq.tabulate(5)(i => (i.toLong, passage)).toDF("doc_id", "text")
    assert(Dedup.passageOverlapPairs(all, "doc_id", "text",
      minShared = 1, maxDocsPerFp = 4).count() == 0)
  }

  test("dedupSegments: first occurrence survives corpus-wide, docs reassemble in order") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d e f"),        // segments: "a b c", "d e f"
      (2L, "d e f g h i"),        // "d e f" dups doc 1's second segment
      (3L, "a b c"),              // fully duplicated -> empty
      (4L, "x y"),                // short tail segment, unique
      (5L, "")                    // no tokens at all
    ).toDF("doc_id", "text")
    val out = Dedup.dedupSegments(docs, col("doc_id"), col("text"), segTokens = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(1L) === (("a b c d e f", 2L, 0L)))
    assert(out(2L) === (("g h i", 1L, 1L)))
    assert(out(3L) === (("", 0L, 1L)))
    assert(out(4L) === (("x y", 1L, 0L)))
    assert(out(5L) === (("", 0L, 0L)))
  }

  test("dedupSegments: intra-doc repeats collapse too, and order is positional") {
    import spark.implicits._
    // same segment twice inside one doc: the earlier index wins
    val docs = Seq((7L, "p q r p q r s t u")).toDF("doc_id", "text")
    val out = Dedup.dedupSegments(docs, col("doc_id"), col("text"), segTokens = 3)
      .collect().head
    assert(out.getString(1) === "p q r s t u")
    assert(out.getLong(2) === 2L)
    assert(out.getLong(3) === 1L)
  }

  test("dedupSegments: segTokens beyond every doc length degrades to whole-doc dedup") {
    import spark.implicits._
    val docs = Seq((1L, "a b c"), (2L, "a b c"), (3L, "x y")).toDF("doc_id", "text")
    val out = Dedup.dedupSegments(docs, col("doc_id"), col("text"), segTokens = 100)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(3)))).toMap
    assert(out(1L) === (("a b c", 0L)))
    assert(out(2L) === (("", 1L))) // whole doc was one segment, seen at doc 1
    assert(out(3L) === (("x y", 0L)))
  }

  test("dedupSegments is partition-invariant and window-free") {
    import spark.implicits._
    val docs = (0L until 60L).map(i => (i, s"tok${i % 7} alpha beta gamma tok${i % 5}"))
      .toDF("doc_id", "text")
    def run(parts: Int) = Dedup.dedupSegments(
      docs.repartition(parts), col("doc_id"), col("text"), segTokens = 2)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1).toSeq
    assert(run(1) === run(13))
    // the first-occurrence pick must stay a map-side-combinable aggregate:
    // a Window over the segment text would serialize corpus-wide boilerplate
    // into one partition (the label-propagation de-skew lesson)
    val plan = Dedup.dedupSegments(docs, col("doc_id"), col("text"), segTokens = 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"unexpected Window in plan:\n$plan")
  }

  test("simhash pairs find exact and near dups within hamming budget") {
    val pairs = Dedup.simhashPairs(fixture, "doc_id", "text", maxHamming = 16)
      .collect()
    val pairSet = pairs.map(r =>
      Set(r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    assert(pairSet.contains(Set(1L, 2L)))
    val exact = pairs.find(r =>
      Set(r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) == Set(1L, 2L)).get
    assert(exact.getAs[Int]("hamming") == 0)
    assert(!pairSet.exists(s => s.contains(4L) && s.contains(5L)))
  }

  test("containment catches a small doc embedded in a big one that Jaccard misses") {
    import spark.implicits._
    val big = (1 to 300).map(i => s"word$i next$i").mkString(" ")
    val small = big.split(" ").take(30).mkString(" ") // 5% of big, verbatim
    val other = (1 to 300).map(i => s"alt$i other$i").mkString(" ")
    val df = Seq((1L, big), (2L, small), (3L, other)).toDF("doc_id", "text")
      .withColumn("blk", lit(1))
    val cont = Dedup.ngramContainmentPairs(df, "doc_id", "text",
      Seq("blk"), minContainment = 0.8).collect()
    assert(cont.length == 1)
    val r = cont.head
    assert((r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) == ((1L, 2L)))
    // containment of the SMALL doc (b) in the big one is ~1; reverse tiny
    assert(r.getAs[Double]("cont_b_in_a") > 0.9)
    assert(r.getAs[Double]("cont_a_in_b") < 0.1)
    // and symmetric Jaccard would never have flagged the pair
    val jac = Dedup.ngramJaccardPairs(df, "doc_id", "text", Seq("blk"))
      .filter(col("jaccard") >= 0.5).collect()
    assert(!jac.exists(r2 => r2.getAs[Long]("doc_a") == 1L &&
      r2.getAs[Long]("doc_b") == 2L))
  }
}
