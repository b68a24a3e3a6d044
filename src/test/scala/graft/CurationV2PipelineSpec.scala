package graft

import graft.operators.{Curate, Dedup, IvfIndex, TextClassifier, VectorSearch}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end "curation v2" composing the round-7 pieces on top of the
  * established pipeline: train a quality classifier on a labeled slice →
  * segment dedup → Curate (exact dedup + classifier gate) → semantic dedup
  * over embedding cells. Each operator is individually specced and oracled;
  * this proves the column contracts line up across the new stages and that
  * every tier drops exactly its own victims.
  */
class CurationV2PipelineSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("labeled slice → classifier → segment dedup → curate gate → semantic dedup") {
    import spark.implicits._

    // 1. train the quality filter on a small labeled slice
    val labeled = (0 until 40).map { i =>
      if (i % 2 == 0) (1000L + i, "insightful prose with varied words here", 1)
      else (1000L + i, "spam spam spam buy now spam", 0)
    }.toDF("doc_id", "text", "y")
    val model = TextClassifier.train(
      TextClassifier.hashedFeatures(labeled, "doc_id", "text", "y", dim = 32),
      dim = 32, iters = 8, lr = 2.0)

    // 2. the incoming corpus: quality docs, spam, a repeated boilerplate
    //    span, an exact dup pair. The boilerplate is exactly one 5-token
    //    segment and LEADS both docs — fixed-window segment dedup is
    //    alignment-sensitive by design (the production framing dedups
    //    naturally-aligned units like lines; q2g covers that tier)
    val boiler = "subscribe to our newsletter today"
    val corpus = Seq(
      (1L, s"$boiler insightful prose with varied words", "s0"),
      (2L, s"$boiler more insightful varied prose here", "s0"),
      (3L, "spam spam spam buy now spam", "s1"),             // classifier victim
      (4L, "unique insightful varied detailed prose", "s1"),
      (5L, "unique insightful varied detailed prose", "s1"), // exact dup of 4
      (6L, "another insightful varied prose piece", "s0")
    ).toDF("doc_id", "text", "source")

    // 3. corpus-wide segment dedup first (the sub-document tier): doc 2's
    //    copy of the boilerplate span must vanish while its own words stay
    val segged = Dedup.dedupSegments(corpus, col("doc_id"), col("text"), segTokens = 5)
      .select(col("id").as("doc_id"), col("clean_text").as("text"))
      .join(corpus.select("doc_id", "source"), "doc_id")
      .filter(length(col("text")) > 0)
    val seg2 = segged.filter(col("doc_id") === 2L).head().getString(1)
    assert(!seg2.contains("subscribe"), s"boilerplate span must be deduped: $seg2")
    assert(seg2.contains("insightful"), "doc 2 keeps its own segment")

    // 4. exact dedup + the trained classifier gate inside Curate
    val curated = Curate.run(segged, "doc_id", "text", "source",
      cfg = Curate.Config(nearDupMinJaccard = None,
        classifierGate = Some((model, 0.5))))
    val ids = curated.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(!ids.contains(3L), "spam must fall to the classifier gate")
    assert(!ids.contains(5L), "exact dup must fall to exact_dedup")
    assert(ids.contains(1L) && ids.contains(4L) && ids.contains(6L))

    // 5. semantic dedup over embedding cells (mock embeddings of the
    //    curated text): survivors of a same-cell near-dup keep the min id
    val emb = curated.withColumn("embedding",
      graft.functions.GraftFunctions.mockEmbed(col("text"), 16))
    val idx = IvfIndex.centroidsByDraw(emb, "doc_id", "embedding", nCells = 2)
    val survivors = VectorSearch.semanticDedup(
      IvfIndex.assign(emb, "embedding", idx), "doc_id", "embedding",
      threshold = 0.999999)
    val sIds = survivors.select("doc_id").collect().map(_.getLong(0)).toSet
    // nothing here is cosine-identical, so the ultra-tight threshold keeps all
    assert(sIds === ids)
    // and a threshold of -2 collapses each cell to its min id (sanity of
    // the composition end state)
    val collapsed = VectorSearch.semanticDedup(
      IvfIndex.assign(emb, "embedding", idx), "doc_id", "embedding",
      threshold = -2.0)
    assert(collapsed.count() === collapsed.select("cell").distinct().count())
  }
}
