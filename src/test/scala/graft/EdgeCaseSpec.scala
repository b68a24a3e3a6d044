package graft

import graft.functions.{GraftFunctions, MockEmbedder, TextChunker}
import graft.operators.{Dedup, VectorSearch}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Edge inputs the pipelines must survive: empty frames, k > corpus, null
  * and unicode text, zero-norm vectors.
  */
class EdgeCaseSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("dedup tiers on an empty corpus return empty, not errors") {
    import spark.implicits._
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(Dedup.exactGroups(empty, col("doc_id"), col("text")).count() == 0)
    assert(Dedup.minhashCandidatePairs(empty, "doc_id", "text").count() == 0)
    assert(Dedup.simhashPairs(empty, "doc_id", "text").count() == 0)
    assert(Dedup.ngramJaccardPairs(empty.withColumn("b", lit(1)),
      "doc_id", "text", Seq("b")).count() == 0)
  }

  test("topK with k larger than the corpus returns the whole corpus ranked") {
    import spark.implicits._
    val df = Seq((1L, MockEmbedder.embed("a", 8)), (2L, MockEmbedder.embed("b", 8)))
      .toDF("id", "vector")
    val hits = VectorSearch.topK(df, "vector", MockEmbedder.embed("a", 8), k = 10)
    assert(hits.count() == 2)
  }

  test("null and unicode text flow through text functions") {
    import spark.implicits._
    val df = Seq(
      (1L, null.asInstanceOf[String]),
      (2L, "héllo wörld — ünïcode ¡text! 中文 🙂"),
      (3L, "")).toDF("doc_id", "text")
    val r = df.select(
      col("doc_id"),
      GraftFunctions.mockEmbed(col("text"), 8).as("v"),
      GraftFunctions.minhashTextUdf(col("text"), lit(3)).as("sig"),
      GraftFunctions.langIdUdf(col("text")).as("lang")).collect()
    assert(r.length == 3)
    assert(r.forall(_.getAs[scala.collection.Seq[Float]]("v").length == 8))
    // unicode chunking: chunk boundaries respect char indexing
    val chunks = TextChunker.chunkSentenceAware("中文句子。 " * 100, chunkSize = 50, overlap = 10)
    assert(chunks.nonEmpty)
    assert(chunks.forall(_.nonEmpty))
  }

  test("zero-norm vectors score 0, never NaN") {
    import spark.implicits._
    val df = Seq((1L, Array(0.0f, 0.0f, 0.0f))).toDF("id", "vector")
    val hits = VectorSearch.topK(df, "vector", Array(1.0f, 0.0f, 0.0f), k = 1)
      .collect()
    assert(hits.head.getAs[Double]("score") == 0.0)
  }

  test("1MB document chunks in linear time with full coverage") {
    val big = ("The quick brown fox jumps over the lazy dog. " * 23000) // ~1MB
    val t0 = System.nanoTime()
    val chunks = TextChunker.chunkSentenceAware(big)
    val secs = (System.nanoTime() - t0) / 1e9
    assert(chunks.length > 1000)
    assert(chunks.forall(c => c.nonEmpty && c.length <= 1000))
    assert(secs < 10.0, s"chunking 1MB took ${secs}s") // linear, not quadratic
  }

  test("chunker handles text of exactly chunkSize and chunkSize+1") {
    val at = "x" * 1000
    assert(TextChunker.chunkSentenceAware(at) == Seq(at))
    val over = "x" * 1001
    val chunks = TextChunker.chunkNaive(over)
    assert(chunks.map(_.length).sum >= 1001)
  }
}
