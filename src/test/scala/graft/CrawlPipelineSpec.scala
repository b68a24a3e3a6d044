package graft

import graft.operators.{Curate, DataMix}
import graft.sources.TrainingExport
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end crawl-shaped pipeline composing the round-5 pieces: URL-key
  * dedup (Curate's first stage) → content curation → per-domain weighted
  * cap → training-shard export. Each operator is individually specced and
  * oracled; this proves they COMPOSE — column contracts line up, nothing
  * double-drops, the export round-trips exactly the curated survivors.
  */
class CrawlPipelineSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("crawl corpus: url-dedup → curate → weighted domain cap → export") {
    import spark.implicits._
    val filler = "the quick brown fox jumps over the lazy dog near the river"
    // 30 crawl records over 2 domains; ids 1-3 are the SAME page spelled
    // three ways; 4 is an exact-text dup of 5 under a different URL
    val base = (6L to 30L).map { i =>
      val host = if (i % 2 == 0) "a.example.com" else "b.example.org"
      (i, s"https://$host/p$i", s"doc $i $filler ${"x" * (i % 7).toInt}",
        s"src${i % 2}")
    }
    val crawl = (Seq(
      (1L, "https://Example.com/dup?x=1", s"v1 $filler", "src1"),
      (2L, "https://example.com:443/dup?x=1&utm_source=t", s"v2 $filler", "src1"),
      (3L, "https://example.com/dup?x=1#frag", s"v3 $filler", "src1"),
      (4L, "https://a.example.com/copy", s"copied $filler", "src0"),
      (5L, "https://b.example.org/orig", s"copied $filler", "src1")
    ) ++ base).toDF("doc_id", "url", "text", "source")

    // 1-2. URL dedup + exact-text dedup via Curate (near-dup off: the
    // filler-heavy fixture would chain everything into one cluster)
    val curated = Curate.run(crawl, "doc_id", "text", "source",
      cfg = Curate.Config(nearDupMinJaccard = None, urlCol = Some("url")))
    val curatedIds = curated.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(!curatedIds.contains(2L) && !curatedIds.contains(3L),
      "URL variants of page 1 must fall to url_dedup")
    assert(curatedIds.contains(1L))
    assert(!curatedIds.contains(5L), "exact text dup must fall to exact_dedup")
    assert(curatedIds.contains(4L))

    // 3. per-domain weighted cap: at most 9 docs per source, length-biased
    val weighted = curated.withColumn("w",
      (length(col("text")) + lit(1)).cast("double"))
    val capped = DataMix.weightedCapPerGroup(
      weighted, "source", "doc_id", "w", n = 9, salt = "crawl-e2e")
    val bySource = capped.groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySource.values.forall(_ <= 9), s"cap violated: $bySource")

    // 4. shard export round-trips exactly the capped survivors
    val dir = java.nio.file.Files.createTempDirectory("crawl-e2e").toFile
    try {
      val nShards = TrainingExport.exportCorpus(
        capped, "doc_id", "text", "source", tokenBudget = 60L,
        dir.getAbsolutePath)
      assert(nShards > 0)
      val back = TrainingExport.readJsonlShards(spark, dir.getAbsolutePath)
        .select(get_json_object(col("value"), "$.doc_id").cast("long").as("doc_id"))
      assert(back.collect().map(_.getLong(0)).toSet ==
        capped.select("doc_id").collect().map(_.getLong(0)).toSet)
    } finally org.apache.commons.io.FileUtils.deleteDirectory(dir)
  }
}
