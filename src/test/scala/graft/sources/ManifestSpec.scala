package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** File-level data skipping: fewer files scanned for a narrow range with
  * result equality, conservative fallbacks (missing/stale manifest),
  * null-stats files always kept, and manifest invisibility to plain
  * readers.
  */
class ManifestSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestBase.spark
  import spark.implicits._

  private def table = (1 to 10000)
    .map(i => (i.toLong, s"row$i", i % 97))
    .toDF("k", "s", "g")

  private def tmp() =
    java.nio.file.Files.createTempDirectory("graft-manifest").toString + "/t"

  private def collectKs(df: org.apache.spark.sql.DataFrame) =
    df.select("k").collect().map(_.getLong(0)).sorted.toSeq

  test("narrow range reads a strict subset of files, result-exact") {
    val path = tmp()
    Manifest.writeWithManifest(table, path, Seq("k"), nFiles = 8)
    val (df, rep) = Manifest.readSkipping(spark, path, "k", 2000L, 2500L)
    assert(!rep.stale)
    assert(rep.filesTotal == 8)
    assert(rep.filesRead < rep.filesTotal,
      s"no skipping happened: $rep")
    assert(collectKs(df) == (2000L to 2500L))
  }

  test("full-range keeps all files; disjoint range reads none") {
    val path = tmp()
    Manifest.writeWithManifest(table, path, Seq("k"), nFiles = 4)
    val (all, repAll) = Manifest.readSkipping(spark, path, "k", 1L, 10000L)
    assert(repAll.filesRead == repAll.filesTotal)
    assert(all.count() == 10000L)
    val (none, repNone) = Manifest.readSkipping(spark, path, "k", 50000L, 60000L)
    assert(repNone.filesRead == 0)
    assert(none.count() == 0L)
    assert(none.columns.toSeq == table.columns.toSeq)
  }

  test("missing manifest falls back to a full scan, still correct") {
    val path = tmp()
    table.write.parquet(path) // no manifest
    val (df, rep) = Manifest.readSkipping(spark, path, "k", 10L, 20L)
    assert(rep.stale && rep.filesRead == rep.filesTotal)
    assert(collectKs(df) == (10L to 20L))
  }

  test("stale manifest (file set changed) falls back, never mis-skips") {
    val path = tmp()
    Manifest.writeWithManifest(table, path, Seq("k"), nFiles = 4)
    // out-of-band append: new rows beyond every manifest envelope
    (20001L to 20050L).map(i => (i, s"x$i", 0)).toDF("k", "s", "g")
      .write.mode("append").parquet(path)
    val (df, rep) = Manifest.readSkipping(spark, path, "k", 20001L, 20050L)
    assert(rep.stale, "stale manifest not detected")
    assert(collectKs(df) == (20001L to 20050L),
      "rows written after the manifest were lost")
    // refresh repairs skipping
    Manifest.refreshManifest(spark, path, Seq("k"))
    val (df2, rep2) = Manifest.readSkipping(spark, path, "k", 20001L, 20050L)
    assert(!rep2.stale && rep2.filesRead < rep2.filesTotal)
    assert(collectKs(df2) == (20001L to 20050L))
  }

  test("files with null stats are always kept") {
    val path = tmp()
    val withNulls = (1 to 100).map(i => (Option(i.toLong).filter(_ => i > 50),
      s"r$i")).toDF("k", "s")
    Manifest.writeWithManifest(withNulls, path, Seq("k"), nFiles = 2)
    val (df, rep) = Manifest.readSkipping(spark, path, "k", 60L, 70L)
    assert(collectKs(df) == (60L to 70L))
    assert(rep.filesRead >= 1)
  }

  test("plain readers are unaffected by the underscore manifest dir") {
    val path = tmp()
    Manifest.writeWithManifest(table, path, Seq("k"), nFiles = 4)
    assert(spark.read.parquet(path).count() == 10000L)
  }

  test("string range columns skip too") {
    val path = tmp()
    val strs = ('a' to 'z').flatMap(c => (1 to 100).map(i => (s"$c$i", i)))
      .toDF("name", "v")
    Manifest.writeWithManifest(strs, path, Seq("name"), nFiles = 6)
    val (df, rep) = Manifest.readSkipping(spark, path, "name", "b", "c")
    assert(rep.filesRead < rep.filesTotal)
    val expect = strs.filter(col("name") >= "b" && col("name") <= "c")
      .collect().map(_.getString(0)).sorted.toSeq
    assert(df.collect().map(_.getString(0)).sorted.toSeq == expect)
  }

  test("bloom skipping: point lookup on an UNSORTED column prunes files") {
    val path = tmp()
    // layout sorted by k; lookups go by g-ish high-cardinality id that the
    // min/max envelope cannot prune (every file spans the id space)
    val wide = (1 to 8000).map(i => (i.toLong, (i * 7919L) % 100000L))
      .toDF("k", "id")
    Manifest.writeWithManifest(wide, path, Seq("k"), nFiles = 8)
    Manifest.refreshManifest(spark, path, Seq("k"), bloomCols = Seq("id"))
    val key = (42L * 7919L) % 100000L // present in exactly one file region
    val (df, rep) = Manifest.readSkippingEquals(spark, path, "id", key)
    assert(!rep.stale)
    assert(rep.filesRead < rep.filesTotal) // real pruning happened
    assert(df.collect().map(_.getLong(0)).toSeq == Seq(42L)) // result exact
    // absent key: typically zero files, never a wrong row
    val (df2, rep2) = Manifest.readSkippingEquals(spark, path, "id", 99999999L)
    assert(df2.count() == 0 && rep2.filesRead <= rep2.filesTotal)
  }

  test("bloom skipping: no false negatives across every present key") {
    val path = tmp()
    val rows = (1 to 2000).map(i => (i.toLong, (i * 104729L) % 65536L))
      .toDF("k", "id")
    Manifest.writeWithManifest(rows, path, Seq("k"), nFiles = 5)
    Manifest.refreshManifest(spark, path, Seq("k"), bloomCols = Seq("id"))
    // every 83rd present key must be found despite pruning
    (1 to 2000 by 83).foreach { i =>
      val key = (i * 104729L) % 65536L
      val (df, _) = Manifest.readSkippingEquals(spark, path, "id", key)
      assert(df.filter(col("k") === i.toLong).count() == 1,
        s"lost row $i for key $key")
    }
  }

  test("bloom skipping: missing bloom column or manifest falls back whole") {
    val path = tmp()
    Manifest.writeWithManifest(table, path, Seq("k"), nFiles = 4)
    // manifest exists but has no bloom for "g"
    val (df, rep) = Manifest.readSkippingEquals(spark, path, "g", 7L)
    assert(rep.stale && rep.filesRead == rep.filesTotal)
    assert(df.count() == table.filter(col("g") === 7).count())
  }
}
