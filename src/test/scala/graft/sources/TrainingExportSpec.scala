package graft.sources

import java.nio.file.Files

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TrainingExportSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def corpus = {
    import spark.implicits._
    (1L to 40L).map { i =>
      val words = 1 + (i % 7).toInt
      (i, s"src${i % 3}", Seq.fill(words)(s"w$i").mkString(" "))
    }.toDF("doc_id", "source", "text")
  }

  test("jsonl shards round-trip: every doc exactly once, budget respected") {
    val dir = Files.createTempDirectory("texport").toFile
    try {
      val nShards = TrainingExport.exportCorpus(
        corpus, "doc_id", "text", "source", tokenBudget = 10L,
        path = dir.getAbsolutePath)
      assert(nShards > 3) // 3 groups, >1 bin each at this budget

      val back = TrainingExport.readJsonlShards(spark, dir.getAbsolutePath)
        .select(from_json(col("value"),
          org.apache.spark.sql.types.StructType.fromDDL("doc_id LONG, text STRING")).as("j"))
        .select(col("j.doc_id"), col("j.text"))
      val rows = back.collect().map(r => r.getLong(0) -> r.getString(1))
      // exactly once, content intact
      assert(rows.length == 40)
      assert(rows.map(_._1).toSet == (1L to 40L).toSet)
      val orig = corpus.collect().map(r => r.getLong(0) -> r.getString(2)).toMap
      rows.foreach { case (id, text) => assert(text == orig(id)) }
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(dir)
    }
  }

  test("shard token mass stays within budget except unsplittable docs") {
    val dir = Files.createTempDirectory("texport2").toFile
    try {
      TrainingExport.exportCorpus(corpus, "doc_id", "text", "source",
        tokenBudget = 10L, path = dir.getAbsolutePath)
      // recompute shard token sums from the files themselves
      val sums = spark.read.format("text")
        .option("pathGlobFilter", "part-*").load(dir.getAbsolutePath + "/shard=*")
        .select(input_file_name().as("f"), col("value"))
        .withColumn("toks", size(split(
          get_json_object(col("value"), "$.text"), "\\s+")))
        .withColumn("shard", regexp_extract(col("f"), "shard=([^/]+)", 1))
        .groupBy("shard").agg(sum("toks").as("mass"), count(lit(1)).as("n"))
        .collect()
      assert(sums.nonEmpty)
      sums.foreach { r =>
        val mass = r.getAs[Long]("mass")
        // a bin's mass exceeds budget only via its LAST straddling doc
        // (exclusive prefix semantics) — docs are <= 7 tokens here
        assert(mass <= 10L + 7L, s"shard ${r.getString(0)} mass $mass")
      }
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(dir)
    }
  }

  test("re-export of the same snapshot is byte-identical") {
    val d1 = Files.createTempDirectory("texport3a").toFile
    val d2 = Files.createTempDirectory("texport3b").toFile
    def slurp(dir: java.io.File): Map[String, String] = {
      val base = dir.toPath
      import scala.jdk.CollectionConverters._
      Files.walk(base).iterator().asScala
        .filter(p => Files.isRegularFile(p) && p.getFileName.toString.startsWith("part-"))
        .map(p => base.relativize(p).getParent.toString ->
          new String(Files.readAllBytes(p), java.nio.charset.StandardCharsets.UTF_8))
        .toMap
    }
    try {
      TrainingExport.exportCorpus(corpus, "doc_id", "text", "source", 10L,
        d1.getAbsolutePath)
      TrainingExport.exportCorpus(corpus.repartition(13), "doc_id", "text",
        "source", 10L, d2.getAbsolutePath)
      val a = slurp(d1)
      val b = slurp(d2)
      assert(a.keySet == b.keySet)
      a.keys.foreach(k => assert(a(k) == b(k), s"shard dir $k differs"))
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(d1)
      org.apache.commons.io.FileUtils.deleteDirectory(d2)
    }
  }

  test("overwrite guard: re-export over a previous export OK, foreign data refused") {
    import java.nio.file.Files
    val dir = Files.createTempDirectory("graft-export-guard").toFile
    try {
      val path = dir.getAbsolutePath
      TrainingExport.exportCorpus(corpus, "doc_id", "text", "source", 10L, path)
      // a second export over the first succeeds (the wipe-then-write path)
      val n = TrainingExport.exportCorpus(corpus, "doc_id", "text", "source", 10L, path)
      assert(n > 0)
      // unrelated data in the target dir must fail loudly, not be deleted
      val foreign = new java.io.File(dir, "precious.txt")
      Files.write(foreign.toPath, "do not lose me".getBytes)
      val e = intercept[IllegalArgumentException](
        TrainingExport.exportCorpus(corpus, "doc_id", "text", "source", 10L, path))
      assert(e.getMessage.contains("precious.txt"))
      assert(foreign.exists, "guard must not have deleted anything")
    } finally org.apache.commons.io.FileUtils.deleteDirectory(dir)
  }

  test("overwrite guard: a crashed export's staging debris self-heals") {
    import java.nio.file.Files
    val dir = Files.createTempDirectory("graft-export-crash").toFile
    try {
      val path = dir.getAbsolutePath
      TrainingExport.exportCorpus(corpus, "doc_id", "text", "source", 10L, path)
      // simulate a killed run: FileOutputCommitter staging left behind,
      // _SUCCESS missing (a completed marker would hide the crash anyway)
      new java.io.File(dir, "_temporary/0").mkdirs()
      new java.io.File(dir, "_SUCCESS").delete()
      Files.write(new java.io.File(dir, "_started_12345").toPath, Array.empty[Byte])
      val n = TrainingExport.exportCorpus(corpus, "doc_id", "text", "source", 10L, path)
      assert(n > 0, "re-run over crash debris must recover, not refuse")
      assert(!new java.io.File(dir, "_temporary").exists)
    } finally org.apache.commons.io.FileUtils.deleteDirectory(dir)
  }

  test("permissive JSONL: malformed and schema-violating lines quarantine") {
    import org.apache.spark.sql.types._
    val dir = Files.createTempDirectory("graft-jsonl")
    val f = dir.resolve("part-0.jsonl")
    Files.write(f, java.util.Arrays.asList(
      """{"doc_id": 1, "text": "good one"}""",
      """{"doc_id": 2, "text": "also fine"}""",
      """{"doc_id": "NOT A NUMBER", "text": "type violation"}""",
      """{broken json!!""",
      """{"doc_id": 5, "text": "trailing good"}"""))
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    val parsed = TrainingExport.readJsonlPermissive(
      spark, dir.toString, schema)
    val good = parsed.filter(col("_corrupt_record").isNull)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    assert(good.toSeq == Seq((1L, "good one"), (2L, "also fine"),
      (5L, "trailing good")))
    val bad = TrainingExport.corruptLines(parsed).collect()
    assert(bad.length == 2)
    val raws = bad.map(_.getString(1)).toSet
    assert(raws.exists(_.contains("NOT A NUMBER")))
    assert(raws.exists(_.contains("broken json")))
    assert(bad.forall(_.getString(0).endsWith("part-0.jsonl")))
  }

  test("permissive JSONL round-trips the export shards") {
    val dir = Files.createTempDirectory("graft-jsonl-rt").toFile
    try {
      val path = dir.getAbsolutePath
      TrainingExport.exportCorpus(corpus, "doc_id", "text", "source", 10L, path)
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("text",
          org.apache.spark.sql.types.StringType)))
      val back = TrainingExport.readJsonlPermissive(spark, path, schema)
      assert(TrainingExport.corruptLines(back).count() == 0)
      assert(back.filter(col("_corrupt_record").isNull).count() == 40)
    } finally org.apache.commons.io.FileUtils.deleteDirectory(dir)
  }

  test("permissive JSONL refuses a schema that claims the error column") {
    intercept[IllegalArgumentException] {
      TrainingExport.readJsonlPermissive(spark, "/tmp/x",
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("_corrupt_record",
            org.apache.spark.sql.types.StringType))))
    }
  }
}
