package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Incremental corpus dedup: within-batch collapse (including redelivered
  * ids), cross-batch drop via the accumulated signature store, store growth
  * only by survivors, replay-idempotent sinks.
  */
class StreamingDedupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private val base = "the quick brown fox jumps over the lazy dog and then " +
    "runs far away into the deep green forest to hide from the loud hunters"
  private def nearDup(s: String) = s.replace("quick", "swift")

  private def emptyStore = {
    import spark.implicits._
    Seq.empty[(String, Array[Long], Int, Long)]
      .toDF("doc_id", "sig", "band_idx", "band_key")
  }

  test("batch 1 collapses internal near-dups; batch 2 drops dups vs store") {
    import spark.implicits._
    // batch 1: doc 1 and 2 are near-dups of each other, 3 is distinct
    val b1 = Seq(
      (1L, base),
      (2L, nearDup(base)),
      (3L, "completely different content about spark physical plans and " +
        "shuffle exchanges in distributed query execution engines at scale"))
      .toDF("doc_id", "text")
    val (s1, rows1) = StreamingDedup.processBatch(b1, emptyStore, "doc_id", "text",
      minEstJaccard = 0.5)
    val kept1 = s1.select("doc_id").as[Long].collect().toSet
    assert(kept1 == Set(1L, 3L)) // 2 collapsed into min-id rep 1
    val store1 = rows1.cache()
    assert(store1.select("doc_id").distinct().as[String].collect().toSet == Set("1", "3"))

    // batch 2: doc 4 is a near-dup of stored doc 1; doc 5 is new
    val b2 = Seq(
      (4L, nearDup(base) + " extra"),
      (5L, "an entirely novel document describing reciprocal rank fusion " +
        "for hybrid lexical and semantic retrieval pipelines in production"))
      .toDF("doc_id", "text")
    val (s2, rows2) = StreamingDedup.processBatch(b2, store1, "doc_id", "text",
      minEstJaccard = 0.5)
    val kept2 = s2.select("doc_id").as[Long].collect().toSet
    assert(kept2 == Set(5L)) // 4 dropped against the store
    assert(rows2.select("doc_id").distinct().as[String].collect().toSet == Set("5"))

    // re-sending an already-stored doc is dropped (idempotent re-ingest)
    val b3 = Seq((6L, base)).toDF("doc_id", "text")
    val (s3, _) = StreamingDedup.processBatch(
      b3, store1.union(rows2), "doc_id", "text", minEstJaccard = 0.5)
    assert(s3.count() == 0)
    store1.unpersist()
  }

  test("a doc redelivered twice inside one micro-batch lands once") {
    import spark.implicits._
    val b = Seq((7L, base), (7L, base)).toDF("doc_id", "text")
    val (s, rows) = StreamingDedup.processBatch(b, emptyStore, "doc_id", "text",
      minEstJaccard = 0.5)
    assert(s.count() == 1)
    assert(rows.select("band_idx").count() == graft.functions.TextHashing.LshBands)
  }

  test("string (uuid-style) ids flow through the store untouched") {
    import spark.implicits._
    val b = Seq(("chunk-aaaa", base), ("chunk-bbbb", nearDup(base)))
      .toDF("doc_id", "text")
    val (s, rows) = StreamingDedup.processBatch(b, emptyStore, "doc_id", "text",
      minEstJaccard = 0.5)
    assert(s.select("doc_id").as[String].collect().toSeq == Seq("chunk-aaaa"))
    assert(rows.select("doc_id").distinct().as[String].collect().toSeq == Seq("chunk-aaaa"))
  }

  test("band_bucket-partitioned store prunes the per-batch read at the source") {
    import spark.implicits._
    // accumulated store: 40 distinct docs' band rows, laid out partitioned
    // by band_bucket (what run() writes)
    val corpus = (0 until 40).map(i =>
      (i.toLong, s"stored document number $i with unique content token$i " +
        s"about subject${i % 7} and topic${i % 11} plus filler trailing words"))
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("sdedup-bucketed").toString
    StreamingDedup.bandRows(corpus, "doc_id", "text")
      .write.partitionBy("band_bucket").mode("overwrite").parquet(dir)
    val store = StreamingDedup.readStore(spark, dir)

    // a one-doc micro-batch touches ≤ LshBands buckets of NumBandBuckets
    val batch = Seq((100L, base)).toDF("doc_id", "text")
    val newBands = StreamingDedup.bandRows(batch, "doc_id", "text")
    val pruned = StreamingDedup.pruneStoreForBatch(store, newBands)
    val explained = pruned.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(explained.contains("PartitionFilters"),
      s"bucket filter did not reach the scan:\n$explained")
    val pfLine = explained.linesIterator.find(_.contains("PartitionFilters")).get
    assert(pfLine.contains("band_bucket"),
      s"partition filter not on band_bucket: $pfLine")
    // the pruned read really is partial...
    val batchBuckets = newBands.select("band_bucket").distinct()
      .as[Int].collect().toSet
    assert(batchBuckets.size < StreamingDedup.NumBandBuckets)
    assert(pruned.select("band_bucket").distinct().as[Int].collect().toSet
      .subsetOf(batchBuckets))
    // ...and pruning never changes the answer: survivors match an identical
    // processBatch against the unpruned (bucket-column-free) store
    val plain = store.drop("band_bucket")
    val (sBucketed, _) = StreamingDedup.processBatch(batch, store, "doc_id", "text",
      minEstJaccard = 0.5)
    val (sPlain, _) = StreamingDedup.processBatch(batch, plain, "doc_id", "text",
      minEstJaccard = 0.5)
    assert(sBucketed.select("doc_id").as[Long].collect().toSet ==
      sPlain.select("doc_id").as[Long].collect().toSet)
  }

  test("replayed batch recomputes identical survivors, not an empty set") {
    import spark.implicits._
    // crash window: store write committed, checkpoint not — the replay
    // re-reads a store that already holds THIS batch's signatures
    val dir = java.nio.file.Files.createTempDirectory("sdedup-replay")
    val storePath = dir.resolve("store").toString
    val batch = Seq((1L, base), (2L, nearDup(base))).toDF("doc_id", "text")
    def attempt(): Set[Long] = {
      val store = StreamingDedup.readStore(spark, storePath, excludeBatchId = Some(7L))
      val (survivors, rows) = StreamingDedup.processBatch(batch, store, "doc_id", "text",
        minEstJaccard = 0.5)
      rows.withColumn("batch_id", lit(7L))
        .repartition(col("band_bucket"))
        .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id", "band_bucket").parquet(storePath)
      survivors.select("doc_id").as[Long].collect().toSet
    }
    val first = attempt()
    assert(first == Set(1L)) // 2 collapses onto 1 within the batch
    val replay = attempt() // store now holds batch 7's own signatures
    assert(replay == first, "replay must reproduce the original survivors")
    // the unguarded read demonstrates the hazard the exclusion closes:
    // the batch's own stored signatures count as duplicates
    val unguarded = StreamingDedup.readStore(spark, storePath)
    val (lost, _) = StreamingDedup.processBatch(batch, unguarded, "doc_id", "text",
      minEstJaccard = 0.5)
    assert(lost.count() == 0)
  }

  test("run(): foreachBatch wiring dedups across real micro-batches") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-sdedup")
    val (store, out, ckpt) = (s"$dir/store", s"$dir/out", s"$dir/ckpt")
    val input = MemoryStream[(Long, String)]
    val q = StreamingDedup.run(spark,
      input.toDF().toDF("doc_id", "text"), "doc_id", "text",
      store, out, ckpt, minEstJaccard = 0.5)
    try {
      input.addData((1L, base), (2L, nearDup(base)))
      q.processAllAvailable()
      input.addData((4L, nearDup(base) + " tail"))
      q.processAllAvailable()
    } finally q.stop()
    val landed = spark.read.parquet(out).select("doc_id").as[Long].collect().toSet
    assert(landed == Set(1L)) // 2 collapsed in-batch, 4 dropped vs store
    val stored = spark.read.parquet(store).select("doc_id").distinct().as[String].collect().toSet
    assert(stored == Set("1"))
    // the store landed in the band_bucket-partitioned layout (the pruning
    // substrate), nested under its batch_id partition
    val batchDirs = new java.io.File(store).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("batch_id="))
    assert(batchDirs.nonEmpty)
    assert(batchDirs.forall(_.listFiles().exists(
      _.getName.startsWith("band_bucket="))))
  }

  test("commitEveryN: mid-window batches dedup against pending rows and " +
      "the flushed store matches per-batch commits") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-sdedup-n")
    val (store, out, ckpt) = (s"$dir/store", s"$dir/out", s"$dir/ckpt")
    val input = MemoryStream[(Long, String)]
    val q = StreamingDedup.run(spark,
      input.toDF().toDF("doc_id", "text"), "doc_id", "text",
      store, out, ckpt, minEstJaccard = 0.5, commitEveryN = 2)
    try {
      input.addData((1L, base))
      q.processAllAvailable()
      // batch 0's signatures are PENDING (not yet flushed) — batch 1's
      // near-dup must still be dropped, proving the union path works
      assert(!new java.io.File(store).exists(),
        "store flushed before the commit window closed")
      input.addData((4L, nearDup(base) + " tail"))
      q.processAllAvailable()
      // window of 2 closed → one flush carrying both batch partitions
      assert(new java.io.File(store).exists())
    } finally q.stop()
    val landed = spark.read.parquet(out).select("doc_id").as[Long].collect().toSet
    assert(landed == Set(1L), "batch-1 near-dup must drop against PENDING rows")
    val stored = spark.read.parquet(store)
    assert(stored.select("doc_id").distinct().as[String].collect().toSet == Set("1"))
    // flushed layout identical to the per-batch mode: per-batch partitions
    // nested over band_bucket leaves (replay overwrite granularity)
    val batchDirs = new java.io.File(store).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("batch_id="))
    assert(batchDirs.map(_.getName).toSet == Set("batch_id=0"),
      "only batch 0 had survivors, so only its partition exists")
  }

  test("recoverPendingSignatures rebuilds store partitions a deferred-" +
      "commit crash lost, and is a no-op on a complete store") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-sdedup-rec")
    val (store, out) = (s"$dir/store", s"$dir/out")
    val b0 = Seq((1L, base), (3L, "completely different content about " +
      "spark physical plans and shuffle exchanges in query engines"))
      .toDF("doc_id", "text")
    // batch 0: survivors published AND flushed (the healthy case)
    val (s0, rows0) = StreamingDedup.processBatch(
      b0, StreamingDedup.readStore(spark, store), "doc_id", "text",
      minEstJaccard = 0.5)
    s0.withColumn("batch_id", lit(0L)).write
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id").mode("overwrite").parquet(out)
    rows0.withColumn("batch_id", lit(0L)).repartition(col("band_bucket"))
      .write.option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id", "band_bucket").mode("overwrite").parquet(store)
    // batch 1: survivors published, signatures PENDING at crash — the
    // store never saw them
    val b1 = Seq((5L, "an entirely novel document describing reciprocal " +
      "rank fusion for hybrid lexical and semantic retrieval pipelines"))
      .toDF("doc_id", "text")
    val (s1, rows1) = StreamingDedup.processBatch(
      b1, StreamingDedup.readStore(spark, store), "doc_id", "text",
      minEstJaccard = 0.5)
    s1.withColumn("batch_id", lit(1L)).write
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id").mode("overwrite").parquet(out)
    val expectedRows = rows1
      .select("doc_id", "sig", "band_idx", "band_key", "band_bucket")
      .collect().map(_.toString).sorted
    val rebuilt = StreamingDedup.recoverPendingSignatures(
      spark, store, out, "doc_id", "text")
    assert(rebuilt == Seq(1L))
    // the rebuilt partition is exactly what the lost flush would have
    // written (deterministic signatures)
    val got = spark.read.parquet(store)
      .filter(col("batch_id").cast("long") === 1L)
      .select("doc_id", "sig", "band_idx", "band_key", "band_bucket")
      .collect().map(_.toString).sorted
    assert(got.sameElements(expectedRows))
    // second recovery finds nothing missing
    assert(StreamingDedup.recoverPendingSignatures(
      spark, store, out, "doc_id", "text").isEmpty)
    // and a future batch now dedups against the recovered signatures
    val b2 = Seq((9L, "an entirely novel document describing reciprocal " +
      "rank fusion for hybrid lexical and semantic retrieval pipelines"))
      .toDF("doc_id", "text")
    val (s2, _) = StreamingDedup.processBatch(
      b2, StreamingDedup.readStore(spark, store), "doc_id", "text",
      minEstJaccard = 0.5)
    assert(s2.count() == 0)
  }

  test("run() recovers a prior N>1 run's pending window even when " +
      "restarted with the default commitEveryN = 1") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-sdedup-n1rec")
    val (store, out) = (s"$dir/store", s"$dir/out")
    // simulate the crash state a commitEveryN>1 run leaves: survivors
    // published to outPath, signatures never flushed (no store at all)
    // the prior run's window is stamped with ITS batch id (5 — a
    // mid-stream id; the restarted stream shares the store, and the
    // per-batch replay exclusion only ever targets the CURRENT batch id)
    val (s0, _) = StreamingDedup.processBatch(
      Seq((1L, base)).toDF("doc_id", "text"),
      StreamingDedup.readStore(spark, store), "doc_id", "text",
      minEstJaccard = 0.5)
    s0.withColumn("batch_id", lit(5L)).write
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id").mode("overwrite").parquet(out)
    assert(!new java.io.File(store).exists())
    // restart with the DEFAULT N=1: recovery must run anyway, so the
    // first new batch already dedups against batch 0's survivors
    val input = MemoryStream[(Long, String)]
    val q = StreamingDedup.run(spark,
      input.toDF().toDF("doc_id", "text"), "doc_id", "text",
      store, out, s"$dir/ckpt", minEstJaccard = 0.5)
    try {
      assert(new java.io.File(store).exists(),
        "run() start must rebuild the lost store partition")
      input.addData((7L, nearDup(base) + " tail"))
      q.processAllAvailable()
    } finally q.stop()
    val landed = spark.read.parquet(out)
      .select(col("doc_id").cast("long")).collect().map(_.getLong(0)).toSet
    assert(landed == Set(1L),
      "the near-dup must drop against the RECOVERED signatures")
  }
}
