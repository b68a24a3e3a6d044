package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{CmSketch, HllSketch}

/** Sketches are the streaming-native aggregate: HLL registers merge by
  * max, so incremental cardinality over micro-batches carries bounded
  * state and lands on EXACTLY the batch twin's registers — identical
  * image, identical estimate double, regardless of how the stream was
  * chopped or how many duplicates arrived across triggers.
  */
class StreamingSketchSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestBase.spark

  test("foreachBatch HLL accumulation equals the batch sketch exactly") {
    import spark.implicits._
    implicit val sq = spark.sqlContext

    val chunks = Seq(
      (1L to 800L),                    // first trigger
      (500L to 1500L),                 // overlaps the first
      (1L to 300L) ++ (1400L to 2000L) // replayed head + fresh tail
    )
    val allKeys = chunks.flatten

    val acc = scala.collection.mutable.Map.empty[Int, Int]
    val input = MemoryStream[Long]
    val query = input.toDS().writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Long], _: Long) =>
        HllSketch.mergeRegisters(acc, HllSketch.registers(batch.toDF("k"), "k"))
      }
      .start()
    try {
      chunks.foreach { c => input.addData(c); query.processAllAvailable() }
    } finally query.stop()

    val streamed = acc.toMap
    val batch = HllSketch.registers(allKeys.toDF("k"), "k")
      .collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
    assert(streamed == batch) // register-image identity, not approximation

    val eS = HllSketch.estimate(HllSketch.imageToRegisters(spark, streamed))
      .collect()(0).getAs[Double]("est_distinct")
    val eB = HllSketch.estimate(HllSketch.registers(allKeys.toDF("k"), "k"))
      .collect()(0).getAs[Double]("est_distinct")
    assert(eS == eB) // bit-identical estimate
    assert(math.abs(eS - 2000.0) < 2000 * 0.13) // and it is a good estimate
  }

  test("foreachBatch CMS accumulation equals the batch sketch exactly") {
    import spark.implicits._
    implicit val sq = spark.sqlContext

    // CMS cells ADD (not idempotent like HLL's max) — these chunks are
    // DISJOINT slices of one logical pass, the exactly-once contract the
    // operator documents
    val chunks = Seq(
      (1L to 30L).flatMap(k => Seq.fill(3)(k)),
      (10L to 60L).flatMap(k => Seq.fill(2)(k)),
      (50L to 90L))
    val allKeys = chunks.flatten

    val acc = scala.collection.mutable.Map.empty[(Int, Int), Long]
    val input = MemoryStream[Long]
    val query = input.toDS().writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Long], _: Long) =>
        CmSketch.mergeCells(acc,
          CmSketch.sketch(batch.toDF("k"), "k", depth = 4, width = 64))
      }
      .start()
    try {
      chunks.foreach { c => input.addData(c); query.processAllAvailable() }
    } finally query.stop()

    val streamed = acc.toMap
    val batch = CmSketch.sketch(allKeys.toDF("k"), "k", depth = 4, width = 64)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(streamed == batch) // cell-image identity

    val probes = 1L to 90L
    val eS = CmSketch.estimates(
        CmSketch.cellsToSketch(spark, streamed), probes, depth = 4, width = 64)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val exact = allKeys.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    assert(probes.forall(k => eS(k) >= exact.getOrElse(k, 0L))) // CMS bound holds
  }

  test("foreachBatch bloom accumulation equals the batch image exactly") {
    import graft.operators.BloomFilter
    import spark.implicits._
    implicit val sq = spark.sqlContext

    // bit OR is idempotent — overlapping/replayed chunks are harmless,
    // the HLL contract
    val chunks = Seq((1L to 300L), (200L to 600L), (1L to 100L) ++ (550L to 800L))
    val allKeys = chunks.flatten
    val (k, m) = (4, 4096)

    val acc = new java.util.BitSet(m)
    val input = MemoryStream[Long]
    val query = input.toDS().writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Long], _: Long) =>
        BloomFilter.mergeBits(acc, BloomFilter.bits(batch.toDF("key"), "key", k, m))
      }
      .start()
    try {
      chunks.foreach { c => input.addData(c); query.processAllAvailable() }
    } finally query.stop()

    val streamed = acc.stream().toArray.toSet
    val batchImage = BloomFilter.bits(allKeys.toDF("key"), "key", k, m)
      .collect().map(_.getInt(0)).toSet
    assert(streamed == batchImage) // bit-image identity

    // and the accumulated image carries the guarantee: no false negatives
    val verdicts = BloomFilter.mightContain(
        allKeys.distinct.toDF("key"), "key",
        BloomFilter.imageToBits(spark, acc), k, m)
      .collect().map(r => r.getLong(0) -> r.getInt(3)).toMap
    assert(allKeys.distinct.forall(verdicts(_) == 1))
  }

  test("foreachBatch histogram accumulation equals the batch sketch exactly") {
    import graft.operators.HistogramSketch
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    implicit val sq = spark.sqlContext

    // bins ADD like CMS cells (exactly-once contract) — disjoint slices
    val chunks = Seq(
      (1 to 120).map(i => ("a", (i % 90).toLong)),
      (1 to 80).map(i => ("b", (i * 3 % 90).toLong)),
      (1 to 60).map(i => ("a", (i * 7 % 90).toLong)))
    val all = chunks.flatten
    val (bins, lo, hi) = (10, 0L, 100L)

    val acc = scala.collection.mutable.Map.empty[(String, Long), Long]
    val input = MemoryStream[(String, Long)]
    val query = input.toDS().writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[(String, Long)], _: Long) =>
        HistogramSketch.mergeBins(acc,
          HistogramSketch.histogram(batch.toDF("g", "v"), "g", col("v"), bins, lo, hi))
      }
      .start()
    try {
      chunks.foreach { c => input.addData(c); query.processAllAvailable() }
    } finally query.stop()

    val batchHist = HistogramSketch
      .histogram(all.toDF("g", "v"), "g", col("v"), bins, lo, hi)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(acc.toMap == batchHist) // bin-image identity

    def quants(h: org.apache.spark.sql.DataFrame) = HistogramSketch
      .quantiles(h, Seq(500, 950), bins, lo, hi)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val qS = quants(HistogramSketch.imageToHistogram(spark, acc))
    val qB = quants(HistogramSketch.histogram(all.toDF("g", "v"), "g", col("v"), bins, lo, hi))
    assert(qS == qB && qS.nonEmpty) // bit-identical quantiles
  }

  test("foreachBatch spike-count accumulation flags exactly like the batch twin") {
    import graft.operators.SpikeDetect
    import spark.implicits._
    implicit val sq = spark.sqlContext

    // counts ADD (exactly-once contract) — disjoint event slices; one
    // window per group gets a heavy burst so a real spike exists
    val winMs = 1000L
    def evs(g: String, window: Int, k: Int) =
      (1 to k).map(i => (g, window * winMs + (i % 1000)))
    // click windows 0-5: 10, 7+5 (split across triggers), 11, 80 (burst),
    // 9, 10; view windows 0-5: 5, 6, 40 (burst), 7, 5, 6 — six windows per
    // group because a single outlier among W uniform windows exceeds 2σ
    // strictly only for W >= 6 ((W-1)² > 4(W-1))
    val chunks = Seq(
      evs("click", 0, 10) ++ evs("click", 1, 7) ++
        evs("view", 0, 5) ++ evs("view", 1, 6),
      evs("click", 1, 5) ++ evs("click", 2, 11) ++ evs("click", 3, 80) ++
        evs("view", 2, 40) ++ evs("view", 3, 7),
      evs("click", 4, 9) ++ evs("click", 5, 10) ++
        evs("view", 4, 5) ++ evs("view", 5, 6))
    val all = chunks.flatten

    val acc = scala.collection.mutable.Map.empty[(String, Long), Long]
    val input = MemoryStream[(String, Long)]
    val query = input.toDS().writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[(String, Long)], _: Long) =>
        SpikeDetect.mergeCounts(acc,
          SpikeDetect.windowCounts(batch.toDF("g", "ts_ms"), "g", "ts_ms", winMs))
      }
      .start()
    try {
      chunks.foreach { c => input.addData(c); query.processAllAvailable() }
    } finally query.stop()

    def verdicts(counts: org.apache.spark.sql.DataFrame) =
      SpikeDetect.flags(counts).collect()
        .map(r => (r.getString(0), r.getLong(1)) -> ((r.getLong(2), r.getInt(3))))
        .toMap
    val batchCounts = SpikeDetect.windowCounts(
      all.toDF("g", "ts_ms"), "g", "ts_ms", winMs)
    val vS = verdicts(SpikeDetect.imageToCounts(spark, acc))
    val vB = verdicts(batchCounts)
    assert(vS == vB) // count-image identity => bit-identical verdicts
    // the bursts are flagged, the baseline windows are not
    assert(vS(("click", 3000L))._2 == 1)
    assert(vS(("view", 2000L))._2 == 1)
    assert(vS(("click", 0L))._2 == 0)
    // a window split ACROSS micro-batches accumulates to one count row
    assert(vS(("click", 1000L))._1 == 12L)
  }

  test("foreachBatch profile card equals a single merge over the union") {
    import graft.operators.Profile
    import spark.implicits._
    implicit val sq = spark.sqlContext

    // counts add (exactly-once) — disjoint slices; extremes and HLL
    // registers are idempotent merges
    val chunks = Seq(
      (1 to 400).map(i => (i.toLong, s"u${i % 37}")),
      (300 to 700).map(i => (i.toLong * 2, s"u${i % 53}")),
      Seq((-5L, null.asInstanceOf[String]), (9999L, "zzz")))
    val all = chunks.flatten

    val acc = scala.collection.mutable.Map.empty[String, Profile.ColumnState]
    val input = MemoryStream[(Long, String)]
    val query = input.toDS().writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[(Long, String)], _: Long) =>
        Profile.mergeBatchProfile(acc, batch.toDF("num", "s"), Seq("num", "s"))
      }
      .start()
    try {
      chunks.foreach { c => input.addData(c); query.processAllAvailable() }
    } finally query.stop()

    val accB = scala.collection.mutable.Map.empty[String, Profile.ColumnState]
    Profile.mergeBatchProfile(accB, all.toDF("num", "s"), Seq("num", "s"))
    for (c <- Seq("num", "s")) {
      val (x, y) = (acc(c), accB(c))
      assert(x.n === y.n); assert(x.nNull === y.nNull)
      assert(x.minNum === y.minNum); assert(x.maxNum === y.maxNum)
      assert(x.minStr === y.minStr); assert(x.maxStr === y.maxStr)
      assert(x.hll.toMap === y.hll.toMap, s"$c register image diverges")
    }
    // the rendered card: exact counts/extremes, HLL distinct in envelope
    val card = Profile.imageToProfile(spark, acc)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(card("num").getLong(1) === all.size.toLong)
    assert(card("s").getLong(2) === 1L) // one null string
    assert(card("num").getDouble(4) === -5.0) // min_num (getAs Option unwrapped)
    val exactDistinct = all.map(_._1).distinct.size
    val est = card("num").getDouble(3)
    assert(math.abs(est - exactDistinct) < exactDistinct * 0.15,
      s"est $est vs exact $exactDistinct")
  }

  test("foreachBatch k-means sums accumulate to refineExact's exact centroids") {
    import graft.operators.IvfIndex
    import spark.implicits._
    implicit val sq = spark.sqlContext

    // sums ADD (exactly-once contract) — disjoint slices of one corpus;
    // centroids stay FIXED during the round, exactly like refineExact's
    val all = graft.Tables(spark, "/root/testdata/sf0.001", "embeddings")
    val idx0 = IvfIndex.centroidsByDraw(all, "vec_id", "embedding", nCells = 8)
    val chunks = Seq(0, 1, 2).map(m =>
      all.filter(org.apache.spark.sql.functions.col("vec_id") % 3 === m)
        .select("vec_id", "embedding")
        .collect()
        .map(r => (r.getLong(0),
          r.getAs[scala.collection.Seq[Float]](1).toArray.toSeq)))

    val acc = scala.collection.mutable
      .Map.empty[(Int, Int), (java.math.BigDecimal, Long)]
    val input = MemoryStream[(Long, Seq[Float])]
    val query = input.toDS().writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[(Long, Seq[Float])], _: Long) =>
        IvfIndex.mergeAssignSums(acc,
          IvfIndex.assignSums(batch.toDF("vec_id", "embedding"), "embedding", idx0))
      }
      .start()
    try {
      chunks.foreach { c => input.addData(c.toIndexedSeq); query.processAllAvailable() }
    } finally query.stop()

    val streamed = IvfIndex.finalizeCentroids(acc, idx0)
    val batch = IvfIndex.refineExact(all, "embedding", idx0, iters = 1)
    for (((c1, v1), (c2, v2)) <- streamed.centroids.zip(batch.centroids)) {
      assert(c1 === c2)
      assert(v1.toSeq === v2.toSeq,
        s"cell $c1: streamed round != batch refineExact round")
    }
    // and the refined set actually moved (the round did something)
    assert(streamed.centroids.map(_._2.toSeq) !== idx0.centroids.map(_._2.toSeq))
  }

  test("foreachBatch PSI drift equals the batch drift over the union") {
    import graft.operators.Drift
    import spark.implicits._
    implicit val sq = spark.sqlContext

    val ref = (1 to 300).map(i => s"c${i % 4}") // reference snapshot
    // live stream shifts the distribution across micro-batches
    val chunks = Seq(
      (1 to 150).map(i => s"c${i % 3}"),
      (1 to 120).map(i => s"c${i % 5}"),
      Seq("c9", "c9", "c0"))
    val all = chunks.flatten

    val acc = scala.collection.mutable.Map.empty[String, Long]
    val input = MemoryStream[String]
    val query = input.toDS().writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[String], _: Long) =>
        Drift.mergeCounts(acc, Drift.valueCounts(batch.toDF("v"), "v"))
      }
      .start()
    try {
      chunks.foreach { c => input.addData(c); query.processAllAvailable() }
    } finally query.stop()

    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getString(0),
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4),
          r.getDouble(5)))).toMap

    // streaming path: accumulated image vs the static reference counts
    val streamed = canon(Drift.driftFromCounts(
      Drift.valueCounts(ref.toDF("v"), "v"),
      Drift.imageToCounts(spark, acc)))
    // batch path: one-shot drift over the union of all micro-batches
    val batch = canon(Drift.categoricalDrift(
      ref.toDF("v"), all.toDF("v"), "v"))
    assert(streamed == batch) // bit-identical, doubles included
    // the novel category (c9) shows up and contributes positive PSI
    assert(streamed.contains("c9") && streamed("c9")._1 == 0L &&
      streamed("c9")._2 == 2L && streamed("c9")._5 > 0.0)
  }
}
