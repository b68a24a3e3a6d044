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
}
