package graft.streaming

import graft.SparkTestBase
import graft.functions.ZOrder
import graft.operators.{IvfIndex, LmScore, VectorSearch}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The round-3 stateless operators compose into Structured Streaming
  * micro-batches unchanged (§2.9 composition): IVF cell assignment and
  * hyperplane bucketing are narrow codegen expressions against inlined
  * index metadata, z-order keys are pure bit arithmetic, and LM surprisal
  * scoring joins a static (batch) LM table — all legal in a streaming plan.
  * Results must equal the batch run of the same op on the same rows.
  */
class StreamingOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("IVF assign + z-order + LSH bucket run on a stream, batch-identical") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val vecs = (0L until 40L).map(i =>
      (i, Array.tabulate(8)(d => math.sin(i * 8 + d + 1).toFloat), i % 7, i % 5))
    val batchDf = vecs.toDF("vec_id", "embedding", "ka", "kb")
    val idx = IvfIndex.Index(Array(
      0 -> Array.tabulate(8)(d => math.cos(d).toFloat),
      1 -> Array.tabulate(8)(d => math.sin(d).toFloat),
      2 -> Array.tabulate(8)(d => (if (d % 2 == 0) 1f else -1f))))

    def enrich(df: org.apache.spark.sql.DataFrame) = df
      .withColumn("cell", IvfIndex.assignCell(col("embedding"), idx))
      .withColumn("bucket",
        VectorSearch.hyperplaneBucket(col("embedding"), nBits = 4, dim = 8))
      .withColumn("z", ZOrder.interleave(Seq(col("ka"), col("kb")), bitsPerDim = 4))

    val expected = enrich(batchDf)
      .select("vec_id", "cell", "bucket", "z").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))).sortBy(_._1)

    val input = MemoryStream[(Long, Array[Float], Long, Long)]
    val q = enrich(input.toDF().toDF("vec_id", "embedding", "ka", "kb"))
      .writeStream.format("memory").queryName("ops_stream")
      .outputMode("append").start()
    try {
      input.addData(vecs.take(25))
      q.processAllAvailable()
      input.addData(vecs.drop(25)) // second micro-batch: same expressions
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("ops_stream")
      .select("vec_id", "cell", "bucket", "z").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))).sortBy(_._1)
    assert(got.toSeq == expected.toSeq)
  }

  test("LM surprisal scores a stream against a static LM, batch-identical") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val corpus = Seq((1L, "a a b c"), (2L, "b c d"), (3L, "a d d")).toDF("doc_id", "text")
    val lm = LmScore.unigramLm(corpus, "text") // static side of a stream-static join
    val docs = Seq((10L, "a b"), (11L, "c d d"), (12L, "a a a"))
    val expected = LmScore.surprisalScores(
      docs.toDF("doc_id", "text"), "doc_id", "text", lm)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).sortBy(_._1)

    val input = MemoryStream[(Long, String)]
    val q = LmScore.surprisalScores(
      input.toDF().toDF("doc_id", "text"), "doc_id", "text", lm)
      .writeStream.format("memory").queryName("lm_stream")
      .outputMode("complete") // streaming aggregation → complete mode
      .start()
    try {
      input.addData(docs: _*)
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("lm_stream")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).sortBy(_._1)
    assert(got.toSeq == expected.toSeq)
  }

  test("quality gate filters a stream in append mode, batch-identical") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val spam = Array.fill(20)("buy cheap deals now online").mkString(" ")
    val docs = Seq(
      (1L, "a perfectly ordinary document about spark streams and files"),
      (2L, spam), // repetition-capped
      (3L, "decomposed cafe\u0301 text with a zero\u200Bwidth salt inside"))

    def gate(df: org.apache.spark.sql.DataFrame) =
      StreamingIngest.qualityGate(df, maxDup5gramFrac = Some(0.5))

    val expected = gate(docs.toDF("doc_id", "text"))
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)

    val input = MemoryStream[(Long, String)]
    val q = gate(input.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("gate_stream")
      .outputMode("append") // stateless filters: append-legal, no watermark
      .start()
    try {
      input.addData(docs.take(2): _*)
      q.processAllAvailable()
      input.addData(docs.drop(2): _*)
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("gate_stream")
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    assert(got.toSeq == expected.toSeq)
    assert(got.map(_._1).toSet == Set(1L, 3L)) // spam gone
    // canonicalization happened inside the stream: composed + salt-free
    val t3 = got.find(_._1 == 3L).get._2
    assert(t3.contains("caf\u00E9") && !t3.contains("\u200B"))
  }

  test("streaming URL dedup: first spelling of a page wins, nulls pass") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val t0 = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    def ts(s: Int) = new java.sql.Timestamp(t0.getTime + s * 1000L)
    val rows = Seq(
      (1L, "https://Example.com/p?a=1", ts(1)),
      (2L, "https://example.com:443/p?a=1&utm_source=x", ts(2)), // same page
      (3L, "https://example.com/other", ts(3)),
      (4L, null.asInstanceOf[String], ts(4)),
      (5L, null.asInstanceOf[String], ts(5)),                    // nulls never collapse
      (6L, "https://example.com/p?a=1#frag", ts(6)))             // same page again
    val input = MemoryStream[(Long, String, java.sql.Timestamp)]
    val q = StreamingIngest.urlDedupStream(
        input.toDF().toDF("doc_id", "url", "ts"), "url", "ts", "10 minutes")
      .writeStream.format("memory").queryName("url_dedup_stream")
      .outputMode("append").start()
    try {
      input.addData(rows.take(2): _*); q.processAllAvailable()
      input.addData(rows.drop(2): _*); q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("url_dedup_stream")
      .collect().map(_.getLong(0)).toSet
    // 1 beats 2 and 6 (same canonical key, first arrival); both nulls pass
    assert(got == Set(1L, 3L, 4L, 5L))
  }
}
