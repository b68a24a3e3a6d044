package graft.operators

import java.sql.Timestamp

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CrossDocStreamingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("F7: cross-doc rule routing by keyword") {
    import spark.implicits._
    val rules = Seq(
      (1, "Does this document contradict any existing document?"),
      (2, "Does this document mention pricing?"),
      (3, "Does this conflict with other documents?")).toDF("rule_id", "question")
    val routed = rules.withColumn("cross", RuleEngine.isCrossDocRule(col("question")))
      .collect().map(r => r.getInt(0) -> r.getBoolean(2)).toMap
    assert(routed == Map(1 -> true, 2 -> false, 3 -> true))
  }

  test("J4: cross-doc rule join answers over both documents' contents") {
    import spark.implicits._
    val pairs = Seq((1L, 2L, 0.9)).toDF("query_id", "neighbor_id", "score")
    val docs = Seq(
      (1L, "alpha doc mentions price"), (2L, "beta doc is public"))
      .toDF("doc_id", "text")
    val rules = Seq(
      (1, "Does this contradict existing documents about pricing?"),
      (2, "Is there a secret?")) // single-doc rule → filtered out
      .toDF("rule_id", "question")
    val res = RuleEngine.crossDocEvaluate(pairs, docs, "doc_id", "text", rules)
      .select(col("rule_id"), col("answer")).collect()
    assert(res.length == 1) // only the cross-doc rule evaluated
    assert(res.head.getInt(0) == 1)
    // question has 'pricing', concatenated contents contain 'price' → YES
    assert(res.head.getString(1) == "YES")
  }

  test("streaming session_window: gap-based sessions with watermark") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Double)]
    val events = input.toDF().toDF("ts", "user_id", "value")
    val sessions = Sessionize.streamingSessions(
      events, Seq("user_id"), "ts", col("value"), gap = "10 seconds",
      watermark = "0 seconds")
    val q = sessions.writeStream.format("memory")
      .queryName("stream_sessions").outputMode("append").start()
    try {
      def ts(s: Long) = new Timestamp(s * 1000L)
      input.addData(
        (ts(0), "u1", 1.0), (ts(5), "u1", 2.0), // session A
        (ts(60), "u1", 3.0)) // session B (gap 55s > 10s)
      q.processAllAvailable()
      // advance watermark far past both sessions to finalize them
      input.addData((ts(1000), "u1", 0.0))
      q.processAllAvailable()
      val rows = spark.table("stream_sessions")
        .select(col("n_events"), col("session_value")).collect()
        .map(r => (r.getLong(0), r.getDouble(1))).toSet
      assert(rows == Set((2L, 3.0), (1L, 3.0)))
    } finally q.stop()
  }

  test("approx_count_distinct within 5% of exact (A5 at scale)") {
    import spark.implicits._
    val df = (1 to 20000).map(i => i % 7919).toDF("v")
    val r = df.agg(
      countDistinct(col("v")).as("exact"),
      approx_count_distinct(col("v")).as("approx")).collect().head
    val exact = r.getLong(0).toDouble
    val approx = r.getLong(1).toDouble
    assert(math.abs(approx - exact) / exact < 0.05)
  }
}
