package graft.streaming

import java.sql.Timestamp

import graft.SparkTestBase
import org.apache.spark.api.java.Optional
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
import org.scalatest.funsuite.AnyFunSuite

/** Stateful doc-completion sessions (hive_service.go:128-219 semantics):
  * completion on all-chunks-received, flush on 2s inactivity, chunk_index
  * ordering.
  */
class DocCompletionSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def msg(doc: String, idx: Int, content: String, total: Int) =
    ChunkMsg(doc, idx, content, total, new Timestamp(0L))

  test("completionFn: completes when all chunks arrive, index-ordered") {
    val state = TestGroupState.create[DocState](
      Optional.empty[DocState], GroupStateTimeout.ProcessingTimeTimeout,
      1000L, Optional.empty[java.lang.Long].asInstanceOf[Optional[Long]],
      hasTimedOut = false)
    // chunks arrive out of order
    val out = DocCompletion.completionFn("d1",
      Iterator(msg("d1", 1, "second", 3), msg("d1", 0, "first", 3)), state)
    assert(out.isEmpty && state.exists)
    val out2 = DocCompletion.completionFn("d1",
      Iterator(msg("d1", 2, "third", 3)), state)
    val done = out2.toSeq
    assert(done.length == 1)
    assert(done.head.complete)
    assert(done.head.n_chunks == 3)
    assert(done.head.content == "first\n\nsecond\n\nthird")
    assert(!state.exists) // state cleared
  }

  test("completionFn: duplicate chunk indexes are idempotent") {
    val state = TestGroupState.create[DocState](
      Optional.empty[DocState], GroupStateTimeout.ProcessingTimeTimeout,
      1000L, Optional.empty[java.lang.Long].asInstanceOf[Optional[Long]],
      hasTimedOut = false)
    val out = DocCompletion.completionFn("d2",
      Iterator(msg("d2", 0, "only", 2), msg("d2", 0, "only", 2)), state)
    assert(out.isEmpty) // 1 distinct of 2 expected → still open
  }

  test("NoTimeout + unknown total_chunks flushes incomplete instead of leaking") {
    val state = TestGroupState.create[DocState](
      Optional.empty[DocState], GroupStateTimeout.NoTimeout,
      1000L, Optional.empty[java.lang.Long].asInstanceOf[Optional[Long]],
      hasTimedOut = false)
    val out = DocCompletion.completionFnWithTimeout(None)(
      "dx", Iterator(msg("dx", 0, "orphan", 0)), state).toSeq
    assert(out.length == 1)
    assert(!out.head.complete)
    assert(out.head.content == "orphan")
    assert(!state.exists)
  }

  test("completionFn: inactivity timeout flushes incomplete doc") {
    val state = TestGroupState.create[DocState](
      Optional.empty[DocState], GroupStateTimeout.ProcessingTimeTimeout,
      1000L, Optional.empty[java.lang.Long].asInstanceOf[Optional[Long]],
      hasTimedOut = false)
    DocCompletion.completionFn("d3", Iterator(msg("d3", 0, "partial", 5)), state)
    assert(state.exists)
    val timedOut = TestGroupState.create[DocState](
      Optional.of(state.get), GroupStateTimeout.ProcessingTimeTimeout,
      5000L, Optional.empty[java.lang.Long].asInstanceOf[Optional[Long]],
      hasTimedOut = true)
    val out = DocCompletion.completionFn("d3", Iterator.empty, timedOut).toSeq
    assert(out.length == 1)
    assert(!out.head.complete)
    assert(out.head.content == "partial")
  }

  test("streaming end-to-end: MemoryStream sessions emit completed docs") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val input = MemoryStream[ChunkMsg]
    // NoTimeout here: a pending processing-time timeout keeps the stream
    // scheduling batches, so processAllAvailable would never settle. The
    // timeout path is unit-tested via TestGroupState above.
    val sessions = DocCompletion.sessions(spark, input.toDS(), inactivityTimeoutMs = None)
    val query = sessions.writeStream
      .format("memory").queryName("completed_docs").outputMode("append").start()
    try {
      input.addData(
        msg("docA", 0, "a0", 2), msg("docA", 1, "a1", 2),
        msg("docB", 0, "b0", 3))
      query.processAllAvailable()
      val done = spark.table("completed_docs").as[CompletedDoc].collect()
      assert(done.map(_.document_id).toSet == Set("docA"))
      assert(done.head.content == "a0\n\na1")
      // docB incomplete: still stateful, nothing emitted
      input.addData(msg("docB", 1, "b1", 3), msg("docB", 2, "b2", 3))
      query.processAllAvailable()
      val all = spark.table("completed_docs").as[CompletedDoc].collect()
      assert(all.map(_.document_id).toSet == Set("docA", "docB"))
    } finally query.stop()
  }

  test("streaming ingest pipeline: file source → chunks → alert sink") {
    val dir = java.nio.file.Files.createTempDirectory("graft-stream")
    java.nio.file.Files.write(dir.resolve("doc1.txt"),
      "This document contains CONFIDENTIAL pricing information.".getBytes)
    java.nio.file.Files.write(dir.resolve("doc2.md"),
      "A perfectly public document with nothing sensitive.".getBytes)
    val chunks = StreamingIngest.chunkStream(spark, dir.toString,
      chunkSize = 100, overlap = 20, dim = 16)
    assert(chunks.isStreaming)
    val seen = new java.util.concurrent.atomic.AtomicLong(0)
    val q = StreamingIngest.alertWriter(chunks) { (batch, _) =>
      seen.addAndGet(batch.count())
    }.start()
    try {
      q.processAllAvailable()
      assert(seen.get() == 1) // only doc1 chunk 0 alerts
    } finally q.stop()
  }
}
