package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Stateful streaming survives restart: the doc-completion session state is
  * checkpointed, the query is stopped mid-document, restarted from the same
  * checkpoint, and the document completes with chunks from BOTH runs — the
  * recovery contract a 1000-executor deployment depends on.
  */
class CheckpointRecoverySpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def msg(doc: String, idx: Int, content: String, total: Int) =
    ChunkMsg(doc, idx, content, total, new Timestamp(0L))

  test("doc-completion state recovers across query restart") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val checkpoint = Files.createTempDirectory("graft-ckpt").toString

    val outDir = Files.createTempDirectory("graft-ckpt-out").toString
    val input = MemoryStream[ChunkMsg]
    def start() = DocCompletion.sessions(spark, input.toDS(), inactivityTimeoutMs = None)
      .writeStream.format("parquet").option("path", outDir)
      .option("checkpointLocation", checkpoint).outputMode("append").start()

    val q1 = start()
    try {
      input.addData(msg("doc1", 0, "part0", 3), msg("doc1", 1, "part1", 3))
      q1.processAllAvailable()
      assert(spark.read.parquet(outDir).count() == 0) // still open
    } finally q1.stop()

    // restart from the same checkpoint; state must carry over
    val q2 = start()
    try {
      input.addData(msg("doc1", 2, "part2", 3))
      q2.processAllAvailable()
      val done = spark.read.parquet(outDir).as[CompletedDoc].collect()
      assert(done.length == 1)
      assert(done.head.complete)
      assert(done.head.n_chunks == 3)
      // chunks from before AND after the restart, index-ordered
      assert(done.head.content == "part0\n\npart1\n\npart2")
    } finally q2.stop()
  }
}
