package graft.streaming

import graft.operators.Merge
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming CDC materialization: micro-batch-split invariance (streamed
  * state ≡ one-shot batch apply), replay idempotence, compaction
  * equivalence + crash-window idempotence, and the end-to-end
  * MemoryStream wiring.
  */
class StreamingMergeSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestBase.spark
  import spark.implicits._

  private val keys = Seq("k")

  private def changes = Seq(
    (1L, "a", 1L, "upsert"),
    (2L, "b", 1L, "upsert"),
    (2L, "b2", 2L, "upsert"),
    (3L, "c", 2L, "upsert"),
    (1L, "gone", 3L, "delete"),
    (4L, "d", 3L, "upsert")
  ).toDF("k", "v", "version", "op")

  private def expected = Seq((2L, "b2"), (3L, "c"), (4L, "d"))

  private def snap(df: DataFrame) =
    df.orderBy("k").collect().map(r => (r.getLong(0), r.getString(1))).toSeq

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft-smerge").toString

  private def state(store: String) =
    StreamingMerge.currentState(spark, store, keys, "version", "op")

  test("micro-batch split invariance: streamed folds equal one-shot apply") {
    val store = tmp()
    // split by version: 3 micro-batches in arrival order
    for ((ver, bid) <- Seq(1L, 2L, 3L).zipWithIndex)
      StreamingMerge.appendBatch(
        changes.filter(col("version") === ver), store, bid.toLong)
    assert(snap(state(store)) == expected)
    val oneShot = Merge.applyChanges(
      changes.select("k", "v").limit(0), changes, keys, "version", "op")
    assert(snap(state(store)) == snap(oneShot))
  }

  test("adversarial split: later versions arriving in earlier batches") {
    val store = tmp()
    StreamingMerge.appendBatch(
      changes.filter(col("version") === 3), store, 0L)
    StreamingMerge.appendBatch(
      changes.filter(col("version") =!= 3), store, 1L)
    assert(snap(state(store)) == expected)
  }

  test("replayed batch overwrites its own partition (no duplication)") {
    val store = tmp()
    StreamingMerge.appendBatch(changes, store, 0L)
    StreamingMerge.appendBatch(changes, store, 0L) // replay
    assert(snap(state(store)) == expected)
    val log = spark.read.parquet(s"$store/changelog")
    assert(log.count() == changes.count())
  }

  test("compaction preserves the resolved state and clears the log") {
    val store = tmp()
    StreamingMerge.appendBatch(changes, store, 0L)
    val before = snap(state(store))
    StreamingMerge.compact(spark, store, keys, "version", "op")
    assert(snap(state(store)) == before)
    val f = new java.io.File(s"$store/changelog")
    assert(!f.exists())
    // appends after compaction keep resolving against the new base
    StreamingMerge.appendBatch(
      Seq((2L, "b3", 9L, "upsert")).toDF("k", "v", "version", "op"), store, 1L)
    assert(snap(state(store)) == Seq((2L, "b3"), (3L, "c"), (4L, "d")))
  }

  test("crash window: re-folding an already-folded changelog is idempotent") {
    val store = tmp()
    StreamingMerge.appendBatch(changes, store, 0L)
    StreamingMerge.compact(spark, store, keys, "version", "op")
    // simulate the crash-before-cleanup: the same changelog reappears
    StreamingMerge.appendBatch(changes, store, 0L)
    assert(snap(state(store)) == expected)
    StreamingMerge.compact(spark, store, keys, "version", "op")
    assert(snap(state(store)) == expected)
  }

  test("crash window: a file-less changelog root (only _SUCCESS left after " +
      "a partial compaction delete) reads as absent instead of wedging the " +
      "store on schema inference (round-10 ADVICE fix)") {
    val store = tmp()
    StreamingMerge.appendBatch(changes, store, 0L)
    val folded = StreamingMerge.compactVersioned(
      spark, store, keys, "version", "op")
    assert(folded.contains(1))
    // simulate the crash: recreate the changelog root holding ONLY a
    // _SUCCESS marker (the state left when the last batch_id= partition
    // delete landed but the root delete did not)
    val fs = new org.apache.hadoop.fs.Path(store)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val logPath = new org.apache.hadoop.fs.Path(s"$store/changelog")
    fs.mkdirs(logPath)
    fs.create(new org.apache.hadoop.fs.Path(logPath, "_SUCCESS"), false).close()
    // both the read and the next compaction must treat it as absent
    assert(snap(StreamingMerge.currentStateVersioned(
      spark, store, keys, "version", "op")) == expected)
    assert(StreamingMerge.compactVersioned(
      spark, store, keys, "version", "op").isEmpty)
    // and the poisoned root was swept, so the stream can append again
    StreamingMerge.appendBatch(
      Seq((9L, "z", 9L, "upsert")).toDF("k", "v", "version", "op"), store, 1L)
    assert(snap(StreamingMerge.currentStateVersioned(
      spark, store, keys, "version", "op")) == expected :+ (9L, "z"))
  }

  test("reading a store that was never written fails loudly") {
    intercept[java.io.IOException] { state(tmp() + "/nope") }
  }

  test("end-to-end MemoryStream wiring") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = tmp()
    val (store, ckpt) = (s"$dir/store", s"$dir/ckpt")
    val input = MemoryStream[(Long, String, Long, String)]
    val q = StreamingMerge.run(
      input.toDF().toDF("k", "v", "version", "op"), store, ckpt)
    try {
      input.addData((1L, "a", 1L, "upsert"), (2L, "b", 1L, "upsert"))
      q.processAllAvailable()
      input.addData((2L, "b2", 2L, "upsert"), (1L, "x", 2L, "delete"))
      q.processAllAvailable()
      assert(snap(state(store)) == Seq((2L, "b2")))
    } finally q.stop()
  }
}
