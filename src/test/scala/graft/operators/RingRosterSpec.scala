package graft.operators

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The persisted skip-ring roster (round 12, VERDICT r11 task 1): draw
  * mechanics, idempotent delta appends, and — the load-bearing gate — the
  * distributed finger stitch (bucket-pruned window + escalation fallback)
  * returning EXACTLY the declared circular-successor semantics, verified
  * against an independent driver-side argmin over the full roster.
  */
class RingRosterSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val sf = "/root/testdata/sf0.01"
  private lazy val emb = Tables(spark, sf, "embeddings")

  private val P = RingRoster.P

  /** Independent reference draw: md5 hex prefix, like the engine's. */
  private def draw(id: Long): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(id.toString.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.take(15), 16)
  }

  /** Reference fingers: for each new id and level, the global argmin of
    * (circular draw distance, id) over the roster — the semantics
    * [[RingRoster.stitchFingers]] declares.
    */
  private def referenceFingers(
      rosterIds: Seq[Long], newIds: Seq[Long], stride: Int): Set[(Long, Long)] = {
    val r = rosterIds.filterNot(newIds.toSet)
    val n = r.size.toLong
    if (n == 0) return Set.empty
    val offsets = Iterator.iterate(1L)(_ << stride).takeWhile(_ < n).toSeq
    val unit = P / n
    val drawn = r.map(id => id -> draw(id))
    (for {
      x <- newIds
      off <- offsets
      t = Math.floorMod(draw(x) + off * unit, P)
    } yield {
      val succ = drawn.minBy { case (id, d) => (Math.floorMod(d - t, P), id) }._1
      (x, succ)
    }).toSet
  }

  private def stitchOf(
      root: String, newIds: Seq[Long], stride: Int, nBuckets: Int): Set[(Long, Long)] = {
    import spark.implicits._
    RingRoster.stitchFingers(spark, root, newIds.toDF("vec_id"), "vec_id",
      ringStride = stride, nBuckets = nBuckets)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  test("write/append/read: draw matches the md5 prefix, appends are " +
      "idempotent delta commits, the layout is draw-range-bucketed, and " +
      "compactTo drops dangling ids") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-ring").toString
    val base = emb.filter(col("vec_id") < 100).select(col("vec_id"))
    assert(RingRoster.write(spark, root, base, "vec_id", nBuckets = 16) == 1)
    val rows = RingRoster.read(spark, root).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(rows.length == 100)
    rows.foreach { case (id, d, b) =>
      assert(d == draw(id), s"draw mismatch for id $id")
      assert(b == (d >> 56).toInt, s"bucket must be the top 4 draw bits")
    }
    // idempotent append: overlapping batch adds only the new ids
    val v2 = RingRoster.append(spark, root,
      (90L until 110L).toDF("vec_id"), "vec_id", nBuckets = 16)
    assert(v2.contains(2))
    assert(RingRoster.read(spark, root).count() == 110)
    // fully-duplicate batch commits nothing
    assert(RingRoster.append(spark, root,
      (0L until 50L).toDF("vec_id"), "vec_id", nBuckets = 16).isEmpty)
    assert(RingRoster.read(spark, root).count() == 110)
    // non-power-of-two bucket counts refuse loudly
    val e = intercept[IllegalArgumentException] {
      RingRoster.write(spark, root + "x", base, "vec_id", nBuckets = 12)
    }
    assert(e.getMessage.contains("power of 2"))
    // compactTo keeps only live ids
    RingRoster.compactTo(spark, root,
      (0L until 100L).toDF("vec_id"), "vec_id", nBuckets = 16)
    assert(RingRoster.read(spark, root).count() == 100)
  }

  test("stitchFingers equals the declared circular-successor semantics " +
      "exactly (independent driver argmin), on a dense roster (bucket " +
      "window path) AND a sparse one (escalation fallback path)") {
    import spark.implicits._
    // dense: 300 rostered ids over 16 buckets — the 2-bucket window wins
    val dense = java.nio.file.Files.createTempDirectory("graft-ring-d").toString
    val rosterIds = (0L until 300L)
    RingRoster.write(spark, dense, rosterIds.toDF("vec_id"), "vec_id",
      nBuckets = 16)
    val batch = (300L until 312L)
    assert(stitchOf(dense, batch, 2, 16) ==
      referenceFingers(rosterIds, batch, 2))
    // stride 1 (denser ladder) agrees too
    assert(stitchOf(dense, batch, 1, 16) ==
      referenceFingers(rosterIds, batch, 1))
    // sparse: 3 rostered ids under 64 buckets — most targets find an empty
    // 2-bucket window and MUST escalate to the full-roster argmin
    val sparse = java.nio.file.Files.createTempDirectory("graft-ring-s").toString
    val tiny = Seq(5L, 77L, 1234L)
    RingRoster.write(spark, sparse, tiny.toDF("vec_id"), "vec_id",
      nBuckets = 64)
    assert(stitchOf(sparse, batch, 2, 64) ==
      referenceFingers(tiny, batch, 2))
    // replay stability: ids already rostered are excluded as candidates —
    // stitching the SAME batch after appending it returns identical edges
    val before = stitchOf(dense, batch, 2, 16)
    RingRoster.append(spark, dense, batch.toDF("vec_id"), "vec_id", 16)
    assert(stitchOf(dense, batch, 2, 16) == before,
      "stitch must be identical before and after the roster append")
    // degenerate rosters: n = 1 has no offsets -> no fingers; and a
    // batch-only roster (everything anti-joined) -> no fingers
    val one = java.nio.file.Files.createTempDirectory("graft-ring-1").toString
    RingRoster.write(spark, one, Seq(9L).toDF("vec_id"), "vec_id", 16)
    assert(stitchOf(one, Seq(10L), 2, 16).isEmpty)
    assert(stitchOf(one, Seq(9L, 10L), 2, 16).isEmpty)
  }

  test("driver-hosted stitch twin (round 12 optimization) returns EXACTLY " +
      "stitchFingers' edges — dense window path, sparse fallback path, " +
      "replay stability, degenerate rosters — and appendIds commits the " +
      "same idempotent delta as append") {
    import spark.implicits._
    def localOf(root: String, ids: Seq[Long], stride: Int,
        nBuckets: Int): Set[(Long, Long)] =
      RingRoster.stitchFingersLocal(spark, root, ids, stride, nBuckets).toSet
    val dense = java.nio.file.Files.createTempDirectory("graft-ringl-d").toString
    val rosterIds = (0L until 300L)
    RingRoster.write(spark, dense, rosterIds.toDF("vec_id"), "vec_id",
      nBuckets = 16)
    val batch = (300L until 312L)
    assert(localOf(dense, batch, 2, 16) == stitchOf(dense, batch, 2, 16))
    assert(localOf(dense, batch, 1, 16) == stitchOf(dense, batch, 1, 16))
    // sparse roster: the fallback leg must agree too
    val sparse = java.nio.file.Files.createTempDirectory("graft-ringl-s").toString
    val tiny = Seq(5L, 77L, 1234L)
    RingRoster.write(spark, sparse, tiny.toDF("vec_id"), "vec_id",
      nBuckets = 64)
    assert(localOf(sparse, batch, 2, 64) == stitchOf(sparse, batch, 2, 64))
    // replay stability through the driver-ids append: same answer before
    // and after, the roster gains exactly the new ids, and a replayed
    // appendIds commits nothing
    val before = localOf(dense, batch, 2, 16)
    assert(RingRoster.appendIds(spark, dense, batch, 16).contains(2))
    assert(localOf(dense, batch, 2, 16) == before)
    assert(RingRoster.read(spark, dense).count() == 312)
    assert(RingRoster.appendIds(spark, dense, batch, 16).isEmpty)
    val rows = RingRoster.read(spark, dense)
      .where(col("id") >= 300).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    rows.foreach { case (id, d, b) =>
      assert(d == draw(id) && b == (d >> 56).toInt,
        s"appendIds row for $id must carry the md5 draw and range bucket")
    }
    // degenerate: single-member roster (no offsets), batch-only roster
    val one = java.nio.file.Files.createTempDirectory("graft-ringl-1").toString
    RingRoster.write(spark, one, Seq(9L).toDF("vec_id"), "vec_id", 16)
    assert(localOf(one, Seq(10L), 2, 16).isEmpty)
    assert(localOf(one, Seq(9L, 10L), 2, 16).isEmpty)
  }
}
