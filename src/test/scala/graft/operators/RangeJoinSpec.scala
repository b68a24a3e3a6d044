package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketed interval join: equivalence with the naive inequality join on
  * random data, boundary inclusivity, the equi-join plan shape (no nested
  * loop), hygiene, partition invariance.
  */
class RangeJoinSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestBase.spark
  import spark.implicits._

  private val W = 100L

  private def randomSides(seed: Int) = {
    val rnd = new scala.util.Random(seed)
    val left = (1 to 120).map(i =>
      (rnd.nextInt(5).toLong, rnd.nextInt(1000).toLong, i.toLong))
      .toDF("k", "ts", "lid")
    val right = (1 to 150).map(i =>
      (rnd.nextInt(5).toLong, rnd.nextInt(1000).toLong, i.toLong))
      .toDF("k", "ts", "rid")
    (left, right)
  }

  test("equivalence: bucketed join == naive inequality join") {
    val (left, right) = randomSides(3)
    val got = RangeJoin.within(left, right, Seq("k"), "ts", "ts", W)
      .select(col("lid"), col("r_rid"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = left.as("l").join(right.as("r"),
        col("l.k") === col("r.k") &&
          col("r.ts") >= col("l.ts") && col("r.ts") <= col("l.ts") + W)
      .select(col("l.lid"), col("r.rid"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want && got.nonEmpty)
  }

  test("boundaries are inclusive on both ends; outside misses") {
    val left = Seq((1L, 1000L, 1L)).toDF("k", "ts", "lid")
    val right = Seq((1L, 999L, 1L), (1L, 1000L, 2L), (1L, 1100L, 3L),
      (1L, 1101L, 4L), (2L, 1050L, 5L)).toDF("k", "ts", "rid")
    val got = RangeJoin.within(left, right, Seq("k"), "ts", "ts", W)
      .select(col("r_rid")).collect().map(_.getLong(0)).toSet
    assert(got == Set(2L, 3L))
  }

  test("plan: pure equi-join on (key, bucket) — no nested loop, no cartesian") {
    val (left, right) = randomSides(5)
    val plan = RangeJoin.within(left, right, Seq("k"), "ts", "ts", W)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), s"non-equi join shape:\n$plan")
  }

  test("negative timestamps bucket correctly (floorDiv, not truncation)") {
    val left = Seq((1L, -150L, 1L)).toDF("k", "ts", "lid")
    val right = Seq((1L, -150L, 1L), (1L, -51L, 2L), (1L, -50L, 3L),
      (1L, -161L, 4L)).toDF("k", "ts", "rid")
    val got = RangeJoin.within(left, right, Seq("k"), "ts", "ts", W)
      .select(col("r_rid")).collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 2L, 3L))
  }

  test("right columns are r_-prefixed; scratch-column clash refuses") {
    val (left, right) = randomSides(7)
    val out = RangeJoin.within(left, right, Seq("k"), "ts", "ts", W)
    assert(out.columns.toSet == Set("k", "ts", "lid", "r_ts", "r_rid"))
    intercept[IllegalArgumentException](RangeJoin.within(
      left.withColumn("__bucket", lit(1)), right, Seq("k"), "ts", "ts", W))
    intercept[IllegalArgumentException](
      RangeJoin.within(left, right, Seq.empty, "ts", "ts", W))
    intercept[IllegalArgumentException](
      RangeJoin.within(left, right, Seq("k"), "ts", "ts", 0L))
  }

  test("partition invariance") {
    val (left, right) = randomSides(11)
    def run(l: org.apache.spark.sql.DataFrame, r: org.apache.spark.sql.DataFrame) =
      RangeJoin.within(l, r, Seq("k"), "ts", "ts", W)
        .select(col("lid"), col("r_rid"))
        .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(run(left, right) == run(left.repartition(13), right.repartition(7)))
  }
}
