package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** CDC merge apply: latest-wins upserts, delete tombstones, delete-beats-
  * upsert at equal version, incremental (per-batch) application ≡ one-shot
  * application, TableDiff round-trip, and input validation.
  */
class MergeSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestBase.spark
  import spark.implicits._

  private def base = Seq(
    (1L, "a"), (2L, "b"), (3L, "c")
  ).toDF("k", "v")

  private def changes = Seq(
    (2L, "b1", 1L, "upsert"),  // overwrite
    (2L, "b2", 2L, "upsert"),  // later overwrite wins
    (3L, "dead", 1L, "delete"), // tombstone
    (4L, "d", 1L, "upsert")    // insert
  ).toDF("k", "v", "version", "op")

  private def snap(df: org.apache.spark.sql.DataFrame) =
    df.orderBy("k").collect().map(r => (r.getLong(0), r.getString(1))).toSeq

  test("latest version wins, deletes remove, inserts appear") {
    val out = Merge.applyChanges(base, changes, Seq("k"), "version", "op")
    assert(snap(out) == Seq((1L, "a"), (2L, "b2"), (4L, "d")))
  }

  test("delete beats upsert at the same version") {
    val ch = Seq((1L, "x", 5L, "upsert"), (1L, "y", 5L, "delete"))
      .toDF("k", "v", "version", "op")
    val out = Merge.applyChanges(base, ch, Seq("k"), "version", "op")
    assert(snap(out) == Seq((2L, "b"), (3L, "c")))
  }

  test("incremental per-batch application equals one-shot application") {
    val oneShot = snap(Merge.applyChanges(base, changes, Seq("k"), "version", "op"))
    // replay version-by-version, each batch folding into the running base
    val incremental = Seq(1L, 2L).foldLeft(base) { (acc, ver) =>
      val batch = changes.filter(col("version") === ver)
      Merge.applyChanges(acc, batch, Seq("k"), "version", "op")
    }
    assert(snap(incremental) == oneShot)
  }

  test("applying a TableDiff-shaped changeset round-trips the snapshot") {
    val next = Seq((1L, "a"), (2L, "B"), (4L, "d")).toDF("k", "v")
    // derive the changeset from the diff classification
    val d = TableDiff.diff(base, next, Seq("k"), Seq("v"))
    val ch = d.join(next, Seq("k"), "left")
      .select(col("k"),
        coalesce(col("v"), lit("")).as("v"),
        lit(1L).as("version"),
        when(col("change") === "removed", lit("delete"))
          .otherwise(lit("upsert")).as("op"))
    val out = Merge.applyChanges(base, ch, Seq("k"), "version", "op")
    assert(snap(out) == snap(next))
  }

  test("refuses bookkeeping collisions and missing columns") {
    intercept[IllegalArgumentException] {
      Merge.applyChanges(base.withColumn("version", lit(0L)), changes,
        Seq("k"), "version", "op")
    }
    intercept[IllegalArgumentException] {
      Merge.applyChanges(base, changes.drop("op"), Seq("k"), "version", "op")
    }
    intercept[IllegalArgumentException] {
      Merge.applyChanges(base, changes, Seq.empty, "version", "op")
    }
  }

  test("partition invariance") {
    val a = snap(Merge.applyChanges(base, changes, Seq("k"), "version", "op"))
    val b = snap(Merge.applyChanges(base.repartition(4, col("v")),
      changes.repartition(3, col("op")), Seq("k"), "version", "op"))
    assert(a == b)
  }

  test("plan: winner selection rides WindowGroupLimit (map-side rank-1)") {
    val out = Merge.applyChanges(base, changes, Seq("k"), "version", "op")
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"rank-1 filter not pushed map-side:\n$plan")
  }

  test("incrementalSumAgg equals a from-scratch recompute") {
    import spark.implicits._
    val base0 = (1 to 200).map(i => (s"g${i % 4}", i.toLong,
      BigDecimal((i % 37) + 0.5).setScale(2)))
    val df0 = base0.toDF("g", "id", "v").withColumn("v", col("v").cast("decimal(18,2)"))
    val baseAgg = df0.groupBy("g").agg(count(lit(1)).as("n"), sum(col("v")).as("total"))
    // delta: insert 50 new rows, delete every base row with id % 10 == 0
    val ins = (201 to 250).map(i => (s"g${i % 5}", i.toLong,
      BigDecimal((i % 37) + 0.5).setScale(2), 1L))
    val del = base0.filter(_._2 % 10 == 0).map { case (g, id, v) => (g, id, v, -1L) }
    val delta = (ins ++ del).toDF("g", "id", "v", "__op")
      .withColumn("v", col("v").cast("decimal(18,2)"))
    val got = Merge.incrementalSumAgg(baseAgg, delta, Seq("g"), col("__op"),
      Seq("total" -> col("v")))
      .select(col("g"), col("n"), col("total").cast("string"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
    val finalRows = base0.filterNot(_._2 % 10 == 0) ++ ins.map(t => (t._1, t._2, t._3))
    val expected = finalRows.toDF("g", "id", "v")
      .withColumn("v", col("v").cast("decimal(18,2)"))
      .groupBy("g").agg(count(lit(1)).as("n"), sum(col("v")).as("total"))
      .select(col("g"), col("n"), col("total").cast("string"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
    assert(got == expected)
  }

  test("incrementalSumAgg: fully deleted groups vanish, phantom deletes refuse") {
    import spark.implicits._
    val baseAgg = Seq(("a", 1L, "5.00"), ("b", 2L, "7.00")).toDF("g", "n", "total")
      .withColumn("total", col("total").cast("decimal(18,2)"))
    val wipeA = Seq(("a", BigDecimal(5.00).setScale(2), -1L)).toDF("g", "v", "__op")
      .withColumn("v", col("v").cast("decimal(18,2)"))
    val left = Merge.incrementalSumAgg(baseAgg, wipeA, Seq("g"), col("__op"),
      Seq("total" -> col("v"))).select("g").collect().map(_.getString(0)).toSeq
    assert(left == Seq("b"))
    val phantom = Seq(("zzz", BigDecimal(1.00).setScale(2), -1L)).toDF("g", "v", "__op")
      .withColumn("v", col("v").cast("decimal(18,2)"))
    val err = intercept[IllegalArgumentException] {
      Merge.incrementalSumAgg(baseAgg, phantom, Seq("g"), col("__op"),
        Seq("total" -> col("v")))
    }
    assert(err.getMessage.contains("retracts"))
  }
}
