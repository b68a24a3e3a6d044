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
}
