package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ExpectationsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def report(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getAs[String]("check_name") ->
      ((r.getAs[Long]("n_rows"), r.getAs[Long]("n_violations"),
        r.getAs[Boolean]("passed")))).toMap

  test("rowChecks count violations per predicate in one pass, null = violation") {
    import spark.implicits._
    val df = Seq[(java.lang.Long, String)]((1L, "ok"), (null, "ok"), (3L, "bad"),
      (4L, null)).toDF("id", "status")
    val got = report(Expectations.rowChecks(df, Seq(
      "id_not_null" -> col("id").isNotNull,
      "status_ok" -> (col("status") === "ok"))))
    assert(got("id_not_null") == ((4L, 1L, false)))
    // status: 'bad' fails, null comparison is null → conservative violation
    assert(got("status_ok") == ((4L, 2L, false)))
  }

  test("uniqueCheck counts rows beyond the first per duplicate key") {
    import spark.implicits._
    val df = Seq(1L, 2L, 2L, 2L, 3L, 3L).toDF("k")
    val got = report(Expectations.uniqueCheck(df, "k_unique", Seq("k")))
    assert(got("k_unique") == ((6L, 3L, false)))
    val clean = report(Expectations.uniqueCheck(Seq(1L, 2L).toDF("k"), "u", Seq("k")))
    assert(clean("u") == ((2L, 0L, true)))
  }

  test("refCheck counts orphans including null child keys") {
    import spark.implicits._
    val child = Seq[(java.lang.Long, String)]((1L, "a"), (2L, "b"), (9L, "c"),
      (null, "d")).toDF("fk", "payload")
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val got = report(Expectations.refCheck(child, parent, "fk_ref",
      Seq("fk"), Seq("pk")))
    assert(got("fk_ref") == ((4L, 2L, false)))
  }

  test("suite unions mixed kinds into one bounded report") {
    import spark.implicits._
    val df = Seq((1L, "x"), (2L, "y")).toDF("id", "s")
    val rep = Expectations.suite(Seq(
      Expectations.rowChecks(df, Seq("id_pos" -> (col("id") > 0))),
      Expectations.uniqueCheck(df, "id_unique", Seq("id"))))
    val got = report(rep)
    assert(got.keySet == Set("id_pos", "id_unique"))
    assert(got.values.forall(_._3))
  }

  test("rowCheckImage merges across splits to the exact batch report") {
    import spark.implicits._
    val rows = (1 to 300).map(i => (if (i % 7 == 0) null else s"v$i", i % 5))
    val df = rows.toDF("s", "k")
    val checks = Seq(
      "s_not_null" -> col("s").isNotNull,
      "k_small" -> (col("k") < 3))
    val batch = Expectations.rowChecks(df, checks).collect()
      .map(r => r.getString(0) -> ((r.getLong(2), r.getLong(3)))).toMap
    // three micro-batch splits, images added pairwise
    val splits = Seq(rows.take(100), rows.slice(100, 250), rows.drop(250))
    val merged = splits.map(s => Expectations.rowCheckImage(s.toDF("s", "k"), checks))
      .reduce(_ merge _)
    val replay = Expectations.imageToReport(spark, merged).collect()
      .map(r => r.getString(0) -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(replay == batch)
    assert(merged.n == 300L)
  }

  test("foreachBatch image stream equals the batch report over the union") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val rows = (1 to 240).map(i => (if (i % 11 == 0) null else s"v$i", i % 7))
    val checks = Seq(
      "s_not_null" -> col("s").isNotNull,
      "k_small" -> (col("k") < 4))
    var acc: Option[Expectations.RowCheckImage] = None
    val input = MemoryStream[(String, Int)]
    val query = input.toDS().writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[(String, Int)], _: Long) =>
        val img = Expectations.rowCheckImage(batch.toDF("s", "k"), checks)
        acc = Some(acc.fold(img)(_ merge img))
      }
      .start()
    try {
      rows.grouped(70).foreach { c => input.addData(c); query.processAllAvailable() }
    } finally query.stop()
    val streamed = Expectations.imageToReport(spark, acc.get).collect()
      .map(r => r.getString(0) -> ((r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap
    val batch = Expectations.rowChecks(rows.toDF("s", "k"), checks).collect()
      .map(r => r.getString(0) -> ((r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap
    assert(streamed == batch)
  }
}
