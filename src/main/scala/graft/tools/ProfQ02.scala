package graft.tools

import graft.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** q02 variance investigation (dev tool): repeated steady-state runs of the
  * full query and its stages, isolating scan, decimal aggregation, top-10,
  * and the broadcast probe — VERDICT r2 flagged q02 as the largest bench
  * mover (+34%) and asked for either a sub-2.3 s number on a quiet box or a
  * documented cause.
  */
object ProfQ02 {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def time(name: String)(f: => Any): Double = {
      val t0 = System.nanoTime()
      f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"$name%-36s $s%8.2f s")
      s
    }
    val li = Tables(spark, dir, "lineitem")
    val o = Tables(spark, dir, "orders")
    def q02 = {
      val top = li.groupBy(col("l_orderkey").as("o_orderkey"))
        .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount"))).cast("decimal(18,6)"))
          .cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("o_orderkey"))
        .limit(10)
      broadcast(top)
        .join(o.select(col("o_orderkey"), to_date(col("o_orderdate")).as("o_orderdate")),
          Seq("o_orderkey"))
        .select(col("o_orderkey"), col("o_orderdate"), col("revenue"))
        .orderBy(col("revenue").desc, col("o_orderkey"))
    }
    time("warmup li scan")(li.count())
    time("warmup q02 (cold codegen)")(q02.count())
    val runs = (1 to 5).map(i => time(s"q02 full run $i")(q02.count()))
    println(f"q02 steady-state median: ${runs.sorted.apply(2)}%.2f s")
    time("stage: li scan only")(li.select(col("l_orderkey")).count())
    time("stage: agg dec(18,6) + top10")(
      li.groupBy(col("l_orderkey"))
        .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount"))).cast("decimal(18,6)"))
          .cast("double").as("revenue"))
        .orderBy(col("revenue").desc).limit(10).collect().length)
    time("stage: agg double + top10")(
      li.groupBy(col("l_orderkey"))
        .agg(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
        .orderBy(col("revenue").desc).limit(10).collect().length)
    time("stage: orders probe only")(
      o.select(col("o_orderkey"), to_date(col("o_orderdate"))).count())
    spark.stop()
  }
}
