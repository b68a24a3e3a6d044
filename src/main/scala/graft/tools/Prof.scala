package graft.tools

import graft.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc profiling main (dev tool, not part of the driver contract). */
object Prof {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    val dir = "/root/testdata/sf0.1"
    def time(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($r)")
    }
    val li = Tables(spark, dir, "lineitem")
    time("warmup count")(li.count())
    time("bare count")(li.count())
    time("double-sum groupBy")(
      li.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("l_quantity")), sum(col("l_extendedprice") * (lit(1) - col("l_discount"))))
        .collect().length)
    time("decimal(24,10) groupBy")(
      li.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount"))).cast("decimal(24,10)")))
        .collect().length)
    time("decimal(18,6) groupBy")(
      li.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount"))).cast("decimal(18,6)")))
        .collect().length)
    time("q02 agg 150k keys dec24")(
      li.groupBy(col("l_orderkey"))
        .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount"))).cast("decimal(24,10)")))
        .count())
    time("q02 agg 150k keys dec18")(
      li.groupBy(col("l_orderkey"))
        .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount"))).cast("decimal(18,6)")))
        .count())
    // q24: does a symmetric self-join reuse the shuffle (one shingle pass)?
    val docs = Tables(spark, dir, "documents")
    val prepared = docs.select(col("doc_id"), col("lang"), col("source"),
      graft.functions.GraftFunctions.shingleHashesUdf(col("text"), lit(3)).as("grams"))
    val a = prepared.as("a")
    val b = prepared.as("b")
    val selfJoin = a.join(b, Seq("lang", "source"))
      .filter(col("a.doc_id") < col("b.doc_id"))
    val plan = selfJoin.queryExecution.executedPlan.toString
    println("ReusedExchange in symmetric self-join: " + plan.contains("ReusedExchange"))
    time("symmetric self-join count")(selfJoin.count())
    val pairsNoJac = graft.operators.Dedup.ngramJaccardPairs(docs, "doc_id", "text", Seq("lang", "source"))
    time("q24 pairs count only")(pairsNoJac.select(col("doc_a")).count())
    time("q24 jaccard sum")(pairsNoJac.agg(sum(col("jaccard"))).collect()(0))
    println(pairsNoJac.agg(sum(col("jaccard"))).queryExecution.executedPlan.toString.split("\n").filter(l => l.contains("WholeStageCodegen") || l.contains("Project") || l.contains("Join") || l.contains("Filter")).mkString("\n"))
    val preparedU = prepared.repartition(32)
    val aU = preparedU.select(col("doc_id").as("doc_a"), col("grams").as("grams_a"), col("lang"), col("source"))
    val bU = preparedU.select(col("doc_id").as("doc_b"), col("grams").as("grams_b"), col("lang"), col("source"))
    val interU = graft.functions.VectorFunctions.sortedIntersectCount(col("grams_a"), col("grams_b"))
    time("jaccard after repartition")(
      aU.join(bU, Seq("lang", "source")).filter(col("doc_a") < col("doc_b"))
        .withColumn("j", interU.cast("double") /
          (size(col("grams_a")) + size(col("grams_b")) - interU))
        .agg(sum(col("j"))).collect()(0))
    time("current q24 full")(
      graft.operators.Dedup.ngramJaccardPairs(docs, "doc_id", "text", Seq("lang", "source"))
        .orderBy(col("jaccard").desc, col("doc_a"), col("doc_b")).limit(20).collect().length)
    spark.stop()
  }
}
