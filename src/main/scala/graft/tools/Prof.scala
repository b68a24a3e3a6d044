package graft.tools

import graft.Tables
import graft.functions.TextAnalysis
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc profiling main (dev tool, not part of the driver contract). */
object Prof {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    def time(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($r)")
    }
    val docs = Tables(spark, dir, "documents")
    val prepared = docs.select(
      col("doc_id"), col("lang"), col("source"),
      array_sort(array_distinct(
        transform(TextAnalysis.wordShingles(col("text"), 3), g => xxhash64(g))))
        .as("grams"))
    time("shingle-prep only")(prepared.agg(sum(size(col("grams")))).collect()(0))
    val cached = prepared.cache()
    time("cache materialize")(cached.count())
    val a = cached.select(col("doc_id").as("doc_a"), col("grams").as("grams_a"), col("lang"), col("source"))
    val b = cached.select(col("doc_id").as("doc_b"), col("grams").as("grams_b"), col("lang"), col("source"))
    val inter = graft.functions.VectorFunctions.sortedIntersectCount(col("grams_a"), col("grams_b"))
    val pairs = a.join(b, Seq("lang", "source")).filter(col("doc_a") < col("doc_b"))
    time("join count only")(pairs.count())
    time("join + intersect")(
      pairs.withColumn("j", inter.cast("double") /
        (size(col("grams_a")) + size(col("grams_b")) - inter))
        .agg(sum(col("j"))).collect()(0))
    time("full q24 as shipped")(
      graft.operators.Dedup.ngramJaccardPairs(docs, "doc_id", "text", Seq("lang", "source"))
        .orderBy(col("jaccard").desc, col("doc_a"), col("doc_b")).limit(20).collect().length)
    spark.stop()
  }
}
