package graft.tools

import graft.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Hop-latency amortization curve for the graph-ANN batch beam search
  * (VERDICT r9 task 8): `GraphAnn.searchMany`'s cost is dominated by
  * per-hop DRIVER job latency, which the batch shape amortizes — all
  * queries traverse the same hops simultaneously, so wall time is ~flat
  * in batch size until per-hop data volume matters. This dev tool
  * measures batch sizes 1/5/25/125 over the bucketed store layout
  * (steady-state: one untimed warmup, then median of 3) and prints one
  * JSON line; the measured numbers live in SCALE.md's round-10 section.
  *
  * Run: SPARK_GRAFT_SF_DIR=... tools/run_verify.sh x x graft.tools.GraphBatchCurve
  */
object GraphBatchCurve {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val emb = Tables(spark, dir, "embeddings")
    val root = java.nio.file.Files.createTempDirectory("graft-gcurve").toString
    val nBuckets = 64
    graft.operators.GraphAnn.writeGraphStore(spark, root,
      graft.operators.GraphAnn.buildGraph(emb, "vec_id", "embedding", m = 16),
      nBuckets)
    val store = graft.operators.GraphAnn.readGraphStore(spark, root)
    def run(batch: Int): Unit = {
      val queries = emb.filter(col("vec_id") < batch)
        .select(col("vec_id").as("q_id"), col("embedding").as("qv"))
      graft.operators.GraphAnn.searchMany(
        store, emb, queries, "q_id", "qv", "vec_id", "embedding",
        k = 10, beamWidth = 96, maxHops = 24, nSeeds = 4, expandPerHop = 8,
        srcBuckets = Some(nBuckets))
        .count()
      ()
    }
    val points = Seq(1, 5, 25, 125).map { b =>
      run(b) // warmup: codegen/JIT, untimed
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); run(b); (System.nanoTime() - t0) / 1e9
      }.sorted
      val med = times(1)
      f""""$b":{"sec":$med%.3f,"sec_per_query":${med / b}%.4f}"""
    }
    println(s"""{"metric":"graph_batch_curve","buckets":$nBuckets,""" +
      s""""points":{${points.mkString(",")}}}""")
    spark.stop()
  }
}
