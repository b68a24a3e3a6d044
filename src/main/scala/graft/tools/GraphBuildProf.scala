package graft.tools

import graft.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level cost profile of the graph-ANN REBUILD path at the bench's
  * `graph_store_rebuild` configuration (×16 replicated sf0.1 corpus = 32k
  * vectors, nBits = 12, nTables = 4, m = 16, 512-bucket store): times the
  * LSH candidate-pair leg, the per-src top-m window, the skip-ring leg,
  * the full deduped edge build, and the bucketed store write separately,
  * so bench regressions point at a stage instead of a 36-second blob.
  * Stages re-run from scratch (no reuse), so later numbers INCLUDE their
  * prerequisites; the deltas between consecutive stages isolate each leg.
  *
  * Run: SPARK_GRAFT_SF_DIR=... tools/run_verify.sh x x graft.tools.GraphBuildProf
  */
object GraphBuildProf {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val emb = Tables(spark, dir, "embeddings")
    val reps = spark.range(16).select(col("id").as("__rep"))
    val tmp = java.nio.file.Files.createTempDirectory("graft-gbprof")
    emb.select(col("vec_id"), col("embedding")).crossJoin(reps)
      .withColumn("vec_id", col("vec_id") + col("__rep") * 100000000L)
      .drop("__rep")
      .write.mode("overwrite").parquet(tmp.resolve("corpus").toString)
    val big = spark.read.parquet(tmp.resolve("corpus").toString)

    def timed(name: String)(f: => Unit): String = {
      val t0 = System.nanoTime(); f
      f""""$name":${(System.nanoTime() - t0) / 1e9}%.2f"""
    }
    val stages = Seq(
      timed("lsh_pairs") {
        graft.operators.VectorSearch.cosinePairsLsh(
          big, "vec_id", "embedding", threshold = -1.0,
          nBits = 12, dim = 64, nTables = 4, scoreScale = 6).count(); ()
      },
      timed("build_graph") {
        graft.operators.GraphAnn.buildGraph(
          big, "vec_id", "embedding", m = 16, nBits = 12, nTables = 4)
          .count(); ()
      },
      timed("build_plus_write512") {
        graft.operators.GraphAnn.writeGraphStore(
          spark, tmp.resolve(s"g${System.nanoTime()}").toString,
          graft.operators.GraphAnn.buildGraph(
            big, "vec_id", "embedding", m = 16, nBits = 12, nTables = 4),
          nBuckets = 512); ()
      })
    println(s"""{"metric":"graph_build_profile","n":${big.count()},""" +
      stages.mkString(",") + "}")
    spark.stop()
  }
}
