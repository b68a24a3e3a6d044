package graft.tools

import graft.Tables
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Job-level profile of the streaming graph-insert loop (the
  * streaming_graph_4b bench body): registers a listener that logs every
  * Spark job's duration and call site across one 4-batch run, so the
  * per-batch job inventory — the entry's real cost in local mode — is
  * measurable instead of guessed. Run:
  *   tools/run_verify.sh x x graft.tools.ProfSGI
  */
object ProfSGI {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (String, Long)]()
    val done = new java.util.concurrent.CopyOnWriteArrayList[(Int, String, Double)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val site = js.stageInfos.lastOption.map(_.name).getOrElse("?")
        jobs.put(js.jobId, (site, js.time))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        Option(jobs.remove(je.jobId)).foreach { case (site, t0) =>
          done.add((je.jobId, site, (je.time - t0) / 1e3))
        }
      }
    })

    val root = java.nio.file.Files.createTempDirectory("prof-sgi")
    val emb = Tables(spark, sfDir, "embeddings")
    val sgiBase = emb.filter(col("vec_id") < 1600)
      .select(col("vec_id"), col("embedding"))
    graft.operators.GraphAnn.writeVectorStore(
      spark, root.resolve("v").toString, sgiBase, "vec_id", nBuckets = 16)
    graft.operators.GraphAnn.writeGraphStore(
      spark, root.resolve("g").toString,
      graft.operators.GraphAnn.buildGraph(
        sgiBase, "vec_id", "embedding", m = 8, nBits = 5),
      nBuckets = 16)
    graft.operators.RingRoster.write(
      spark, root.resolve("r").toString,
      sgiBase.select(col("vec_id")), "vec_id", nBuckets = 32)
    val cfg = graft.streaming.StreamingGraphIndex.Config(
      m = 8, maxDegree = 24, nBuckets = 16, idBuckets = 16,
      beamWidth = 16, maxHops = 6,
      ringRoot = Some(root.resolve("r").toString), rosterBuckets = 32)

    // one warm run (codegen/JIT), then the profiled run
    (0 until 2).foreach { epoch =>
      done.clear()
      val t0 = System.nanoTime()
      (0 until 4).foreach { j =>
        val lo = 1600 + j * 8
        val batch = emb.filter(col("vec_id") >= lo && col("vec_id") < lo + 8)
          .select(col("vec_id"), col("embedding"))
        val bt0 = System.nanoTime()
        graft.streaming.StreamingGraphIndex.processBatch(
          spark, batch, (epoch * 4 + j).toLong,
          root.resolve("g").toString, root.resolve("v").toString,
          "vec_id", "embedding", cfg, None)
        println(f"[prof] epoch $epoch batch $j: ${(System.nanoTime() - bt0) / 1e9}%.2f s")
      }
      val wall = (System.nanoTime() - t0) / 1e9
      import scala.jdk.CollectionConverters._
      val ds = done.asScala.toSeq
      println(f"[prof] epoch $epoch: ${ds.size} jobs, wall $wall%.2f s, " +
        f"job-time sum ${ds.map(_._3).sum}%.2f s")
      if (epoch == 1) {
        println("[prof] per-callsite totals (count, sum s):")
        ds.groupBy(_._2).toSeq
          .map { case (site, xs) => (site, xs.size, xs.map(_._3).sum) }
          .sortBy(-_._3)
          .foreach { case (site, n, s) => println(f"[prof]   $n%3d  $s%7.2f  $site") }
      }
    }
    graft.Bench.deleteRecursively(root)
    spark.stop()
  }
}
