package graft.tools

import graft.Tables
import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Stage-level timing of the streaming-dedup bench cycle: isolates the
  * processBatch compute from the store write and the next-batch store read,
  * for layout experiments (band_bucket partitioning vs flat batch_id).
  * Run: tools/run_verify.sh x x graft.tools.ProfSDedup
  */
object ProfSDedup {
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

    def cycle(label: String, bucketed: Boolean, repart: Boolean): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory("prof-sdedup")
      val storePath = tmp.resolve("store").toString
      val outPath = tmp.resolve("out").toString
      val docs = Tables(spark, sfDir, "documents")
      var tRead, tProc, tOut, tStore = 0.0
      def t[A](f: => A): (A, Double) = {
        val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
      }
      (0 until 4).foreach { b =>
        val batch = docs.filter(col("doc_id") % 4 === b)
        val (store, d1) = t(graft.streaming.StreamingDedup.readStore(spark, storePath))
        val ((survivors, survivorRows), d2) = t {
          val r = graft.streaming.StreamingDedup.processBatch(batch, store, "doc_id", "text")
          (r._1.localCheckpoint(), r._2.localCheckpoint())
        }
        val (_, d3) = t {
          survivors.withColumn("batch_id", lit(b.toLong))
            .write.mode(SaveMode.Overwrite)
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id").parquet(outPath)
        }
        val (_, d4) = t {
          val base = survivorRows.withColumn("batch_id", lit(b.toLong))
          val w = if (repart) base.repartition(col("band_bucket")) else base
          val cols = if (bucketed) Seq("batch_id", "band_bucket") else Seq("batch_id")
          w.write.mode(SaveMode.Overwrite)
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(cols: _*).parquet(storePath)
        }
        tRead += d1; tProc += d2; tOut += d3; tStore += d4
      }
      println(f"$label%-28s read=$tRead%6.2f proc=$tProc%6.2f out=$tOut%6.2f storeWrite=$tStore%6.2f total=${tRead + tProc + tOut + tStore}%6.2f")
      graft.Bench.deleteRecursively(tmp)
    }

    // warmup then each variant
    cycle("warmup", bucketed = true, repart = true)
    cycle("flat (r3 layout)", bucketed = false, repart = false)
    cycle("bucketed+repartition", bucketed = true, repart = true)
    cycle("bucketed no-repart", bucketed = true, repart = false)
    spark.stop()
  }
}
