package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs the headline query set on SPARK_GRAFT_SF_DIR and
  * prints one JSON line (driver contract). Each query executes its full plan
  * (count() action) once untimed (whole-stage codegen compile + JIT of that
  * query's operators) and then THREE timed runs; the reported number is the
  * MEDIAN, with per-entry min/max kept in the JSON for variance visibility.
  * Round-3 investigation (graft.tools.ProfQ02, SCALE.md) showed single-shot
  * numbers are dominated by per-query codegen (q02: 3.4-6.4 s single-shot vs
  * 1.15 s steady-state median) — a constant that amortizes to zero on a
  * long-running cluster, which is the regime the bench is meant to predict.
  * Round-4 showed a second contamination mode: the graded snapshot was
  * captured on a loaded machine and overstated heavy entries 2-7x versus a
  * quiet-box rerun. The median-of-3 absorbs a transient spike hitting one
  * run, and the record is stamped with the OS load average at start and end
  * (OperatingSystemMXBean.getSystemLoadAverage) so a contaminated run is
  * self-identifying — a load average far above the core count means the
  * numbers measure the machine, not the engine. Cross-round comparisons
  * start from round 3 (single-shot r1/r2 numbers are not comparable).
  */
object Bench {
  private val TimedRuns = 3

  private final case class Stat(median: Double, min: Double, max: Double)
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // session warmup, then per-query warm+measure
    try SparkEntry.queries("q12_distinct_counts")(spark, sfDir).count()
    catch { case _: Throwable => () }

    val loadAvgStart = systemLoadAverage()

    def timed(name: String)(run: => Unit): (String, Stat) = {
      try run // warmup: codegen compile + JIT, untimed
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name warmup failed: ${e.getMessage}")
      }
      val times = (0 until TimedRuns).map { _ =>
        val t0 = System.nanoTime()
        try run
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
        }
        (System.nanoTime() - t0) / 1e9
      }.sorted
      name -> Stat(median = times(times.length / 2), min = times.head, max = times.last)
    }

    val headlineResults = SparkEntry.headline.map { name =>
      timed(name)(SparkEntry.queries(name)(spark, sfDir).count(): Unit)
    }
    // non-query benches: incremental streaming dedup (the accumulated-store
    // join cost must be tracked across rounds like q37) and amortized BM25
    // (precomputed lens table vs q38's inline corpus scan). The lens
    // materialization is the amortized, once-per-snapshot cost — written
    // here, OUTSIDE the timed region, by design.
    val lensDir = java.nio.file.Files.createTempDirectory("graft-bench-lens")
    val lensPath = lensDir.resolve("lens").toString
    // guarded like every timed entry: a failed lens write must cost only
    // the one extra that depends on it (timed() catches the read failure),
    // never the whole bench record
    try graft.operators.KeywordSearch.docLengths(
      Tables(spark, sfDir, "documents"), "doc_id", "text").write.parquet(lensPath)
    catch { case e: Throwable =>
      System.err.println(s"[bench] lens materialization failed: ${e.getMessage}")
    }
    val sdedupRoot = java.nio.file.Files.createTempDirectory("graft-bench-sdedup")
    val extras = Seq(
      "streaming_dedup_4batches" -> (() => streamingDedup4Batches(spark, sfDir, sdedupRoot)),
      // steady-state trigger regime: a small re-ingest batch against the
      // store accumulated above — the bucket-pruned read is what a
      // long-running stream pays per trigger (the 4batches entry is the
      // bootstrap regime where every batch covers all buckets)
      "streaming_dedup_trigger" -> (() => streamingDedupTrigger(spark, sfDir)),
      // q3m runs the oracled default stage set; this tracks the FULL
      // seven-stage pipeline (adds transitive MinHash near-dup CC + the
      // LM surprisal band) so the complete curation cost moves per round
      "q3m_full_curation" -> (() => curateFull(spark, sfDir)),
      "q38_bm25_precomputed" -> (() => bm25Precomputed(spark, sfDir, lensPath)))
    val extraResults = extras.map { case (name, fn) => timed(name)(fn()) }
    // repeated per-round runs must not accumulate /tmp parquet
    deleteRecursively(lensDir)
    deleteRecursively(sdedupRoot)
    val results = headlineResults ++ extraResults
    val loadAvgEnd = systemLoadAverage()
    // "queries" stays the driver-contract map name→seconds (now the median);
    // min/max and the load sentinel are appended keys so any round-over-round
    // comparison can tell a plan regression from a loaded machine.
    def statMap(f: Stat => Double): String = results
      .map { case (k, s) => "\"" + k + "\":" + f(s) }.mkString("{", ",", "}")
    val qs = statMap(_.median)
    val total = results.map(_._2.median).sum
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
        s""""runs_per_entry":$TimedRuns,"queries_min":${statMap(_.min)},""" +
        s""""queries_max":${statMap(_.max)},"load_avg_start":$loadAvgStart,""" +
        s""""load_avg_end":$loadAvgEnd,"cpus":"$cpus","sf":"$sfDir"}"""
    // Also write the JSON to a file so the driver gets a machine-parseable
    // record even when stdout is wrapped in sbt [info] log noise.
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json")
    try java.nio.file.Files.write(
      java.nio.file.Paths.get(outPath),
      (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    catch { case e: Throwable =>
      System.err.println(s"[bench] could not write $outPath: ${e.getMessage}")
    }
    spark.stop()
    // Print LAST, after spark.stop(), so the JSON is the final stdout line
    // (Spark shutdown logs go to stderr; sbt passes stdout through bare via
    // outputStrategy := StdoutOutput in build.sbt).
    println(json)
  }

  /** The documents corpus split into 4 micro-batches driven through
    * StreamingDedup.processBatch against an accumulating parquet signature
    * store — the foreachBatch body without the stream harness, so the
    * store-scan + broadcast-join cost per batch is what's measured.
    */
  /** Store path of the most recent 4-batch run — the accumulated-store
    * fixture for the trigger-regime entry below.
    */
  private var lastStorePath: Option[String] = None

  private def streamingDedup4Batches(
      spark: SparkSession, sfDir: String, root: java.nio.file.Path): Unit = {
    import org.apache.spark.sql.functions._
    val tmp = java.nio.file.Files.createTempDirectory(root, "run")
    val storePath = tmp.resolve("store").toString
    val outPath = tmp.resolve("out").toString
    val docs = Tables(spark, sfDir, "documents")
    (0 until 4).foreach { b =>
      val batch = docs.filter(col("doc_id") % 4 === b)
      val store = graft.streaming.StreamingDedup.readStore(
        spark, storePath, excludeBatchId = Some(b.toLong))
      val (survivors, survivorRows) = graft.streaming.StreamingDedup
        .processBatch(batch, store, "doc_id", "text")
      survivors.withColumn("batch_id", lit(b.toLong))
        .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id").parquet(outPath)
      survivorRows.withColumn("batch_id", lit(b.toLong))
        .repartition(col("band_bucket"))
        .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id", "band_bucket").parquet(storePath)
    }
    lastStorePath = Some(storePath) // root is deleted by main after all entries
  }

  /** A 2-doc re-ingest trigger against the accumulated store: measures the
    * per-trigger cost a long-running stream pays — the band_bucket-pruned
    * store read plus the broadcast band join (no writes; the write cost is
    * covered by the 4batches entry).
    */
  private def streamingDedupTrigger(spark: SparkSession, sfDir: String): Unit = {
    import org.apache.spark.sql.functions._
    val storePath = lastStorePath.getOrElse(
      throw new IllegalStateException("4batches entry must run first"))
    val batch = Tables(spark, sfDir, "documents").filter(col("doc_id") < 2)
    val store = graft.streaming.StreamingDedup.readStore(spark, storePath)
    val (survivors, _) = graft.streaming.StreamingDedup
      .processBatch(batch, store, "doc_id", "text")
    survivors.count()
    ()
  }

  /** OS 1-minute load average, or -1.0 where the platform doesn't report one
    * (the JMX contract's sentinel). Recorded at bench start and end so a
    * record captured on a loaded machine is self-identifying.
    */
  private def systemLoadAverage(): Double =
    try java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage
    catch { case _: Throwable => -1.0 }

  /** Best-effort recursive delete of a bench temp tree (cleanup must never
    * fail the bench record).
    */
  private[graft] def deleteRecursively(root: java.nio.file.Path): Unit = {
    import java.nio.file.{Files, Path}
    import java.util.Comparator
    try {
      val stream = Files.walk(root)
      try stream.sorted(Comparator.reverseOrder[Path]())
        .forEach(p => { Files.deleteIfExists(p); () })
      finally stream.close()
    } catch { case e: Throwable =>
      System.err.println(s"[bench] temp cleanup of $root failed: ${e.getMessage}")
    }
  }

  /** All eight curation stages enabled (q3m keeps the near-dup CC and the
    * surprisal band off because they're oracled separately): repetition
    * filter → exact dedup → MinHash near-dup clusters → decontamination →
    * LM band (wide: the cost is the scoring, not the selectivity) → PII
    * scrub → domain cap → deterministic sample.
    */
  private def curateFull(spark: SparkSession, sfDir: String): Unit = {
    import org.apache.spark.sql.functions._
    val d = Tables(spark, sfDir, "documents")
    graft.operators.Curate.run(
      d.filter(col("doc_id") >= 20), "doc_id", "text", "source",
      benchmarks = Some(d.filter(col("doc_id") < 20)),
      cfg = graft.operators.Curate.Config(
        nearDupMinJaccard = Some(0.5),
        surprisalBand = Some((0.0, 100.0)),
        capPerSource = Some(15),
        sampleRate = 0.8,
        salt = "curate",
        repetitionMaxDup5gram = Some(0.9),
        // canonicalize tracked (NFC UDF scan cost); C4 page rules stay off
        // HERE only because the fixture is unpunctuated word salad — the
        // stage would empty the corpus and zero out every later stage's
        // cost, making the bench line meaningless
        canonicalize = true)).count()
    ()
  }

  /** q38's BM25 with the per-doc length table read from a pre-materialized
    * parquet instead of the inline corpus scan — the amortized retrieval
    * path (the lens write happens untimed in main).
    */
  private def bm25Precomputed(spark: SparkSession, sfDir: String, lensPath: String): Unit = {
    graft.operators.KeywordSearch.bm25(
      Tables(spark, sfDir, "documents"), "doc_id", "text",
      Seq("spark", "window", "merge"), k = 10,
      lens = Some(spark.read.parquet(lensPath))).count()
    ()
  }
}
