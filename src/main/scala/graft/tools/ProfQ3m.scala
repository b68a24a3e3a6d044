package graft.tools

import graft.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage profile of the `q3m_full_curation` bench entry (round 12, VERDICT
  * r11 task 5: the entry drifted 4.33 → ~5.0-5.5 s across rounds 10-12
  * while no Curate code changed — name the stage that moved). Runs the
  * EXACT bench configuration twice (first untimed, the bench's own
  * steady-state protocol), then times each cumulative stage's count
  * separately so the per-stage delta is attributable.
  */
object ProfQ3m {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val d = Tables(spark, dir, "documents")
    val cfg = graft.operators.Curate.Config(
      nearDupMinJaccard = Some(0.5),
      surprisalBand = Some((0.0, 100.0)),
      capPerSource = Some(15),
      sampleRate = 0.8,
      salt = "curate",
      repetitionMaxDup5gram = Some(0.9),
      canonicalize = true)
    def stages() = graft.operators.Curate.stages(
      d.filter(col("doc_id") >= 20), "doc_id", "text", "source",
      benchmarks = Some(d.filter(col("doc_id") < 20)), cfg = cfg)
    // untimed warmup — codegen + JIT + page cache, the bench protocol
    stages().last._2.count()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          val names = js.stageInfos.map(_.name).mkString(" | ")
          println(s"  [job ${js.jobId}] $names")
        }
      })
    // construction-cost ablation: which stage's CONSTRUCTION runs eager
    // jobs? (benchmarks → Bloom build; surprisalBand → LM fit; the rest
    // should be lazy)
    def constr(name: String, c: graft.operators.Curate.Config,
        bm: Option[org.apache.spark.sql.DataFrame]): Unit = {
      val j0 = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
      val t0 = System.nanoTime()
      graft.operators.Curate.stages(
        d.filter(col("doc_id") >= 20), "doc_id", "text", "source",
        benchmarks = bm, cfg = c)
      val dj = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length - j0
      println(f"${s"constr[$name]"}%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s  ($dj jobs)")
    }
    val bm = Some(d.filter(col("doc_id") < 20))
    (0 until 2).foreach { _ =>
      constr("all-off", graft.operators.Curate.Config(
        nearDupMinJaccard = None, salt = "curate"), None)
      constr("only-canon", graft.operators.Curate.Config(
        nearDupMinJaccard = None, canonicalize = true, salt = "curate"), None)
      constr("only-rep", graft.operators.Curate.Config(
        nearDupMinJaccard = None, repetitionMaxDup5gram = Some(0.9),
        salt = "curate"), None)
      constr("no-neardup", graft.operators.Curate.Config(
        repetitionMaxDup5gram = Some(0.9),
        canonicalize = true, salt = "curate"), None)
      constr("dedup-only", graft.operators.Curate.Config(
        nearDupMinJaccard = Some(0.5), repetitionMaxDup5gram = Some(0.9),
        canonicalize = true, salt = "curate"), None)
      constr("+decontaminate", graft.operators.Curate.Config(
        nearDupMinJaccard = Some(0.5), repetitionMaxDup5gram = Some(0.9),
        canonicalize = true, salt = "curate"), bm)
      constr("+surprisal", graft.operators.Curate.Config(
        nearDupMinJaccard = Some(0.5), repetitionMaxDup5gram = Some(0.9),
        canonicalize = true, salt = "curate",
        surprisalBand = Some((0.0, 100.0))), bm)
      constr("full", cfg, bm)
    }
    (0 until 2).foreach { rep =>
      println(s"--- rep $rep")
      // the exact bench body first: construction (eager LM/Bloom fits
      // included) + one count — this is the number the bench reports
      val tAll0 = System.nanoTime()
      graft.operators.Curate.run(
        d.filter(col("doc_id") >= 20), "doc_id", "text", "source",
        benchmarks = Some(d.filter(col("doc_id") < 20)), cfg = cfg).count()
      println(f"END-TO-END (bench body) ${(System.nanoTime() - tAll0) / 1e9}%7.2f s")
      val tC0 = System.nanoTime()
      val st = stages()
      println(f"stage construction      ${(System.nanoTime() - tC0) / 1e9}%7.2f s")
      st.foreach { case (name, df) =>
        val t0 = System.nanoTime()
        val n = df.count()
        println(f"$name%-18s ${(System.nanoTime() - t0) / 1e9}%7.2f s  ($n rows)")
      }
    }
  }
}
