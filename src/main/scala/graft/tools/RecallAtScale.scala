package graft.tools

import graft.Tables
import graft.operators.{Dedup, IvfIndex, VectorSearch}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Recall measurement for the approximate paths at an arbitrary scale factor
  * (SPARK_GRAFT_SF_DIR) — the same numbers RecallSpec gates at sf0.01
  * (LSH single/multi-probe/8-table, minhash banding, IVF draw/refined),
  * runnable per-round at sf0.1+ so the recall contracts in SCALE.md stay
  * scale-verified instead of extrapolated:
  *
  *   tools/run_verify.sh x x graft.tools.RecallAtScale
  */
object RecallAtScale {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .appName("graft-recall")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val emb = Tables(spark, sfDir, "embeddings")
    val queries = emb.filter(col("vec_id") < 50)
      .select(col("vec_id").as("q_id"), col("embedding").as("qv"))
    val corpus = emb.select(col("vec_id").as("c_id"), col("embedding").as("cv"))
    val exact = VectorSearch.knnJoin(queries, corpus, "q_id", "qv", "c_id", "cv", k = 10)
      .localCheckpoint()
    val rSingle = RecallHarness.knnRecall(VectorSearch.lshBucketJoin(
      queries, corpus, "q_id", "qv", "c_id", "cv", k = 10, nBits = 4), exact)
    val rMulti = RecallHarness.knnRecall(VectorSearch.lshBucketJoin(
      queries, corpus, "q_id", "qv", "c_id", "cv", k = 10, nBits = 4,
      multiProbe = true), exact)
    val rTables = RecallHarness.knnRecall(VectorSearch.lshBucketJoin(
      queries, corpus, "q_id", "qv", "c_id", "cv", k = 10, nBits = 4,
      multiProbe = true, nTables = 8), exact)

    val docs = Tables(spark, sfDir, "documents").select(col("doc_id"), col("text"))
    val exactPairs = RecallHarness.pairSet(Dedup.ngramJaccardPairs(
      docs.withColumn("blk", lit(1)), "doc_id", "text", Seq("blk"))
      .filter(col("jaccard") >= 0.5), "doc_a", "doc_b")
    val lshPairs = RecallHarness.pairSet(Dedup.minhashCandidatePairs(
      docs, "doc_id", "text", minEstJaccard = 0.4), "doc_a", "doc_b")
    val rMinhash =
      if (exactPairs.isEmpty) Double.NaN
      else (exactPairs intersect lshPairs).size.toDouble / exactPairs.size

    // LSH-bucketed embedding near-dup pairs vs the exact quadratic (same
    // config RecallSpec gates: threshold 0.3, 2 bits × 4 tables)
    val exactCos = RecallHarness.pairSet(VectorSearch.cosinePairs(
      emb, "vec_id", "embedding", threshold = 0.3), "vec_a", "vec_b")
    val approxCos = RecallHarness.pairSet(VectorSearch.cosinePairsLsh(
      emb, "vec_id", "embedding", threshold = 0.3, nBits = 2, nTables = 4),
      "vec_a", "vec_b")
    val rNearDup =
      if (exactCos.isEmpty) Double.NaN
      else (approxCos intersect exactCos).size.toDouble / exactCos.size

    // IVF (same config RecallSpec gates at sf0.01: K=16, 30 queries, k=10),
    // measured through the SHARED RecallHarness.ivfMeanRecall
    val vecs = RecallHarness.collectVecs(emb)
    val draw = IvfIndex.centroidsByDraw(emb, "vec_id", "embedding", nCells = 16)
    val rIvf4 = RecallHarness.ivfMeanRecall(emb, vecs, draw, nProbe = 4)
    val rIvf8 = RecallHarness.ivfMeanRecall(emb, vecs, draw, nProbe = 8)
    val refined = IvfIndex.refine(emb, "embedding", draw, iters = 3)
    val rIvfKm4 = RecallHarness.ivfMeanRecall(emb, vecs, refined, nProbe = 4)
    val rQuant = RecallHarness.ivfQuantOverlap(emb, draw)

    // PQ (same codebook configs RecallSpec gates at sf0.01: the oracled
    // m=8/16 draw and the trained m=16/64 k-means serving book). The
    // shortlist is ADAPTIVE (round 5): max(50, ceil(0.10 × N)) — at sf0.01
    // that is exactly the gated r=50, at larger SFs r/N holds the gated
    // operating point instead of decaying (the measured fixed-r=50 cliff).
    val rAdapt = graft.operators.PqIndex.adaptiveShortlist(emb.count(), k = 10)
    val pqDraw = graft.operators.PqIndex.codebookByDraw(
      emb, "vec_id", "embedding", m = 8, nCodes = 16)
    val rPqDrawAdc = RecallHarness.pqMeanRecall(emb, pqDraw, rerank = None)
    val rPqDrawRr = RecallHarness.pqMeanRecall(emb, pqDraw, rerank = Some(rAdapt))
    val pqTrained = graft.operators.PqIndex.refineCodebook(emb, "embedding",
      graft.operators.PqIndex.codebookByDraw(emb, "vec_id", "embedding", m = 16, nCodes = 64),
      iters = 3)
    val rPqAdc = RecallHarness.pqMeanRecall(emb, pqTrained, rerank = None)
    val rPqRr = RecallHarness.pqMeanRecall(emb, pqTrained, rerank = Some(rAdapt))

    // Matryoshka prefix search (q3w shape: coarse shortlist on the prefix,
    // exact rerank to top-10) — 20 queries, adaptive shortlist
    val q20 = emb.filter(col("vec_id") < 20)
      .select(col("vec_id").as("q_id"), col("embedding").as("qv"))
    val exact20 = VectorSearch.knnJoin(q20, corpus, "q_id", "qv", "c_id", "cv", k = 10)
      .localCheckpoint()
    val rMrl16 = RecallHarness.knnRecall(
      RecallHarness.matryoshkaRerank(q20, corpus, prefix = 16, shortlist = rAdapt, k = 10), exact20)
    val rMrl32 = RecallHarness.knnRecall(
      RecallHarness.matryoshkaRerank(q20, corpus, prefix = 32, shortlist = rAdapt, k = 10), exact20)

    // Recall auto-tuner (round 8): the full measured (nCells, nProbe) curve
    // plus the cheapest config at target 0.90 — the SCALE.md trade-off table
    val tune = IvfIndex.tuneForRecall(
      emb, "vec_id", "embedding", targetRecall = 0.90, k = 10)
    val curveJson = tune.curve.map(p =>
      f"""{"n_cells":${p.nCells},"n_probe":${p.nProbe},""" +
        f""""recall":${p.recall}%.4f,"scan_frac":${p.scanFrac}%.4f}""")
      .mkString("[", ",", "]")
    val bestJson = tune.best.map(p =>
      f"""{"n_cells":${p.nCells},"n_probe":${p.nProbe},""" +
        f""""recall":${p.recall}%.4f,"scan_frac":${p.scanFrac}%.4f}""")
      .getOrElse("null")
    val slTune = graft.operators.PqIndex.tuneShortlistForRecall(
      emb, "vec_id", "embedding", pqTrained, targetRecall = 0.90, k = 10)
    val slJson = slTune.curve.map(p =>
      f"""{"r":${p.r},"recall":${p.recall}%.4f,"rerank_frac":${p.rerankFrac}%.4f}""")
      .mkString("[", ",", "]")

    // Cross-method tuner (round 9): IVF and graph-beam points on ONE cost
    // axis, cheapest config at target 0.95 — the tier selection the graph
    // tier exists for (at sf0.1 no IVF point reaches 0.95 below exhaustive)
    val annTune = graft.operators.AnnTuner.tune(
      emb, "vec_id", "embedding", targetRecall = 0.95, k = 10,
      nCellsGrid = Seq(16, 64), nQueries = 30)
    def annPointJson(p: graft.operators.AnnTuner.AnnPoint) =
      f"""{"method":"${p.method}","config":"${p.config}",""" +
        f""""recall":${p.recall}%.4f,"cost_frac":${p.costFrac}%.4f}"""
    val annCurveJson = annTune.curve.map(annPointJson).mkString("[", ",", "]")
    val annBestJson = annTune.best.map(annPointJson).getOrElse("null")

    spark.stop()
    println(f"""{"sf":"$sfDir","lsh_single":$rSingle%.4f,"lsh_multiprobe":$rMulti%.4f,""" +
      f""""lsh_8table":$rTables%.4f,"minhash_banding":$rMinhash%.4f,""" +
      f""""minhash_true_pairs":${exactPairs.size},""" +
      f""""ivf_draw_nprobe4":$rIvf4%.4f,"ivf_draw_nprobe8":$rIvf8%.4f,""" +
      f""""ivf_kmeans3_nprobe4":$rIvfKm4%.4f,""" +
      f""""ivf_quant_overlap":$rQuant%.4f,""" +
      f""""shortlist_r":$rAdapt,""" +
      f""""pq_draw_adc":$rPqDrawAdc%.4f,"pq_draw_rerank":$rPqDrawRr%.4f,""" +
      f""""pq_kmeans_adc":$rPqAdc%.4f,"pq_kmeans_rerank":$rPqRr%.4f,""" +
      f""""matryoshka16_rerank":$rMrl16%.4f,"matryoshka32_rerank":$rMrl32%.4f,""" +
      f""""neardup_lsh_pairs":$rNearDup%.4f,"neardup_true_pairs":${exactCos.size},""" +
      s""""ivf_tuner_best":$bestJson,"ivf_tuner_curve":$curveJson,""" +
      s""""pq_shortlist_curve":$slJson,""" +
      s""""ann_tuner_best":$annBestJson,"ann_tuner_curve":$annCurveJson}""")
  }
}
