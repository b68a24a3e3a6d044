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

    def recallOfKnn(approx: DataFrame, exact: DataFrame): Double = {
      val e = exact.select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val a = approx.select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      (e intersect a).size.toDouble / e.size
    }

    val emb = Tables(spark, sfDir, "embeddings")
    val queries = emb.filter(col("vec_id") < 50)
      .select(col("vec_id").as("q_id"), col("embedding").as("qv"))
    val corpus = emb.select(col("vec_id").as("c_id"), col("embedding").as("cv"))
    val exact = VectorSearch.knnJoin(queries, corpus, "q_id", "qv", "c_id", "cv", k = 10)
      .localCheckpoint()
    val rSingle = recallOfKnn(VectorSearch.lshBucketJoin(
      queries, corpus, "q_id", "qv", "c_id", "cv", k = 10, nBits = 4), exact)
    val rMulti = recallOfKnn(VectorSearch.lshBucketJoin(
      queries, corpus, "q_id", "qv", "c_id", "cv", k = 10, nBits = 4,
      multiProbe = true), exact)
    val rTables = recallOfKnn(VectorSearch.lshBucketJoin(
      queries, corpus, "q_id", "qv", "c_id", "cv", k = 10, nBits = 4,
      multiProbe = true, nTables = 8), exact)

    val docs = Tables(spark, sfDir, "documents").select(col("doc_id"), col("text"))
    val exactPairs = Dedup.ngramJaccardPairs(
      docs.withColumn("blk", lit(1)), "doc_id", "text", Seq("blk"))
      .filter(col("jaccard") >= 0.5)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lshPairs = Dedup.minhashCandidatePairs(docs, "doc_id", "text",
      minEstJaccard = 0.4)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val rMinhash =
      if (exactPairs.isEmpty) Double.NaN
      else (exactPairs intersect lshPairs).size.toDouble / exactPairs.size

    // LSH-bucketed embedding near-dup pairs vs the exact quadratic (same
    // config RecallSpec gates: threshold 0.3, 2 bits × 4 tables)
    def pairSet(df: DataFrame) =
      df.select("vec_a", "vec_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exactCos = pairSet(VectorSearch.cosinePairs(
      emb, "vec_id", "embedding", threshold = 0.3))
    val approxCos = pairSet(VectorSearch.cosinePairsLsh(
      emb, "vec_id", "embedding", threshold = 0.3, nBits = 2, nTables = 4))
    val rNearDup =
      if (exactCos.isEmpty) Double.NaN
      else (approxCos intersect exactCos).size.toDouble / exactCos.size

    // IVF (same config RecallSpec gates at sf0.01: K=16, 30 queries, k=10).
    // One Spark job per index for the real assignment path; ranking math is
    // local — cosineScalar/roundHalfUp mirror the codegen arithmetic
    // (IvfSpec argmax cross-check).
    val vecs = emb.select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getAs[scala.collection.Seq[Float]](1).toArray)
      .sortBy(_._1)
    val ivfQueries = vecs.take(30)
    def ivfRecall(idx: IvfIndex.Index, nProbe: Int): Double = {
      val cell = IvfIndex.assign(emb, "embedding", idx)
        .select(col("vec_id"), col("cell")).collect()
        .map(r => r.getLong(0) -> r.getInt(1)).toMap
      val per = ivfQueries.map { case (qid, qv) =>
        def ranked(cand: Array[(Long, Array[Float])]) =
          cand.map { case (id, v) =>
            (IvfIndex.roundHalfUp(IvfIndex.cosineScalar(v, qv), 6), id)
          }.sortBy { case (s, id) => (-s, id) }.take(10).map(_._2).toSet
        val ex = ranked(vecs.filter(_._1 != qid))
        val probes = IvfIndex.probeCells(idx, qv, nProbe).toSet
        val got = ranked(vecs.filter { case (id, _) =>
          id != qid && probes.contains(cell(id)) })
        (ex intersect got).size.toDouble / ex.size
      }
      per.sum / per.length
    }
    val draw = IvfIndex.centroidsByDraw(emb, "vec_id", "embedding", nCells = 16)
    val rIvf4 = ivfRecall(draw, nProbe = 4)
    val rIvf8 = ivfRecall(draw, nProbe = 8)
    val refined = IvfIndex.refine(emb, "embedding", draw, iters = 3)
    val rIvfKm4 = ivfRecall(refined, nProbe = 4)

    spark.stop()
    println(f"""{"sf":"$sfDir","lsh_single":$rSingle%.4f,"lsh_multiprobe":$rMulti%.4f,""" +
      f""""lsh_8table":$rTables%.4f,"minhash_banding":$rMinhash%.4f,""" +
      f""""minhash_true_pairs":${exactPairs.size},""" +
      f""""ivf_draw_nprobe4":$rIvf4%.4f,"ivf_draw_nprobe8":$rIvf8%.4f,""" +
      f""""ivf_kmeans3_nprobe4":$rIvfKm4%.4f,""" +
      f""""neardup_lsh_pairs":$rNearDup%.4f,"neardup_true_pairs":${exactCos.size}}""")
  }
}
