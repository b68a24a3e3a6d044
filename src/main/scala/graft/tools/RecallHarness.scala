package graft.tools

import graft.operators.IvfIndex
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** THE recall measurement used by both the sf0.01 spec gates (RecallSpec)
  * and the per-round scale verification (RecallAtScale) — one
  * implementation so the gated numbers and the SCALE.md-reported numbers
  * can never desynchronize.
  */
object RecallHarness {

  /** Recall of an approximate k-NN result vs the exact one, both shaped
    * (query_id, neighbor_id).
    */
  def knnRecall(approx: DataFrame, exact: DataFrame): Double = {
    val e = exact.select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val a = approx.select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    (e intersect a).size.toDouble / e.size
  }

  /** Id-pair set of a pair frame (first two columns are long ids). */
  def pairSet(df: DataFrame, aCol: String, bCol: String): Set[(Long, Long)] =
    df.select(aCol, bCol).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  /** Matryoshka two-stage result: coarse `shortlist`-NN on the `prefix`-dim
    * slice, exact full-dim rerank to top-`k` — (query_id, neighbor_id) rows
    * for [[knnRecall]] against an exact frame. Queries/corpus are the
    * (q_id, qv)/(c_id, cv) shapes of `VectorSearch.knnJoin`. `shortlist ≤ 0`
    * (the default) sizes it adaptively — `PqIndex.adaptiveShortlist` over
    * the corpus count — so coarse-stage recall holds the gated r/N point as
    * the corpus grows instead of decaying at a fixed r.
    */
  def matryoshkaRerank(
      queries: DataFrame, corpus: DataFrame,
      prefix: Int, shortlist: Int = -1, k: Int): DataFrame = {
    import graft.functions.VectorFunctions
    import graft.operators.VectorSearch
    val r = if (shortlist > 0) shortlist
      else graft.operators.PqIndex.adaptiveShortlist(corpus.count(), k)
    val tq = queries.select(col("q_id"),
      VectorFunctions.matryoshka(col("qv"), prefix).as("qv"))
    val tc = corpus.select(col("c_id"),
      VectorFunctions.matryoshka(col("cv"), prefix).as("cv"))
    val short = VectorSearch.knnJoin(tq, tc, "q_id", "qv", "c_id", "cv", k = r)
      .select(col("query_id").as("q_id"), col("neighbor_id").as("c_id"))
    val rescored = short
      .join(queries, "q_id").join(corpus, "c_id")
      .select(col("q_id"), col("c_id"),
        VectorFunctions.cosine(col("cv"), col("qv")).as("score"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("q_id")
      .orderBy(col("score").desc, col("c_id"))
    rescored.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .select(col("q_id").as("query_id"), col("c_id").as("neighbor_id"))
  }

  def collectVecs(emb: DataFrame): Array[(Long, Array[Float])] =
    emb.select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getAs[scala.collection.Seq[Float]](1).toArray)
      .sortBy(_._1)

  /** Mean IVF recall@k over the first `nQueries` vectors: ONE Spark job for
    * the real assignment path; the exact and probed rankings are computed
    * locally with the identical arithmetic of the codegen expression
    * (cosineScalar/roundHalfUp — IvfSpec's argmax cross-check proves the
    * equivalence).
    */
  /** Mean top-k id overlap of quantized-IVF vs float-IVF search over the
    * first `nQueries` vectors — the int8 fidelity number (both sides run
    * the REAL distributed search path).
    */
  def ivfQuantOverlap(
      emb: DataFrame, idx: IvfIndex.Index,
      nQueries: Int = 10, nProbe: Int = 4, k: Int = 10): Double = {
    val assigned = IvfIndex.assign(emb, "embedding", idx).localCheckpoint()
    val store = IvfIndex.quantizedStore(emb, "embedding", idx).localCheckpoint()
    val queries = collectVecs(emb).take(nQueries)
    val per = queries.flatMap { case (qid, qv) =>
      def ids(df: DataFrame) =
        df.select("vec_id").collect().map(_.getLong(0)).toSet
      val float = ids(IvfIndex.search(
        assigned.filter(col("vec_id") =!= qid), "embedding", qv, idx,
        nProbe = nProbe, k = k, tiebreak = Some("vec_id")))
      val quant = ids(IvfIndex.searchQuantized(
        store.filter(col("vec_id") =!= qid), "q8", "scale", qv, idx,
        nProbe = nProbe, k = k, tiebreak = Some("vec_id")))
      // a query whose probed cells are empty has no ranking to compare —
      // skip it rather than let 0/0 poison the mean with NaN
      if (float.isEmpty) None
      else Some((float intersect quant).size.toDouble / float.size)
    }
    require(per.nonEmpty, "every probe set was empty — index degenerate")
    per.sum / per.length
  }

  /** Mean PQ recall@k over the first `nQueries` vectors, running the REAL
    * distributed search path (encode once, ADC per query; optionally the
    * two-stage re-rank with shortlist `rerank`). Exact ground truth is the
    * local cosine ranking with the codegen expression's arithmetic.
    */
  def pqMeanRecall(
      emb: DataFrame, cb: graft.operators.PqIndex.Codebook,
      rerank: Option[Int], nQueries: Int = 10, k: Int = 10): Double = {
    import graft.operators.PqIndex
    val encoded = PqIndex.encode(emb, "embedding", cb).localCheckpoint()
    val vecs = collectVecs(emb)
    val per = vecs.take(nQueries).map { case (qid, qv) =>
      def ids(df: DataFrame) =
        df.select("vec_id").collect().map(_.getLong(0)).toSet
      val exact = vecs.filter(_._1 != qid).map { case (id, v) =>
        (IvfIndex.roundHalfUp(IvfIndex.cosineScalar(v, qv), 6), id)
      }.sortBy { case (s, id) => (-s, id) }.take(k).map(_._2).toSet
      val cand = encoded.filter(col("vec_id") =!= qid)
      val got = rerank match {
        case Some(r) =>
          ids(PqIndex.searchRerank(cand, "vec_id", "embedding", "pq", qv, cb, r, k))
        case None => ids(PqIndex.search(cand, "pq", qv, cb, k, tiebreak = "vec_id"))
      }
      (exact intersect got).size.toDouble / exact.size
    }
    per.sum / per.length
  }

  def ivfMeanRecall(
      emb: DataFrame, vecs: Array[(Long, Array[Float])], idx: IvfIndex.Index,
      nProbe: Int, nQueries: Int = 30, k: Int = 10): Double = {
    val cell = IvfIndex.assign(emb, "embedding", idx)
      .select(col("vec_id"), col("cell")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val queries = vecs.take(nQueries)
    val per = queries.map { case (qid, qv) =>
      def ranked(cand: Array[(Long, Array[Float])]) =
        cand.map { case (id, v) =>
          (IvfIndex.roundHalfUp(IvfIndex.cosineScalar(v, qv), 6), id)
        }.sortBy { case (s, id) => (-s, id) }.take(k).map(_._2).toSet
      val exact = ranked(vecs.filter(_._1 != qid))
      val probes = IvfIndex.probeCells(idx, qv, nProbe).toSet
      val got = ranked(vecs.filter { case (id, _) =>
        id != qid && probes.contains(cell(id)) })
      (exact intersect got).size.toDouble / exact.size
    }
    per.sum / per.length
  }
}
