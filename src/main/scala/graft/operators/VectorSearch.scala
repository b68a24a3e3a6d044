package graft.operators

import graft.functions.{GraftFunctions, VectorFunctions}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (SURVEY.md §2.3 J2, §2.5 T1).
  *
  * Exact brute force is the baseline: a broadcast of the query vector(s),
  * a codegen'd cosine, and `TakeOrderedAndProject` (single query) or a
  * per-query-key window (k-NN join). Both scan the corpus once with no
  * corpus-side shuffle; the k-NN join shuffles only (query, candidate)
  * score rows. [[lshBucketJoin]] is the approximate scale path: random
  * hyperplane signs bucket the corpus so each query only scores one bucket.
  */
object VectorSearch {

  /** Exact top-k for one query vector: `orderBy(desc).limit(k)` lowers to
    * TakeOrderedAndProject — per-partition heaps, no global sort.
    * `scoreScale` rounds scores for engine-independent output (None = raw).
    */
  def topK(
      corpus: DataFrame, vecCol: String, queryVec: Array[Float], k: Int,
      filter: Column = lit(true), scoreScale: Option[Int] = None,
      tiebreak: Option[String] = None): DataFrame = {
    val raw = VectorFunctions.cosine(col(vecCol), typedLit(queryVec))
    val score = scoreScale.fold(raw)(s => round(raw, s))
    // equal (rounded) scores at the k boundary need a unique tiebreak for
    // run-to-run determinism; callers pass their id column, and the chunks
    // convention ("id", else "doc_id"/"document_id") is picked up by default
    val tb = tiebreak.orElse(
      Seq("id", "doc_id", "document_id", "vec_id").find(corpus.columns.contains))
    val ordering = col("score").desc +: tb.map(col(_).asc).toSeq
    corpus.where(filter)
      .withColumn("score", score)
      .orderBy(ordering: _*)
      .limit(k)
  }

  /** Exact k-NN join: for every row of `queries`, the top-k rows of `corpus`.
    * Queries are broadcast; corpus partitions compute scores locally; the
    * window shuffles only by query id. Self-matches excluded by id inequality.
    */
  def knnJoin(
      queries: DataFrame, corpus: DataFrame,
      qId: String, qVec: String, cId: String, cVec: String,
      k: Int, scoreScale: Int = 6): DataFrame = {
    val scored = corpus.crossJoin(broadcast(queries))
      .filter(col(qId) =!= col(cId))
      .withColumn("score", round(VectorFunctions.cosine(col(cVec), col(qVec)), scoreScale))
    val w = Window.partitionBy(col(qId)).orderBy(col("score").desc, col(cId))
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col(qId).as("query_id"), col(cId).as("neighbor_id"),
        col("score"), col("rn"))
  }

  /** Exact k-NN join via the top-k heap aggregator: same results as
    * [[knnJoin]] but with map-side partial aggregation — each partition
    * ships ≤ k candidates per query instead of its whole scored slice.
    * The scale-preferred shape for large corpora. Candidate ids may be
    * numeric (tiebreak: numeric asc) or string, e.g. uuid chunk ids
    * (tiebreak: lexicographic asc, matching [[knnJoin]]'s `orderBy(cId)` on
    * the same type).
    */
  /** The map-side top-k heap aggregator for `cId`'s type. Integral OR
    * string only: a fractional id would be silently truncated by the
    * aggregator's long buffer and merge distinct candidates.
    */
  private def topAggFor(corpus: DataFrame, cId: String, k: Int) = {
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType, StringType}
    corpus.schema(cId).dataType match {
      case ByteType | ShortType | IntegerType | LongType =>
        graft.functions.TopKAggregator.topK(k)(col("score"), col(cId))
      case StringType =>
        graft.functions.TopKAggregator.topKString(k)(col("score"), col(cId))
      case other => throw new IllegalArgumentException(
        s"top-k aggregation: unsupported id type $other for column $cId " +
          "(use integral or string ids, or knnJoin)")
    }
  }

  def knnJoinViaAggregator(
      queries: DataFrame, corpus: DataFrame,
      qId: String, qVec: String, cId: String, cVec: String,
      k: Int, scoreScale: Int = 6): DataFrame = {
    val scored = corpus.crossJoin(broadcast(queries))
      .filter(col(qId) =!= col(cId))
      .withColumn("score", round(VectorFunctions.cosine(col(cVec), col(qVec)), scoreScale))
    val topAgg = topAggFor(corpus, cId, k)
    scored.groupBy(col(qId).as("query_id"))
      .agg(topAgg.as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("pos", "hit")))
      .select(col("query_id"), col("hit.id").as("neighbor_id"),
        col("hit.score").as("score"), (col("pos") + 1).cast("int").as("rn"))
  }

  /** Contrastive hard-negative mining for embedding training: per anchor,
    * the top-k corpus neighbors whose cosine lands in [floor, ceiling) —
    * high enough to be confusable (the negatives that actually move a
    * contrastive loss), but BELOW the near-duplicate band, which would be
    * false negatives / label leakage (those belong to
    * [[semanticDedup]] / [[semanticDecontaminate]], not here).
    *
    * Scale shape: anchors (an eval set, a training-batch sample) broadcast;
    * the band filter runs BEFORE the top-k heap aggregation, so selection
    * happens among eligible candidates only, and each map task ships ≤ k
    * survivors per anchor (the [[knnJoinViaAggregator]] discipline). For
    * anchor sets too large to broadcast, pre-restrict candidates with an
    * IVF probe ([[graft.operators.IvfIndex]]) and feed the probed pool in
    * as `corpus`.
    */
  def hardNegatives(
      queries: DataFrame, corpus: DataFrame,
      qId: String, qVec: String, cId: String, cVec: String,
      k: Int, ceiling: Double, floor: Double = -1.0,
      scoreScale: Int = 6): DataFrame = {
    require(floor < ceiling, s"floor $floor must be < ceiling $ceiling")
    val scored = corpus.crossJoin(broadcast(queries))
      .filter(col(qId) =!= col(cId))
      .withColumn("score", round(VectorFunctions.cosine(col(cVec), col(qVec)), scoreScale))
      .filter(col("score") < ceiling && col("score") >= floor)
    val topAgg = topAggFor(corpus, cId, k)
    scored.groupBy(col(qId).as("query_id"))
      .agg(topAgg.as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("pos", "hit")))
      .select(col("query_id"), col("hit.id").as("neighbor_id"),
        col("hit.score").as("score"), (col("pos") + 1).cast("int").as("rn"))
  }

  /** All pairs with cosine ≥ threshold within the (bounded) input — embedding
    * near-duplicate detection. Quadratic: callers bound or pre-bucket input.
    */
  def cosinePairs(
      emb: DataFrame, idCol: String, vecCol: String,
      threshold: Double, scoreScale: Int = 6): DataFrame = {
    val a = emb.select(col(idCol).as("vec_a"), col(vecCol).as("v_a"))
    val b = emb.select(col(idCol).as("vec_b"), col(vecCol).as("v_b"))
    a.join(broadcast(b), col("vec_a") < col("vec_b"))
      .withColumn("score", round(VectorFunctions.cosine(col("v_a"), col("v_b")), scoreScale))
      .filter(col("score") >= threshold)
      .select(col("vec_a"), col("vec_b"), col("score"))
  }

  /** Approximate path: random-hyperplane LSH bucketing. `nBits` sign bits of
    * dot products with fixed pseudo-random hyperplanes form the bucket id;
    * near vectors collide with high probability. Joining query and corpus on
    * bucket id turns O(|Q|×|C|) scoring into O(collisions).
    *
    * Recall levers, composable:
    *  - `multiProbe`: each query also probes every hamming-1 neighbor bucket
    *    (probe-side only — the corpus is still bucketed once per table).
    *  - `nTables`: L independent hash tables (distinct hyperplane seeds);
    *    candidates are the union across tables — recall 1−(1−p)^L at L× the
    *    corpus bucketing cost. The standard LSH scale knob.
    * Candidate (query, candidate) pairs colliding in several tables are
    * deduplicated before scoring, so output ranks stay exact top-k of the
    * candidate set.
    */
  def lshBucketJoin(
      queries: DataFrame, corpus: DataFrame,
      qId: String, qVec: String, cId: String, cVec: String,
      k: Int, nBits: Int = 8, dim: Int = 64, scoreScale: Int = 6,
      multiProbe: Boolean = false, nTables: Int = 1): DataFrame = {
    def tableBuckets(vec: String) = explode(array((0 until nTables).map(t =>
      struct(lit(t).as("tbl"),
        hyperplaneBucket(col(vec), nBits, dim, seedBase = t * nBits).as("bucket"))): _*))
    def withBuckets(df: DataFrame, vec: String): DataFrame =
      df.withColumn("__tb", tableBuckets(vec))
        .withColumn("tbl", col("__tb.tbl"))
        .withColumn("bucket", col("__tb.bucket"))
        .drop("__tb")
    val qBucket = withBuckets(queries, qVec)
    // multi-probe: flipping single sign bits recovers vectors that landed
    // just across one hyperplane, at (nBits+1)× probe cost per table
    val qb =
      if (!multiProbe) qBucket
      else qBucket.withColumn("bucket",
        explode(array((col("bucket") +:
          (0 until nBits).map(b => col("bucket").bitwiseXOR(lit(1L << b)))): _*)))
    val cb = withBuckets(corpus, cVec)
    val joined = cb.join(broadcast(qb), Seq("tbl", "bucket"))
      .filter(col(qId) =!= col(cId))
    // same pair can collide in several tables; dedup only when possible so
    // the single-table plan keeps its shuffle-free candidate phase
    val candidates =
      if (nTables > 1) joined.dropDuplicates(qId, cId) else joined
    val scored = candidates
      .withColumn("score", round(VectorFunctions.cosine(col(cVec), col(qVec)), scoreScale))
    val w = Window.partitionBy(col(qId)).orderBy(col("score").desc, col(cId))
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col(qId).as("query_id"), col(cId).as("neighbor_id"), col("score"), col("rn"))
  }

  /** All pairs with cosine ≥ threshold, restricted to LSH bucket collisions —
    * the scale path for [[cosinePairs]] (embedding-cosine near-duplicate
    * detection over an unbounded corpus). Each vector is bucketed in
    * `nTables` independent hyperplane families (one scan, buckets exploded);
    * the self-join on (table, bucket) is a plain equality join — linear
    * shuffle, quadratic only inside buckets, no broadcast side. Candidate
    * pairs colliding in several tables are deduplicated before scoring.
    * Recall vs the exact quadratic is gated in RecallSpec (≈0.85 at
    * nBits=2 × 4 tables on near-isotropic vectors, flat from sf0.01→sf0.1);
    * more tables raise recall linearly in cost, more bits cut cost for
    * high-similarity-only workloads.
    */
  def cosinePairsLsh(
      emb: DataFrame, idCol: String, vecCol: String, threshold: Double,
      nBits: Int = 2, dim: Int = 64, nTables: Int = 4,
      scoreScale: Int = 6): DataFrame = {
    val buckets = explode(array((0 until nTables).map(t =>
      struct(lit(t).as("tbl"),
        hyperplaneBucket(col(vecCol), nBits, dim, seedBase = t * nBits).as("bucket"))): _*))
    // bucketed ids ONLY: the collision join and pair-dedup shuffle narrow
    // (id, id) rows, never the vectors — at corpus scale the candidate set
    // dwarfs the corpus, so vectors are re-attached afterwards by two plain
    // equality joins (AQE broadcasts the corpus side when it fits)
    val b = emb.select(col(idCol), col(vecCol), buckets.as("__tb"))
      .select(col(idCol),
        col("__tb.tbl").as("tbl"), col("__tb.bucket").as("bucket"))
    val cand = b.select(col("tbl"), col("bucket"), col(idCol).as("vec_a"))
      .join(b.select(col("tbl"), col("bucket"), col(idCol).as("vec_b")),
        Seq("tbl", "bucket"))
      .filter(col("vec_a") < col("vec_b"))
      .dropDuplicates("vec_a", "vec_b")
    cand
      .join(emb.select(col(idCol).as("vec_a"), col(vecCol).as("v_a")), Seq("vec_a"))
      .join(emb.select(col(idCol).as("vec_b"), col(vecCol).as("v_b")), Seq("vec_b"))
      .withColumn("score", round(VectorFunctions.cosine(col("v_a"), col("v_b")), scoreScale))
      .filter(col("score") >= threshold)
      .select(col("vec_a"), col("vec_b"), col("score"))
  }

  /** Mutual nearest neighbors at corpus scale: reciprocal top-1 over the
    * LSH-bucketed candidate pairs (no broadcast of an unbounded query
    * side — the scale-killer the brute-force mutual-NN of q81 accepts
    * only at fixture scale). Each id's best candidate comes from a
    * map-side-combinable max over the symmetric pair list (struct-max on
    * (score, −other) — deterministic (score desc, other asc) winner, no
    * per-id window), and a pair survives when each side is the other's
    * best. Contract: "nearest" means nearest among LSH COLLISIONS —
    * recall follows the (nBits, nTables) working point the recall specs
    * gate; with saturating tables it converges to the exact reciprocal
    * pairs (MutualNnSpec).
    */
  def mutualNearestLsh(
      emb: DataFrame, idCol: String, vecCol: String,
      nBits: Int = 2, dim: Int = 64, nTables: Int = 4,
      scoreScale: Int = 6): DataFrame = {
    val pairs = cosinePairsLsh(emb, idCol, vecCol, threshold = -1.0,
      nBits, dim, nTables, scoreScale)
    val sym = pairs.select(col("vec_a").as("id"), col("vec_b").as("other"),
        col("score"))
      .unionByName(pairs.select(col("vec_b").as("id"),
        col("vec_a").as("other"), col("score")))
    val best = sym.groupBy(col("id"))
      .agg(max(struct(col("score"), (-col("other")).as("neg"),
        col("other"))).as("w"))
      .select(col("id"), col("w.other").as("best"), col("w.score").as("score"))
    best.join(best.select(col("id").as("r_id"), col("best").as("r_best")),
        col("best") === col("r_id") && col("id") === col("r_best"))
      .filter(col("id") < col("best"))
      .select(col("id").as("vec_a"), col("best").as("vec_b"), col("score"))
  }

  /** SemDeDup-style semantic dedup (Abbas et al. 2023, arXiv:2303.09540):
    * restrict near-duplicate detection to coarse-cluster cells (an
    * [[IvfIndex]] `assign` output), then inside each cell drop every vector
    * that has a smaller-id neighbor at `round(cosine, scoreScale) >=
    * threshold`. Keep-the-min-id is the deterministic, partitioning-free
    * survivor rule (no transitive closure: a survivor is a vector with NO
    * smaller-id near-dup in its cell, which both engines can evaluate
    * independently per pair).
    *
    * Scale shape: the self-join is a plain equality join on the cell id —
    * linear shuffle, quadratic only inside a cell, which is exactly the
    * bound the coarse quantizer exists to enforce (nCells scales with the
    * corpus; cells stay ~corpus/nCells). The dropped-id set is (id)-only;
    * survivors come from one left-anti join against it.
    */
  def semanticDedup(
      assigned: DataFrame, idCol: String, vecCol: String, threshold: Double,
      cellCol: String = "cell", scoreScale: Int = 6): DataFrame = {
    val a = assigned.select(col(cellCol).as("__cell"), col(idCol).as("__ida"),
      col(vecCol).as("__va"))
    val b = assigned.select(col(cellCol).as("__cell"), col(idCol).as("__idb"),
      col(vecCol).as("__vb"))
    val dropped = a.join(b, "__cell")
      .filter(col("__ida") < col("__idb") &&
        round(VectorFunctions.cosine(col("__va"), col("__vb")), scoreScale) >= threshold)
      .select(col("__idb").as(idCol))
      .distinct()
    assigned.join(dropped, Seq(idCol), "left_anti")
  }

  /** Semantic decontamination — [[semanticDedup]]'s cross-corpus sibling
    * and the embedding-space complement of [[Decontaminate.sharedNgrams]]:
    * drop every corpus row whose cell contains a BENCHMARK vector at
    * `round(cosine, scoreScale) >= threshold` (n-gram overlap catches
    * verbatim leakage; this catches paraphrased/near-verbatim leakage the
    * lexical check misses). Both sides must carry the same coarse `cellCol`
    * assignment (one [[IvfIndex.assign]] pass each), so the comparison is
    * an equality join on the cell id — benchmark sets are small, the
    * per-cell benchmark slice is tiny, and the corpus is never
    * self-joined. Survivors = one left-anti join on the id.
    */
  def semanticDecontaminate(
      corpus: DataFrame, benchmark: DataFrame, idCol: String, vecCol: String,
      threshold: Double, cellCol: String = "cell",
      scoreScale: Int = 6): DataFrame = {
    val c = corpus.select(col(cellCol).as("__cell"), col(idCol).as("__idc"),
      col(vecCol).as("__vc"))
    val b = benchmark.select(col(cellCol).as("__cell"), col(vecCol).as("__vb"))
    val contaminated = c.join(b, "__cell")
      .filter(round(VectorFunctions.cosine(col("__vc"), col("__vb")), scoreScale)
        >= threshold)
      .select(col("__idc").as(idCol))
      .distinct()
    corpus.join(contaminated, Seq(idCol), "left_anti")
  }

  /** Sign-bit bucket id from `nBits` fixed pseudo-random hyperplanes. The
    * hyperplanes are generated per-element from a splitmix-style integer mix,
    * so the bucketing is deterministic with no side data to ship. `seedBase`
    * selects an independent hyperplane family (one per LSH table).
    *
    * Lowers to the one-pass codegen [[graft.functions.HyperplaneBucket]]
    * expression (all bits in one array scan) — the former per-bit
    * `zip_with` + `aggregate` chain ran interpreted per element and
    * dominated the graph-rebuild bench entry; arithmetic is identical
    * (float→double element × double plane, left-to-right, `dot >= 0`),
    * so every inlined-constant DuckDB oracle replays unchanged.
    */
  def hyperplaneBucket(vec: Column, nBits: Int, dim: Int, seedBase: Int = 0): Column = {
    import graft.functions.ColumnBridge.{col2expr, expr2col}
    expr2col(graft.functions.HyperplaneBucket(
      col2expr(VectorFunctions.asFloatArray(vec)), nBits, dim, seedBase))
  }

  private[graft] def hyperplane(seed: Int, dim: Int): Array[Double] =
    graft.functions.HyperplaneBucket.hyperplane(seed, dim)

  /** Semantic search (§3.1): embed the query text deterministically, filter by
    * tenant, score, top-k — returns (id, document_id, content, score, metadata)
    * shaped rows from a chunks table.
    */
  def semanticSearch(
      chunks: DataFrame, queryText: String, k: Int,
      organizationId: Option[String] = None,
      dim: Int = graft.functions.MockEmbedder.DefaultDim): DataFrame = {
    val qVec = graft.functions.MockEmbedder.embed(queryText, dim)
    val tenant = organizationId.fold(lit(true))(o => col("organization_id") === o)
    topK(chunks, "vector", qVec, k, filter = tenant, scoreScale = Some(6))
  }
}
