package graft.operators

import graft.functions.{GraftFunctions, TextAnalysis}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import IterCheckpoint.Pinnable

/** Document deduplication for training-data pipelines, four tiers:
  *
  *  1. [[exactGroups]] — exact dedup via content-hash groupBy (one shuffle on
  *     a 128-bit key; at 100 TB this is the cheapest possible full-corpus op).
  *  2. [[ngramJaccardPairs]] — exact word-n-gram Jaccard within blocking keys
  *     (quadratic *inside a block only*; blocks must be bounded).
  *  3. [[minhashCandidatePairs]] — MinHash + LSH banding: shingle → 64-component
  *     signature → 16 band keys → equality self-join on (band, key). Linear
  *     shuffle volume; the scale path for all-pairs near-dup at 100 TB.
  *  4. [[simhashPairs]] — 64-bit SimHash with 16-bit chunk banding (pigeonhole:
  *     hamming ≤ 3 ⇒ some chunk equal), then an exact hamming check.
  *
  * The reference's only dedup is the SHA-256 file-hash skip
  * (/root/reference/internal/drone/watcher/decision.go:43-99); tiers 2-4 are
  * the LLM-pipeline extension required by BASELINE.json's north star.
  */
object Dedup {

  /** Exact duplicate groups: one row per distinct content, with the canonical
    * (minimum) id and the copy count. `HAVING n_copies > 1` gives dup groups;
    * joining back on `text_hash` selects survivors.
    */
  def exactGroups(docs: DataFrame, idCol: Column, textCol: Column): DataFrame =
    docs.groupBy(TextAnalysis.exactDupKey(textCol).as("text_hash"))
      .agg(min(idCol).as("canonical_id"), count(lit(1)).as("n_copies"))

  /** Corpus-wide exact SEGMENT dedup — the sub-document tier between
    * [[exactGroups]] (whole docs) and [[passageOverlapPairs]] (fuzzy
    * passages): split every document into consecutive `segTokens`-token
    * segments, keep only the FIRST occurrence of each distinct segment text
    * corpus-wide (first = smallest (doc id, segment index)), and reassemble
    * the surviving segments in order. This is the repeated-span removal of
    * C4/RefinedWeb-style pipelines (boilerplate paragraphs, licence blocks,
    * navigation chrome) where the duplicated unit is smaller than the doc.
    *
    * Output: one row per input doc — (id, clean_text, n_kept, n_removed),
    * empty string when every segment was seen earlier.
    *
    * Scale shape: tokenize + segment is narrow; the first-occurrence pick is
    * a map-side-combinable `min(struct(id, seg))` aggregate keyed on the
    * segment text — NOT a window, so a boilerplate segment repeated across
    * the whole corpus partial-aggregates to one row per map task instead of
    * serializing into one window partition (the LPA de-skew lesson). Two
    * string-keyed shuffles total (group + join-back), one id-keyed rebuild.
    */
  def dedupSegments(
      docs: DataFrame, idCol: Column, textCol: Column,
      segTokens: Int): DataFrame = {
    require(segTokens > 0, s"segTokens must be positive, got $segTokens")
    val base = docs.select(idCol.as("id"), textCol.as("__text"))
    val toks = base.select(col("id"),
      posexplode(filter(split(col("__text"), " "), t => t =!= lit("")))
        .as(Seq("pos", "tok")))
    val segs = toks
      .withColumn("seg", floor(col("pos") / lit(segTokens)).cast("int"))
      .groupBy(col("id"), col("seg"))
      .agg(array_join(
        transform(array_sort(collect_list(struct(col("pos"), col("tok")))),
          x => x.getField("tok")), " ").as("seg_text"))
    val firsts = segs.groupBy("seg_text")
      .agg(min(struct(col("id"), col("seg"))).as("__f"))
    val kept = segs.join(firsts, "seg_text")
      .filter(col("id") === col("__f.id") && col("seg") === col("__f.seg"))
      .select(col("id"), col("seg"), col("seg_text"))
    val rebuilt = kept.groupBy("id")
      .agg(array_join(
        transform(array_sort(collect_list(struct(col("seg"), col("seg_text")))),
          x => x.getField("seg_text")), " ").as("clean_text"),
        count(lit(1)).as("n_kept"))
    val totals = segs.groupBy("id").agg(count(lit(1)).as("__n_seg"))
    base.select(col("id"))
      .join(rebuilt, Seq("id"), "left")
      .join(totals, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("clean_text"), lit("")).as("clean_text"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        (coalesce(col("__n_seg"), lit(0L)) - coalesce(col("n_kept"), lit(0L)))
          .as("n_removed"))
  }

  /** Exact n-gram Jaccard for all pairs sharing a blocking key. Quadratic in
    * block size — callers bound blocks (e.g. language × source, or an LSH
    * band from tier 3) so the crossproduct never exceeds executor memory.
    */
  def ngramJaccardPairs(
      docs: DataFrame, idCol: String, textCol: String,
      blockCols: Seq[String], n: Int = 3): DataFrame = {
    // blank docs have no shingles: they can't be near-dups of anything, and
    // keeping them would make jaccard 0/0 (NaN sorts above every real score
    // in Spark) — excluded here and in the q24/q37 oracles identically.
    // "blank" = no non-whitespace character (SQL trim strips spaces ONLY,
    // so trim-based emptiness would miss tab/newline-only docs)
    val nonBlank = docs.filter(
      length(regexp_replace(col(textCol), "\\s+", "")) > 0)
    // shingles are hashed to sorted 64-bit longs in one UDF pass: one
    // tokenization per doc (the HOF formulation re-evaluates split() inside
    // every lambda element), ~8B/shingle in the pair shuffle instead of
    // ~20B+ strings, and set intersection becomes a primitive merge scan.
    // Hash collisions (~|union|²/2^64 per pair) are negligible, so Jaccard
    // values are unchanged — the DuckDB string-based oracle matches exactly.
    // repartition by block key does double duty: co-partitions both join
    // sides on the key (the correct cluster layout), and the exchange
    // materializes rows as UnsafeRows, so the merge scan reads primitive
    // longs instead of boxed UDF output (~3× on the pair phase).
    val prepared = nonBlank.select(
      (col(idCol) +: blockCols.map(col)) :+
        GraftFunctions.shingleHashesUdf(col(textCol), lit(n)).as("grams"): _*)
      .repartition(blockCols.map(col): _*)
    val a = prepared.select(
      Seq(col(idCol).as("doc_a"), col("grams").as("grams_a")) ++ blockCols.map(col): _*)
    val b = prepared.select(
      Seq(col(idCol).as("doc_b"), col("grams").as("grams_b")) ++ blockCols.map(col): _*)
    // |A∩B| via a codegen'd merge scan over the sorted hash arrays (no boxed
    // hash sets); Jaccard = inter / (|A| + |B| − inter).
    val inter = graft.functions.VectorFunctions.sortedIntersectCount(
      col("grams_a"), col("grams_b"))
    a.join(b, blockCols).filter(col("doc_a") < col("doc_b"))
      .withColumn("inter", inter)
      .withColumn("jaccard",
        col("inter").cast("double") /
          (size(col("grams_a")) + size(col("grams_b")) - col("inter")))
      .select((Seq(col("doc_a"), col("doc_b"), col("jaccard")) ++ blockCols.map(col)): _*)
  }

  /** Asymmetric n-gram CONTAINMENT pairs — C(A,B) = |A∩B| / |A| — the
    * subset-duplication detector symmetric Jaccard is blind to: a
    * boilerplate page embedded verbatim inside a much larger document has
    * near-zero Jaccard (the union is dominated by the big doc) but
    * containment ≈ 1 for the small side. Broder's resemblance-vs-
    * containment distinction (SEQUENCES 1997), the crawl-dedup classic.
    *
    * Same prep and block-join shape as [[ngramJaccardPairs]] (one UDF
    * shingle-hash pass, block-key co-partitioned equi-join, codegen merge
    * scan for |A∩B|); a pair survives if EITHER direction's containment
    * reaches `minContainment`.
    */
  def ngramContainmentPairs(
      docs: DataFrame, idCol: String, textCol: String,
      blockCols: Seq[String], n: Int = 3,
      minContainment: Double = 0.8): DataFrame = {
    require(minContainment > 0.0 && minContainment <= 1.0,
      s"minContainment must be in (0,1], got $minContainment")
    val nonBlank = docs.filter(
      length(regexp_replace(col(textCol), "\\s+", "")) > 0)
    val prepared = nonBlank.select(
      (col(idCol) +: blockCols.map(col)) :+
        GraftFunctions.shingleHashesUdf(col(textCol), lit(n)).as("grams"): _*)
      .repartition(blockCols.map(col): _*)
    val a = prepared.select(
      Seq(col(idCol).as("doc_a"), col("grams").as("grams_a")) ++ blockCols.map(col): _*)
    val b = prepared.select(
      Seq(col(idCol).as("doc_b"), col("grams").as("grams_b")) ++ blockCols.map(col): _*)
    val inter = graft.functions.VectorFunctions.sortedIntersectCount(
      col("grams_a"), col("grams_b"))
    a.join(b, blockCols).filter(col("doc_a") < col("doc_b"))
      .withColumn("inter", inter)
      .withColumn("cont_a_in_b",
        col("inter").cast("double") / size(col("grams_a")))
      .withColumn("cont_b_in_a",
        col("inter").cast("double") / size(col("grams_b")))
      .filter(greatest(col("cont_a_in_b"), col("cont_b_in_a")) >= minContainment)
      .select((Seq(col("doc_a"), col("doc_b"), col("cont_a_in_b"),
        col("cont_b_in_a")) ++ blockCols.map(col)): _*)
  }

  /** MinHash signatures + LSH band keys for each document (one-pass UDF —
    * no materialized shingle arrays).
    */
  def minhashSignatures(
      docs: DataFrame, idCol: String, textCol: String, n: Int = 3): DataFrame =
    docs.select(col(idCol),
      GraftFunctions.minhashTextUdf(col(textCol), lit(n)).as("sig"))
      .withColumn("bands", GraftFunctions.lshBandsUdf(col("sig")))

  /** Near-duplicate candidate pairs via LSH banding, refined by estimated
    * Jaccard from the full signatures. Shuffle volume is O(docs × bands), not
    * O(docs²): the join key is (band_index, band_hash).
    */
  def minhashCandidatePairs(
      docs: DataFrame, idCol: String, textCol: String,
      minEstJaccard: Double = 0.5, n: Int = 3,
      maxBucketSize: Int = 1000): DataFrame =
    // localCheckpoint (not cache): blocks are freed by the ContextCleaner
    // once this call's results are consumed — no permanent cache pinning.
    // LAZY (round 12): the hash pass folds into the first consuming job
    // (typically the connected-components probe) instead of costing its
    // own driver-blocking barrier at construction; later consumers reuse
    // the pinned blocks exactly as before.
    minhashCandidatePairsFromSigs(
      minhashSignatures(docs, idCol, textCol, n).iterCheckpoint(false),
      idCol, minEstJaccard, maxBucketSize)

  /** The banding + refine phase over PRECOMPUTED signatures (columns: idCol,
    * sig, bands) — callers that also need the signatures for other joins
    * (e.g. streaming dedup's store rows) hash each document exactly once.
    */
  def minhashCandidatePairsFromSigs(
      sigs: DataFrame, idCol: String,
      minEstJaccard: Double = 0.5, maxBucketSize: Int = 1000): DataFrame = {
    val exploded = sigs.select(col(idCol),
      posexplode(col("bands")).as(Seq("band_idx", "band_key")))
    // skew control: a band bucket with >maxBucketSize members would produce
    // a quadratic blow-up in one task; such buckets are boilerplate/identical
    // content (exact dedup's job — tier 1), not near-dup signal. Cap via a
    // windowless two-pass: count per bucket, semi-join the survivors.
    val bucketSizes = exploded.groupBy(col("band_idx"), col("band_key"))
      .agg(count(lit(1)).as("__n"))
    val keptBuckets = bucketSizes
      .filter(col("__n") > 1 && col("__n") <= maxBucketSize)
      .select(col("band_idx"), col("band_key"))
    val pruned = exploded.join(keptBuckets, Seq("band_idx", "band_key"), "left_semi")
    val candidates = pruned.as("a")
      .join(pruned.as("b"), Seq("band_idx", "band_key"))
      .filter(col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("doc_a"), col(s"b.$idCol").as("doc_b"))
      .distinct()
    candidates
      .join(sigs.select(col(idCol).as("doc_a"), col("sig").as("sig_a")), "doc_a")
      .join(sigs.select(col(idCol).as("doc_b"), col("sig").as("sig_b")), "doc_b")
      .withColumn("est_jaccard",
        GraftFunctions.minhashJaccardUdf(col("sig_a"), col("sig_b")))
      .filter(col("est_jaccard") >= minEstJaccard)
      .select(col("doc_a"), col("doc_b"), col("est_jaccard"))
  }

  /** Connected components over duplicate pairs: min-label propagation with
    * pointer jumping — each round every node takes the min label in its
    * 1-hop neighborhood, then follows its label's own label (path halving),
    * giving O(log diameter) rounds. Returns (doc_id, component_id = min id
    * in the component). This is what turns pairwise near-dup evidence into
    * transitive dedup clusters.
    *
    * Each round's result is `localCheckpoint`ed: lineage is truncated (the
    * iterative plan would otherwise grow exponentially) and the backing
    * blocks are released by the ContextCleaner once unreferenced — no
    * permanent cache pinning. Throws if `maxIter` rounds don't reach the
    * fixpoint rather than returning silently-wrong non-transitive labels.
    *
    * Small edge sets (≤ `maxDriverPairs` symmetrized rows, long ids) take
    * a DRIVER-HOSTED union-find instead (round 12 — the searchManyLocal
    * philosophy applied to the dedup fold): the iterative loop costs
    * ~3 driver-blocking Spark jobs PER ROUND (checkpoint + convergence
    * count), a fixed scheduling latency that dominates whenever the pair
    * set is tiny relative to the corpus — profiled at 33 eager jobs /
    * 2.5-5 s inside the q3m curation bench entry, all spent labeling a
    * few hundred pairs. Union-by-min-root + path-halving find yields
    * EXACTLY the same (doc_id, min id in component) labels (spec-gated
    * against the distributed loop); the driver image is bounded by the
    * declared constant (~16 B/pair), and 100 TB pair sets past it stay on
    * the distributed loop unchanged.
    */
  def connectedComponents(
      pairs: DataFrame, maxIter: Int = 20,
      maxDriverPairs: Long = 200000L): DataFrame = {
    val edgePlan = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .union(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .distinct()
    // ONE bounded probe decides the tier AND delivers the small edge set
    // (round 12 optimization): the former eager pin + count + collect
    // triple cost three driver-blocking jobs to label a few hundred
    // pairs. A limit(bound+1) collect is a single job; within the bound
    // the collected rows feed the union-find directly, past it the
    // distributed loop pins the plan eagerly exactly as before (the
    // probe's extra cost there is one truncated pass, amortized by the
    // loop's many full passes).
    if (edgePlan.schema("src").dataType == org.apache.spark.sql.types.LongType) {
      val bound = math.min(maxDriverPairs, (Int.MaxValue - 1).toLong).toInt
      val probe = edgePlan.limit(bound + 1).collect()
      if (probe.length <= bound)
        return driverComponents(probe, pairs.sparkSession)
    }
    val edges = edgePlan.iterCheckpoint()
    var labels = edges.select(col("src").as("doc_id")).distinct()
      .withColumn("component_id", col("doc_id"))
      .iterCheckpoint()
    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < maxIter) {
      // 1-hop min: each node adopts the min of its own and neighbors' labels
      val neighborLabels = edges
        .join(labels.withColumnRenamed("doc_id", "src"), Seq("src"))
        .select(col("dst").as("doc_id"), col("component_id"))
      val hopped = labels.union(neighborLabels)
        .groupBy(col("doc_id"))
        .agg(min(col("component_id")).as("component_id"))
      // pointer jump: follow the label's own label (labels only decrease,
      // and every component_id is itself a labeled node)
      val parents = hopped
        .select(col("doc_id").as("__cid"), col("component_id").as("__parent"))
      val updated = hopped
        .join(parents, hopped("component_id") === parents("__cid"))
        .select(hopped("doc_id"), col("__parent").as("component_id"))
        .iterCheckpoint()
      changed = updated.join(labels.withColumnRenamed("component_id", "__old"), Seq("doc_id"))
        .filter(col("component_id") =!= col("__old"))
        .count()
      labels = updated
      iter += 1
    }
    if (changed > 0)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIter rounds " +
          "(pathological component diameter); raise maxIter")
    labels
  }

  /** Driver-hosted union-find over a collected symmetrized edge set:
    * union-by-min-root keeps every set's root equal to its minimum id, so
    * find(x) after all unions IS the component minimum — identical labels
    * to the distributed min-propagation loop. Result re-enters Spark via
    * parallelize + explicit schema (the qkn discipline: a toDF
    * LocalRelation feeding later self-joins trips Catalyst's
    * Union-constraint rewrite).
    */
  private def driverComponents(
      edges: Array[org.apache.spark.sql.Row],
      spark: org.apache.spark.sql.SparkSession): DataFrame = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x
      while (parent(r) != r) { parent(r) = parent(parent(r)); r = parent(r) }
      r
    }
    edges.foreach { row =>
      val (a, b) = (row.getLong(0), row.getLong(1))
      parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
      val (ra, rb) = (find(a), find(b))
      if (ra < rb) parent(rb) = ra else if (rb < ra) parent(ra) = rb
    }
    val rows = parent.keys.toArray.sorted
      .map(id => org.apache.spark.sql.Row(id, find(id)))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType, nullable = true),
      org.apache.spark.sql.types.StructField("component_id",
        org.apache.spark.sql.types.LongType, nullable = true)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toIndexedSeq,
        math.max(1, math.min(spark.sparkContext.defaultParallelism,
          rows.length / 1000 + 1))), schema)
  }

  /** The dedup decision: from near-dup pairs, the set of ids to DROP
    * (everything but the minimum id of each component).
    */
  def dropSet(pairs: DataFrame, maxIter: Int = 20): DataFrame =
    connectedComponents(pairs, maxIter)
      .filter(col("doc_id") =!= col("component_id"))
      .select(col("doc_id"))

  /** SimHash near-dup pairs with hamming distance ≤ maxHamming (≤ 3 for the
    * 4×16-bit banding to be lossless; larger values may miss pairs).
    */
  def simhashPairs(
      docs: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3, maxBucketSize: Int = 1000): DataFrame = {
    val hashed = docs.select(col(idCol),
      GraftFunctions.simhashUdf(TextAnalysis.tokens(col(textCol))).as("simhash"))
    hammingBandedPairs(hashed, idCol, "simhash", maxHamming, maxBucketSize)
  }

  /** Hamming-banded candidate pairs over ANY precomputed 64-bit hash column
    * (idCol, hashCol): 4×16-bit chunk keys, bucket-capped equality
    * self-join, exact hamming refine — the pigeonhole guarantee (any pair
    * within hamming ≤ 3 shares at least one intact 16-bit chunk) and the
    * shuffle shape (O(rows × 4) band rows, quadratic only inside one capped
    * bucket) are properties of the HASH, not of what it hashed, so text
    * SimHash ([[simhashPairs]]) and image perceptual hashes
    * (multimodal.PerceptualHash.dhashPairs) share this one implementation.
    */
  def hammingBandedPairs(
      hashed: DataFrame, idCol: String, hashCol: String,
      maxHamming: Int = 3, maxBucketSize: Int = 1000): DataFrame = {
    val allExploded = hashed.select(col(idCol), col(hashCol),
      explode(GraftFunctions.simhashChunksUdf(col(hashCol))).as("chunk_key"))
    // same skew control as the MinHash path: a 16-bit chunk bucket with
    // >maxBucketSize members (boilerplate-heavy corpora, or solid-color
    // thumbnails on the image side) would go quadratic in one task; cap it
    // before the self-join
    val keptKeys = allExploded.groupBy(col("chunk_key"))
      .agg(count(lit(1)).as("__n"))
      .filter(col("__n") > 1 && col("__n") <= maxBucketSize)
      .select(col("chunk_key"))
    val exploded = allExploded.join(keptKeys, Seq("chunk_key"), "left_semi")
    exploded.as("a").join(exploded.as("b"), Seq("chunk_key"))
      .filter(col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("doc_a"), col(s"b.$idCol").as("doc_b"),
        col(s"a.$hashCol").as("sim_a"), col(s"b.$hashCol").as("sim_b"))
      .distinct()
      .withColumn("hamming", GraftFunctions.hammingUdf(col("sim_a"), col("sim_b")))
      .filter(col("hamming") <= maxHamming)
      .select(col("doc_a"), col("doc_b"), col("hamming"))
  }

  /** Passage-level overlap pairs: documents sharing ≥ `minShared` winnowing
    * fingerprints (Schleimer et al. k-gram window minima — the same
    * fingerprints q2f emits). Where MinHash measures WHOLE-document
    * similarity, shared winnowing minima localize COPIED PASSAGES — the
    * C4/RefinedWeb-style boilerplate/quotation signal: two documents that
    * each embed the same paragraph light up here even when their overall
    * Jaccard is low.
    *
    * Scale shape: one fingerprint explosion (linear), an equality self-join
    * on `fp` (linear shuffle; quadratic only inside one fingerprint's
    * bucket), and a pair-count aggregation. A fingerprint present in more
    * than `maxDocsPerFp` docs is corpus boilerplate, not passage identity —
    * and would go quadratic in its bucket — so it is capped out before the
    * join (the MinHash/SimHash maxBucketSize pattern).
    */
  def passageOverlapPairs(
      docs: DataFrame, idCol: String, textCol: String,
      minShared: Int = 8, maxDocsPerFp: Int = 20): DataFrame = {
    // winnowing output is already per-doc distinct+sorted (TreeSet contract)
    val fp = docs.select(col(idCol).as("doc_id"),
      explode(GraftFunctions.winnowingUdf(col(textCol))).as("fp"))
    val rare = fp.groupBy(col("fp")).agg(count(lit(1)).as("__df"))
      .filter(col("__df") > 1 && col("__df") <= maxDocsPerFp)
      .select(col("fp"))
    val fpc = fp.join(rare, Seq("fp"), "left_semi")
    fpc.as("a").join(fpc.as("b"),
        col("a.fp") === col("b.fp") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_shared_fps"))
      .filter(col("n_shared_fps") >= minShared)
  }
}
