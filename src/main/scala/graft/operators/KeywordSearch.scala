package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ranked keyword retrieval — the lexical half of hybrid RAG search
  * (complements [[VectorSearch.semanticSearch]]; the reference only has a
  * boolean keyword predicate, internal/worker/analyst.go:270-399 keyword
  * matching fallback —
  * ranked BM25 + fusion is the capability upgrade a retrieval engine needs).
  *
  * Scale shape: one narrow pass over tokens; per-doc lengths and corpus
  * stats are tiny aggregates; the term-frequency table is filtered to the
  * query's terms BEFORE any shuffle (the groupBy key space is |matching
  * docs| × |query terms|, not the corpus vocabulary); document frequencies
  * and corpus stats broadcast.
  */
object KeywordSearch {

  /** Per-doc token lengths (doc_id, dl) — the corpus-wide scan behind BM25's
    * normalization. At scale, materialize this ONCE per corpus snapshot
    * (parquet next to the corpus) and hand it to [[bm25]]'s `lens` parameter:
    * every query then reads the tiny lens table instead of re-tokenizing
    * 100 TB of text per retrieval.
    */
  def docLengths(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.filter(col(textCol).isNotNull)
      .select(col(idCol).as("doc_id"),
        size(graft.functions.TextAnalysis.lowerTokens(col(textCol))).cast("long").as("dl"))

  /** Positional inverted-index postings (term, doc_id, pos) — the exact
    * complement to [[bm25]]'s bag-of-words ranking: phrase and proximity
    * queries need token POSITIONS, which the bag representation discards.
    * At scale, materialize once per corpus snapshot partitioned/bucketed by
    * term; every phrase query then prunes to its terms' postings instead of
    * re-tokenizing the corpus.
    */
  def postings(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.filter(col(textCol).isNotNull)
      .select(col(idCol).as("doc_id"),
        posexplode(graft.functions.TextAnalysis.lowerTokens(col(textCol)))
          .as(Seq("pos", "term")))
      .filter(col("term") =!= "")
      .select(col("term"), col("doc_id"), col("pos"))

  /** Exact-phrase occurrence counts per doc: (doc_id, n_matches) for docs
    * containing the consecutive token sequence `phrase` at least once.
    * Each phrase term i joins its postings back to the anchor at
    * (doc_id, pos − i) — a chain of EQUI-joins on term-filtered slices
    * (each side is one term's postings, not the corpus), never a regex scan
    * over text. Docs without a match are absent (join semantics; LEFT-join
    * against the corpus at the call site if zeros are wanted).
    */
  def phraseCount(postings: DataFrame, phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "phrase must have at least one term")
    val anchor = postings.filter(col("term") === phrase.head)
      .select(col("doc_id"), col("pos"))
    val matched = phrase.zipWithIndex.tail.foldLeft(anchor) {
      case (acc, (t, i)) =>
        acc.join(postings.filter(col("term") === t)
            .select(col("doc_id"), (col("pos") - i).as("pos")),
          Seq("doc_id", "pos"))
    }
    matched.groupBy("doc_id").agg(count(lit(1)).as("n_matches"))
  }

  /** Okapi BM25 top-k for a bag of query terms.
    *
    * score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl)),
    * idf(t) = ln((N − df + 0.5)/(df + 0.5) + 1) — Robertson/Lucene form,
    * always positive. Scores rounded to 6 dp; ties broken by id asc.
    *
    * `lens`: a precomputed [[docLengths]] table for the SAME corpus snapshot
    * (amortizes the full-corpus length scan across queries — the
    * interactive-vs-batch lever at 100 TB). None = compute inline.
    */
  def bm25(
      docs: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], k: Int = 10,
      k1: Double = 1.2, b: Double = 0.75,
      lens: Option[DataFrame] = None): DataFrame = {
    // Locale.ROOT so query terms lower-case exactly like Spark's own
    // locale-independent lower() applied to the document tokens
    val terms = queryTerms.map(_.toLowerCase(java.util.Locale.ROOT)).distinct
    require(terms.nonEmpty, "bm25 needs at least one query term")
    // null-text docs carry no tokens: excluded from corpus stats (the SQL
    // oracle's unnest drops them implicitly — n_docs must agree)
    val corpus = docs.filter(col(textCol).isNotNull)
    // doc length = token count, computed as size(split(...)) — identical
    // value with no explode and no groupBy shuffle (split never yields an
    // empty array, so every doc appears, matching the explode+count shape)
    val lensDf = lens.getOrElse(docLengths(docs, idCol, textCol))
    val stats = lensDf.agg(count(lit(1)).as("n_docs"), avg("dl").as("avgdl"))
    // substring pre-filter before the explode: a superset of true matches
    // (the exact term equality below refines), but it reaches the scan as a
    // pushable predicate — at corpus scale only matching docs are exploded
    val candidates = corpus.filter(
      terms.map(t => lower(col(textCol)).contains(t)).reduce(_ || _))
    val toks = candidates.select(col(idCol).as("doc_id"),
      explode(graft.functions.TextAnalysis.lowerTokens(col(textCol))).as("term"))
    val tf = toks.filter(col("term").isin(terms: _*))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    // doc frequency as a window over tf (rows are unique per (doc, term), so
    // a per-term count IS df) — Catalyst does not reuse the tf subtree for a
    // separate groupBy, which would re-scan and re-explode the corpus; the
    // window reshuffles only the tiny tf table
    val withDf = tf.withColumn("df",
      count(lit(1)).over(Window.partitionBy("term")))
    val scored = withDf
      .join(lensDf, "doc_id")
      .crossJoin(broadcast(stats))
      .withColumn("w",
        log((col("n_docs") - col("df") + 0.5) / (col("df") + 0.5) + 1.0)
          * (col("tf") * (k1 + 1))
          / (col("tf") + lit(k1) * (lit(1) - b + lit(b) * col("dl") / col("avgdl"))))
    // SUM over DECIMAL, not raw doubles: addend order varies with shuffle
    // arrival and would let a boundary-straddling double round differently
    // across engines/runs; decimal accumulation is exact and order-free
    scored.groupBy("doc_id")
      .agg(round(sum(col("w").cast("decimal(28,12)")), 6).cast("double").as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
  }

  /** Reciprocal rank fusion (Cormack et al.): fuse any rankings — BM25,
    * vector search, recency, quality — by Σ 1/(c + rank). Each input must
    * have columns (doc_id, rn); bounded inputs (top-n lists), so the union
    * and final aggregation are tiny regardless of corpus size.
    */
  def reciprocalRankFusion(
      rankings: Seq[DataFrame], k: Int = 10, c: Int = 60): DataFrame = {
    require(rankings.nonEmpty, "need at least one ranking")
    val contributions = rankings.map(
      _.select(col("doc_id"), (lit(1.0) / (lit(c) + col("rn"))).as("contrib")))
    contributions.reduce(_ unionByName _)
      .groupBy("doc_id")
      .agg(round(sum(col("contrib").cast("decimal(28,12)")), 6)
        .cast("double").as("rrf_score"))
      .orderBy(col("rrf_score").desc, col("doc_id"))
      .limit(k)
  }

  /** Attach 1-based ranks to a scored, bounded result (rank = position under
    * (score desc, doc_id asc)). The window is unpartitioned by design: inputs
    * are top-n lists (≤ a few hundred rows), not corpus-sized.
    */
  def ranked(topList: DataFrame, scoreCol: String): DataFrame =
    topList.withColumn("rn",
      row_number().over(Window.orderBy(col(scoreCol).desc, col("doc_id"))))

  /** Per-document TF-IDF keyword extraction: the top-k most
    * characteristic tokens of each doc (tf × ln(N/df), score desc with
    * token-ascending tiebreak — total order, replayable). The corpus-wide
    * metadata tagger this enables is the query-independent complement of
    * [[bm25]] (same tokenizer contract, so the two never disagree on what
    * a term is).
    *
    * Scale shape: ONE token explode feeds the (doc, token) tf aggregate;
    * df re-aggregates the tf table (vocabulary-sized, no second corpus
    * scan); the per-doc top-k is a window whose partial `WindowGroupLimit`
    * bounds the shuffle at k·partitions rows per doc. `broadcastDf`
    * defaults true (vocabularies of curated corpora broadcast fine) — at
    * web scale the whitespace vocabulary is UNBOUNDED (URLs, glued
    * punctuation, typos grow with corpus size) and a forced broadcast is a
    * hard 8 GB/driver-OOM failure, so pass false there and the idf join
    * degrades to a plain shuffle join, slower but linear.
    */
  def tfidfTopKeywords(
      docs: DataFrame, idCol: String, textCol: String, k: Int,
      broadcastDf: Boolean = true): DataFrame = {
    val tot = docs.agg(count(lit(1)).cast("double").as("__n"))
    val tf = docs
      .select(col(idCol),
        explode(graft.functions.TextAnalysis.lowerTokens(col(textCol))).as("token"))
      .groupBy(col(idCol), col("token"))
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("token").agg(count(lit(1)).as("df"))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("score").desc, col("token"))
    tf.join(if (broadcastDf) broadcast(df) else df, Seq("token"))
      .crossJoin(broadcast(tot))
      .withColumn("score",
        round(col("tf").cast("double") *
          log(col("__n") / col("df").cast("double")), 6))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col(idCol), col("token"), col("tf"), col("score"), col("rn"))
  }
}
