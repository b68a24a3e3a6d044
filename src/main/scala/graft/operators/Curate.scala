package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** One-call corpus curation: the full training-data flow composed from the
  * individually-oracled operators —
  *
  *   URL-key dedup → exact dedup → transitive near-dup dedup (MinHash-LSH
  *   + connected components) → benchmark decontamination → unigram-LM
  *   quality band → PII scrub → per-domain cap → deterministic mix sample.
  *
  * Every stage is hash-deterministic (content hashes, md5 draws, DECIMAL
  * sums), so the whole pipeline is reproducible across runs, partitionings
  * and engines — q3m replays the enabled stages end-to-end in DuckDB.
  * Each stage is also individually optional, so the same entry point
  * serves "just dedup" and "the full mix build".
  *
  * Scale shape: stages are the already-audited operators (banded LSH, one
  * broadcast of benchmark grams, a vocabulary join, window caps) — no new
  * shuffle patterns are introduced by the composition; between-stage
  * anti-joins key on the id column only.
  */
object Curate {

  /** Stage toggles. None/1.0/false disables a stage entirely (no plan
    * cost).
    */
  final case class Config(
      nearDupMinJaccard: Option[Double] = Some(0.5),
      surprisalBand: Option[(Double, Double)] = None,
      benchmarkNgram: Int = 8,
      capPerSource: Option[Int] = None,
      sampleRate: Double = 1.0,
      salt: String = "curate",
      repetitionMaxDup5gram: Option[Double] = None,
      canonicalize: Boolean = false,
      c4PageRules: Boolean = false,
      lmMinTokenCount: Long = 1L,
      urlCol: Option[String] = None,
      classifierGate: Option[(TextClassifier.Model, Double)] = None)

  /** Ordered (stageName, DataFrame-after-stage) — the last entry is the
    * curated output: original columns plus `surprisal` (when banded) and
    * `redacted` (PII-scrubbed text). [[run]] returns just that; CurateSpec
    * and [[stageCounts]] use the prefix frames.
    */
  def stages(
      docs: DataFrame, idCol: String, textCol: String, sourceCol: String,
      benchmarks: Option[DataFrame], cfg: Config): Seq[(String, DataFrame)] = {
    val out = Seq.newBuilder[(String, DataFrame)]
    out += ("input" -> docs)
    var docsIn = docs

    // -1. URL-key dedup: the cheapest tier of all — one page, one
    // canonical URL ([[graft.functions.UrlParts.canonicalize]]), min id
    // wins, NO text touched (runs before canonicalization/shingling so
    // every URL-duplicate it drops is a doc the text stages never see;
    // the CCNet/RefinedWeb ordering). Null-URL rows are exempt, same
    // policy as the null-text exemptions below.
    cfg.urlCol.foreach { uc =>
      // null-URL rows (exempt anyway) are split out BEFORE the window —
      // otherwise they all hash to the single null partition key and one
      // reducer sorts the entire non-web fraction of the corpus just to
      // produce row numbers the exemption filter would discard
      val withUrl = docsIn.filter(col(uc).isNotNull)
      val wUrl = Window
        .partitionBy(graft.functions.UrlParts.canonicalize(col(uc)))
        .orderBy(col(idCol))
      docsIn = withUrl.withColumn("__urn", row_number().over(wUrl))
        .filter(col("__urn") === 1).drop("__urn")
        .unionByName(docsIn.filter(col(uc).isNull))
      out += ("url_dedup" -> docsIn)
    }

    // 0a. Unicode canonicalization FIRST — every downstream hash (exact
    // dedup md5, MinHash shingles, benchmark grams) must see the canonical
    // text, or composed/decomposed variants of the same doc slip past
    // dedup. Rewrites the text column in place; narrow.
    if (cfg.canonicalize) {
      docsIn = docsIn.withColumn(textCol,
        graft.functions.TextNormalize.canonicalize(col(textCol)))
      out += ("canonicalized" -> docsIn)
    }

    // 0b. C4 page rules: the line-level web-cleaning recipe. Null text
    // passes (shared unevaluable-docs policy).
    if (cfg.c4PageRules) {
      docsIn = docsIn.filter(
        graft.functions.C4Rules.keepPage(col(textCol)) || col(textCol).isNull)
      out += ("c4_page_rules" -> docsIn)
    }

    // 0. repetition filter (Gopher-style): drop docs whose duplicated-5-gram
    // character fraction exceeds the threshold. FIRST because it is the one
    // per-doc narrow filter in the pipeline (no shuffle, pushes toward the
    // scan) — every doc it drops is a doc MinHash never has to shingle.
    // Null/empty text scores 0 everywhere, so unevaluable docs pass (the
    // shared null policy).
    cfg.repetitionMaxDup5gram.foreach { t =>
      docsIn = docsIn.filter(
        graft.functions.GraftFunctions.repetitionStatsUdf(col(textCol))
          .getField("dup5gramFrac") <= t)
      out += ("repetition_filter" -> docsIn)
    }

    // 1. exact dedup: canonical = min id per exact text (md5 grouping, the
    // q23 semantics in drop-duplicates form). Null-text rows are exempt:
    // md5(NULL) is NULL and the window would collapse ALL null-text docs
    // into one "duplicate" group — but docs the stage cannot compare must
    // not be silently deleted (same null policy as the quality band).
    val w = Window.partitionBy(md5(col(textCol))).orderBy(col(idCol))
    var cur = docsIn.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1 || col(textCol).isNull).drop("__rn")
    out += ("exact_dedup" -> cur)

    // 2. transitive near-dup dedup: MinHash banding → CC → drop non-canonical
    cfg.nearDupMinJaccard.foreach { j =>
      val pairs = Dedup
        .minhashCandidatePairs(cur, idCol, textCol, minEstJaccard = j)
        .select(col("doc_a"), col("doc_b"))
      val drops = Dedup.dropSet(pairs).withColumnRenamed("doc_id", idCol)
      cur = cur.join(drops, Seq(idCol), "left_anti")
      out += ("near_dedup" -> cur)
    }

    // 3. benchmark decontamination: drop docs sharing any benchmark n-gram
    benchmarks.foreach { b =>
      val contaminated = Decontaminate
        .sharedNgrams(cur, b, idCol, textCol, cfg.benchmarkNgram)
        .select(col(idCol))
      cur = cur.join(contaminated, Seq(idCol), "left_anti")
      out += ("decontaminated" -> cur)
    }

    // 4. quality band: mean token surprisal under the LM of the ORIGINAL
    // input corpus (a stable reference — dropping docs must not move other
    // docs' scores), keep lo ≤ s ≤ hi. LEFT join: a doc that produces no
    // score (null text; all tokens OOV under a foreign LM) is kept with a
    // null surprisal — a quality FILTER must not silently delete docs it
    // could not score (callers can drop the nulls explicitly).
    // No broadcast() hint on the LM: a hint is MANDATORY (AQE cannot demote
    // it) and a unigram vocabulary grows with the corpus (Heaps' law) — on a
    // 100 TB web corpus it exceeds the broadcast ceiling. Catalyst/AQE
    // choose by actual size instead; cfg.lmMinTokenCount > 1 additionally
    // Zipf-head-bounds the table so the broadcast choice stays available at
    // any corpus size.
    cfg.surprisalBand.foreach { case (lo, hi) =>
      val lm = LmScore.unigramLm(docs, textCol, cfg.lmMinTokenCount)
      val scores = LmScore.surprisalScores(docs, idCol, textCol, lm)
        .select(col(idCol), col("surprisal"))
      cur = cur.join(scores, Seq(idCol), "left")
        .filter(col("surprisal").between(lo, hi) || col("surprisal").isNull)
      out += ("quality_band" -> cur)
    }

    // 4b. trained-classifier gate (adds `clf_score`; the CCNet/fastText
    // distilled filter, [[TextClassifier]]) — the model is dim+1 doubles
    // broadcast by construction, scoring is one margin shuffle. Every doc
    // gets a score (the bias feature guarantees a margin even for empty
    // text), so unlike the LM band there is no could-not-score exemption.
    cfg.classifierGate.foreach { case (model, minScore) =>
      val feats = TextClassifier.hashedFeatures(
        cur.withColumn("__clfy", lit(0)), idCol, textCol, "__clfy", model.dim)
      val scores = TextClassifier.score(feats, model)
        .select(col("id").as(idCol), col("score").as("clf_score"))
      cur = cur.join(scores, Seq(idCol), "left")
        .filter(col("clf_score") >= minScore)
      out += ("classifier_gate" -> cur)
    }

    // 5. PII scrub (adds `redacted`; original text kept for provenance)
    cur = cur.withColumn("redacted", Scrub.redact(col(textCol)))
    out += ("scrubbed" -> cur)

    // 6. per-domain cap (heavy-tail bound)
    cfg.capPerSource.foreach { n =>
      cur = DataMix.capPerGroup(cur, sourceCol, idCol, n, cfg.salt + "-cap")
      out += ("domain_cap" -> cur)
    }

    // 7. deterministic mix sample
    if (cfg.sampleRate < 1.0) {
      cur = DataMix.deterministicSample(cur, idCol, cfg.sampleRate, cfg.salt + "-mix")
      out += ("sampled" -> cur)
    }
    out += ("output" -> cur)
    out.result()
  }

  /** The curated corpus (last stage of [[stages]]). */
  def run(
      docs: DataFrame, idCol: String, textCol: String, sourceCol: String,
      benchmarks: Option[DataFrame] = None,
      cfg: Config = Config()): DataFrame =
    stages(docs, idCol, textCol, sourceCol, benchmarks, cfg).last._2

  /** Row counts per stage — the curation report (one action per stage;
    * diagnostics, not a query path).
    */
  def stageCounts(
      docs: DataFrame, idCol: String, textCol: String, sourceCol: String,
      benchmarks: Option[DataFrame] = None,
      cfg: Config = Config()): Seq[(String, Long)] =
    stages(docs, idCol, textCol, sourceCol, benchmarks, cfg)
      .map { case (name, df) => name -> df.count() }
}
