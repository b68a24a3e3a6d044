package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Full curation pipeline on a crafted corpus where every stage has a
  * known victim — exact dupes, transitive near-dupes, a benchmark leak,
  * quality outliers, PII, a dominant domain — so each stage's count drop
  * is asserted, not just the end state. (q3m_curation_pipeline is the
  * hash-exact driver twin with the near-dup stage factored out.)
  */
class CurateSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private val filler =
    "the quick brown fox jumps over the lazy dog while birds sing softly today"

  test("every stage drops exactly its victims; output is reproducible") {
    import spark.implicits._
    val vocab = Seq("alpha", "beta", "gamma", "delta", "epsilon",
      "zeta", "eta", "theta", "iota", "kappa")
    // per-doc PERMUTED shared vocabulary: common unigrams (stable LM
    // probabilities) but near-disjoint word trigrams, so the minhash
    // stage sees no accidental near-dupes among the normal docs
    def permuted(seed: Int) =
      new scala.util.Random(seed).shuffle(vocab).mkString(" ")
    val normal = (10L until 30L).map(i =>
      (i, s"item $i ${permuted(i.toInt)}", s"src${i % 3}"))
    val corpus = Seq(
      (1L, filler, "src0"),
      (2L, filler, "src0"), // exact dupe of 1 → dropped at exact_dedup
      (3L, filler + " extra tail words here now", "src1"), // near-dupe of 1
      (4L, "leaked benchmark question about the seven wonders of the ancient world", "src1"),
      (5L, "zz qq xx yy ww vv uu tt ss rr", "src2"), // all-rare tokens → high surprisal
      (6L, s"call me at 555-867-5309 or mail bob@example.com regarding ${permuted(999)}", "src2")
    ) ++ normal
    val docs = corpus.toDF("doc_id", "text", "source")
    val bench = Seq(
      (100L, "a benchmark question about the seven wonders of the ancient world indeed"))
      .toDF("doc_id", "text")

    val cfg = Curate.Config(
      nearDupMinJaccard = Some(0.4),
      surprisalBand = Some((0.0, 5.0)), // cuts only the all-rare-token doc
      capPerSource = Some(9),
      sampleRate = 1.0,
      salt = "spec")
    val st = Curate.stages(docs, "doc_id", "text", "source", Some(bench), cfg)
      .toMap
    def ids(name: String) =
      st(name).select("doc_id").collect().map(_.getLong(0)).toSet

    assert(ids("input").size == 26)
    assert(!ids("exact_dedup").contains(2L)) // exact dupe out, canonical kept
    assert(ids("exact_dedup").contains(1L))
    assert(ids("exact_dedup").size == 25)
    assert(!ids("near_dedup").contains(3L)) // near-dupe collapsed onto 1
    assert(ids("near_dedup").contains(1L))
    assert(!ids("decontaminated").contains(4L)) // benchmark 8-gram overlap
    assert(!ids("quality_band").contains(5L)) // surprisal above the band
    assert(ids("quality_band").contains(6L))
    // scrub: PII gone from `redacted`, original text untouched
    val red = st("scrubbed").filter($"doc_id" === 6L)
      .select("redacted", "text").head
    assert(!red.getString(0).contains("bob@example.com"))
    assert(red.getString(0).contains("<EMAIL>"))
    assert(red.getString(1).contains("bob@example.com"))
    // domain cap: no source exceeds 9 docs
    val perSrc = st("domain_cap").groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perSrc.values.forall(_ <= 9), s"cap exceeded: $perSrc")
    // output reproducible row-for-row
    val out1 = Curate.run(docs, "doc_id", "text", "source", Some(bench), cfg)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val out2 = Curate.run(docs.repartition(7), "doc_id", "text", "source",
      Some(bench), cfg).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(out1 == out2)
    assert(out1 == ids("output"))
  }

  test("quality band keeps unscoreable docs (null text) with null surprisal") {
    import spark.implicits._
    val docs = Seq(
      (1L, s"one $filler", "s"), (2L, s"two $filler", "s"),
      (3L, null.asInstanceOf[String], "s")) // tokenizes to nothing → no score
      .toDF("doc_id", "text", "source")
    val out = Curate.run(docs, "doc_id", "text", "source", None,
      Curate.Config(nearDupMinJaccard = None, surprisalBand = Some((0.0, 100.0)),
        capPerSource = None, sampleRate = 1.0))
    val rows = out.select("doc_id", "surprisal").collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(rows.keySet == Set(1L, 2L, 3L)) // the filter must not delete doc 3
    assert(rows(3L).isEmpty) // surfaced as unscored, not silently dropped
    assert(rows(1L).nonEmpty && rows(2L).nonEmpty)
  }

  test("exact dedup never collapses null-text docs into one") {
    import spark.implicits._
    // md5(NULL) is NULL: without the exemption the window would treat all
    // null-text docs as duplicates of each other and keep only the min id
    val docs = Seq(
      (1L, s"a $filler", "s"), (2L, s"a $filler", "s"), // real exact dupes
      (3L, null.asInstanceOf[String], "s"),
      (4L, null.asInstanceOf[String], "s"))
      .toDF("doc_id", "text", "source")
    val out = Curate.run(docs, "doc_id", "text", "source", None,
      Curate.Config(nearDupMinJaccard = None, surprisalBand = None,
        capPerSource = None, sampleRate = 1.0))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(out == Set(1L, 3L, 4L)) // dupe 2 dropped; BOTH null-text docs kept
  }

  test("repetition filter drops degenerate docs, keeps prose and nulls") {
    import spark.implicits._
    val spam = Array.fill(30)("buy now cheap deals online today").mkString(" ")
    val docs = Seq(
      (1L, s"a normal document $filler", "s"),
      (2L, spam, "s"), // every 5-gram duplicated -> dup5 = 1.0
      (3L, null.asInstanceOf[String], "s")) // unevaluable -> kept
      .toDF("doc_id", "text", "source")
    val st = Curate.stages(docs, "doc_id", "text", "source", None,
      Curate.Config(nearDupMinJaccard = None, surprisalBand = None,
        capPerSource = None, sampleRate = 1.0,
        repetitionMaxDup5gram = Some(0.5))).toMap
    assert(st("repetition_filter").select("doc_id").collect()
      .map(_.getLong(0)).toSet == Set(1L, 3L))
    assert(st("output").select("doc_id").collect()
      .map(_.getLong(0)).toSet == Set(1L, 3L))
  }

  test("canonicalize stage makes composed/decomposed duplicates dedupe exactly") {
    import spark.implicits._
    // same visible text, one composed one decomposed: WITHOUT
    // canonicalization md5 differs and both survive exact dedup
    val composed = s"caf\u00E9 menu $filler"
    val decomposed = s"cafe\u0301 menu $filler"
    val docs = Seq((1L, composed, "s"), (2L, decomposed, "s"))
      .toDF("doc_id", "text", "source")
    def run(canon: Boolean) = Curate.run(docs, "doc_id", "text", "source", None,
      Curate.Config(nearDupMinJaccard = None, surprisalBand = None,
        capPerSource = None, sampleRate = 1.0, canonicalize = canon))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(run(false) == Set(1L, 2L)) // hash-distinct without canonicalization
    assert(run(true) == Set(1L)) // canonical twin collapses to the min id
  }

  test("c4 page rules stage drops unpunctuated pages, keeps prose and nulls") {
    import spark.implicits._
    val prose = (1 to 6).map(i => s"This is sentence number $i of the page.").mkString("\n")
    val docs = Seq(
      (1L, prose, "s"),
      (2L, s"word salad no punctuation $filler", "s"),
      (3L, null.asInstanceOf[String], "s"))
      .toDF("doc_id", "text", "source")
    val st = Curate.stages(docs, "doc_id", "text", "source", None,
      Curate.Config(nearDupMinJaccard = None, surprisalBand = None,
        capPerSource = None, sampleRate = 1.0, c4PageRules = true)).toMap
    assert(st("c4_page_rules").select("doc_id").collect()
      .map(_.getLong(0)).toSet == Set(1L, 3L))
  }

  test("url dedup stage collapses URL variants before any text work") {
    import spark.implicits._
    // 1/2/3 are the SAME page spelled three ways (case, default port +
    // tracking params, fragment); texts differ, so only URL dedup can
    // collapse them. 4 is a different page; 5 has no URL (exempt).
    val docs = Seq(
      (1L, s"v1 $filler", "s", "https://Example.com/page?a=1"),
      (2L, s"v2 $filler", "s", "https://example.com:443/page?a=1&utm_source=x"),
      (3L, s"v3 $filler", "s", "https://example.com/page?a=1#top"),
      (4L, s"w4 $filler", "s", "https://example.com/other"),
      (5L, s"x5 $filler", "s", null)
    ).toDF("doc_id", "text", "source", "url")
    val st = Curate.stages(docs, "doc_id", "text", "source", None,
      Curate.Config(nearDupMinJaccard = None, surprisalBand = None,
        urlCol = Some("url"))).toMap
    assert(st("url_dedup").select("doc_id").collect()
      .map(_.getLong(0)).toSet == Set(1L, 4L, 5L)) // min id wins; null exempt
    assert(st("output").count() == 3)
    // disabled by default: no url_dedup frame without the config
    assert(!Curate.stages(docs, "doc_id", "text", "source", None,
      Curate.Config(nearDupMinJaccard = None, surprisalBand = None))
      .exists(_._1 == "url_dedup"))
  }

  test("disabled stages are skipped entirely") {
    import spark.implicits._
    val docs = Seq((1L, s"a $filler", "s"), (2L, s"b $filler", "s"))
      .toDF("doc_id", "text", "source")
    val st = Curate.stages(docs, "doc_id", "text", "source", None,
      Curate.Config(nearDupMinJaccard = None, surprisalBand = None,
        capPerSource = None, sampleRate = 1.0))
    assert(st.map(_._1) == Seq("input", "exact_dedup", "scrubbed", "output"))
    assert(st.last._2.count() == 2)
    // surprisal column only exists when the band stage runs
    assert(!st.last._2.columns.contains("surprisal"))
    assert(st.last._2.columns.contains("redacted"))
  }

  test("classifier gate filters on the distilled model's scores, e2e") {
    import spark.implicits._
    // train on a labeled slice: "alpha"-speak is quality 1, "junk"-speak 0
    val labeled = (0 until 30).map { i =>
      if (i % 2 == 0) (100L + i, "alpha beta alpha beta", 1)
      else (100L + i, "junk junkier junkiest", 0)
    }.toDF("doc_id", "text", "y")
    val feats = TextClassifier.hashedFeatures(labeled, "doc_id", "text", "y", dim = 32)
    val model = TextClassifier.train(feats, dim = 32, iters = 8, lr = 2.0)

    // gate a fresh corpus with the trained model inside the curation run
    val corpus = Seq(
      (1L, "alpha beta alpha", "s1"),
      (2L, "junk junkier junk", "s1"),
      (3L, "alpha beta beta alpha", "s2"),
      (4L, "junkiest junk junkier", "s2"),
      (5L, "", "s2") // empty text: bias-only margin, still scored
    ).toDF("doc_id", "text", "source")
    val st = Curate.stages(corpus, "doc_id", "text", "source",
      benchmarks = None,
      cfg = Curate.Config(nearDupMinJaccard = None,
        classifierGate = Some((model, 0.5))))
    val gate = st.find(_._1 == "classifier_gate").get._2
    assert(gate.columns.contains("clf_score"))
    val kept = gate.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept.intersect(Set(1L, 3L)) === Set(1L, 3L), "quality docs pass")
    assert(kept.intersect(Set(2L, 4L)).isEmpty, "junk docs are gated out")
    // the empty doc got a real (bias-only) score — present in the scored
    // frame, kept or dropped by the threshold, never silently missing
    val scored = st.last._2
    assert(scored.columns.contains("clf_score"))
  }
}
