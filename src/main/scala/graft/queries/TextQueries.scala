package graft.queries

import graft.Tables
import graft.functions.{GraftFunctions, TextAnalysis}
import graft.operators.{Curate, DataMix, Decontaminate, Dedup, FuzzyJoin, KeywordSearch, LmScore, RuleEngine, Scrub}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis and deduplication queries over the `documents` table — the
  * LLM-training-pipeline surface (token counting, quality scoring,
  * fingerprinting, exact/near dedup, keyword alerting, rule matching,
  * language-ID).
  */
object TextQueries {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents")

  /** Three REAL dHash64 values through the actual decode path, computed
    * once at query-build time (pure JVM, deterministic): a 32×24 RGB
    * gradient encoded as PNG and as BMP (both lossless — identical pixels,
    * so the two hashes are an exact near-dup pair), and a checkerboard of
    * distinct content. Inlined as literals into qcp's Spark plan AND its
    * DuckDB oracle — the decode itself stays spec-gated, these literals
    * are its signed evidence inside the driver gate.
    */
  private lazy val phashGoldens: (Long, Long, Long) = {
    import java.awt.image.BufferedImage
    def img(f: (Int, Int) => Int): BufferedImage = {
      val im = new BufferedImage(32, 24, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 24; x <- 0 until 32) im.setRGB(x, y, f(x, y))
      im
    }
    def enc(im: BufferedImage, fmt: String): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(im, fmt, bos)
      bos.toByteArray
    }
    val grad = img((x, y) => ((x * 7 & 0xff) << 16) | ((y * 9 & 0xff) << 8) | 64)
    val board = img((x, y) =>
      if (((x / 4) + (y / 4)) % 2 == 0) 0xffffff else 0x000000)
    def dhash(bytes: Array[Byte]): Long =
      graft.multimodal.PerceptualHash.hashes(bytes)
        .getOrElse(throw new IllegalStateException("golden image undecodable"))._1
    (dhash(enc(grad, "png")), dhash(enc(grad, "bmp")), dhash(enc(board, "png")))
  }

  val defs: Map[String, Q] = Map(

    // Token counting: whitespace + BPE-ish regex tokens.
    "q20_token_count" -> Q(
      fn = (s, dir) =>
        docs(s, dir).select(
          col("doc_id"), col("n_chars"),
          TextAnalysis.tokenCount(col("text")).as("n_tokens"),
          TextAnalysis.bpeTokenCount(col("text")).as("n_bpe_tokens"))
          .orderBy(col("doc_id")),
      oracle = Some("""
        SELECT doc_id, n_chars,
               CAST(CASE WHEN len(trim(text)) = 0 THEN 0
                    ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS BIGINT) AS n_tokens,
               CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT) AS n_bpe_tokens
        FROM documents ORDER BY doc_id""")),

    // Quality scoring: punctuation / stopword / word-length heuristics.
    "q21_quality_score" -> Q(
      fn = (s, dir) =>
        docs(s, dir).select(
          col("doc_id"),
          TextAnalysis.tokenCount(col("text")).as("n_tokens"),
          TextAnalysis.punctCount(col("text")).as("n_punct"),
          TextAnalysis.stopwordRatio(col("text")).as("stopword_ratio"),
          TextAnalysis.meanWordLen(col("text")).as("mean_word_len"))
          .orderBy(col("doc_id")),
      oracle = Some(s"""
        WITH t AS (
          SELECT doc_id, text, regexp_split_to_array(trim(text), '\\s+') AS toks,
                 CAST(CASE WHEN len(trim(text)) = 0 THEN 0
                      ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS BIGINT) AS n_tokens
          FROM documents)
        SELECT doc_id, n_tokens,
               CAST(len(text) - len(regexp_replace(text, '[[:punct:]]', '', 'g')) AS BIGINT) AS n_punct,
               CASE WHEN n_tokens = 0 THEN 0.0 ELSE
                 CAST(len(list_filter(toks, tk -> tk IN (${TextAnalysis.Stopwords.map("'" + _ + "'").mkString(",")}))) AS DOUBLE) / n_tokens END AS stopword_ratio,
               CASE WHEN n_tokens = 0 THEN 0.0 ELSE
                 CAST(list_sum(list_transform(toks, tk -> len(tk))) AS DOUBLE) / n_tokens END AS mean_word_len
        FROM t ORDER BY doc_id""")),

    // Document fingerprint: sha256 over normalized text.
    "q22_fingerprint" -> Q(
      fn = (s, dir) =>
        docs(s, dir).select(
          col("doc_id"),
          TextAnalysis.fingerprint(col("text")).as("fingerprint"))
          .orderBy(col("doc_id")),
      oracle = Some("""
        SELECT doc_id,
               sha256(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fingerprint
        FROM documents ORDER BY doc_id""")),

    // Exact dedup: content-hash groups with canonical id + copy count.
    "q23_dedup_exact" -> Q(
      fn = (s, dir) =>
        Dedup.exactGroups(docs(s, dir), col("doc_id"), col("text"))
          .orderBy(col("text_hash")),
      oracle = Some("""
        SELECT md5(text) AS text_hash, CAST(MIN(doc_id) AS BIGINT) AS canonical_id,
               CAST(COUNT(*) AS BIGINT) AS n_copies
        FROM documents GROUP BY md5(text) ORDER BY text_hash""")),

    // Near-dedup, exact n-gram Jaccard inside (lang, source) blocks: the
    // top-20 most similar pairs.
    "q24_ngram_jaccard_pairs" -> Q(
      fn = (s, dir) =>
        Dedup.ngramJaccardPairs(docs(s, dir), "doc_id", "text",
          blockCols = Seq("lang", "source"), n = 3)
          .select(col("doc_a"), col("doc_b"), col("jaccard"))
          .orderBy(col("jaccard").desc, col("doc_a"), col("doc_b"))
          .limit(20),
      oracle = Some("""
        WITH t AS (
          SELECT doc_id, lang, source,
                 list_distinct(CASE WHEN len(toks) >= 3
                   THEN list_transform(range(1, len(toks) - 1),
                        i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
                   ELSE [trim(text)] END) AS grams
          FROM (SELECT doc_id, lang, source, text,
                       regexp_split_to_array(trim(text), '\s+') AS toks
                FROM documents WHERE len(regexp_replace(text, '\s', '', 'g')) > 0))
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
                 / len(list_distinct(a.grams || b.grams)) AS jaccard
        FROM t a JOIN t b ON a.lang = b.lang AND a.source = b.source
                         AND a.doc_id < b.doc_id
        ORDER BY jaccard DESC, doc_a, doc_b LIMIT 20"""),
      headline = true),

    // Asymmetric n-gram containment (Broder's resemblance-vs-containment):
    // the subset-duplication detector Jaccard is blind to — a small doc
    // embedded in a large one. Raw double divisions of integer counts,
    // identical on both engines (the q24 contract).
    "q6g_containment_pairs" -> Q(
      fn = (s, dir) =>
        Dedup.ngramContainmentPairs(docs(s, dir), "doc_id", "text",
            blockCols = Seq("lang", "source"), n = 3, minContainment = 0.5)
          .select(col("doc_a"), col("doc_b"), col("cont_a_in_b"),
            col("cont_b_in_a"))
          .orderBy(greatest(col("cont_a_in_b"), col("cont_b_in_a")).desc,
            col("doc_a"), col("doc_b"))
          .limit(50),
      oracle = Some("""
        WITH t AS (
          SELECT doc_id, lang, source,
                 list_distinct(CASE WHEN len(toks) >= 3
                   THEN list_transform(range(1, len(toks) - 1),
                        i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
                   ELSE [trim(text)] END) AS grams
          FROM (SELECT doc_id, lang, source, text,
                       regexp_split_to_array(trim(text), '\s+') AS toks
                FROM documents WHERE len(regexp_replace(text, '\s', '', 'g')) > 0)),
        p AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                 CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
                   / len(a.grams) AS cont_a_in_b,
                 CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
                   / len(b.grams) AS cont_b_in_a
          FROM t a JOIN t b ON a.lang = b.lang AND a.source = b.source
                           AND a.doc_id < b.doc_id)
        SELECT doc_a, doc_b, cont_a_in_b, cont_b_in_a FROM p
        WHERE greatest(cont_a_in_b, cont_b_in_a) >= 0.5
        ORDER BY greatest(cont_a_in_b, cont_b_in_a) DESC, doc_a, doc_b
        LIMIT 50""")),

    // F6: keyword predicate (the reference's CONFIDENTIAL alert filter shape).
    "q25_keyword_filter" -> Q(
      fn = (s, dir) =>
        docs(s, dir)
          .filter(upper(col("text")).contains("SPARK") && col("lang") === "en")
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"))
          .orderBy(col("source")),
      oracle = Some("""
        SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs
        FROM documents
        WHERE upper(text) LIKE '%SPARK%' AND lang = 'en'
        GROUP BY source ORDER BY source""")),

    // Per-language corpus stats (A-family over documents).
    "q26_lang_stats" -> Q(
      fn = (s, dir) =>
        docs(s, dir)
          .groupBy(col("lang"))
          .agg(
            count(lit(1)).as("n_docs"),
            sum(col("n_chars")).as("sum_chars"),
            (sum(col("n_chars")).cast("double") / count(lit(1))).as("avg_chars"))
          .orderBy(col("lang")),
      oracle = Some("""
        SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
               CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS avg_chars
        FROM documents GROUP BY lang ORDER BY lang""")),

    // J3 + §2.10: broadcast rule × document join with the deterministic
    // fallback answer (analyst.go:269-292 semantics).
    "q27_rule_matches" -> Q(
      fn = (s, dir) => {
        val rules = RuleEngine.demoRules(s)
        val answered = RuleEngine.evaluate(docs(s, dir), rules, col("text"))
        answered.groupBy(col("rule_id"), col("answer"))
          .agg(count(lit(1)).as("n_docs"))
          .orderBy(col("rule_id"), col("answer"))
      },
      oracle = Some(s"""
        WITH rules AS (SELECT * FROM (VALUES ${RuleEngine.DemoRules.map {
          case (id, q) => s"($id, '$q')" }.mkString(", ")}) AS t(rule_id, question)),
        answered AS (
          SELECT r.rule_id,
                 CASE
                   WHEN contains(lower(r.question), 'confidential') AND contains(lower(d.text), 'confidential') THEN 'YES'
                   WHEN contains(lower(r.question), 'pricing') AND (contains(lower(d.text), 'pricing') OR contains(lower(d.text), 'price')) THEN 'YES'
                   WHEN contains(lower(r.question), 'secret') AND contains(lower(d.text), 'secret') THEN 'YES'
                   ELSE 'NO' END AS answer
          FROM documents d CROSS JOIN rules r)
        SELECT rule_id, answer, CAST(COUNT(*) AS BIGINT) AS n_docs
        FROM answered GROUP BY rule_id, answer ORDER BY rule_id, answer""")),

    // Auto-tagging (§2.10): deterministic fallback tags, tag frequencies.
    // The synthetic documents vocabulary contains none of tagger.go's
    // keywords, so tagging bare `text` is vacuously empty — instead tag a
    // keyword-bearing ANNOTATED corpus: each doc joined to its order
    // (doc_id = o_orderkey) and suffixed with the order's priority tag and
    // a status/price phrase, the way a filed business document carries its
    // workflow caption. Every one of the five tags fires on the fixture,
    // including multi-tag docs (urgent + settled + high-value → 3 tags).
    "q28_tag_frequencies" -> Q(
      fn = (s, dir) => {
        val d = docs(s, dir)
        val o = Tables(s, dir, "orders")
        d.join(o, d("doc_id") === o("o_orderkey"))
          .select(concat(
            col("text"), lit(" ["), col("o_orderpriority"), lit("] "),
            when(col("o_orderstatus") === "F", "invoice settled and payment archived")
              .when(col("o_orderstatus") === "O", "open contract pending legal review")
              .otherwise("proposal quote in preparation"),
            when(col("o_totalprice") > 250000, " confidential pricing attached")
              .otherwise("")).as("annotated"))
          .select(explode(RuleEngine.fallbackTags(col("annotated"))).as("tag"))
          .groupBy(col("tag")).agg(count(lit(1)).as("n_docs"))
          .orderBy(col("tag"))
      },
      oracle = Some("""
        WITH annotated AS (
          SELECT d.text || ' [' || o.o_orderpriority || '] ' ||
            CASE o.o_orderstatus
              WHEN 'F' THEN 'invoice settled and payment archived'
              WHEN 'O' THEN 'open contract pending legal review'
              ELSE 'proposal quote in preparation' END ||
            CASE WHEN o.o_totalprice > CAST(250000 AS DOUBLE)
              THEN ' confidential pricing attached' ELSE '' END AS text
          FROM documents d JOIN orders o ON d.doc_id = o.o_orderkey),
        tagged AS (
          SELECT unnest(
            (CASE WHEN contains(lower(text),'legal') OR contains(lower(text),'law') OR contains(lower(text),'contract') THEN ['#legal'] ELSE [] END) ||
            (CASE WHEN contains(lower(text),'invoice') OR contains(lower(text),'billing') OR contains(lower(text),'payment') THEN ['#finance'] ELSE [] END) ||
            (CASE WHEN contains(lower(text),'urgent') OR contains(lower(text),'asap') OR contains(lower(text),'immediate') THEN ['#urgent'] ELSE [] END) ||
            (CASE WHEN contains(lower(text),'proposal') OR contains(lower(text),'quote') THEN ['#proposal'] ELSE [] END) ||
            (CASE WHEN contains(lower(text),'confidential') OR contains(lower(text),'secret') THEN ['#confidential'] ELSE [] END)) AS tag
          FROM annotated)
        SELECT tag, CAST(COUNT(*) AS BIGINT) AS n_docs
        FROM tagged GROUP BY tag ORDER BY tag""")),

    // Repetition ratio: duplicated-3-gram fraction — the standard "loopy
    // generation / boilerplate" quality signal for training corpora.
    "q2d_repetition" -> Q(
      fn = (s, dir) => {
        docs(s, dir)
          .withColumn("toks", TextAnalysis.tokens(col("text")))
          .filter(size(col("toks")) >= 3)
          .withColumn("grams", transform(
            sequence(lit(0), size(col("toks")) - 3),
            i => concat_ws(" ", element_at(col("toks"), i + 1),
              element_at(col("toks"), i + 2), element_at(col("toks"), i + 3))))
          .select(col("doc_id"),
            size(col("grams")).cast("long").as("n_grams"),
            size(array_distinct(col("grams"))).cast("long").as("n_distinct"))
          .withColumn("dup_ratio",
            lit(1.0) - col("n_distinct").cast("double") / col("n_grams"))
          .orderBy(col("doc_id"))
      },
      oracle = Some("""
        WITH t AS (
          SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
          FROM documents)
        SELECT doc_id,
               CAST(len(grams) AS BIGINT) AS n_grams,
               CAST(len(list_distinct(grams)) AS BIGINT) AS n_distinct,
               1.0 - CAST(len(list_distinct(grams)) AS DOUBLE) / len(grams) AS dup_ratio
        FROM (
          SELECT doc_id, list_transform(range(1, len(toks) - 1),
                   i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]) AS grams
          FROM t WHERE len(toks) >= 3)
        ORDER BY doc_id""")),

    // Token document frequency: the corpus-stats op behind IDF weighting
    // and stopword discovery.
    "q2e_token_df" -> Q(
      fn = (s, dir) =>
        docs(s, dir)
          .select(col("doc_id"),
            explode(array_distinct(TextAnalysis.tokens(col("text")))).as("token"))
          .groupBy(col("token"))
          .agg(countDistinct(col("doc_id")).as("doc_freq"))
          .orderBy(col("doc_freq").desc, col("token"))
          .limit(20),
      oracle = Some("""
        SELECT token, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS doc_freq
        FROM (SELECT doc_id,
                unnest(list_distinct(regexp_split_to_array(trim(text), '\s+'))) AS token
              FROM documents)
        GROUP BY token ORDER BY doc_freq DESC, token LIMIT 20""")),

    // MinHash LSH candidate pairs — hash-exact: the FNV-64+splitmix64 token
    // hashes, shingle folds, 64 permutations (seeds inlined as literals),
    // 4-component band keys, bucket cap, and signature-agreement estimate
    // are all replayed in DuckDB by OracleSql.minhashPairsOracle.
    "q29_minhash_lsh_pairs" -> Q(
      fn = (s, dir) =>
        Dedup.minhashCandidatePairs(docs(s, dir), "doc_id", "text",
          minEstJaccard = 0.2)
          .orderBy(col("doc_a"), col("doc_b")),
      oracle = Some(OracleSql.minhashPairsOracle(minEstJaccard = 0.2, maxBucketSize = 1000)),
      headline = true),

    // SimHash near-dup pairs — hash-exact via OracleSql.simhashPairsOracle
    // (per-bit majority vote + 16-bit chunk banding replayed in SQL).
    // maxHamming=3: the 4×16-bit banding is only recall-complete up to
    // hamming 3 — a larger filter would silently under-report.
    "q2a_simhash_pairs" -> Q(
      fn = (s, dir) =>
        Dedup.simhashPairs(docs(s, dir), "doc_id", "text", maxHamming = 3)
          .orderBy(col("doc_a"), col("doc_b")),
      oracle = Some(OracleSql.simhashPairsOracle(maxHamming = 3, maxBucketSize = 1000))),

    // Perceptual-hash image near-dup SEMANTICS, driver-gated (VERDICT r7
    // task 6): the decode stays spec-gated (not SQL-replayable), but
    // everything downstream of the hash — 16-bit-chunk banding, bucket
    // cap, Hamming verify — is pure integer SQL (the q2a machinery). The
    // corpus is a deterministic dHash table: mix64(doc_id) per document
    // plus planted re-encode twins at Hamming 1 / 3 (must pair) and 8
    // (candidate-able but must be filtered), plus THREE REAL dHashes from
    // the golden decode path (a gradient image encoded as PNG and BMP —
    // same pixels, so they pair at Hamming 0 — and a distinct checkerboard
    // that must stay unpaired), computed at query-build time with the
    // actual PNG/BMP decoders and inlined as literals on both sides.
    "qcp_phash_neardup" -> Q(
      fn = (s, dir) => {
        val mixUdf = udf((k: Long) => graft.functions.TextHashing.mix64(k))
        def maskExpr(offsets: Seq[Int]): String = offsets
          .map(o => s"shiftleft(CAST(1 AS BIGINT), CAST((media_id + $o) % 61 AS INT))")
          .mkString("(", " ^ ", ")")
        val base = docs(s, dir)
          .select(col("doc_id").cast("long").as("media_id"))
          .withColumn("dhash", mixUdf(col("media_id")))
        def twin(mod: Int, idOffset: Long, bits: Seq[Int]): DataFrame = base
          .filter(col("media_id") % mod === 0)
          .select((col("media_id") + idOffset).as("media_id"),
            expr(s"dhash ^ ${maskExpr(bits)}").as("dhash"))
        val (gA, gA2, gB) = phashGoldens
        import s.implicits._
        val goldens = Seq((900001L, gA), (900002L, gA2), (900003L, gB))
          .toDF("media_id", "dhash")
        val all = base
          .unionByName(twin(5, 100000L, Seq(0)))
          .unionByName(twin(7, 200000L, Seq(0, 13, 29)))
          .unionByName(twin(11, 300000L, Seq(0, 7, 14, 21, 28, 35, 42, 49)))
          .unionByName(goldens)
        Dedup.hammingBandedPairs(all, "media_id", "dhash", maxHamming = 3)
          .select(col("doc_a").as("media_a"), col("doc_b").as("media_b"),
            col("hamming"))
          .orderBy(col("media_a"), col("media_b"))
      },
      oracle = Some {
        val (gA, gA2, gB) = phashGoldens
        def maskSql(offsets: Seq[Int]): String = offsets
          .map(o => s"(CAST(1 AS BIGINT) << CAST((media_id + $o) % 61 AS INT))")
          .reduce((a, b) => s"xor($a, $b)")
        def twinSql(mod: Int, idOffset: Long, bits: Seq[Int]): String =
          s"""SELECT media_id + $idOffset AS media_id, xor(dh, ${maskSql(bits)}) AS dh
              FROM base WHERE media_id % $mod = 0"""
        val (mixed, m) = OracleSql.mix64Nested(
          "SELECT media_id, CAST(media_id AS HUGEINT) AS hx FROM ids",
          "hx", "ph", keep = "media_id")
        val unsign = "CAST(dh AS HUGEINT) + CASE WHEN dh < 0 THEN " +
          s"CAST(${OracleSql.M64} AS HUGEINT) ELSE CAST(0 AS HUGEINT) END"
        s"""
        WITH ids AS MATERIALIZED (
          SELECT CAST(doc_id AS BIGINT) AS media_id FROM documents),
        base AS MATERIALIZED (
          SELECT media_id, ${OracleSql.toSigned(s"($m)")} AS dh FROM ($mixed)),
        allh AS MATERIALIZED (
          SELECT * FROM base
          UNION ALL ${twinSql(5, 100000L, Seq(0))}
          UNION ALL ${twinSql(7, 200000L, Seq(0, 13, 29))}
          UNION ALL ${twinSql(11, 300000L, Seq(0, 7, 14, 21, 28, 35, 42, 49))}
          UNION ALL SELECT * FROM (VALUES
            (CAST(900001 AS BIGINT), CAST($gA AS BIGINT)),
            (CAST(900002 AS BIGINT), CAST($gA2 AS BIGINT)),
            (CAST(900003 AS BIGINT), CAST($gB AS BIGINT))) g(media_id, dh)),
        hu AS (
          SELECT media_id, dh, $unsign AS h FROM allh),
        chunks AS MATERIALIZED (
          SELECT media_id, dh, CAST(c AS INT) AS c,
                 CAST((h // (CAST(1 AS HUGEINT) << (16 * CAST(c AS INT)))) % 65536 AS BIGINT) AS chunk_val
          FROM hu, UNNEST(range(0, 4)) AS u(c)),
        kept AS MATERIALIZED (
          SELECT c, chunk_val FROM chunks GROUP BY c, chunk_val
          HAVING count(*) > 1 AND count(*) <= 1000),
        pruned AS MATERIALIZED (
          SELECT ch.* FROM chunks ch SEMI JOIN kept k
          ON ch.c = k.c AND ch.chunk_val = k.chunk_val),
        cand AS MATERIALIZED (
          SELECT DISTINCT a.media_id AS media_a, b.media_id AS media_b,
                 a.dh AS dha, b.dh AS dhb
          FROM pruned a JOIN pruned b
          ON a.c = b.c AND a.chunk_val = b.chunk_val AND a.media_id < b.media_id)
        SELECT media_a, media_b, CAST(bit_count(xor(dha, dhb)) AS INT) AS hamming
        FROM cand WHERE bit_count(xor(dha, dhb)) <= 3
        ORDER BY media_a, media_b"""
      }),

    // Kneser–Ney smoothed bigram surprisal — the standard curation LM,
    // hash-exact: absolute discounting D=0.75, per-context back-off weight
    // D·N1+(v,·)/c(v), continuation-probability base distribution
    // N1+(·,w)/|bigram types| (position 1 and unseen contexts score with
    // continuation alone). Integer count tables + the q3s
    // round(−ln p, 9)/DECIMAL(28,9) accumulation discipline.
    "qcr_kneser_ney_surprisal" -> Q(
      fn = (s, dir) =>
        graft.operators.LmScore.kneserNeySurprisalScores(
          docs(s, dir), "doc_id", "text")
          .orderBy(col("doc_id")),
      oracle = Some("""
        WITH toks AS (
          SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
          FROM documents),
        pos AS MATERIALIZED (
          SELECT doc_id, p['token'] AS token, p['prev'] AS prev FROM (
            SELECT doc_id, unnest(list_transform(range(1, len(t) + 1),
              i -> {'token': t[i],
                    'prev': CASE WHEN i = 1 THEN NULL ELSE t[i-1] END})) AS p
            FROM toks)),
        bi AS MATERIALIZED (
          SELECT prev, token, COUNT(*) AS c FROM pos
          WHERE prev IS NOT NULL GROUP BY prev, token),
        prevstats AS MATERIALIZED (
          SELECT prev, SUM(c) AS cv, COUNT(*) AS n1pv FROM bi GROUP BY prev),
        types AS (SELECT COUNT(*) AS t_types FROM bi),
        contp AS MATERIALIZED (
          SELECT token, CAST(COUNT(*) AS DOUBLE) / CAST(t_types AS DOUBLE) AS p_cont
          FROM bi CROSS JOIN types GROUP BY token, t_types),
        scored AS (
          SELECT doc_id,
            CAST(ROUND(-ln(
              CASE WHEN pos.prev IS NULL OR ps.cv IS NULL THEN p_cont
                   ELSE GREATEST(CAST(COALESCE(bi.c, 0) AS DOUBLE)
                          - CAST(0.75 AS DOUBLE), CAST(0 AS DOUBLE))
                        / CAST(ps.cv AS DOUBLE)
                      + (CAST(0.75 AS DOUBLE) * CAST(ps.n1pv AS DOUBLE)
                          / CAST(ps.cv AS DOUBLE)) * p_cont END), 9)
              AS DECIMAL(28,9)) AS s
          FROM pos
          JOIN contp USING (token)
          LEFT JOIN bi ON pos.prev = bi.prev AND pos.token = bi.token
          LEFT JOIN prevstats ps ON pos.prev = ps.prev),
        agg AS (SELECT doc_id, SUM(s) AS ssum, COUNT(*) AS n
                FROM scored GROUP BY doc_id)
        SELECT doc_id, ROUND(CAST(ssum AS DOUBLE) / n, 6) AS surprisal,
               CAST(n AS BIGINT) AS n_tokens
        FROM agg ORDER BY doc_id""")),

    // Language-ID heuristic, hash-exact: the stopword scoring + CJK ratio +
    // fixed tiebreak order of LangId.detect re-expressed in DuckDB SQL
    // (list_filter hit counts, CASE ladder encoding "first language with a
    // strictly greater score wins").
    "q2b_langid" -> Q(
      fn = (s, dir) =>
        docs(s, dir)
          .select(col("lang"), GraftFunctions.langIdUdf(col("text")).as("lang_pred"))
          .groupBy(col("lang"), col("lang_pred"))
          .agg(count(lit(1)).as("n_docs"))
          .orderBy(col("lang"), col("lang_pred")),
      oracle = Some("""
        WITH toks AS (
          SELECT lang,
                 string_split_regex(lower(text), '\s+') AS t,
                 regexp_replace(text, '\s', '', 'g') AS ns
          FROM documents),
        scored AS (
          SELECT lang,
            len(list_filter(t, x -> list_contains(['the','and','of','to','in','is','that','it','for','with','was','on'], x))) AS s_en,
            len(list_filter(t, x -> list_contains(['el','la','de','que','y','en','un','una','los','las','por','con'], x))) AS s_es,
            len(list_filter(t, x -> list_contains(['le','la','les','de','des','et','en','un','une','du','que','pour'], x))) AS s_fr,
            len(list_filter(t, x -> list_contains(['der','die','das','und','in','den','von','zu','mit','auf','ist','ein'], x))) AS s_de,
            length(ns) AS total,
            length(regexp_replace(ns, '[^\x{4e00}-\x{9fff}\x{3400}-\x{4dbf}]', '', 'g')) AS cjk
          FROM toks)
        SELECT lang,
          CASE WHEN total > 0 AND cjk * 10 > total THEN 'zh'
               WHEN s_en > 0 AND s_en >= s_es AND s_en >= s_fr AND s_en >= s_de THEN 'en'
               WHEN s_es > 0 AND s_es > s_en AND s_es >= s_fr AND s_es >= s_de THEN 'es'
               WHEN s_fr > 0 AND s_fr > s_en AND s_fr > s_es AND s_fr >= s_de THEN 'fr'
               WHEN s_de > 0 AND s_de > s_en AND s_de > s_es AND s_de > s_fr THEN 'de'
               ELSE 'und' END AS lang_pred,
          count(*) AS n_docs
        FROM scored GROUP BY 1, 2 ORDER BY 1, 2""")),

    // Karp-Rabin rolling fingerprint, hash-exact: the mod-2^61-1 polynomial
    // fold re-expressed as a DuckDB list_reduce over codepoints in HUGEINT
    // (h*base+c stays < 2^81, far inside 128-bit).
    "q2c_rolling_fingerprint" -> Q(
      fn = (s, dir) =>
        docs(s, dir)
          .select(col("doc_id"),
            GraftFunctions.rollingFingerprintUdf(col("text")).as("rolling_fp"))
          .orderBy(col("doc_id")),
      oracle = Some("""
        WITH norm AS (
          SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS s
          FROM documents),
        codes AS (
          SELECT doc_id,
                 list_transform(string_split(s, ''), c -> CAST(unicode(c) AS HUGEINT)) AS cs
          FROM norm)
        SELECT doc_id,
          CAST(CASE WHEN len(cs) = 0 THEN 0
               ELSE list_reduce(list_prepend(CAST(0 AS HUGEINT), cs),
                      (acc, c) -> (acc * 1000003 + c) % 2305843009213693951)
               END AS BIGINT) AS rolling_fp
        FROM codes ORDER BY doc_id""")),

    // Training-mix sampling, hash-exact: per-language mix weights applied as
    // deterministic md5 draws (membership depends only on key+salt, so the
    // mix is reproducible across runs/engines/partitionings; md5 agrees with
    // DuckDB's). Thresholds generated from the same hexThreshold the
    // operator uses.
    "q3c_training_mix" -> Q(
      fn = (s, dir) =>
        DataMix.mixBySource(docs(s, dir), "lang", "doc_id",
          rates = Map("en" -> 0.5, "de" -> 1.0, "fr" -> 0.25, "zh" -> 0.1),
          salt = "mix1")
          .select(col("doc_id"), col("lang"))
          .orderBy(col("doc_id")),
      oracle = Some(s"""
        SELECT doc_id, lang FROM documents
        WHERE (lang = 'en' AND substring(md5(CAST(doc_id AS VARCHAR) || 'mix1'), 1, 8) < '${DataMix.hexThreshold(0.5)}')
           OR (lang = 'de')
           OR (lang = 'fr' AND substring(md5(CAST(doc_id AS VARCHAR) || 'mix1'), 1, 8) < '${DataMix.hexThreshold(0.25)}')
           OR (lang = 'zh' AND substring(md5(CAST(doc_id AS VARCHAR) || 'mix1'), 1, 8) < '${DataMix.hexThreshold(0.1)}')
        ORDER BY doc_id""")),

    // END-TO-END curation pipeline, hash-exact: Curate.run composing exact
    // dedup → benchmark decontamination (docs < 20 are the "benchmark") →
    // unigram-LM quality band → PII scrub → per-source cap (15) →
    // deterministic 0.8 sample, replayed stage-for-stage in one DuckDB
    // query. The transitive near-dup stage is disabled HERE only because
    // its CC fixpoint is oracled separately (q37 text-space, q3l
    // embedding-space); CurateSpec runs the full pipeline including it.
    "q3m_curation_pipeline" -> Q(
      fn = (s, dir) => {
        val d = docs(s, dir)
        Curate.run(
          d.filter(col("doc_id") >= 20), "doc_id", "text", "source",
          benchmarks = Some(d.filter(col("doc_id") < 20)),
          cfg = Curate.Config(
            nearDupMinJaccard = None,
            surprisalBand = Some((3.396, 3.410)),
            capPerSource = Some(15),
            sampleRate = 0.8,
            salt = "curate"))
          .select(col("doc_id"), col("source"), col("surprisal"),
            sha2(col("redacted"), 256).as("redacted_sha"))
          .orderBy(col("doc_id"))
      },
      oracle = {
        val redacted = Scrub.PiiPatterns.foldLeft("text") { case (expr, (name, pat)) =>
          s"regexp_replace($expr, '$pat', '<${name.toUpperCase(java.util.Locale.ROOT)}>', 'g')"
        }
        Some(s"""
        WITH base AS (SELECT doc_id, text, source FROM documents WHERE doc_id >= 20),
        ex AS (SELECT doc_id, text, source FROM (
                 SELECT doc_id, text, source,
                        ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
                 FROM base) WHERE rn = 1 OR text IS NULL),
        dt AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS t
               FROM documents),
        dg AS (SELECT DISTINCT doc_id,
                 unnest(list_transform(range(1, len(t) - 6),
                   i -> array_to_string(t[i : i + 7], ' '))) AS gram
               FROM dt WHERE len(t) >= 8),
        bench AS (SELECT DISTINCT gram FROM dg WHERE doc_id < 20),
        contaminated AS (SELECT DISTINCT dg.doc_id FROM dg JOIN bench USING (gram)
                         WHERE dg.doc_id >= 20),
        clean AS (SELECT e.* FROM ex e LEFT JOIN contaminated c ON e.doc_id = c.doc_id
                  WHERE c.doc_id IS NULL),
        tok AS (SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS token
                FROM base),
        cnt AS MATERIALIZED (SELECT token, COUNT(*) AS c FROM tok GROUP BY token),
        tot AS (SELECT SUM(c) AS t FROM cnt),
        lp AS (SELECT token,
                 CAST(ROUND(-ln(CAST(c AS DOUBLE) / CAST(t AS DOUBLE)), 9)
                      AS DECIMAL(28,9)) AS s
               FROM cnt CROSS JOIN tot),
        surp AS (SELECT doc_id, ROUND(CAST(SUM(s) AS DOUBLE) / COUNT(*), 6) AS surprisal
                 FROM tok JOIN lp USING (token) GROUP BY doc_id),
        qual AS (SELECT c.doc_id, c.text, c.source, sp.surprisal
                 FROM clean c LEFT JOIN surp sp USING (doc_id)
                 WHERE sp.surprisal BETWEEN CAST(3.396 AS DOUBLE) AND CAST(3.410 AS DOUBLE)
                    OR sp.surprisal IS NULL),
        capped AS (SELECT doc_id, text, source, surprisal FROM (
                     SELECT *, ROW_NUMBER() OVER (PARTITION BY source ORDER BY
                       substring(md5(CAST(doc_id AS VARCHAR) || 'curate-cap'), 1, 8),
                       doc_id) AS rn
                     FROM qual) WHERE rn <= 15),
        sampled AS (SELECT * FROM capped
                    WHERE substring(md5(CAST(doc_id AS VARCHAR) || 'curate-mix'), 1, 8)
                          < '${DataMix.hexThreshold(0.8)}')
        SELECT doc_id, source, surprisal, sha256($redacted) AS redacted_sha
        FROM sampled ORDER BY doc_id""")
      },
      headline = true),

    // Unigram-LM surprisal scoring, hash-exact: per-doc mean −ln p(token)
    // under the corpus unigram distribution (the cheap LM quality filter).
    // Per-token surprisal is ROUND(...,9) → DECIMAL(28,9) so per-doc sums
    // are exact and order-free across partitions; the mean divides as double
    // at the query boundary (ROUND 6).
    "q3j_lm_surprisal" -> Q(
      fn = (s, dir) => {
        val d = docs(s, dir)
        val lm = LmScore.unigramLm(d, "text")
        LmScore.surprisalScores(d, "doc_id", "text", broadcast(lm))
          .orderBy(col("doc_id"))
      },
      oracle = Some("""
        WITH tok AS (SELECT doc_id,
                       unnest(regexp_split_to_array(trim(text), '\s+')) AS token
                     FROM documents),
        cnt AS MATERIALIZED (SELECT token, COUNT(*) AS c FROM tok GROUP BY token),
        tot AS (SELECT SUM(c) AS t FROM cnt),
        lp AS (SELECT token,
                 CAST(ROUND(-ln(CAST(c AS DOUBLE) / CAST(t AS DOUBLE)), 9)
                      AS DECIMAL(28,9)) AS s
               FROM cnt CROSS JOIN tot),
        agg AS (SELECT doc_id, SUM(s) AS ssum, COUNT(*) AS n
                FROM tok JOIN lp USING (token) GROUP BY doc_id)
        SELECT doc_id, ROUND(CAST(ssum AS DOUBLE) / n, 6) AS surprisal,
               CAST(n AS BIGINT) AS n_tokens
        FROM agg ORDER BY doc_id""")),

    // Interpolated bigram-LM surprisal, hash-exact: position 1 scores as
    // unigram, later positions as −ln(0.7·p(tok|prev) + 0.3·p(tok)) — the
    // word-order-aware upgrade of q3j (templated text scores low, token
    // salad scores high). λs are explicit literals so the oracle replays
    // the exact doubles; DECIMAL(28,9) per-token accumulation keeps the
    // per-doc sums order-free.
    "q3s_bigram_surprisal" -> Q(
      fn = (s, dir) => {
        val d = docs(s, dir)
        val uni = LmScore.unigramProbs(d, "text")
        val bi = LmScore.bigramLm(d, "text")
        LmScore.interpolatedSurprisalScores(d, "doc_id", "text",
          broadcast(uni), broadcast(bi))
          .orderBy(col("doc_id"))
      },
      headline = true,
      oracle = Some("""
        WITH toks AS (
          SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
          FROM documents),
        pos AS MATERIALIZED (
          SELECT doc_id, p['token'] AS token, p['prev'] AS prev FROM (
            SELECT doc_id, unnest(list_transform(range(1, len(t) + 1),
              i -> {'token': t[i],
                    'prev': CASE WHEN i = 1 THEN NULL ELSE t[i-1] END})) AS p
            FROM toks)),
        uni AS MATERIALIZED (SELECT token, COUNT(*) AS c FROM pos GROUP BY token),
        tot AS (SELECT SUM(c) AS tt FROM uni),
        unip AS (SELECT token, CAST(c AS DOUBLE) / CAST(tt AS DOUBLE) AS p_uni
                 FROM uni CROSS JOIN tot),
        bi AS MATERIALIZED (
          SELECT prev, token, COUNT(*) AS c FROM pos
          WHERE prev IS NOT NULL GROUP BY prev, token),
        bip AS (
          SELECT prev, token,
                 CAST(c AS DOUBLE)
                   / CAST(SUM(c) OVER (PARTITION BY prev) AS DOUBLE) AS p_bi
          FROM bi),
        scored AS (
          SELECT doc_id,
            CAST(ROUND(-ln(
              CASE WHEN pos.prev IS NULL THEN p_uni
                   ELSE CAST(0.7 AS DOUBLE) * COALESCE(p_bi, 0)
                        + CAST(0.3 AS DOUBLE) * p_uni END), 9)
              AS DECIMAL(28,9)) AS s
          FROM pos
          JOIN unip USING (token)
          LEFT JOIN bip ON pos.prev = bip.prev AND pos.token = bip.token),
        agg AS (SELECT doc_id, SUM(s) AS ssum, COUNT(*) AS n
                FROM scored GROUP BY doc_id)
        SELECT doc_id, ROUND(CAST(ssum AS DOUBLE) / n, 6) AS surprisal,
               CAST(n AS BIGINT) AS n_tokens
        FROM agg ORDER BY doc_id""")),

    // C4 line/page cleaning rules (Raffel et al. 2020 §2.2), hash-exact:
    // keep lines ending in terminal punctuation with >= 3 words and no
    // "javascript"; keep pages with >= 5 surviving lines and no
    // "lorem ipsum"/curly brace. Pure codegen column functions — the
    // lambdas only touch their own argument, no UDF. The fixture is
    // single-line word salad, so the driver check first derives line
    // structure deterministically on BOTH sides (" the " → ".\n",
    // " slow " → " javascript ") — n_kept_lines spans 0..5 and keep_page
    // takes both values at sf0.01 (no vacuous hash match).
    "q3u_c4_clean" -> Q(
      fn = (s, dir) => {
        val lined = regexp_replace(
          regexp_replace(col("text"), " the ", ".\n"),
          " slow ", " javascript ")
        docs(s, dir).select(col("doc_id"), lined.as("t"))
          .select(
            col("doc_id"),
            size(graft.functions.C4Rules.keptLines(col("t"))).as("n_kept_lines"),
            graft.functions.C4Rules.keepPage(col("t")).cast("int").as("keep_page"),
            sha2(graft.functions.C4Rules.cleanedText(col("t")), 256).as("cleaned_sha"))
          .orderBy(col("doc_id"))
      },
      oracle = Some("""
        WITH d AS (
          SELECT doc_id,
            regexp_replace(regexp_replace(text, ' the ', '.' || chr(10), 'g'),
                           ' slow ', ' javascript ', 'g') AS t
          FROM documents),
        k AS (
          SELECT doc_id, t,
            list_filter(list_transform(string_split(t, chr(10)), l -> trim(l)),
              l -> regexp_matches(l, '[.!?"]$')
                   AND len(regexp_split_to_array(l, '\s+')) >= 3
                   AND NOT contains(lower(l), 'javascript')) AS kept
          FROM d)
        SELECT doc_id,
          CAST(len(kept) AS INT) AS n_kept_lines,
          CAST(len(kept) >= 5 AND NOT contains(lower(t), 'lorem ipsum')
            AND NOT contains(t, '{') AS INT) AS keep_page,
          sha256(COALESCE(array_to_string(kept, chr(10)), '')) AS cleaned_sha
        FROM k ORDER BY doc_id""")),

    // Unicode canonicalization, hash-exact: CRLF/CR → LF, zero-width strip,
    // C0-control strip, then NFC (Java Normalizer vs DuckDB nfc_normalize).
    // The ASCII fixture would make this vacuous, so the driver check first
    // injects decomposed accents and zero-width salts deterministically on
    // BOTH sides — n_removed is non-zero wherever an injection landed.
    "q3v_canonicalize" -> Q(
      fn = (s, dir) => {
        val salted = regexp_replace(
          regexp_replace(col("text"), " fast ", " cafe\u0301 "),
          " key ", " data\u200Bbase ")
        docs(s, dir).select(col("doc_id"), salted.as("t"))
          .select(
            col("doc_id"),
            sha2(graft.functions.TextNormalize.canonicalize(col("t")), 256)
              .as("canonical_sha"),
            (length(col("t")) -
              length(graft.functions.TextNormalize.canonicalize(col("t"))))
              .cast("long").as("n_removed"))
          .orderBy(col("doc_id"))
      },
      oracle = Some("""
        WITH d AS (
          SELECT doc_id,
            regexp_replace(
              regexp_replace(text, ' fast ', ' cafe' || chr(769) || ' ', 'g'),
              ' key ', ' data' || chr(8203) || 'base ', 'g') AS t
          FROM documents),
        n AS (
          SELECT doc_id, t,
            nfc_normalize(
              regexp_replace(
                regexp_replace(
                  replace(replace(t, chr(13) || chr(10), chr(10)), chr(13), chr(10)),
                  '[\x{200B}\x{200C}\x{200D}\x{FEFF}]', '', 'g'),
                '[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]', '', 'g')) AS c
          FROM d)
        SELECT doc_id, sha256(c) AS canonical_sha,
               CAST(len(t) - len(c) AS BIGINT) AS n_removed
        FROM n ORDER BY doc_id""")),

    // Script-profile columns, hash-exact: per-doc Latin/Han codepoint
    // counts + the Latin ratio over non-whitespace — crawl triage (a "zh"
    // doc that is 80% Latin is mislabeled). Java \p{IsX} vs RE2 \p{X}
    // spell the same Unicode script classes.
    "q49_script_profile" -> Q(
      fn = (s, dir) =>
        docs(s, dir).select(
          col("doc_id"), col("lang"),
          TextAnalysis.scriptCount(col("text"), "Latin").cast("long").as("n_latin"),
          TextAnalysis.scriptCount(col("text"), "Han").cast("long").as("n_han"),
          round(TextAnalysis.scriptRatio(col("text"), "Latin"), 6).as("latin_ratio"))
          .orderBy(col("doc_id")),
      oracle = Some("""
        SELECT doc_id, lang,
               CAST(len(regexp_replace(text, '[^\p{Latin}]', '', 'g')) AS BIGINT) AS n_latin,
               CAST(len(regexp_replace(text, '[^\p{Han}]', '', 'g')) AS BIGINT) AS n_han,
               ROUND(CASE WHEN len(regexp_replace(text, '[\t\n\x0B\f\r ]', '', 'g')) = 0 THEN 0.0
                 ELSE CAST(len(regexp_replace(text, '[^\p{Latin}]', '', 'g')) AS DOUBLE)
                      / len(regexp_replace(text, '[\t\n\x0B\f\r ]', '', 'g')) END, 6) AS latin_ratio
        FROM documents ORDER BY doc_id""")),

    // Intra-doc duplicate-line removal, hash-exact: keep each line's first
    // occurrence in order (the transform twin of q3r's dup-line stats).
    // Line structure is derived on both sides (the fixture is single-line):
    // token-per-line, so the salad's repeated tokens become duplicate lines
    // with per-doc-varying removal counts (NOT vacuous — the " the "-style
    // derivation produced zero duplicate lines corpus-wide). The oracle
    // replays order-preserving distinct via first-occurrence row_number +
    // ordered string_agg.
    "q2g_dedup_lines" -> Q(
      fn = (s, dir) => {
        val lined = regexp_replace(col("text"), " ", "\n")
        docs(s, dir).select(col("doc_id"), lined.as("t"))
          .select(
            col("doc_id"),
            (size(split(col("t"), "\n")) -
              size(array_distinct(split(col("t"), "\n")))).as("n_removed"),
            sha2(TextAnalysis.dedupLines(col("t")), 256).as("dedup_sha"))
          .orderBy(col("doc_id"))
      },
      oracle = Some("""
        WITH d AS (
          SELECT doc_id,
                 string_split(replace(text, ' ', chr(10)), chr(10)) AS ls
          FROM documents),
        pos AS (
          SELECT doc_id, p['i'] AS i, p['l'] AS l FROM (
            SELECT doc_id, unnest(list_transform(range(1, len(ls) + 1),
              i -> {'i': i, 'l': ls[i]})) AS p
            FROM d)),
        firsts AS (
          SELECT doc_id, i, l,
                 row_number() OVER (PARTITION BY doc_id, l ORDER BY i) AS occ
          FROM pos)
        SELECT d2.doc_id,
               CAST(len(d2.ls) - count(f.i) AS INT) AS n_removed,
               sha256(COALESCE(string_agg(f.l, chr(10) ORDER BY f.i), '')) AS dedup_sha
        FROM d d2 LEFT JOIN (SELECT * FROM firsts WHERE occ = 1) f
          ON d2.doc_id = f.doc_id
        GROUP BY d2.doc_id, len(d2.ls)
        ORDER BY d2.doc_id""")),

    // Deterministic train/val/test split, hash-exact: membership is a pure
    // function of (doc_id, salt) — adding docs never moves existing ones
    // between splits, which is what keeps a held-out set held out as the
    // corpus grows. Oracle replays the md5-hex CASE ladder.
    "q3z_split" -> Q(
      fn = (s, dir) =>
        DataMix.deterministicSplit(docs(s, dir).select(col("doc_id")), "doc_id",
          Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), salt = "split1")
          .orderBy(col("doc_id")),
      oracle = Some(s"""
        SELECT doc_id,
          CASE WHEN substring(md5(CAST(doc_id AS VARCHAR) || 'split1'), 1, 8)
                 < '${DataMix.hexThreshold(0.8)}' THEN 'train'
               WHEN substring(md5(CAST(doc_id AS VARCHAR) || 'split1'), 1, 8)
                 < '${DataMix.hexThreshold(0.9)}' THEN 'val'
               ELSE 'test' END AS split
        FROM documents ORDER BY doc_id""")),

    // Weighted sample without replacement (Efraimidis–Spirakis A-Res),
    // hash-exact: top-100 docs by exponential key ln(u)/w with doc length
    // as the quality-proxy weight — "sample by score" corpus selection.
    // u = (md5 draw + 0.5)/2^32; ln and the divisions replay in DuckDB
    // with the same IEEE doubles (the q3y/q38 ln-parity precedent).
    "q4d_weighted_sample" -> Q(
      fn = (s, dir) => {
        val weighted = docs(s, dir).select(col("doc_id"),
          (length(col("text")) + lit(1)).cast("double").as("w"))
        DataMix.weightedSampleTopK(weighted, "doc_id", "w", k = 100,
          salt = "q4d-wsample")
          .orderBy(col("doc_id"))
      },
      oracle = Some("""
        WITH w AS (
          SELECT doc_id, CAST(length(text) + 1 AS DOUBLE) AS w FROM documents),
        keyed AS (
          SELECT doc_id, w,
                 ln((CAST(CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR) || 'q4d-wsample'), 1, 8) AS BIGINT) AS DOUBLE)
                     + CAST(0.5 AS DOUBLE)) / CAST(4294967296 AS DOUBLE)) / w AS wkey
          FROM w WHERE w > 0),
        sel AS (
          SELECT doc_id, w FROM keyed ORDER BY wkey DESC, doc_id LIMIT 100)
        SELECT doc_id, w FROM sel ORDER BY doc_id""")),

    // Weighted per-domain cap, hash-exact: each source keeps its best-drawn
    // 20 docs under the same A-Res exponential key — the per-domain
    // "survive the cap by quality" twin of q4d's global sample.
    "q4e_weighted_domain_cap" -> Q(
      fn = (s, dir) => {
        val weighted = docs(s, dir).select(col("doc_id"), col("source"),
          (length(col("text")) + lit(1)).cast("double").as("w"))
        DataMix.weightedCapPerGroup(weighted, "source", "doc_id", "w",
          n = 20, salt = "q4e-wcap")
          .orderBy(col("doc_id"))
      },
      oracle = Some("""
        WITH w AS (
          SELECT doc_id, source, CAST(length(text) + 1 AS DOUBLE) AS w
          FROM documents),
        keyed AS (
          SELECT doc_id, source, w,
                 ln((CAST(CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR) || 'q4e-wcap'), 1, 8) AS BIGINT) AS DOUBLE)
                     + CAST(0.5 AS DOUBLE)) / CAST(4294967296 AS DOUBLE)) / w AS wkey
          FROM w WHERE w > 0),
        ranked AS (
          SELECT doc_id, source, w,
                 row_number() OVER (PARTITION BY source
                   ORDER BY wkey DESC, doc_id) AS rn
          FROM keyed)
        SELECT doc_id, source, w FROM ranked WHERE rn <= 20
        ORDER BY doc_id""")),

    // Per-doc TF-IDF keyword extraction, hash-exact: top-3 characteristic
    // tokens per doc (tf × ln(N/df), token-ascending tiebreak) — the
    // query-independent complement of BM25 under the same tokenizer
    // contract. One token explode; df re-aggregates the tf table.
    "q3y_tfidf_keywords" -> Q(
      fn = (s, dir) =>
        KeywordSearch.tfidfTopKeywords(docs(s, dir), "doc_id", "text", k = 3)
          .orderBy(col("doc_id"), col("rn")),
      oracle = Some("""
        WITH tf AS MATERIALIZED (
          SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf
          FROM (SELECT doc_id,
                  unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS token
                FROM documents)
          GROUP BY doc_id, token),
        df AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY token),
        n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM documents),
        scored AS (
          SELECT doc_id, token, tf,
                 ROUND(CAST(tf AS DOUBLE) * ln(n.n / CAST(df.df AS DOUBLE)), 6) AS score
          FROM tf JOIN df USING (token) CROSS JOIN n),
        ranked AS (
          SELECT doc_id, token, tf, score,
                 CAST(row_number() OVER (PARTITION BY doc_id
                   ORDER BY score DESC, token) AS INT) AS rn
          FROM scored)
        SELECT doc_id, token, tf, score, rn
        FROM ranked WHERE rn <= 3
        ORDER BY doc_id, rn""")),

    // URL host + registered-domain extraction, hash-exact: the step between
    // a WARC scan and per-domain curation. The fixture has no URL column,
    // so the driver check synthesizes four URL shapes (multi-label TLD,
    // port, deep subdomain + fragment, schemeless) deterministically on
    // both sides — every shape exercises a different stripping rule.
    "q3x_url_domains" -> Q(
      fn = (s, dir) => {
        val u = when(col("doc_id") % 6 === 0,
          concat(lit("https://www."), col("source"), lit(".co.uk/p/"), col("doc_id")))
          .when(col("doc_id") % 6 === 1,
            concat(lit("http://"), col("source"), lit(".example.com:8080/x?q=1")))
          .when(col("doc_id") % 6 === 2,
            concat(lit("https://a.b."), col("source"), lit(".org/path#frag")))
          .when(col("doc_id") % 6 === 3,
            concat(lit("//cdn."), col("source"), lit(".com/asset.js"))) // protocol-relative
          .when(col("doc_id") % 6 === 4,
            concat(lit("HTTPS://WWW."), upper(col("source")), lit(".CO.UK/U"))) // case-folding
          .otherwise(concat(col("source"), lit(".net/no-scheme/path")))
        docs(s, dir).select(col("doc_id"), u.as("url"))
          .select(col("doc_id"), col("url"),
            graft.functions.UrlParts.host(col("url")).as("host"),
            graft.functions.UrlParts.registeredDomain(
              graft.functions.UrlParts.host(col("url"))).as("domain"))
          .orderBy(col("doc_id"))
      },
      oracle = Some("""
        WITH u AS (
          SELECT doc_id,
            CASE WHEN doc_id % 6 = 0 THEN 'https://www.' || source || '.co.uk/p/' || doc_id
                 WHEN doc_id % 6 = 1 THEN 'http://' || source || '.example.com:8080/x?q=1'
                 WHEN doc_id % 6 = 2 THEN 'https://a.b.' || source || '.org/path#frag'
                 WHEN doc_id % 6 = 3 THEN '//cdn.' || source || '.com/asset.js'
                 WHEN doc_id % 6 = 4 THEN 'HTTPS://WWW.' || upper(source) || '.CO.UK/U'
                 ELSE source || '.net/no-scheme/path' END AS url
          FROM documents),
        h AS (
          SELECT doc_id, url,
            lower(regexp_replace(
              regexp_extract(
                regexp_replace(
                  regexp_replace(url, '^([A-Za-z][A-Za-z0-9+.-]*:)?//', ''),
                  '^[^/?#@]*@', ''),
                '^([^/?#]*)', 1),
              ':[0-9]+$', '')) AS host
          FROM u),
        p AS (SELECT doc_id, url, host, string_split(host, '.') AS parts FROM h)
        SELECT doc_id, url, host,
          CASE WHEN len(parts) <= 2 THEN host
               WHEN parts[-2] IN ('co','com','net','org','gov','edu','ac')
                 THEN parts[-3] || '.' || parts[-2] || '.' || parts[-1]
               ELSE parts[-2] || '.' || parts[-1] END AS domain
        FROM p ORDER BY doc_id""")),

    // URL canonicalization, hash-exact: the crawl-dedup key (one page, one
    // URL). Six synthesized shapes exercise every rule on both sides —
    // tracking-param drop + query sort, default-port strip, scheme/host
    // case-folding with path case PRESERVED, fragment strip, empty-path
    // normalization, schemeless passthrough.
    "q4c_url_canonical" -> Q(
      fn = (s, dir) => {
        val u = when(col("doc_id") % 6 === 0,
          concat(lit("https://WWW."), col("source"),
            lit(".com:443/a/b?utm_source=x&b=2&a=1#sec")))
          .when(col("doc_id") % 6 === 1,
            concat(lit("http://"), col("source"), lit(".org:80")))
          .when(col("doc_id") % 6 === 2,
            concat(lit("http://"), col("source"), lit(".org:8080/x?gclid=abc")))
          .when(col("doc_id") % 6 === 3,
            concat(lit("HTTPS://"), upper(col("source")), lit(".Net/Path/?z=1&y=2")))
          .when(col("doc_id") % 6 === 4,
            concat(col("source"), lit(".com/x?utm_campaign=1")))
          .otherwise(concat(lit("https://"), col("source"), lit(".com/a#frag")))
        docs(s, dir).select(col("doc_id"), u.as("url"))
          .select(col("doc_id"), col("url"),
            graft.functions.UrlParts.canonicalize(col("url")).as("canonical"))
          .orderBy(col("doc_id"))
      },
      oracle = Some("""
        WITH u AS (
          SELECT doc_id,
            CASE WHEN doc_id % 6 = 0
                   THEN 'https://WWW.' || source || '.com:443/a/b?utm_source=x&b=2&a=1#sec'
                 WHEN doc_id % 6 = 1 THEN 'http://' || source || '.org:80'
                 WHEN doc_id % 6 = 2 THEN 'http://' || source || '.org:8080/x?gclid=abc'
                 WHEN doc_id % 6 = 3 THEN 'HTTPS://' || upper(source) || '.Net/Path/?z=1&y=2'
                 WHEN doc_id % 6 = 4 THEN source || '.com/x?utm_campaign=1'
                 ELSE 'https://' || source || '.com/a#frag' END AS url
          FROM documents),
        s1 AS (SELECT doc_id, url, regexp_replace(trim(url), '(?s)#.*', '') AS nf FROM u),
        s2 AS (
          SELECT doc_id, url, nf,
                 lower(regexp_extract(nf, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
                 regexp_extract(nf, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1) AS auth,
                 regexp_replace(nf, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*', '') AS rest
          FROM s1),
        s3 AS (
          SELECT doc_id, url, nf, scheme,
                 regexp_extract(auth, '(?s)^(.*@)', 1) ||
                 CASE WHEN scheme = 'http'
                        THEN regexp_replace(lower(regexp_replace(auth, '(?s)^.*@', '')), ':80\z', '')
                      WHEN scheme = 'https'
                        THEN regexp_replace(lower(regexp_replace(auth, '(?s)^.*@', '')), ':443\z', '')
                      ELSE lower(regexp_replace(auth, '(?s)^.*@', '')) END AS hostp,
                 regexp_extract(rest, '^([^?]*)', 1) AS path,
                 regexp_extract(rest, '(?s)^[^?]*\?(.*)', 1) AS q
          FROM s2),
        s4 AS (
          SELECT doc_id, url, nf, scheme, hostp, path,
                 COALESCE(array_to_string(list_sort(list_filter(
                   string_split(q, '&'),
                   p -> NOT regexp_matches(p, '^(utm_[A-Za-z0-9_]*|fbclid|gclid|msclkid)(=|\z)')
                        AND p <> '')), '&'), '') AS sq
          FROM s3)
        SELECT doc_id, url,
               trim(CASE WHEN scheme = '' THEN nf
                    ELSE scheme || '://' || hostp ||
                         CASE WHEN path = '' THEN '/' ELSE path END ||
                         CASE WHEN sq = '' THEN '' ELSE '?' || sq END END) AS canonical
        FROM s4 ORDER BY doc_id""")),

    // Per-source quantile bands, hash-exact: each doc's SOURCE-relative
    // quality quartile (ntile over token count, doc_id tiebreak) — the
    // per-domain normalization step ("keep each source's top quartile"
    // instead of one global cutoff that empties easy domains).
    "q3t_quality_bands" -> Q(
      fn = (s, dir) => {
        val scored = docs(s, dir).select(col("doc_id"), col("source"),
          TextAnalysis.tokenCount(col("text")).as("n_tokens"))
        DataMix.perGroupQuantileBands(scored, "source", "n_tokens", "doc_id", 4)
          .orderBy(col("doc_id"))
      },
      oracle = Some("""
        WITH t AS (
          SELECT doc_id, source,
                 CAST(CASE WHEN len(trim(text)) = 0 THEN 0
                      ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS BIGINT) AS n_tokens
          FROM documents)
        SELECT doc_id, source, n_tokens,
               CAST(ntile(4) OVER (PARTITION BY source ORDER BY n_tokens, doc_id) AS INT) AS band
        FROM t ORDER BY doc_id""")),

    // Per-source domain cap, hash-exact: keep at most 10 docs per source in
    // deterministic (md5 draw, id) order — the heavy-tail curation op that
    // bounds any single domain's contribution to a training mix. Uniform
    // pseudo-random subset, salt-redrawable, partition-invariant
    // (DataMixSpec).
    "q3i_domain_cap" -> Q(
      fn = (s, dir) =>
        DataMix.capPerGroup(docs(s, dir).select(col("doc_id"), col("source")),
          groupCol = "source", keyCol = "doc_id", n = 10, salt = "cap1")
          .orderBy(col("doc_id")),
      oracle = Some("""
        SELECT doc_id, source FROM (
          SELECT doc_id, source,
                 ROW_NUMBER() OVER (PARTITION BY source ORDER BY
                   substring(md5(CAST(doc_id AS VARCHAR) || 'cap1'), 1, 8), doc_id) AS rn
          FROM documents)
        WHERE rn <= 10 ORDER BY doc_id""")),

    // Token-budget sharding, hash-exact: exclusive prefix-sum bin assignment
    // within each language (one window, no iteration) — each bin receives
    // ~2000 tokens.
    "q3d_token_packing" -> Q(
      fn = (s, dir) =>
        DataMix.packByTokenBudget(
          docs(s, dir).select(col("doc_id"), col("lang"),
            TextAnalysis.tokenCount(col("text")).as("n_tokens")),
          groupCol = "lang", orderCol = "doc_id",
          tokensCol = "n_tokens", budget = 2000L)
          .orderBy(col("doc_id")),
      oracle = Some("""
        WITH t AS (
          SELECT doc_id, lang,
                 CAST(CASE WHEN len(trim(text)) = 0 THEN 0
                      ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS BIGINT) AS n_tokens
          FROM documents),
        c AS (
          SELECT doc_id, lang, n_tokens,
                 SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
          FROM t)
        SELECT doc_id, lang, n_tokens,
               CAST((cum - n_tokens) // 2000 AS BIGINT) AS bin
        FROM c ORDER BY doc_id""")),

    // PII scan + redaction, hash-exact: RE2-compatible patterns run
    // identically in Spark and DuckDB; the sha256 of the redacted text
    // validates the full replace pipeline (order-sensitive) per doc.
    "q3e_pii_scrub" -> Q(
      fn = (s, dir) =>
        Scrub.withPiiCounts(docs(s, dir), "text")
          .select(col("doc_id"), col("n_email"), col("n_ipv4"),
            col("n_ssn"), col("n_phone"),
            sha2(Scrub.redact(col("text")), 256).as("redacted_sha"))
          .orderBy(col("doc_id")),
      oracle = {
        val counts = Scrub.PiiPatterns.map { case (name, pat) =>
          s"CAST(len(regexp_extract_all(text, '$pat')) AS INT) AS n_$name"
        }.mkString(",\n               ")
        val redacted = Scrub.PiiPatterns.foldLeft("text") { case (expr, (name, pat)) =>
          s"regexp_replace($expr, '$pat', '<${name.toUpperCase(java.util.Locale.ROOT)}>', 'g')"
        }
        Some(s"""
          SELECT doc_id,
               $counts,
               sha256($redacted) AS redacted_sha
          FROM documents ORDER BY doc_id""")
      }),

    // Benchmark decontamination, hash-exact: corpus docs sharing any word
    // 8-gram with the "benchmark" slice (doc_id < 20) — the standard n-gram
    // contamination droplist, string grams so the oracle replays exactly.
    "q3f_decontamination" -> Q(
      fn = (s, dir) => {
        val d = docs(s, dir)
        Decontaminate.sharedNgrams(
          d.filter(col("doc_id") >= 20), d.filter(col("doc_id") < 20),
          "doc_id", "text", n = 8)
          .orderBy(col("doc_id"))
      },
      oracle = Some("""
        WITH toks AS (
          SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS t
          FROM documents),
        g AS (
          SELECT DISTINCT doc_id,
                 unnest(list_transform(range(1, len(t) - 6),
                   i -> array_to_string(t[i : i + 7], ' '))) AS gram
          FROM toks WHERE len(t) >= 8),
        bench AS (SELECT DISTINCT gram FROM g WHERE doc_id < 20)
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shared_grams
        FROM g JOIN bench USING (gram)
        WHERE doc_id >= 20
        GROUP BY doc_id HAVING count(*) >= 1 ORDER BY doc_id""")),

    // Winnowing fingerprints (Schleimer et al.), hash-exact: per-position
    // k-gram Karp-Rabin hashes re-derived in DuckDB as list_reduce folds
    // over codepoint slices, window minima via list_min over list slices,
    // dedup + sort mirroring the TreeSet. k=8, w=16.
    "q2f_winnowing" -> Q(
      fn = (s, dir) =>
        docs(s, dir)
          .select(col("doc_id"),
            explode(GraftFunctions.winnowingUdf(col("text"))).as("fp"))
          .orderBy(col("doc_id"), col("fp")),
      oracle = Some("""
        WITH norm AS (
          SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS s
          FROM documents),
        codes AS (
          SELECT doc_id, list_transform(string_split(s, ''), c -> CAST(unicode(c) AS HUGEINT)) AS cs
          FROM norm),
        grams AS (
          SELECT doc_id, len(cs) AS n,
            CASE WHEN len(cs) = 0 THEN CAST([] AS BIGINT[])
                 WHEN len(cs) <= 8 THEN [CAST(list_reduce(list_prepend(CAST(0 AS HUGEINT), cs),
                      (acc, c) -> (acc * 1000003 + c) % 2305843009213693951) AS BIGINT)]
                 ELSE list_transform(range(1, len(cs) - 6), i ->
                      CAST(list_reduce(list_prepend(CAST(0 AS HUGEINT), cs[i : i + 7]),
                        (acc, c) -> (acc * 1000003 + c) % 2305843009213693951) AS BIGINT))
            END AS g
          FROM codes),
        fps AS (
          SELECT doc_id,
            CASE WHEN n <= 8 THEN g
                 WHEN len(g) < 16 THEN [list_min(g)]
                 ELSE list_sort(list_distinct(list_transform(range(1, len(g) - 14),
                      st -> list_min(g[st : st + 15]))))
            END AS f
          FROM grams)
        SELECT doc_id, unnest(f) AS fp FROM fps ORDER BY doc_id, fp""")),

    // Passage-level overlap pairs, hash-exact: docs sharing >= 8 winnowing
    // fingerprints (the q2f minima replayed), with ubiquitous fingerprints
    // (> 20 docs) capped out as corpus boilerplate — the copied-paragraph /
    // quotation signal that whole-doc MinHash misses. The oracle reuses the
    // q2f fingerprint CTEs and adds the df-cap + pair-count tail.
    "q3o_passage_overlap_pairs" -> Q(
      fn = (s, dir) =>
        Dedup.passageOverlapPairs(docs(s, dir), "doc_id", "text",
          minShared = 8, maxDocsPerFp = 20)
          .orderBy(col("doc_a"), col("doc_b")),
      oracle = Some("""
        WITH norm AS (
          SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS s
          FROM documents),
        codes AS (
          SELECT doc_id, list_transform(string_split(s, ''), c -> CAST(unicode(c) AS HUGEINT)) AS cs
          FROM norm),
        grams AS (
          SELECT doc_id, len(cs) AS n,
            CASE WHEN len(cs) = 0 THEN CAST([] AS BIGINT[])
                 WHEN len(cs) <= 8 THEN [CAST(list_reduce(list_prepend(CAST(0 AS HUGEINT), cs),
                      (acc, c) -> (acc * 1000003 + c) % 2305843009213693951) AS BIGINT)]
                 ELSE list_transform(range(1, len(cs) - 6), i ->
                      CAST(list_reduce(list_prepend(CAST(0 AS HUGEINT), cs[i : i + 7]),
                        (acc, c) -> (acc * 1000003 + c) % 2305843009213693951) AS BIGINT))
            END AS g
          FROM codes),
        fps AS (
          SELECT doc_id,
            CASE WHEN n <= 8 THEN g
                 WHEN len(g) < 16 THEN [list_min(g)]
                 ELSE list_sort(list_distinct(list_transform(range(1, len(g) - 14),
                      st -> list_min(g[st : st + 15]))))
            END AS f
          FROM grams),
        fp AS MATERIALIZED (SELECT doc_id, unnest(f) AS fp FROM fps),
        rare AS (SELECT fp FROM fp GROUP BY fp
                 HAVING COUNT(*) > 1 AND COUNT(*) <= 20),
        fpc AS (SELECT fp.* FROM fp JOIN rare USING (fp))
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               CAST(COUNT(*) AS BIGINT) AS n_shared_fps
        FROM fpc a JOIN fpc b ON a.fp = b.fp AND a.doc_id < b.doc_id
        GROUP BY 1, 2 HAVING COUNT(*) >= 8
        ORDER BY doc_a, doc_b""")),

    // Gopher-style repetition stats (Rae et al. 2021 table A1 family):
    // duplicate-line fractions + most-frequent/duplicated word-n-gram
    // character fractions, one UDF parse per doc (no shuffle; the oracle
    // replays the same definitions via unnest + group-by). Ties on the top
    // gram break by UTF-8 byte order = DuckDB binary collation.
    "q3r_repetition_stats" -> Q(
      fn = (s, dir) =>
        docs(s, dir)
          .select(col("doc_id"), GraftFunctions.repetitionStatsUdf(col("text")).as("rs"))
          .select(
            col("doc_id"),
            col("rs.nLines").as("n_lines"),
            round(col("rs.dupLineFrac"), 6).as("dup_line_frac"),
            round(col("rs.dupLineCharFrac"), 6).as("dup_line_char_frac"),
            round(col("rs.top2gramFrac"), 6).as("top2gram_char_frac"),
            round(col("rs.top3gramFrac"), 6).as("top3gram_char_frac"),
            round(col("rs.dup5gramFrac"), 6).as("dup5gram_char_frac"))
          .orderBy(col("doc_id")),
      headline = true,
      oracle = Some("""
        WITH lines AS (
          SELECT doc_id,
                 list_filter(list_transform(string_split(text, chr(10)),
                   l -> trim(l, ' ' || chr(9) || chr(13))), l -> l <> '') AS ls
          FROM documents),
        linecnt AS (
          SELECT doc_id, line, count(*) AS c, len(line) AS ll
          FROM (SELECT doc_id, unnest(ls) AS line FROM lines)
          GROUP BY doc_id, line),
        lineagg AS (
          SELECT doc_id,
                 CAST(sum(c) AS BIGINT) AS n_lines,
                 CAST(sum(c) - count(*) AS DOUBLE) / sum(c) AS dup_line_frac,
                 CAST(sum(CASE WHEN c > 1 THEN c * ll ELSE 0 END) AS DOUBLE)
                   / sum(c * ll) AS dup_line_char_frac
          FROM linecnt GROUP BY doc_id),
        toks AS MATERIALIZED (
          SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS t
          FROM documents),
        norm AS (SELECT doc_id, len(array_to_string(t, ' ')) AS nc FROM toks),
        g2cnt AS (
          SELECT doc_id, g, count(*) AS c FROM (
            SELECT doc_id, unnest(list_transform(range(1, len(t)),
              i -> array_to_string(t[i:i+1], ' '))) AS g
            FROM toks WHERE len(t) >= 2)
          GROUP BY doc_id, g),
        top2 AS (
          SELECT doc_id, c * len(g) AS mass,
                 row_number() OVER (PARTITION BY doc_id ORDER BY c DESC, g) AS rn
          FROM g2cnt),
        g3cnt AS (
          SELECT doc_id, g, count(*) AS c FROM (
            SELECT doc_id, unnest(list_transform(range(1, len(t) - 1),
              i -> array_to_string(t[i:i+2], ' '))) AS g
            FROM toks WHERE len(t) >= 3)
          GROUP BY doc_id, g),
        top3 AS (
          SELECT doc_id, c * len(g) AS mass,
                 row_number() OVER (PARTITION BY doc_id ORDER BY c DESC, g) AS rn
          FROM g3cnt),
        g5agg AS (
          SELECT doc_id,
                 CAST(sum(CASE WHEN c > 1 THEN c * len(g) ELSE 0 END) AS DOUBLE)
                   / sum(c * len(g)) AS dup5
          FROM (
            SELECT doc_id, g, count(*) AS c FROM (
              SELECT doc_id, unnest(list_transform(range(1, len(t) - 3),
                i -> array_to_string(t[i:i+4], ' '))) AS g
              FROM toks WHERE len(t) >= 5)
            GROUP BY doc_id, g)
          GROUP BY doc_id)
        SELECT d.doc_id,
               CAST(COALESCE(la.n_lines, 0) AS BIGINT) AS n_lines,
               ROUND(COALESCE(la.dup_line_frac, 0), 6) AS dup_line_frac,
               ROUND(COALESCE(la.dup_line_char_frac, 0), 6) AS dup_line_char_frac,
               ROUND(COALESCE(LEAST(1.0, CAST(t2.mass AS DOUBLE) / n.nc), 0), 6) AS top2gram_char_frac,
               ROUND(COALESCE(LEAST(1.0, CAST(t3.mass AS DOUBLE) / n.nc), 0), 6) AS top3gram_char_frac,
               ROUND(COALESCE(g5.dup5, 0), 6) AS dup5gram_char_frac
        FROM documents d
        LEFT JOIN lineagg la USING (doc_id)
        LEFT JOIN norm n USING (doc_id)
        LEFT JOIN (SELECT doc_id, mass FROM top2 WHERE rn = 1) t2 USING (doc_id)
        LEFT JOIN (SELECT doc_id, mass FROM top3 WHERE rn = 1) t3 USING (doc_id)
        LEFT JOIN g5agg g5 USING (doc_id)
        ORDER BY doc_id""")),

    // Transitive dedup clusters, hash-exact: pointer-jumping connected
    // components over the exact n-gram-Jaccard near-dup pairs (>= 0.5),
    // oracled by a DuckDB recursive reachability CTE + min label. Headline:
    // benches the iterative localCheckpoint loop at sf0.1 every round.
    "q37_dedup_clusters" -> Q(
      fn = (s, dir) => {
        val pairs = Dedup.ngramJaccardPairs(docs(s, dir), "doc_id", "text",
          blockCols = Seq("lang", "source"), n = 3)
          .filter(col("jaccard") >= 0.5)
          .select(col("doc_a"), col("doc_b"))
        Dedup.connectedComponents(pairs).orderBy(col("doc_id"))
      },
      oracle = Some("""
        WITH RECURSIVE t AS (
          SELECT doc_id, lang, source,
                 list_distinct(CASE WHEN len(toks) >= 3
                   THEN list_transform(range(1, len(toks) - 1),
                        i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
                   ELSE [trim(text)] END) AS grams
          FROM (SELECT doc_id, lang, source, text,
                       regexp_split_to_array(trim(text), '\s+') AS toks
                FROM documents WHERE len(regexp_replace(text, '\s', '', 'g')) > 0)),
        pairs AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
          FROM t a JOIN t b ON a.lang = b.lang AND a.source = b.source
                           AND a.doc_id < b.doc_id
          WHERE CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
                  / len(list_distinct(a.grams || b.grams)) >= 0.5),
        edges AS (
          SELECT doc_a AS src, doc_b AS dst FROM pairs
          UNION SELECT doc_b, doc_a FROM pairs),
        reach(node, comp) AS (
          SELECT src, src FROM edges
          UNION
          SELECT e.dst, r.comp FROM reach r JOIN edges e ON e.src = r.node)
        SELECT node AS doc_id, MIN(comp) AS component_id
        FROM reach GROUP BY node ORDER BY doc_id"""),
      headline = true),

    // Okapi BM25 ranked keyword search, hash-exact (the lexical half of
    // hybrid RAG retrieval; Robertson/Lucene idf). Casts in the oracle pin
    // DuckDB to double arithmetic (its bare decimal literals would otherwise
    // run the inner math in DECIMAL).
    "q38_bm25_search" -> Q(
      fn = (s, dir) =>
        KeywordSearch.bm25(docs(s, dir), "doc_id", "text",
          Seq("spark", "window", "merge"), k = 10),
      oracle = Some("""
        WITH toks AS (
          SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\s+')) AS term
          FROM documents),
        lens AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
        stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM lens),
        tf AS (SELECT doc_id, term, count(*) AS tf FROM toks
               WHERE term IN ('spark','window','merge') GROUP BY doc_id, term),
        dfreq AS (SELECT term, count(DISTINCT doc_id) AS df FROM tf GROUP BY term),
        scored AS (
          SELECT tf.doc_id,
                 ln((CAST(stats.n_docs AS DOUBLE) - dfreq.df + 0.5)
                      / (CAST(dfreq.df AS DOUBLE) + 0.5) + 1.0)
                   * (CAST(tf.tf AS DOUBLE) * 2.2)
                   / (CAST(tf.tf AS DOUBLE)
                      + 1.2 * (0.25 + 0.75 * lens.dl / stats.avgdl)) AS w
          FROM tf JOIN dfreq USING (term) JOIN lens USING (doc_id) CROSS JOIN stats)
        SELECT doc_id,
               CAST(ROUND(SUM(CAST(w AS DECIMAL(28,12))), 6) AS DOUBLE) AS score
        FROM scored GROUP BY doc_id ORDER BY score DESC, doc_id LIMIT 10"""),
      headline = true),

    // Reciprocal rank fusion of the BM25 ranking with a quality ranking
    // (stopword ratio) — hybrid retrieval, hash-exact. Each doc gets
    // Σ 1/(60 + rank) over the rankings it appears in.
    "q39_hybrid_rrf" -> Q(
      fn = (s, dir) => {
        val d = docs(s, dir)
        val bm = KeywordSearch.ranked(
          KeywordSearch.bm25(d, "doc_id", "text",
            Seq("spark", "window", "merge"), k = 50), "score")
          .select("doc_id", "rn")
        val qual = KeywordSearch.ranked(
          d.select(col("doc_id"),
            TextAnalysis.stopwordRatio(col("text")).as("score"))
            .orderBy(col("score").desc, col("doc_id")).limit(50), "score")
          .select("doc_id", "rn")
        KeywordSearch.reciprocalRankFusion(Seq(bm, qual), k = 10)
      },
      oracle = Some(s"""
        WITH toks AS (
          SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\\s+')) AS term
          FROM documents),
        lens AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
        stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM lens),
        tf AS (SELECT doc_id, term, count(*) AS tf FROM toks
               WHERE term IN ('spark','window','merge') GROUP BY doc_id, term),
        dfreq AS (SELECT term, count(DISTINCT doc_id) AS df FROM tf GROUP BY term),
        scored AS (
          SELECT tf.doc_id,
                 ln((CAST(stats.n_docs AS DOUBLE) - dfreq.df + 0.5)
                      / (CAST(dfreq.df AS DOUBLE) + 0.5) + 1.0)
                   * (CAST(tf.tf AS DOUBLE) * 2.2)
                   / (CAST(tf.tf AS DOUBLE)
                      + 1.2 * (0.25 + 0.75 * lens.dl / stats.avgdl)) AS w
          FROM tf JOIN dfreq USING (term) JOIN lens USING (doc_id) CROSS JOIN stats),
        bm AS (SELECT doc_id,
                      CAST(ROUND(SUM(CAST(w AS DECIMAL(28,12))), 6) AS DOUBLE) AS score
               FROM scored GROUP BY doc_id ORDER BY score DESC, doc_id LIMIT 50),
        bmr AS (SELECT doc_id, ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS rn FROM bm),
        qual AS (
          SELECT doc_id, CASE WHEN n_tokens = 0 THEN 0.0 ELSE
            CAST(len(list_filter(tks, tk -> tk IN (${TextAnalysis.Stopwords.map("'" + _ + "'").mkString(",")}))) AS DOUBLE) / n_tokens END AS score
          FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS tks,
                       CAST(CASE WHEN len(trim(text)) = 0 THEN 0
                            ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS BIGINT) AS n_tokens
                FROM documents)),
        qtop AS (SELECT doc_id, score FROM qual ORDER BY score DESC, doc_id LIMIT 50),
        qr AS (SELECT doc_id, ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS rn FROM qtop),
        unioned AS (
          SELECT doc_id, CAST(1.0 AS DOUBLE) / (60 + rn) AS contrib FROM bmr
          UNION ALL
          SELECT doc_id, CAST(1.0 AS DOUBLE) / (60 + rn) AS contrib FROM qr)
        SELECT doc_id,
               CAST(ROUND(SUM(CAST(contrib AS DECIMAL(28,12))), 6) AS DOUBLE) AS rrf_score
        FROM unioned GROUP BY doc_id ORDER BY rrf_score DESC, doc_id LIMIT 10""")),

    // Per-source token-length quantiles (p50/p95) via the fixed-grid
    // histogram sketch — the auditable data-card length distribution:
    // 64 bins over [0,128) (width 2.0, an exact double), rank threshold
    // ceil(n·q) in pure integers, estimate = the winning bin's lower
    // edge. Both engines walk identical integer arithmetic; the single
    // terminal multiply-by-2.0 is exact.
    "q4t_length_quantiles" -> Q(
      fn = (s, dir) => {
        val d = docs(s, dir).select(col("source"),
          TextAnalysis.tokenCount(col("text")).as("v"))
        val hist = graft.operators.HistogramSketch
          .histogram(d, "source", col("v"), bins = 64, lo = 0L, hi = 128L)
        graft.operators.HistogramSketch
          .quantiles(hist, Seq(500, 950), bins = 64, lo = 0L, hi = 128L)
          .select(col("g").as("source"), col("qpm"), col("est"))
          .orderBy(col("source"), col("qpm"))
      },
      oracle = Some("""
        WITH t AS (
          SELECT source AS g,
                 CAST(CASE WHEN len(trim(text)) = 0 THEN 0
                      ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS BIGINT) AS v
          FROM documents),
        h AS MATERIALIZED (
          SELECT g, LEAST(GREATEST(v * 64 // 128, 0), 63) AS bin,
                 CAST(COUNT(*) AS BIGINT) AS n
          FROM t GROUP BY 1, 2),
        c AS (
          SELECT g, bin, n,
                 SUM(n) OVER (PARTITION BY g ORDER BY bin
                              ROWS UNBOUNDED PRECEDING) AS cum,
                 SUM(n) OVER (PARTITION BY g) AS total
          FROM h),
        q AS (
          SELECT c.g, qs.qpm, MIN(c.bin) AS qbin
          FROM c CROSS JOIN (VALUES (500), (950)) qs(qpm)
          WHERE c.cum >= (c.total * qs.qpm + 999) // 1000
          GROUP BY c.g, qs.qpm)
        SELECT g AS source, CAST(qpm AS BIGINT) AS qpm,
               CAST(qbin * 2.0 AS DOUBLE) AS est
        FROM q ORDER BY source, qpm""")),

    // Trainable quality classifier (CCNet/fastText-style distillation),
    // hash-exact INCLUDING the training loop: hashed bag-of-token features
    // (poly-31 codepoint fold mod 1e9+7 mod 32 + bias), algebraic fast
    // sigmoid p = 0.5 + 0.5·m/(1+|m|) (no transcendental — cross-engine
    // parity by construction), 2 full-batch GD iterations with
    // DECIMAL(28,12) margin/gradient sums and 9-decimal weight/probability
    // grids (the q4b iterative recipe applied to model training). The label
    // is a deterministic length gate (n_chars >= 250, a 60/40 split at
    // every SF) standing in for the labeled slice a real pipeline distills
    // from. DuckDB replays feature hashing, both GD rounds and the final
    // scoring pass; TextClassifierSpec gates learning (loss decreases) and
    // partition invariance.
    "q5a_quality_classifier" -> Q(
      fn = (s, dir) => {
        val d = docs(s, dir)
          .withColumn("y", (col("n_chars") >= 250).cast("int"))
        val feats = graft.operators.TextClassifier.hashedFeatures(
          d, "doc_id", "text", "y", dim = 32)
        val model = graft.operators.TextClassifier.train(
          feats, dim = 32, iters = 2, lr = 0.5)
        graft.operators.TextClassifier.score(feats, model)
          .select(col("id").as("doc_id"), col("y"), col("score"))
          .orderBy(col("score").desc, col("doc_id"))
          .limit(100)
      },
      oracle = Some("""
        WITH docs AS MATERIALIZED (
          SELECT doc_id, text, CASE WHEN n_chars >= 250 THEN 1 ELSE 0 END AS y
          FROM documents),
        tok AS (
          SELECT doc_id, y,
                 unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS tok
          FROM docs),
        feat AS (
          SELECT doc_id, y,
                 CAST((list_reduce(list_prepend(CAST(0 AS BIGINT),
                   list_transform(list_filter(string_split(tok, ''), ch -> ch <> ''),
                     ch -> CAST(unicode(ch) AS BIGINT))),
                   (a, c) -> (a * 31 + c) % 1000000007)) % 32 AS INT) AS j
          FROM tok),
        cnt AS (SELECT doc_id, y, j, COUNT(*) AS c FROM feat GROUP BY doc_id, y, j),
        ntok AS (SELECT doc_id, COUNT(*) AS nt FROM feat GROUP BY doc_id),
        x AS MATERIALIZED (
          SELECT c.doc_id, c.y, c.j, CAST(c.c AS DOUBLE) / CAST(n.nt AS DOUBLE) AS x
          FROM cnt c JOIN ntok n ON n.doc_id = c.doc_id
          UNION ALL
          SELECT doc_id, y, 32 AS j, CAST(1.0 AS DOUBLE) AS x FROM docs),
        nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM docs),
        w0 AS (SELECT CAST(UNNEST(range(33)) AS INT) AS j, CAST(0.0 AS DOUBLE) AS w),
        m1 AS (
          SELECT x.doc_id, x.y,
                 CAST(SUM(CAST(w.w * x.x AS DECIMAL(28,12))) AS DOUBLE) AS m
          FROM x JOIN w0 w ON w.j = x.j GROUP BY x.doc_id, x.y),
        p1 AS MATERIALIZED (
          SELECT doc_id, y,
                 ROUND(0.5 + (0.5 * m) / (1.0 + abs(m)), 9) AS p FROM m1),
        g1 AS (
          SELECT x.j,
                 CAST(SUM(CAST((p.p - CAST(x.y AS DOUBLE)) * x.x
                   AS DECIMAL(28,12))) AS DOUBLE) AS g
          FROM x JOIN p1 p ON p.doc_id = x.doc_id GROUP BY x.j),
        w1 AS MATERIALIZED (
          SELECT w0.j,
                 ROUND(w0.w - 0.5 * (COALESCE(g.g, 0.0) / (SELECT n FROM nn)), 9) AS w
          FROM w0 LEFT JOIN g1 g ON g.j = w0.j),
        m2 AS (
          SELECT x.doc_id, x.y,
                 CAST(SUM(CAST(w.w * x.x AS DECIMAL(28,12))) AS DOUBLE) AS m
          FROM x JOIN w1 w ON w.j = x.j GROUP BY x.doc_id, x.y),
        p2 AS MATERIALIZED (
          SELECT doc_id, y,
                 ROUND(0.5 + (0.5 * m) / (1.0 + abs(m)), 9) AS p FROM m2),
        g2 AS (
          SELECT x.j,
                 CAST(SUM(CAST((p.p - CAST(x.y AS DOUBLE)) * x.x
                   AS DECIMAL(28,12))) AS DOUBLE) AS g
          FROM x JOIN p2 p ON p.doc_id = x.doc_id GROUP BY x.j),
        w2 AS MATERIALIZED (
          SELECT w1.j,
                 ROUND(w1.w - 0.5 * (COALESCE(g.g, 0.0) / (SELECT n FROM nn)), 9) AS w
          FROM w1 LEFT JOIN g2 g ON g.j = w1.j),
        m3 AS (
          SELECT x.doc_id, x.y,
                 CAST(SUM(CAST(w.w * x.x AS DECIMAL(28,12))) AS DOUBLE) AS m
          FROM x JOIN w2 w ON w.j = x.j GROUP BY x.doc_id, x.y),
        p3 AS (
          SELECT doc_id, y,
                 ROUND(0.5 + (0.5 * m) / (1.0 + abs(m)), 9) AS p FROM m3)
        SELECT doc_id, y, ROUND(p, 6) AS score FROM p3
        ORDER BY score DESC, doc_id LIMIT 100"""),
      headline = true),

    // Corpus-wide exact segment dedup (C4/RefinedWeb repeated-span removal),
    // hash-exact: every doc splits into consecutive 3-token segments, only
    // the corpus-wide FIRST occurrence of each distinct segment survives
    // (first = min (doc_id, seg index), a map-side-combinable min(struct)
    // aggregate — never a window, so boilerplate segments repeated across
    // the whole corpus cannot serialize into one partition), and docs are
    // reassembled from their surviving segments. The word-salad fixture
    // repeats 3-grams heavily, so removal counts are large and
    // discriminative at every SF.
    "q5b_segment_dedup" -> Q(
      fn = (s, dir) =>
        graft.operators.Dedup.dedupSegments(
            docs(s, dir), col("doc_id"), col("text"), segTokens = 3)
          .select(col("id").as("doc_id"), col("clean_text"),
            col("n_kept"), col("n_removed"))
          .orderBy(col("doc_id")),
      oracle = Some("""
        WITH d AS (SELECT doc_id, text FROM documents),
        tok AS (
          SELECT doc_id, unnest(l) AS tok, generate_subscripts(l, 1) - 1 AS pos
          FROM (SELECT doc_id,
                       list_filter(string_split(text, ' '), x -> x <> '') AS l
                FROM d)),
        segs AS MATERIALIZED (
          SELECT doc_id, seg, string_agg(tok, ' ' ORDER BY pos) AS seg_text
          FROM (SELECT doc_id, tok, pos, CAST(pos // 3 AS INT) AS seg FROM tok)
          GROUP BY doc_id, seg),
        kept AS (
          SELECT doc_id, seg, seg_text FROM (
            SELECT doc_id, seg, seg_text,
                   ROW_NUMBER() OVER (PARTITION BY seg_text
                                      ORDER BY doc_id, seg) AS rn
            FROM segs) WHERE rn = 1),
        agg AS (
          SELECT doc_id, string_agg(seg_text, ' ' ORDER BY seg) AS clean_text,
                 COUNT(*) AS n_kept
          FROM kept GROUP BY doc_id),
        tot AS (SELECT doc_id, COUNT(*) AS n_seg FROM segs GROUP BY doc_id)
        SELECT d.doc_id, COALESCE(a.clean_text, '') AS clean_text,
               CAST(COALESCE(a.n_kept, 0) AS BIGINT) AS n_kept,
               CAST(COALESCE(t.n_seg, 0) - COALESCE(a.n_kept, 0) AS BIGINT) AS n_removed
        FROM d LEFT JOIN agg a ON a.doc_id = d.doc_id
               LEFT JOIN tot t ON t.doc_id = d.doc_id
        ORDER BY d.doc_id"""),
      headline = true),

    // Exact-phrase search over a positional inverted index, hash-exact: the
    // query phrase is the corpus's most frequent bigram (count desc, then
    // lexicographic — fully data-derived, so the query is non-vacuous at
    // every SF by construction), and matches are counted per doc via
    // positional equi-joins on term-filtered postings slices — the exact
    // complement of q38's bag-of-words BM25 (positions, not frequencies).
    "q5c_phrase_search" -> Q(
      fn = (s, dir) => {
        val posts = graft.operators.KeywordSearch.postings(
          docs(s, dir), "doc_id", "text").localCheckpoint()
        val big = posts.select(col("doc_id"), col("pos"), col("term").as("t1"))
          .join(posts.select(col("doc_id"), (col("pos") - 1).as("pos"),
            col("term").as("t2")), Seq("doc_id", "pos"))
          .groupBy("t1", "t2").agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("t1"), col("t2"))
          .limit(1).head()
        val (ta, tb) = (big.getString(0), big.getString(1))
        graft.operators.KeywordSearch.phraseCount(posts, Seq(ta, tb))
          .select(col("doc_id"), lit(ta).as("term_a"), lit(tb).as("term_b"),
            col("n_matches"))
          .orderBy(col("n_matches").desc, col("doc_id"))
          .limit(50)
      },
      oracle = Some("""
        WITH toks AS (
          SELECT doc_id, unnest(l) AS term, generate_subscripts(l, 1) - 1 AS pos
          FROM (SELECT doc_id,
                       regexp_split_to_array(lower(trim(text)), '\s+') AS l
                FROM documents)),
        p AS MATERIALIZED (
          SELECT term, doc_id, pos FROM toks WHERE term <> ''),
        big AS MATERIALIZED (
          SELECT t1, t2 FROM (
            SELECT a.term AS t1, b.term AS t2, COUNT(*) AS n
            FROM p a JOIN p b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
            GROUP BY 1, 2 ORDER BY n DESC, t1, t2 LIMIT 1)),
        m AS (
          SELECT a.doc_id, COUNT(*) AS n_matches
          FROM p a JOIN p b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
          JOIN big ON a.term = big.t1 AND b.term = big.t2
          GROUP BY a.doc_id)
        SELECT doc_id, (SELECT t1 FROM big) AS term_a,
               (SELECT t2 FROM big) AS term_b,
               CAST(n_matches AS BIGINT) AS n_matches
        FROM m ORDER BY n_matches DESC, doc_id LIMIT 50""")),

    // Proximity search (term B within 5 tokens after term A), hash-exact:
    // composes the positional postings with the RangeJoin interval-join
    // operator — positions bucketed by floor(pos/w) with the two-bucket
    // anchor expansion, so the proximity pairing is a PURE equi-join (the
    // q4u machinery applied to token positions instead of timestamps; no
    // per-doc quadratic blowup, no inequality join in the plan). Query
    // terms are the corpus's two most frequent (data-derived, non-vacuous
    // at every SF).
    "q5e_proximity_search" -> Q(
      fn = (s, dir) => {
        val posts = graft.operators.KeywordSearch.postings(
          docs(s, dir), "doc_id", "text").localCheckpoint()
        val top2 = posts.groupBy("term").agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("term")).limit(2).collect()
        val (ta, tb) = (top2(0).getString(0), top2(1).getString(0))
        val a = posts.filter(col("term") === ta).select(col("doc_id"), col("pos"))
        val b = posts.filter(col("term") === tb).select(col("doc_id"), col("pos"))
        graft.operators.RangeJoin.within(a, b, Seq("doc_id"), "pos", "pos",
            windowMs = 5L)
          .groupBy("doc_id").agg(count(lit(1)).as("n_pairs"))
          .select(col("doc_id"), lit(ta).as("term_a"), lit(tb).as("term_b"),
            col("n_pairs"))
          .orderBy(col("n_pairs").desc, col("doc_id"))
          .limit(50)
      },
      oracle = Some("""
        WITH toks AS (
          SELECT doc_id, unnest(l) AS term, generate_subscripts(l, 1) - 1 AS pos
          FROM (SELECT doc_id,
                       regexp_split_to_array(lower(trim(text)), '\s+') AS l
                FROM documents)),
        p AS MATERIALIZED (
          SELECT term, doc_id, pos FROM toks WHERE term <> ''),
        t12 AS MATERIALIZED (
          SELECT MAX(CASE WHEN rnk = 1 THEN term END) AS t1,
                 MAX(CASE WHEN rnk = 2 THEN term END) AS t2
          FROM (SELECT term, ROW_NUMBER() OVER (ORDER BY n DESC, term) AS rnk
                FROM (SELECT term, COUNT(*) AS n FROM p GROUP BY term))
          WHERE rnk <= 2),
        m AS (
          SELECT a.doc_id, COUNT(*) AS n_pairs
          FROM p a JOIN t12 ON a.term = t12.t1
          JOIN p b ON b.doc_id = a.doc_id AND b.term = t12.t2
           AND b.pos >= a.pos AND b.pos <= a.pos + 5
          GROUP BY a.doc_id)
        SELECT doc_id, (SELECT t1 FROM t12) AS term_a,
               (SELECT t2 FROM t12) AS term_b,
               CAST(n_pairs AS BIGINT) AS n_pairs
        FROM m ORDER BY n_pairs DESC, doc_id LIMIT 50""")),

    // Boilerplate-span discovery (the droplist BUILDER — q3f checks the
    // corpus against a known list, this finds what belongs on one),
    // hash-exact: every word 4-gram carried by >= 2 distinct docs, with
    // doc frequency and first carrier, top-100 by (n_docs desc, gram).
    // The doc-frequency pick is a map-side-combinable aggregate keyed on
    // the gram — ubiquitous spans partial-aggregate in every map task,
    // never a window partition (the q5b discipline).
    "q5g_repeated_spans" -> Q(
      fn = (s, dir) =>
        graft.operators.Decontaminate.repeatedSpans(
            docs(s, dir), "doc_id", "text", n = 4, minDocs = 2L)
          .orderBy(col("n_docs").desc, col("gram"))
          .limit(100),
      oracle = Some("""
        WITH toks AS (
          SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS t
          FROM documents),
        g AS (
          SELECT DISTINCT doc_id,
                 unnest(list_transform(range(1, len(t) - 2),
                   i -> array_to_string(t[i : i + 3], ' '))) AS gram
          FROM toks WHERE len(t) >= 4)
        SELECT gram, CAST(COUNT(*) AS BIGINT) AS n_docs,
               MIN(doc_id) AS first_doc
        FROM g GROUP BY gram HAVING COUNT(*) >= 2
        ORDER BY n_docs DESC, gram LIMIT 100""")),

    // Edit-distance fuzzy self-join (PassJoin segment filter + codegen
    // levenshtein verify): all catalog-name pairs within 2 typos, with each
    // name's row multiplicity re-attached by equality join afterwards —
    // the collapse/re-expand discipline (never square the duplication).
    // The oracle is the definition: brute-force levenshtein over the
    // distinct names (64 at this SF; the Spark side never does all-pairs).
    "q5j_fuzzy_pairs" -> Q(
      fn = (s, dir) => {
        val part = Tables(s, dir, "part")
        val counts = part.groupBy(col("p_name")).count()
        FuzzyJoin.editDistancePairs(part, "p_name", maxDist = 2)
          .join(counts.select(col("p_name").as("str_a"), col("count").as("n_a")),
            Seq("str_a"))
          .join(counts.select(col("p_name").as("str_b"), col("count").as("n_b")),
            Seq("str_b"))
          .select(col("str_a"), col("str_b"), col("edit_distance"),
            col("n_a"), col("n_b"))
          .orderBy(col("str_a"), col("str_b"))
      },
      oracle = Some("""
        WITH n AS (
          SELECT p_name, CAST(COUNT(*) AS BIGINT) AS cnt
          FROM part GROUP BY 1),
        p AS (
          SELECT a.p_name AS str_a, b.p_name AS str_b,
                 CAST(levenshtein(a.p_name, b.p_name) AS INT) AS edit_distance,
                 a.cnt AS n_a, b.cnt AS n_b
          FROM n a JOIN n b ON a.p_name < b.p_name)
        SELECT str_a, str_b, edit_distance, n_a, n_b
        FROM p WHERE edit_distance BETWEEN 1 AND 2
        ORDER BY str_a, str_b""")),

    // SIF document embeddings (Arora et al., ICLR 2017): smooth-inverse-
    // frequency weighted mean of hash token vectors — w = a/(a+p) snapped
    // to the 9-grid, token vectors as hash64 byte slices scaled to [−1,1],
    // per-(doc,dim) pooling through DECIMAL(28,12). The oracle replays
    // the FNV-1a/splitmix64 fold over the DISTINCT vocabulary (q29
    // machinery) and slices the same bytes in HUGEINT arithmetic.
    "q6a_sif_embeddings" -> Q(
      fn = (s, dir) =>
        graft.operators.SifEmbed.sifEmbeddings(
            docs(s, dir), "doc_id", "text", dim = 8, a = 0.001)
          .orderBy(col("doc_id"), col("dim")),
      oracle = Some(sifOracle(dim = 8))),

    // Flesch reading ease + Flesch-Kincaid grade per document: whitespace
    // words (the q3d tokenizer), vowel-group syllable proxy, [.!?]+
    // sentence runs floored at 1 (the fixture has no punctuation — both
    // engines derive the same structure deterministically, the q3u
    // vacuity rule). Explicit DOUBLE casts on every decimal literal.
    "q7u_readability" -> Q(
      fn = (s, dir) => {
        val base = docs(s, dir).select(col("doc_id"),
          graft.functions.TextAnalysis.tokenCount(col("text")).as("n_words"),
          regexp_count(col("text"), lit("[aeiouyAEIOUY]+")).cast("long")
            .as("n_syllables"),
          greatest(regexp_count(col("text"), lit("[.!?]+")).cast("long"),
            lit(1L)).as("n_sentences"))
        val ws = col("n_words").cast("double") / col("n_sentences").cast("double")
        val sw = col("n_syllables").cast("double") / col("n_words").cast("double")
        base.select(col("doc_id"), col("n_words"), col("n_syllables"),
            col("n_sentences"),
            when(col("n_words") > 0, round(
              lit(206.835) - lit(1.015) * ws - lit(84.6) * sw, 6)).as("flesch"),
            when(col("n_words") > 0, round(
              lit(0.39) * ws + lit(11.8) * sw - lit(15.59), 6)).as("fk_grade"))
          .orderBy(col("doc_id"))
      },
      oracle = Some("""
        WITH b AS (
          SELECT doc_id,
                 CAST(CASE WHEN len(trim(text)) = 0 THEN 0
                      ELSE len(regexp_split_to_array(trim(text), '\s+'))
                      END AS BIGINT) AS n_words,
                 CAST(len(regexp_extract_all(text, '[aeiouyAEIOUY]+'))
                   AS BIGINT) AS n_syllables,
                 GREATEST(CAST(len(regexp_extract_all(text, '[.!?]+'))
                   AS BIGINT), 1) AS n_sentences
          FROM documents)
        SELECT doc_id, n_words, n_syllables, n_sentences,
               CASE WHEN n_words > 0 THEN
                 ROUND(CAST(206.835 AS DOUBLE)
                   - CAST(1.015 AS DOUBLE)
                     * (CAST(n_words AS DOUBLE) / CAST(n_sentences AS DOUBLE))
                   - CAST(84.6 AS DOUBLE)
                     * (CAST(n_syllables AS DOUBLE) / CAST(n_words AS DOUBLE)),
                   6) + CAST(0 AS DOUBLE) END AS flesch,
               CASE WHEN n_words > 0 THEN
                 ROUND(CAST(0.39 AS DOUBLE)
                     * (CAST(n_words AS DOUBLE) / CAST(n_sentences AS DOUBLE))
                   + CAST(11.8 AS DOUBLE)
                     * (CAST(n_syllables AS DOUBLE) / CAST(n_words AS DOUBLE))
                   - CAST(15.59 AS DOUBLE), 6) + CAST(0 AS DOUBLE) END
                 AS fk_grade
        FROM b ORDER BY doc_id"""))
  )

  /** DuckDB replay of [[graft.operators.SifEmbed.sifEmbeddings]]: the
    * hash64 fold runs once per DISTINCT token (mix64Nested's staged
    * projections), bytes are sliced with integer division in HUGEINT,
    * and the pooled sum rides DECIMAL(28,12) like the Spark side.
    */
  private def sifOracle(dim: Int): String = {
    val fnv = s"SELECT token, ${OracleSql.fnv64CodepointFold("token")} AS fnv_raw " +
      "FROM cnt"
    val (mixed, hCol) = OracleSql.mix64Nested(fnv, "fnv_raw", "th", keep = "token")
    val tv = (0 until dim).map { d =>
      val div = java.math.BigInteger.valueOf(256L).pow(d)
      s"""SELECT token, $d AS dim,
         (CAST(CAST(($hCol // $div) % 256 AS BIGINT) AS DOUBLE)
          - CAST(127.5 AS DOUBLE)) / CAST(127.5 AS DOUBLE) AS v
         FROM hb"""
    }.mkString("\nUNION ALL\n")
    s"""
      WITH tok AS (
        SELECT doc_id,
               unnest(regexp_split_to_array(trim(text), '\\s+')) AS token
        FROM documents),
      cnt AS MATERIALIZED (SELECT token, COUNT(*) AS c FROM tok GROUP BY token),
      tot AS (SELECT SUM(c) AS t FROM cnt),
      w AS MATERIALIZED (
        SELECT token,
               ROUND(CAST(0.001 AS DOUBLE) /
                 (CAST(0.001 AS DOUBLE)
                  + CAST(c AS DOUBLE) / CAST(t AS DOUBLE)), 9) AS wt
        FROM cnt CROSS JOIN tot),
      hb AS MATERIALIZED ($mixed),
      tv AS MATERIALIZED ($tv),
      agg AS (
        SELECT t.doc_id, v.dim,
               SUM(CAST(w.wt * v.v AS DECIMAL(28,12))) AS s,
               COUNT(*) AS n
        FROM tok t JOIN w USING (token) JOIN tv v USING (token)
        GROUP BY 1, 2)
      SELECT doc_id, CAST(dim AS INT) AS dim,
             ROUND(CAST(s AS DOUBLE) / n, 6) + CAST(0 AS DOUBLE) AS component,
             CAST(n AS BIGINT) AS n_tokens
      FROM agg ORDER BY doc_id, dim"""
  }
}
