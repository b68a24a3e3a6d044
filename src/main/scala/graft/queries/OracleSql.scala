package graft.queries

/** DuckDB SQL fragment generators that replay graft's integer-hash pipelines
  * (FNV-1a-64 + splitmix64, MinHash, SimHash) inside the oracle, so q29/q2a
  * get hash-exact correctness rows instead of rows-only checks. The technique
  * is the one q2c/q2f/q34 proved: deterministic integer folds as `list_reduce`
  * over HUGEINT, fixed constants inlined as literals.
  *
  * Two structural rules, learned the hard way:
  *  1. u64 arithmetic runs in HUGEINT with explicit `% 2^64`; values convert
  *     to signed BIGINT only at comparison boundaries (minhash takes SIGNED
  *     mins, matching Scala's `Long` ordering).
  *  2. every splitmix64 stage is its own nested-subquery projection. DuckDB
  *     lateral column aliases substitute the full expression per reference,
  *     so chaining mix64 stages through aliases blows up the plan
  *     exponentially (measured: 50× slowdown); nested SELECTs keep it linear.
  */
object OracleSql {

  /** 2^64 as a DuckDB HUGEINT literal. */
  val M64 = "18446744073709551616"

  /** Bitwise XOR of two u64-in-HUGEINT values via 32-bit halves (DuckDB's
    * xor() is BIGINT-only).
    */
  def xor64(a: String, b: String): String =
    s"(xor(CAST(($a) // 4294967296 AS BIGINT), CAST(($b) // 4294967296 AS BIGINT))::HUGEINT * 4294967296" +
      s" + xor(CAST(($a) % 4294967296 AS BIGINT), CAST(($b) % 4294967296 AS BIGINT))::HUGEINT)"

  /** (a * c) mod 2^64 for u64 `a` and constant `c`, split so no intermediate
    * exceeds HUGEINT range.
    */
  def mulmod64(a: String, c: Long): String = {
    val hi = c >>> 32
    val lo = c & 0xffffffffL
    s"((($a)*$lo + ((($a)*$hi) % 4294967296) * 4294967296) % $M64)"
  }

  /** Unsigned right shift of a u64-in-HUGEINT value. */
  def shr64(a: String, k: Int): String = s"(($a) // ${1L << k})"

  /** Wrap `innerSql` (producing u64 column `arg`) in four projection levels
    * computing splitmix64(arg) → column `<prefix>_m`. `keep` lists the
    * pass-through columns of the final projection.
    */
  def mix64Nested(innerSql: String, arg: String, prefix: String, keep: String): (String, String) = {
    var q = s"SELECT *, ((($arg) + 11400714819323198485) % $M64) AS ${prefix}_z1 FROM ($innerSql)"
    val z2 = mulmod64(xor64(s"${prefix}_z1", shr64(s"${prefix}_z1", 30)), 0xbf58476d1ce4e5b9L)
    q = s"SELECT *, $z2 AS ${prefix}_z2 FROM ($q)"
    val z3 = mulmod64(xor64(s"${prefix}_z2", shr64(s"${prefix}_z2", 27)), 0x94d049bb133111ebL)
    q = s"SELECT *, $z3 AS ${prefix}_z3 FROM ($q)"
    val m = xor64(s"${prefix}_z3", shr64(s"${prefix}_z3", 31))
    q = s"SELECT $keep, $m AS ${prefix}_m FROM ($q)"
    (q, s"${prefix}_m")
  }

  /** FNV-1a-64 fold over the codepoints of string column `col` (HUGEINT).
    * The xor uses the low-21-bit trick (codepoints < 2^21 never touch the
    * high bits); empty strings fold to the offset basis exactly like the
    * Scala loop (the `ch <> ''` filter drops string_split('','')'s artifact).
    */
  def fnv64CodepointFold(col: String): String =
    s"list_reduce(list_prepend(CAST(14695981039346656037 AS HUGEINT), " +
      s"list_transform(list_filter(string_split($col, ''), ch -> ch <> ''), " +
      s"ch -> CAST(unicode(ch) AS HUGEINT))), " +
      s"(a, c) -> ((((a // 2097152) * 2097152) + xor(CAST(a % 2097152 AS BIGINT), CAST(c AS BIGINT))::HUGEINT)" +
      s" * 1099511628211) % $M64)"

  /** FNV-1a-32 fold over the UTF-8 BYTES of string column `col` (BIGINT),
    * deriving the bytes arithmetically from each codepoint — the
    * MockEmbedder/mock.go seed. All arithmetic fits BIGINT (h < 2^32,
    * h * prime < 2^57).
    */
  def fnv32Utf8Fold(col: String): String = {
    def f(h: String, b: String) = s"((xor($h, $b) * 16777619) % 4294967296)"
    val one = f("a", "c")
    val two = f(f("a", "(192 + c // 64)"), "(128 + c % 64)")
    val three = f(f(f("a", "(224 + c // 4096)"), "(128 + (c // 64) % 64)"), "(128 + c % 64)")
    val four = f(f(f(f("a", "(240 + c // 262144)"), "(128 + (c // 4096) % 64)"),
      "(128 + (c // 64) % 64)"), "(128 + c % 64)")
    s"list_reduce(list_prepend(CAST(2166136261 AS BIGINT), " +
      s"list_transform(list_filter(string_split($col, ''), ch -> ch <> ''), " +
      s"ch -> CAST(unicode(ch) AS BIGINT))), " +
      s"(a, c) -> CASE WHEN c < 128 THEN $one WHEN c < 2048 THEN $two " +
      s"WHEN c < 65536 THEN $three ELSE $four END)"
  }

  /** Count-min-sketch bucket replay: wraps `inner` (producing a
    * NON-NEGATIVE BIGINT key column `keyCol`) in the splitmix64 stages of
    * `mix64(key ^ seed)` and emits `(keyCol, bucket)` with bucket = the
    * mix's low bits (`width` a power of two). Matches
    * `CmSketch.bucket` exactly; negative keys would diverge (HUGEINT cast
    * is not a two's-complement reinterpret), hence the contract.
    */
  def cmsBucket(inner: String, keyCol: String, seed: Long, width: Int,
      prefix: String): String = {
    val seedLit = s"CAST(${java.lang.Long.toUnsignedString(seed)} AS HUGEINT)"
    val x = xor64(s"CAST($keyCol AS HUGEINT)", seedLit)
    val step0 = s"SELECT $keyCol, $x AS ${prefix}_x FROM ($inner)"
    val (mixed, c) = mix64Nested(step0, s"${prefix}_x", prefix, keep = keyCol)
    s"SELECT $keyCol, CAST(($c) % $width AS INT) AS bucket FROM ($mixed)"
  }

  /** HyperLogLog estimate replay (p=10, the HllSketch recipe): CTE chain
    * over `keysCte` (a table of NON-NEGATIVE BIGINT column k) ending in
    * `est_<prefix>` with one double column `est` — buckets via the staged
    * splitmix64 chain, rho as binary-string length, Z as the exact HUGEINT
    * dyadic sum, the alpha/raw/small-range-ln expression
    * literal-for-literal with `HllSketch.estimate`.
    */
  def hllEstimate(keysCte: String, prefix: String, seed: Long): String = {
    val seedLit = s"CAST(${java.lang.Long.toUnsignedString(seed)} AS HUGEINT)"
    val inner = s"SELECT k, ${xor64("CAST(k AS HUGEINT)", seedLit)} AS hx FROM $keysCte"
    val (mixed, h) = mix64Nested(inner, "hx", s"hh_$prefix", keep = "k")
    val alpha = "(CAST(0.7213 AS DOUBLE) / (CAST(1.0 AS DOUBLE) + " +
      "CAST(1.079 AS DOUBLE) / CAST(1024.0 AS DOUBLE))) * " +
      "CAST(1024.0 AS DOUBLE) * CAST(1024.0 AS DOUBLE)"
    val raw = s"$alpha * CAST(36028797018963968 AS DOUBLE) / CAST(zs AS DOUBLE)"
    s"""br_$prefix AS (
          SELECT CAST(($h) % 1024 AS INT) AS bucket,
                 CASE WHEN (($h) // 1024) = 0 THEN 55
                      ELSE 55 - LENGTH(format('{:b}', CAST(($h) // 1024 AS BIGINT)))
                 END AS rho
          FROM ($mixed)),
        regs_$prefix AS MATERIALIZED (
          SELECT bucket, MAX(rho) AS rho FROM br_$prefix GROUP BY bucket),
        zv_$prefix AS (
          SELECT COALESCE(SUM(CAST(CAST(1 AS BIGINT) << (55 - rho) AS HUGEINT)),
                   CAST(0 AS HUGEINT))
                   + (1024 - COUNT(*)) * CAST(36028797018963968 AS HUGEINT) AS zs,
                 CAST(1024 - COUNT(*) AS BIGINT) AS v
          FROM regs_$prefix),
        est_$prefix AS (
          SELECT ROUND(CASE WHEN v > 0 AND $raw <= CAST(2560.0 AS DOUBLE)
            THEN CAST(1024.0 AS DOUBLE) * ln(CAST(1024.0 AS DOUBLE) / CAST(v AS DOUBLE))
            ELSE $raw END, 6) AS est
          FROM zv_$prefix)"""
  }

  /** u64-in-HUGEINT → signed BIGINT (two's-complement reinterpretation). */
  def toSigned(v: String): String =
    s"CASE WHEN $v >= 9223372036854775808 THEN CAST($v - $M64 AS BIGINT) ELSE CAST($v AS BIGINT) END"

  /** Shared front of the q29/q2a oracles: RE2-trimmed text, exploded token
    * rows, and each token's hash64 (FNV-1a-64 + mix64) as u64 column `h`.
    * `trimExpr` lets q2a keep TextAnalysis.tokens' space-only trim while q29
    * uses the full RE2 whitespace trim of TextHashing.
    */
  private def tokenHashRows(trimExpr: String, minToks: String): String = {
    val tokLists =
      s"SELECT doc_id, tt, string_split_regex(tt, '\\s+') AS toks, " +
        s"len(string_split_regex(tt, '\\s+')) AS ntoks " +
        s"FROM (SELECT doc_id, $trimExpr AS tt FROM documents)"
    val tokRows =
      s"SELECT doc_id, i, ntoks, toks[i] AS tok FROM ($tokLists) t, " +
        s"UNNEST(range(1, ntoks + 1)) AS u(i) $minToks"
    val fnv = s"SELECT doc_id, i, ntoks, ${fnv64CodepointFold("tok")} AS fnv_raw FROM ($tokRows)"
    val (mixed, c) = mix64Nested(fnv, "fnv_raw", "th", keep = "doc_id, i, ntoks")
    s"SELECT doc_id, i, ntoks, $c AS h FROM ($mixed)"
  }

  /** The full q29 oracle: minhash signatures → 4-component band keys →
    * capped-bucket LSH self-join → signature-agreement estimate. Mirrors
    * Dedup.minhashCandidatePairs(minEstJaccard, maxBucketSize) exactly.
    */
  def minhashPairsOracle(minEstJaccard: Double, maxBucketSize: Int): String = {
    val seeds = graft.functions.TextHashing.permutationSeeds
    val nSeeds = seeds.length
    val seedsLit = seeds.map(s => java.lang.Long.toUnsignedString(s))
      .mkString("[", ",", "]::HUGEINT[]")
    val trimmed = "regexp_replace(text, '^\\s+|\\s+$', '', 'g')"
    val th = tokenHashRows(trimmed, "WHERE ntoks >= 3 AND length(tt) > 0")

    // word-3-gram shingle hash: fold mix64(acc ^ h_j) over the window
    val win =
      "SELECT a.doc_id, a.h AS h1, b.h AS h2, c.h AS h3 " +
        "FROM th_cte a JOIN th_cte b ON a.doc_id = b.doc_id AND b.i = a.i + 1 " +
        "JOIN th_cte c ON a.doc_id = c.doc_id AND c.i = a.i + 2"
    var q = s"SELECT *, ${xor64("1099511628211", "h1")} AS x1 FROM ($win)"
    val (q1, m1) = mix64Nested(q, "x1", "s1", keep = "doc_id, h2, h3")
    q = s"SELECT *, ${xor64(m1, "h2")} AS x2 FROM ($q1)"
    val (q2, m2) = mix64Nested(q, "x2", "s2", keep = "doc_id, h3")
    q = s"SELECT *, ${xor64(m2, "h3")} AS x3 FROM ($q2)"
    val (q3, m3) = mix64Nested(q, "x3", "s3", keep = "doc_id")
    val longShingles = s"SELECT DISTINCT doc_id, $m3 AS sh FROM ($q3)"

    // docs with < 3 tokens shingle to hash64 of the whole trimmed text
    val shortFnv =
      s"SELECT doc_id, ${fnv64CodepointFold("tt")} AS fnv_raw " +
        s"FROM (SELECT doc_id, $trimmed AS tt FROM documents) " +
        s"WHERE length(tt) > 0 AND len(string_split_regex(tt, '\\s+')) < 3"
    val (shortQ, shc) = mix64Nested(shortFnv, "fnv_raw", "sh0", keep = "doc_id")
    val shortShingles = s"SELECT doc_id, $shc AS sh FROM ($shortQ)"

    val shingles = s"$longShingles UNION $shortShingles"

    // 64 permutations per shingle; min per (doc, component) over SIGNED values
    val permIn =
      s"SELECT doc_id, i, ${xor64("sh", "sv")} AS px FROM ($shingles) sh_t, " +
        s"(SELECT CAST(i AS INT) AS i, ($seedsLit)[i + 1] AS sv " +
        s"FROM UNNEST(range(0, $nSeeds)) AS s(i)) seed_t"
    val (permQ, pc) = mix64Nested(permIn, "px", "pm", keep = "doc_id, i")
    val comp =
      s"SELECT doc_id, i, min(${toSigned(pc)}) AS c FROM ($permQ) GROUP BY doc_id, i"
    // blank docs keep the all-Long.MaxValue signature
    val emptyComp =
      s"SELECT doc_id, CAST(i AS INT) AS i, 9223372036854775807 AS c " +
        s"FROM (SELECT doc_id, $trimmed AS tt FROM documents) e_t, " +
        s"UNNEST(range(0, $nSeeds)) AS s(i) WHERE length(tt) = 0"

    s"""
    WITH th_cte AS MATERIALIZED ($th),
    allcomp AS MATERIALIZED ($comp UNION ALL $emptyComp),
    sigs AS MATERIALIZED (
      SELECT doc_id, list(c ORDER BY i) AS sig FROM allcomp GROUP BY doc_id),
    bands AS MATERIALIZED (
      SELECT doc_id, CAST(i // 4 AS INT) AS band_idx, list(c ORDER BY i) AS band_key
      FROM allcomp GROUP BY doc_id, i // 4),
    kept AS MATERIALIZED (
      SELECT band_idx, band_key FROM bands GROUP BY band_idx, band_key
      HAVING count(*) > 1 AND count(*) <= $maxBucketSize),
    pruned AS MATERIALIZED (
      SELECT b.* FROM bands b SEMI JOIN kept k
      ON b.band_idx = k.band_idx AND b.band_key = k.band_key),
    cand AS MATERIALIZED (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM pruned a JOIN pruned b
        ON a.band_idx = b.band_idx AND a.band_key = b.band_key AND a.doc_id < b.doc_id)
    SELECT doc_a, doc_b, est_jaccard FROM (
      SELECT doc_a, doc_b,
             CAST(len(list_filter(range(1, $nSeeds + 1), j -> sa.sig[j] = sb.sig[j])) AS DOUBLE) / $nSeeds AS est_jaccard
      FROM cand JOIN sigs sa ON cand.doc_a = sa.doc_id
                JOIN sigs sb ON cand.doc_b = sb.doc_id)
    WHERE est_jaccard >= $minEstJaccard
    ORDER BY doc_a, doc_b"""
  }

  /** The full q2a oracle: 64-bit simhash of whitespace tokens → 16-bit chunk
    * banding with bucket cap → hamming filter. Mirrors Dedup.simhashPairs
    * over TextAnalysis.tokens (Spark trim = space-only; split keeps empty
    * tokens, whose hash64('') folds to mix64(offset) on both engines).
    */
  def simhashPairsOracle(maxHamming: Int, maxBucketSize: Int): String = {
    val th = tokenHashRows("trim(text)", "")
    val signedXor = s"xor(${toSigned("ha")}, ${toSigned("hb")})"
    s"""
    WITH bits AS MATERIALIZED (
      SELECT doc_id, CAST(j AS INT) AS j,
             sum(CASE WHEN (h // (CAST(1 AS HUGEINT) << j)) % 2 = 1 THEN 1 ELSE 0 END) AS hits,
             any_value(ntoks) AS n
      FROM ($th) th_t, UNNEST(range(0, 64)) AS b(j)
      GROUP BY doc_id, j),
    sim AS MATERIALIZED (
      SELECT doc_id,
             sum(CASE WHEN 2 * hits > n THEN CAST(1 AS HUGEINT) << j ELSE CAST(0 AS HUGEINT) END) AS h
      FROM bits GROUP BY doc_id),
    chunks AS MATERIALIZED (
      SELECT doc_id, h, CAST(c AS INT) AS c,
             CAST((h // (CAST(1 AS HUGEINT) << (16 * CAST(c AS INT)))) % 65536 AS BIGINT) AS chunk_val
      FROM sim, UNNEST(range(0, 4)) AS u(c)),
    kept AS MATERIALIZED (
      SELECT c, chunk_val FROM chunks GROUP BY c, chunk_val
      HAVING count(*) > 1 AND count(*) <= $maxBucketSize),
    pruned AS MATERIALIZED (
      SELECT ch.* FROM chunks ch SEMI JOIN kept k ON ch.c = k.c AND ch.chunk_val = k.chunk_val),
    cand AS MATERIALIZED (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b, a.h AS ha, b.h AS hb
      FROM pruned a JOIN pruned b ON a.c = b.c AND a.chunk_val = b.chunk_val AND a.doc_id < b.doc_id)
    SELECT doc_a, doc_b, CAST(bit_count($signedXor) AS INT) AS hamming
    FROM cand WHERE bit_count($signedXor) <= $maxHamming
    ORDER BY doc_a, doc_b"""
  }

  /** CTE chain replaying MockEmbedder over `textCol` of CTE `inCte` keyed by
    * `keyCols`: FNV-32a seed over UTF-8 bytes, sin(uint32(seed*(i+1)) * 0.1)
    * series CAST to FLOAT, float32 sequential L2 normalization (list_reduce
    * keeps Scala's accumulation order). Emits CTE `<p>_unit` with keyCols +
    * `v` (unit FLOAT32 list).
    */
  def mockEmbedCtes(
      inCte: String, textCol: String, keyCols: String, dim: Int, p: String): String = {
    val fnv = fnv32Utf8Fold(textCol)
    s"""${p}_seeded AS MATERIALIZED (
      SELECT $keyCols, $fnv AS seed FROM $inCte),
    ${p}_comps AS (
      SELECT $keyCols, CAST(i AS INT) AS i,
             CAST(sin(CAST((seed * (i + 1)) % 4294967296 AS DOUBLE) * 0.1) AS FLOAT) AS v
      FROM ${p}_seeded, UNNEST(range(0, $dim)) AS u(i)),
    ${p}_vecs AS MATERIALIZED (
      SELECT $keyCols, list(v ORDER BY i) AS vraw FROM ${p}_comps GROUP BY $keyCols),
    ${p}_normed AS (
      SELECT $keyCols, vraw,
             CAST(sqrt(CAST(list_reduce(list_prepend(CAST(0 AS FLOAT), vraw),
               (a, x) -> CAST(a + CAST(x * x AS FLOAT) AS FLOAT)) AS DOUBLE)) AS FLOAT) AS nrm
      FROM ${p}_vecs),
    ${p}_unit AS (
      SELECT $keyCols,
             CASE WHEN nrm > 0 THEN list_transform(vraw, x -> CAST(x / nrm AS FLOAT))
                  ELSE vraw END AS v FROM ${p}_normed)"""
  }

  /** The full q33 oracle: MockEmbedder replayed in SQL ([[mockEmbedCtes]]),
    * cosine vs the query embedding computed Scala-side and inlined as DOUBLE
    * literals (q34 technique).
    */
  def mockEmbedTopKOracle(queryText: String, k: Int, dim: Int): String = {
    val qv = graft.functions.MockEmbedder.embed(queryText, dim)
    val qLit = qv.map(v => v.toDouble.toString).mkString("[", ",", "]::DOUBLE[]")
    s"""
    WITH ${mockEmbedCtes("documents", "text", "doc_id", dim, "e")}
    SELECT doc_id,
           ROUND(CAST(list_cosine_similarity(CAST(v AS DOUBLE[]), $qLit) AS DOUBLE), 6) AS score
    FROM e_unit ORDER BY score DESC, doc_id LIMIT $k"""
  }

  // ------------------------------------------------------------- chunker

  /** CTE chain replaying TextChunker.chunkSentenceAware as a recursive CTE:
    * per-doc sequential window walk with the 200-char sentence/paragraph
    * backtrack, Java-trim of each window, empties dropped. Emits CTE
    * `emitted` with (doc_id, chunk_index, content).
    */
  def chunkCtes(table: String, size: Int, overlap: Int): String = {
    // end of the chunk starting at 0-based `start` (0-based exclusive):
    // backtrack scans positions descending for the LAST sentence-end
    // (./!/? followed by space/\n/\r -> i+1) or paragraph break (\n\n -> i+2)
    def endExpr(start: String): String = {
      val e0 = s"least($start + $size, n)"
      val ss = s"greatest($e0 - 200, $start)"
      val sent = "substr(text, p, 1) IN ('.', '!', '?') AND " +
        "substr(text, p + 1, 1) IN (' ', chr(10), chr(13))"
      val para = "substr(text, p, 1) = chr(10) AND substr(text, p + 1, 1) = chr(10)"
      val maxp = s"list_max(list_filter(range($ss + 1, $e0 + 1), p -> ($sent) OR ($para)))"
      s"CASE WHEN $e0 >= n THEN n WHEN $maxp IS NULL THEN $e0 " +
        s"WHEN substr(text, $maxp, 1) = chr(10) THEN $maxp + 1 ELSE $maxp END"
    }
    // Java String.trim strips every char <= 0x20; the realistic text set
    val trimSet = "' ' || chr(9) || chr(10) || chr(11) || chr(12) || chr(13)"
    val eBase = endExpr("0")
    val eRec = endExpr("nstart")
    s"""chunk_st AS (
      SELECT doc_id, text, length(text) AS n, 0 AS start,
             $eBase AS fin,
             trim(substr(text, 1, $eBase), $trimSet) AS content
      FROM $table WHERE length(text) > 0
      UNION ALL
      SELECT doc_id, text, n, nstart,
             $eRec AS fin,
             trim(substr(text, nstart + 1, $eRec - nstart), $trimSet) AS content
      FROM (
        SELECT doc_id, text, n,
               CASE WHEN greatest(fin - $overlap, 0) > start
                    THEN greatest(fin - $overlap, 0) ELSE fin END AS nstart
        FROM chunk_st WHERE fin < n) nx
    ),
    emitted AS MATERIALIZED (
      SELECT doc_id, start, content,
             CAST(row_number() OVER (PARTITION BY doc_id ORDER BY start) - 1 AS INT)
               AS chunk_index
      FROM chunk_st WHERE length(content) > 0)"""
  }

  // --------------------------------------------------------------- uuid5

  /** CTE chain computing RFC 4122 UUIDv5 (URL namespace) of column `nm` of
    * CTE `inCte` — a full single-block SHA-1 in SQL: message bytes (namespace
    * + ASCII name + padding + BE bit length) -> 16 BE words -> the 80-round
    * compression as a list_reduce whose accumulator is [a,b,c,d,e] plus a
    * 16-entry W ring buffer -> version/variant-patched hex string. Names must
    * be ASCII and <= 39 bytes (chunk ids are '<digits>-<digits>').
    * Emits CTE `u_id` with keyCols + `id`.
    */
  def uuid5Ctes(inCte: String, keyCols: String): String = {
    // RFC 4122 URL namespace 6ba7b811-9dad-11d1-80b4-00c04fd430c8, as bytes
    val ns = "107,167,184,17,157,173,17,209,128,180,0,192,79,212,48,200"
    val msg = s"list_concat(list_concat([$ns]::BIGINT[], " +
      s"list_transform(list_filter(string_split(nm, ''), ch -> ch <> ''), " +
      s"ch -> CAST(unicode(ch) AS BIGINT))), [128]::BIGINT[])"
    val bits = "((16 + length(nm)) * 8)"
    // zeros fill bytes [17+len, 61]; last two bytes are the BE bit length
    // (single-block: bit length < 2^16, higher length bytes are the zeros)
    val padded = s"list_concat(list_concat($msg, " +
      s"list_transform(range(0, 45 - length(nm)), z -> 0)), " +
      s"[$bits // 256, $bits % 256]::BIGINT[])"
    val words = "list_transform(range(0, 16), w -> " +
      "pb[4*w + 1] * 16777216 + pb[4*w + 2] * 65536 + pb[4*w + 3] * 256 + pb[4*w + 4])"
    def rotl(x: String, s: Int): String =
      s"((($x) % ${1L << (32 - s)}) * ${1L << s} + (($x) // ${1L << (32 - s)}))"
    // acc = [a,b,c,d,e] ++ ring16 where ring[i] = W[t-17+i] (acc positions
    // 6..21); W[t-3]=acc[19], W[t-8]=acc[14], W[t-14]=acc[8], W[t-16]=acc[6]
    val wt = s"CASE WHEN x[1] < 16 THEN mw[x[1] + 1] ELSE " +
      rotl("xor(xor(acc[19], acc[14]), xor(acc[8], acc[6]))", 1) + " END"
    val fExpr = "CASE WHEN x[1] < 20 THEN ((acc[2] & acc[3]) | ((4294967295 - acc[2]) & acc[4])) " +
      "WHEN x[1] < 40 THEN xor(xor(acc[2], acc[3]), acc[4]) " +
      "WHEN x[1] < 60 THEN ((acc[2] & acc[3]) | (acc[2] & acc[4]) | (acc[3] & acc[4])) " +
      "ELSE xor(xor(acc[2], acc[3]), acc[4]) END"
    val kExpr = "CASE WHEN x[1] < 20 THEN 1518500249 WHEN x[1] < 40 THEN 1859775393 " +
      "WHEN x[1] < 60 THEN 2400959708 ELSE 3395469782 END"
    val temp = s"((${rotl("acc[1]", 5)} + $fExpr + acc[5] + $kExpr + ($wt)) % 4294967296)"
    val step = s"list_concat(list_concat([$temp, acc[1], ${rotl("acc[2]", 30)}, acc[3], acc[4]], " +
      s"acc[7:21]), [($wt)])"
    val fold = "list_reduce(list_prepend(" +
      "[1732584193, 4023233417, 2562383102, 271733878, 3285377520, " +
      "0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0]::BIGINT[], " +
      s"list_transform(range(0, 80), t -> [t]::BIGINT[])), (acc, x) -> $step)"
    s"""u_pb AS (SELECT $keyCols, nm, $padded AS pb FROM $inCte),
    u_mw AS (SELECT $keyCols, $words AS mw FROM u_pb),
    u_st AS (SELECT $keyCols, $fold AS st FROM u_mw),
    u_id AS MATERIALIZED (SELECT $keyCols,
      printf('%08x-%04x-%04x-%04x-%04x%08x',
        (1732584193 + st[1]) % 4294967296,
        ((4023233417 + st[2]) % 4294967296) // 65536,
        ((((4023233417 + st[2]) % 4294967296) // 256) % 256 % 16 + 80) * 256
          + ((4023233417 + st[2]) % 4294967296) % 256,
        (((2562383102 + st[3]) % 4294967296) // 16777216 % 64 + 128) * 256
          + (((2562383102 + st[3]) % 4294967296) // 65536) % 256,
        ((2562383102 + st[3]) % 4294967296) % 65536,
        (271733878 + st[4]) % 4294967296) AS id
      FROM u_st)"""
  }

  /** The full q35 oracle: recursive-CTE chunker + SHA-1 uuid5 chunk ids. */
  def chunkExplodeOracle(size: Int, overlap: Int): String =
    s"""
    WITH RECURSIVE ${chunkCtes("documents", size, overlap)},
    named AS (
      SELECT doc_id, chunk_index, content,
             CAST(doc_id AS VARCHAR) || '-' || CAST(chunk_index AS VARCHAR) AS nm
      FROM emitted),
    ${uuid5Ctes("named", "doc_id, chunk_index, content")}
    SELECT doc_id, chunk_index, content, id AS chunk_id
    FROM u_id ORDER BY doc_id, chunk_index"""

  /** The full q36 oracle: chunker + uuid5 + MockEmbedder projections (the
    * scaled-int md5 fingerprint proves the full embed executed, in an
    * engine-neutral encoding).
    */
  def ingestTransformOracle(size: Int, overlap: Int, dim: Int): String =
    s"""
    WITH RECURSIVE ${chunkCtes("documents", size, overlap)},
    named AS (
      SELECT e.doc_id, d.lang, e.chunk_index, e.content,
             CAST(e.doc_id AS VARCHAR) || '-' || CAST(e.chunk_index AS VARCHAR) AS nm
      FROM emitted e JOIN documents d ON e.doc_id = d.doc_id),
    ${uuid5Ctes("named", "doc_id, lang, chunk_index, content")},
    ${mockEmbedCtes("u_id", "content", "doc_id, chunk_index", dim, "e")}
    SELECT h.doc_id, h.lang, h.chunk_index, h.content, h.id,
           md5(list_aggregate(list_transform(u.v,
             x -> CAST(CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT) AS VARCHAR)),
             'string_agg', ',')) AS vector_fp,
           CAST($dim AS INT) AS vector_dim,
           ROUND(CAST(u.v[1] AS DOUBLE), 6) AS vector_head
    FROM u_id h JOIN e_unit u ON h.doc_id = u.doc_id AND h.chunk_index = u.chunk_index
    ORDER BY h.doc_id, h.chunk_index"""
}
