package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions.udf

/** The engine's UDF surface — the operators Spark genuinely can't express
  * with built-in functions (SURVEY.md §2.8). Everything else in this package
  * is pure Column composition; keep it that way so the hot paths stay inside
  * whole-stage codegen.
  */
object GraftFunctions {

  /** Sentence-aware chunker → ARRAY<STRUCT<chunk_index INT, content STRING>>,
    * explode-ready (1→N generator shape).
    */
  val chunkTextUdf: UserDefinedFunction =
    udf((text: String, size: Int, overlap: Int) =>
      TextChunker.chunkSentenceAware(Option(text).getOrElse(""), size, overlap)
        .zipWithIndex.map { case (c, i) => ChunkPiece(i, c) })

  def chunkText(text: Column, size: Int = TextChunker.DefaultChunkSize,
                overlap: Int = TextChunker.DefaultOverlap): Column =
    chunkTextUdf(text, org.apache.spark.sql.functions.lit(size),
      org.apache.spark.sql.functions.lit(overlap))

  /** Deterministic mock embedding (ARRAY<FLOAT>, L2-normalized). */
  val mockEmbedUdf: UserDefinedFunction =
    udf((text: String, dim: Int) => MockEmbedder.embed(Option(text).getOrElse(""), dim))

  def mockEmbed(text: Column, dim: Int = MockEmbedder.DefaultDim): Column =
    mockEmbedUdf(text, org.apache.spark.sql.functions.lit(dim))

  /** RFC 4122 UUIDv5 in the URL namespace (idempotent chunk ids). */
  val uuid5Udf: UserDefinedFunction =
    udf((name: String) => Uuid5.uuid5(Uuid5.NamespaceUrl, Option(name).getOrElse("")).toString)

  def uuid5(name: Column): Column = uuid5Udf(name)

  /** MinHash signature (ARRAY<BIGINT> of length 64) over distinct shingles. */
  val minhashSigUdf: UserDefinedFunction =
    udf((shingles: Seq[String]) =>
      TextHashing.minhashSignature(Option(shingles).getOrElse(Seq.empty)))

  /** One-pass MinHash signature straight from raw text (hot path: no
    * intermediate shingle array column).
    */
  val minhashTextUdf: UserDefinedFunction =
    udf((text: String, n: Int) => TextHashing.minhashSignatureFromText(text, n))

  /** Sorted distinct shingle hashes (ARRAY<BIGINT>) straight from text —
    * the exact-Jaccard set representation.
    */
  val shingleHashesUdf: UserDefinedFunction =
    udf((text: String, n: Int) => TextHashing.shingleHashes(text, n))

  /** LSH band keys from a signature (ARRAY<BIGINT> of length 16). */
  val lshBandsUdf: UserDefinedFunction =
    udf((sig: Seq[Long]) => TextHashing.lshBands(sig.toArray))

  /** Estimated Jaccard between two MinHash signatures. */
  val minhashJaccardUdf: UserDefinedFunction =
    udf((a: Seq[Long], b: Seq[Long]) => TextHashing.minhashJaccard(a.toArray, b.toArray))

  /** 64-bit SimHash of whitespace tokens. */
  val simhashUdf: UserDefinedFunction =
    udf((toks: Seq[String]) => TextHashing.simhash64(Option(toks).getOrElse(Seq.empty)))

  /** SimHash 16-bit chunk keys (for hamming-banded candidate join). */
  val simhashChunksUdf: UserDefinedFunction =
    udf((h: Long) => TextHashing.simhashChunks(h))

  /** Hamming distance between two 64-bit hashes. */
  val hammingUdf: UserDefinedFunction =
    udf((a: Long, b: Long) => TextHashing.hammingDistance(a, b))

  /** Whole-text Karp-Rabin rolling-hash fingerprint. */
  val rollingFingerprintUdf: UserDefinedFunction =
    udf((text: String) => TextHashing.rollingFingerprint(Option(text).getOrElse("")))

  /** Winnowing fingerprint set (ARRAY<BIGINT>, deduplicated). */
  val winnowingUdf: UserDefinedFunction =
    udf((text: String) => TextHashing.winnowingFingerprints(Option(text).getOrElse("")))

  /** Heuristic language-ID ("en"/"es"/"fr"/"de"/"zh"/"und"). */
  val langIdUdf: UserDefinedFunction =
    udf((text: String) => LangId.detect(Option(text).getOrElse("")))

  /** Gopher-style repetition stats struct — one parse per document. */
  val repetitionStatsUdf: UserDefinedFunction =
    udf((text: String) => RepetitionStats.compute(text))
}

/** One chunk of a document, with its position. */
case class ChunkPiece(chunk_index: Int, content: String)
