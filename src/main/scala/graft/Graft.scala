package graft

import graft.functions.GraftFunctions
import graft.plans.GraftExtensions
import org.apache.spark.sql.SparkSession

/** Engine front door: one call makes every capability available to pure-SQL
  * users — custom codegen'd expressions (`cosine_similarity`, `dot_product`),
  * the UDF surface (chunking, embedding, hashing, language-ID), and the
  * warehouse tables as views.
  *
  * A user of the reference system can then run every query they run today
  * with `spark.sql(...)` alone.
  */
object Graft {

  /** Register expressions + UDFs on an existing session. */
  def init(spark: SparkSession): SparkSession = {
    GraftExtensions.register(spark)
    spark.udf.register("chunk_text", GraftFunctions.chunkTextUdf)
    spark.udf.register("mock_embed", GraftFunctions.mockEmbedUdf)
    spark.udf.register("uuid5", GraftFunctions.uuid5Udf)
    spark.udf.register("minhash_signature", GraftFunctions.minhashTextUdf)
    spark.udf.register("lsh_bands", GraftFunctions.lshBandsUdf)
    spark.udf.register("minhash_jaccard", GraftFunctions.minhashJaccardUdf)
    spark.udf.register("simhash", GraftFunctions.simhashUdf)
    spark.udf.register("hamming", GraftFunctions.hammingUdf)
    spark.udf.register("shingle_hashes", GraftFunctions.shingleHashesUdf)
    spark.udf.register("rolling_fingerprint", GraftFunctions.rollingFingerprintUdf)
    spark.udf.register("winnowing", GraftFunctions.winnowingUdf)
    spark.udf.register("lang_id", GraftFunctions.langIdUdf)
    // bit-identical to DuckDB's jaro_winkler_similarity (FuzzyJoin scaladoc)
    spark.udf.register("jaro_winkler",
      org.apache.spark.sql.functions.udf((a: String, b: String) =>
        if (a == null || b == null) None
        else Some(graft.operators.FuzzyJoin.jaroWinkler(a, b))))
    spark.udf.register("repetition_stats", GraftFunctions.repetitionStatsUdf)
    // the FULL pipeline (strip zero-width/controls BEFORE NFC) — the bare
    // NFC step alone would let a zero-width char block mark composition
    spark.udf.register("canonicalize_text", graft.functions.TextNormalize.canonicalizeUdf)
    // binary ingest + multimodal decode for pure-SQL pipelines
    // (e.g. SELECT parse_document('pdf', content) FROM binaryFiles)
    spark.udf.register("parse_document",
      org.apache.spark.sql.functions.udf((ext: String, bytes: Array[Byte]) =>
        if (ext == null || bytes == null) None
        else graft.sources.Parsers.parseOrNone(ext, bytes)))
    spark.udf.register("media_features",
      org.apache.spark.sql.functions.udf((bytes: Array[Byte], dim: Int) =>
        if (bytes == null) null
        else graft.multimodal.Multimodal.decodeFeatures(bytes, dim)))
    // production-truthful eTLD+1 over the bundled full Mozilla snapshot
    spark.udf.register("registered_domain",
      org.apache.spark.sql.functions.udf((host: String) =>
        Option(graft.functions.PublicSuffixList
          .registeredDomainOf(host, graft.functions.PublicSuffixList.snapshot))))
    // image near-dup keys: (dHash64, aHash64) over the decoded luma grid
    spark.udf.register("perceptual_hashes",
      org.apache.spark.sql.functions.udf((bytes: Array[Byte]) =>
        if (bytes == null) None else graft.multimodal.PerceptualHash.hashes(bytes)))
    spark
  }

  /** init + register the sfDir tables as temp views. */
  def init(spark: SparkSession, sfDir: String): SparkSession = {
    init(spark)
    Tables.registerAll(spark, sfDir)
    spark
  }
}
