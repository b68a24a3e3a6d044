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
    spark
  }

  /** init + register the sfDir tables as temp views. */
  def init(spark: SparkSession, sfDir: String): SparkSession = {
    init(spark)
    Tables.registerAll(spark, sfDir)
    spark
  }
}
