package graft.operators

import graft.functions.{TextAnalysis, TextHashing}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SIF document embeddings (Arora, Liang & Ma, "A simple but tough-to-beat
  * baseline for sentence embeddings", ICLR 2017): each document embedded
  * as the smooth-inverse-frequency weighted mean of its token vectors —
  * w(t) = a / (a + p(t)) downweights stopwords by corpus frequency, so
  * the pooled vector is dominated by informative terms. The classic
  * pre-transformer doc-embedding baseline, and the pooling half of every
  * "embed then dedup/cluster" curation pipeline.
  *
  * Token vectors here are HASH embeddings — byte slices of the corpus
  * hash64 (FNV-1a + splitmix64, [[graft.functions.TextHashing]]), scaled
  * to [−1, 1]. That keeps the operator fully deterministic and
  * oracle-replayable (the same fold the MinHash family replays in SQL);
  * swapping in learned vectors is a drop-in (join on token).
  *
  * Shape at scale: token explode is linear; the frequency table and the
  * hash vectors are built over the DISTINCT vocabulary (Heaps-law sized,
  * joined size-based like the Curate LM — no mandatory broadcast);
  * per-(doc, dim) pooling is one map-side-combinable aggregate over
  * DECIMAL(28,12) products. No window, no collect, no quadratic term.
  */
object SifEmbed {

  private val hash64Udf = udf((s: String) => TextHashing.hash64(s))

  /** (idCol, dim 0-based INT, component DOUBLE, n_tokens) — `dim` rows
    * per document. Components snap to 6 decimals; the SIF weight snaps
    * to the 9-grid before the product so every summand is replayable.
    */
  def sifEmbeddings(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      dim: Int = 8,
      a: Double = 0.001): DataFrame = {
    require(dim >= 1 && dim <= 8, s"dim must be in [1, 8] (one hash64 byte per dim), got $dim")
    require(a > 0.0, s"smoothing a must be positive, got $a")

    val tok = docs.select(col(idCol),
      explode(TextAnalysis.tokens(col(textCol))).as("__token"))

    val cnt = tok.groupBy("__token").agg(count(lit(1)).as("__c"))
    val tot = cnt.agg(sum(col("__c")).as("__t"))
    val weights = cnt.crossJoin(broadcast(tot))
      .select(col("__token"),
        round(lit(a) / (lit(a) +
          col("__c").cast("double") / col("__t").cast("double")), 9)
          .as("__w"),
        hash64Udf(col("__token")).as("__h"))

    // one [-1,1] component per hash byte: v_d = (byte_d − 127.5)/127.5
    val vecs = weights.select(col("__token"), col("__w"),
      array((0 until dim).map { d =>
        (shiftrightunsigned(col("__h"), 8 * d).bitwiseAND(lit(255L))
          .cast("double") - lit(127.5)) / lit(127.5)
      }: _*).as("__v"))

    tok.join(vecs, "__token")
      .select(col(idCol), col("__w"),
        posexplode(col("__v")).as(Seq("dim", "__vd")))
      .groupBy(col(idCol), col("dim"))
      .agg(
        round(sum((col("__w") * col("__vd")).cast("decimal(28,12)"))
          .cast("double") / count(lit(1)), 6).as("component"),
        count(lit(1)).as("n_tokens"))
  }
}
