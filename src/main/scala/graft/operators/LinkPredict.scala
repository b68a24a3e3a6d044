package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Topological link prediction over an undirected graph — the classical
  * neighborhood scores (Liben-Nowell & Kleinberg 2003): common
  * neighbors, Jaccard, Adamic–Adar, preferential attachment, computed
  * for every open wedge (non-adjacent pair sharing ≥ 1 neighbor).
  *
  * Shape: candidate pairs come from the wedge join adj ⋈ adj on the
  * shared center — never from a node cross product — so the work is
  * Σ_z deg(z)², the triangle-counting bound; scores are one
  * partial-aggregated groupBy over wedges plus two bounded degree joins.
  * Adamic–Adar terms 1/ln(deg(z)) are well-defined (a wedge center has
  * degree ≥ 2) and ride DECIMAL(28,12) so per-pair addition order cannot
  * perturb bits. At web scale the same skew discipline as triangle
  * counting applies: cap or split supernode centers (deg² explosion)
  * before the wedge join.
  */
object LinkPredict {

  /** Scores for every non-adjacent pair with ≥ 1 common neighbor.
    * `edges` is a directed (src, dst) DataFrame; it is canonicalized,
    * deduplicated and self-loop-stripped first. Returns
    * (u, w, cn, jaccard, aa, pa) with u < w.
    */
  def wedgeScores(edges: DataFrame): DataFrame = {
    val und = GraphOps.canonicalUndirected(edges)
    val adj = und.select(col("u").as("a"), col("v").as("b"))
      .union(und.select(col("v").as("a"), col("u").as("b")))
    val deg = adj.groupBy(col("a")).agg(count(lit(1)).as("deg"))
    val wedges = adj.select(col("a").as("z"), col("b").as("wu"))
      .join(adj.select(col("a").as("z"), col("b").as("ww")), Seq("z"))
      .filter(col("wu") < col("ww"))
    val open = wedges.join(und,
        wedges("wu") === und("u") && wedges("ww") === und("v"), "left_anti")
    val scored = open
      .join(deg.select(col("a").as("z"), col("deg").as("deg_z")), Seq("z"))
      .withColumn("aa_term",
        (lit(1.0) / log(col("deg_z").cast("double"))).cast("decimal(28,12)"))
      .groupBy(col("wu").as("u"), col("ww").as("w"))
      .agg(count(lit(1)).as("cn"), sum(col("aa_term")).as("aa_sum"))
    scored
      .join(deg.select(col("a").as("u"), col("deg").as("deg_u")), Seq("u"))
      .join(deg.select(col("a").as("w"), col("deg").as("deg_w")), Seq("w"))
      .select(col("u"), col("w"), col("cn"),
        round(col("cn").cast("double") /
          (col("deg_u") + col("deg_w") - col("cn")).cast("double"), 6)
          .as("jaccard"),
        round(col("aa_sum").cast("double"), 6).as("aa"),
        (col("deg_u") * col("deg_w")).as("pa"))
  }
}
