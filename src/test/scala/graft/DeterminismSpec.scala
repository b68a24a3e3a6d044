package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** Partition-invariance: the rows-only queries (no DuckDB oracle) must
  * produce byte-identical results under different parallelism — the
  * distributed-correctness property the oracle gate can't check. Guards
  * against arrival-order dependence (the reference's concat bug,
  * hive_service.go:194) sneaking back in.
  */
class DeterminismSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val sf = "/root/testdata/sf0.001"

  private def canon(df: DataFrame): Seq[String] = {
    val rows = df.collect().map(_.toString)
    rows.sorted.toSeq
  }

  private val rowsOnly = SparkEntry.all.collect {
    case (name, q) if q.oracle.isEmpty => name
  }.toSeq.sorted

  // oracled queries whose plans are iterative or float-aggregating — the
  // classes where partition count could sneak into results (the oracle gate
  // runs at one fixed parallelism and wouldn't see it)
  private val shapeSensitive =
    Seq("q37_dedup_clusters", "q38_bm25_search", "q39_hybrid_rrf",
      "q2f_winnowing", "q34_lsh_bucket_knn", "q3d_token_packing",
      "q3f_decontamination",
      // round-3 additions: iterative (q3l CC), driver-side index metadata
      // (q3g centroids), pair-dedup shuffles (q3h), windowed caps (q3i),
      // float-aggregating LM sums (q3j), bit-keys + aggregation (q3k)
      "q3g_ivf_topk", "q3h_neardup_lsh_pairs", "q3i_domain_cap",
      "q3j_lm_surprisal", "q3k_zorder_bins", "q3l_embedding_dedup_clusters")

  for (name <- (rowsOnly ++ shapeSensitive).distinct.sorted) {
    test(s"$name is partition-invariant") {
      val fn = SparkEntry.queries(name)
      spark.conf.set("spark.sql.shuffle.partitions", "4")
      val r1 = canon(fn(spark, sf))
      spark.conf.set("spark.sql.shuffle.partitions", "7")
      val r2 = canon(fn(spark, sf))
      spark.conf.set("spark.sql.shuffle.partitions", "4")
      assert(r1 == r2, s"$name differs across partition counts")
      assert(r1.nonEmpty || name == "q2a_simhash_pairs", s"$name empty") // simhash pairs may be empty on random docs
    }
  }
}
