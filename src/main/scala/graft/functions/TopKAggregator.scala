package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.{struct, udaf}

/** One scored candidate flowing into a top-k aggregation. */
final case class Scored(score: Double, id: Long)

/** Bounded top-k buffer: unsorted until it overflows 4k, then pruned to the
  * best k — amortized O(1) insert, O(k) state.
  */
final case class TopKBuf(items: Array[Scored], k: Int) {
  def insert(s: Scored): TopKBuf = {
    val appended = items :+ s
    if (appended.length > 4 * k) TopKBuf(TopKBuf.prune(appended, k), k)
    else TopKBuf(appended, k)
  }
  def merge(other: TopKBuf): TopKBuf =
    TopKBuf(TopKBuf.prune(items ++ other.items, k), k)
  def result: Array[Scored] = TopKBuf.prune(items, k)
}

object TopKBuf {
  /** Best k by (score desc, id asc) — deterministic under ties. */
  def prune(items: Array[Scored], k: Int): Array[Scored] =
    items.sortBy(s => (-s.score, s.id)).take(k)
}

/** Typed top-k aggregator (SURVEY.md §4 future-work note): gives k-NN joins
  * map-side partial aggregation — each partition ships at most k candidates
  * per query key instead of its whole scored slice. At 100 TB this turns the
  * k-NN shuffle from O(corpus) rows into O(queries × k × partitions).
  *
  * Exposed as a DataFrame UDAF via `functions.udaf` (full partial-agg
  * support: update on the map side, merge on the reduce side).
  */
class TopKAggregator(k: Int) extends Aggregator[Scored, TopKBuf, Array[Scored]] {
  override def zero: TopKBuf = TopKBuf(Array.empty, k)
  override def reduce(b: TopKBuf, a: Scored): TopKBuf = b.insert(a)
  override def merge(b1: TopKBuf, b2: TopKBuf): TopKBuf = b1.merge(b2)
  override def finish(b: TopKBuf): Array[Scored] = b.result
  override def bufferEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
  override def outputEncoder: Encoder[Array[Scored]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Scored]]()
}

object TopKAggregator {
  /** `top_k(score, id)` column: ARRAY<STRUCT<score,id>> of the k best. */
  def topK(k: Int)(score: Column, id: Column): Column =
    udaf(new TopKAggregator(k), Encoders.product[Scored])
      .apply(score, id.cast("long"))
}
