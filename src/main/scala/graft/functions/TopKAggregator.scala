package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

import scala.reflect.runtime.universe.TypeTag

/** One scored candidate flowing into a top-k aggregation. The id type is
  * generic so both numeric corpus keys and uuid-string chunk ids get the
  * map-side-heap k-NN path (tiebreak: natural ordering of the id type —
  * numeric asc for numbers, lexicographic asc for strings).
  */
final case class Scored[I](score: Double, id: I)

/** Bounded top-k buffer: unsorted until it overflows 4k, then pruned to the
  * best k — amortized O(1) insert, O(k) state.
  */
final case class TopKBuf[I](items: Array[Scored[I]], k: Int)

object TopKBuf {
  /** Best k by (score desc, id asc) — deterministic under ties. */
  def prune[I](items: Array[Scored[I]], k: Int)(implicit ord: Ordering[I]): Array[Scored[I]] =
    items.sortBy(s => (-s.score, s.id))(Ordering.Tuple2(Ordering.Double.TotalOrdering, ord)).take(k)
}

/** Typed top-k aggregator (SURVEY.md §4 future-work note): gives k-NN joins
  * map-side partial aggregation — each partition ships at most k candidates
  * per query key instead of its whole scored slice. At 100 TB this turns the
  * k-NN shuffle from O(corpus) rows into O(queries × k × partitions).
  *
  * Exposed as a DataFrame UDAF via `functions.udaf` (full partial-agg
  * support: update on the map side, merge on the reduce side).
  */
class TopKAggregator[I: TypeTag](k: Int)(implicit ord: Ordering[I])
    extends Aggregator[Scored[I], TopKBuf[I], Array[Scored[I]]] {
  override def zero: TopKBuf[I] = TopKBuf(Array.empty[Scored[I]], k)
  override def reduce(b: TopKBuf[I], a: Scored[I]): TopKBuf[I] = {
    val appended = b.items :+ a
    if (appended.length > 4 * k) TopKBuf(TopKBuf.prune(appended, k), k)
    else TopKBuf(appended, k)
  }
  override def merge(b1: TopKBuf[I], b2: TopKBuf[I]): TopKBuf[I] =
    TopKBuf(TopKBuf.prune(b1.items ++ b2.items, k), k)
  override def finish(b: TopKBuf[I]): Array[Scored[I]] = TopKBuf.prune(b.items, k)
  override def bufferEncoder: Encoder[TopKBuf[I]] = ExpressionEncoder[TopKBuf[I]]()
  override def outputEncoder: Encoder[Array[Scored[I]]] =
    ExpressionEncoder[Array[Scored[I]]]()
}

object TopKAggregator {
  /** `top_k(score, id)` for numeric ids: ARRAY<STRUCT<score,id>> of the k
    * best, ties broken by id asc (numeric order).
    */
  def topK(k: Int)(score: Column, id: Column): Column =
    udaf(new TopKAggregator[Long](k), ExpressionEncoder[Scored[Long]]())
      .apply(score, id.cast("long"))

  /** `top_k(score, id)` for string ids (uuid chunk keys), ties broken by id
    * asc (lexicographic).
    */
  def topKString(k: Int)(score: Column, id: Column): Column =
    udaf(new TopKAggregator[String](k), ExpressionEncoder[Scored[String]]())
      .apply(score, id.cast("string"))
}
