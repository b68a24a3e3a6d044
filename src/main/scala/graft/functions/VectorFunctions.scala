package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, FloatType}

/** Column-level vector math over `ARRAY<FLOAT>` embedding columns.
  *
  * The fast path (`cosine`, `dot`) lowers to the native codegen'd Catalyst
  * expressions in [[CosineSimilarity]] / [[DotProduct]]; the `*Hof` variants
  * are pure-public-API equivalents built from higher-order functions, kept for
  * cross-checking the custom expressions in tests.
  */
object VectorFunctions {

  import ColumnBridge.col2expr, ColumnBridge.expr2col

  /** Cosine similarity (double), codegen'd. 0.0 on zero-norm inputs. */
  def cosine(a: Column, b: Column): Column =
    expr2col(CosineSimilarity(col2expr(asFloatArray(a)), col2expr(asFloatArray(b))))

  /** Dot product (double), codegen'd. */
  def dot(a: Column, b: Column): Column =
    expr2col(DotProduct(col2expr(asFloatArray(a)), col2expr(asFloatArray(b))))

  /** Squared L2 distance (double), codegen'd — the PQ encode/ADC primitive. */
  def l2Sq(a: Column, b: Column): Column =
    expr2col(L2SquaredDistance(col2expr(asFloatArray(a)), col2expr(asFloatArray(b))))

  /** Coerce any numeric array column to ARRAY<FLOAT>. */
  def asFloatArray(a: Column): Column = a.cast(ArrayType(FloatType))

  /** |A ∩ B| of two sorted distinct ARRAY<BIGINT> columns (codegen'd merge
    * scan, see [[SortedIntersectCount]]).
    */
  def sortedIntersectCount(a: Column, b: Column): Column =
    expr2col(SortedIntersectCount(col2expr(a), col2expr(b)))

  /** Pure-API cosine via zip_with + aggregate (reference semantics check). */
  def cosineHof(a: Column, b: Column): Column = {
    val d = dotHof(a, b)
    val na = dotHof(a, a)
    val nb = dotHof(b, b)
    when(na === 0.0 || nb === 0.0, 0.0).otherwise(d / sqrt(na * nb))
  }

  /** Pure-API dot product: double accumulation, left-to-right. */
  def dotHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, x) => acc + x)

  /** Per-vector symmetric int8 scale: max|x| / 127 (0.0 for the zero
    * vector). Codegen'd ([[Int8Scale]]); the store convention still
    * materializes it as its own `scale` column — the oracles replay it
    * from there and [[int8Dequant]] consumes it per row.
    */
  def int8Scale(vec: Column): Column =
    expr2col(Int8Scale(col2expr(asFloatArray(vec))))

  /** Quantize to ARRAY<TINYINT> with a materialized per-vector scale —
    * 4× smaller than FLOAT on the 100 TB-dominant embedding column (and 8×
    * vs DOUBLE), the standard memory/bandwidth lever for ANN at scale.
    * Codegen'd ([[Int8Quantize]]); exact Spark-ROUND (HALF_UP) semantics.
    */
  def int8Quantize(vec: Column, scale: Column): Column =
    expr2col(Int8Quantize(
      col2expr(asFloatArray(vec)), col2expr(scale.cast("double"))))

  /** Dequantize back to ARRAY<FLOAT> for scoring (q · scale) — the
    * per-probed-row search primitive, codegen'd ([[Int8Dequantize]]).
    */
  def int8Dequant(q: Column, scale: Column): Column =
    expr2col(Int8Dequantize(
      col2expr(q.cast(ArrayType(org.apache.spark.sql.types.ByteType))),
      col2expr(scale.cast("double"))))

  /** Pure-API HOF twins of the int8 codec (interpreted; kept as the
    * reference semantics the codegen expressions are spec-checked
    * against, like [[cosineHof]]).
    */
  def int8ScaleHof(vec: Column): Column =
    aggregate(vec, lit(0.0), (acc, x) => greatest(acc, abs(x.cast("double")))) / 127.0

  def int8QuantizeHof(vec: Column, scale: Column): Column =
    when(scale === 0.0, transform(vec, _ => lit(0).cast("byte")))
      .otherwise(transform(vec, x => round(x.cast("double") / scale).cast("byte")))

  def int8DequantHof(q: Column, scale: Column): Column =
    transform(q, x => (x.cast("double") * scale).cast("float"))

  /** L2 norm (double). */
  def l2Norm(a: Column): Column = sqrt(dot(a, b = a))

  /** L2-normalize into ARRAY<DOUBLE> with a PRE-MATERIALIZED norm column
    * (for pre-normalized dot-product search). Like [[int8Quantize]], the
    * norm must be its own column: embedding the [[l2Norm]] aggregate inside
    * the lambda would re-evaluate the full O(d) dot product per element
    * (the CLAUDE.md HOF gotcha — O(d²) per row on the ingest hot path).
    */
  def l2NormalizeWith(a: Column, norm: Column): Column =
    when(norm === 0.0, transform(a, x => x.cast("double")))
      .otherwise(transform(a, x => x.cast("double") / norm))

  /** Matryoshka truncation (Kusupati et al. 2022): the first `k` dimensions
    * of an MRL-trained embedding are themselves a usable embedding — the
    * third bandwidth lever next to int8 and pre-normalization (64→16 dims
    * is 4×, and it COMPOSES with int8 for 16×). Cosine over the truncated
    * prefix needs no renormalization (cosine is scale-invariant), so
    * truncation is a pure `slice` — store the prefix, or slice at scan
    * time for progressive search (coarse prefix pass → full-dim rerank,
    * the same two-stage shape as IVF-PQ).
    */
  def matryoshka(vec: Column, k: Int): Column = slice(vec, 1, k)
}

/** Bridge between the public Column API and Catalyst expressions (Spark 4
  * classic mode). Isolated here so every custom expression shares one
  * entry point; the `private[sql]` conversions live in
  * [[org.apache.spark.sql.graftshim.ColumnShim]].
  */
private[graft] object ColumnBridge {
  import org.apache.spark.sql.catalyst.expressions.Expression
  import org.apache.spark.sql.graftshim.ColumnShim

  def col2expr(c: Column): Expression = ColumnShim.expression(c)
  def expr2col(e: Expression): Column = ColumnShim.column(e)
}
