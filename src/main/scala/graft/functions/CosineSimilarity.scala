package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst expression: cosine similarity of two `ARRAY<FLOAT>` columns.
  *
  * The reference delegates cosine distance to its vector store
  * (/root/reference/internal/vectordb/vectordb.go:94-104, collection created with
  * `Distance_Cosine`); here similarity is a first-class expression so Catalyst
  * can pipeline it inside whole-stage codegen — no UDF serialization, no boxing.
  * Accumulation is in `double` over `float` inputs, left-to-right, which is the
  * deterministic contract the DuckDB oracle matches.
  *
  * Division is guarded: a zero-norm vector yields 0.0 (the reference's store
  * never returns NaN scores).
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {
  // Inputs are coerced to ARRAY<FLOAT> by VectorFunctions.asFloatArray;
  // ExpectsInputTypes is private[sql] so coercion happens at the Column layer.
  override def dataType: DataType = DoubleType

  override def prettyName: String = "cosine_similarity"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = CosineSimilarity.checkedLength(x.numElements(), y.numElements())
    var dot = 0.0
    var nx = 0.0
    var ny = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getFloat(i).toDouble
      val yi = y.getFloat(i).toDouble
      dot += xi * yi
      nx += xi * xi
      ny += yi * yi
      i += 1
    }
    if (nx == 0.0 || ny == 0.0) 0.0 else dot / math.sqrt(nx * ny)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
         |final int $n = graft.functions.CosineSimilarity.checkedLength(
         |  $a.numElements(), $b.numElements());
         |double $dot = 0.0, $nx = 0.0, $ny = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  final double $xi = (double) $a.getFloat($i);
         |  final double $yi = (double) $b.getFloat($i);
         |  $dot += $xi * $yi;
         |  $nx += $xi * $xi;
         |  $ny += $yi * $yi;
         |}
         |${ev.value} = ($nx == 0.0 || $ny == 0.0) ? 0.0 : $dot / java.lang.Math.sqrt($nx * $ny);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object CosineSimilarity {
  /** Dimension mismatch is a pipeline bug (e.g. querying a 64-dim corpus
    * with a 384-dim embedding); fail loudly instead of silently scoring a
    * truncated prefix. Called from both interpreted and generated code.
    */
  def checkedLength(nx: Int, ny: Int): Int = {
    if (nx != ny)
      throw new IllegalArgumentException(
        s"vector dimension mismatch: $nx vs $ny")
    nx
  }
}

/** Squared Euclidean distance of two `ARRAY<FLOAT>` columns (double
  * accumulation, left-to-right), codegen'd. The product-quantization
  * primitive: PQ encode is argmin of this over a codebook, and the DuckDB
  * oracle replays the identical (x−y)·(x−y) fold over `DOUBLE[]` slices.
  */
case class L2SquaredDistance(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def prettyName: String = "l2_squared_distance"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = CosineSimilarity.checkedLength(x.numElements(), y.numElements())
    var d = 0.0
    var i = 0
    while (i < n) {
      val t = x.getFloat(i).toDouble - y.getFloat(i).toDouble
      d += t * t
      i += 1
    }
    d
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val d = ctx.freshName("d")
      val t = ctx.freshName("t")
      s"""
         |final int $n = graft.functions.CosineSimilarity.checkedLength(
         |  $a.numElements(), $b.numElements());
         |double $d = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  final double $t = (double) $a.getFloat($i) - (double) $b.getFloat($i);
         |  $d += $t * $t;
         |}
         |${ev.value} = $d;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Dot product of two `ARRAY<FLOAT>` columns (double accumulation), codegen'd. */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def prettyName: String = "dot_product"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = CosineSimilarity.checkedLength(x.numElements(), y.numElements())
    var dot = 0.0
    var i = 0
    while (i < n) {
      dot += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      s"""
         |final int $n = graft.functions.CosineSimilarity.checkedLength(
         |  $a.numElements(), $b.numElements());
         |double $dot = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $dot += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |${ev.value} = $dot;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
