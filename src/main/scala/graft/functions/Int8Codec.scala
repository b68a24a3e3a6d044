package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, ByteType, DataType, DoubleType, FloatType}

/** Codegen int8 vector codec — the quantized-store build and probe
  * primitives as native Catalyst expressions.
  *
  * The former forms were per-element `transform` / `aggregate` lambdas,
  * which Spark evaluates INTERPRETED (higher-order functions sit outside
  * whole-stage codegen) — the same cost class the hyperplane bucketing
  * paid before [[HyperplaneBucket]]. Dequantization runs per probed row
  * per query (the 100 TB-dominant ANN scan), quantization and the scale
  * fold run once per corpus row at store build.
  *
  * Arithmetic contracts are exact twins of the HOF chains (kept as
  * `*Hof` forms in [[VectorFunctions]]; Int8CodecSpec gates
  * element-for-element equality, including half-way rounding and the
  * zero-scale path):
  *   - scale: max of |(double) element| over the array (nulls skipped,
  *     like Spark `greatest`) divided by 127.0;
  *   - quantize: `round(x / scale)` in Spark ROUND semantics
  *     (BigDecimal HALF_UP — away from zero on .5, NOT Math.round) cast
  *     to byte; scale 0 → all-zero codes of the same length;
  *   - dequantize: `(float)((double) code * scale)`.
  *
  * Null ELEMENTS inside a vector fail loudly here (the lambdas silently
  * propagated them) — no producer path emits them, and a quantized store
  * carrying null codes is a pipeline bug, not data.
  */
object Int8Codec {
  /** Spark `round(x, 0)` twin: BigDecimal HALF_UP, called from both
    * interpreted and generated code.
    */
  def roundHalfUp0(x: Double): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue()

  def checkedNotNull(isNull: Boolean, op: String): Unit =
    if (isNull) throw new IllegalArgumentException(
      s"$op: null element in vector — quantized pipelines require dense arrays")
}

/** Per-vector symmetric int8 scale: max|x| / 127 (0.0 for the zero or
  * empty vector), one codegen pass.
  */
case class Int8Scale(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DoubleType

  override def prettyName: String = "int8_scale"

  override protected def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    var m = 0.0
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i)) {
        val v = math.abs(x.getFloat(i).toDouble)
        if (v > m) m = v
      }
      i += 1
    }
    m / 127.0
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val m = ctx.freshName("m")
      val i = ctx.freshName("i")
      val v = ctx.freshName("v")
      s"""
         |final int $n = $a.numElements();
         |double $m = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i)) {
         |    final double $v = java.lang.Math.abs((double) $a.getFloat($i));
         |    if ($v > $m) $m = $v;
         |  }
         |}
         |${ev.value} = $m / 127.0;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Quantize `ARRAY<FLOAT>` to `ARRAY<TINYINT>` with a per-row scale:
  * code = round(x / scale) in Spark ROUND (HALF_UP) semantics; scale 0
  * yields all-zero codes. One codegen pass, `UnsafeArrayData` output.
  */
case class Int8Quantize(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(ByteType, containsNull = false)

  override def prettyName: String = "int8_quantize"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val scale = b.asInstanceOf[Double]
    val n = x.numElements()
    val out = new Array[Byte](n)
    if (scale != 0.0) {
      var i = 0
      while (i < n) {
        Int8Codec.checkedNotNull(x.isNullAt(i), prettyName)
        out(i) = Int8Codec.roundHalfUp0(x.getFloat(i).toDouble / scale).toByte
        i += 1
      }
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, s) => {
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      s"""
         |final int $n = $a.numElements();
         |final byte[] $out = new byte[$n];
         |if ($s != 0.0) {
         |  for (int $i = 0; $i < $n; $i++) {
         |    graft.functions.Int8Codec.checkedNotNull($a.isNullAt($i), "int8_quantize");
         |    $out[$i] = (byte) graft.functions.Int8Codec.roundHalfUp0(
         |      (double) $a.getFloat($i) / $s);
         |  }
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |  .fromPrimitiveArray($out);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Dequantize `ARRAY<TINYINT>` back to `ARRAY<FLOAT>`: (float)(code ×
  * scale) per element — the per-probed-row search primitive. One codegen
  * pass, `UnsafeArrayData` output.
  */
case class Int8Dequantize(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(FloatType, containsNull = false)

  override def prettyName: String = "int8_dequantize"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val scale = b.asInstanceOf[Double]
    val n = x.numElements()
    val out = new Array[Float](n)
    var i = 0
    while (i < n) {
      Int8Codec.checkedNotNull(x.isNullAt(i), prettyName)
      out(i) = (x.getByte(i).toDouble * scale).toFloat
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, s) => {
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      s"""
         |final int $n = $a.numElements();
         |final float[] $out = new float[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  graft.functions.Int8Codec.checkedNotNull($a.isNullAt($i), "int8_dequantize");
         |  $out[$i] = (float) ((double) $a.getByte($i) * $s);
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |  .fromPrimitiveArray($out);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
