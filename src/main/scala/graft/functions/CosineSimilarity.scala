package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

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

/** Sign-bit LSH bucket id of an `ARRAY<FLOAT>` vector against `nBits`
  * deterministic splitmix-generated hyperplanes (family selected by
  * `seedBase`) — ALL bits in one codegen pass over the array.
  *
  * Replaces the per-bit `zip_with` + `aggregate` HOF chain, which Spark
  * evaluates interpreted per element (no whole-stage codegen for lambda
  * functions): at the graph-rebuild bench configuration (32k vectors ×
  * 4 tables × 12 bits) the HOF chain alone cost ~15 s of a 36 s rebuild,
  * recomputed on BOTH sides of the bucket self-join. Arithmetic is
  * bit-for-bit the contract the DuckDB oracles inline: each element is a
  * FLOAT widened to double, multiplied by the double plane component,
  * accumulated left-to-right; bit b sets on `dot >= 0`.
  *
  * A vector whose length differs from `dim` buckets to 0 — the HOF
  * chain's null-padded zip_with folded every such row to bucket 0 too.
  * A NULL vector yields NULL (standard null propagation; ingest and the
  * fixtures guarantee non-null embeddings on every LSH path).
  */
case class HyperplaneBucket(child: Expression, nBits: Int, dim: Int, seedBase: Int)
    extends UnaryExpression {
  require(nBits > 0 && nBits <= 62 && dim > 0,
    s"bad LSH config nBits=$nBits dim=$dim")

  override def dataType: DataType = LongType

  override def prettyName: String = "hyperplane_bucket"

  @transient private lazy val planes: Array[Double] =
    HyperplaneBucket.flatPlanes(seedBase, nBits, dim)

  override protected def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    if (x.numElements() != dim) 0L
    else {
      val p = planes
      var bucket = 0L
      var b = 0
      while (b < nBits) {
        var dot = 0.0
        val off = b * dim
        var i = 0
        while (i < dim) {
          dot += x.getFloat(i).toDouble * p(off + i)
          i += 1
        }
        if (dot >= 0) bucket |= 1L << b
        b += 1
      }
      bucket
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val p = ctx.addReferenceObj("hyperplanes", planes, "double[]")
    nullSafeCodeGen(ctx, ev, a => {
      val bkt = ctx.freshName("bkt")
      val b = ctx.freshName("b")
      val dot = ctx.freshName("dot")
      val off = ctx.freshName("off")
      val i = ctx.freshName("i")
      s"""
         |if ($a.numElements() != $dim) {
         |  ${ev.value} = 0L;
         |} else {
         |  long $bkt = 0L;
         |  for (int $b = 0; $b < $nBits; $b++) {
         |    double $dot = 0.0;
         |    final int $off = $b * $dim;
         |    for (int $i = 0; $i < $dim; $i++) {
         |      $dot += (double) $a.getFloat($i) * $p[$off + $i];
         |    }
         |    if ($dot >= 0) $bkt |= 1L << $b;
         |  }
         |  ${ev.value} = $bkt;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HyperplaneBucket {
  /** Hyperplane component stream for one bit: a splitmix-style integer mix
    * of (seed, element index) mapped to [-1, 1) — deterministic, no side
    * data to ship, and exactly what the oracle builders inline as literal
    * arrays (`graft.operators.VectorSearch.hyperplane` delegates here).
    */
  def hyperplane(seed: Int, dim: Int): Array[Double] = {
    val out = new Array[Double](dim)
    var i = 0
    while (i < dim) {
      var z = (seed.toLong << 32 | i.toLong) + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z = z ^ (z >>> 31)
      // map to [-1, 1): enough for a sign test
      out(i) = (z.toDouble / Long.MaxValue.toDouble)
      i += 1
    }
    out
  }

  /** All `nBits` planes of one table, flattened row-major (bit b at
    * offset b·dim) — the single reference object the generated code reads.
    */
  private[graft] def flatPlanes(seedBase: Int, nBits: Int, dim: Int): Array[Double] = {
    val out = new Array[Double](nBits * dim)
    var b = 0
    while (b < nBits) {
      System.arraycopy(hyperplane(seedBase + b, dim), 0, out, b * dim, dim)
      b += 1
    }
    out
  }
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
