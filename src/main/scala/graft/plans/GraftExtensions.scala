package graft.plans

import graft.functions.{CosineSimilarity, DotProduct, L2SquaredDistance, SortedIntersectCount}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo}
import org.apache.spark.sql.types.{ArrayType, FloatType}

/** Engine extensions: registers the custom codegen'd expressions as SQL
  * functions so `spark.sql("SELECT cosine_similarity(a, b) ...")` works.
  *
  * Install via
  * `SparkSession.builder().withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.plans.GraftExtensions`; for an existing
  * session, [[GraftExtensions.register]].
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.cosineDesc)
    ext.injectFunction(GraftExtensions.dotDesc)
    ext.injectFunction(GraftExtensions.l2Desc)
    ext.injectFunction(GraftExtensions.intersectDesc)
  }
}

object GraftExtensions {
  private type Builder = Seq[Expression] => Expression

  private def info(name: String, usage: String) =
    // the non-deprecated wide constructor (usage/examples/note/group/since)
    new ExpressionInfo("graft", null, name, usage, "", "", "", "", "", "", "built-in")

  // the expressions read float slots from ArrayData; SQL callers pass
  // double-literal arrays, so coerce explicitly (the Column API coerces via
  // VectorFunctions.asFloatArray — without this, ARRAY<DOUBLE> inputs are
  // read on 4-byte strides: silent garbage)
  private def asFloats(e: Expression): Expression =
    Cast(e, ArrayType(FloatType))

  private[plans] val cosineDesc: (FunctionIdentifier, ExpressionInfo, Builder) = (
    FunctionIdentifier("cosine_similarity"),
    info("cosine_similarity",
      "cosine_similarity(a, b) - cosine similarity of two numeric-array vectors (double)"),
    (args: Seq[Expression]) => CosineSimilarity(asFloats(args(0)), asFloats(args(1))))

  private[plans] val dotDesc: (FunctionIdentifier, ExpressionInfo, Builder) = (
    FunctionIdentifier("dot_product"),
    info("dot_product",
      "dot_product(a, b) - dot product of two numeric-array vectors (double)"),
    (args: Seq[Expression]) => DotProduct(asFloats(args(0)), asFloats(args(1))))

  private[plans] val l2Desc: (FunctionIdentifier, ExpressionInfo, Builder) = (
    FunctionIdentifier("l2_squared"),
    info("l2_squared",
      "l2_squared(a, b) - squared L2 distance of two numeric-array vectors (double)"),
    (args: Seq[Expression]) => L2SquaredDistance(asFloats(args(0)), asFloats(args(1))))

  private[plans] val intersectDesc: (FunctionIdentifier, ExpressionInfo, Builder) = (
    FunctionIdentifier("sorted_intersect_count"),
    info("sorted_intersect_count",
      "sorted_intersect_count(a, b) - |A ∩ B| of two SORTED DISTINCT BIGINT arrays"),
    (args: Seq[Expression]) => SortedIntersectCount(args(0), args(1)))

  /** Register on an already-built session (what Verify/Bench use). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_similarity",
      exprs => CosineSimilarity(asFloats(exprs(0)), asFloats(exprs(1))), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dot_product",
      exprs => DotProduct(asFloats(exprs(0)), asFloats(exprs(1))), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "l2_squared",
      exprs => L2SquaredDistance(asFloats(exprs(0)), asFloats(exprs(1))), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "sorted_intersect_count",
      exprs => SortedIntersectCount(exprs(0), exprs(1)), "scala_udf")
  }
}
