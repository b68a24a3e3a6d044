package graft.plans

import graft.functions.{CosineSimilarity, DotProduct}
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

  /** Register on an already-built session (what Verify/Bench use). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_similarity",
      exprs => CosineSimilarity(asFloats(exprs(0)), asFloats(exprs(1))), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dot_product",
      exprs => DotProduct(asFloats(exprs(0)), asFloats(exprs(1))), "scala_udf")
  }
}
