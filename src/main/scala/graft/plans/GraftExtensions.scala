package graft.plans

import graft.functions.{CosineSimilarity, DotProduct}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

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
    new ExpressionInfo("graft", null, name, usage, "")

  private[plans] val cosineDesc: (FunctionIdentifier, ExpressionInfo, Builder) = (
    FunctionIdentifier("cosine_similarity"),
    info("cosine_similarity",
      "cosine_similarity(a, b) - cosine similarity of two ARRAY<FLOAT> vectors (double)"),
    (args: Seq[Expression]) => CosineSimilarity(args(0), args(1)))

  private[plans] val dotDesc: (FunctionIdentifier, ExpressionInfo, Builder) = (
    FunctionIdentifier("dot_product"),
    info("dot_product",
      "dot_product(a, b) - dot product of two ARRAY<FLOAT> vectors (double)"),
    (args: Seq[Expression]) => DotProduct(args(0), args(1)))

  /** Register on an already-built session (what Verify/Bench use). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_similarity", exprs => CosineSimilarity(exprs(0), exprs(1)), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dot_product", exprs => DotProduct(exprs(0), exprs(1)), "scala_udf")
  }
}
