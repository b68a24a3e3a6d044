package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import IterCheckpoint.Pinnable

/** Trainable linear quality classifier over hashed bag-of-token features —
  * the CCNet/fastText-style filter a training-data pipeline distills from a
  * cheap supervision signal (metadata, a heuristic gate, a labeled slice)
  * and then applies to the whole corpus. The reference has no trained
  * models at all (rule evaluation is exact matching,
  * /root/reference/internal/worker/analyst.go:270-274 keyword containment,
  * rules stored in /root/reference/internal/rules/store.go); this is a
  * north-star
  * extension in the q3m/q3r curation family.
  *
  * Everything is deterministic and cross-engine replayable, which is what
  * makes TRAINING (not just scoring) oracle-able in DuckDB:
  *
  *  - Features: each token hashes to one of `dim` buckets with a
  *    poly-31 codepoint fold mod 1e9+7 (integer-exact in BIGINT range);
  *    x_j = count_j / tokenCount, plus a constant bias feature x_dim = 1.
  *  - Link: the algebraic "fast sigmoid" p = 0.5 + 0.5·m/(1+|m|) — same
  *    S-shape/gradient sign as the logistic link but pure +,·,/ arithmetic,
  *    so both engines walk identical doubles (no transcendental exp whose
  *    last-ulp behavior differs across libm implementations).
  *  - Updates: full-batch gradient descent; per-doc margins and per-feature
  *    gradients sum through exact DECIMAL(28,12) (order-free), probabilities
  *    and weights snap to the 9-decimal grid per round — the PageRank (q4b)
  *    iterative-parity recipe.
  *
  * Scale shape: the model is `dim+1` doubles (broadcast by construction);
  * one margin shuffle (groupBy doc) and one gradient shuffle (groupBy
  * feature) per iteration, both map-side combinable; the driver collect per
  * iteration is the `dim+1` gradient vector — model metadata, never data.
  */
object TextClassifier {

  /** A trained model: `weights(j)` for feature buckets 0..dim-1 and the bias
    * at index `dim`.
    */
  final case class Model(weights: Array[Double]) {
    def dim: Int = weights.length - 1
  }

  private val HashMod = 1000000007L

  /** One feature-bucket id per token: poly-31 codepoint fold mod 1e9+7,
    * then mod `dim`. One pass, no token strings kept.
    */
  private[graft] def featureBuckets(text: String, dim: Int): Array[Int] = {
    val t = if (text == null) "" else text
    val out = scala.collection.mutable.ArrayBuffer.empty[Int]
    var i = 0
    val n = t.length
    while (i < n) {
      while (i < n && t.charAt(i) == ' ') i += 1
      var h = 0L
      var any = false
      while (i < n && t.charAt(i) != ' ') {
        val cp = t.codePointAt(i)
        h = (h * 31L + cp) % HashMod
        any = true
        i += Character.charCount(cp)
      }
      if (any) out += (h % dim).toInt
    }
    out.toArray
  }

  private val featureBucketsUdf =
    udf((text: String, dim: Int) => featureBuckets(text, dim))

  /** Sparse normalized features: one row per (id, j) with
    * x = count_j / tokenCount, plus the constant bias row (j = dim, x = 1).
    * Empty/whitespace-only docs still get their bias row, so every doc has
    * a margin. The label column is carried through for training.
    */
  def hashedFeatures(
      docs: DataFrame, idCol: String, textCol: String, labelCol: String,
      dim: Int): DataFrame = {
    require(dim > 0, s"dim must be positive, got $dim")
    val toks = docs.select(col(idCol).as("id"), col(labelCol).cast("int").as("y"),
      explode(featureBucketsUdf(col(textCol), lit(dim))).as("j"))
    val counts = toks.groupBy("id", "y", "j").agg(count(lit(1)).as("c"))
    val ntok = toks.groupBy("id").agg(count(lit(1)).as("nt"))
    val x = counts.join(ntok, "id")
      .select(col("id"), col("y"), col("j"),
        (col("c").cast("double") / col("nt").cast("double")).as("x"))
    val bias = docs.select(col(idCol).as("id"), col(labelCol).cast("int").as("y"),
      lit(dim).as("j"), lit(1.0).as("x"))
    x.unionByName(bias)
  }

  /** Per-doc margins and fast-sigmoid probabilities under `weights`:
    * m = Σ w_j·x_j summed through DECIMAL(28,12),
    * p = round(0.5 + 0.5·m/(1+|m|), 9). Features absent from a doc
    * contribute nothing (sparse dot product); the bias row guarantees
    * every doc appears.
    */
  private def probabilities(
      features: DataFrame, weights: Array[Double]): DataFrame = {
    val spark = features.sparkSession
    import spark.implicits._
    val w = broadcast(weights.zipWithIndex
      .map { case (wv, j) => (j, wv) }.toSeq.toDF("j", "w"))
    features.join(w, "j")
      .groupBy("id", "y")
      .agg(sum((col("w") * col("x")).cast("decimal(28,12)")).as("__m"))
      .select(col("id"), col("y"), col("__m").cast("double").as("m"))
      .withColumn("p",
        round(lit(0.5) + lit(0.5) * col("m") / (lit(1.0) + abs(col("m"))), 9))
  }

  /** Full-batch gradient descent from zero weights: per iteration
    * g_j = Σ_docs (p − y)·x_j (DECIMAL(28,12) sum → double), then
    * w_j ← round(w_j − lr·(g_j/n), 9). The gradient collect is dim+1
    * doubles; `n` is the total doc count (computed once).
    */
  def train(
      features: DataFrame, dim: Int, iters: Int, lr: Double): Model = {
    require(iters >= 0, s"iters must be non-negative, got $iters")
    val feats = features.iterCheckpoint()
    val n = feats.filter(col("j") === dim).count()
    require(n > 0, "train needs at least one document")
    var w = Array.fill(dim + 1)(0.0)
    for (_ <- 1 to iters) {
      val grads = probabilities(feats, w)
        .join(feats, Seq("id", "y"))
        .groupBy("j")
        .agg(sum(((col("p") - col("y").cast("double")) * col("x"))
          .cast("decimal(28,12)")).as("__g"))
        .select(col("j"), col("__g").cast("double").as("g"))
        .collect()
        .map(r => r.getInt(0) -> r.getDouble(1)).toMap
      w = w.zipWithIndex.map { case (wj, j) =>
        grads.get(j) match {
          case Some(g) => IvfIndex.roundHalfUp(wj - lr * (g / n), 9)
          case None    => wj
        }
      }
    }
    Model(w)
  }

  /** Persist a model as a (j, w) parquet table — dim+1 rows of metadata, so
    * a filter trained once ships to every downstream curation job (the
    * train-once / score-everywhere split that matters when scoring is a
    * 100 TB pass and training was a labeled slice).
    */
  def saveModel(model: Model, path: String, spark: SparkSession): Unit = {
    import spark.implicits._
    model.weights.zipWithIndex.map { case (w, j) => (j, w) }
      .toSeq.toDF("j", "w")
      .repartition(1)
      .write.mode("overwrite").parquet(path)
  }

  /** Load a [[saveModel]] table. Weights must be a dense 0..dim index
    * range — a gap means the table is not a classifier model.
    */
  def loadModel(path: String, spark: SparkSession): Model = {
    val rows = spark.read.parquet(path)
      .select(col("j").cast("int"), col("w").cast("double"))
      .collect()
      .map(r => r.getInt(0) -> r.getDouble(1))
      .sortBy(_._1)
    require(rows.nonEmpty && rows.map(_._1).toSeq == (0 until rows.length),
      s"model table at $path is not a dense 0..${rows.length - 1} weight range")
    Model(rows.map(_._2))
  }

  /** Corpus scores under a model: (id, y, score) with
    * score = round(p, 6) — the filter column a curation pipeline thresholds
    * on. Inference is the margin pass only (one shuffle, model broadcast).
    */
  def score(features: DataFrame, model: Model): DataFrame =
    probabilities(features, model.weights)
      .select(col("id"), col("y"), round(col("p"), 6).as("score"))
}
