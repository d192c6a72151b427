package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Linear quality classifier over hashed bag-of-words features — the
  * fastText/CCNet-style filter (Joulin et al. 2016, arXiv:1607.01759;
  * Wenzek et al. 2019, arXiv:1911.00359, both public): train logistic
  * regression to separate a high-quality seed corpus from raw crawl
  * text, then score every raw document by its target probability. The
  * model-based sibling of the rule-based [[TextAnalysis.filterVerdicts]]
  * and the unigram-ratio [[Dsir]] — the three standard quality-filter
  * families, all present.
  *
  * Training is FULL-BATCH gradient descent as Spark aggregation: the
  * featurized corpus is built once and cached; each iteration is one
  * job — margins are a map-side `aggregate` HOF over the per-doc
  * feature array with the weight vector as a broadcast array literal,
  * and the gradient is a `dim`-bounded groupBy-sum collected to the
  * driver (the model, not the data, crosses to the driver:
  * `dim + 1` doubles per iteration). The corpus never re-shuffles
  * after featurization. At 100 TB this is the textbook distributed
  * LR loop: per-iteration cost is one pass over cached features, and
  * the driver state is KB-sized.
  *
  * Floating-point note: gradient sums over documents are
  * partition-order dependent (IEEE addition is not associative), so
  * trained weights are deterministic only up to last-ulp noise across
  * layouts — inherent to any distributed float reduction. Verdicts are
  * therefore spec-pinned by classification quality on planted
  * fixtures, not by byte-exact weights; callers needing byte-stable
  * scores persist the trained model like any other artifact.
  */
object QualityClassifier {

  /** Trained model: `weights(f)` for hashed feature f, `weights(dim)`
    * the bias (the featurizer emits a constant feature at index dim).
    */
  final case class Model(weights: Array[Double], dim: Int) {
    require(weights.length == dim + 1, s"expected ${dim + 1} weights, got ${weights.length}")
  }

  /** (doc_id, feats) with feats = array<struct<f,v>>: hashed unigram
    * term frequencies (f = xxhash64(word) mod dim, v = count/len) plus
    * the constant bias feature (f = dim, v = 1). Empty documents carry
    * no evidence and are dropped (documented — mirrors [[Dsir]]).
    */
  def featurize(docs: DataFrame, dim: Int): DataFrame = {
    require(dim > 0, s"feature dim must be positive: $dim")
    val toked = docs
      .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("toks"))
      .withColumn("dl", size(col("toks")).cast("double"))
      .filter(col("dl") > 0)
    toked
      .select(col("doc_id"), col("dl"), explode(col("toks")).as("w"))
      .select(col("doc_id"), col("dl"),
        pmod(xxhash64(col("w")), lit(dim.toLong)).cast("int").as("f"))
      .groupBy("doc_id", "dl", "f")
      .agg((count(lit(1)).cast("double") / col("dl")).as("v"))
      .groupBy("doc_id")
      .agg(collect_list(struct(col("f"), col("v"))).as("feats"))
      .withColumn("feats",
        concat(col("feats"), array(struct(lit(dim).as("f"), lit(1.0).as("v")))))
  }

  /** σ(w·x) for every row of a featurized frame, given the weight
    * vector as a plan-literal array — one map-side HOF fold per row.
    */
  private def margin(weights: Array[Double]): Column =
    aggregate(col("feats"), lit(0.0),
      (acc, s) => acc + s("v") * element_at(typedlit(weights.toSeq), s("f") + 1))

  private def sigmoid(m: Column): Column = lit(1.0) / (lit(1.0) + exp(-m))

  /** Mean log-loss of `weights` on a featurized+labeled frame (column
    * `y` ∈ {0,1}) — the convergence diagnostic.
    */
  def logLoss(labeled: DataFrame, weights: Array[Double]): Double = {
    val p = sigmoid(margin(weights))
    // clamp: a saturated prediction on a mislabeled row must not
    // produce ln(0) = -Inf and poison the mean
    val pc = least(greatest(p, lit(1e-12)), lit(1.0 - 1e-12))
    labeled
      .select(avg(-(col("y") * log(pc) + (lit(1.0) - col("y")) * log(lit(1.0) - pc))))
      .first().getDouble(0)
  }

  /** Train on `target` (label 1) vs `raw` (label 0): `iters` rounds of
    * full-batch GD, step `lr` on the mean gradient, L2 `l2` on
    * non-bias weights. Returns the model; `featurizeLabeled` exposes
    * the cached training frame for diagnostics.
    */
  def train(
      target: DataFrame,
      raw: DataFrame,
      dim: Int = 512,
      iters: Int = 20,
      lr: Double = 2.0,
      l2: Double = 1e-6): Model = {
    val data = featurizeLabeled(target, raw, dim)
    data.cache()
    try {
      val n = data.count().toDouble
      require(n > 0, "empty training corpus")
      val w = Array.fill(dim + 1)(0.0)
      for (_ <- 1 to iters) {
        // residual r = σ(w·x) − y; gradient_f = Σ_docs r·x_f (bias is
        // feature `dim`, so one groupBy covers the whole vector)
        val grads = data
          .withColumn("r", sigmoid(margin(w)) - col("y"))
          .select(col("r"), explode(col("feats")).as("s"))
          .groupBy(col("s.f").as("f"))
          .agg(sum(col("r") * col("s.v")).as("g"))
          .collect()
        grads.foreach { row =>
          val f = row.getInt(0)
          val reg = if (f == dim) 0.0 else l2 * w(f)
          w(f) -= lr * (row.getDouble(1) / n + reg)
        }
      }
      Model(w, dim)
    } finally data.unpersist()
  }

  /** The cached training frame [[train]] iterates over:
    * (doc_id, y, feats) for target (y=1) ∪ raw (y=0).
    */
  def featurizeLabeled(target: DataFrame, raw: DataFrame, dim: Int): DataFrame =
    featurize(target.select("doc_id", "text"), dim).withColumn("y", lit(1.0))
      .unionByName(
        featurize(raw.select("doc_id", "text"), dim).withColumn("y", lit(0.0)))

  /** Score `docs` with a trained model: (doc_id, p_target), p rounded
    * to 6 dp — one featurization plus a map-side fold, no iteration.
    */
  def score(docs: DataFrame, model: Model): DataFrame =
    featurize(docs, model.dim)
      .select(col("doc_id"), round(sigmoid(margin(model.weights)), 6).as("p_target"))

  /** Persist a trained model as (f, weight) parquet — the same
    * persisted-artifact contract as the IVF/banded indexes: training is
    * layout-deterministic only to last-ulp, so the persisted file IS
    * the model's identity; every scorer reading it produces identical
    * verdicts.
    */
  def saveModel(spark: org.apache.spark.sql.SparkSession, model: Model,
      path: String): Unit = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{DoubleType, IntegerType, StructField, StructType}
    // explicit schema (no product-encoder reflection): callable from any
    // environment, including the REPL where toDF's TypeTag derivation breaks
    val rows = model.weights.zipWithIndex.map { case (wt, f) => Row(f, wt) }
    spark.createDataFrame(
        java.util.Arrays.asList(rows: _*),
        StructType(Seq(StructField("f", IntegerType), StructField("weight", DoubleType))))
      .repartition(1)
      .write.mode("overwrite").parquet(path)
  }

  /** Load a model persisted by [[saveModel]]; fails loudly on a sparse
    * or oversized weight table rather than zero-filling silently.
    */
  def loadModel(spark: org.apache.spark.sql.SparkSession, path: String): Model = {
    val rows = spark.read.parquet(path).select("f", "weight").collect()
    val dim = rows.length - 1
    require(dim >= 1, s"model at $path has ${rows.length} weights; expected >= 2")
    val w = new Array[Double](rows.length)
    val seen = new Array[Boolean](rows.length)
    rows.foreach { r =>
      val f = r.getInt(0)
      require(f >= 0 && f < rows.length, s"model at $path has feature id $f out of [0, ${rows.length})")
      require(!seen(f), s"model at $path has duplicate feature id $f")
      seen(f) = true
      w(f) = r.getDouble(1)
    }
    Model(w, dim)
  }
}
