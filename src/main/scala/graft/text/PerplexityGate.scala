package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Frozen bigram-LM perplexity gate — the streaming-deployable form of
  * the CCNet head/middle/tail filter (Wenzek et al. 2020, CCNet —
  * public). The batch operator ([[TextAnalysis.perplexityBuckets]],
  * declared query X81) trains the LM on the corpus it scores and
  * buckets by the GLOBAL fluency ranking; a streaming ingest can do
  * neither incrementally, so — exactly like the learned quality gate
  * ([[QualityClassifier]]) — the model becomes a frozen artifact:
  *
  *   1. [[train]] on a reference corpus in batch: the add-one-smoothed
  *      bigram/context count tables, the vocabulary size, and the
  *      bucket BOUNDARIES read off the reference ranking (the last
  *      (score, doc_id) of each equal-mass bucket).
  *   2. [[save]]/[[load]] the artifact (parquet — count tables scale
  *      with the Heaps-law vocabulary, not the corpus, but can still
  *      outgrow a broadcast, so scoring joins them instead of
  *      collecting them).
  *   3. [[assign]] any batch — or any micro-batch, via
  *      [[graft.streaming.StreamOps.perplexityGateStream]] — against
  *      the frozen tables: per-document score + boundary comparison,
  *      stateless, no global rank needed at serve time.
  *
  * Replaying the training corpus itself through [[assign]] reproduces
  * the batch X81 buckets EXACTLY (StreamingSpec pins it): in-model
  * bigrams score through the identical `log10((c12+1)/(c1+V))`
  * formula, and the boundary comparison is lexicographic on the same
  * (−mean_logp, doc_id) key the batch ranking sorts by, so even tied
  * scores land in their batch bucket. Unseen serve-time bigrams
  * back off through the same smoothing with zero counts (an unseen
  * context scores log10(1/V)).
  */
object PerplexityGate {

  /** Last ranked row of each training bucket: documents at or before
    * (negLogp, docId) in the lexicographic (−mean_logp, doc_id) order
    * belong to `bucket` or earlier.
    */
  final case class Boundary(bucket: Long, negLogp: Double, docId: Long)

  /** The frozen artifact. `bigrams` = (w1, w2, c12); `contexts` =
    * (w1, c1) — the per-context totals folded from the bigram table;
    * `vocabSize` = distinct training unigrams (the add-one denominator
    * mass); `boundaries` = one [[Boundary]] per non-empty training
    * bucket, ascending.
    */
  final case class Model(
      bigrams: DataFrame,
      contexts: DataFrame,
      vocabSize: Long,
      nBuckets: Int,
      boundaries: Seq[Boundary])

  /** Per-document bigram stream — IDENTICAL shape to the batch scorer
    * ([[TextAnalysis.bigramLogProb]]): adjacent whitespace-token pairs
    * with multiplicity, docs under two tokens absent.
    */
  private def bigramsOf(documents: DataFrame): DataFrame = {
    val toks = TextAnalysis.tokens(col("text"))
    documents.select(col("doc_id"),
      explode(zip_with(
        slice(toks, lit(1), greatest(size(toks) - 1, lit(0))),
        slice(toks, lit(2), greatest(size(toks) - 1, lit(0))),
        (a, b) => struct(a.as("w1"), b.as("w2")))).as("bg"))
      .select(col("doc_id"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
  }

  /** Score `documents` against the frozen tables: (doc_id, n_bigrams,
    * mean_logp), the exact [[TextAnalysis.bigramLogProb]] arithmetic
    * with unseen bigrams/contexts backed off to zero counts. Two left
    * joins against model-sized tables — the only corpus-sized work is
    * the map-side bigram explode.
    */
  def score(documents: DataFrame, model: Model): DataFrame =
    bigramsOf(documents)
      .join(model.bigrams, Seq("w1", "w2"), "left")
      .join(model.contexts, Seq("w1"), "left")
      .groupBy("doc_id")
      .agg(
        count(lit(1)).cast("bigint").as("n_bigrams"),
        round(avg(log(10.0,
          (coalesce(col("c12"), lit(0L)) + lit(1)).cast("double") /
            (coalesce(col("c1"), lit(0L)) + lit(model.vocabSize)).cast("double"))),
          6).as("mean_logp"))

  /** Score and bucket `documents` with the frozen boundaries:
    * (doc_id, mean_logp, bucket). bucket = the first training bucket
    * whose boundary is at or past this document's (−mean_logp, doc_id)
    * key; documents ranking past every boundary (worse than the whole
    * reference tail) take the last bucket. Stateless and rank-free —
    * the when-chain over ≤nBuckets frozen boundaries is codegen'd
    * straight into the scoring plan.
    */
  def assign(documents: DataFrame, model: Model): DataFrame = {
    require(model.boundaries.nonEmpty, "model has no boundaries")
    val sorted = model.boundaries.sortBy(_.bucket)
    val neg = -col("mean_logp")
    val bucket = sorted.init.foldRight(lit(sorted.last.bucket): org.apache.spark.sql.Column) {
      case (b, acc) =>
        when(neg < b.negLogp ||
          (neg === b.negLogp && col("doc_id") <= b.docId), b.bucket)
          .otherwise(acc)
    }
    score(documents, model)
      .select(col("doc_id"), col("mean_logp"), bucket.cast("long").as("bucket"))
  }

  /** Train the frozen gate on a reference corpus: count tables, vocab
    * size, and the equal-mass bucket boundaries of the reference
    * ranking — the same distributed global row number (no
    * single-partition window) and the same bucket arithmetic as the
    * batch X81 operator. The count tables are lazily checkpointed:
    * the boundary machinery drives them through several jobs, and the
    * serve-time artifact would re-run the corpus aggregation per
    * micro-batch otherwise.
    */
  def train(documents: DataFrame, nBuckets: Int = 3): Model = {
    require(nBuckets >= 1, s"nBuckets=$nBuckets must be positive")
    val bgs = bigramsOf(documents)
    val bigrams = bgs.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
      .localCheckpoint(false)
    val contexts = bigrams.groupBy("w1").agg(sum("c12").as("c1"))
      .localCheckpoint(false)
    val vocabSize = documents
      .select(explode(TextAnalysis.tokens(col("text"))).as("w"))
      .agg(count_distinct(col("w"))).head().getLong(0)
    val m0 = Model(bigrams, contexts, vocabSize, nBuckets, Seq.empty)
    // the reference ranking: identical key and bucket arithmetic to
    // perplexityBuckets (scores rounded to 6, (−mean_logp, doc_id)
    // order, floor((rank−1)·nBuckets/n))
    val scores = score(documents, m0).select("doc_id", "mean_logp")
      .localCheckpoint(false)
    val ranked = graft.ops.ScalableWindows.withGlobalRowNumber(
      scores.withColumn("__neg", -col("mean_logp")),
      Seq("__neg", "doc_id"), "rank")
    val n = scores.count()
    val boundaries = ranked
      .withColumn("bucket",
        floor((col("rank") - 1).cast("double") * nBuckets / n).cast("long"))
      .groupBy("bucket")
      .agg(max(struct(col("__neg"), col("doc_id"))).as("b"))
      .select(col("bucket"), col("b.__neg").as("neg"), col("b.doc_id").as("id"))
      .collect()
      .map(r => Boundary(r.getLong(0), r.getDouble(1), r.getLong(2)))
      .sortBy(_.bucket).toSeq
    m0.copy(boundaries = boundaries)
  }

  /** Persist the artifact: count tables as parquet, scalar metadata and
    * boundaries as a one-file meta table.
    */
  def save(model: Model, path: String): Unit = {
    model.bigrams.write.mode("overwrite").parquet(s"$path/bigrams")
    model.contexts.write.mode("overwrite").parquet(s"$path/contexts")
    val spark = model.bigrams.sparkSession
    import spark.implicits._
    model.boundaries
      .map(b => (b.bucket, b.negLogp, b.docId, model.vocabSize, model.nBuckets))
      .toDF("bucket", "neg_logp", "doc_id", "vocab_size", "n_buckets")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/meta")
  }

  /** Load a persisted artifact; the count tables stay as lazy parquet
    * scans (they join, they don't collect).
    */
  def load(spark: SparkSession, path: String): Model = {
    val meta = spark.read.parquet(s"$path/meta").collect()
    require(meta.nonEmpty, s"empty perplexity-gate meta at $path/meta")
    val boundaries = meta.map(r => Boundary(
      r.getAs[Long]("bucket"), r.getAs[Double]("neg_logp"), r.getAs[Long]("doc_id")))
      .sortBy(_.bucket).toSeq
    Model(
      spark.read.parquet(s"$path/bigrams"),
      spark.read.parquet(s"$path/contexts"),
      meta.head.getAs[Long]("vocab_size"),
      meta.head.getAs[Int]("n_buckets"),
      boundaries)
  }
}
