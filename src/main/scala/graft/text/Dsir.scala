package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data selection via importance resampling — the DSIR shape (Xie et
  * al. 2023, arXiv:2302.03169, public): score every raw document by
  * how much more likely its tokens are under a TARGET distribution
  * (the high-quality seed corpus) than under the RAW distribution, then
  * keep the top of the ranking (or resample proportionally). Here the
  * distributions are add-one-smoothed unigram models — the hashed
  * n-gram variant swaps the word key for a hashed feature id and is
  * otherwise identical algebra.
  *
  * Scale shape: two word-count aggregates (map-side partials), one
  * vocab-sized outer join to form the log-ratio table, one token→ratio
  * equi-join (shuffle on the word key; AQE may broadcast a small
  * model), one per-doc aggregate. The corpus text is scanned once per
  * side and never carried through a shuffle — only (doc_id, word)
  * pairs move. No driver-side state: the totals ride a broadcast
  * 1-row cross join.
  */
object Dsir {

  /** Per-document importance weight of every `raw` document:
    * (doc_id, n_tokens, dsir_weight) where dsir_weight is the mean over
    * the document's tokens of
    * `ln((ct+1)/(T+V)) − ln((cr+1)/(R+V))` — target vs raw add-one
    * unigram log-likelihood ratio (ct/cr = word count in target/raw,
    * T/R = total tokens, V = joint vocabulary size). Positive means
    * "looks more like the target than the raw corpus". Documents with
    * zero tokens carry no evidence and are omitted.
    */
  def importanceWeights(raw: DataFrame, target: DataFrame): DataFrame = {
    def words(d: DataFrame): DataFrame =
      d.select(col("doc_id"), explode(TextAnalysis.tokens(col("text"))).as("w"))
    val rawWords = words(raw)
    val cr = rawWords.groupBy("w").agg(count(lit(1)).as("cr"))
    val ct = words(target).groupBy("w").agg(count(lit(1)).as("ct"))
    val vocab = cr.join(ct, Seq("w"), "full_outer")
      .select(col("w"),
        coalesce(col("cr"), lit(0L)).as("cr"),
        coalesce(col("ct"), lit(0L)).as("ct"))
    // totals: one 3-number row (V, R, T), broadcast — metadata-sized
    val totals = vocab.agg(
      count(lit(1)).as("v"), sum("cr").as("r"), sum("ct").as("t"))
    val lr = vocab.crossJoin(broadcast(totals))
      .select(col("w"),
        (log((col("ct") + 1).cast("double") / (col("t") + col("v")).cast("double")) -
          log((col("cr") + 1).cast("double") / (col("r") + col("v")).cast("double")))
          .as("lr"))
    rawWords
      .join(lr, Seq("w"))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).cast("bigint").as("n_tokens"),
        round(avg(col("lr")), 6).as("dsir_weight"))
      .orderBy("doc_id")
  }
}
