package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid lexical+semantic retrieval via Reciprocal Rank Fusion
  * (Cormack, Clarke & Buettcher 2009, "Reciprocal rank fusion
  * outperforms Condorcet and individual rank learning methods"): each
  * channel contributes 1/(kRrf + rank) for the candidates it ranked,
  * candidates missing from a channel contribute nothing from it, and
  * the fused top-k orders by the summed score. RRF is the standard
  * production fusion for BM25 + dense-vector retrieval because it
  * needs NO score calibration between channels — only ranks — which is
  * exactly why it is the right oracle-checkable form (ranks are
  * integers; the fused score is a fixed-order two-term float sum).
  *
  * In a training-data pipeline this is the retrieval engine behind
  * targeted decontamination and seed-set expansion when neither
  * channel alone suffices: BM25 misses paraphrases, cosine misses
  * rare-token exact matches; the fusion catches both.
  *
  * Scale shape: the lexical channel is [[Bm25.knnJoin]] (inverted
  * postings join, queries broadcast); the semantic channel is
  * [[graft.vector.Ann.knnJoin]] (queries broadcast over ONE corpus
  * scan) — the production swaps are [[rrfTopKAnn]] (LSH-bucketed
  * semantic channel) and [[rrfTopKIvf]] (persisted IVF index probe),
  * which at full probe (probeRadius = nPlanes / nProbe = nLists over
  * the same corpus) are ROW-IDENTICAL to [[rrfTopK]] — the
  * equality HybridSwapSpec pins, riding the channel-level pins
  * (annKnnJoin ≡ knnJoin, ivfKnnJoin ≡ knnJoin). The fusion itself
  * touches only the two channels' top-`kC` lists (≤ 2·kC rows per
  * query), so its joins and windows are query-count-sized, never
  * corpus-sized.
  */
object HybridRetrieval {

  /** Fused top-`k` over `docs` (lexical side, `(doc_id, text)`) and
    * `embeddings` (semantic side, `(vec_id, embedding)`, vec_id
    * aligned with doc_id) for a query table
    * `(query_id, terms, qvec)`. Both channels retrieve their top-`kC`
    * with the query's own document excluded (a retrieval engine never
    * returns the query itself).
    *
    * Output: (query_id, doc_id, rrf, r_lex, r_sem) — rrf rounded 6 dp,
    * descending per query with ties by doc_id; r_lex/r_sem are the
    * channel ranks (1-based) or 0 when the candidate was outside that
    * channel's top-`kC` (0, not null: engine-portable hashing).
    */
  def rrfTopK(
      docs: DataFrame,
      embeddings: DataFrame,
      queries: DataFrame,
      k: Int,
      kC: Int = 20,
      kRrf: Int = 60): DataFrame =
    fuse(
      lexChannel(docs, queries, kC),
      graft.vector.Ann.knnJoin(semQueries(queries), embeddings, kC),
      k, kC, kRrf)

  /** [[rrfTopK]] with the SEMANTIC channel served by the LSH-bucketed
    * [[graft.vector.Ann.annKnnJoin]] — the large-query-set production
    * form. At `probeRadius = nPlanes` every bucket is probed and the
    * result is row-identical to [[rrfTopK]] (HybridSwapSpec).
    */
  def rrfTopKAnn(
      docs: DataFrame,
      embeddings: DataFrame,
      queries: DataFrame,
      k: Int,
      kC: Int = 20,
      kRrf: Int = 60,
      nPlanes: Int = 8,
      probeRadius: Int = 2,
      seed: Long = 42L): DataFrame =
    fuse(
      lexChannel(docs, queries, kC),
      graft.vector.Ann.annKnnJoin(semQueries(queries), embeddings, kC,
        nPlanes, probeRadius, seed),
      k, kC, kRrf)

  /** [[rrfTopK]] with the SEMANTIC channel served by a persisted IVF
    * index ([[graft.vector.Ivf.ivfKnnJoin]] over `indexPath`) — the
    * 100 TB production form: the corpus is never rescanned, only the
    * probed lists. At `nProbe` = the index's nLists (over an index of
    * the same embeddings) the result is row-identical to [[rrfTopK]]
    * (HybridSwapSpec).
    */
  def rrfTopKIvf(
      docs: DataFrame,
      indexPath: String,
      queries: DataFrame,
      k: Int,
      kC: Int = 20,
      kRrf: Int = 60,
      nProbe: Int = 4): DataFrame =
    fuse(
      lexChannel(docs, queries, kC),
      graft.vector.Ivf.ivfKnnJoin(docs.sparkSession, indexPath,
        semQueries(queries), kC, nProbe),
      k, kC, kRrf)

  /** The lexical channel: BM25 top-kC with 1-based ranks. */
  private def lexChannel(
      docs: DataFrame, queries: DataFrame, kC: Int): DataFrame = {
    val lexW = Window.partitionBy("query_id")
      .orderBy(desc("score"), asc("doc_id"))
    // Bm25.knnJoin emits the rounded score ordered (score desc,
    // doc_id) — re-deriving the 1-based rank is a kC-sized window
    Bm25
      .knnJoin(docs, queries.select("query_id", "terms"), kC,
        excludeSelf = true)
      .select(col("query_id"), col("doc_id"),
        row_number().over(lexW).cast("bigint").as("r_lex"))
  }

  /** The semantic channels' query shape (vec_id = query_id, so their
    * default excludeSelf drops the query's own document).
    */
  private def semQueries(queries: DataFrame): DataFrame =
    queries.select(col("query_id").as("vec_id"), col("qvec").as("embedding"))

  /** Fuse a ranked lexical channel with any (qid, vec_id, cos, rk)
    * semantic top-kC frame — every public variant lands here, so the
    * swap-equality proof reduces to the channels'.
    */
  private def fuse(
      lex: DataFrame,
      semTopK: DataFrame,
      k: Int,
      kC: Int,
      kRrf: Int): DataFrame = {
    require(k > 0 && kC >= k, s"need kC >= k > 0: k=$k kC=$kC")
    require(kRrf > 0, s"kRrf must be positive: $kRrf")
    val sem = semTopK
      .select(col("qid").as("query_id"), col("vec_id").as("doc_id"),
        col("rk").cast("bigint").as("r_sem"))
    val fused = lex.join(sem, Seq("query_id", "doc_id"), "full_outer")
      .select(col("query_id"), col("doc_id"),
        coalesce(col("r_lex"), lit(0L)).as("r_lex"),
        coalesce(col("r_sem"), lit(0L)).as("r_sem"))
      .withColumn("rrf", round(
        when(col("r_lex") > 0,
          lit(1.0) / (lit(kRrf) + col("r_lex")).cast("double"))
          .otherwise(lit(0.0)) +
        when(col("r_sem") > 0,
          lit(1.0) / (lit(kRrf) + col("r_sem")).cast("double"))
          .otherwise(lit(0.0)), 6))
    val w = Window.partitionBy("query_id")
      .orderBy(desc("rrf"), asc("doc_id"))
    fused.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= k)
      .select("query_id", "doc_id", "rrf", "r_lex", "r_sem")
      .orderBy(asc("query_id"), desc("rrf"), asc("doc_id"))
  }
}
