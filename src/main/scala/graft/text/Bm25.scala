package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BM25 ranked retrieval (Robertson/Spärck Jones probabilistic model,
  * Okapi BM25 with the Lucene `ln(1 + ...)` idf that never goes
  * negative — both public: Robertson & Zaragoza 2009, "The
  * Probabilistic Relevance Framework"). In a training-data pipeline
  * this is the retrieval half of targeted decontamination and seed-set
  * expansion: "find the corpus documents most similar to this query /
  * benchmark prompt" without any embedding model.
  *
  * Scale shape: ONE corpus scan. Per-term tf is a map-side
  * `filter(tokens, _ = term)` count (the query is a small literal list,
  * so tf/df per term are fixed COLUMNS, not a joined terms table —
  * nothing shuffles per-token); corpus stats (N, Σdl, per-term df)
  * ride a single 1-row aggregate broadcast back over the scoring scan,
  * and the top-k is a TakeOrdered. For ad-hoc many-term queries you'd
  * flip to the inverted (doc_id, term) join form; for the k-term
  * literal-query shape this column form is strictly cheaper (no
  * explode, no shuffle before the final k-row sort).
  *
  * Cross-engine determinism (the oracle contract): every floating step
  * is a FIXED-ORDER scalar expression — avgdl comes from exact integer
  * sums (Σdl / N, divided once as doubles), per-term idf/tf factors
  * combine in query order — so DuckDB reproduces the score
  * bit-for-bit; ties on the 6-dp rounded score break by doc_id.
  */
object Bm25 {

  /** Top-`k` documents by BM25 score for the literal query `terms`.
    * Output: (doc_id, score) — score rounded to 6 dp, descending, ties
    * by doc_id; documents matching no term (score 0) are excluded.
    * `k1` saturates tf; `b` scales length normalization (standard
    * defaults 1.2 / 0.75).
    */
  def topK(
      docs: DataFrame,
      terms: Seq[String],
      k: Int,
      k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "BM25 needs at least one query term")
    require(terms.distinct == terms, s"duplicate query terms: $terms")
    require(k > 0, s"k must be positive: $k")

    val toked = docs.select(
      col("doc_id"),
      TextAnalysis.tokens(col("text")).as("toks"))
    val withTf = terms.zipWithIndex.foldLeft(
      toked.withColumn("dl", size(col("toks")))) { case (d, (t, i)) =>
        d.withColumn(s"tf$i", size(filter(col("toks"), x => x === lit(t))))
      }.drop("toks")

    // one metadata-sized row: corpus size, total length (exact integer
    // sums — no float-accumulation order to diverge), df per term
    val stats = withTf.agg(
      count(lit(1)).as("n_docs"),
      sum(col("dl").cast("bigint")).as("sum_dl") +:
        terms.indices.map(i =>
          sum(when(col(s"tf$i") > 0, 1L).otherwise(0L)).as(s"df$i")): _*)

    val scored = withTf.crossJoin(broadcast(stats))
    val avgdl = col("sum_dl").cast("double") / col("n_docs").cast("double")
    val termScore: Int => Column = i => {
      val tf = col(s"tf$i").cast("double")
      val df = col(s"df$i").cast("double")
      val idf = log(lit(1.0) +
        (col("n_docs").cast("double") - df + lit(0.5)) / (df + lit(0.5)))
      idf * (tf * lit(k1 + 1.0)) /
        (tf + lit(k1) * (lit(1.0 - b) + lit(b) * (col("dl").cast("double") / avgdl)))
    }
    val score = terms.indices.map(termScore).reduce(_ + _)

    scored
      .select(col("doc_id"), round(score, 6).as("score"))
      .filter(col("score") > 0)
      .orderBy(desc("score"), asc("doc_id"))
      .limit(k)
  }

  /** Batched BM25 retrieval for a query TABLE — the inverted-index
    * join form that scales where [[topK]]'s literal-column form cannot
    * (thousands of ad-hoc queries, arbitrary term counts): build the
    * postings list (term, doc_id, tf) ONCE, equi-join it with the
    * exploded query terms, and take the per-query top-k through a
    * query-partitioned window. Queries: (query_id, terms); duplicate
    * terms within a query are collapsed (set semantics, the common
    * convention). Output: (query_id, doc_id, score) — top `k` docs per
    * query by 6-dp rounded score, ties by doc_id.
    *
    * Scale shape: one corpus scan into postings (shuffle on term — the
    * inverted index build), pruned by an explicit broadcast semi-join
    * on the query-term dictionary BEFORE the aggregate so only matching
    * token rows shuffle at all, corpus-level stats as a broadcast 1-row
    * aggregate, the postings⋈query join over that slice, and the final
    * window partitions by query_id — never a global sort. Per-pair
    * score contributions sum through a hash aggregate; the float
    * accumulation order over a query's ≤|terms| matches is the one
    * non-canonical step (same contract as every distributed float agg
    * here — 6-dp rounding absorbs it).
    */
  def knnJoin(
      docs: DataFrame,
      queries: DataFrame,
      k: Int,
      k1: Double = 1.2,
      b: Double = 0.75,
      excludeSelf: Boolean = false): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    val scored = pairScores(docs, queries, k1, b)
    // excludeSelf drops query_id==doc_id BEFORE the top-k (retrieval
    // callers whose queries are corpus docs, e.g. the hybrid fusion:
    // filtering after the window would under-fill the k)
    topKPerQuery(
      if (excludeSelf) scored.filter(col("query_id") =!= col("doc_id"))
      else scored, k)
  }

  /** (query_id, doc_id, score): every query×doc BM25 score with at
    * least one matching term — the inverted-index join shared by
    * [[knnJoin]] and [[hardNegatives]].
    */
  private def pairScores(
      docs: DataFrame,
      queries: DataFrame,
      k1: Double,
      b: Double): DataFrame = {
    // single-row-group rescue (Scale.spreadForCompute): the tokenize +
    // postings explode + dictionary semi-join passes are the dominant
    // map cost and run on the corpus scan's task count; no-op at scale
    val toked = graft.ops.Scale.spreadForCompute(docs, col("doc_id"))
      .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("toks"))
      .withColumn("dl", size(col("toks")))
    val qterms = queries
      .select(col("query_id"), explode(col("terms")).as("term"))
      .distinct()
    // postings: (term, doc_id, tf, dl) — the inverted index, pruned to
    // the query-term dictionary BEFORE the groupBy shuffle: only terms
    // some query mentions can reach the inner joins below, so dropping
    // the rest at the explode cuts the posting shuffle from the whole
    // corpus token stream to the matching slice (df per surviving term
    // is unchanged — pruning removes only other terms' rows). The
    // dictionary is broadcast: scoring batches carry a bounded query
    // set (mining runs per positive batch), never a corpus-sized one.
    val postings = toked
      .select(col("doc_id"), col("dl"), explode(col("toks")).as("term"))
      .join(broadcast(qterms.select("term").distinct()), Seq("term"), "left_semi")
      .groupBy("term", "doc_id", "dl")
      .agg(count(lit(1)).cast("double").as("tf"))
    val docFreq = postings.groupBy("term")
      .agg(count(lit(1)).cast("double").as("df"))
    val stats = toked.agg(
      count(lit(1)).as("n_docs"),
      sum(col("dl").cast("bigint")).as("sum_dl"))

    val avgdl = col("sum_dl").cast("double") / col("n_docs").cast("double")
    val idf = log(lit(1.0) +
      (col("n_docs").cast("double") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val contrib = idf * (col("tf") * lit(k1 + 1.0)) /
      (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * (col("dl").cast("double") / avgdl)))

    qterms
      .join(postings, Seq("term"))
      .join(docFreq, Seq("term"))
      .crossJoin(broadcast(stats))
      .select(col("query_id"), col("doc_id"), contrib.as("c"))
      .groupBy("query_id", "doc_id")
      .agg(round(sum(col("c")), 6).as("score"))
  }

  private def topKPerQuery(scored: DataFrame, k: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(desc("score"), asc("doc_id"))
    scored
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= k)
      .drop("__rk")
      .orderBy(asc("query_id"), desc("score"), asc("doc_id"))
  }

  /** Hard-negative mining for retrieval training (the DPR/ANCE recipe,
    * Karpukhin et al. 2020 arXiv:2004.04906, Xiong et al. 2020
    * arXiv:2007.00808 — both public): for each POSITIVE document, the
    * top-k BM25-scored corpus documents that are lexically close but
    * NOT the positive itself and NOT a verified near-duplicate of it —
    * the strongest confusable non-matches, which is exactly what a
    * dense retriever needs as negatives. Near-dup exclusion matters:
    * without it the "negatives" include exact/near copies of the
    * positive and training collapses (false negatives).
    *
    * `queryDocs` (doc_id, text) are the positives, drawn from the
    * corpus id space; `nearDupPairs` (i, j, …) lists corpus doc i as a
    * verified near-dup of positive j (the
    * [[MinHashDedup.crossNearDupsFromBanded]] output — candidates from
    * the persisted banded index, exact-Jaccard verified). Exclusions
    * are anti-joined BEFORE the top-k window, so a positive buried in
    * near-copies still yields k genuine negatives. Output:
    * (query_id, doc_id, score), k rows per query.
    */
  def hardNegatives(
      docs: DataFrame,
      queryDocs: DataFrame,
      nearDupPairs: DataFrame,
      k: Int,
      k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    val queries = queryDocs.select(col("doc_id").as("query_id"),
      TextAnalysis.tokens(col("text")).as("terms"))
    val excluded = nearDupPairs
      .select(col("j").as("query_id"), col("i").as("doc_id"))
      .unionByName(queryDocs.select(col("doc_id").as("query_id"),
        col("doc_id")))
    topKPerQuery(
      pairScores(docs, queries, k1, b)
        .join(excluded, Seq("query_id", "doc_id"), "left_anti"),
      k)
  }

  /** The DuckDB restatement of [[topK]] over a `documents` table —
    * structurally identical arithmetic so the float results agree
    * bit-for-bit (same division and addition order, integer corpus
    * sums).
    */
  def topKSql(
      terms: Seq[String],
      k: Int,
      k1: Double = 1.2,
      b: Double = 0.75): String = {
    require(terms.forall(t => !t.contains("'")),
      s"query terms must not contain single quotes (SQL literal embedding): $terms")
    val tfCols = terms.zipWithIndex.map { case (t, i) =>
      s"len(list_filter(toks, x -> x = '$t')) AS tf$i"
    }.mkString(",\n            ")
    val dfCols = terms.indices.map(i =>
      s"SUM(CASE WHEN tf$i > 0 THEN 1 ELSE 0 END) AS df$i").mkString(", ")
    val scoreExpr = terms.indices.map { i =>
      s"""ln(1.0 + (CAST(n_docs AS DOUBLE) - CAST(df$i AS DOUBLE) + 0.5) / (CAST(df$i AS DOUBLE) + 0.5))
     * (CAST(tf$i AS DOUBLE) * ${k1 + 1.0}) /
       (CAST(tf$i AS DOUBLE) + $k1 * ((1.0 - $b) + $b * (CAST(dl AS DOUBLE) / (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE)))))"""
    }.mkString("\n   + ")
    s"""WITH t AS (
  SELECT doc_id, dl, ${terms.indices.map(i => s"tf$i").mkString(", ")}
  FROM (SELECT doc_id, list_filter(str_split(text, ' '), w -> w <> '') AS toks FROM documents) d
  CROSS JOIN LATERAL (SELECT len(toks) AS dl,
            ${tfCols}) f),
stats AS (SELECT COUNT(*) AS n_docs, SUM(CAST(dl AS BIGINT)) AS sum_dl, $dfCols FROM t),
scored AS (
  SELECT doc_id,
         ROUND($scoreExpr, 6) AS score
  FROM t CROSS JOIN stats)
SELECT doc_id, score FROM scored WHERE score > 0
ORDER BY score DESC, doc_id LIMIT $k""".trim
  }
}
