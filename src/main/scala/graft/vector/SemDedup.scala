package graft.vector

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions.dot

/** Cluster-blocked semantic deduplication — the SemDeDup shape (Abbas
  * et al. 2023, arXiv:2303.09540, public): k-means clusters are the
  * BLOCKING structure, pairwise cosine runs only WITHIN a cluster, and
  * every near-duplicate group keeps its lowest-id representative.
  *
  * Scale contract: the only quadratic term is Σ over clusters of m²/2.
  * At 100 TB the cluster count grows with the corpus (nLists ∝ N /
  * targetClusterSize, centroids from [[Ivf.refineCentroids]] over a
  * sample), so per-cluster membership — hence the pair mass — stays
  * bounded; the within-cluster join is an equi-join on `list_id`,
  * never a cartesian. A pathological pile concentrated in one cluster
  * degrades exactly like an oversized LSH bucket — route through
  * [[Ann.budgetedBandedPairsAbove]] when spam piles are a threat; this
  * operator is the CLUSTER-blocked semantic variant, trading the LSH
  * path's angle-probability recall for "recall within the semantic
  * neighborhood the clustering defines" (the SemDeDup trade).
  *
  * Centroids are an explicit input (read from the persisted k-means
  * artifact), so assignment — and therefore the dedup verdict — is a
  * pure deterministic function of (corpus, centroids): the argmax dot
  * with centroid_id tie-break, identical to [[Ivf.assign]].
  */
object SemDedup {

  /** [[Ivf.assign]] keeping the winning score: (vec_id, embedding,
    * list_id, ccos) with `ccos` the cosine to the assigned centroid.
    * Same broadcast-argmax shape — strictly map-side over the corpus.
    */
  def assignWithScore(embeddings: DataFrame, cents: DataFrame): DataFrame =
    Ivf.withBest(embeddings, cents, l2 = false)
      .select(col("vec_id"), col("embedding"),
        col("best.id").as("list_id"), col("best.score").as("ccos"))

  /** Per-cluster profile of a k-means clustering: membership count and
    * the distribution (avg/min/max) of member→centroid cosine — the
    * health check run after every clustering build (empty or incoherent
    * clusters surface here before any downstream stage consumes the
    * index). One map-side assignment pass + one nLists-sized aggregate.
    */
  def clusterProfile(embeddings: DataFrame, cents: DataFrame): DataFrame =
    assignWithScore(embeddings, cents)
      .groupBy("list_id")
      .agg(
        count(lit(1)).cast("bigint").as("n"),
        round(avg(col("ccos")), 6).as("avg_cos"),
        round(min(col("ccos")), 6).as("min_cos"),
        round(max(col("ccos")), 6).as("max_cos"))
      .orderBy("list_id")

  /** Cluster-stratified diversity sample — semantic-COVERAGE subset
    * selection, the complement of [[semanticDedup]]'s redundancy
    * removal: assign every vector to its k-means cluster and keep the
    * `k` smallest-coin members of EACH cluster (portable md5 coin,
    * deterministic per seed). Uniform-per-cluster selection flattens
    * semantic density — dense topics stop dominating the sample,
    * sparse topics keep representation — the standard move when
    * curating a small, diverse calibration/eval subset from a huge
    * corpus.
    *
    * Scale shape: [[Ivf.assign]] is map-side (centroid broadcast), and
    * the per-cluster selection is [[graft.ops.Scale.stratifiedTopK]] —
    * a coin-cutoff prune so the exact window touches ~k rows per
    * cluster, never the whole cluster.
    */
  def diversitySample(
      embeddings: DataFrame,
      cents: DataFrame,
      k: Int,
      seed: Long = 42L): DataFrame =
    graft.ops.Scale.stratifiedTopK(
      Ivf.assign(embeddings, cents).select(col("vec_id"), col("list_id")),
      "vec_id", "list_id", k, seed)
      .orderBy("list_id", "vec_id")

  /** Semantic-outlier prune — the complement health check to
    * [[clusterProfile]]: flag every vector whose cosine to its ASSIGNED
    * centroid falls below `minCos`. Far-from-every-centroid points are
    * the classic embedding-space junk signature (mojibake, binary
    * spill, off-distribution noise) — the standard curation step is to
    * audit or drop them before the corpus feeds training (the outlier
    * half of the SemDeDup/DataComp cluster-based filtering recipe).
    * Output: (vec_id, list_id, cos) for flagged rows, ordered by
    * vec_id; `cos` rounded to 6 dp for display, the FILTER runs on the
    * unrounded double (deterministic — same IEEE sum both engines).
    *
    * Scale shape: strictly map-side over the corpus (broadcast-argmax
    * assignment, then a filter) — no shuffle at all until the final
    * presentation sort over the tiny flagged subset.
    */
  def outliers(
      embeddings: DataFrame,
      cents: DataFrame,
      minCos: Double): DataFrame =
    assignWithScore(embeddings, cents)
      .filter(col("ccos") < minCos)
      .select(col("vec_id"), col("list_id"), round(col("ccos"), 6).as("cos"))
      .orderBy("vec_id")

  /** Semantic near-duplicates: for every vector that has a same-cluster
    * partner with cosine > `threshold` and a SMALLER id, emit one row
    * (vec_id, kept_by, cos) naming the smallest such partner — the
    * deterministic "keep the lowest id per duplicate neighborhood"
    * policy (dropping the emitted rows keeps exactly one representative
    * per within-cluster duplicate chain). `cos` is the similarity to
    * the keeper, rounded to 6 dp.
    */
  def semanticDedup(
      embeddings: DataFrame,
      cents: DataFrame,
      threshold: Double): DataFrame = {
    val assigned = assignWithScore(embeddings, cents)
    val a = assigned.select(col("list_id"), col("vec_id").as("i"), col("embedding").as("ea"))
    val b = assigned.select(col("list_id"), col("vec_id").as("j"), col("embedding").as("eb"))
    a.join(b, Seq("list_id"))
      .filter(col("i") < col("j"))
      .withColumn("dp", dot(col("ea"), col("eb")))
      .filter(col("dp") > threshold)
      // min over (i, dp) structs: the smallest keeper id, carrying the
      // dp of exactly that pair (one row per (i, j) — no ambiguity)
      .groupBy("j")
      .agg(min(struct(col("i"), col("dp"))).as("k"))
      .select(col("j").as("vec_id"), col("k.i").as("kept_by"),
        round(col("k.dp"), 6).as("cos"))
      .orderBy("vec_id")
  }
}
