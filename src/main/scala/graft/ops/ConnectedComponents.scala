package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components by alternating large-star / small-star edge
  * rewrites — the general-graph scale path (O(log n) rounds on any
  * topology, vs. min-label propagation's O(diameter), which melts on
  * chain-shaped components).
  *
  * The public two-operation scheme (Kiveris et al., "Connected
  * Components in MapReduce and Beyond"):
  *   - large-star: every node u links each STRICTLY LARGER neighbor to
  *     m(u) = min(N(u) ∪ u);
  *   - small-star: every node u links each neighbor ≤ u (and itself)
  *     to m(u).
  * Both are one groupBy(node) aggregation + one re-emit — two shuffles
  * per round on (long, long) edges, no windows, no driver-side graph.
  * At a fixed point every edge is (root, member), and the root is the
  * component minimum — the same cluster-id contract as
  * [[graft.text.MinHashDedup.duplicateClusters]].
  */
object ConnectedComponents {

  /** Symmetrized per-edge view with the neighborhood minimum joined on:
    * one row per (u, v, m(u)) with m(u) = min(N(u) ∪ u). Deliberately
    * NO collect_set/array aggregation — a component root's neighborhood
    * is the whole component, and materializing it on one row is an OOM
    * at exactly the scale this module exists for. The min-join is
    * co-partitioned with the groupBy key, so it reuses the same
    * exchange.
    */
  private def withMin(edges: DataFrame): DataFrame = {
    // self loops for EVERY endpoint (a and b sides): small-star emits the
    // (u, m) star edge through the v = u row, so a node missing its self
    // loop silently drops out of its component
    val nodes = edges.select(col("a").as("u"))
      .unionByName(edges.select(col("b").as("u"))).distinct()
    val sym = edges.select(col("a").as("u"), col("b").as("v"))
      .unionByName(edges.select(col("b").as("u"), col("a").as("v")))
      .unionByName(nodes.select(col("u"), col("u").as("v")))
    sym.join(sym.groupBy("u").agg(min("v").as("m")), Seq("u"))
  }

  /** One large-star round: (v, m(u)) for every v ∈ N(u), v > u.
    *
    * No trailing distinct: the only consumer is [[smallStar]], whose
    * result depends on the edge SET alone (duplicate rows feed the
    * same groupBy-min and join, and its own distinct restores set
    * semantics), so the dedup exchange here bought nothing — one
    * full shuffle per round removed. Duplicate mass is bounded at
    * ≤ 2|E|+|V| rows (each endpoint emits once), never compounding
    * across rounds.
    */
  private def largeStar(edges: DataFrame): DataFrame =
    withMin(edges)
      .filter(col("v") > col("u"))
      .select(least(col("v"), col("m")).as("a"), greatest(col("v"), col("m")).as("b"))
      .filter(col("a") =!= col("b"))

  /** One small-star round: (v, m(u)) for every v ∈ N(u) ∪ {u}, v ≤ u. */
  private def smallStar(edges: DataFrame): DataFrame =
    withMin(edges)
      .filter(col("v") <= col("u"))
      .select(least(col("v"), col("m")).as("a"), greatest(col("v"), col("m")).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()

  /** (doc_id, cluster_id) for every node of the pair graph `pairs`
    * (columns i, j), cluster_id = component minimum. `maxRounds` is a
    * convergence backstop: 2^rounds ≥ diameter suffices, so 30 covers
    * any graph that fits in storage; non-convergence errors rather than
    * returning split clusters.
    */
  def components(pairs: DataFrame, maxRounds: Int = 30): DataFrame = {
    val all = pairs.select(col("i").as("a"), col("j").as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
    var edges = all.localCheckpoint(true)
    var count = edges.count()
    var converged = false
    var round = 0
    while (!converged && round < maxRounds) {
      val next = smallStar(largeStar(edges)).localCheckpoint(true)
      val nextCount = next.count()
      // fixed point: the edge SET is unchanged. Both sides are distinct
      // sets, so equal counts + one empty difference proves equality —
      // the count is near-free on the checkpointed frame and skips the
      // except entirely while the graph is still shrinking
      converged = nextCount == count && next.exceptAll(edges).isEmpty
      edges = next
      count = nextCount
      round += 1
    }
    require(converged,
      s"connected components did not converge within $maxRounds rounds")
    // at the fixed point each edge is (root, member); roots label themselves
    edges.select(col("b").as("doc_id"), col("a").as("cluster_id"))
      .unionByName(
        edges.select(col("a").as("doc_id"), col("a").as("cluster_id")).distinct())
      .distinct()
      .orderBy("doc_id")
  }
}
