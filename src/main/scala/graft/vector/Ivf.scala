package graft.vector

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions.dot

/** IVF (inverted-file) index for cosine similarity search — the
  * cluster-pruned alternative to the sign-LSH path in [[Ann]].
  *
  * Build: pick `nLists` centroid vectors (deterministic hash-based
  * sample of the corpus — at 100 TB a k-means refinement pass over a
  * sample would slot in here), assign every vector to its nearest
  * centroid by dot product: one broadcast of the centroids + one
  * map-side argmax, then persist partitioned by `list_id` so a probe
  * reads only its lists.
  *
  * Query: score the probe against the centroids, take the `nProbe`
  * nearest lists, exact-score only vectors in those lists.
  * nProbe = nLists degenerates to exact brute force (the property the
  * tests pin).
  */
object Ivf {

  /** Deterministic centroid choice: the `nLists` corpus vectors with the
    * smallest xxhash64(vec_id) — a uniform pseudo-random sample that is
    * stable across runs and partitionings.
    */
  def centroids(embeddings: DataFrame, nLists: Int): DataFrame =
    embeddings
      .orderBy(xxhash64(col("vec_id")), col("vec_id"))
      .limit(nLists)
      .select(col("vec_id").as("centroid_id"), col("embedding").as("centroid"))

  /** Assign every vector to its nearest centroid (max dot product,
    * centroid_id ascending as the deterministic tie-break).
    */
  def assign(embeddings: DataFrame, cents: DataFrame): DataFrame = {
    val w = Window.partitionBy("vec_id")
      .orderBy(col("score").desc, col("centroid_id"))
    embeddings
      .crossJoin(broadcast(cents))
      .withColumn("score", dot(col("embedding"), col("centroid")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("embedding"), col("centroid_id").as("list_id"))
  }

  /** Top-k by cosine for `probeId`, searching only the `nProbe` lists
    * whose centroids are nearest to the probe vector.
    */
  def ivfTopK(
      embeddings: DataFrame,
      probeId: Long,
      k: Int,
      nLists: Int = 16,
      nProbe: Int = 4): DataFrame = {
    val cents = centroids(embeddings, nLists)
    val indexed = assign(embeddings, cents)
    val probeEmb = embeddings.filter(col("vec_id") === probeId)
      .select(col("embedding").as("probe_emb"))
    val probeLists = broadcast(
      cents.crossJoin(broadcast(probeEmb))
        .select(col("centroid_id"), dot(col("probe_emb"), col("centroid")).as("cscore"))
        .orderBy(col("cscore").desc, col("centroid_id"))
        .limit(nProbe)
        .select(col("centroid_id").as("list_id")))
    indexed
      .join(probeLists, Seq("list_id")) // list pruning — the IVF step
      .filter(col("vec_id") =!= probeId)
      .crossJoin(broadcast(probeEmb))
      .select(col("vec_id"), round(dot(col("probe_emb"), col("embedding")), 6).as("cos"))
      .orderBy(col("cos").desc, col("vec_id"))
      .limit(k)
  }
}
