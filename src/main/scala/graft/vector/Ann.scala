package graft.vector

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions.dot

/** Similarity search over an `array<float>` embedding column.
  *
  * Two paths (SURVEY.md §4.3.2 pattern):
  *   - [[bruteForceTopK]]: exact — one pass over all vectors with the
  *     codegen'd dot product, top-k via TakeOrderedAndProject (per-
  *     partition heaps, k rows to the driver). The correctness baseline
  *     and fine up to ~10^8 vectors × small k.
  *   - [[annTopK]]: sign-random-projection LSH — each vector is bucketed
  *     by the sign pattern of `nPlanes` fixed hyperplane projections;
  *     a query probes every bucket within Hamming distance `probeRadius`
  *     of its own (multi-probe LSH), then scores candidates exactly.
  *     At scale the bucketed table is computed once (write-side) and the
  *     probe is a bucket-pruned scan — candidates shrink by ~2^nPlanes /
  *     sum_{d<=r} C(nPlanes, d) versus brute force.
  *
  * Hyperplanes are deterministic (fixed-seed Gaussian) so bucketing is
  * reproducible across runs and engines.
  */
object Ann {

  /** Deterministic Gaussian hyperplanes: nPlanes × dim float32. */
  def hyperplanes(nPlanes: Int, dim: Int, seed: Long = 42L): Array[Array[Float]] = {
    val rng = new scala.util.Random(seed)
    Array.fill(nPlanes)(Array.fill(dim)(rng.nextGaussian().toFloat))
  }

  /** Exact top-k by cosine (dot product on unit vectors) for one probe
    * vector identified by `probeId`.
    */
  def bruteForceTopK(embeddings: DataFrame, probeId: Long, k: Int): DataFrame = {
    val probe = broadcast(
      embeddings.filter(col("vec_id") === probeId)
        .select(col("embedding").as("probe_emb")))
    embeddings.filter(col("vec_id") =!= probeId)
      .crossJoin(probe)
      .select(col("vec_id"), round(dot(col("probe_emb"), col("embedding")), 6).as("cos"))
      .orderBy(col("cos").desc, col("vec_id"))
      .limit(k)
  }

  /** Add an LSH `bucket` column: bit b = sign(v · plane_b). Map-side
    * only — at 100 TB this is the write-side index pass, persisted and
    * optionally partitioned by bucket.
    */
  def withBucket(embeddings: DataFrame, planes: Array[Array[Float]]): DataFrame = {
    val bucket = planes.zipWithIndex
      .map { case (p, b) =>
        when(dot(col("embedding"), typedLit(p)) >= 0, lit(1L << b)).otherwise(0L)
      }
      .reduce((a, b) => a.bitwiseOR(b))
    embeddings.withColumn("bucket", bucket)
  }

  /** Approximate top-k: probe all buckets within `probeRadius` bit flips
    * of the query's bucket, score candidates exactly, take top-k.
    * probeRadius = nPlanes degenerates to exact brute force (all buckets
    * probed) — the property the tests pin.
    */
  def annTopK(
      embeddings: DataFrame,
      probeId: Long,
      k: Int,
      nPlanes: Int = 8,
      probeRadius: Int = 2,
      seed: Long = 42L): DataFrame = {
    val dim = 64
    val planes = hyperplanes(nPlanes, dim, seed)
    val bucketed = withBucket(embeddings, planes)
    val probe = broadcast(
      bucketed.filter(col("vec_id") === probeId)
        .select(col("embedding").as("probe_emb"), col("bucket").as("probe_bucket")))
    val hamming = bit_count(col("bucket").bitwiseXOR(col("probe_bucket")))
    bucketed.filter(col("vec_id") =!= probeId)
      .crossJoin(probe)
      .filter(hamming <= probeRadius) // bucket pruning — the ANN step
      .select(col("vec_id"), round(dot(col("probe_emb"), col("embedding")), 6).as("cos"))
      .orderBy(col("cos").desc, col("vec_id"))
      .limit(k)
  }

  /** Exact all-pairs cosine above `threshold` — global embedding
    * near-dup detection (no label blocking). The LSH-bucketed variant
    * joins on `bucket` instead of the cartesian at scale.
    */
  def allPairsAbove(embeddings: DataFrame, threshold: Double): DataFrame = {
    val a = embeddings.select(col("vec_id").as("i"), col("embedding").as("ea"))
    val b = embeddings.select(col("vec_id").as("j"), col("embedding").as("eb"))
    a.crossJoin(b)
      .filter(col("i") < col("j"))
      .withColumn("dp", dot(col("ea"), col("eb")))
      .filter(col("dp") > threshold)
      .select(col("i"), col("j"), round(col("dp"), 6).as("cos"))
      .orderBy("i", "j")
  }

  /** LSH-bucketed near-dup candidates: pairs sharing a bucket, scored
    * exactly — the scale path for [[allPairsAbove]]. Recall is tested
    * against the exact pairs (property test, not oracle).
    */
  def bucketedPairsAbove(
      embeddings: DataFrame,
      threshold: Double,
      nPlanes: Int = 6,
      seed: Long = 42L): DataFrame = {
    val bucketed = withBucket(embeddings, hyperplanes(nPlanes, 64, seed))
    val a = bucketed.select(col("vec_id").as("i"), col("embedding").as("ea"), col("bucket"))
    val b = bucketed.select(col("vec_id").as("j"), col("embedding").as("eb"), col("bucket"))
    a.join(b, Seq("bucket"))
      .filter(col("i") < col("j"))
      .withColumn("dp", dot(col("ea"), col("eb")))
      .filter(col("dp") > threshold)
      .select(col("i"), col("j"), round(col("dp"), 6).as("cos"))
      .orderBy("i", "j")
  }
}
