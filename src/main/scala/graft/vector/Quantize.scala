package graft.vector

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions.dot

/** Symmetric int8 scalar quantization for embedding columns — the
  * storage/bandwidth lever at 100 TB: a float32 corpus shrinks 4× (one
  * byte per element + one float scale per vector), and the approximate
  * dot product stays within a provable error bound, so coarse stages
  * (candidate generation, IVF assignment) can run on the quantized
  * table and only the final re-rank touches full-precision vectors.
  *
  * Scheme: per-vector scale s = max|v_i| / 127; q_i = round(v_i / s) ∈
  * [−127, 127]. Reconstruction error per element ≤ s/2, so for UNIT
  * vectors the dot-product error is ≤ dim · (sa/2 + sb/2) + dim ·
  * sa·sb/4 — the bound the property test pins. Everything is
  * declarative transform/aggregate (codegen'd), no UDFs.
  */
object Quantize {

  /** (vec_id, q: array<tinyint>, scale: float) — 4× smaller than the
    * float32 input; map-side only.
    */
  def quantize(embeddings: DataFrame): DataFrame = {
    val absMax = array_max(transform(col("embedding"), x => abs(x)))
    // an all-zero vector has absMax 0: keep scale 0 and quantize to all
    // zeros (dequantizes exactly) instead of dividing by zero
    val scale = (absMax / lit(127.0f)).cast("float")
    embeddings.select(
      col("vec_id"),
      when(scale === 0f, transform(col("embedding"), _ => lit(0.toByte)))
        .otherwise(transform(col("embedding"),
          x => round(x / scale).cast("tinyint"))).as("q"),
      scale.as("scale"))
  }

  /** Reconstruct approximate float vectors from a quantized table. */
  def dequantize(quantized: DataFrame): DataFrame =
    quantized.select(
      col("vec_id"),
      transform(col("q"), x => (x.cast("float") * col("scale")).cast("float"))
        .as("embedding"))

  /** Approximate all-pairs cosine ≥ `threshold − margin` on the
    * QUANTIZED table, exact-rescored on the float table — the two-stage
    * shape: the wide candidate scan reads 1/4 the bytes, the exact pass
    * touches only survivors. `margin` must cover the quantization error
    * bound so no true pair is lost (the property test pins recall = 1
    * against [[Ann.allPairsAbove]]): for unit vectors of dimension d the
    * dot error is ≤ 2·(1/254)·√d + d/254² — 0.064 at d = 64 — so the
    * 0.08 default is safe through d ≈ 100; raise it for wider vectors.
    */
  def quantizedPairsAbove(
      embeddings: DataFrame,
      threshold: Double,
      margin: Double = 0.08): DataFrame = {
    val qt = quantize(embeddings)
    val qa = dequantize(qt).select(col("vec_id").as("i"), col("embedding").as("qa"))
    val qb = dequantize(qt).select(col("vec_id").as("j"), col("embedding").as("qb"))
    val cand = qa.crossJoin(qb)
      .filter(col("i") < col("j"))
      .filter(dot(col("qa"), col("qb")) > threshold - margin)
      .select("i", "j")
    cand
      .join(embeddings.select(col("vec_id").as("i"), col("embedding").as("ea")), Seq("i"))
      .join(embeddings.select(col("vec_id").as("j"), col("embedding").as("eb")), Seq("j"))
      .withColumn("dp", dot(col("ea"), col("eb")))
      .filter(col("dp") > threshold)
      .select(col("i"), col("j"), round(col("dp"), 6).as("cos"))
      .orderBy("i", "j")
  }
}
