package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.vector.{Opq, Pq}

/** OPQ (learned-rotation PQ, Ge et al. 2013) properties:
  *   - the identity rotation reproduces plain PQ BIT-FOR-BIT (codes,
  *     ADC search, quantization error) — the degeneration pin that
  *     makes the rotated pipeline auditable against the certified
  *     plain one;
  *   - rotateVectors matches a driver-side mat-vec in the exact float
  *     discipline (double-accumulated dot, cast to float);
  *   - a learned rotation is orthogonal (R·Rᵀ ≈ I in float);
  *   - on a duplicated-dims (anisotropic) corpus the alternation
  *     strictly reduces the quantization objective round over round
  *     and strictly lifts recall at equal m·ks — the regime the
  *     rotation exists for (X114/X115 report the honest, modest win on
  *     the near-isotropic real corpus).
  */
class OpqSpec extends SparkSpec {

  private val dim = 16
  private val m = 4
  private val dsub = dim / m
  private val ks = 4

  /** Deterministic pseudo-random half-vector (no RNG — repo rule). */
  private def halfVec(seed: Long): Array[Float] =
    Array.tabulate(dim / 2) { i =>
      var x = seed * 6364136223846793005L + i * 1442695040888963407L
      x ^= x >>> 33; x *= -49064778989728563L; x ^= x >>> 33
      (x.toDouble / Long.MaxValue).toFloat
    }

  private def vecsDf(rows: Seq[(Long, Array[Float])]): DataFrame =
    spark.createDataFrame(
      java.util.Arrays.asList(rows.map { case (id, v) => Row(id, v) }: _*),
      StructType(Seq(
        StructField("vec_id", LongType),
        StructField("embedding", ArrayType(FloatType)))))

  /** Duplicated-halves corpus: x = (a, a). An orthogonal rotation can
    * fold the duplicate energy into one half (√2·a, 0), after which
    * the same m·ks budget quantizes HALF the effective dimensions —
    * plain PQ must pay the duplication twice. The anisotropy OPQ is
    * built for, in its sharpest deterministic form.
    */
  private def dupCorpus(n: Int): DataFrame =
    vecsDf((0L until n.toLong).map { i => val a = halfVec(i); (i, a ++ a) })

  test("identity rotation reproduces plain PQ bit-for-bit: codes, ADC search, quantization error") {
    val df = dupCorpus(120)
    val id = Opq.identityRotation(spark, dim)
    val cb = Pq.trainCodebooks(df, m, ks, iters = 2, dim = dim)
    def codesOf(d: DataFrame): Map[Long, Seq[Int]] =
      d.collect().map(r => r.getLong(0) -> r.getSeq[Int](1).toList).toMap
    assert(codesOf(Pq.encode(Opq.rotateVectors(df, id), cb, dsub))
      == codesOf(Pq.encode(df, cb, dsub)))
    val q = df.filter(col("vec_id") < 3)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    def rows(d: DataFrame): Seq[(Long, Long, Double)] =
      d.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val codes = Pq.encode(df, cb, dsub)
    assert(rows(Opq.adcTopK(codes, cb, id, q, k = 4, dsub = dsub))
      == rows(Pq.adcTopK(codes, cb, q, k = 4, dsub = dsub)))
    // the objective under identity is the plain-PQ objective exactly
    val e = Opq.quantizationError(df, id, cb, dsub).collect()(0)
    assert(e.getLong(0) == 120L)
    assert(e.getDouble(1) > 0.0)
  }

  test("rotateVectors matches a driver-side mat-vec in the engine's float discipline") {
    val df = dupCorpus(10)
    val rot = Opq.trainRotation(df, m, ks, dim, opqIters = 1, pqIters = 2)
    val r = Array.ofDim[Float](dim, dim)
    rot.collect().foreach { row =>
      val i = row.getInt(0)
      row.getSeq[Float](1).zipWithIndex.foreach { case (v, j) => r(i)(j) = v }
    }
    val want = df.collect().map { row =>
      val v = row.getSeq[Float](1).toArray
      row.getLong(0) -> (0 until dim).map { i =>
        // left-to-right double accumulation then one float cast — the
        // dot contract the DuckDB oracle restates
        var s = 0.0
        (0 until dim).foreach(j => s += r(i)(j).toDouble * v(j).toDouble)
        s.toFloat
      }.toList
    }.toMap
    val got = Opq.rotateVectors(df, rot).collect()
      .map(row => row.getLong(0) -> row.getSeq[Float](1).toList).toMap
    assert(got == want)
  }

  test("learned rotation is orthogonal: R·Rᵀ ≈ I within float tolerance") {
    val df = dupCorpus(120)
    val rot = Opq.trainRotation(df, m, ks, dim, opqIters = 2, pqIters = 2)
    val r = Array.ofDim[Double](dim, dim)
    rot.collect().foreach { row =>
      val i = row.getInt(0)
      row.getSeq[Float](1).zipWithIndex.foreach { case (v, j) => r(i)(j) = v.toDouble }
    }
    for (i <- 0 until dim; j <- 0 until dim) {
      val dotIj = (0 until dim).map(k => r(i)(k) * r(j)(k)).sum
      val want = if (i == j) 1.0 else 0.0
      assert(math.abs(dotIj - want) < 1e-3,
        s"R·Rᵀ[$i][$j] = $dotIj, want $want")
    }
  }

  test("duplicated-dims corpus: OPQ strictly reduces the objective round over round and strictly lifts recall at equal m·ks") {
    val df = dupCorpus(300)
    val q = df.filter(col("vec_id") < 8)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val exact = Pq.exactL2TopK(df, q, k = 4)
    def avgRecall(d: DataFrame): Double =
      Pq.recallAtK(d, exact).agg(avg("recall")).first().getDouble(0)

    val cbPlain = Pq.trainCodebooks(df, m, ks, iters = 3, dim = dim)
    val recPlain = avgRecall(Pq.adcTopK(
      Pq.encode(df, cbPlain, dsub), cbPlain, q, k = 4, dsub = dsub))
    val errPlain = Opq.quantizationError(
      df, Opq.identityRotation(spark, dim), cbPlain, dsub)
      .first().getDouble(1)

    def opqAt(oi: Int): (Double, Double) = {
      val rot = Opq.trainRotation(df, m, ks, dim, opqIters = oi, pqIters = 3)
      val cb = Pq.trainCodebooks(Opq.rotateVectors(df, rot), m, ks, iters = 3, dim = dim)
      val codes = Pq.encode(Opq.rotateVectors(df, rot), cb, dsub)
      (avgRecall(Opq.adcTopK(codes, cb, rot, q, k = 4, dsub = dsub)),
        Opq.quantizationError(df, rot, cb, dsub).first().getDouble(1))
    }
    val (rec1, err1) = opqAt(1)
    val (rec5, err5) = opqAt(5)
    assert(err1 < errPlain,
      s"one alternation must already cut the objective: $err1 vs plain $errPlain")
    assert(err5 < err1,
      s"more alternations must keep cutting it: $err5 vs $err1")
    assert(rec5 > recPlain,
      s"OPQ recall must strictly beat plain at equal m·ks on the anisotropic corpus: $rec5 vs $recPlain")
    assert(rec1 >= 0.0 && rec5 <= 1.0)
  }
}
