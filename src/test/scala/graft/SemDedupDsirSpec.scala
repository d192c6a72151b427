package graft

import org.apache.spark.sql.functions._

import graft.ops.Catalog
import graft.text.Dsir
import graft.vector.{Ivf, SemDedup}

/** SemDeDup + DSIR pins: the cluster-blocked dedup verdict equals a
  * driver-side reference over the same frozen centroids; importance
  * weights equal an add-one unigram reference and rank a target-like
  * document above a raw-only one.
  */
class SemDedupDsirSpec extends SparkSpec {

  lazy val cat: Catalog = Catalog(spark, sf001)

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Centroids FROZEN on the driver (collect → literal DataFrame), so
    * the operator and the reference consume bit-identical values —
    * Lloyd float summation order is not canonical, the persisted/frozen
    * table is the clustering's identity (same contract as the persisted
    * mirror the X60/X61 oracles read).
    */
  private lazy val frozenCents: Array[(Long, Array[Float])] = {
    val emb = cat.embeddings
    val dim = emb.select(size(col("embedding"))).first().getInt(0)
    Ivf.refineCentroids(emb, Ivf.centroids(emb, 8), iters = 4, dim = dim)
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
  }

  private def centsDf = {
    val s = spark
    import s.implicits._
    frozenCents.toSeq.toDF("centroid_id", "centroid")
  }

  /** Left-to-right double accumulation — the engine dot's arithmetic. */
  private def dot(a: Array[Float], b: Array[Float]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
    s
  }

  private lazy val vectors: Array[(Long, Array[Float])] =
    cat.embeddings.select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))

  /** Reference assignment: argmax dot, centroid_id ascending tie-break. */
  private lazy val refAssign: Map[Long, (Long, Double)] =
    vectors.map { case (id, v) =>
      val scored = frozenCents.map { case (cid, c) => (cid, dot(v, c)) }
      id -> scored.minBy { case (cid, s) => (-s, cid) }
    }.toMap

  test("clusterProfile equals the driver-side reference") {
    val got = SemDedup.clusterProfile(cat.embeddings, centsDf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
    val want = refAssign.values.groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (cid, members) =>
        val cos = members.map(_._2).toSeq
        (cid, cos.size.toLong, round6(cos.sum / cos.size), round6(cos.min), round6(cos.max))
      }
    // avg float-order tolerance: sum order differs between engine and
    // reference — compare avg at 1e-9, the rest exactly
    assert(got.length == want.length)
    got.zip(want).foreach { case ((gc, gn, ga, gmn, gmx), (wc, wn, wa, wmn, wmx)) =>
      assert(gc == wc && gn == wn && gmn == wmn && gmx == wmx)
      assert(math.abs(ga - wa) < 1e-9, s"cluster $gc avg $ga vs $wa")
    }
    assert(got.map(_._2).sum == vectors.length.toLong)
  }

  test("semanticDedup equals the driver-side reference and its plan has no cartesian") {
    val t = 0.4
    val byCluster = vectors.groupBy { case (id, _) => refAssign(id)._1 }
    val pairs = byCluster.values.flatMap { members =>
      val sorted = members.sortBy(_._1)
      for {
        ai <- sorted.indices; bi <- (ai + 1) until sorted.length
        (i, vi) = sorted(ai); (j, vj) = sorted(bi)
        dp = dot(vi, vj) if dp > t
      } yield (i, j, dp)
    }.toSeq
    val want = pairs.groupBy(_._2).toSeq
      .map { case (j, ps) =>
        val (i, _, dp) = ps.minBy(_._1)
        (j, i, round6(dp))
      }
      .sortBy(_._1)
    val df = SemDedup.semanticDedup(cat.embeddings, centsDf, t)
    val got = df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got == want)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), s"cartesian in plan:\n$plan")
  }

  test("semanticDedup is monotone in the threshold") {
    val loose = SemDedup.semanticDedup(cat.embeddings, centsDf, 0.4)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val tight = SemDedup.semanticDedup(cat.embeddings, centsDf, 0.6)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(tight.subsetOf(loose))
  }

  test("importanceWeights equals the add-one unigram reference") {
    val raw = cat.documents.filter(col("source") =!= "src0")
    val target = cat.documents.filter(col("source") === "src0")
    def toks(text: String): Seq[String] = text.split(" ", -1).filter(_.nonEmpty).toSeq
    val rawDocs = raw.select("doc_id", "text").collect()
      .map(r => (r.getLong(0), toks(r.getString(1))))
    val tgtToks = target.select("text").collect().flatMap(r => toks(r.getString(0)))
    val cr = rawDocs.flatMap(_._2).groupBy(identity).map { case (w, o) => w -> o.length.toLong }
    val ct = tgtToks.groupBy(identity).map { case (w, o) => w -> o.length.toLong }
    val vocab = cr.keySet ++ ct.keySet
    val (v, r, t) = (vocab.size.toLong, cr.values.sum, ct.values.sum)
    def lr(w: String): Double =
      math.log((ct.getOrElse(w, 0L) + 1).toDouble / (t + v)) -
        math.log((cr.getOrElse(w, 0L) + 1).toDouble / (r + v))
    val want = rawDocs.filter(_._2.nonEmpty).map { case (id, ws) =>
      (id, ws.size.toLong, ws.map(lr).sum / ws.size)
    }.sortBy(_._1)
    val got = Dsir.importanceWeights(raw, target)
      .collect().map(r2 => (r2.getLong(0), r2.getLong(1), r2.getDouble(2)))
    assert(got.length == want.length)
    got.zip(want).foreach { case ((gi, gn, gw), (wi, wn, ww)) =>
      assert(gi == wi && gn == wn)
      // engine emits ROUND(avg, 6); the reference is unrounded — allow
      // the rounding half-ulp plus float-order slack
      assert(math.abs(gw - ww) < 5.01e-7, s"doc $gi weight $gw vs $ww")
    }
  }

  test("importanceWeights ranks a target-like document above a raw-only one") {
    val s = spark
    import s.implicits._
    val target = Seq((100L, "alpha alpha beta alpha")).toDF("doc_id", "text")
    val raw = Seq(
      (1L, "alpha beta alpha alpha"), // looks like the target
      (2L, "gamma delta gamma delta") // target never saw these words
    ).toDF("doc_id", "text")
    val w = Dsir.importanceWeights(raw, target)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(w(1L) > w(2L), s"target-like ${w(1L)} should beat raw-only ${w(2L)}")
    assert(w(1L) > 0 && w(2L) < 0)
  }
}
