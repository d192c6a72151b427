package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.vector.{Ann, Ivf, Pq}

/** Product-quantization + margin-mining properties:
  *   - encode maps a vector sitting ON a centroid to that centroid's
  *     cid in every subspace, and its ADC distance to itself is 0;
  *   - adcTopK equals a driver-side reference ADC (same codebook and
  *     codes, lut + left-to-right fold re-done in plain Scala);
  *   - on planted-cluster data PQ recall@k is 1.0 for every query —
  *     and on the unstructured corpus the recall REPORT (X105) is the
  *     honest low number, which is exactly what the audit is for;
  *   - ivfAdcTopK at nProbe = nLists degenerates to adcTopK exactly;
  *   - recallAtK arithmetic on hand-built frames (including a
  *     zero-hit query);
  *   - marginMinedPairs mines the planted aligned pair, rejects
  *     unaligned vectors, and matches a driver-side margin reference.
  */
class PqSpec extends SparkSpec {

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private val dim = 16
  private val m = 4
  private val dsub = dim / m
  private val ks = 4

  /** Deterministic pseudo-random unit vector (no RNG — repo rule). */
  private def unitVec(seed: Long): Array[Float] = {
    val raw = Array.tabulate(dim) { i =>
      // xorshift-style integer mix, then map to [-1, 1]
      var x = seed * 6364136223846793005L + i * 1442695040888963407L
      x ^= x >>> 33; x *= -49064778989728563L; x ^= x >>> 33
      ((x.toDouble / Long.MaxValue)).toFloat
    }
    val n = math.sqrt(raw.map(v => v.toDouble * v).sum).toFloat
    raw.map(v => v / n)
  }

  private def vecsDf(rows: Seq[(Long, Array[Float])]): DataFrame =
    spark.createDataFrame(
      java.util.Arrays.asList(rows.map { case (id, v) => Row(id, v) }: _*),
      StructType(Seq(
        StructField("vec_id", LongType),
        StructField("embedding", ArrayType(FloatType)))))

  /** 4 well-separated cluster prototypes + `per` members each, tiny
    * deterministic perturbation so members stay nearest their own
    * prototype under any reasonable quantizer.
    */
  private def clustered(per: Int): (DataFrame, Map[Long, Long]) = {
    val protos = (0 until 4).map { c =>
      Array.tabulate(dim)(i => if (i % 4 == c) 1.0f else 0.0f)
    }
    val rows = for {
      c <- 0 until 4
      j <- 0 until per
    } yield {
      val id = (c * per + j).toLong
      val v = protos(c).clone()
      v(c) = v(c) + 0.01f * j // tiny, keeps cluster order stable
      (id, v)
    }
    (vecsDf(rows), rows.map { case (id, _) => id -> (id / per) }.toMap)
  }

  /** Hand-built codebook: in every subspace, centroid `cid` is the
    * standard basis vector e_cid — exact, trainer-independent ground
    * truth for encode/ADC mechanics.
    */
  private def basisCodebook: DataFrame = {
    val rows = for {
      sub <- 0 until m
      cid <- 0 until ks
    } yield Row(sub, cid,
      Array.tabulate(dsub)(i => if (i == cid) 1.0f else 0.0f))
    spark.createDataFrame(
      java.util.Arrays.asList(rows: _*),
      StructType(Seq(
        StructField("sub", IntegerType), StructField("cid", IntegerType),
        StructField("centroid", ArrayType(FloatType)))))
  }

  test("PQ encode: a vector equal to a centroid codes to it; self-ADC distance is 0") {
    val (df, _) = clustered(per = 5)
    val cb = Pq.trainCodebooks(df, m, ks, iters = 2, dim = dim)
    val codes = Pq.encode(df, cb, dsub)
    assert(codes.count() == 20)
    // every codes array has m entries in [0, ks)
    val bad = codes.filter(size(col("codes")) =!= m ||
      exists(col("codes"), c => c < 0 || c >= ks)).count()
    assert(bad == 0)
    // a query that IS a stored vector returns every other vector
    val q = df.filter(col("vec_id") === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val top = Pq.adcTopK(codes, cb, q, k = 19, dsub = dsub).collect()
    assert(top.length == 19)

    // the two advertised mechanics, pinned against the exact basis
    // codebook: a vector assembled from subspace centroids (1,3,0,2)
    // codes to EXACTLY those cids, and a query equal to that vector
    // has ADC distance 0.0 to it (its own lut cells are all zero)
    val pattern = Seq(1, 3, 0, 2)
    val onCentroids = pattern.zipWithIndex.flatMap { case (cid, _) =>
      Array.tabulate(dsub)(i => if (i == cid) 1.0f else 0.0f)
    }.toArray
    val one = vecsDf(Seq((999L, onCentroids)))
    val cbBasis = basisCodebook
    val got = Pq.encode(one, cbBasis, dsub)
      .select("codes").first().getSeq[Int](0).toSeq
    assert(got == pattern, s"centroid-equal vector coded $got, want $pattern")
    val selfQ = spark.createDataFrame(
      java.util.Arrays.asList(Row(-1L, onCentroids)),
      StructType(Seq(StructField("query_id", LongType),
        StructField("qvec", ArrayType(FloatType)))))
    val d = Pq.adcTopK(Pq.encode(one, cbBasis, dsub), cbBasis, selfQ,
      k = 1, dsub = dsub).first()
    assert(d.getLong(1) == 999L && d.getDouble(2) == 0.0,
      s"self-ADC distance must be exactly 0, got $d")
  }

  test("native encode kernel ≡ certified HOF twin — trained, residual, ragged, null-element fixtures") {
    def codesOf(enc: DataFrame): Map[Long, Seq[Any]] =
      enc.select("vec_id", "codes").collect()
        .map(r => r.getLong(0) ->
          (if (r.isNullAt(1)) null else r.getSeq[Any](1).toSeq)).toMap

    // 1) the production shape: trained codebook over the clustered
    //    corpus — bitwise-identical codes
    val (df, _) = clustered(per = 5)
    val cb = Pq.trainCodebooks(df, m, ks, iters = 2, dim = dim)
    assert(codesOf(Pq.encode(df, cb, dsub)) ==
      codesOf(Pq.encodeHof(df, cb, dsub)))

    // 2) a residual frame: the extra list_id column passes through both
    val cents = Ivf.centroids(df, nLists = 2)
    val res = Pq.residualVectors(df, cents)
    val kern = Pq.encode(res, cb, dsub)
      .select("vec_id", "list_id", "codes").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Any](2).toSeq)).toSeq.sortBy(_._1)
    val hof = Pq.encodeHof(res, cb, dsub)
      .select("vec_id", "list_id", "codes").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Any](2).toSeq)).toSeq.sortBy(_._1)
    assert(kern == hof)

    // 3) adversarial shapes against the exact basis codebook: a ragged
    //    embedding (last subspace's slice is short → every d2 NULL →
    //    nulls-first argmin), a too-long embedding (extra tail ignored),
    //    and a null ELEMENT (poisons its subspace's distances) — the
    //    kernel must reproduce the HOF's null semantics exactly
    val nullable = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType, containsNull = true))))
    val weird = spark.createDataFrame(
      java.util.Arrays.asList(
        Row(1L, Seq.tabulate(13)(i => java.lang.Float.valueOf(i * 0.1f))),
        Row(2L, Seq.tabulate(20)(i => java.lang.Float.valueOf(i * 0.1f))),
        Row(3L, Seq.tabulate(dim)(i =>
          if (i == 5) null else java.lang.Float.valueOf(i * 0.1f))),
        Row(4L, Seq.empty[java.lang.Float]),
        Row(5L, null)),
      nullable)
    val k3 = codesOf(Pq.encode(weird, basisCodebook, dsub))
    val h3 = codesOf(Pq.encodeHof(weird, basisCodebook, dsub))
    assert(k3 == h3, s"adversarial mismatch:\n$k3\nvs\n$h3")
    // and the fixtures actually exercised the null paths: the ragged
    // row's last code fell back to the nulls-first winner (cid 0)
    assert(k3(1L).last == 0)
  }

  test("encode kernel ≡ HOF on hand-built codebooks: negative sub (from-end slice), null cents element, start-0 parity") {
    import graft.functions.VectorFunctions.dot
    val d2 = 2 // dsub for these fixtures
    val centsType = ArrayType(StructType(Seq(
      StructField("cid", IntegerType),
      StructField("centroid", ArrayType(FloatType)))), containsNull = true)
    val cbType = ArrayType(StructType(Seq(
      StructField("sub", IntegerType),
      StructField("cents", centsType))), containsNull = true)
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("embedding", ArrayType(FloatType)),
      StructField("cb", cbType)))
    def cent(cid: Int, v: Float*) = Row(cid, v.toArray)
    val emb = Array(1.0f, 2.0f, 3.0f, 4.0f)
    val rows = java.util.Arrays.asList(
      // sub 0 valid; sub -1 → slice start −1 = the LAST element, a
      // length-1 slice matching the length-1 centroids — a REAL
      // from-end argmin over non-null distances
      Row(1L, emb, Seq(
        Row(0, Seq(cent(0, 1.0f, 2.0f), cent(1, 9.0f, 9.0f))),
        Row(-1, Seq(cent(0, 9.5f), cent(1, 4.25f))))),
      // a NULL cents element: the HOF's transform maps it to
      // struct(null, null), which wins the nulls-first argmin → NULL code
      Row(2L, emb, Seq(
        Row(0, Seq(null, cent(7, 1.0f, 2.0f))))),
      // sub so negative the from-end start falls off the front → empty
      // slice → every d2 null → nulls-first winner by cid
      Row(3L, emb, Seq(
        Row(-9, Seq(cent(3, 1.0f, 2.0f), cent(5, 0.0f, 0.0f))))))
    val df = spark.createDataFrame(rows, schema)
    def sq(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      dot(a, a) - lit(2.0) * dot(a, b) + dot(b, b)
    def hofCol(ds: Int) = transform(col("cb"), sc =>
      array_min(transform(sc("cents"), c =>
        struct(
          sq(slice(col("embedding"), sc("sub") * lit(ds) + lit(1), lit(ds)),
            c("centroid")).as("d2"),
          c("cid").as("cid"))))("cid"))
    def kernCol(ds: Int) = org.apache.spark.sql.GraftColumnBridge.column(
      graft.functions.PqEncode(
        org.apache.spark.sql.GraftColumnBridge.expression(col("embedding")),
        org.apache.spark.sql.GraftColumnBridge.expression(col("cb")), ds))
    val got = df.select(col("id"), kernCol(d2).as("k"), hofCol(d2).as("h"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Any](1).toSeq, r.getSeq[Any](2).toSeq))
    got.foreach { case (id, k, h) =>
      assert(k == h, s"row $id: kernel $k != HOF $h")
    }
    val byId = got.map(t => t._1 -> t._2).toMap
    // the from-end slice [4.0] really ranked: 4.25 beats 9.5, and the
    // length-2 centroid's null d2 did NOT win
    assert(byId(1L) == Seq(0, 1), s"from-end argmin wrong: ${byId(1L)}")
    assert(byId(2L) == Seq(null), "null cents element must win nulls-first → NULL code")
    assert(byId(3L) == Seq(3), "off-the-front slice → all-null d2 → min cid")
    // start 0 (dsub=1, sub=-1) fails loudly in BOTH forms (ANSI slice)
    val zero = spark.createDataFrame(java.util.Arrays.asList(
      Row(9L, emb, Seq(Row(-1, Seq(cent(0, 1.0f)))))), schema)
    intercept[Exception] { zero.select(kernCol(1)).collect() }
    intercept[Exception] { zero.select(hofCol(1)).collect() }
  }

  test("rerankExact: all-candidates shortlist degenerates to exactL2TopK; recall ≥ first stage and → 1 as R grows") {
    val df = vecsDf((0L until 40L).map(i => (i, unitVec(i))))
    val q = df.filter(col("vec_id") < 3)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val exact = Pq.exactL2TopK(df, q, k = 5)
    def rows(d: DataFrame): Seq[(Long, Long, Double)] =
      d.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .toSeq.sortBy(t => (t._1, t._3, t._2))

    // degeneration: shortlist = every (query, candidate) pair → the
    // re-rank IS the exact scan
    val all = q.select("query_id")
      .crossJoin(df.select("vec_id"))
      .filter(col("query_id") =!= col("vec_id"))
    assert(rows(Pq.rerankExact(all, q, df, k = 5)) == rows(exact))

    // two-stage recall on the hard (unstructured) corpus: strictly not
    // worse than the compressed first stage at every R, and the R=corpus
    // shortlist reaches recall 1.0
    val cb = Pq.trainCodebooks(df, m, ks, iters = 2, dim = dim)
    val codes = Pq.encode(df, cb, dsub)
    def avgRecall(approx: DataFrame): Double =
      Pq.recallAtK(approx, exact).agg(avg("recall")).first().getDouble(0)
    val stage1 = avgRecall(Pq.adcTopK(codes, cb, q, k = 5, dsub = dsub))
    val rr10 = avgRecall(Pq.rerankExact(
      Pq.adcTopK(codes, cb, q, k = 10, dsub = dsub), q, df, k = 5))
    val rrAll = avgRecall(Pq.rerankExact(
      Pq.adcTopK(codes, cb, q, k = 39, dsub = dsub), q, df, k = 5))
    assert(rr10 >= stage1,
      s"rerank of a 10-candidate shortlist ($rr10) must not lose to the ADC head ($stage1)")
    assert(rrAll == 1.0, s"all-candidates rerank must reach recall 1.0, got $rrAll")
    // non-vacuous on this corpus: the compressed stage alone is imperfect
    assert(stage1 < 1.0, "fixture should have imperfect ADC recall")
  }

  test("native ADC fold kernel ≡ certified HOF twin — valid, ragged, null and negative-code fixtures") {
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("codes", ArrayType(IntegerType, containsNull = true)),
      StructField("luts", ArrayType(
        ArrayType(DoubleType, containsNull = true), containsNull = true))))
    val lut2 = Seq(Seq(1.5, 2.5, 3.5), Seq(10.0, 20.0, 30.0))
    val rows = java.util.Arrays.asList(
      Row(1L, Seq(0, 2), lut2),                       // valid: 1.5 + 30.0
      Row(2L, Seq(-2, -4), lut2),                     // negative codes: element_at from-end (idx −1→3.5, idx −3→10.0)
      Row(3L, Seq(0, 2, 1), lut2),                    // codes longer: pad → null
      Row(4L, Seq(0), lut2),                          // codes shorter: pad → null
      Row(5L, Seq(null, 2), lut2),                    // null code → null
      Row(6L, Seq(0, 2), Seq(Seq(1.5, null, 3.5), Seq(10.0, 20.0, 30.0))), // null cell untouched: still 1.5+30
      Row(7L, Seq(1, 1), Seq(Seq(1.5, null, 3.5), Seq(10.0, 20.0, 30.0))), // null cell selected → null
      Row(8L, null, lut2),                            // null codes → null
      Row(9L, Seq(0, 2), null),                       // null luts → null
      Row(10L, Seq(0, 2), Seq(null, Seq(10.0, 20.0, 30.0)))) // null lut row → null
    val df = spark.createDataFrame(rows, schema)
    val kern = org.apache.spark.sql.GraftColumnBridge.column(
      graft.functions.AdcSum(
        org.apache.spark.sql.GraftColumnBridge.expression(col("codes")),
        org.apache.spark.sql.GraftColumnBridge.expression(col("luts"))))
    val got = df.select(col("id"), kern.as("v"),
        Pq.adcFoldHof(col("codes"), col("luts")).as("w"))
      .collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) null else r.getDouble(1),
        if (r.isNullAt(2)) null else r.getDouble(2)))
    got.foreach { case (id, v, w) =>
      assert(v == w, s"row $id: kernel $v != HOF $w")
    }
    // the fixtures actually exercised both verdicts
    val byId = got.map(t => t._1 -> t._2).toMap
    assert(byId(1L) == 31.5 && byId(6L) == 31.5 && byId(2L) == 13.5)
    assert(Seq(3L, 4L, 5L, 7L, 10L).forall(byId(_) == null))
    // a code of -1 (element_at index 0) fails loudly in both forms
    val bad = spark.createDataFrame(
      java.util.Arrays.asList(Row(0L, Seq(-1, 0), lut2)), schema)
    intercept[Exception] {
      bad.select(kern).collect()
    }
    intercept[Exception] {
      bad.select(Pq.adcFoldHof(col("codes"), col("luts"))).collect()
    }
  }

  test("codes compaction: a crash injected at every swap window recovers on retry — no lost or double-folded codes") {
    val (df, _) = clustered(per = 5)
    val a = df.filter(col("vec_id") % 2 === 0)
    val b = df.filter(col("vec_id") % 2 === 1)
    val q = df.filter(col("vec_id") < 2)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    for (fp <- Seq("after-stage", "after-swap-out", "after-swap-in")) {
      val dir = tmp(s"graft-pq-crash-$fp")
      Pq.writeIndex(a, dir, m = m, ks = ks, iters = 2, dim = dim)
      val cb = spark.read.parquet(s"$dir/codebook")
      // one completed streaming-shaped delta: the odd half's codes
      Pq.encode(b, cb, dsub).write.parquet(s"$dir/codes_delta/b0")
      val want = Pq.adcTopK(
          Pq.encode(df, cb, dsub), cb, q, k = 5, dsub = dsub)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
      val ex = intercept[IllegalStateException] {
        Pq.compactCodes(spark, dir, failpoint = fp)
      }
      assert(ex.getMessage.contains(fp))
      // the RETRY must self-recover: fold exactly once, clean staging
      Pq.compactCodes(spark, dir)
      for (leftover <- Seq("codes.next", "codes.old", "codes_delta/b0",
          "codes/_FOLDED_DELTAS"))
        assert(!new java.io.File(s"$dir/$leftover").exists(),
          s"[$fp] $leftover must be gone after recovery")
      val folded = spark.read.parquet(s"$dir/codes")
      assert(folded.count() == df.count(), s"[$fp] row count after recovery")
      assert(folded.select("vec_id").distinct().count() == df.count(),
        s"[$fp] no codes row may be folded twice")
      val got = Pq.adcTopK(folded, cb, q, k = 5, dsub = dsub)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
      assert(got == want, s"[$fp] ADC over recovered base diverged")
    }
  }

  test("adcTopK equals a driver-side reference ADC over the same artifact") {
    val (df, _) = clustered(per = 5)
    val cb = Pq.trainCodebooks(df, m, ks, iters = 2, dim = dim)
    val codes = Pq.encode(df, cb, dsub)
    val q = df.filter(col("vec_id") < 2)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))

    val got = Pq.adcTopK(codes, cb, q, k = 5, dsub = dsub)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq

    // driver-side reference: same lut formula (|q|^2 - 2 q.c + |c|^2,
    // left-to-right double sums), same fold, same (rounded, id) sort
    val cbm = cb.collect().map { r =>
      (r.getInt(0), r.getInt(1)) -> r.getSeq[Float](2).toArray
    }.toMap
    val codesM = codes.collect().map { r =>
      r.getLong(0) -> r.getSeq[Int](1).toArray
    }.toMap
    val qs = q.collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    def ip(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
      s
    }
    val want = qs.flatMap { case (qid, qv) =>
      val lut = cbm.map { case ((sub, cid), cent) =>
        val qsub = qv.slice(sub * dsub, sub * dsub + dsub)
        (sub, cid) -> (ip(qsub, qsub) - 2.0 * ip(qsub, cent) + ip(cent, cent))
      }
      codesM.toSeq.filter(_._1 != qid).map { case (vid, cd) =>
        val d2 = cd.zipWithIndex.foldLeft(0.0) { case (s, (c, sub)) =>
          s + lut((sub, c))
        }
        (qid, vid, BigDecimal(d2).setScale(6, BigDecimal.RoundingMode.HALF_UP)
          .toDouble)
      }.sortBy { case (_, vid, d) => (d, vid) }.take(5)
    }.sortBy { case (qid, vid, d) => (qid, d, vid) }.toSeq
    assert(got == want)
  }

  test("planted clusters: PQ recall@k is 1.0 per query; ivfPq at full probe = adcTopK") {
    // hand-built codebook = the 4 prototype patterns' subvectors (the
    // test pins ADC/recall MECHANICS, independent of trainer seeding;
    // trainer quality has its own tests above)
    val (df, _) = clustered(per = 6) // 24 vectors, 4 clean clusters
    val cb = basisCodebook
    val codes = Pq.encode(df, cb, dsub)
    val q = df.filter(col("vec_id").isin(0L, 6L, 12L, 18L))
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val approx = Pq.adcTopK(codes, cb, q, k = 4, dsub = dsub)
    val exact = Pq.exactL2TopK(df, q, k = 4)
    val rec = Pq.recallAtK(approx, exact).collect()
    assert(rec.length == 4)
    rec.foreach { r =>
      assert(r.getDouble(3) == 1.0,
        s"query ${r.getLong(0)} recall ${r.getDouble(3)} != 1.0 on planted clusters")
    }
    // IVF+PQ with nProbe = nLists is exactly the brute ADC scan; the
    // coarse centroids are the prototypes themselves, so each cluster
    // is its own list
    val protos = (0 until 4).map { c =>
      Row(c.toLong, Array.tabulate(dim)(i => if (i % 4 == c) 1.0f else 0.0f))
    }
    val cents = spark.createDataFrame(
      java.util.Arrays.asList(protos: _*),
      StructType(Seq(
        StructField("centroid_id", LongType),
        StructField("centroid", ArrayType(FloatType)))))
    val full = Pq.ivfAdcTopK(df, codes, cb, cents, q, k = 4, nProbe = 4,
      dsub = dsub).collect().toSeq
    assert(full == approx.collect().toSeq)
    // a 1-list probe scans only the query's own cluster — recall
    // stays 1.0 because the exact top-4 live in that cluster
    val narrow = Pq.ivfAdcTopK(df, codes, cb, cents, q, k = 4, nProbe = 1,
      dsub = dsub)
    val hits = Pq.recallAtK(narrow, exact).collect()
    hits.foreach(r => assert(r.getDouble(3) == 1.0))
  }

  test("recallAtK arithmetic on hand-built frames, including a zero-hit query") {
    def pairs(rows: Seq[(Long, Long)]): DataFrame =
      spark.createDataFrame(
        java.util.Arrays.asList(rows.map { case (q, v) => Row(q, v) }: _*),
        StructType(Seq(StructField("query_id", LongType),
          StructField("vec_id", LongType))))
    val exact = pairs(Seq((1L, 10L), (1L, 11L), (2L, 20L), (2L, 21L)))
    val approx = pairs(Seq((1L, 10L), (1L, 99L), (2L, 98L), (2L, 99L)))
    val got = Pq.recallAtK(approx, exact).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSeq
    assert(got == Seq((1L, 1L, 2L, 0.5), (2L, 0L, 2L, 0.0)))
    // a query that only EXACT has (approx found nothing) is an honest
    // recall-0 row, not an error
    val sparse = Pq.recallAtK(pairs(Seq((1L, 10L))), exact).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSeq
    assert(sparse == Seq((1L, 1L, 2L, 0.5), (2L, 0L, 2L, 0.0)))
    // ...but a query APPROX has with an EMPTY exact ground-truth set
    // must fail loud at execution: the baseline was mis-built, and a
    // curve aggregated over the surviving rows would read healthy
    val e1 = intercept[Exception] {
      Pq.recallAtK(pairs(Seq((1L, 10L), (3L, 30L))), exact).collect()
    }
    assert(e1.getMessage.contains("EMPTY exact ground-truth"),
      s"wrong failure: ${e1.getMessage}")
    // the fully-vacuous case (exact baseline empty) fails the same way
    // instead of returning an empty recall table
    val e2 = intercept[Exception] {
      Pq.recallAtK(approx, pairs(Seq.empty)).collect()
    }
    assert(e2.getMessage.contains("EMPTY exact ground-truth"),
      s"wrong failure: ${e2.getMessage}")
  }

  test("writeIndex round-trips: stored codebook/codes reproduce the live ADC result") {
    val (df, _) = clustered(per = 5)
    val path = tmp("graft_pq_idx")
    Pq.writeIndex(df, path, m = m, ks = ks, iters = 2, dim = dim)
    val cb = spark.read.parquet(s"$path/codebook")
    val codes = spark.read.parquet(s"$path/codes")
    assert(cb.count() == m * ks && codes.count() == 20)
    val q = df.filter(col("vec_id") === 3)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    // the stored-artifact scan is the declared X104 shape — just pin
    // it is non-empty and correctly ranked (ascending rounded d2)
    val rows = Pq.adcTopK(codes, cb, q, k = 10, dsub = dsub)
      .collect().map(_.getDouble(2)).toSeq
    assert(rows.nonEmpty && rows == rows.sorted)
  }

  test("residual IVFADC with a single zero coarse centroid degenerates to plain ADC exactly") {
    // residual against the origin IS the vector (float sub is exact),
    // and the residual query q − 0 cast to double multiplies out to
    // the same left-to-right products as the float-dot lut — so with
    // one zero centroid the whole residual pipeline must reproduce
    // adcTopK bit-for-bit (codes AND distances), pinned on the exact
    // basis codebook so the property is trainer-independent
    val (df, _) = clustered(per = 5)
    val zeroCents = spark.createDataFrame(
      java.util.Arrays.asList(Row(0L, Array.fill(dim)(0.0f))),
      StructType(Seq(
        StructField("centroid_id", LongType),
        StructField("centroid", ArrayType(FloatType)))))
    val cb = basisCodebook
    val plainCodes = Pq.encode(df, cb, dsub)
    val resCodes = Pq.encode(Pq.residualVectors(df, zeroCents), cb, dsub)
    assert(resCodes.select("vec_id", "codes").collect()
        .map(r => (r.getLong(0), r.getSeq[Int](1).toSeq)).sortBy(_._1).toSeq ==
      plainCodes.select("vec_id", "codes").collect()
        .map(r => (r.getLong(0), r.getSeq[Int](1).toSeq)).sortBy(_._1).toSeq,
      "zero-centroid residual codes must equal plain codes")
    val q = df.filter(col("vec_id") < 2)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val plain = Pq.adcTopK(plainCodes, cb, q, k = 5, dsub = dsub)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val res = Pq.ivfAdcResidualTopK(resCodes, cb, zeroCents, q, k = 5,
        nProbe = 1, dsub = dsub)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(res == plain, s"degenerate residual ADC diverged:\n$res\nvs\n$plain")
  }

  test("residual encoding strictly improves recall on off-origin clusters at equal m/ks") {
    // the IVFADC motivation made measurable: clusters whose CENTERS
    // dominate the signal (norm ≫ intra-cluster spread). Plain PQ must
    // spend its ks cells covering the center geometry and collapses
    // same-cluster members onto one code (ADC can no longer rank
    // within the cluster); residual PQ quantizes only the member
    // spread after the coarse centroid explains the center — the same
    // m·ks budget buys intra-cluster resolution.
    val protos = (0 until 4).map { c =>
      Array.tabulate(dim)(i => if (i % 4 == c) 10.0f else 0.0f)
    }
    val per = 6
    val rows = for {
      c <- 0 until 4
      j <- 0 until per
    } yield {
      val id = (c * per + j).toLong
      val v = protos(c).clone()
      // deterministic member spread across SEVERAL dims so the exact
      // within-cluster ranking is informative
      (0 until dim).foreach(i => v(i) = v(i) + 0.05f * (((id + i) % 5) - 2))
      (id, v)
    }
    val df = vecsDf(rows)
    val cents = spark.createDataFrame(
      java.util.Arrays.asList(protos.zipWithIndex.map { case (p, c) =>
        Row(c.toLong, p)
      }: _*),
      StructType(Seq(
        StructField("centroid_id", LongType),
        StructField("centroid", ArrayType(FloatType)))))
    val q = df.filter(col("vec_id").isin(0L, 6L, 12L, 18L))
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val exact = Pq.exactL2TopK(df, q, k = 4)

    val cbPlain = Pq.trainCodebooks(df, m, ks, iters = 3, dim = dim)
    val plainRec = Pq.recallAtK(
        Pq.adcTopK(Pq.encode(df, cbPlain, dsub), cbPlain, q, k = 4, dsub = dsub),
        exact)
      .agg(avg("recall")).first().getDouble(0)

    val cbRes = Pq.trainResidualCodebooks(df, cents, m, ks, iters = 3, dim = dim)
    val resCodes = Pq.encode(Pq.residualVectors(df, cents), cbRes, dsub)
    val resRec = Pq.recallAtK(
        Pq.ivfAdcResidualTopK(resCodes, cbRes, cents, q, k = 4, nProbe = 4,
          dsub = dsub),
        exact)
      .agg(avg("recall")).first().getDouble(0)
    assert(resRec > plainRec,
      s"residual recall $resRec must strictly beat plain recall $plainRec at equal m/ks")
  }

  test("ivfAdcServe: adaptive shortlist is monotone in nProbe and dominates fixed-R at every probe budget") {
    // policy arithmetic (the exact values the X113 oracle restates as
    // GREATEST(50, 16·p))
    assert(Seq(1, 2, 4, 8, 16).map(Pq.adaptiveShortlist(_))
      == Seq(50, 50, 64, 128, 256))
    intercept[IllegalArgumentException](Pq.adaptiveShortlist(0))

    // unstructured corpus — the regime where a fixed shortlist floods:
    // every extra probed list contributes candidates whose ADC distance
    // underestimates the truth, and with R fixed they evict true
    // neighbors from the head before the exact re-rank sees them
    val df = vecsDf((0L until 400L).map(i => (i, unitVec(i))))
    val cents = Ivf.refineCentroidsL2(df, Ivf.centroids(df, 8), iters = 3, dim = dim)
    val cb = Pq.trainResidualCodebooks(df, cents, m, ks, iters = 2, dim = dim)
    val codes = Pq.encode(Pq.residualVectors(df, cents), cb, dsub)
    val q = df.filter(col("vec_id") < 4)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val exact = Pq.exactL2TopK(df, q, k = 4)
    def avgRecall(d: DataFrame): Double =
      Pq.recallAtK(d, exact).agg(avg("recall")).first().getDouble(0)
    // rMin/rPerProbe scaled to the 400-row fixture (the production 50/16
    // defaults would cover most of it and make the comparison vacuous)
    val budgets = Seq(1, 2, 4, 8)
    val curve = budgets.map { p =>
      val fixed = avgRecall(Pq.rerankExact(
        Pq.ivfAdcResidualTopK(codes, cb, cents, q, k = 4, nProbe = p, dsub = dsub),
        q, df, k = 4))
      val auto = avgRecall(Pq.ivfAdcServe(codes, cb, cents, q, df,
        k = 4, nProbe = p, dsub = dsub, rPerProbe = 4, rMin = 4))
      (p, fixed, auto)
    }
    curve.foreach { case (p, fixed, auto) =>
      assert(auto >= fixed,
        s"auto shortlist must not lose to fixed at nProbe=$p: $auto vs $fixed")
    }
    curve.sliding(2).foreach { case Seq((p1, _, a1), (p2, _, a2)) =>
      assert(a2 >= a1,
        s"auto-policy recall must be monotone in nProbe: $a1@$p1 > $a2@$p2")
    }
    // non-vacuous: the fixed policy actually floods on this fixture
    assert(curve.exists { case (_, fixed, auto) => auto > fixed },
      "fixture must exhibit at least one budget where the adaptive policy strictly wins")

    // composition identity: the serve facade IS
    // rerank(ivfAdcResidualTopK(k = adaptiveShortlist)) bit-for-bit
    def rows(d: DataFrame): Seq[(Long, Long, Double)] =
      d.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val p = 4
    assert(rows(Pq.ivfAdcServe(codes, cb, cents, q, df,
        k = 4, nProbe = p, dsub = dsub, rPerProbe = 4, rMin = 4))
      == rows(Pq.rerankExact(
        Pq.ivfAdcResidualTopK(codes, cb, cents, q,
          k = Pq.adaptiveShortlist(p, rPerProbe = 4, rMin = 4),
          nProbe = p, dsub = dsub),
        q, df, k = 4)))
  }

  test("recall-targeted serve: cheapest budget per target, honest fallback, serve ≡ composition at the chosen budget") {
    // chooseProbeBudget on a hand-built curve — the pure decision rule
    val curve = spark.createDataFrame(
      java.util.Arrays.asList(
        Row(1, 50, 3L, 15L, 0.2), Row(2, 50, 6L, 15L, 0.4),
        Row(4, 64, 10L, 15L, 0.666667), Row(8, 128, 15L, 15L, 1.0)),
      StructType(Seq(
        StructField("nprobe", IntegerType),
        StructField("shortlist", IntegerType),
        StructField("n_hit", LongType),
        StructField("n_exact", LongType),
        StructField("recall", DoubleType))))
    val picked = Pq.chooseProbeBudget(curve, Seq(0.1, 0.4, 0.5, 0.95))
      .collect().map(r => (r.getDouble(0), r.getInt(1), r.getInt(2), r.getDouble(3)))
    assert(picked.toSeq == Seq(
      (0.1, 1, 50, 0.2),        // cheapest budget meets a low target
      (0.4, 2, 50, 0.4),        // boundary: recall == target qualifies
      (0.5, 4, 64, 0.666667),   // first budget past the target
      (0.95, 8, 128, 1.0)))     // top of the curve
    // fallback: an unreachable target serves at the LARGEST calibrated
    // budget and reports the honest shortfall
    val fb = Pq.chooseProbeBudget(
      curve.filter(col("nprobe") <= 4), Seq(0.99)).first()
    assert(fb.getInt(1) == 4 && fb.getDouble(3) == 0.666667)
    // monotone: a higher target never chooses a smaller budget
    val mono = Pq.chooseProbeBudget(curve, Seq(0.1, 0.3, 0.6, 0.9, 1.0))
      .collect().map(_.getInt(1)).toSeq
    assert(mono == mono.sorted, s"chosen budgets must be monotone: $mono")
    intercept[IllegalArgumentException](Pq.chooseProbeBudget(curve, Seq(1.5)))
    intercept[IllegalArgumentException](Pq.chooseProbeBudget(curve, Seq.empty))
    // a caller-supplied curve with a NULL recall row fails loud — NULL
    // never satisfies recall >= target, so that budget would be
    // silently unselectable and the fallback could pick an unmeasured one
    val holed = curve.withColumn("recall",
      when(col("nprobe") === 4, lit(null).cast(DoubleType)).otherwise(col("recall")))
    val err = intercept[IllegalArgumentException](
      Pq.chooseProbeBudget(holed, Seq(0.5)))
    assert(err.getMessage.contains("NULL recall"), err.getMessage)

    // measured curve on the unstructured fixture: micro arithmetic is
    // Σ hits / Σ exact of the per-budget recall report, one row per
    // distinct budget, ascending
    val df = vecsDf((0L until 400L).map(i => (i, unitVec(i))))
    val cents = Ivf.refineCentroidsL2(df, Ivf.centroids(df, 8), iters = 3, dim = dim)
    val cb2 = Pq.trainResidualCodebooks(df, cents, m, ks, iters = 2, dim = dim)
    val codes = Pq.encode(Pq.residualVectors(df, cents), cb2, dsub)
    val q = df.filter(col("vec_id") < 4)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val budgets = Seq(4, 1, 2, 4) // dup + unsorted on purpose
    val measured = Pq.probeBudgetCurve(codes, cb2, cents, q, df, k = 4,
      budgets, dsub = dsub, rPerProbe = 4, rMin = 4)
      .collect().map(r => (r.getInt(0), r.getLong(2), r.getLong(3), r.getDouble(4)))
    assert(measured.map(_._1).toSeq == Seq(1, 2, 4))
    val exact = Pq.exactL2TopK(df, q, k = 4)
    measured.foreach { case (p, nHit, nExact, rec) =>
      val rep = Pq.recallAtK(
        Pq.ivfAdcServe(codes, cb2, cents, q, df, k = 4, nProbe = p,
          dsub = dsub, rPerProbe = 4, rMin = 4), exact)
        .agg(sum("n_hit"), sum("n_exact")).first()
      assert(nHit == rep.getLong(0) && nExact == rep.getLong(1),
        s"micro counters diverge at nProbe=$p")
      assert(rec ==
        BigDecimal(nHit.toDouble / nExact).setScale(6,
          BigDecimal.RoundingMode.HALF_UP).toDouble)
      intercept[IllegalArgumentException](
        Pq.probeBudgetCurve(codes, cb2, cents, q, df, 4, Seq.empty, dsub))
    }
    // a degenerate calibration sample (no ground-truth rows) fails
    // loudly at the source instead of propagating NULL recalls
    intercept[IllegalArgumentException](
      Pq.probeBudgetCurve(codes, cb2, cents, q.limit(0), df, 4, Seq(1), dsub))

    // the targeted serve IS ivfAdcServe at the budget the calibration
    // chose, bit-for-bit, and reports that budget's calibrated recall
    val served = Pq.ivfAdcServeAtRecall(codes, cb2, cents, q, q, df,
      k = 4, target = 0.8, budgets = Seq(1, 2, 4, 8), dsub = dsub,
      rPerProbe = 4, rMin = 4)
    val want = Pq.chooseProbeBudget(
      Pq.probeBudgetCurve(codes, cb2, cents, q, df, k = 4,
        Seq(1, 2, 4, 8), dsub = dsub, rPerProbe = 4, rMin = 4),
      Seq(0.8)).first()
    assert(served.nProbe == want.getInt(1)
      && served.shortlist == want.getInt(2)
      && served.expectedRecall == want.getDouble(3))
    def rows3(d: DataFrame): Seq[(Long, Long, Double)] =
      d.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(rows3(served.result) ==
      rows3(Pq.ivfAdcServe(codes, cb2, cents, q, df, k = 4,
        nProbe = served.nProbe, dsub = dsub, rPerProbe = 4, rMin = 4)))
  }

  test("marginMinedPairs: mines the planted aligned pair, matches the driver reference") {
    // side A: 1 vector aligned with a B vector + unaligned noise
    val aligned = unitVec(7L)
    val a = vecsDf(Seq(
      (0L, aligned),
      (1L, unitVec(100L)), (2L, unitVec(200L)), (3L, unitVec(300L)),
      (4L, unitVec(400L))))
    val bAligned = aligned.clone(); bAligned(0) = bAligned(0) + 0.001f
    val b = vecsDf(Seq(
      (10L, bAligned),
      (11L, unitVec(500L)), (12L, unitVec(600L)), (13L, unitVec(700L)),
      (14L, unitVec(800L))))

    val got = Ann.marginMinedPairs(a, b, k = 3, threshold = 1.1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got.contains((0L, 10L)), s"planted pair not mined: $got")

    // driver-side reference of the full margin table (threshold 0):
    // both kNN directions on 6-dp rounded cosines, margin =
    // cos / (avgA/2 + avgB/2)
    val av = a.collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    val bv = b.collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    def ip(x: Array[Float], y: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < x.length) { s += x(i).toDouble * y(i).toDouble; i += 1 }
      s
    }
    def r6(d: Double): Double =
      BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val k = 3
    def topAvg(qs: Seq[(Long, Array[Float])], cs: Seq[(Long, Array[Float])])
        : (Map[Long, Double], Map[Long, (Long, Double)]) = {
      val per = qs.map { case (qid, qv) =>
        val ranked = cs.map { case (cid2, cv) => (cid2, r6(ip(qv, cv))) }
          .sortBy { case (cid2, c) => (-c, cid2) }.take(k)
        (qid, ranked)
      }
      (per.map { case (qid, rk) =>
        qid -> rk.map(_._2).sum / rk.length
      }.toMap,
        per.map { case (qid, rk) => qid -> rk.head }.toMap)
    }
    val (avgA, nn1) = topAvg(av.toSeq, bv.toSeq)
    val (avgB, _) = topAvg(bv.toSeq, av.toSeq)
    val wantAll = av.map { case (i, _) =>
      val (j, cos) = nn1(i)
      (i, j, cos, r6(cos / (avgA(i) / 2 + avgB(j) / 2)))
    }.filter(_._4 >= 1.1).sortBy(t => (t._1, t._2)).toSeq
    val gotAll = Ann.marginMinedPairs(a, b, k = 3, threshold = 1.1)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .toSeq
      .sortBy(t => (t._1, t._2))
    assert(gotAll == wantAll)
  }

  test("multiBudgetServe/Recall: row-identical per branch to the per-budget serve + recall composition") {
    // the shared-scan sweep (one ranked codes pass + one raw-vector
    // re-rank pass) must reproduce EVERY (policy, nProbe, shortlist)
    // branch of the X113-shaped composition bit-for-bit — candidate
    // sets, ADC head, exact re-rank ties, and the per-query recall rows
    val df = vecsDf((0L until 400L).map(i => (i, unitVec(i))))
    val cents = Ivf.refineCentroidsL2(df, Ivf.centroids(df, 8), iters = 3, dim = dim)
    val cb = Pq.trainResidualCodebooks(df, cents, m, ks, iters = 2, dim = dim)
    val codes = Pq.encode(Pq.residualVectors(df, cents), cb, dsub)
    val q = df.filter(col("vec_id") < 4)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val exact = Pq.exactL2TopK(df, q, k = 4)
    val budgets = Seq(1, 2, 4, 8)
    val branches = budgets.flatMap { p =>
      Seq(("fixed", p, 6),
        ("auto", p, Pq.adaptiveShortlist(p, rPerProbe = 4, rMin = 4)))
    }
    val served = Pq.multiBudgetServe(codes, cb, cents, q, df, k = 4,
      branches, dsub)
    val recall = Pq.multiBudgetRecall(served, exact, branches)
    def servedRows(d: DataFrame): Seq[(Long, Long, Double)] =
      d.select("query_id", "vec_id", "d2").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
        .sortBy(t => (t._1, t._3, t._2))
    def recallRows(d: DataFrame): Seq[(Long, Long, Long, Double)] =
      d.select("query_id", "n_hit", "n_exact", "recall").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
        .toSeq.sortBy(_._1)
    branches.foreach { case (pol, p, r) =>
      val one = Pq.rerankExact(
        Pq.ivfAdcResidualTopK(codes, cb, cents, q, k = r, nProbe = p,
          dsub = dsub),
        q, df, k = 4)
      val branch = served.filter(col("policy") === pol &&
        col("nprobe") === p && col("shortlist") === r)
      assert(servedRows(branch) == servedRows(one),
        s"served rows diverge for branch ($pol, $p, $r)")
      val oneRecall = Pq.recallAtK(one, exact)
      val branchRecall = recall.filter(col("policy") === pol &&
        col("nprobe") === p && col("shortlist") === r)
      assert(recallRows(branchRecall) == recallRows(oneRecall),
        s"recall rows diverge for branch ($pol, $p, $r)")
    }
    intercept[IllegalArgumentException](
      Pq.multiBudgetServe(codes, cb, cents, q, df, k = 4, Seq.empty, dsub))
  }
}
