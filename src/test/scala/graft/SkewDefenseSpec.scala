package graft

import org.apache.spark.sql.functions._

import graft.text.{MinHashConfig, MinHashDedup}
import graft.vector.Ann

/** LSH hot-bucket skew defense: a degenerate near-constant corpus sends
  * every document/vector to one (band, bucket) key. Without the cap the
  * candidate self-join is O(m²) in mass and lands on one reducer; with
  * it, oversized buckets degrade to linear candidates: identical-
  * signature groups star to their min id (EXACT for the constant-corpus
  * case), distinct-signature representatives chunk-pair with bounded
  * fan-out, and everything links to the bucket anchor for verification
  * reachability (min-id still wins).
  */
class SkewDefenseSpec extends SparkSpec {

  test("capped pairs: mixed oversized bucket stays linear, identical-sig members stay connected") {
    import spark.implicits._
    // one bucket of 100: ids 0–49 share a signature, 50–99 are distinct
    val members = (0L until 100L)
      .map(id => (id, if (id < 50) 7L else 1000L + id, 0, 11L))
      .toDF("id", "sigh", "band", "bucket")
    val pairs = graft.ops.BucketedPairs.cappedCandidatePairs(members, cap = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // all-pairs would be 4 950; linear bound: (m−G) + G·cap/2 + G with G=51
    assert(pairs.size < 1000, s"candidate mass must stay linear, got ${pairs.size}")
    assert(pairs.forall(p => p._1 < p._2), "pairs must be ordered i < j")
    // tier 1: every identical-signature member pairs with the group min
    assert((1L until 50L).forall(j => pairs.contains((0L, j))),
      "identical-signature members must all connect to their group anchor")
    // tier 3: every id is reachable (appears in some pair)
    val touched = pairs.flatMap(p => Seq(p._1, p._2))
    assert(touched == (0L until 100L).toSet, "every member must reach verification")
  }

  test("capped pairs: small buckets stay exhaustive") {
    import spark.implicits._
    val members = (0L until 5L).map(id => (id, 100L + id, 0, 3L)).toDF("id", "sigh", "band", "bucket")
    val pairs = graft.ops.BucketedPairs.cappedCandidatePairs(members, cap = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == (for { i <- 0L until 5L; j <- i + 1 until 5L } yield (i, j)).toSet)
  }

  test("capped pairs LAW (ScalaCheck): identical-signature connectivity, bucket reachability, linear mass, uncapped exactness") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    import spark.implicits._
    // adversarial member-table generator: up to 60 members concentrated
    // in 1–3 buckets with 1–4 distinct signatures (the near-constant /
    // hash-collision regime the cap exists for), cap down to 2
    val gen = for {
      n <- Gen.choose(2, 60)
      nSigs <- Gen.choose(1, 4)
      nBuckets <- Gen.choose(1, 3)
      sigOf <- Gen.listOfN(n, Gen.choose(0, nSigs - 1))
      bucketOf <- Gen.listOfN(n, Gen.choose(0, nBuckets - 1))
      cap <- Gen.choose(2, 8)
    } yield (n, sigOf.toVector, bucketOf.toVector, cap)
    val prop = Prop.forAll(gen) { case (n, sigOf, bucketOf, cap) =>
      val members = (0 until n)
        .map(id => (id.toLong, 1000L + sigOf(id), 0, bucketOf(id).toLong))
        .toDF("id", "sigh", "band", "bucket")
      val pairs = graft.ops.BucketedPairs.cappedCandidatePairs(members, cap)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      // union-find over the candidate graph
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int = {
        var r = x; while (parent(r) != r) r = parent(r)
        var c = x; while (parent(c) != c) { val nx = parent(c); parent(c) = r; c = nx }
        r
      }
      pairs.foreach { case (i, j) => parent(find(i.toInt)) = find(j.toInt) }
      val byBucket = (0 until n).groupBy(bucketOf)
      // LAW 1 (the recall floor the docs promise): same (bucket, sig)
      // members always end up in one component, capped or not
      val sigConnected = byBucket.values.forall(_.groupBy(sigOf(_)).values.forall { g =>
        g.map(find).distinct.size == 1
      })
      // LAW 2: every member of a bucket with ≥2 members reaches the
      // bucket anchor's component (verification reachability)
      val bucketReachable = byBucket.values.filter(_.size >= 2).forall { g =>
        g.map(find).distinct.size == 1
      }
      // LAW 3: candidate mass stays linear per bucket under the cap
      val perBucketOk = byBucket.forall { case (b, g) =>
        val nb = g.size
        val got = pairs.count { case (i, j) => bucketOf(i.toInt) == b }
        got <= nb * (cap + 2) + cap * cap
      }
      // LAW 4: no oversized bucket ⇒ exactly the exhaustive pair set
      val maxBucket = byBucket.values.map(_.size).max
      val exactWhenSmall = maxBucket > cap || {
        val want = byBucket.values.flatMap { g =>
          val ids = g.map(_.toLong).sorted
          for { i <- ids; j <- ids if i < j } yield (i, j)
        }.toSet
        pairs == want
      }
      sigConnected && bucketReachable && perBucketOk && exactWhenSmall
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(25), prop)
    assert(res.passed, s"capped-pairs law: $res")
  }

  test("recommendBanding grows planes with corpus size and meets the recall target") {
    val (p1, b1) = Ann.recommendBanding(500L, 0.4)
    assert((p1, b1) == (4, 16), s"small corpus must reproduce the 4x16 default, got ($p1,$b1)")
    val (p2, b2) = Ann.recommendBanding(1000000000L, 0.7)
    assert(p2 > p1, "a 1B corpus needs more planes per band")
    val prob = 1.0 - math.acos(0.7) / math.Pi
    val recall = 1.0 - math.pow(1.0 - math.pow(prob, p2), b2)
    assert(recall >= 0.93, s"theoretical recall $recall below target")
    // expected bucket size at 1B stays bounded
    assert(1000000000L >> p2 <= 4096L, s"expected bucket ${1000000000L >> p2} exceeds target")
  }

  test("recommendBanding caps the band count instead of planning unbounded compute") {
    // 1B corpus at a LOW threshold wants thousands of bands — the cap
    // must bound it (with the warning carrying the achieved recall)
    val (p, b) = Ann.recommendBanding(1000000000L, 0.4)
    assert(b <= 512, s"nBands $b must be capped")
    val (_, b2) = Ann.recommendBanding(1000000000L, 0.4, maxBands = 64)
    assert(b2 == 64)
  }

  test("minhash: near-constant corpus keeps candidates linear and winners exact") {
    import spark.implicits._
    val txt = Seq.fill(12)("the quick brown fox jumps over the lazy dog").mkString(" ")
    val docs = (0L until 300L).toDF("doc_id").withColumn("text", lit(txt))
    val cfg = MinHashConfig(maxBucket = 32)
    // one bucket of 300 per band; all-pairs would be 300·299/2 = 44 850
    val cand = MinHashDedup.candidatePairs(docs, cfg).count()
    assert(cand == 299L, s"star-capped candidates must be linear (299), got $cand")
    val winners = MinHashDedup.dedupWinners(docs, cfg).collect().map(_.getLong(0)).toSeq
    assert(winners == Seq(0L), s"identical corpus must keep only doc 0, got $winners")
  }

  test("minhash: unique documents pass through a skewed corpus untouched") {
    import spark.implicits._
    val txt = Seq.fill(12)("the quick brown fox jumps over the lazy dog").mkString(" ")
    val dupes = (0L until 200L).toDF("doc_id").withColumn("text", lit(txt))
    val uniques = (200L until 220L).toDF("doc_id").withColumn("text",
      concat_ws(" ",
        concat(lit("alpha"), col("doc_id")), concat(lit("beta"), col("doc_id")),
        concat(lit("gamma"), col("doc_id")), concat(lit("delta"), col("doc_id")),
        concat(lit("epsilon"), col("doc_id"))))
    val docs = dupes.unionByName(uniques)
    val winners = MinHashDedup.dedupWinners(docs, MinHashConfig(maxBucket = 32))
      .collect().map(_.getLong(0)).toSet
    assert(winners == (Set(0L) ++ (200L until 220L)),
      s"expected doc 0 + the 20 uniques, got $winners")
  }

  test("budgeted verification: generous budget ≡ exact, tight budget bounds per-doc degree") {
    val cat = graft.ops.Catalog(spark, sf001)
    val cfg = MinHashConfig()
    val sigs = MinHashDedup.signatures(cat.documents, cfg).localCheckpoint(true)
    val exact = MinHashDedup.verifiedPairs(cat.documents, cfg, Some(sigs))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "fixture sanity: the corpus must contain near-dups")
    // a budget above every candidate degree reproduces the exact result
    val generous = MinHashDedup.budgetedVerifiedPairs(
      cat.documents, sigs, maxPairsPerDoc = 1 << 20, cfg)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(generous == exact, "an unconstraining budget must change nothing")
    // a tight budget returns a subset, with per-doc degree ≤ 2·budget
    // (≤ budget appearances per pair side)
    val b = 1
    val tight = MinHashDedup.budgetedVerifiedPairs(cat.documents, sigs, b, cfg)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(tight.subsetOf(exact), "budgeting must never invent pairs")
    val asI = tight.groupBy(_._1).view.mapValues(_.size).toMap
    val asJ = tight.groupBy(_._2).view.mapValues(_.size).toMap
    assert(asI.values.forall(_ <= b) && asJ.values.forall(_ <= b),
      s"per-side degree must respect the budget: i=${asI.values.max}, j=${asJ.values.max}")
    // the strongest evidence survives: every doc that had any verified
    // pair and sits under budget on both sides keeps at least one pair
    assert(tight.nonEmpty, "a budget of 1 must still verify the strongest links")
  }

  test("budgeted embedding pairs: generous budget ≡ banded exact, tight budget bounds per-vector degree") {
    val cat = graft.ops.Catalog(spark, sf001)
    // fixed banding so the budgeted and unbudgeted runs share geometry
    val (np, nb) = (4, 16)
    // forceBanded: the budgeted twin always runs the banded machinery,
    // so its unbudgeted baseline must share it (the default call would
    // cost-route to the exact scan at this geometry and find MORE pairs)
    val exact = Ann.bandedPairsAbove(cat.embeddings, 0.4, nPlanes = np, nBands = nb,
      forceBanded = true)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "fixture sanity: the corpus must contain near-dup vectors")
    // a budget above every candidate degree reproduces the banded result
    val generous = Ann.budgetedBandedPairsAbove(
      cat.embeddings, 0.4, maxPairsPerVec = 1 << 20, nPlanes = np, nBands = nb)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(generous == exact, "an unconstraining budget must change nothing")
    // a tight budget returns a subset with per-side degree ≤ budget
    val b = 1
    val tight = Ann.budgetedBandedPairsAbove(
      cat.embeddings, 0.4, maxPairsPerVec = b, nPlanes = np, nBands = nb)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(tight.subsetOf(exact), "budgeting must never invent pairs")
    assert(tight.nonEmpty, "a budget of 1 must still score the strongest links")
    val asI = tight.groupBy(_._1).view.mapValues(_.size).toMap
    val asJ = tight.groupBy(_._2).view.mapValues(_.size).toMap
    assert(asI.values.forall(_ <= b) && asJ.values.forall(_ <= b),
      s"per-side degree must respect the budget: i=${asI.values.max}, j=${asJ.values.max}")
  }

  test("budgeted embedding pairs: a vector spam pile's scoring work stays constant per member") {
    import spark.implicits._
    // 200 identical vectors — the adversarial pile; all-pairs scoring
    // would be 19 900 exact dots
    val v = Array.tabulate(8)(i => if (i == 0) 1.0f else 0.0f)
    val vecs = (0L until 200L).map(id => (id, v)).toDF("vec_id", "embedding")
    val b = 2
    val pairs = Ann.budgetedBandedPairsAbove(
      vecs, 0.9, maxPairsPerVec = b, nPlanes = 4, nBands = 8, maxBucket = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty, "the pile's strongest links must survive the budget")
    val asI = pairs.groupBy(_._1).view.mapValues(_.size).toMap
    val asJ = pairs.groupBy(_._2).view.mapValues(_.size).toMap
    assert(asI.values.forall(_ <= b) && asJ.values.forall(_ <= b),
      s"per-side degree must respect the budget on the pile: " +
        s"i=${asI.values.max}, j=${asJ.values.max}")
  }

  test("AQE skew-join split engages on a hot-key equi join (multi-mapper shuffle)") {
    import spark.implicits._
    // ~60% of the fact rows land on key 0; the rest spread over 5 000
    // keys. Two fixture constraints, both found the hard way (r6):
    //  - written as 8 parquet FILES: AQE splits a skewed reduce
    //    partition at map-output granularity, so a single-file fixture
    //    has one mapper and the hot partition is one unsplittable
    //    block — the rule then (correctly) declines;
    //  - the hot share must clear skewedPartitionFactor (5×median).
    //    The suite runs 8 shuffle partitions, so a 30% hot key gives
    //    hot/median ≈ 3 and the rule declines; 60% gives ≈ 10.
    // At 100 TB thousands of mappers feed every shuffle and the stock
    // 256 MB threshold engages; here the thresholds scale down with
    // the fixture's compressed shuffle bytes.
    val dir = java.nio.file.Files.createTempDirectory("graft-skewjoin").toString
    spark.range(200000)
      .select(
        when(pmod(xxhash64(col("id")), lit(10L)) < 6, lit(0L))
          .otherwise(pmod(col("id"), lit(5000L))).as("k"),
        sha2(col("id").cast("string"), 256).as("payload"))
      .repartition(8)
      .write.mode("overwrite").parquet(s"$dir/fact")
    val fact = spark.read.parquet(s"$dir/fact")
    spark.range(5000).select(col("id").as("k"), pmod(xxhash64(col("id")), lit(97L)).as("w"))
      .write.mode("overwrite").parquet(s"$dir/dim")
    val dim = spark.read.parquet(s"$dir/dim")
    val before = Map(
      "spark.sql.autoBroadcastJoinThreshold" -> spark.conf.getOption("spark.sql.autoBroadcastJoinThreshold"),
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> spark.conf.getOption("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes"),
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> spark.conf.getOption("spark.sql.adaptive.advisoryPartitionSizeInBytes"))
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8KB")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4KB")
      val q = fact.join(dim, Seq("k"))
        .select(pmod(xxhash64(col("payload"), col("w")), lit(1000000007L)).as("h"))
        .agg(sum("h"))
      // inspect the SAME execution that ran: first() would plan a fresh
      // LIMIT query and the inspected plan never executes
      val total = q.collect()(0).getLong(0)
      assert(total != 0L)
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE skew-join split must engage on the hot key; got plan:\n$plan")
    } finally before.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("banded sign-LSH: near-constant embeddings stay bounded, every member reaches its anchor") {
    import spark.implicits._
    val v = Array.tabulate(8)(i => if (i == 0) 1.0f else 0.0f)
    val vecs = (0L until 200L).map(id => (id, v)).toDF("vec_id", "embedding")
    val pairs = Ann.bandedPairsAbove(vecs, 0.9, maxBucket = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // star only: (anchor 0, j) — all-pairs would be 19 900
    assert(pairs.length == 199, s"expected 199 star pairs, got ${pairs.length}")
    assert(pairs.forall(_._1 == 0L), "anchor must be the minimum vec_id")
    assert(pairs.map(_._2).toSet == (1L until 200L).toSet,
      "every non-anchor member must be linked for verification")
  }
}
