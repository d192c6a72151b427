package graft

import org.apache.spark.sql.functions._

import graft.text.{MinHashConfig, MinHashDedup}
import graft.vector.Ann

/** LSH hot-bucket skew defense: a degenerate near-constant corpus sends
  * every document/vector to one (band, bucket) key. Without the cap the
  * candidate self-join is O(m²) in mass and lands on one reducer; with
  * it, oversized buckets emit star-to-anchor pairs — linear, join-free —
  * while preserving what dedup consumes (every member still reaches
  * exact verification through its anchor, min-id still wins).
  */
class SkewDefenseSpec extends SparkSpec {

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
