package graft

import graft.ops.{BucketedPairs, Catalog}
import graft.text.{MinHashConfig, MinHashDedup}

/** The bucketed banded-index table: the steady-state 100 TB re-dedup
  * artifact. Claims pinned here:
  *
  *  1. candidate generation off the bucketed table plans ZERO shuffle
  *     exchanges (the table's (band, bucket) bucketing satisfies every
  *     clustered distribution in the pair pipeline), while the plain
  *     parquet index must shuffle;
  *  2. results are value-identical to the plain banded-index path (and
  *     therefore to direct dedup, which BandedIndex/ExtrasSpec already
  *     pin against the parquet form);
  *  3. a table built under a different banding config is refused, never
  *     silently reused.
  */
class BucketedIndexSpec extends SparkSpec {

  lazy val cat: Catalog = Catalog(spark, sf001)
  private val cfg = MinHashConfig()

  test("bucketed index table: exchange-free candidates, value-identical dedup, config-pinned") {
    val sigs = MinHashDedup.signatures(cat.documents, cfg).localCheckpoint(true)
    val tbl = "graft_banded_idx_spec"
    val dir = java.nio.file.Files.createTempDirectory("graft-banded-flat").toString
    MinHashDedup.writeBandedIndexTable(sigs, tbl, numBuckets = 8, cfg = cfg)
    MinHashDedup.writeBandedIndex(sigs, dir, cfg)
    try {
      val bucketed = MinHashDedup.readBandedIndexTable(spark, tbl, cfg)
      val flat = MinHashDedup.readBandedIndex(spark, dir, cfg)

      // 1. plan shape: the capped pair generation over the bucketed scan
      // carries NO shuffle exchange of the member table; the flat
      // parquet path must shuffle for the same joins/aggregates. Both
      // plans are compared with auto-broadcast OFF: at 100 TB neither
      // side of the self-join fits a broadcast, and the claim pinned
      // here is that BUCKETING (not a fixture-sized broadcast) removes
      // the exchanges — with broadcast on, the tiny test index would
      // hide the flat path's at-scale shuffle behind a BroadcastExchange
      val (bucketedPlan, flatPlan) = try {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        (BucketedPairs
          .cappedCandidatePairs(bucketed, cfg.maxBucket, preMaterialized = true)
          .queryExecution.executedPlan.toString,
         BucketedPairs
          .cappedCandidatePairs(flat, cfg.maxBucket, preMaterialized = true)
          .queryExecution.executedPlan.toString)
      } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      Seq("Exchange hashpartitioning", "Exchange rangepartitioning",
        "Exchange SinglePartition").foreach { x =>
        assert(!bucketedPlan.contains(x),
          s"bucketed candidate generation must be exchange-free ($x):\n$bucketedPlan")
      }
      assert(flatPlan.contains("Exchange hashpartitioning"),
        "sanity: the un-bucketed index is expected to shuffle — if it stops, " +
          "the bucketed variant no longer buys anything and should be retired")

      // 2. value identity: candidates and winners match the flat path
      val candB = MinHashDedup.candidatePairsFromBucketed(bucketed, cfg)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val candF = MinHashDedup.candidatePairsFromBanded(flat, cfg)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(candB == candF, "bucketed candidates must equal the flat-index candidates")
      val winB = MinHashDedup.dedupWinnersFromBucketed(cat.documents, bucketed, cfg)
        .collect().map(_.getLong(0)).toSeq
      val winF = MinHashDedup.dedupWinnersFromBanded(cat.documents, flat, cfg)
        .collect().map(_.getLong(0)).toSeq
      assert(winB == winF, "bucketed dedup winners must equal the flat-index winners")

      // 3. config pinning: a mismatched banding config is refused
      val other = MinHashConfig(bands = 32)
      val e = intercept[IllegalArgumentException] {
        MinHashDedup.readBandedIndexTable(spark, tbl, other)
      }
      assert(e.getMessage.contains("rebuild"))

      // 4. steady-state ingest: the incremental path accepts the
      // bucketed table directly as its corpus side (same columns) and
      // matches the flat-index result
      import org.apache.spark.sql.functions.col
      val newBatch = cat.documents.filter(col("doc_id") >= 400)
      val corpus = cat.documents.filter(col("doc_id") < 400)
      val corpusSigs = MinHashDedup.signatures(corpus, cfg).localCheckpoint(true)
      val tbl2 = "graft_banded_idx_spec_corpus"
      MinHashDedup.writeBandedIndexTable(corpusSigs, tbl2, numBuckets = 8, cfg = cfg)
      try {
        val incB = MinHashDedup.incrementalDedupWinnersFromBanded(
          newBatch, corpus, MinHashDedup.readBandedIndexTable(spark, tbl2, cfg), cfg)
          .collect().map(_.getLong(0)).toSeq
        val incF = MinHashDedup.incrementalDedupWinners(
          newBatch, corpus, corpusSigs, cfg)
          .collect().map(_.getLong(0)).toSeq
        assert(incB == incF, "incremental ingest off the bucketed table must match the flat path")
      } finally spark.sql(s"DROP TABLE IF EXISTS $tbl2")
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $tbl")
    }
  }
}
