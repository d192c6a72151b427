package graft

import org.apache.spark.sql.functions._

import graft.ops.Catalog
import graft.text.MinHashDedup

/** Incremental (append-only) dedup must agree with batch dedup: a new
  * batch admitted against the existing corpus's signature table keeps
  * exactly the documents that a full batch dedup of the whole corpus
  * would keep among the new ids.
  */
class IncrementalDedupSpec extends SparkSpec {

  lazy val cat: Catalog = Catalog(spark, sf01)

  test("incremental admit equals batch dedup restricted to the new batch") {
    val cut = 400L
    val existing = cat.documents.filter(col("doc_id") < cut)
    val newDocs = cat.documents.filter(col("doc_id") >= cut)
    val sigs = MinHashDedup.signatures(existing)
    val inc = MinHashDedup.incrementalDedupWinners(newDocs, existing, sigs)
      .collect().map(_.getLong(0)).toSet
    val batch = MinHashDedup.dedupWinners(cat.documents)
      .collect().map(_.getLong(0)).toSet
    assert(inc == batch.filter(_ >= cut),
      s"incremental=${inc.size} batch-new=${batch.count(_ >= cut)}")
    // some near-duplicates must straddle the cut for this to be a real test
    val all = cat.documents.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(inc.size < (all -- batch).size + inc.size + 1) // sanity, non-vacuous sets
    assert(newDocs.count() > 0 && inc.nonEmpty)
  }

  test("incremental admit from a persisted banded index equals the from-signatures path") {
    val cut = 400L
    val existing = cat.documents.filter(col("doc_id") < cut)
    val newDocs = cat.documents.filter(col("doc_id") >= cut)
    val sigDir = java.nio.file.Files.createTempDirectory("graft_inc_sig").toString
    val bandDir = java.nio.file.Files.createTempDirectory("graft_inc_band").toString
    MinHashDedup.writeSignatures(existing, sigDir)
    val sigs = MinHashDedup.readSignatures(spark, sigDir)
    MinHashDedup.writeBandedIndex(sigs, bandDir)
    val viaSigs = MinHashDedup.incrementalDedupWinners(newDocs, existing, sigs)
      .collect().map(_.getLong(0)).toSeq
    val viaBanded = MinHashDedup.incrementalDedupWinnersFromBanded(
      newDocs, existing, MinHashDedup.readBandedIndex(spark, bandDir))
      .collect().map(_.getLong(0)).toSeq
    assert(viaBanded == viaSigs)
  }

  test("incremental dedup with an empty existing corpus equals batch dedup of the new docs") {
    val empty = cat.documents.filter(col("doc_id") < 0)
    val sigs = MinHashDedup.signatures(empty)
    val inc = MinHashDedup.incrementalDedupWinners(cat.documents, empty, sigs)
      .collect().map(_.getLong(0)).toSeq
    val batch = MinHashDedup.dedupWinners(cat.documents)
      .collect().map(_.getLong(0)).toSeq
    assert(inc == batch)
  }

  test("ShingleHash shingle universe matches TextAnalysis.shingles on every document") {
    import spark.implicits._
    // the signature pass (ShingleHash, JVM tokenizer) and the exact
    // verification pass (TextAnalysis.shingles, Spark tokenizer) must
    // agree on the shingle COUNT per document, or LSH candidates and
    // exact Jaccard silently diverge
    val adversarial = Seq(
      (9001L, "a  b   c d"), (9002L, "  leading and trailing  "),
      (9003L, ""), (9004L, "one two"), (9005L, "x y z")).toDF("doc_id", "text")
    val docs = cat.documents.select("doc_id", "text").unionByName(adversarial)
    val viaNative = docs.select(col("doc_id"),
      size(org.apache.spark.sql.GraftColumnBridge.column(
        graft.functions.ShingleHash(
          org.apache.spark.sql.GraftColumnBridge.expression(col("text")), 3))).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val viaSpark = docs.select(col("doc_id"),
      size(array_distinct(graft.text.TextAnalysis.shingles(col("text"), 3))).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(viaNative == viaSpark)
  }

  test("readSignatures refuses tables without a matching scheme version") {
    val path = java.nio.file.Files.createTempDirectory("graft_sig_ver").toString
    MinHashDedup.writeSignatures(cat.documents, path)
    assert(MinHashDedup.readSignatures(spark, path).count() == cat.documents.count())
    // unversioned (pre-scheme-change) table must be rejected loudly
    val legacy = java.nio.file.Files.createTempDirectory("graft_sig_legacy").toString
    MinHashDedup.signatures(cat.documents).write.mode("overwrite").parquet(legacy)
    intercept[IllegalArgumentException] {
      MinHashDedup.readSignatures(spark, legacy)
    }
  }

  test("persisted banded index: dedup from it equals direct; mismatches refused") {
    val sigDir = java.nio.file.Files.createTempDirectory("graft_banded_sig").toString
    val bandDir = java.nio.file.Files.createTempDirectory("graft_banded_idx").toString
    MinHashDedup.writeSignatures(cat.documents, sigDir)
    val sigs = MinHashDedup.readSignatures(spark, sigDir)
    MinHashDedup.writeBandedIndex(sigs, bandDir)
    val banded = MinHashDedup.readBandedIndex(spark, bandDir)
    // repeat-run entry (no shingle/sign/band pass) ≡ the direct pipeline
    val direct = MinHashDedup.dedupWinners(cat.documents)
      .collect().map(_.getLong(0)).toSeq
    val viaBanded = MinHashDedup.dedupWinnersFromBanded(cat.documents, banded)
      .collect().map(_.getLong(0)).toSeq
    assert(viaBanded == direct)
    // a config mismatch (different banding) must be refused loudly — the
    // band hashes would simply never collide where they should
    val other = graft.text.MinHashConfig(bands = 32)
    val e = intercept[IllegalArgumentException] {
      MinHashDedup.readBandedIndex(spark, bandDir, other)
    }
    assert(e.getMessage.contains("rebuild"), e.getMessage)
    // an unversioned table (pre-scheme build) must be refused too
    val legacy = java.nio.file.Files.createTempDirectory("graft_banded_legacy").toString
    banded.write.mode("overwrite").parquet(legacy)
    intercept[IllegalArgumentException] {
      MinHashDedup.readBandedIndex(spark, legacy)
    }
  }

  test("duplicate clusters equal driver-side union-find (incl. a transitive chain)") {
    import spark.implicits._
    // synthetic chain 1-2, 2-3 plus separate pair 10-11: clusters must
    // collapse transitively
    val chain = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("i", "j")
    val got = MinHashDedup.duplicateClusters(chain)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
    // real pairs at sf0.01: compare against union-find on the same edges
    val pairs = MinHashDedup.verifiedPairs(cat.documents)
      .select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty)
    val want = TestGraphs.unionFind(pairs.toSeq)
    val gotReal = MinHashDedup.duplicateClusters(
      MinHashDedup.verifiedPairs(cat.documents))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(gotReal == want)
  }
}
