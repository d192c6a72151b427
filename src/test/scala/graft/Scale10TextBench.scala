package graft

import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.text.{MinHashDedup, TextAnalysis}

/** 10× text-corpus probe for the heaviest string-shuffle paths — the
  * exact-substring dedup pair (X67/X68, one shared shingle exchange),
  * winnowing pairs (X17 machinery from live fingerprints), and BM25
  * hard negatives (X76) — on a 10×-duplicated sf0.1 documents table
  * (5 000 docs, every text present 10×: the adversarial shape for
  * cross-doc-shared-span detection, since EVERY span is now shared).
  * Evidence wanted: wall-clock scales like the data (no quadratic
  * surprise), and the exact-duplicate flood is absorbed by the
  * hot-bucket defenses rather than melting a reducer.
  *
  * Run: sbt "Test/runMain graft.Scale10TextBench"
  */
object Scale10TextBench {

  private def timed[T](f: => T): (T, Double) = {
    val t0 = System.nanoTime
    val r = f
    (r, (System.nanoTime - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val spark = graft.core.Engine.session(
      master = "local[32]", shufflePartitions = 32, appName = "scale10text")
    spark.sparkContext.setLogLevel("ERROR")

    val docs = Tables.load(spark, "/root/testdata/sf0.1", "documents")
      .select("doc_id", "text", "n_chars")
    val docs10 = (0 until 10)
      .map(r => docs.select((col("doc_id") + lit(r * 1000000L)).as("doc_id"),
        col("text"), col("n_chars")))
      .reduce(_ unionByName _)
      .repartition(32)
      .localCheckpoint(true)
    println(s"SCALE10TEXT corpus rows=${docs10.count()} (10x sf0.1, every text 10x)")

    // aggregate over the COMPUTED columns — a bare count() lets Catalyst
    // prune the span folds / rewritten text out of the plan entirely
    val (cov, tCov) = timed(TextAnalysis.crossDocDupCoverage(docs10, n = 5)
      .agg(sum("covered_tokens")).first().getLong(0))
    println(f"SCALE10TEXT dup_ngram_coverage (X67)   $tCov%8.2f s  covered=$cov")
    val (rem, tRem) = timed(TextAnalysis.removeSharedSpans(docs10, n = 5)
      .agg(sum(length(col("text")))).first().getLong(0))
    println(f"SCALE10TEXT remove_shared_spans (X68)  $tRem%8.2f s  chars=$rem")
    val (wp, tWp) = timed(TextAnalysis.winnowPairs(docs10, threshold = 0.5).count())
    println(f"SCALE10TEXT winnow_pairs (X17 path)    $tWp%8.2f s  rows=$wp")
    // X05 exact n-gram Jaccard with the maxDf=50 stop-shingle cap: on the
    // 10x flood every shingle's df is 10x'd, so keys with original df >= 6
    // are dropped pre-join. Candidate mass = sum over retained keys of
    // C(df,2) — report it capped vs uncapped to show the bound the cap buys.
    val sh10 = docs10
      .select(col("doc_id"), explode(array_distinct(
        TextAnalysis.shingles(col("text"), 3))).as("s"))
      .distinct()
      .groupBy("s").agg(count(lit(1)).as("df"))
    val pairsOf = (col("df") * (col("df") - 1) / 2).cast("long")
    val Array(mUncap, mCap) = sh10
      .agg(sum(pairsOf), sum(when(col("df") <= 50, pairsOf).otherwise(0L)))
      .first() match { case r => Array(r.getLong(0), r.getLong(1)) }
    val (xj, tXj) = timed(
      TextAnalysis.ngramJaccardPairs(docs10, n = 3, threshold = 0.6,
        maxDf = 50).count())
    println(f"SCALE10TEXT ngram_jaccard (X05 path)   $tXj%8.2f s  rows=$xj  candidate_mass=$mCap%,d (uncapped would be $mUncap%,d)")
    require(mCap < mUncap / 4,
      s"maxDf cap should prune the flood's candidate mass (capped=$mCap uncapped=$mUncap)")
    val (dw, tDw) = timed(MinHashDedup.dedupWinners(docs10).count())
    println(f"SCALE10TEXT minhash_dedup (X07 path)   $tDw%8.2f s  rows=$dw")
    // every text appears 10x ⇒ winners = exactly the single-corpus
    // winners (replica flood absorbed; original near-dups still lose)
    val singleWinners = MinHashDedup.dedupWinners(docs).count()
    require(dw == singleWinners,
      s"10x-duplicated corpus must dedup to the single-corpus winners ($singleWinners), got $dw")

    // X84 dedup report on the flood: every text is present 10×, so each
    // doc's replica group is a clique of verified pairs — every cluster
    // in the report must have size ≥ 10 (near-dup originals merge
    // groups into multiples), and the removed-doc mass must reconcile
    // exactly with the cluster table (members − clusters)
    val (rep, tRep) = timed {
      val pairs10 = MinHashDedup.verifiedPairs(docs10)
      val clusters = MinHashDedup.duplicateClusters(pairs10)
        .localCheckpoint(true)
      val report = MinHashDedup.dedupReport(docs10, clusters).collect()
      val nClusters = clusters.select("cluster_id").distinct().count()
      val nMembers = clusters.count()
      (report, nClusters, nMembers)
    }
    val (report, nClusters, nMembers) = rep
    val removed = report.map(_.getLong(2)).sum
    println(f"SCALE10TEXT dedup_report (X84 path)    $tRep%8.2f s  " +
      s"clusters=$nClusters removed=$removed sizes=${report.map(_.getLong(0)).mkString(",")}")
    require(report.forall(_.getLong(0) >= 10),
      s"every replica group must land in a >=10 cluster, got sizes " +
        report.map(_.getLong(0)).mkString(","))
    require(removed == nMembers - nClusters,
      s"docs_removed ($removed) must equal members-clusters (${nMembers - nClusters})")

    val qdocs = docs10.filter(col("doc_id") < 3)
    val banded = MinHashDedup
      .bandedSignatures(docs10)
      .select(col("doc_id").as("id"), col("band"), col("band_hash").as("bucket"))
      .localCheckpoint(true)
    val (nd, tNd) = timed(
      MinHashDedup.crossNearDupsFromBanded(docs10, qdocs, banded,
        graft.text.MinHashConfig(threshold = 0.5)).localCheckpoint(true))
    println(f"SCALE10TEXT cross_neardups (X46 path)  $tNd%8.2f s  rows=${nd.count()}")
    val (hn, tHn) = timed(
      graft.text.Bm25.hardNegatives(docs10, qdocs, nd, k = 5).count())
    println(f"SCALE10TEXT hard_negatives (X76 path)  $tHn%8.2f s  rows=$hn")
    require(hn == 15, s"3 positives x 5 negatives expected, got $hn")

    spark.stop()
  }
}
