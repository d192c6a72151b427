package graft

import org.apache.spark.sql.functions._

import graft.ops.{Catalog, Scale}
import graft.text.TextAnalysis

/** Pins for the round-18 optimization internals: the single-row-group
  * spread ([[Scale.spreadForCompute]]) and the large-star dedup drop.
  * Result identity of every RESTRUCTURED declared query is separately
  * pinned by HashCheck + the DuckDB crosscheck; these tests pin the
  * helper's own contract so a future refactor cannot silently turn the
  * gate into a double-execution or a scale-time shrink.
  */
class R18OptimizationSpec extends SparkSpec {

  lazy val cat: Catalog = Catalog(spark, sf01)

  test("spreadForCompute raises a narrow scan chain to session parallelism, rows identical") {
    val n = spark.sessionState.conf.numShufflePartitions
    val base = cat.documents.select("doc_id", "text")
    val before = base.queryExecution.toRdd.getNumPartitions
    assert(before < n, s"fixture assumption: small scan ($before) below parallelism ($n)")
    val spread = Scale.spreadForCompute(base, col("doc_id"))
    assert(spread.rdd.getNumPartitions == n)
    assert(spread.collect().map(_.toSeq).toSet == base.collect().map(_.toSeq).toSet)
  }

  test("spreadForCompute is a no-op when the plan already carries >= parallelism") {
    val n = spark.sessionState.conf.numShufflePartitions
    val wide = cat.documents.repartition(n + 3, col("doc_id"))
      .localCheckpoint(false)
    val out = Scale.spreadForCompute(wide, col("doc_id"))
    // same Dataset instance back — no exchange appended, no shrink to n
    assert(out eq wide)
  }

  test("spreadForCompute refuses to probe exchange-bearing plans (no compose-time execution)") {
    // a join-bearing plan probed via toRdd would EXECUTE its stages at
    // compose time and the caller's action would re-run them — the gate
    // must hand such plans back untouched
    val joined = cat.documents.join(
      cat.documents.select(col("doc_id")), Seq("doc_id"), "left_semi")
    val out = Scale.spreadForCompute(joined, col("doc_id"))
    assert(out eq joined)
    val agg = cat.documents.groupBy("source").agg(count(lit(1)).as("n"))
    assert(Scale.spreadForCompute(agg, col("source")) eq agg)
  }

  test("per-doc float accumulation is bit-identical under the spread (scorer contract)") {
    // the spread's determinism argument: one doc's exploded rows stay
    // in one partition in original relative order, so an order-
    // sensitive per-doc double aggregate reproduces exactly
    val direct = TextAnalysis.bigramLogProb(cat.documents)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // the scorer spreads internally; compare against a 1-partition
    // coalesced input, which pins the pre-spread accumulation order
    val one = TextAnalysis.bigramLogProb(cat.documents.coalesce(1))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(direct.toSeq == one.toSeq)
  }

  test("largeStar without its dedup: components unchanged on a multi-round fixture") {
    import spark.implicits._
    // chain (diameter > 1 forces several star rounds) + a triangle with
    // duplicate input pairs (exercises the duplicate mass largeStar now
    // forwards to smallStar)
    val pairs = Seq(
      (10L, 11L), (11L, 12L), (12L, 13L), (13L, 14L), (14L, 15L),
      (1L, 2L), (2L, 3L), (1L, 3L), (1L, 3L), (3L, 1L)).toDF("i", "j")
    val got = graft.ops.ConnectedComponents.components(pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = (10L to 15L).map(d => (d, 10L)).toSet ++
      (1L to 3L).map(d => (d, 1L)).toSet
    assert(got == want)
  }
}
