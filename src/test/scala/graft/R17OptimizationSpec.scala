package graft

import org.apache.spark.sql.functions._

import graft.ops.Catalog
import graft.text.{MinHashDedup, TextAnalysis}

/** Result-identity pins for the round-17 optimization internals: each
  * restructured operator must return exactly what its pre-optimization
  * form returned (the round's contract — faster, never different).
  */
class R17OptimizationSpec extends SparkSpec {

  lazy val cat: Catalog = Catalog(spark, sf1)

  test("bigramLogProbUnordered ≡ bigramLogProb as a row set (order is the only difference)") {
    val ordered = TextAnalysis.bigramLogProb(cat.documents).collect()
    val unordered = TextAnalysis.bigramLogProbUnordered(cat.documents).collect()
    assert(ordered.map(_.getLong(0)).toSeq == ordered.map(_.getLong(0)).toSeq.sorted,
      "public form must stay doc_id-ordered")
    assert(unordered.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet ==
      ordered.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet)
  }

  test("bindOnce(v)(f) ≡ f(v) including null and empty inputs") {
    import spark.implicits._
    val df = Seq(Some("a b c d"), Some(""), Some("x"), None)
      .toDF("text")
    val direct = df.select(TextAnalysis.shingles(col("text"), 2).as("s")).collect()
    // shingles routes through bindOnce; re-derive the unbound form inline
    val toks = TextAnalysis.tokens(col("text"))
    val unbound = df.select(
      when(size(toks) >= 2,
        transform(sequence(lit(1), size(toks) - 1),
          i => concat_ws(" ", slice(toks, i, lit(2)))))
        .otherwise(array().cast("array<string>")).as("s")).collect()
    assert(direct.map(_.toSeq).toSeq == unbound.map(_.toSeq).toSeq)
  }

  test("fused-init duplicateClusters ≡ union-find on a diameter-5 chain plus singleton pairs") {
    import spark.implicits._
    // chain 10-11-...-15 (propagation needs multiple rounds after the
    // fused first one) plus two disjoint 2-cliques
    val pairs = (Seq((10L, 11L), (11L, 12L), (12L, 13L), (13L, 14L), (14L, 15L)) ++
      Seq((1L, 2L), (7L, 3L))).toDF("i", "j")
    val got = MinHashDedup.duplicateClusters(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = TestGraphs.unionFind(pairs.collect().map(r => (r.getLong(0), r.getLong(1))))
    assert(got == want)
  }
}
