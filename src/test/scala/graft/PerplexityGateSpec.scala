package graft

import org.apache.spark.sql.functions._

import graft.text.PerplexityGate

/** Unit pins for the frozen perplexity gate's serve-time semantics —
  * the cases the batch≡stream replay spec (StreamingSpec) cannot reach
  * because a replayed training corpus is always fully in-model.
  */
class PerplexityGateSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.toSeq.toDF("doc_id", "text")

  private lazy val model = PerplexityGate.train(
    docs(1L -> "the cat sat", 2L -> "the cat ran", 3L -> "a dog ran"),
    nBuckets = 3)

  test("unseen context backs off to add-one smoothing over the frozen vocab") {
    // vocab = {the, cat, sat, ran, a, dog} → V = 6; a doc of entirely
    // unseen words scores log10((0+1)/(0+V)) per bigram
    assert(model.vocabSize == 6L)
    val scored = PerplexityGate.score(docs(10L -> "xx yy zz"), model).collect()
    assert(scored.length == 1 && scored(0).getLong(1) == 2L)
    val want = BigDecimal(math.log10(1.0 / 6.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(scored(0).getDouble(2) == want,
      s"unseen-bigram score ${scored(0).getDouble(2)} != log10(1/V) = $want")
  }

  test("seen bigram scores through the frozen counts; sub-2-token docs are absent") {
    // "the cat" seen twice, context "the" total 2, V = 6 →
    // log10((2+1)/(2+6))
    val scored = PerplexityGate.score(
      docs(11L -> "the cat", 12L -> "solo", 13L -> ""), model).collect()
    assert(scored.length == 1, "docs with <2 tokens must be absent, like the batch scorer")
    val want = BigDecimal(math.log10(3.0 / 8.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(scored(0).getDouble(2) == want)
  }

  test("boundary assignment: better-than-head → bucket 0, worse-than-tail → last bucket") {
    // "the cat" is the single most frequent training bigram (c12=2 of
    // context 2): a doc of exactly that bigram scores log10(3/8) ≈
    // −0.426, above every training mean (each includes a rarer second
    // bigram) → head; a fully unseen doc scores log10(1/6) ≈ −0.778,
    // below every training score → tail. Ties with training boundaries
    // keep their batch bucket via the (−score, doc_id) compare.
    val assigned = PerplexityGate.assign(
      docs(20L -> "the cat", 21L -> "qq ww ee rr"), model)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(assigned(20L) == 0L, s"best-scoring doc must take the head bucket: $assigned")
    assert(assigned(21L) == model.nBuckets - 1L,
      s"worse-than-tail doc must take the last bucket: $assigned")
  }

  test("save/load round-trips boundaries, vocab and counts exactly") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ppl-rt").toString
    PerplexityGate.save(model, dir)
    val back = PerplexityGate.load(spark, dir)
    assert(back.vocabSize == model.vocabSize && back.nBuckets == model.nBuckets)
    assert(back.boundaries == model.boundaries)
    val probe = docs(30L -> "the cat sat", 31L -> "zz qq pp")
    val a = PerplexityGate.assign(probe, model).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSet
    val b = PerplexityGate.assign(probe, back).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSet
    assert(a == b, s"loaded model must score identically: $a vs $b")
  }
}
