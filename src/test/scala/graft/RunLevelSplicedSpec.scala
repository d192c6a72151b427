package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.text.SubstringDedup

/** Pins for [[graft.text.SubstringDedup.duplicatedSpansRunLevelWithSpliced]]
  * (ADVICE r16): the word-tier spans index the RETURNED spliced text —
  * `slice(tokens(spliced_text), span_start, span_tokens)` names the
  * duplicated tokens — and the scaladoc's mapping rule back to original
  * coordinates (every spliced token appears verbatim, in order, in the
  * original) holds on a fixture where spliced and original token
  * streams genuinely differ.
  */
class RunLevelSplicedSpec extends SparkSpec {

  import spark.implicits._

  private def docs(rows: (Long, String)*): DataFrame =
    rows.toDF("doc_id", "text")


  test("spliced companion: word spans index the returned spliced text; spliced tokens map back to the original") {
    val quote = thai(31, 40)
    // doc 1 is the char-stage canonical holder of the quote; docs 2 and
    // 3 carry the cut — doc 3 ALSO shares an 11-token word run with
    // doc 2, and its quote sits INSIDE that run, so its word-tier span
    // only lines up against the SPLICED token stream (original tokens
    // include the quote token; spliced tokens do not)
    val shared = (1 to 11).map(i => s"s$i").mkString(" ")
    val fixture = docs(
      1L -> s"holder text $quote stays canonical here",
      2L -> s"$shared tail two",
      3L -> s"${(1 to 6).map(i => s"s$i").mkString(" ")} $quote ${(7 to 11).map(i => s"s$i").mkString(" ")} other end")
    val (spans, spliced) =
      SubstringDedup.duplicatedSpansRunLevelWithSpliced(fixture, 10)
    val sp = spans.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(3), r.getLong(5)))
      .toSet
    // doc 3: char tier cut its embedded quote (40 cp), word tier marks
    // the 11 shared tokens — against the spliced stream
    assert(sp.contains((3L, "char", 1L, 40L)), s"spans: $sp")
    val word3 = sp.filter(p => p._1 == 3L && p._2 == "word")
    assert(word3 === Set((3L, "word", 1L, 11L)), s"word spans of doc 3: $word3")
    val splicedMap = spliced.collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // only mixed/pure-word docs appear (no doc-level spaceless doc here,
    // so all three)
    assert(splicedMap.keySet === Set(1L, 2L, 3L))
    // doc 3's spliced text has the quote's characters gone, flanking
    // spaces intact — its tokens are exactly the 11 shared words + tail
    val toks3 = splicedMap(3L).split(" ").filter(_.nonEmpty).toSeq
    assert(toks3 === ((1 to 11).map(i => s"s$i") ++ Seq("other", "end")),
      s"spliced tokens: $toks3")
    // the span names the duplicated tokens IN SPLICED COORDINATES
    val span = word3.head
    val named = toks3.slice((span._3 - 1).toInt, (span._3 - 1 + span._4).toInt)
    assert(named === (1 to 11).map(i => s"s$i"), s"span names: $named")
    // ... which original coordinates would get WRONG: original token 7
    // is the quote, not s7
    val origToks3 = (s"${(1 to 6).map(i => s"s$i").mkString(" ")} $quote " +
      s"${(7 to 11).map(i => s"s$i").mkString(" ")} other end")
      .split(" ").filter(_.nonEmpty).toSeq
    assert(origToks3(6) === quote && named(6) === "s7",
      "original coordinates would misname the span — the spliced table is required")
    // the scaladoc mapping rule: every spliced token appears verbatim,
    // in order, in the original text (the splice only deletes chars)
    val orig3 = fixture.filter(col("doc_id") === 3L)
      .select("text").first().getString(0)
    val found = toks3.foldLeft(0) { (from, t) =>
      val at = orig3.indexOf(t, from)
      assert(at >= 0, s"token '$t' must appear in the original after offset $from")
      at + t.length
    }
    assert(found <= orig3.length)
    // spans table itself is unchanged by the companion form
    val plain = SubstringDedup.duplicatedSpansRunLevel(fixture, 10).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(3), r.getLong(5)))
      .toSet
    assert(plain === sp, "WithSpliced must not change the span table")
  }
}
