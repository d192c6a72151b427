package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native word-shingle hashing: the DISTINCT 64-bit polynomial hashes
  * of every `n`-token shingle of a whitespace-tokenized document, in
  * one compiled pass — no intermediate shingle strings.
  *
  * This is the MinHash base-hash (`h0`) producer: signatures only ever
  * hash the shingle text, so emitting the hash directly (a) skips the
  * interpreted higher-order-function shingle construction (~4 µs per
  * lambda eval — the WinnowHash lesson) and (b) shrinks the signature
  * shuffle key from a ~25-byte string to 8 bytes. The hash covers the
  * exact token characters with a separator sentinel between tokens, so
  * shingles equal iff their token sequences are equal (modulo 64-bit
  * collisions, which MinHash tolerates by construction). Exact-Jaccard
  * verification keeps using real string shingles.
  *
  * `charK > 0` enables the SPACELESS-SCRIPT fallback: a document the
  * doc-level dispatch classifies as spaceless (majority non-ASCII code
  * points AND — fewer than `n` whitespace tokens, or average token
  * length ≥ [[graft.text.TextAnalysis.SpacelessAvgTokenLen]] code
  * points — CJK/Thai text carries no ASCII spaces, so its "tokens" are
  * whole sentences; the majority guard keeps pure-ASCII URLs/base64/
  * short phrases on word semantics) hashes character `charK`-grams of
  * the raw text instead:
  * word shingling would otherwise collapse its near-dup granularity to
  * the whole document. K-grams are CODE-POINT windows (not UTF-16
  * units) so they agree with the Column-level
  * [[graft.text.TextAnalysis.charShingles]] (`substr` counts code
  * points) that exact-Jaccard verification and the X124 DuckDB oracle
  * use. The two granularities never mix: a doc is EITHER word- or
  * char-shingled, and cross-granularity band collisions are chance
  * (rejected by exact verification like any false candidate).
  *
  * `runLevel` (requires `charK > 0`) refines the mixed-doc case: a doc
  * that is NOT doc-level spaceless but contains long non-ASCII runs
  * ([[graft.text.TextAnalysis.RunPattern]]) emits word-shingle hashes
  * of the remainder (runs replaced by a space) PLUS char-gram hashes
  * of each run — so an embedded CJK/Thai quote signs at the same
  * granularity a standalone spaceless doc of that quote does, and the
  * two can meet in a band bucket. Within one doc the two hash families
  * collide only by 64-bit chance (tolerated like any collision).
  */
case class ShingleHash(
    child: Expression, n: Int, charK: Int = 0, runLevel: Boolean = false)
    extends UnaryExpression {

  require(n >= 1, "shingle size must be >= 1")
  require(charK >= 0, "charK must be >= 0 (0 = word shingles only)")
  require(!runLevel || charK > 0, "runLevel requires charK > 0")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"shingle_hash requires a string input, got ${child.dataType}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    ShingleHash.hashDoc(input.asInstanceOf[UTF8String], n, charK, runLevel)

  // a static call with the (n, charK, runLevel) literals baked into the
  // generated code — participates in whole-stage codegen like
  // CodePointUnits, keeping the MinHash stage-0 signing stage fused
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.ShingleHash.hashDoc($c, $n, $charK, $runLevel)")

  override def prettyName: String = "shingle_hash"

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShingleHash {
  /** [[graft.text.TextAnalysis.RunPattern]] compiled once — the same
    * Java regex the Column twin's regexp ops use.
    */
  private val RunRegex =
    java.util.regex.Pattern.compile(graft.text.TextAnalysis.RunPattern)

  private val P = 1099511628211L

  /** The whole per-document hash pipeline (dispatch + hashing +
    * dedup), static so generated code can call it (interpreted eval
    * shares it).
    */
  def hashDoc(input: UTF8String, n: Int, charK: Int, runLevel: Boolean): GenericArrayData = {
    val s = input.toString
    // whitespace tokens, empties dropped (same rule as TextAnalysis.tokens)
    val toks = s.split(' ').filter(_.nonEmpty)
    if (charK > 0) {
      // doc-level spaceless dispatch — MUST stay arithmetic-identical
      // to TextAnalysis.spaceless (Column) and the X124 oracle SQL:
      // 2 * nonAsciiCodePoints >= codePoints (the majority test that
      // keeps LATIN docs — URLs, base64, short phrases — on word
      // semantics under BOTH disjuncts) AND (ntokens < n OR
      // codePoints >= SpacelessAvgTokenLen * ntokens)
      var i = 0
      var cp = 0
      var nonAscii = 0
      while (i < s.length) {
        val c = s.codePointAt(i)
        cp += 1
        if (c > 0x7f) nonAscii += 1
        i += Character.charCount(c)
      }
      if (nonAscii.toLong * 2 >= cp &&
          (toks.length < n ||
            cp.toLong >= graft.text.TextAnalysis.SpacelessAvgTokenLen.toLong * toks.length))
        return dedupSorted(charGramHashes(s, cp, charK))
      if (runLevel) {
        // mixed doc under run-level: word shingles of the remainder
        // (long non-ASCII runs replaced by a space — the exact Column
        // regexp_replace semantics, same Java regex) ∪ char grams of
        // each run. MUST stay set-identical to the Column twin
        // TextAnalysis.shinglesAuto(_, n, charK, runLevel = true).
        // Per-run hash arrays are collected and copied ONCE — a
        // growing concat per run would be quadratic in the run count
        // on this stage-0 hot path.
        val m = RunRegex.matcher(s)
        if (m.find()) {
          m.reset()
          val parts = scala.collection.mutable.ArrayBuffer[Array[Long]](
            wordShingleHashes(
              RunRegex.matcher(s).replaceAll(" ")
                .split(' ').filter(_.nonEmpty), n))
          while (m.find()) {
            val run = s.substring(m.start, m.end)
            parts += charGramHashes(run, run.codePointCount(0, run.length), charK)
          }
          val out = new Array[Long](parts.iterator.map(_.length).sum)
          var o = 0
          parts.foreach { a =>
            System.arraycopy(a, 0, out, o, a.length)
            o += a.length
          }
          return dedupSorted(out)
        }
        // no runs: plain word path below
      }
    }
    dedupSorted(wordShingleHashes(toks, n))
  }

  /** Polynomial hashes of every `n`-token shingle (raw, un-deduped):
    * rolling per-token hashes combined with a separator multiplier so
    * token boundaries stay significant.
    */
  private def wordShingleHashes(toks: Array[String], n: Int): Array[Long] = {
    if (toks.length < n) return Array.empty[Long]
    val th = new Array[Long](toks.length)
    var i = 0
    while (i < toks.length) {
      var h = 0L
      val t = toks(i)
      var j = 0
      while (j < t.length) { h = h * P + t.charAt(j); j += 1 }
      th(i) = h
      i += 1
    }
    val raw = new Array[Long](toks.length - n + 1)
    i = 0
    while (i + n <= toks.length) {
      var h = 0L
      var j = 0
      while (j < n) { h = h * P + 0x1f; h = h * P + th(i + j); j += 1 }
      raw(i) = h
      i += 1
    }
    raw
  }

  /** Polynomial hashes of every `charK`-code-point window of `s` (raw,
    * un-deduped) — the spaceless-script shingle base (`cp` = the
    * text's code-point count, already known to every caller). One
    * surrogate-aware pass to code points, so windows count code points
    * exactly like Column substr / DuckDB substring do.
    */
  private def charGramHashes(s: String, cp: Int, charK: Int): Array[Long] = {
    if (cp < charK) return Array.empty[Long]
    val cps = new Array[Int](cp)
    var i = 0
    var o = 0
    while (i < s.length) {
      val c = s.codePointAt(i)
      cps(o) = c
      o += 1
      i += Character.charCount(c)
    }
    val raw = new Array[Long](cp - charK + 1)
    i = 0
    while (i + charK <= cp) {
      var h = 0L
      var j = 0
      while (j < charK) { h = h * P + cps(i + j); j += 1 }
      raw(i) = h
      i += 1
    }
    raw
  }

  /** Dedup by primitive sort (output order is irrelevant downstream —
    * only MIN aggregates consume these), avoiding per-shingle boxing.
    */
  private def dedupSorted(raw: Array[Long]): GenericArrayData = {
    if (raw.isEmpty) return new GenericArrayData(Array.empty[Long])
    java.util.Arrays.sort(raw)
    var w = 0
    var i = 0
    while (i < raw.length) {
      if (w == 0 || raw(i) != raw(w - 1)) { raw(w) = raw(i); w += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(raw, w))
  }

}
