package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization (UAX #15 canonical composition) of a
  * string — the front door of the CCNet-style text-normalization stage
  * (Wenzek et al. 2020): canonically-equivalent byte sequences (e.g.
  * precomposed U+00E9 vs 'e' + COMBINING ACUTE U+0301) must fingerprint
  * identically before ANY dedup tier sees them, or near-dups differing
  * only in composition form escape every tier.
  *
  * A native expression rather than a UDF so normalization stays inside
  * whole-stage codegen; DuckDB's `nfc_normalize` implements the same
  * UAX #15 mapping, which is what makes the stage oracle-checkable
  * (X123). ASCII input short-circuits without copying: NFC is the
  * identity on ASCII, and real corpora are overwhelmingly ASCII-heavy,
  * so the fast path is the hot path.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"graft_nfc requires string, got $t")
    }

  override def dataType: DataType = StringType

  override protected def nullSafeEval(input: Any): Any =
    NfcNormalize.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NfcNormalize.nfc($c)")

  override def prettyName: String = "graft_nfc"

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {

  /** Column form. */
  def apply(col: Column): Column =
    GraftColumnBridge.column(NfcNormalize(GraftColumnBridge.expression(col)))

  /** Static kernel shared by eval and codegen. Pure-ASCII input (no
    * high bit anywhere) returns the input buffer untouched; otherwise
    * java.text.Normalizer's quick-check avoids the rewrite allocation
    * for already-normalized text.
    */
  def nfc(s: UTF8String): UTF8String = {
    val n = s.numBytes
    var i = 0
    while (i < n && (s.getByte(i) & 0x80) == 0) i += 1
    if (i == n) return s
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}
