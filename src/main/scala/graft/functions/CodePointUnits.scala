package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native code-point split: `text` as an array of single-code-point
  * strings, one linear pass — the spaceless-script unit tokenizer of
  * the substring tier ([[graft.text.SubstringDedup]]'s `charTokens`).
  *
  * Exists for the same reason as [[ShingleHash]]: the Column twin
  * (`transform(sequence(1, length), i => substr(i, 1))`,
  * [[graft.text.TextAnalysis.charUnitsTwin]]) re-scans the UTF-8
  * buffer from offset 0 for EVERY position — O(n²) per document,
  * quadratic in spaceless doc length on the stage-0 hot path. This
  * walks the bytes once, directly on the UTF-8 buffer (a code point is
  * 1–4 bytes, delimited by its lead byte — no UTF-16 surrogate
  * round-trip), and participates in whole-stage codegen via a static
  * call so the spaceless stage-0 pipeline stays fused. Units are
  * code-POINT strings (surrogate-pair aware, not UTF-16 units) so
  * results agree with Column `substr` and DuckDB `substring`/indexing
  * — the twin equality is spec-pinned including astral chars.
  */
case class CodePointUnits(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"code_point_units requires a string input, got ${child.dataType}")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    CodePointUnits.split(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CodePointUnits.split($c)")

  override def prettyName: String = "code_point_units"

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CodePointUnits {

  /** Column form. */
  def apply(col: Column): Column =
    GraftColumnBridge.column(CodePointUnits(GraftColumnBridge.expression(col)))

  /** One linear pass over the UTF-8 bytes: each unit is the 1–4-byte
    * slice of one code point (`numBytesForFirstByte` reads the width
    * off the lead byte). The unit strings share the single copied
    * buffer — no per-unit byte copies. Static so generated code can
    * call it (interpreted eval shares it).
    */
  def split(s: UTF8String): GenericArrayData = {
    val bytes = s.getBytes
    val nb = bytes.length
    var i = 0
    var n = 0
    while (i < nb) {
      i += UTF8String.numBytesForFirstByte(bytes(i))
      n += 1
    }
    val out = new Array[AnyRef](n)
    i = 0
    var o = 0
    while (i < nb) {
      val w = UTF8String.numBytesForFirstByte(bytes(i))
      out(o) = UTF8String.fromBytes(bytes, i, w)
      o += 1
      i += w
    }
    new GenericArrayData(out)
  }
}
