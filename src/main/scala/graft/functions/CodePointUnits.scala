package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
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
  * walks the bytes once. Code-POINT windows (surrogate-pair aware, not
  * UTF-16 units) so results agree with Column `substr` and DuckDB
  * `substring`/indexing — the twin equality is spec-pinned including
  * astral chars.
  */
case class CodePointUnits(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"code_point_units requires a string input, got ${child.dataType}")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val out = new scala.collection.mutable.ArrayBuffer[AnyRef](s.length)
    var i = 0
    while (i < s.length) {
      val n = Character.charCount(s.codePointAt(i))
      out += UTF8String.fromString(s.substring(i, i + n))
      i += n
    }
    new GenericArrayData(out.toArray)
  }

  override def prettyName: String = "code_point_units"

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CodePointUnits {

  /** Column form. */
  def apply(col: Column): Column =
    GraftColumnBridge.column(CodePointUnits(GraftColumnBridge.expression(col)))
}
