package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Native kernel for the ADC (asymmetric distance computation) fold —
  * the hot loop of every PQ scan ([[graft.vector.Pq.adcTopK]] /
  * `ivfAdcTopK` / `ivfAdcResidualTopK`): per (candidate, query) row,
  * sum the per-subspace lookup-table cells its codes select.
  *
  * Semantically identical to the certified higher-order-function form
  * {{{
  *   aggregate(zip_with(codes, luts, (cd, sl) -> element_at(sl, cd + 1)),
  *             0.0D, (s, x) -> s + x)
  * }}}
  * — left-to-right double accumulation, null on null input, on length
  * mismatch (zip_with's null padding poisons the sum via
  * element_at(null)/element_at(·, null)) and on any null code or null
  * cell; a negative code indexes from the END of its lut row
  * (element_at's negative-index contract) and code −1 (index 0) or an
  * out-of-range index fails loudly exactly like ANSI element_at.
  * PqSpec pins the equivalence on valid, ragged, null-element and
  * negative-code fixtures.
  *
  * Why an expression: this fold runs once per (candidate × query) row —
  * the scan mass of the compressed re-rank tier — and the HOF form
  * interprets two lambdas and allocates a zipped array per row. The
  * kernel is one primitive loop inside whole-stage codegen (the
  * [[DeflateLen]] static-kernel shape).
  */
case class AdcSum(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(ArrayType(DoubleType, _), _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"graft_adc_sum requires (array<int>, array<array<double>>), got ($l, $r)")
    }

  override def dataType: DataType = DoubleType

  override def nullable: Boolean = true

  override protected def nullSafeEval(codes: Any, luts: Any): Any =
    AdcSum.sum(codes.asInstanceOf[ArrayData], luts.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val r = ctx.freshName("r")
      s"""
         |Object $r = graft.functions.AdcSum.sum($a, $b);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ((java.lang.Double) $r).doubleValue(); }
       """.stripMargin
    })

  override def prettyName: String = "graft_adc_sum"

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): AdcSum =
    copy(left = newLeft, right = newRight)
}

object AdcSum {

  /** Static kernel shared by eval and codegen. Boxed Double so a NULL
    * verdict travels as Java null. Left-to-right accumulation; a null
    * pad/code/cell poisons the result to null (the fold keeps adding —
    * null is absorbing — so no short-circuit changes semantics, but an
    * invalid index still fails loudly wherever it sits, exactly like
    * the HOF whose element_at calls all evaluate inside zip_with).
    */
  def sum(codes: ArrayData, luts: ArrayData): java.lang.Double = {
    val n = codes.numElements()
    val m = luts.numElements()
    val len = math.max(n, m)
    var s = 0.0
    var nullSeen = false
    var i = 0
    while (i < len) {
      if (i >= n || i >= m || codes.isNullAt(i) || luts.isNullAt(i)) {
        // zip_with pad or null element: element_at(null, ·) /
        // element_at(·, null) → null cell → null sum
        nullSeen = true
      } else {
        val sl = luts.getArray(i)
        val idx = codes.getInt(i) + 1
        if (idx == 0)
          throw new IllegalStateException(
            "graft_adc_sum: code -1 yields element_at index 0 (SQL array indices start at 1)")
        val sz = sl.numElements()
        val pos = if (idx > 0) idx - 1 else sz + idx
        if (pos < 0 || pos >= sz)
          throw new IllegalStateException(
            s"graft_adc_sum: code index $idx out of bounds for lut row of $sz cells")
        if (sl.isNullAt(pos)) nullSeen = true
        else s += sl.getDouble(pos)
      }
      i += 1
    }
    if (nullSeen) null else java.lang.Double.valueOf(s)
  }
}
