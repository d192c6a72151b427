package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Bit-interleaved Morton (Z-order) value of two non-negative 31-bit
  * keys: bit i of `x` lands at bit 2i, bit i of `y` at bit 2i+1, so
  * sorting by the result clusters rows that are close in BOTH
  * dimensions. The write-side layout tool for multi-dimensional
  * predicates at 100 TB: a table z-order-clustered on (k1, k2) gives
  * parquet min/max footer pruning on either key, where a linear sort
  * on k1 leaves k2's per-file ranges spanning the whole domain.
  *
  * A native expression (not a UDF) so the value computes inside
  * whole-stage codegen during the write-side repartition+sort, and a
  * 62-bit positive result so the sort order is never broken by the
  * sign bit. Inputs outside [0, 2^31) error — silent masking would
  * corrupt the locality the caller asked for.
  */
case class ZOrderValue(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_zorder requires (bigint, bigint), got (${left.dataType}, ${right.dataType})")

  override def dataType: DataType = LongType

  override protected def nullSafeEval(x: Any, y: Any): Any =
    ZOrderValue.interleave(x.asInstanceOf[Long], y.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.ZOrderValue.interleave($a, $b)")

  override def prettyName: String = "graft_zorder"

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object ZOrderValue {
  private final val Max = 1L << 31

  /** Spread the low 31 bits of `v` to even bit positions (0, 2, …, 60)
    * via the standard mask-and-shift doubling; shared by interpreted
    * eval and generated code so the two paths cannot drift.
    */
  def spread(v: Long): Long = {
    var x = v
    x = (x | (x << 16)) & 0x0000FFFF0000FFFFL
    x = (x | (x << 8)) & 0x00FF00FF00FF00FFL
    x = (x | (x << 4)) & 0x0F0F0F0F0F0F0F0FL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  def interleave(x: Long, y: Long): Long = {
    if (x < 0 || x >= Max || y < 0 || y >= Max)
      throw new IllegalArgumentException(
        s"graft_zorder inputs must be in [0, 2^31): got ($x, $y)")
    spread(x) | (spread(y) << 1)
  }

  def apply(x: Column, y: Column): Column =
    GraftColumnBridge.column(ZOrderValue(
      GraftColumnBridge.expression(x), GraftColumnBridge.expression(y)))
}
