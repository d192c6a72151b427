package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** h ↦ a·h + b over Z/2^64 (Java wrapping semantics) — the universal
  * linear hash family used to derive many MinHash functions from one
  * base hash. A native expression because Spark's ANSI mode (default
  * on) rejects wrapping long arithmetic in Column math.
  */
case class LinearHash(child: Expression, a: Long, b: Long)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_linear_hash requires bigint input, got ${child.dataType}")

  override def dataType: DataType = LongType

  override protected def nullSafeEval(input: Any): Any =
    input.asInstanceOf[Long] * a + b

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"$c * ${a}L + ${b}L")

  override def prettyName: String = "graft_linear_hash"

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object LinearHash {
  def apply(col: Column, a: Long, b: Long): Column =
    GraftColumnBridge.column(LinearHash(GraftColumnBridge.expression(col), a, b))
}
