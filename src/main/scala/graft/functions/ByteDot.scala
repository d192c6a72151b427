package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, ByteType, DataType, LongType}

/** Native Catalyst expression for the int8-vector dot product — the
  * candidate-stage kernel of the quantized two-stage scan
  * ([[graft.vector.Quantize.quantizedPairsAbove]]).
  *
  * Semantically the higher-order-function form
  *   aggregate(zip_with(a, b, (x,y) -> CAST(x AS BIGINT)*CAST(y AS BIGINT)),
  *             0L, (s,x) -> s + x)
  * including null-on-length-mismatch / null-element poisoning — but
  * whole-stage-codegen'd into a primitive byte loop. The HOF form
  * allocates an intermediate array and interprets a lambda per element,
  * which is ruinous inside an O(n²) candidate cross join (measured 10×
  * slower than this expression at sf0.1); the int64 accumulator is
  * exact (|q|≤127 ⇒ |Σ q_i·p_i| ≤ d·2¹⁴, nowhere near overflow).
  */
case class ByteDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(ByteType, _), ArrayType(ByteType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"graft_bytedot requires (array<tinyint>, array<tinyint>), got ($l, $r)")
    }

  override def dataType: DataType = LongType

  // null on null input, on length mismatch, AND on any null element —
  // exactly the fold's null poisoning
  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) null
    else {
      val n = x.numElements()
      var s = 0L
      var i = 0
      while (i < n) {
        if (x.isNullAt(i) || y.isNullAt(i)) return null
        s += x.getByte(i).toLong * y.getByte(i).toLong
        i += 1
      }
      s
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  final int $n = $a.numElements();
         |  long $s = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $s += (long) $a.getByte($i) * (long) $b.getByte($i);
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $s; }
         |}
       """.stripMargin
    })

  override def prettyName: String = "graft_bytedot"

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ByteDot =
    copy(left = newLeft, right = newRight)
}
