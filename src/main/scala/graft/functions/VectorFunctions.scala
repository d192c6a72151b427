package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression for the float-vector dot product.
  *
  * Semantically identical to the certified higher-order-function form
  *   aggregate(zip_with(a, b, (x,y) -> CAST(x AS DOUBLE)*CAST(y AS DOUBLE)),
  *             0.0D, (s,x) -> s + x)
  * — left-to-right IEEE-double accumulation over float32 elements,
  * INCLUDING the null-on-length-mismatch behavior (zip_with pads the
  * shorter side with nulls, which poison the sum) — but whole-stage-
  * codegen'd into a tight primitive loop instead of a per-element lambda
  * interpreter. A ragged/corrupt embedding therefore yields a detectable
  * NULL, never a silently-truncated score. On unit vectors the dot
  * product IS the cosine similarity, which makes this the kernel of
  * L06/L07 and of the ANN/near-dup scale paths.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"graft_dot requires (array<float>, array<float>), got ($l, $r)")
    }

  override def dataType: DataType = DoubleType

  // null on null input, on length mismatch, AND on any null element —
  // exactly the fold's null poisoning
  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) null
    else {
      val n = x.numElements()
      var s = 0.0
      var i = 0
      while (i < n) {
        if (x.isNullAt(i) || y.isNullAt(i)) return null
        s += x.getFloat(i).toDouble * y.getFloat(i).toDouble
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
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $s += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $s; }
         |}
       """.stripMargin
    })

  override def prettyName: String = "graft_dot"

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Column-level vector API (E2) + SQL registration (E1). */
object VectorFunctions {

  /** Dot product of two float-array columns, accumulated in double. */
  def dot(a: Column, b: Column): Column =
    GraftColumnBridge.column(
      DotProduct(GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  /** Cosine similarity: dot product over unit-normalized vectors. */
  def cosine(a: Column, b: Column): Column = dot(a, b)

  /** Exact int64 dot product of two int8-array columns — the quantized
    * candidate-scan kernel.
    */
  def byteDot(a: Column, b: Column): Column =
    GraftColumnBridge.column(
      ByteDot(GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  /** Register `graft_dot` with a session's function registry so the SQL
    * front end (E1) can use it too. Idempotent.
    */
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    val ident = org.apache.spark.sql.catalyst.FunctionIdentifier("graft_dot")
    registry.registerFunction(
      ident,
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2, "graft_dot(a, b) takes two array<float> args")
        DotProduct(exprs.head, exprs(1))
      })
    registry.registerFunction(
      org.apache.spark.sql.catalyst.FunctionIdentifier("graft_zorder"),
      new ExpressionInfo(classOf[ZOrderValue].getName, "graft_zorder"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2, "graft_zorder(x, y) takes two bigint args")
        ZOrderValue(exprs.head, exprs(1))
      })
    registry.registerFunction(
      org.apache.spark.sql.catalyst.FunctionIdentifier("graft_zorder_n"),
      new ExpressionInfo(classOf[ZOrderValueN].getName, "graft_zorder_n"),
      (exprs: Seq[Expression]) => ZOrderValueN(exprs))
    registry.registerFunction(
      org.apache.spark.sql.catalyst.FunctionIdentifier("graft_deflate_len"),
      new ExpressionInfo(classOf[DeflateLen].getName, "graft_deflate_len"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 1, "graft_deflate_len(s) takes one string arg")
        DeflateLen(exprs.head)
      })
    registry.registerFunction(
      org.apache.spark.sql.catalyst.FunctionIdentifier("graft_nfc"),
      new ExpressionInfo(classOf[NfcNormalize].getName, "graft_nfc"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 1, "graft_nfc(s) takes one string arg")
        NfcNormalize(exprs.head)
      })
  }

  /** Column form of [[DeflateLen]]. */
  def deflateLen(s: Column): Column =
    GraftColumnBridge.column(DeflateLen(GraftColumnBridge.expression(s)))
}
