package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, DoubleType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** bucket(v) = number of `boundaries` strictly below `v` — an O(log P)
  * binary search replacing the O(P) chained-`when` projection that
  * ScalableWindows used for range-bucket assignment. P is the shuffle
  * partition count: a linear scan is invisible at 32 partitions but is
  * a per-row O(10^4–10^5) expression chain at 100 TB partition counts
  * (and the plan itself grows linearly in P).
  *
  * Semantics match the fold-of-whens exactly:
  *   - NULL input → bucket 0 (nulls sort first in the ASC order the
  *     buckets feed, so the null group belongs in the first bucket);
  *   - NaN → last bucket (Spark orders NaN greatest; the raw IEEE bit
  *     order `Arrays.binarySearch` uses agrees once boundaries are
  *     NaN-free, which the builder guarantees);
  *   - -0.0 normalizes to 0.0 before the search so both zeros share a
  *     bucket (Spark comparisons treat them equal; raw bit order does
  *     not).
  *
  * `boundaries` must be ascending and distinct — the builders in
  * [[graft.ops.ScalableWindows]] sort/dedup before construction.
  */
case class BoundaryBucket(child: Expression, boundaries: Seq[Double])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == DoubleType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"boundary_bucket requires a double input, got ${child.dataType}")

  override def dataType: DataType = IntegerType

  override def nullable: Boolean = false

  @transient private lazy val arr: Array[Double] = boundaries.toArray

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) 0
    else {
      val d = v.asInstanceOf[Double]
      if (java.lang.Double.isNaN(d)) arr.length
      else {
        val idx = java.util.Arrays.binarySearch(arr, d + 0.0d)
        if (idx >= 0) idx else -idx - 1
      }
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val arrRef = ctx.addReferenceObj("boundaries", arr, "double[]")
    val c = child.genCode(ctx)
    val d = ctx.freshName("bbKey")
    val idx = ctx.freshName("bbIdx")
    ev.copy(
      code = code"""
        |${c.code}
        |int ${ev.value} = 0;
        |if (!${c.isNull}) {
        |  double $d = ${c.value};
        |  if (Double.isNaN($d)) {
        |    ${ev.value} = $arrRef.length;
        |  } else {
        |    int $idx = java.util.Arrays.binarySearch($arrRef, $d + 0.0d);
        |    ${ev.value} = $idx >= 0 ? $idx : -$idx - 1;
        |  }
        |}""".stripMargin,
      isNull = FalseLiteral)
  }

  override def prettyName: String = "boundary_bucket"

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BoundaryBucket {
  def apply(col: Column, boundaries: Seq[Double]): Column =
    GraftColumnBridge.column(
      BoundaryBucket(GraftColumnBridge.expression(col), boundaries))
}

/** [[BoundaryBucket]] for string keys: the same strictly-below count,
  * comparing with `UTF8String.compareTo` — byte-for-byte the ordering
  * Spark's string sort uses, so bucket assignment never disagrees with
  * the within-bucket window order.
  */
case class StringBoundaryBucket(child: Expression, boundaries: Seq[String])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"string_boundary_bucket requires a string input, got ${child.dataType}")

  override def dataType: DataType = IntegerType

  override def nullable: Boolean = false

  @transient private lazy val arr: Array[UTF8String] =
    boundaries.map(UTF8String.fromString).toArray

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) 0
    else {
      val idx = java.util.Arrays.binarySearch(
        arr.asInstanceOf[Array[AnyRef]], v.asInstanceOf[UTF8String])
      if (idx >= 0) idx else -idx - 1
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val arrRef = ctx.addReferenceObj(
      "boundaries", arr, "org.apache.spark.unsafe.types.UTF8String[]")
    val c = child.genCode(ctx)
    val idx = ctx.freshName("sbbIdx")
    ev.copy(
      code = code"""
        |${c.code}
        |int ${ev.value} = 0;
        |if (!${c.isNull}) {
        |  int $idx = java.util.Arrays.binarySearch(
        |    (Object[]) $arrRef, (Object) ${c.value});
        |  ${ev.value} = $idx >= 0 ? $idx : -$idx - 1;
        |}""".stripMargin,
      isNull = FalseLiteral)
  }

  override def prettyName: String = "string_boundary_bucket"

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object StringBoundaryBucket {
  def apply(col: Column, boundaries: Seq[String]): Column =
    GraftColumnBridge.column(
      StringBoundaryBucket(GraftColumnBridge.expression(col), boundaries))
}
