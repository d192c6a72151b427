package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Native Catalyst expression computing ALL banded sign-LSH buckets of
  * an embedding in one pass: bucket b of band `bd` has bit j set iff
  * `v · planes(bd·nPlanes + j) ≥ 0` — bit-identical to the stacked
  * per-plane Column form
  * `when(graft_dot(embedding, plane) >= 0, 1L << j).otherwise(0L)`
  * including its degenerate-input convention (null vector, dimension
  * mismatch, or a null element ⇒ every dot is NULL ⇒ every bit 0 ⇒ all
  * buckets 0; the output array itself is never null).
  *
  * Why an expression and not 4×80 stacked dots: a banded self-join at
  * production recall needs hundreds of planes, and a projection of
  * hundreds of independent `graft_dot` calls exceeds the JVM's 64 KB
  * method limit — Janino fails, logs an expensive compile error, and
  * Spark falls back to the interpreted path for the WHOLE projection.
  * This kernel is one tight primitive loop regardless of band count, so
  * the signature pass stays compiled at any (nPlanes, nBands).
  */
case class SignBuckets(
    child: Expression,
    planes: Array[Array[Float]],
    nPlanes: Int)
    extends UnaryExpression {

  require(nPlanes >= 1 && nPlanes <= 62, s"nPlanes=$nPlanes out of [1, 62]")
  require(planes.nonEmpty && planes.length % nPlanes == 0,
    s"planes.length=${planes.length} must be a positive multiple of nPlanes=$nPlanes")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_sign_buckets requires array<float>, got $t")
  }

  /** One long per band. */
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  // degenerate input maps to all-zero buckets (the when/otherwise
  // convention), never to a null array
  override def nullable: Boolean = false

  /** The kernel — also invoked from generated code via a reference to
    * this expression instance, so the generated method body stays a few
    * lines at any plane count.
    */
  def compute(arr: ArrayData): ArrayData = {
    val nBands = planes.length / nPlanes
    val buckets = new Array[Long](nBands)
    val dim = planes(0).length
    if (arr != null && arr.numElements() == dim && !hasNullElement(arr)) {
      var b = 0
      while (b < planes.length) {
        val p = planes(b)
        var s = 0.0
        var i = 0
        while (i < dim) { s += arr.getFloat(i).toDouble * p(i).toDouble; i += 1 }
        // NaN sets the bit: Spark's >= orders NaN above everything
        // (nanSafeCompareDoubles), unlike Java's — required for the
        // bit-identical-to-stacked-Columns contract on NaN embeddings
        if (s >= 0 || java.lang.Double.isNaN(s)) buckets(b / nPlanes) |= 1L << (b % nPlanes)
        b += 1
      }
    }
    UnsafeArrayData.fromPrimitiveArray(buckets)
  }

  private def hasNullElement(arr: ArrayData): Boolean = {
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (arr.isNullAt(i)) return true
      i += 1
    }
    false
  }

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    compute(if (v == null) null else v.asInstanceOf[ArrayData])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val self = ctx.addReferenceObj("signBuckets", this, classOf[SignBuckets].getName)
    val arrCls = classOf[ArrayData].getName
    ev.copy(
      code = code"""
        ${childGen.code}
        $arrCls ${ev.value} = $self.compute(
          ${childGen.isNull} ? null : ${childGen.value});
        """,
      isNull = FalseLiteral)
  }

  override def prettyName: String = "graft_sign_buckets"

  override protected def withNewChildInternal(newChild: Expression): SignBuckets =
    copy(child = newChild)
}

object SignBuckets {

  /** Column wrapper: all `planes.length / nPlanes` band buckets of an
    * `array<float>` embedding column as one `array<long>`.
    */
  def signBuckets(embedding: Column, planes: Array[Array[Float]], nPlanes: Int): Column =
    GraftColumnBridge.column(
      SignBuckets(GraftColumnBridge.expression(embedding), planes, nPlanes))
}
