package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, LongType}

/** N-ary Morton (Z-order) value: round-robin bit interleave of N
  * non-negative keys — bit i of dimension j lands at output bit
  * i·N + j, so sorting by the result clusters rows close in EVERY
  * dimension at once. The N-dimensional generalization of
  * [[ZOrderValue]] (whose 2-ary layout it reproduces bit-for-bit):
  * the write-side layout for tables filtered on three or more keys,
  * where a linear sort tightens one dimension's parquet footers and
  * leaves the rest spanning their whole domain.
  *
  * Each dimension gets ⌊62 / N⌋ bits (N = 2 → 31, matching
  * [[ZOrderValue]]; N = 3 → 20; N = 4 → 15), and inputs outside
  * [0, 2^bits) ERROR — silent masking would corrupt the locality the
  * caller asked for, the same contract as the 2-ary form. A native
  * expression with `doGenCode`, so the value computes inside
  * whole-stage codegen during the write-side repartition+sort.
  */
case class ZOrderValueN(children: Seq[Expression]) extends Expression {

  require(children.size >= 2 && children.size <= 8,
    s"graft_zorder_n takes 2–8 keys, got ${children.size}")

  private val bits = 62 / children.size

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(_.dataType == LongType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_zorder_n requires all-bigint inputs, got " +
        children.map(_.dataType.simpleString).mkString("(", ", ", ")"))

  override def dataType: DataType = LongType
  override def nullable: Boolean = children.exists(_.nullable)

  override def eval(input: InternalRow): Any = {
    val vs = new Array[Long](children.size)
    var i = 0
    while (i < children.size) {
      val v = children(i).eval(input)
      if (v == null) return null
      vs(i) = v.asInstanceOf[Long]
      i += 1
    }
    ZOrderValueN.interleaveN(vs, bits)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val evals = children.map(_.genCode(ctx))
    val anyNull = evals.map(_.isNull).mkString(" || ")
    val values = evals.map(_.value).mkString(", ")
    ev.copy(code =
      code"""
        ${evals.map(_.code).reduce(_ + _)}
        boolean ${ev.isNull} = $anyNull;
        long ${ev.value} = -1L;
        if (!${ev.isNull}) {
          ${ev.value} = graft.functions.ZOrderValueN.interleaveN(
            new long[]{$values}, $bits);
        }""")
  }

  override def prettyName: String = "graft_zorder_n"

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(children = newChildren)
}

object ZOrderValueN {

  /** Round-robin interleave of `vs` with `bits` bits per dimension;
    * shared by interpreted eval and generated code so the two paths
    * cannot drift. O(N·bits) ≤ 62 trivial ops per row.
    */
  def interleaveN(vs: Array[Long], bits: Int): Long = {
    val n = vs.length
    var out = 0L
    var j = 0
    while (j < n) {
      val v = vs(j)
      if (v < 0 || v >= (1L << bits))
        throw new IllegalArgumentException(
          s"graft_zorder_n inputs must be in [0, 2^$bits) for $n keys: got ${vs(j)}")
      var i = 0
      while (i < bits) {
        out |= ((v >> i) & 1L) << (i * n + j)
        i += 1
      }
      j += 1
    }
    out
  }

  def apply(cols: Column*): Column =
    GraftColumnBridge.column(ZOrderValueN(
      cols.map(GraftColumnBridge.expression)))
}
