package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftColumnBridge, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Native merge-based AS-OF join — the whole-operator custom path of
  * SURVEY §4.3.1 / the builder brief's option (c): a custom LogicalPlan
  * + Strategy + SparkPlan, registered via `SparkSessionExtensions`
  * (GraftExtensions) or `spark.experimental.extraStrategies`
  * (Engine.configure).
  *
  * Semantics (DuckDB `ASOF LEFT JOIN` on this contract's data): for
  * each left row, the right row with equal key and the greatest
  * `rightTs <= leftTs`; ties on `rightTs` resolved by the greatest
  * `rightTie`; unmatched left rows keep NULL right columns.
  *
  * Physical shape: both sides hash-partitioned on the key (one exchange
  * each — same as the union+window form) and sorted within partitions;
  * the merge is a single forward pass holding ONE candidate row —
  * no window state, no row blowup, and the sort feeds straight into a
  * streaming merge exactly like SortMergeJoin.
  */
final case class AsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftTs: Expression,
    rightTs: Expression,
    rightTie: Expression) extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): LogicalPlan =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lts, rts, tie) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lts, rts, tie) :: Nil
    case _ => Nil
  }
}

final case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftTs: Expression,
    rightTs: Expression,
    rightTie: Expression) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  // co-partition both sides on the key (EnsureRequirements inserts the
  // exchanges and guarantees matching partitioning, as for SMJ)
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  // merge order: key, then ts (right also tie-asc so the LAST row ≤ ts
  // is the max-(ts, tie) winner)
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending),
      SortOrder(rightTie, Ascending)))

  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending))

  override protected def doExecute(): RDD[InternalRow] = {
    val keyOrd = TypeUtils.getInterpretedOrdering(leftKey.dataType)
    val tsOrd = TypeUtils.getInterpretedOrdering(leftTs.dataType)
    val leftOut = left.output
    val rightOut = right.output
    val lk = leftKey
    val rk = rightKey
    val lts = leftTs
    val rts = rightTs
    val out = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      // bound per-partition projections (codegen objects are not
      // serializable; instantiate inside the task)
      val lKeyProj = UnsafeProjection.create(Seq(lk), leftOut)
      val lTsProj = UnsafeProjection.create(Seq(lts), leftOut)
      val rKeyProj = UnsafeProjection.create(Seq(rk), rightOut)
      val rTsProj = UnsafeProjection.create(Seq(rts), rightOut)
      // bind the right side as NULLABLE regardless of its schema: an
      // unmatched left row joins a null-filled right row, and
      // BindReferences takes nullability from this input sequence — a
      // non-nullable right attr would skip the isNullAt check and read
      // garbage zeros instead of NULL
      val outProj = UnsafeProjection.create(out,
        leftOut ++ rightOut.map(_.withNullability(true)))
      val nullRight = new GenericInternalRow(rightOut.size)
      val joined = new JoinedRow
      val rBuf = rIter.buffered

      var candidate: InternalRow = null // latest right row ≤ current left ts
      var candidateKey: Any = null

      // copyValue: the projection reuses ONE buffer, so buffer-backed
      // values (UTF8String, arrays) would be silently overwritten by
      // the next projection call — fatal for candidateKey, which must
      // survive across merge steps
      def keyOf(proj: UnsafeProjection, row: InternalRow, dt: Expression): Any = {
        val r = proj(row)
        if (r.isNullAt(0)) null else InternalRow.copyValue(r.get(0, dt.dataType))
      }

      lIter.map { lRow =>
        val lKey = keyOf(lKeyProj, lRow, lk)
        val lTs = keyOf(lTsProj, lRow, lts)
        if (lKey != null && lTs != null) {
          // drop candidate from a previous key group
          if (candidate != null && keyOrd.compare(candidateKey.asInstanceOf[AnyRef],
              lKey.asInstanceOf[AnyRef]) != 0) {
            candidate = null; candidateKey = null
          }
          // advance right while (rKey < lKey) or (rKey == lKey && rTs <= lTs)
          var advancing = true
          while (advancing && rBuf.hasNext) {
            val head = rBuf.head
            val rKeyV = keyOf(rKeyProj, head, rk)
            if (rKeyV == null) { rBuf.next() } // null keys never match
            else {
              val c = keyOrd.compare(rKeyV.asInstanceOf[AnyRef], lKey.asInstanceOf[AnyRef])
              if (c < 0) { rBuf.next() } // behind: skip (smaller keys already served)
              else if (c == 0) {
                val rTsV = keyOf(rTsProj, head, rts)
                if (rTsV != null &&
                  tsOrd.compare(rTsV.asInstanceOf[AnyRef], lTs.asInstanceOf[AnyRef]) <= 0) {
                  candidate = rBuf.next().copy() // sorted asc ⇒ last kept = max (ts, tie)
                  candidateKey = rKeyV
                } else if (rTsV == null) { rBuf.next() }
                else advancing = false
              } else advancing = false
            }
          }
        }
        val matched = candidate != null && lKey != null &&
          keyOrd.compare(candidateKey.asInstanceOf[AnyRef], lKey.asInstanceOf[AnyRef]) == 0
        outProj(joined(lRow, if (matched) candidate else nullRight))
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): SparkPlan =
    copy(left = newLeft, right = newRight)
}

/** Public API: `AsOfJoin.asof(clicks, purchases, "user_id", "user_id",
  * "ts", "ts", "event_id")` → left columns + matched right columns.
  */
object AsOfJoin {

  def asof(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTs: String,
      rightTs: String,
      rightTie: String): DataFrame = {
    val spark = left.sparkSession
    registerStrategy(spark)
    val lp = left.queryExecution.analyzed
    val rp = right.queryExecution.analyzed
    // self-join safety: shared attribute lineage would duplicate exprIds
    // in the output; force the caller to alias one side (as any
    // self-join in Spark must)
    require(lp.outputSet.intersect(rp.outputSet).isEmpty,
      "as-of join sides share attribute lineage — alias the right side's columns")
    def attr(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, n: String) =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"no column '$n' in ${p.output.map(_.name)}"))
    GraftColumnBridge.ofRows(spark,
      AsOfJoinPlan(lp, rp,
        attr(lp, leftKey), attr(rp, rightKey),
        attr(lp, leftTs), attr(rp, rightTs), attr(rp, rightTie)))
  }

  /** Idempotently add the planner strategy to a session. */
  def registerStrategy(spark: SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy
}
