package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into the `private[sql]` Column↔Expression converters — the
  * supported way for an external library to lift a custom Catalyst
  * Expression into the public Column algebra on Spark 4's classic
  * backend (the Column itself no longer wraps an Expression).
  */
object GraftColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Lift a custom LogicalPlan into a DataFrame (private[sql]
    * `Dataset.ofRows`) — needed to construct plans around custom
    * operator nodes like AsOfJoinPlan.
    */
  def ofRows(spark: SparkSession, plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
