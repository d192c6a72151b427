package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{DotProduct, DotProductRewrite}

/** Session-extension entry point: register the engine's native
  * expressions and optimizer rules with any session via
  *   spark.sql.extensions=graft.GraftExtensions
  * (or `SparkSession.builder.withExtensions(new GraftExtensions)`).
  * Runtime registration for an existing session is
  * [[graft.functions.VectorFunctions.register]] + [[graft.core.Engine.configure]].
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2, "graft_dot(a, b) takes two array<float> args")
        DotProduct(exprs.head, exprs(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_zorder"),
      new ExpressionInfo(classOf[graft.functions.ZOrderValue].getName, "graft_zorder"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2, "graft_zorder(x, y) takes two bigint args")
        graft.functions.ZOrderValue(exprs.head, exprs(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_nfc"),
      new ExpressionInfo(classOf[graft.functions.NfcNormalize].getName, "graft_nfc"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 1, "graft_nfc(s) takes one string arg")
        graft.functions.NfcNormalize(exprs.head)
      }))
    // SQL-dialect aggregate(zip_with(...)) folds → codegen'd DotProduct
    ext.injectOptimizerRule(_ => DotProductRewrite)
    // native merge-based as-of join (AsOfJoinPlan → AsOfJoinExec)
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
  }
}
