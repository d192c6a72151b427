package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

/** Optimizer rule: rewrite the certified higher-order-function dot
  * product
  *   aggregate(zip_with(a, b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),
  *             0.0D, (s, x) -> s + x)
  * into the codegen'd [[DotProduct]] expression whenever `a`/`b` are
  * float arrays. SQL (E1) users writing the portable fold form get the
  * native kernel automatically — the DataFrame API (E2) already calls
  * `VectorFunctions.dot` directly.
  *
  * Strictly semantics-preserving: DotProduct accumulates left-to-right
  * in double over float32 elements and returns NULL on null input,
  * length mismatch (zip_with's null padding poisons the sum) and null
  * elements — the exact fold behavior, so certified hashes are
  * unchanged (ExtensionsSpec re-checks L06/L07 against §2.4).
  *
  * Matches only the exact certified shape (multiply of the two lambda
  * variables cast to double, literal 0.0 seed, plain `s + x` merge,
  * identity finish) — anything else is left to the interpreter.
  */
object DotProductRewrite extends Rule[LogicalPlan] {

  private def isFloatArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  private def isDoubleCastOf(e: Expression, v: NamedLambdaVariable): Boolean = e match {
    case Cast(child: NamedLambdaVariable, DoubleType, _, _) => child.exprId == v.exprId
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case ArrayAggregate(
        ZipWith(a, b,
          LambdaFunction(Multiply(mx, my, _),
            Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _)),
        Literal(zero, DoubleType),
        LambdaFunction(Add(ms: NamedLambdaVariable, me: NamedLambdaVariable, _),
          Seq(s: NamedLambdaVariable, e: NamedLambdaVariable), _),
        LambdaFunction(fin: NamedLambdaVariable, Seq(lf: NamedLambdaVariable), _))
      // positive zero ONLY: boxed `== 0.0` would also admit -0.0, whose
      // fold result on an empty array is -0.0, not DotProduct's 0.0; and
      // a NULL seed (Literal(null, DoubleType)) folds to NULL, which
      // DotProduct would not — null.asInstanceOf[Double] unboxes to 0.0,
      // so the null check must come before the bit check
      if zero != null &&
        java.lang.Double.doubleToRawLongBits(zero.asInstanceOf[Double]) == 0L &&
        isFloatArray(a) && isFloatArray(b) &&
        isDoubleCastOf(mx, x) && isDoubleCastOf(my, y) &&
        ms.exprId == s.exprId && me.exprId == e.exprId &&
        fin.exprId == lf.exprId =>
      DotProduct(a, b)
  }
}
