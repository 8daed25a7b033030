package graft.expressions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** Optimizer strength reduction: rewrites the portable HOF dot product
  *
  *   aggregate(zip_with(a, b, (x, y) => x * y), 0.0, (acc, v) => acc + v)
  *
  * into the codegen'd [[DotProduct]] expression. Users (and the oracle
  * SQL) keep writing the declarative HOF form; sessions carrying
  * [[graft.GraftExtensions]] execute the tight primitive loop instead of
  * an interpreted lambda per element. Safe because [[DotProduct]] is
  * bit-identical to the sequential HOF fold for EVERY input — same
  * left-to-right order, NULL on unequal lengths (zip_with's null
  * padding), NULL on null elements (proven in OpsSpec) — and double
  * multiply/add cannot raise under ANSI, so the eval-mode flags on the
  * lambda arithmetic are irrelevant.
  *
  * The match is deliberately conservative: exact zero literal, both
  * inputs ARRAY<DOUBLE>, lambda bodies that are a single commutative
  * multiply/add of exactly the declared lambda variables, and an
  * identity finish lambda. Anything else is left untouched.
  */
object DotProductStrengthReduction extends Rule[LogicalPlan] {

  private def isPair(l: Expression, r: Expression,
      vars: Seq[NamedExpression]): Boolean = (l, r, vars) match {
    case (a: NamedLambdaVariable, b: NamedLambdaVariable,
        Seq(v1: NamedLambdaVariable, v2: NamedLambdaVariable)) =>
      Set(a.exprId, b.exprId) == Set(v1.exprId, v2.exprId)
    case _ => false
  }

  private def isIdentity(f: Expression): Boolean = f match {
    case LambdaFunction(body: NamedLambdaVariable,
        Seq(v: NamedLambdaVariable), _) => body.exprId == v.exprId
    // Any other lambda is a REAL finish transform (e.g. acc -> acc / 10):
    // rewriting would silently drop it. Only the no-lambda case (an
    // aggregate() without finish, which analyzes to identity) may pass.
    case _: LambdaFunction => false
    case _ => true
  }

  private def arrDouble(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(
            ZipWith(a, b, LambdaFunction(Multiply(x, y, _), zipVars, _)),
            Literal(0.0, DoubleType),
            LambdaFunction(Add(l, r, _), aggVars, _),
            finish)
          if arrDouble(a) && arrDouble(b) &&
            isPair(x, y, zipVars) && isPair(l, r, aggVars) &&
            isIdentity(finish) =>
        DotProduct(a, b)
    }
}
