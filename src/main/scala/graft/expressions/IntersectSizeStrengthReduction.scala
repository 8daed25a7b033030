package graft.expressions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, StringType}

/** Optimizer strength reduction: rewrites the counting form
  *
  *   size(array_intersect(a, b))          (string elements)
  *
  * into the native [[IntersectSize]] — the general-count complement of
  * [[OverlapStrengthReduction]]'s existence-test rewrite. ArrayIntersect
  * materializes the whole intersection array per row only for Size to
  * collapse it to one int; the native count never allocates the result.
  *
  * Interplay with the overlap rule (registration order in
  * [[graft.GraftExtensions]] puts overlap FIRST): a `size(...) > 0`
  * predicate over non-nullable elements becomes ArraysOverlap — the
  * short-circuiting form, strictly better for existence — before this
  * rule runs; everything still counting afterwards (threshold compares,
  * projected inter columns, nullable-element predicates the overlap
  * rule must skip) is rewritten here.
  *
  * Fires only for the non-legacy Size (`legacySizeOfNull = false`, the
  * Spark 3+ default, carried as the Size expression's second field):
  * legacy size(NULL) = −1 while a null input to the native expression
  * yields NULL — the same guard the overlap rule documents. No
  * containsNull restriction: [[IntersectSizeUtil.count]] reproduces the
  * both-sides-have-null-counts-once semantics of the built-in chain.
  */
object IntersectSizeStrengthReduction extends Rule[LogicalPlan] {

  private def strElems(e: Expression): Boolean = e.dataType match {
    case ArrayType(StringType, _) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case Size(ArrayIntersect(a, b), false) if strElems(a) && strElems(b) =>
        IntersectSize(a, b)
      // the union half of the Jaccard verify — same argument, same
      // string-only restriction; array_union keeps one null from
      // whichever side, which UnionSizeUtil reproduces
      case Size(ArrayUnion(a, b), false) if strElems(a) && strElems(b) =>
        UnionSize(a, b)
      // the unary member: distinct-count statistics (distinct ratio,
      // duplicate-gram fraction) never materialize the distinct array
      case Size(ArrayDistinct(a), false) if strElems(a) =>
        DistinctSize(a)
    }
}
