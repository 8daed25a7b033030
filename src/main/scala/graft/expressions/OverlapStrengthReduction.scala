package graft.expressions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, IntegerType}

/** Optimizer strength reduction: rewrites the existence test
  *
  *   size(array_intersect(a, b)) > 0      (or `0 < size(...)`)
  *
  * into `arrays_overlap(a, b)`. ArrayIntersect materializes the full
  * intersection (hash set build + probe over every element) only for the
  * result to be collapsed to a boolean; ArraysOverlap short-circuits on
  * the first common element — the asymptotic win for wide arrays (e.g.
  * shingle sets in candidate-overlap predicates).
  *
  * Null discipline (the lesson [[DotProductStrengthReduction]] learned
  * the hard way): the two forms disagree when element nulls are
  * possible — `arrays_overlap` yields NULL when there is no non-null
  * common element but either side contains a null, while the size form
  * yields true when BOTH sides contain null (intersect keeps one null)
  * and false otherwise. So the rule fires only when both array types
  * carry containsNull=false. It also requires legacySizeOfNull=false on
  * the matched Size (legacy size(NULL) = -1 turns the predicate into
  * `false` where overlap gives NULL). Both null-array behaviours then
  * agree: null input → null comparison, null overlap.
  */
object OverlapStrengthReduction extends Rule[LogicalPlan] {

  private def nonNullElems(e: Expression): Boolean = e.dataType match {
    case ArrayType(_, containsNull) => !containsNull
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case GreaterThan(Size(ArrayIntersect(a, b), false), Literal(0, IntegerType))
          if nonNullElems(a) && nonNullElems(b) =>
        ArraysOverlap(a, b)
      case LessThan(Literal(0, IntegerType), Size(ArrayIntersect(a, b), false))
          if nonNullElems(a) && nonNullElems(b) =>
        ArraysOverlap(a, b)
    }
}
