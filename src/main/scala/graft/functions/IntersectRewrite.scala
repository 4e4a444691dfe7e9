package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ArrayDistinct, ArraySort, Expression, GreaterThan, If, LambdaFunction, LessThan, Literal, NamedLambdaVariable, Size}
import org.apache.spark.sql.catalyst.expressions.ArrayIntersect
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, LongType}

/** Optimizer rule: `size(array_intersect(x, y))` → [[SortedIntersectSize]]
  * when BOTH inputs are syntactically `array_sort(array_distinct(_))` over
  * `array<bigint>` — the one shape where the allocation-free merge walk is
  * provably answer-equivalent to the built-in (sorted: the walk's
  * precondition; distinct: intersect-size equals matched-element count;
  * the sort itself guarantees non-null array elements order like Spark's
  * default ascending comparator, which the walk follows).
  *
  * This is the `Rule[LogicalPlan]` extension point (SURVEY.md §7 deferred
  * it "until measurements demand" — the dedup verify loop did): a user
  * who writes the built-in formulation gets the native kernel without
  * knowing it exists, exactly how Spark's own ReplaceExpressions swaps
  * runtime-replaceable expressions. The rewrite fires on the OPTIMIZED
  * logical plan, so it composes with filter pushdown and join reordering;
  * it never fires on arrays of any other element type or provenance —
  * unsorted input would silently undercount, so the guard is the rule.
  */
object IntersectRewrite extends Rule[LogicalPlan] {

  /** The sort must be Spark's DEFAULT ascending comparator — the merge
    * walk's order precondition. `array_sort(x, customLambda)` (say, a
    * descending comparator) still pattern-matches `ArraySort(...)`, so the
    * comparator itself is checked: rebuild [[ArraySort.comparator]]'s body
    * over THIS node's bound lambda variables and compare semantically.
    * Over the non-null elements the type guard admits, the optimizer's
    * constant folding strips the default body's IsNull branches before
    * this rule sees it, so the null-free simplification
    * `if (l < r) -1 else if (l > r) 1 else 0` is accepted as the same
    * comparator. Anything else — reversed, keyed, null-first — would
    * silently undercount if rewritten.
    */
  private def isDefaultComparator(f: Expression): Boolean = f match {
    case LambdaFunction(body,
        Seq(l: NamedLambdaVariable, r: NamedLambdaVariable), _) =>
      val nullFree = If(LessThan(l, r), Literal(-1),
        If(GreaterThan(l, r), Literal(1), Literal(0)))
      body.semanticEquals(ArraySort.comparator(l, r)) ||
        body.semanticEquals(nullFree)
    case _ => false
  }

  /** Fires only for `array<bigint>` with containsNull = FALSE: a null
    * element would sort last and the walk would read its slot as a raw
    * long — a silent divergence from the built-in, which treats null as a
    * distinct intersectable value. The nullability bit is the proof the
    * slot-read is safe.
    */
  private def sortedDistinctLongs(e: Expression): Boolean = e match {
    case ArraySort(ArrayDistinct(inner), f, _) if isDefaultComparator(f) =>
      inner.dataType match {
        case ArrayType(LongType, false) => true
        case _ => false
      }
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case Size(ArrayIntersect(x, y), legacy)
          if sortedDistinctLongs(x) && sortedDistinctLongs(y) && !legacy =>
        SortedIntersectSize(x, y)
    }
}
