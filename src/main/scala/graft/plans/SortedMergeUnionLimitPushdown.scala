package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Ascending, IntegerLiteral, SortOrder}
import org.apache.spark.sql.catalyst.plans.logical.{GlobalLimit, LocalLimit, Limit, LogicalPlan, Sort}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: push a limit over `SortedMergeUnion` down to every
  * child as a per-child top-n.
  *
  * `merge(k series).limit(n)` ("earliest n events across series" — the
  * reference's early-terminating iteratee, `Done` at
  * `marketdb-iteratee/.../TimeSeriesEnumerator.scala:81-82`) only ever
  * needs the first n rows OF EACH CHILD: any row beyond a child's own
  * top-n can never reach the merged top-n. Rewriting each child to
  * `Limit(n, Sort(time))` makes the planner emit a per-child
  * `TakeOrderedAndProject` — a bounded-heap top-n (O(n) memory, no
  * full-sort spill), running in parallel per child — and the merge then
  * touches n·k rows instead of everything. Correct for ANY child data,
  * sorted or not, because the pushed Sort re-establishes the order the
  * limit depends on (and costs nothing extra: the merge exec's
  * requiredChildOrdering would sort unsorted children anyway).
  *
  * Spark's own `LimitPushDown` handles plain Union but does not know
  * `SortedMergeUnion`; this is the custom-`Rule[LogicalPlan]` layer of
  * the operator (Expression / LogicalPlan / Strategy / Rule /
  * Extensions — SURVEY §2-custom preference (c)).
  */
object SortedMergeUnionLimitPushdown extends Rule[LogicalPlan] {

  private def alreadyPushed(child: LogicalPlan, n: Int): Boolean = child match {
    case GlobalLimit(IntegerLiteral(m), _) => m <= n
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    case g @ GlobalLimit(IntegerLiteral(n),
        l @ LocalLimit(IntegerLiteral(_), smu: SortedMergeUnion))
        if !smu.children.forall(alreadyPushed(_, n)) =>
      val limited = smu.children.map {
        case c if alreadyPushed(c, n) => c
        case c =>
          // pushed order = time + caller-supplied tiebreaks: with a
          // per-child total order the pushed top-n is the SAME row set
          // as the unpushed plan; time alone leaves limit-with-ties
          // nondeterminism when equal timestamps straddle row n
          val sortOrders = smu.orderCols.map { name =>
            val attr = c.output.find(_.name == name).getOrElse(
              throw new IllegalStateException(
                s"$name missing in merge child output"))
            SortOrder(attr, Ascending)
          }
          Limit(org.apache.spark.sql.catalyst.expressions.Literal(n),
            Sort(sortOrders, global = true, c))
      }
      g.copy(child = l.copy(child = smu.copy(children = limited)))
  }
}
