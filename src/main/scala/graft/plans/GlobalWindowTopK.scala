package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer guard for the single-task global-window top-k antipattern.
  *
  * `SELECT ... , row_number() OVER (ORDER BY s) rn ... WHERE rn <= k` is
  * the SQL users naturally write for "top k overall" — and Spark plans
  * the empty-PARTITION-BY window as a FULL GLOBAL SORT in ONE task (every
  * row shuffles to a single partition), the classic 100 TB cliff this
  * library's own operators avoid via bounded aggregators. This rule
  * rewrites the logical plan to feed the window only the rows that can
  * survive the filter:
  *
  * {{{
  *   Filter(rn <= k, Window([row_number() ORDER BY s AS rn], Nil, s, c))
  * → Filter(rn <= k, Window(..., Limit(k, Sort(s, global, c))))
  * }}}
  *
  * A global Sort+Limit plans as `TakeOrderedAndProject` — per-partition
  * bounded top-k heaps merged once — so the surviving window sorts only
  * k rows in its single task. Output is identical up to the order of
  * sort-key TIES, exactly the license the original single-task plan
  * already has (tie order after an exchange is unspecified either way).
  *
  * Deliberately narrow (rewrites must be provably safe):
  *  - exactly ONE window expression, and it is `row_number()` — other
  *    functions (rank needs the peers of row k; aggregates may need the
  *    whole frame) are left alone;
  *  - empty partitionSpec (the per-key form is already parallel);
  *  - the k bound is a conjunct `rn <= lit` / `rn < lit` of the filter
  *    directly above (extra conjuncts stay in the filter — they only
  *    shrink the result further, so the limit stays an upper bound);
  *  - idempotence guard: the child is not already the injected
  *    Limit-over-Sort on the same order.
  */
object GlobalWindowTopK extends Rule[LogicalPlan] {

  private def boundFrom(cond: Expression, rn: Attribute): Option[Int] = {
    val ks = splitConjunctivePredicates(cond).collect {
      case LessThanOrEqual(a: AttributeReference, IntegerLiteral(k))
        if a.exprId == rn.exprId => k
      case LessThan(a: AttributeReference, IntegerLiteral(k))
        if a.exprId == rn.exprId => k - 1
      case EqualTo(a: AttributeReference, IntegerLiteral(k))
        if a.exprId == rn.exprId => k
    }
    if (ks.isEmpty) None else Some(ks.min)
  }

  private def splitConjunctivePredicates(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjunctivePredicates(l) ++ splitConjunctivePredicates(r)
    case other => Seq(other)
  }

  private def alreadyRewritten(w: Window): Boolean = w.child match {
    case GlobalLimit(_, LocalLimit(_, Sort(so, true, _, _))) => so == w.orderSpec
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, w: Window)
        if w.partitionSpec.isEmpty && w.orderSpec.nonEmpty &&
          w.windowExpressions.size == 1 && !alreadyRewritten(w) =>
      w.windowExpressions.head match {
        case a @ Alias(WindowExpression(_: RowNumber, _), _) =>
          boundFrom(cond, a.toAttribute) match {
            case Some(k) if k >= 0 =>
              f.copy(child = w.copy(child =
                Limit(Literal(k), Sort(w.orderSpec, global = true, w.child))))
            case _ => f
          }
        case _ => f
      }
  }
}
