package graft.plans

import org.apache.spark.sql.catalyst.expressions.{And, AttributeSet, PredicateHelper}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: a Filter over only the GROUP columns commutes with
  * per-group top-k (it removes whole groups, never reorders rows within
  * one), so it can sink below [[TopKPerGroup]] — from where Catalyst's
  * stock rules push it further into the scan. Without this, a query like
  * `topK(per supplier).filter(supplier = 3)` heaps every supplier's rows
  * first and discards all but one group after the exchange.
  */
object PushFilterThroughTopK extends Rule[LogicalPlan] with PredicateHelper {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    // Soundness guards: (1) only when groups are bare attributes — a
    // predicate over the *references* of `x % 10` is not group-uniform,
    // so pushing it would drop rows from inside groups; (2) only
    // deterministic conjuncts — pushing rand() < p would resample the
    // input instead of sampling the winners.
    case f @ Filter(cond, t @ TopKPerGroup(groupExprs, _, _, child))
        if groupExprs.forall(_.isInstanceOf[org.apache.spark.sql.catalyst.expressions.Attribute]) =>
      val groupAttrs = AttributeSet(groupExprs)
      val (pushable, rest) = splitConjunctivePredicates(cond)
        .partition(p => p.deterministic && p.references.subsetOf(groupAttrs))
      if (pushable.isEmpty) f
      else {
        val pushed = t.copy(child = Filter(pushable.reduce(And), child))
        rest.reduceOption(And).map(Filter(_, pushed)).getOrElse(pushed)
      }
  }
}
