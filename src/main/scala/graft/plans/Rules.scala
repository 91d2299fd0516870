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
    case f @ Filter(cond, t @ TopKPerGroup(groupExprs, _, _, child)) =>
      val groupAttrs = AttributeSet(groupExprs.flatMap(_.references))
      val (pushable, rest) =
        splitConjunctivePredicates(cond).partition(_.references.subsetOf(groupAttrs))
      if (pushable.isEmpty) f
      else {
        val pushed = t.copy(child = Filter(pushable.reduce(And), child))
        rest.reduceOption(And).map(Filter(_, pushed)).getOrElse(pushed)
      }
  }
}
