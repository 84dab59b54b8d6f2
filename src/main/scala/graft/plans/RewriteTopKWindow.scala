package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Window}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule (the Rule[LogicalPlan] rung of the Catalyst ladder):
  * rewrites the idiomatic per-key top-k pattern
  *
  *   Filter(rn <= k, Window(row_number() over (partition, order) as rn))
  *
  * into the same Window over TopKPerKeyPlan(k, ...): the bounded-heap
  * operator shrinks each key to k rows FIRST, then row_number runs over
  * k*keys rows instead of the full input — so users keep writing the
  * standard window formulation and still get the heap plan. The
  * filter + window stay on top (now near-free), which keeps the rn
  * column available to downstream projections and preserves output
  * semantics exactly (modulo row_number's own tie arbitrariness, which
  * the pattern already had).
  *
  * An EMPTY partition list is the global-top-k form (rank over the
  * whole input, e.g. BM25's top-20): the rewrite plugs in the
  * operator's AllTuples mode, so the single-partition Window sorts k
  * rows after per-partition heaps + a k-row merge, instead of pulling
  * every scored row through one global Sort.
  *
  * Installed idempotently via experimental.extraOptimizations
  * (GraftExtensions.register) — the TopKPerKeyPlan child guard stops
  * re-application on the rewritten plan.
  */
object RewriteTopKWindow extends Rule[LogicalPlan] {

  private def boundOf(cond: Expression, rnId: ExprId): Option[Int] = cond match {
    case LessThanOrEqual(a: AttributeReference, Literal(k: Int, _))
      if a.exprId == rnId && k > 0 => Some(k)
    case LessThan(a: AttributeReference, Literal(k: Int, _))
      if a.exprId == rnId && k > 1 => Some(k - 1)
    case EqualTo(a: AttributeReference, Literal(1, _))
      if a.exprId == rnId => Some(1)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond,
        w @ Window(Seq(a @ Alias(
          WindowExpression(RowNumber(), WindowSpecDefinition(part, order, _)),
          _)), _, _, child, _))
        if order.nonEmpty &&
          !child.isInstanceOf[TopKPerKeyPlan] =>
      boundOf(cond, a.exprId) match {
        case Some(k) =>
          Filter(cond, w.copy(child = TopKPerKeyPlan(k, part, order, child)))
        case None => f
      }
  }
}

object RewriteTopKWindowInstaller {
  /** Idempotent runtime install. Rule and strategy are checked
    * INDEPENDENTLY: if a caller installed (or cleared) one without the
    * other, a later install() still completes the pair — a rewritten
    * TopKPerKeyPlan must never reach planning without its strategy. */
  def install(spark: SparkSession): Unit = {
    if (!spark.experimental.extraOptimizations.contains(RewriteTopKWindow))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ RewriteTopKWindow
    if (!spark.experimental.extraStrategies.contains(TopKPerKeyStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKPerKeyStrategy
  }
}
