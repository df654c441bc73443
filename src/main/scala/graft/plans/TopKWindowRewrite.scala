package graft.plans

import org.apache.spark.sql.catalyst.expressions.{
  Alias, Attribute, EqualTo, Expression, IntegerLiteral, LessThan,
  LessThanOrEqual, RowNumber, WindowExpression}
import org.apache.spark.sql.catalyst.plans.logical.{
  Filter, LogicalPlan, Window}
import org.apache.spark.sql.catalyst.rules.Rule

/** Opt-in optimizer rule (the Rule[LogicalPlan] extension surface —
  * graft's fourth Catalyst extension kind after scalar expressions, the
  * generator, and the planner strategy): recognizes the ubiquitous
  * per-group top-k idiom
  *
  *   Filter(rn <= k, Window(row_number() OVER (PARTITION BY g ORDER BY o)))
  *
  * and inserts [[TopKPerGroup]] BELOW the window, so the window only
  * ranks the ≤ k·|groups| surviving rows instead of sorting the whole
  * child. The Filter and Window stay in place — the rewrite is
  * semantics-preserving by construction (TopKPerGroup keeps exactly the
  * rows whose row_number can be ≤ k), the rn column remains available
  * to downstream operators, and plans that don't match are untouched.
  *
  * ON by default since round 11 (`spark.graft.topk.rewrite=false`
  * disables): TopKBench measured the bounded-heap thinning 2.4–4.9×
  * faster than BOTH the plain window and Spark's native
  * InferWindowGroupLimit at sf0.1 and 10× (its WindowGroupLimitExec
  * filters on sorted partitions; our partial exec never sorts), and the
  * full 256-query oracle battery hash-matches with the rule on. The
  * documented trade stands: with a NON-total order, row_number already
  * tie-breaks arbitrarily in Spark, and the rewrite can change WHICH
  * arbitrary winner survives — same contract as TopKPerGroup.topK.
  * Guards: single row_number window expression, same partition/order on
  * the node, a bare rn-vs-literal predicate, and an
  * already-rewritten child is never wrapped again (the rule runs in a
  * fixed-point batch).
  */
object TopKWindowRewrite extends Rule[LogicalPlan] {

  private def enabled: Boolean =
    org.apache.spark.sql.internal.SQLConf.get
      .getConfString("spark.graft.topk.rewrite", "true") == "true"

  /** An already-rewritten child, seen through any Project chain another
    * fixed-point rule (ColumnPruning) may interpose between the Window
    * and the operator — without this, a second pass would wrap a second
    * redundant heap pair. A native WindowGroupLimit counts as rewritten
    * too: it is the same thinning, and stacking ours under it would
    * double-pay. */
  private def alreadyRewritten(plan: LogicalPlan): Boolean = plan match {
    case _: TopKPerGroup => true
    case _: org.apache.spark.sql.catalyst.plans.logical.WindowGroupLimit =>
      true
    case p: org.apache.spark.sql.catalyst.plans.logical.Project =>
      alreadyRewritten(p.child)
    case _ => false
  }

  /** Spark 4's own InferWindowGroupLimit (a LATER optimizer batch than
    * injected rules) thins this shape natively when
    * k ≤ spark.sql.optimizer.windowGroupLimitThreshold — but its
    * WindowGroupLimitExec filters on SORTED partitions, while
    * TopKPerGroup's partial exec keeps bounded heaps with no sort, which
    * measures ~3× faster at sf0.1 (TopKBench; SCALING.md). So when this
    * rule is enabled it claims the shape even inside native coverage:
    * the native rule may still stack its WindowGroupLimit between the
    * Window and TopKPerGroup, but over already-thinned ≤ k·|groups| rows
    * that pass is measured at noise level (TopKBench mode `both`). */
  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!enabled) plan
    else plan.transformUp {
      // part.nonEmpty: a GLOBAL top-k (empty PARTITION BY) must not
      // match — TopKPerGroup(Nil, …) would demand
      // ClusteredDistribution(Nil), which Spark rejects outright, and
      // Spark already plans the global case as TakeOrderedAndProject
      case f @ Filter(cond,
          w @ Window(Seq(alias @ Alias(
            WindowExpression(RowNumber(), _), _)),
          part, order, child, _))
          if part.nonEmpty && order.nonEmpty && !alreadyRewritten(child) =>
        extractK(cond, alias.toAttribute) match {
          case Some(k) if k > 0 =>
            Filter(cond,
              w.copy(child = TopKPerGroup(part, order, k, child)))
          case _ => f
        }
    }

  /** k such that `cond` keeps exactly the rows with row_number ≤ k. */
  private def extractK(cond: Expression, rn: Attribute): Option[Int] =
    cond match {
      case LessThanOrEqual(a: Attribute, IntegerLiteral(v))
          if a.semanticEquals(rn) => Some(v)
      case LessThan(a: Attribute, IntegerLiteral(v))
          if a.semanticEquals(rn) => Some(v - 1)
      case EqualTo(a: Attribute, IntegerLiteral(1))
          if a.semanticEquals(rn) => Some(1)
      case _ => None
    }
}
