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
  * OFF by default (`spark.graft.topk.rewrite=true` enables): with a
  * NON-total order, row_number already ties-breaks arbitrarily in
  * Spark, but the rewrite can change WHICH arbitrary winner survives —
  * an opt-in, documented trade, same contract as TopKPerGroup.topK.
  * Guards: single row_number window expression, same partition/order on
  * the node, a bare rn-vs-literal predicate, and an
  * already-rewritten child is never wrapped again (the rule runs in a
  * fixed-point batch).
  */
object TopKWindowRewrite extends Rule[LogicalPlan] {

  private def enabled: Boolean =
    org.apache.spark.sql.internal.SQLConf.get
      .getConfString("spark.graft.topk.rewrite", "false") == "true"

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

  /** Spark 4's own InferWindowGroupLimit (which runs in a LATER
    * optimizer batch than injected rules) will thin this exact shape
    * natively whenever k ≤ spark.sql.window.group.limit.threshold —
    * applying ours first would leave BOTH thinning operators in the
    * plan (semantically fine, redundant work). Rewrite only where the
    * native rule won't reach: k over the threshold, or the native rule
    * disabled (threshold = -1 is its off switch... meaning NO native
    * thinning, so ours is the only one). */
  private def nativeGroupLimitCovers(k: Int): Boolean = {
    val thr = org.apache.spark.sql.internal.SQLConf.get
      .getConfString("spark.sql.window.group.limit.threshold", "1000").toInt
    thr >= 0 && k <= thr
  }

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
          case Some(k) if k > 0 && !nativeGroupLimitCovers(k) =>
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
