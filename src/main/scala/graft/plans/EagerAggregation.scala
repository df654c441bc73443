package graft.plans

import org.apache.spark.sql.catalyst.expressions.{
  Alias, Attribute, AttributeSet, Cast, Coalesce, Expression, Literal,
  NamedExpression}
import org.apache.spark.sql.catalyst.expressions.Divide
import org.apache.spark.sql.catalyst.expressions.aggregate.{
  AggregateExpression, Average, Complete, Count, Max, Min, Sum}
import org.apache.spark.sql.types.DoubleType
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{
  Aggregate, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule

/** Opt-in optimizer rule (`spark.graft.eageragg=true`): EAGER
  * AGGREGATION — Yan & Larson (VLDB 1995), the transform Catalyst does
  * not ship. For
  *
  *   Aggregate(G, F, Join(L, R, Inner, cond))
  *
  * where every aggregate function reads ONE side (say L), insert a
  * partial aggregate below the join, keyed by every L-attribute the
  * grouping, the join condition, or the other side's columns need:
  *
  *   Aggregate(G, F', Join(Aggregate(K, K ++ partials, L), R, Inner, cond))
  *
  * At 100 TB this is the difference between shuffling/joining the raw
  * fact table and shuffling one row per (group key, join key): a fact
  * side with f rows per key enters the join f× smaller, and the join's
  * own hash table and output shrink by the same factor.
  *
  * Why it is semantics-preserving for duplicate-DISTRIBUTIVE functions
  * (sum/count/min/max — and avg via its (sum, count) decomposition,
  * DoubleType children only; no DISTINCT, no FILTER): an inner join
  * replicates
  * each partial row exactly as many times as it would have replicated
  * every raw row it absorbed (the partial keys include every L-attribute
  * `cond` reads, so the match multiplicity m is identical), and
  *   m·Σx = Σ(m·x)   (sum, count)   ·   min/max ignore multiplicity.
  * A row with m = 0 is dropped either way. The final aggregate then
  * re-combines: sum→sum, count→sum of partial counts (coalesced to the
  * non-null 0 so the output stays non-nullable like COUNT), min/max
  * stay. Result attribute ids and datatypes are preserved — widened
  * re-sums (decimal partials) are cast back to the original type.
  *
  * Guards (bail = leave the plan untouched): inner joins only; every
  * AggregateExpression Complete / non-distinct / unfiltered / reading
  * exactly one side; deterministic grouping and join expressions; the
  * pushed side's needed keys are plain attributes; and the pushed side
  * is not already an Aggregate (that both stops fixed-point re-firing
  * on our own output and skips already-reduced inputs).
  *
  * OFF by default: the transform pays one extra hash aggregate, which
  * only wins when the fact side has real per-key duplication and the
  * join actually moves data. EagerAggBench (SCALING.md) measures
  * ~1.3× on the duplicated-key broadcast shape and ~parity elsewhere
  * at 6 M cached in-memory rows — at that scale the per-row work
  * dominates; the structural win (the join's shuffle and probe carry
  * one row per key instead of the raw fact table) grows with the
  * duplication factor and with spill pressure, so flip the conf per
  * job where those hold.
  */
object EagerAggregation extends Rule[LogicalPlan] {

  private def enabled: Boolean =
    org.apache.spark.sql.internal.SQLConf.get
      .getConfString("spark.graft.eageragg", "false") == "true"

  private def eligible(join: Join): Boolean =
    join.joinType == Inner && join.left.resolved && join.right.resolved

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!enabled) plan
    else plan.transformUp {
      case agg @ Aggregate(_, _, join: Join, _) if eligible(join) =>
        tryPush(agg, join, pushLeft = true)
          .orElse(tryPush(agg, join, pushLeft = false))
          .getOrElse(agg)
      // ColumnPruning inserts an attribute-only Project between the
      // Aggregate and the Join — see through it (the Join still
      // outputs every attribute the Aggregate reads, and pruning
      // re-inserts projections over our rewrite in the same
      // fixed-point batch)
      case agg @ Aggregate(_, _, Project(plist, join: Join), _)
          if eligible(join) && plist.forall(_.isInstanceOf[Attribute]) =>
        val direct = agg.copy(child = join)
        tryPush(direct, join, pushLeft = true)
          .orElse(tryPush(direct, join, pushLeft = false))
          .getOrElse(agg)
    }

  private def tryPush(agg: Aggregate, join: Join,
      pushLeft: Boolean): Option[Aggregate] = {
    val side = if (pushLeft) join.left else join.right
    val sideOut = side.outputSet
    if (side.isInstanceOf[Aggregate]) return None // idempotency + no gain
    if (!agg.aggregateExpressions.forall(_.deterministic) ||
        !agg.groupingExpressions.forall(_.deterministic) ||
        !join.condition.forall(_.deterministic)) return None

    // every aggregate function must read only the pushed side
    val aes = agg.aggregateExpressions.flatMap(_.collect {
      case ae: AggregateExpression => ae
    })
    if (aes.isEmpty) return None // plain distinct — nothing to combine
    val ok = aes.forall { ae =>
      ae.mode == Complete && !ae.isDistinct && ae.filter.isEmpty &&
        ae.references.subsetOf(sideOut) &&
        (ae.aggregateFunction match {
          case _: Sum | _: Min | _: Max | _: Count => true
          // Average decomposes into (partial sum, partial count) —
          // Yan & Larson's treatment. DoubleType only: for doubles the
          // recombined Sum(psum)/Sum(pcnt) is the same double-typed
          // sum/count Spark's Average computes (modulo addition order,
          // which partial aggregation never pinned anyway); decimal
          // Average has bespoke precision/rounding semantics and
          // integral Average sums in a double accumulator, both of
          // which a decomposition could silently diverge from
          case a: Average => a.child.dataType == DoubleType
          case _ => false
        })
    }
    if (!ok) return None

    // partial keys: every pushed-side attribute that anything ABOVE the
    // partial still needs — grouping, join condition, and references in
    // the aggregate list OUTSIDE aggregate functions. References INSIDE
    // an AggregateExpression (the x of sum(x)) must NOT become keys:
    // they are consumed by the partial and grouping by them would
    // destroy the reduction
    def nonAggRefs(e: Expression): Seq[Attribute] = e match {
      case _: AggregateExpression => Nil
      case a: Attribute => Seq(a)
      case other => other.children.flatMap(nonAggRefs)
    }
    val needed = AttributeSet(
      agg.groupingExpressions.flatMap(_.references) ++
        join.condition.toSeq.flatMap(_.references) ++
        agg.aggregateExpressions.flatMap(nonAggRefs)).intersect(sideOut)
    val keys = needed.toSeq
    // (attributes by construction; AttributeSet holds only attributes)
    // Empty partial keys are UNSOUND, not just unprofitable (r11
    // advisor): a keyless partial aggregate emits exactly one row even
    // over an EMPTY pushed side (that's Aggregate semantics), so a
    // condition-free join whose grouping/condition never touches this
    // side would fabricate groups (count=0, sum=null) that the raw
    // plan — where an empty join input yields zero joined rows and the
    // final aggregate sees nothing — never produces. Spark's own
    // aggregate-pushdown bails the same way.
    if (keys.isEmpty) return None

    // one partial per distinct aggregate function occurrence — two for
    // Average (its sum and its count)
    var i = 0
    def fresh(ae: AggregateExpression): Alias = {
      i += 1
      Alias(ae, s"_eager_p$i")()
    }
    val partialFor: Map[AggregateExpression, Seq[Alias]] = aes.map { ae =>
      ae -> (ae.aggregateFunction match {
        case a: Average =>
          Seq(fresh(ae.copy(aggregateFunction = Sum(a.child),
              resultId = NamedExpression.newExprId)),
            fresh(ae.copy(aggregateFunction = Count(Seq(a.child)),
              resultId = NamedExpression.newExprId)))
        case _ => Seq(fresh(ae))
      })
    }.toMap
    val partialAgg = Aggregate(keys,
      keys ++ aes.flatMap(partialFor(_)), side, None)

    // rewrite the final aggregate expressions over the partial outputs
    val rewritten = agg.aggregateExpressions.map { ne =>
      // transformUp + containment guard: the replacement itself
      // contains a fresh AggregateExpression (the re-sum) that a
      // top-down transform would descend into and re-match
      ne.transformUp {
        case ae: AggregateExpression if partialFor.contains(ae) =>
          val pAttrs = partialFor(ae).map(_.toAttribute)
          val pAttr = pAttrs.head
          // fresh resultId: the original id lives on in the PARTIAL's
          // copy of this AE, and re-summing can change the datatype —
          // a reused exprId with a new type trips plan integrity
          def fin(f: org.apache.spark.sql.catalyst.expressions.aggregate
              .AggregateFunction): AggregateExpression =
            ae.copy(aggregateFunction = f,
              resultId = NamedExpression.newExprId)
          val combined: Expression = ae.aggregateFunction match {
            case _: Count =>
              Coalesce(Seq(fin(Sum(pAttr)), Literal(0L)))
            case s: Sum =>
              val re = fin(s.copy(child = pAttr))
              if (re.dataType == ae.dataType) re
              else Cast(re, ae.dataType)
            case m: Min => fin(m.copy(child = pAttr))
            case m: Max => fin(m.copy(child = pAttr))
            case _: Average =>
              // avg = Σ(partial sums) / Σ(partial counts): both re-sums
              // see every raw row exactly through its partial, so the
              // weighting is the raw-row weighting — the decomposition
              // that makes avg duplicate-distributive after all
              Divide(fin(Sum(pAttrs(0))),
                Cast(fin(Sum(pAttrs(1))), DoubleType))
            case other => // unreachable per the guard above
              throw new IllegalStateException(other.toString)
          }
          combined
      }.asInstanceOf[NamedExpression]
    }
    val newJoin =
      if (pushLeft) join.copy(left = partialAgg)
      else join.copy(right = partialAgg)
    Some(agg.copy(aggregateExpressions = rewritten, child = newJoin))
  }
}
