package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, Max, Min}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, Join, JoinHint, LogicalPlan, Project, Window}
import org.apache.spark.sql.catalyst.rules.Rule

/** Catalyst optimizer rule — the ARGMAX idiom, fourth of the
  * window-rewrite family:
  *
  * {{{ df.withColumn("mx", max($"x").over(partitionBy(k)))
  *       .filter($"x" === $"mx") }}}
  *
  * "keep every row achieving its group's extreme" — rewritten to
  *
  * {{{ child ⋈ (SELECT k, max(x) FROM child GROUP BY k)
  *       ON k <=> k AND x = mx }}}
  *
  * Unlike the row_number rules this is EXACT under ties with no
  * nondeterminism caveat: both forms keep ALL rows equal to the group
  * extreme, drop null-x rows (max ignores nulls; `x = mx` is never
  * true for null x), and treat a NULL partition key as one group (the
  * join uses null-safe equality on the keys to match window-partition
  * semantics).
  *
  * Cost analysis, honestly stated: the window form shuffles every row
  * on k and SORTS each partition; the join form computes a map-side-
  * combined aggregate (one candidate row per mapper × key reaches the
  * shuffle) and joins it back — usually a broadcast, always sort-free
  * — at the price of executing the child TWICE. The rule therefore
  * fires only when the child is scan-shaped (no Join / Aggregate /
  * Window / Generate beneath): re-scanning a filtered projection of a
  * columnar source is cheap, re-running a join pipeline is not, and a
  * rule cannot see sizes. The filter's mx column survives under its
  * original exprId (joined aggregate value), so downstream references
  * stay resolved.
  *
  * Injected via [[graft.GraftExtensions]]; shape/equality/guards
  * pinned in PlanRewriteSpec; q_argmax_rewritten rides it in-driver.
  */
object WindowMaxFilterToJoin extends Rule[LogicalPlan] {

  private def isWholePartition(we: WindowExpression): Boolean =
    we.windowSpec.frameSpecification match {
      case SpecifiedWindowFrame(_, UnboundedPreceding, UnboundedFollowing) => true
      case _ => false
    }

  /** The max/min argument when the window function is a plain
    * extreme over a child attribute. */
  private def extremeArg(f: Expression): Option[Expression] = f match {
    case AggregateExpression(Max(c), _, false, None, _) => Some(c)
    case AggregateExpression(Min(c), _, false, None, _) => Some(c)
    case _ => None
  }

  /** Scan-shaped AND safe to execute twice: beyond blocking expensive
    * re-runs (Join/Aggregate/Window/Generate), the child must be
    * REPEATABLE — the rewrite duplicates it into both join sides, so a
    * non-deterministic projection (rand(), uuid()), a Sample, a Limit
    * without total order, or a subquery (whose re-execution semantics
    * we can't inspect) would make the two executions diverge and the
    * join silently drop or duplicate rows. */
  private def scanShaped(p: LogicalPlan): Boolean =
    p.collectFirst {
      case j: Join => j
      case a: Aggregate => a
      case w: Window => w
      case g: org.apache.spark.sql.catalyst.plans.logical.Generate => g
      case s: org.apache.spark.sql.catalyst.plans.logical.Sample => s
      case l: org.apache.spark.sql.catalyst.plans.logical.GlobalLimit => l
      case l: org.apache.spark.sql.catalyst.plans.logical.LocalLimit => l
    }.isEmpty &&
      p.collect { case n => n }.forall(n =>
        n.expressions.forall(e => e.deterministic &&
          !org.apache.spark.sql.catalyst.expressions.SubqueryExpression
            .hasSubquery(e)))

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case other => Seq(other)
  }

  /** Match `x = mx` possibly wrapped with optimizer-inferred
    * IsNotNull(x)/IsNotNull(mx) conjuncts (InferFiltersFromConstraints
    * adds them from the equality; the equality join condition is
    * null-rejecting, so they are implied and safe to drop). */
  private def isArgmaxCond(cond: Expression, x: Attribute,
      mx: Attribute): Boolean = {
    val cs = conjuncts(cond)
    val eqs = cs.collect {
      case EqualTo(a: Attribute, b: Attribute)
          if (a.semanticEquals(x) && b.semanticEquals(mx)) ||
            (a.semanticEquals(mx) && b.semanticEquals(x)) => true
    }
    val residual = cs.forall {
      case EqualTo(a: Attribute, b: Attribute)
          if (a.semanticEquals(x) && b.semanticEquals(mx)) ||
            (a.semanticEquals(mx) && b.semanticEquals(x)) => true
      case IsNotNull(a: Attribute) =>
        a.semanticEquals(x) || a.semanticEquals(mx)
      case _ => false
    }
    eqs.size == 1 && residual
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case Filter(cond,
        Window(Seq(al @ Alias(we: WindowExpression, _)), part, order, child, _))
        if part.nonEmpty && order.isEmpty &&
          part.forall(_.deterministic) &&
          isWholePartition(we) &&
          extremeArg(we.windowFunction).exists(a =>
            a.isInstanceOf[Attribute] && a.deterministic) &&
          scanShaped(child) &&
          isArgmaxCond(cond,
            extremeArg(we.windowFunction).get.asInstanceOf[Attribute],
            al.toAttribute) =>
      val x = extremeArg(we.windowFunction).get.asInstanceOf[Attribute]
      // re-key the aggregate side with FRESH attributes so the self-join
      // has no duplicate exprIds
      val keyAliases = part.zipWithIndex.map { case (k, i) =>
        Alias(k, s"_graft_k$i")()
      }
      val mxAgg = AggregateExpression(we.windowFunction
        .asInstanceOf[AggregateExpression].aggregateFunction,
        Complete, isDistinct = false)
      val mxAlias = Alias(mxAgg, "_graft_mx")()
      val agg = Aggregate(part, keyAliases :+ mxAlias, child)
      val keyCond = part.zip(keyAliases)
        .map { case (k, ka) => EqualNullSafe(k, ka.toAttribute): Expression }
        .reduceLeft(And)
      val joinCond = And(keyCond, EqualTo(x, mxAlias.toAttribute))
      val join = Join(child, agg, Inner, Some(joinCond), JoinHint.NONE)
      val mxOut = Alias(mxAlias.toAttribute, al.name)(
        exprId = al.exprId, qualifier = al.qualifier)
      Project(child.output :+ mxOut, join)
  }
}
