package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, Count}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, Join, JoinHint, LogicalPlan, Project, Window}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Catalyst optimizer rule — the FREQUENT/RARE-KEY filter idiom,
  * fifth of the window-rewrite family:
  *
  * {{{ df.withColumn("n", count(lit(1)).over(partitionBy(k)))
  *       .filter($"n" >= 3)        // or <=, >, <, threshold ≥ 2 }}}
  *
  * "keep every row of keys that occur at least/at most N times" —
  * rewritten to
  *
  * {{{ child ⋈ (SELECT k, count(1) n FROM child GROUP BY k
  *              HAVING <predicate on n>)  ON  k <=> k }}}
  *
  * Like [[WindowMaxFilterToJoin]] (and unlike the row_number rules)
  * this is EXACT with no tie caveat: both forms keep ALL rows of every
  * qualifying key, and null partition keys group identically (the join
  * is null-safe on the keys). The window form shuffles every row on k
  * and sorts each partition to stamp a per-key constant; the join form
  * map-side-combines the count (one candidate row per mapper × key),
  * applies the threshold BEFORE the join — for selective thresholds
  * the broadcast side is tiny — and never sorts, at the price of
  * executing the child twice; hence the same scan-shaped-child guard.
  * The count column survives under its original exprId via the joined
  * aggregate value.
  *
  * `n = 1` equality stays with [[WindowCountOneToAgg]] (its one-scan
  * aggregate form is strictly better there); this rule takes the
  * general thresholds that rule deliberately declined.
  *
  * Injected via [[graft.GraftExtensions]]; shape/equality/guards
  * pinned in PlanRewriteSpec; d_frequent_keys_rewritten rides it
  * in-driver.
  */
object WindowCountFilterToJoin extends Rule[LogicalPlan] {

  private def isWholePartition(we: WindowExpression): Boolean =
    we.windowSpec.frameSpecification match {
      case SpecifiedWindowFrame(_, UnboundedPreceding, UnboundedFollowing) => true
      case _ => false
    }

  /** count(1)/count(*): every argument non-null foldable — the count
    * IS the group size (count(col) skips nulls; not this rule). */
  private def isGroupSizeCount(f: Expression): Boolean = f match {
    case AggregateExpression(Count(children), _, false, None, _) =>
      children.forall(c => c.foldable && c.eval() != null)
    case _ => false
  }

  private def longLit(e: Expression): Option[Long] = e match {
    case Literal(v: Int, IntegerType) => Some(v.toLong)
    case Literal(v: Long, LongType) => Some(v)
    case _ => None
  }

  /** The threshold predicate rebased onto a new count attribute, if
    * the condition is a supported comparison of the window count with
    * an integer literal — matched in BOTH operand orders (`n >= 3` and
    * `3 <= n`), the literal-first forms flipped to their
    * attribute-first mirror. Equality-with-1 is left to
    * [[WindowCountOneToAgg]]; thresholds that keep everything or
    * nothing (≥ with n ≤ 1) stay windows — no win to claim. */
  private def rebasedPredicate(cond: Expression, cnt: Attribute,
      to: Attribute): Option[Expression] = cond match {
    case GreaterThanOrEqual(a: Attribute, l) if a.semanticEquals(cnt) =>
      longLit(l).filter(_ >= 2).map(v => GreaterThanOrEqual(to, Literal(v)))
    case LessThanOrEqual(l, a: Attribute) if a.semanticEquals(cnt) =>
      longLit(l).filter(_ >= 2).map(v => GreaterThanOrEqual(to, Literal(v)))
    case GreaterThan(a: Attribute, l) if a.semanticEquals(cnt) =>
      longLit(l).filter(_ >= 1).map(v => GreaterThan(to, Literal(v)))
    case LessThan(l, a: Attribute) if a.semanticEquals(cnt) =>
      longLit(l).filter(_ >= 1).map(v => GreaterThan(to, Literal(v)))
    case LessThanOrEqual(a: Attribute, l) if a.semanticEquals(cnt) =>
      longLit(l).filter(_ >= 1).map(v => LessThanOrEqual(to, Literal(v)))
    case GreaterThanOrEqual(l, a: Attribute) if a.semanticEquals(cnt) =>
      longLit(l).filter(_ >= 1).map(v => LessThanOrEqual(to, Literal(v)))
    case LessThan(a: Attribute, l) if a.semanticEquals(cnt) =>
      longLit(l).filter(_ >= 2).map(v => LessThan(to, Literal(v)))
    case GreaterThan(l, a: Attribute) if a.semanticEquals(cnt) =>
      longLit(l).filter(_ >= 2).map(v => LessThan(to, Literal(v)))
    case EqualTo(a: Attribute, l) if a.semanticEquals(cnt) =>
      longLit(l).filter(_ >= 2).map(v => EqualTo(to, Literal(v)))
    case EqualTo(l, a: Attribute) if a.semanticEquals(cnt) =>
      longLit(l).filter(_ >= 2).map(v => EqualTo(to, Literal(v)))
    case _ => None
  }

  /** Unlike [[WindowMaxFilterToJoin]], Generate (explode) children are
    * ALLOWED: flat-map-shaped plans are proportional-cost re-scans, and
    * exploded tokens are the single most common input to a frequency
    * filter — blocking them would blind the rule to its main use case.
    * Joins/aggregates/windows still block (re-running a pipeline can
    * dwarf the saved sort). Beyond cost, the child must be REPEATABLE
    * — the rewrite duplicates it into both join sides, so
    * non-deterministic expressions, subqueries, Sample, and Limit all
    * block: two divergent executions would silently drop/duplicate
    * rows or stamp a count inconsistent with the kept rows. */
  private def scanShaped(p: LogicalPlan): Boolean =
    p.collectFirst {
      case j: Join => j
      case a: Aggregate => a
      case w: Window => w
      case s: org.apache.spark.sql.catalyst.plans.logical.Sample => s
      case l: org.apache.spark.sql.catalyst.plans.logical.GlobalLimit => l
      case l: org.apache.spark.sql.catalyst.plans.logical.LocalLimit => l
    }.isEmpty &&
      p.collect { case n => n }.forall(n =>
        n.expressions.forall(e => e.deterministic &&
          !org.apache.spark.sql.catalyst.expressions.SubqueryExpression
            .hasSubquery(e)))

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case Filter(cond,
        Window(Seq(al @ Alias(we: WindowExpression, _)), part, order, child, _))
        if part.nonEmpty && order.isEmpty &&
          part.forall(_.deterministic) &&
          isGroupSizeCount(we.windowFunction) && isWholePartition(we) &&
          scanShaped(child) &&
          rebasedPredicate(cond, al.toAttribute,
            al.toAttribute /* placeholder, type-compatible */).isDefined =>
      val keyAliases = part.zipWithIndex.map { case (k, i) =>
        Alias(k, s"_graft_k$i")()
      }
      val cntAgg = AggregateExpression(
        Count(Seq(Literal(1))), Complete, isDistinct = false)
      val cntAlias = Alias(cntAgg, "_graft_cnt")()
      val agg = Aggregate(part, keyAliases :+ cntAlias, child)
      val having = Filter(
        rebasedPredicate(cond, al.toAttribute, cntAlias.toAttribute).get, agg)
      val keyCond = part.zip(keyAliases)
        .map { case (k, ka) => EqualNullSafe(k, ka.toAttribute): Expression }
        .reduceLeft(And)
      val join = Join(child, having, Inner, Some(keyCond), JoinHint.NONE)
      val cntOut = Alias(cntAlias.toAttribute, al.name)(
        exprId = al.exprId, qualifier = al.qualifier)
      Project(child.output :+ cntOut, join)
  }
}
