package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, Count, First}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LogicalPlan, Project, Window}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.LongType

/** Catalyst optimizer rule — sibling of [[WindowDedupToAgg]] for the
  * repeated-chunk idiom (SURVEY J3, the `d_unique_tokens` shape):
  *
  * {{{ df.withColumn("n", count(lit(1)).over(partitionBy(k)))
  *       .filter($"n" === 1) }}}
  *
  * "keep the rows whose key appears exactly once". The window form
  * shuffles EVERY row on k, SORTS each partition (WindowExec sorts by
  * the partition keys even with no order spec), and holds whole
  * partitions to stamp a count nobody reads except the filter. But a
  * group passing `n = 1` has EXACTLY ONE ROW — so the whole thing is a
  * hash aggregate: `GROUP BY k` keeping `first(struct(*))` and
  * `count(1)`, then a HAVING `count = 1`. No sort, and map-side
  * partial aggregation collapses duplicate keys per mapper — at 100 TB
  * the shuffle carries one candidate row per (mapper × key) instead of
  * every row of the corpus.
  *
  * Semantics: exact equality, including ties — both forms drop every
  * row of any key with two or more occurrences and emit the single row
  * of singleton keys verbatim (`first` over a size-1 group is
  * deterministic; the HAVING guarantees the size). The n column
  * survives as literal 1L under the original exprId so downstream
  * references stay resolved.
  *
  * Fires only on the exact safe shape: a lone count window expression
  * whose count argument is a non-null foldable (count(1)/count(*) —
  * count(col) skips nulls and is NOT the group size), non-empty
  * deterministic partition keys, an entire-partition frame (unbounded
  * both sides — an ORDER BY would make it a RUNNING count), and an
  * `n = 1` filter. General thresholds (`n = 2`, `n <= 3`) stay on the
  * window form: their groups keep multiple rows, which an aggregate
  * cannot restore without a second scan (the semi-join form), so the
  * rewrite only claims the shape where one pass is provably enough.
  *
  * Injected via [[graft.GraftExtensions]]; plan shape and result
  * equality pinned in PlanRewriteSpec.
  */
object WindowCountOneToAgg extends Rule[LogicalPlan] {

  private def isOneL(e: Expression): Boolean = e.foldable && (e.eval() match {
    case v: Long => v == 1L
    case v: Int => v == 1
    case _ => false
  })

  private def selectsSingletons(cond: Expression, n: Attribute): Boolean =
    cond match {
      case EqualTo(a: Attribute, l) => a.semanticEquals(n) && isOneL(l)
      case EqualTo(l, a: Attribute) => a.semanticEquals(n) && isOneL(l)
      case _ => false
    }

  /** count(1)/count(*): every argument a non-null foldable, so the
    * count IS the group size. */
  private def isGroupSizeCount(f: Expression): Boolean = f match {
    case AggregateExpression(Count(children), _, false, None, _) =>
      children.forall(c => c.foldable && c.eval() != null)
    case _ => false
  }

  /** Entire-partition frame — with an order spec the default frame is
    * a running prefix, which is a different function. */
  private def isWholePartition(we: WindowExpression): Boolean =
    we.windowSpec.frameSpecification match {
      case SpecifiedWindowFrame(_, UnboundedPreceding, UnboundedFollowing) => true
      case _ => false
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case Filter(cond,
        Window(Seq(al @ Alias(we: WindowExpression, _)), part, _, child, _))
        if part.nonEmpty && part.forall(_.deterministic) &&
          isGroupSizeCount(we.windowFunction) && isWholePartition(we) &&
          selectsSingletons(cond, al.toAttribute) =>
      val rowStruct = CreateStruct(child.output)
      val firstRow = AggregateExpression(
        First(rowStruct, ignoreNulls = false), Complete, isDistinct = false)
      val cnt = AggregateExpression(
        Count(Seq(Literal(1))), Complete, isDistinct = false)
      val rowAlias = Alias(firstRow, "_graft_row")()
      val cntAlias = Alias(cnt, "_graft_cnt")()
      val agg = Aggregate(part, Seq(rowAlias, cntAlias), child)
      val having = Filter(
        EqualTo(cntAlias.toAttribute, Literal(1L, LongType)), agg)
      val restored = child.output.zipWithIndex.map { case (a, i) =>
        val field: Expression =
          GetStructField(rowAlias.toAttribute, i, Some(a.name))
        // the surviving group is non-empty by the HAVING, so restore
        // the original non-nullability instead of widening downstream
        val restoredField = if (a.nullable) field else KnownNotNull(field)
        Alias(restoredField, a.name)(exprId = a.exprId, qualifier = a.qualifier)
      }
      val nOut = Alias(Literal(1L, LongType), al.name)(
        exprId = al.exprId, qualifier = al.qualifier)
      Project(restored :+ nOut, having)
  }
}
