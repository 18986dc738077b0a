package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, MinBy}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LogicalPlan, Project, Window}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Catalyst optimizer rule: rewrite the ubiquitous window-dedup idiom
  *
  * {{{ df.withColumn("rn", row_number.over(partitionBy(k).orderBy(o)))
  *       .filter($"rn" === 1) }}}
  *
  * into a hash aggregate `min_by(struct(*), struct(o)) GROUP BY k`.
  * Keep-one-per-key is THE core dedup shape, and users migrating from
  * other engines overwhelmingly write it as the window form above. The
  * window form costs a shuffle on k plus a per-partition SORT on
  * (k, o) (Spark's InferWindowGroupLimit prunes rows but keeps the
  * sort); the aggregate form costs the same shuffle but replaces the
  * sort with an O(n) hash fold — and gets map-side partial
  * aggregation, which at 100 TB is the difference between shuffling
  * every surviving row and shuffling one candidate row per (mapper ×
  * key).
  *
  * Semantics: with a total per-key ordering the results are identical.
  * Under order-key ties both forms return SOME minimal row — the
  * window form's pick is already execution-order-dependent, so
  * replacing it with min_by's pick is a refinement of the same
  * nondeterminism, not a semantics change (same contract Spark's own
  * ReplaceDeduplicateWithAggregate relies on).
  *
  * Fires only on the exact safe shape: a lone row_number window
  * expression, non-empty deterministic partition keys (a global
  * Aggregate would emit one row on empty input where the window form
  * emits zero), ascending nulls-first order keys (struct comparison
  * order), and a `rn = 1` / `rn <= 1` / `rn < 2` filter. The filter's
  * rn column survives as a literal 1 under the original exprId so
  * downstream references stay resolved.
  *
  * Injected via [[graft.GraftExtensions]]
  * (`spark.sql.extensions=graft.GraftExtensions`); plan shape and
  * result equality pinned in PlanRewriteSpec.
  */
object WindowDedupToAgg extends Rule[LogicalPlan] {

  private def isOne(e: Expression): Boolean = e match {
    case Literal(v: Int, IntegerType) => v == 1
    case _ => false
  }

  private def selectsFirstRow(cond: Expression, rn: Attribute): Boolean =
    cond match {
      case EqualTo(a: Attribute, l) => a.semanticEquals(rn) && isOne(l)
      case EqualTo(l, a: Attribute) => a.semanticEquals(rn) && isOne(l)
      case LessThanOrEqual(a: Attribute, l) => a.semanticEquals(rn) && isOne(l)
      case LessThan(a: Attribute, Literal(v: Int, IntegerType)) =>
        a.semanticEquals(rn) && v == 2
      case _ => false
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case Filter(cond,
        Window(Seq(al @ Alias(we: WindowExpression, _)), part, order, child, _))
        if part.nonEmpty && order.nonEmpty &&
          part.forall(_.deterministic) &&
          order.forall(o => o.child.deterministic &&
            o.direction == Ascending && o.nullOrdering == NullsFirst) &&
          we.windowFunction.isInstanceOf[RowNumber] &&
          selectsFirstRow(cond, al.toAttribute) =>
      val rowStruct = CreateStruct(child.output)
      val ordStruct = CreateStruct(order.map(_.child))
      val minBy = AggregateExpression(
        MinBy(rowStruct, ordStruct), Complete, isDistinct = false)
      val rowAlias = Alias(minBy, "_graft_min_row")()
      val agg = Aggregate(part, Seq(rowAlias), child)
      val restored = child.output.zipWithIndex.map { case (a, i) =>
        val field: Expression =
          GetStructField(rowAlias.toAttribute, i, Some(a.name))
        // the grouped min_by is never null (groups are non-empty), so
        // restore the original attribute's non-nullability rather than
        // widening every downstream plan to nullable
        val restoredField = if (a.nullable) field else KnownNotNull(field)
        Alias(restoredField, a.name)(exprId = a.exprId, qualifier = a.qualifier)
      }
      val rnOut =
        Alias(Literal(1), al.name)(exprId = al.exprId, qualifier = al.qualifier)
      Project(restored :+ rnOut, agg)
  }
}
