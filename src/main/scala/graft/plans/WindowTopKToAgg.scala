package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, Generate, LogicalPlan, Project, Window}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

import graft.functions.TopNRows

/** Catalyst optimizer rule — the general-n sibling of
  * [[WindowDedupToAgg]] for the per-group top-k idiom:
  *
  * {{{ df.withColumn("rk", row_number.over(partitionBy(k).orderBy(s)))
  *       .filter($"rk" <= n) }}}
  *
  * rewritten to a bounded map-side aggregate + explode:
  *
  * {{{ Aggregate(k, TopNRows(struct(*), s, n))   // ≤ n rows/key shuffled
  *     → PosExplode                              // rank = pos + 1
  *     → Project(original columns, rk) }}}
  *
  * The window form shuffles EVERY scored row on k and sorts each
  * partition (InferWindowGroupLimit prunes to n per partition but
  * keeps both the full shuffle of surviving rows and the sorts); the
  * aggregate form's partials cap each mapper's contribution at n rows
  * per key with no sort anywhere — at 100 TB the difference between
  * shuffling the corpus and shuffling k·n candidates. This is the
  * shape every `e_knn_*` query hand-builds with the typed TopK
  * aggregator; the rule gives it to ordinary window queries for free.
  *
  * Fires only on the exact safe shape (the [[WindowDedupToAgg]] safety
  * analysis, generalized): a lone ROW_NUMBER window expression —
  * rank/dense_rank admit boundary ties, so their output for `<= n` is
  * NOT boundable by n rows and they stay on the window form — over
  * non-empty deterministic partition keys and a deterministic order
  * spec (ANY direction / null ordering: the aggregate carries the
  * original SortOrder comparator), filtered by `rk <= n` / `rk < n+1`
  * (either operand order) with 1 ≤ n ≤ 128. The cap keeps the
  * per-group state a few KB; a top-million query is better served by
  * the window's external sort, so it stays one. Under order-key ties
  * both forms keep SOME n-subset — the aggregate's stable first-seen
  * pick is a refinement of the window form's execution-order pick
  * (the ReplaceDeduplicateWithAggregate contract). The rank column
  * survives as pos+1 under the original exprId so downstream
  * references stay resolved.
  *
  * Injected via [[graft.GraftExtensions]]; plan shape and result
  * equality pinned in PlanRewriteSpec; q_topk_per_group_rewritten
  * rides it in-driver against a window-form oracle.
  */
object WindowTopKToAgg extends Rule[LogicalPlan] {

  /** Per-group buffer bound: above this the bounded-buffer insert and
    * the literal array row stop being obviously better than the
    * window's external sort, so the rule stays silent. */
  val MaxN = 128

  private def topNOf(cond: Expression, rk: Attribute): Option[Int] =
    cond match {
      case LessThanOrEqual(a: Attribute, Literal(v: Int, IntegerType))
          if a.semanticEquals(rk) => Some(v)
      case GreaterThanOrEqual(Literal(v: Int, IntegerType), a: Attribute)
          if a.semanticEquals(rk) => Some(v)
      case LessThan(a: Attribute, Literal(v: Int, IntegerType))
          if a.semanticEquals(rk) => Some(v - 1)
      case GreaterThan(Literal(v: Int, IntegerType), a: Attribute)
          if a.semanticEquals(rk) => Some(v - 1)
      case _ => None
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case Filter(cond,
        Window(Seq(al @ Alias(we: WindowExpression, _)), part, order, child, _))
        if part.nonEmpty && order.nonEmpty &&
          part.forall(_.deterministic) &&
          order.forall(_.child.deterministic) &&
          we.windowFunction.isInstanceOf[RowNumber] &&
          topNOf(cond, al.toAttribute).exists(n => n >= 1 && n <= MaxN) =>
      val n = topNOf(cond, al.toAttribute).get
      val rowStruct = CreateStruct(child.output)
      val topn = AggregateExpression(
        TopNRows(rowStruct, order, n), Complete, isDistinct = false)
      val topnAlias = Alias(topn, "_graft_topn")()
      val agg = Aggregate(part, Seq(topnAlias), child)
      val elementType = rowStruct.dataType
      val posAttr =
        AttributeReference("_graft_pos", IntegerType, nullable = false)()
      val rowAttr =
        AttributeReference("_graft_row", elementType, nullable = false)()
      val gen = Generate(PosExplode(topnAlias.toAttribute),
        unrequiredChildIndex = Seq(0), outer = false, qualifier = None,
        generatorOutput = Seq(posAttr, rowAttr), agg)
      val restored = child.output.zipWithIndex.map { case (a, i) =>
        val field: Expression = GetStructField(rowAttr, i, Some(a.name))
        // group rows are real input rows, so restore the original
        // non-nullability instead of widening downstream
        val restoredField = if (a.nullable) field else KnownNotNull(field)
        Alias(restoredField, a.name)(exprId = a.exprId, qualifier = a.qualifier)
      }
      val rkOut = Alias(Add(posAttr, Literal(1)), al.name)(
        exprId = al.exprId, qualifier = al.qualifier)
      Project(restored :+ rkOut, gen)
  }
}
