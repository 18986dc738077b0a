package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/** Scoped installation of experimental optimizer rules.
  *
  * `sessionState.experimentalMethods.extraOptimizations` is SHARED
  * MUTABLE SESSION STATE: a query body that appends a rule and never
  * removes it changes the optimizer environment for every query run
  * after it in the same session, making the verify environment
  * query-order-dependent (a guard hole in one rule could corrupt a
  * DOWNSTREAM query's answer in a way that query's own oracle never
  * exercises). This helper restores the previous rule list in a
  * `finally`, so callers get the rule exactly for the duration of plan
  * construction + the fired-REQUIRE — and the session they were handed
  * leaves in the state it arrived.
  *
  * Forcing `df.queryExecution.optimizedPlan` inside the scope is what
  * pins the rewrite: `optimizedPlan` is a lazy val on the
  * QueryExecution, so the returned DataFrame keeps the rewritten plan
  * for any later action on the SAME QueryExecution. (A later
  * `df.write` builds a fresh QueryExecution and will plan WITHOUT the
  * rule — which is fine precisely because the rules are
  * semantics-preserving; the REQUIRE already proved the rewrite fires
  * and PlanRewriteSpec pins result equality both ways.)
  */
object RuleScope {

  /** Run `body` with `rules` appended to the session's extra
    * optimizations (skipping any already installed), restoring the
    * prior list afterwards no matter how `body` exits. */
  def withRules[T](s: SparkSession, rules: Seq[Rule[LogicalPlan]])(
      body: => T): T = {
    val em = s.sessionState.experimentalMethods
    val saved = em.extraOptimizations
    em.extraOptimizations =
      saved ++ rules.filterNot(r => saved.exists(_ eq r))
    try body
    finally em.extraOptimizations = saved
  }
}
