package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry

/** Test-only bridge into the `private[sql]` extensions hook: lets
  * ExpressionsSpec materialize an injected function registry exactly
  * the way session construction does with `spark.sql.extensions`. */
object testbridge {
  def registerFunctions(
      ext: SparkSessionExtensions, base: FunctionRegistry): FunctionRegistry =
    ext.registerFunctions(base)

  def optimizerRules(ext: SparkSessionExtensions,
      s: org.apache.spark.sql.SparkSession): Seq[
        org.apache.spark.sql.catalyst.rules.Rule[
          org.apache.spark.sql.catalyst.plans.logical.LogicalPlan]] =
    ext.buildOptimizerRules(s)
}
