package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Scratch probe: does SessionizeToSessionWindow fire on the idiom,
  * produce MergingSessions physically, and match the window form? */
object SessionizeRewriteProbe {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    import spark.implicits._
    val gapUs = 1800L * 1000 * 1000

    def idiom(): DataFrame = {
      val w = Window.partitionBy($"user_id").orderBy($"ts_us", $"event_id")
      val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      spark.read.parquet(s"${TestSpark.Sf}/events.parquet")
        .withColumn("ts_us", expr("xxhash64(event_id) % 100000000"))
        .filter($"ts_us".isNotNull && $"ts_us" >= 0)
        .withColumn("brk",
          when(lag($"ts_us", 1).over(w).isNull ||
            $"ts_us" - lag($"ts_us", 1).over(w) > 10000000L, 1).otherwise(0))
        .withColumn("session_id", sum($"brk").over(run).cast("long"))
        .groupBy($"user_id", $"session_id")
        .agg(count(lit(1)).as("n_events"), min($"ts_us").as("mn"),
          max($"ts_us").as("mx"))
    }

    val baseline = idiom().collect().map(_.toSeq).toSet
    val em = spark.sessionState.experimentalMethods
    val saved = em.extraOptimizations
    em.extraOptimizations = saved :+ graft.plans.SessionizeToSessionWindow
    try {
      val df = idiom()
      println("---optimized---")
      println(df.queryExecution.optimizedPlan.treeString)
      val fired = df.queryExecution.optimizedPlan.collect {
        case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate
            if a.groupingExpressions.exists(_.references.exists(_.metadata
              .contains(org.apache.spark.sql.catalyst.expressions
                .SessionWindow.marker))) ||
              a.groupingExpressions.exists {
                case att: org.apache.spark.sql.catalyst.expressions.Attribute =>
                  att.metadata.contains(org.apache.spark.sql.catalyst
                    .expressions.SessionWindow.marker)
                case _ => false
              } => a
      }
      println("FIRED=" + fired.nonEmpty)
      println("PHYSICAL_MERGING=" +
        df.queryExecution.executedPlan.toString.contains("MergingSessions"))
      val got = df.collect().map(_.toSeq).toSet
      println("EQUAL=" + (got == baseline) + " n=" + got.size +
        " vs " + baseline.size)
      if (got != baseline) {
        println("missing=" + (baseline -- got).take(5))
        println("extra=" + (got -- baseline).take(5))
      }
    } finally em.extraOptimizations = saved
  }
}
