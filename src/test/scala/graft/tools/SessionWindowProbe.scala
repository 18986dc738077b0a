package graft.tools

import org.apache.spark.sql.functions._
import graft.TestSpark

/** Scratch probe: what the analyzer turns batch `session_window` into
  * (the shape the sessionize optimizer rule must construct). */
object SessionWindowProbe {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    import spark.implicits._
    println("MARKER=" + org.apache.spark.sql.catalyst.expressions.SessionWindow.marker)
    val df = Seq((1L, 100L), (1L, 200L), (1L, 5000L), (2L, 50L))
      .toDF("user", "ts_us")
      .withColumn("ts", timestamp_micros($"ts_us"))
    val agg = df.groupBy($"user", session_window($"ts", "0.001 seconds"))
      .agg(count(lit(1)).as("n"))
    println(agg.queryExecution.analyzed.treeString)
    println("---optimized---")
    println(agg.queryExecution.optimizedPlan.treeString)
    println("---physical---")
    println(agg.queryExecution.executedPlan.treeString)
    agg.orderBy($"user", $"session_window.start").show(false)
  }
}
