package graft.tools

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Scratch probe: the optimized-plan shape of the hand-written
  * sessionize idiom (what WindowSessionizeToNative must match), plus
  * the strictness of MergingSessions' merge comparison. */
object SessionizePlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    import spark.implicits._
    val gapUs = 1800L * 1000 * 1000
    val w = Window.partitionBy($"user_id").orderBy($"ts_us", $"event_id")
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val df = spark.read.parquet(s"${TestSpark.Sf}/events.parquet")
      .withColumn("ts_us", expr("xxhash64(event_id) % 1000000"))
      .filter($"ts_us".isNotNull)
      .withColumn("brk",
        when(lag($"ts_us", 1).over(w).isNull ||
          $"ts_us" - lag($"ts_us", 1).over(w) > gapUs, 1).otherwise(0))
      .withColumn("session_id", sum($"brk").over(run).cast("long"))
      .groupBy($"user_id", $"session_id")
      .agg(count(lit(1)).as("n_events"), min($"ts_us").as("mn"))
    println(df.queryExecution.optimizedPlan.treeString)

    // strict-or-not: two events exactly gap apart
    val probe = Seq((1L, 0L), (1L, 1000L)).toDF("u", "o")
      .withColumn("ts", timestamp_micros($"o"))
      .groupBy($"u", session_window($"ts", "0.001 seconds"))
      .agg(count(lit(1)).as("n"))
    println("sessions at diff==gap: " + probe.count())
  }
}
