package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Scratch probe: window-form vs session-window-rule wall-clock on a
  * generated 5M-event frame (sf0.1's 100k events are too small to
  * separate the two shapes from noise). Records the scale argument for
  * SessionizeToSessionWindow's cost model. */
object SessionizeScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    import spark.implicits._
    val n = 5000000L
    val users = 50000L
    val base = spark.range(n)
      .select(($"id" % users).as("user_id"), $"id".as("event_id"),
        (abs(xxhash64($"id")) % 1000000000L).as("ts_us"))
      .filter($"ts_us".isNotNull)
      .localCheckpoint() // same materialized input for both forms

    def idiom(): DataFrame = {
      val w = Window.partitionBy($"user_id").orderBy($"ts_us", $"event_id")
      val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val lagTs = lag($"ts_us", 1).over(w)
      base
        .withColumn("brk",
          when(lagTs.isNull || $"ts_us" - lagTs > 1000000L, 1).otherwise(0))
        .withColumn("session_id", sum($"brk").over(run).cast("long"))
        .groupBy($"user_id", $"session_id")
        .agg(count(lit(1)).as("n_events"), min($"ts_us").as("mn"),
          max($"ts_us").as("mx"))
    }

    def timeIt(tag: String)(body: => Unit): Double = {
      val t0 = System.nanoTime()
      body
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"PROBE $tag $dt%.2f s")
      dt
    }

    val em = spark.sessionState.experimentalMethods
    val saved = em.extraOptimizations
    // warm both paths once
    idiom().write.mode("overwrite").format("noop").save()
    em.extraOptimizations = saved :+ graft.plans.SessionizeToSessionWindow
    idiom().write.mode("overwrite").format("noop").save()
    em.extraOptimizations = saved

    val wt = (1 to 3).map(_ => timeIt("window-form") {
      idiom().write.mode("overwrite").format("noop").save()
    }).min
    em.extraOptimizations = saved :+ graft.plans.SessionizeToSessionWindow
    val st = try (1 to 3).map(_ => timeIt("session-rule") {
        idiom().write.mode("overwrite").format("noop").save()
      }).min
      finally em.extraOptimizations = saved
    println(f"PROBE min window=$wt%.2f s session=$st%.2f s ratio=${wt / st}%.2f")
  }
}
// appended: plan-shape dump (run with PLANS=1)
