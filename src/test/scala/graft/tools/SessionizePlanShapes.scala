package graft.tools
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.TestSpark
object SessionizePlanShapes {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    import spark.implicits._
    val base = spark.range(100000)
      .select(($"id" % 1000).as("user_id"), $"id".as("event_id"),
        (abs(xxhash64($"id")) % 1000000L).as("ts_us"))
      .filter($"ts_us".isNotNull)
    def idiom() = {
      val w = Window.partitionBy($"user_id").orderBy($"ts_us", $"event_id")
      val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val lagTs = lag($"ts_us", 1).over(w)
      base.withColumn("brk", when(lagTs.isNull || $"ts_us" - lagTs > 1000L, 1).otherwise(0))
        .withColumn("session_id", sum($"brk").over(run).cast("long"))
        .groupBy($"user_id", $"session_id")
        .agg(count(lit(1)).as("n"))
    }
    println("=== WINDOW FORM ==="); println(idiom().queryExecution.executedPlan.toString.take(2500))
    val em = spark.sessionState.experimentalMethods
    em.extraOptimizations = em.extraOptimizations :+ graft.plans.SessionizeToSessionWindow
    println("=== SESSION FORM ==="); println(idiom().queryExecution.executedPlan.toString.take(2500))
  }
}
