package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only probe for the r7 q3/q5 bench delta: after the judge-requested
  * de-pin (broadcast hints removed from scale-variant join sides), both
  * queries slowed ~20-35% at sf0.1. Is that AQE re-optimization overhead
  * (per-stage re-planning on a tiny workload) or an extra shuffle? Runs
  * q3/q5 in two fresh sessions — AQE on vs off — with identical data and
  * cores; if the AQE-off time recovers the pre-de-pin number while the
  * plan still broadcasts (static planner uses the same size estimates at
  * this SF), the delta is planning overhead, not a physical-plan change.
  */
object AqeCostProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val queries = Seq("q3_top_orders", "q5_region_revenue")
    for (aqe <- Seq("true", "false")) {
      val s = SparkSession.builder()
        .master("local[32]")
        .appName(s"aqe_probe_$aqe")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", aqe)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      s.sparkContext.setLogLevel("WARN")
      def run(name: String): Unit =
        graft.SparkEntry.queries(name)(s, dir)
          .write.mode("overwrite").format("noop").save()
      queries.foreach(run) // warmup: JIT + codegen caches
      queries.foreach { name =>
        val times = (1 to 5).map { _ =>
          val t0 = System.nanoTime()
          run(name)
          (System.nanoTime() - t0) / 1e9
        }
        println(f"AQE=$aqe%-5s $name%-18s min=${times.min}%.3f " +
          times.map(t => f"$t%.3f").mkString("[", ",", "]"))
      }
      s.stop()
    }
  }
}
