package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dev-only A/B probe for graft.plans.WindowDedupToAgg: times the naive
  * window-dedup idiom (row_number over (partition by key order by ord)
  * = 1) against the rule-rewritten hash-aggregate form on the sf0.1
  * lineitem table (keep first line per order). Run:
  *
  *   sbt "Test/runMain graft.tools.DedupRewriteProbe /root/testdata/sf0.1"
  */
object DedupRewriteProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val s = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    import s.implicits._
    def naive() = s.read.parquet(s"$dir/lineitem.parquet")
      .withColumn("rn", row_number().over(
        Window.partitionBy($"l_orderkey").orderBy($"l_linenumber")))
      .filter($"rn" === 1)
    // heavy-group shape: few keys, many rows per key — where the
    // window form's per-partition sort dominates
    def heavy() = s.read.parquet(s"$dir/lineitem.parquet")
      .withColumn("rn", row_number().over(
        Window.partitionBy($"l_suppkey").orderBy(
          $"l_extendedprice", $"l_orderkey", $"l_linenumber")))
      .filter($"rn" === 1)
    val em = s.sessionState.experimentalMethods
    for (rule <- Seq(false, true)) {
      em.extraOptimizations =
        if (rule) Seq(graft.plans.WindowDedupToAgg) else Nil
      for ((label, q) <- Seq("4rows/key" -> naive _, "600rows/key" -> heavy _)) {
        (1 to 2).foreach(_ => q().write.mode("overwrite").format("noop").save())
        val times = (1 to 5).map { _ =>
          val t0 = System.nanoTime()
          q().write.mode("overwrite").format("noop").save()
          (System.nanoTime() - t0) / 1e9
        }
        println(f"rule=$rule%-5s $label%-12s min=${times.min}%.3f " +
          times.map(t => f"$t%.3f").mkString("[", ",", "]"))
      }
    }
    s.stop()
  }
}
