package graft.tools

import org.apache.spark.sql.functions._

/** Dev-only probe: does AQE's OptimizeSkewedJoin actually split a hot
  * join partition under the conditions the repo claims (SURVEY §4 /
  * ARCHITECTURE: "AQE's skew-join splitting covers joins; Skew.* covers
  * the aggregation side")? Run to print whether `skew=true` appears in
  * the post-execution plan. Known AQE gate worth remembering: a
  * downstream hash-distribution requirement (e.g. a groupBy consuming
  * the join) makes AQE skip the split unless
  * spark.sql.adaptive.forceOptimizeSkewedJoin is set. */
object SkewJoinProbe {
  def main(args: Array[String]): Unit = {
    val s = graft.Sessions.local(8)
    import s.implicits._
    s.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB")
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    s.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
    s.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    // key 0 carries 200k rows; keys 1..99 carry ~100 each
    val left = s.range(0, 200000).select(lit(0L).as("k"), $"id".as("v"))
      .union(s.range(0, 9900).select(($"id" % 99 + 1).as("k"), $"id".as("v")))
    val right = s.range(0, 100)
      .select($"id".as("k"), md5($"id".cast("string")).as("pay"))
    // no agg after the join: a downstream hash-distribution requirement
    // makes AQE skip OptimizeSkewedJoin (splitting would break it)
    val j = left.join(right, "k").select($"k", $"v", $"pay")
    // execute THIS queryExecution (a .write would plan a fresh copy and
    // leave j's adaptive plan un-finalized)
    val n = j.collect().length
    println(s"rows=$n")
    val plan = j.queryExecution.executedPlan.toString
    println("SKEWMARK=" + plan.contains("skew=true"))
    println(plan.linesIterator.filter(l =>
        l.contains("SortMergeJoin") || l.contains("ShuffleRead") ||
        l.contains("skew")).mkString("\n").take(900))
    s.stop()
  }
}
