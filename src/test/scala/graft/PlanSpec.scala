package graft

import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan assertions: the plans we designed for are the plans we
  * get (pushdown reaches the scans, dims broadcast, no accidental
  * cartesian products, codegen on the hot aggregates). */
class PlanSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, TestSpark.Sf)
      .queryExecution.executedPlan.toString

  test("q3: filters pushed to parquet scans, dims broadcast") {
    val p = plan("q3_top_orders")
    assert(p.contains("PushedFilters: [IsNotNull(c_mktsegment), EqualTo(c_mktsegment,BUILDING)"), p)
    assert(p.contains("BroadcastHashJoin"), "expected broadcast joins")
    assert(!p.contains("CartesianProduct"))
  }

  test("q5: star join is all broadcast on the fact table, one shuffle agg") {
    val p = plan("q5_region_revenue")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin"),
      "fact table should not be shuffled for dim joins:\n" + p)
  }

  test("q1: partial aggregation before the exchange (map-side combine)") {
    val p = plan("q1_pricing_summary")
    assert(p.contains("partial_sum"), "map-side combine expected:\n" + p)
    assert(p.indexOf("partial_sum") > p.indexOf("Exchange hashpartitioning"),
      "partial agg must sit below the exchange")
  }

  test("d_token_stats: column pruning reaches the scan") {
    val p = plan("d_token_stats")
    // only the needed columns are read, not source/n_chars
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string,lang:string>"), p)
  }

  test("knn brute: broadcast nested loop (by design), not cartesian") {
    val p = plan("e_knn_brute")
    assert(p.contains("BroadcastNestedLoopJoin"), p.linesIterator.take(5).mkString("\n"))
    assert(!p.contains("CartesianProduct"))
  }

  test("d_word_freq: no unpartitioned running window over unbounded input") {
    // The global rank must go through Skew.globalRowNumber (range
    // partition + offset merge) — a bare Window.orderBy would sort the
    // whole distinct-token table in ONE partition at corpus scale.
    val df = SparkEntry.queries("d_word_freq")(spark, TestSpark.Sf)
    val windows = df.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    assert(windows.forall(_.partitionSpec.nonEmpty),
      "found a window with an empty partitionSpec (single-partition sort)")
  }

  test("neardup lsh: signature computed once, bucket-local pairs, no cartesian") {
    val p = plan("e_neardup_lsh")
    assert(!p.contains("CartesianProduct"))
    assert(p.linesIterator.count(_.contains("FileScan parquet")) <= 3,
      "expected ≤3 scans (bands + two vector re-attach):\n" + p)
  }

  test("prefix-filter jaccard: bucket-generated candidates, no block self-join") {
    val p = plan("dd_jaccard_block_pairs")
    assert(!p.contains("CartesianProduct"))
    // candidates come from the (block, prefix-token) group-by, so the
    // only joins are the two shingle-set re-attachments
    assert(p.linesIterator.count(_.contains("FileScan parquet")) <= 3, p)
  }

  test("minhash pairs: no self-join recompute of signatures") {
    val p = plan("dd_minhash_pairs")
    val sigOccurrences = "graft_minhash_signature".r.findAllIn(p).size
    assert(sigOccurrences <= 2,
      s"signature computed in $sigOccurrences plan branches — self-join recompute?")
    assert(p.linesIterator.count(_.contains("FileScan parquet")) <= 3,
      "expected ≤3 scans (bands + two shingle re-attach):\n" + p)
  }
}
