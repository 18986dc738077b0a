package graft

import org.scalatest.funsuite.AnyFunSuite

/** Blanket plan lint: NO query in the declared surface may rank or
  * aggregate through an unpartitioned logical Window — the
  * single-reducer sort that dies at corpus scale. Bounded-frame ranks
  * have sanctioned shapes instead (collect+sort+posexplode for ≤k-row
  * frames, a constant-valued ATTRIBUTE partition key for cross-joined
  * scalars, Skew.globalRowNumber for genuine global ranks). A new
  * query regressing to Window.orderBy fails here by name. */
class WindowSweepSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("no unpartitioned logical windows anywhere in the declared surface") {
    val offenders = SparkEntry.queries.keys.toSeq.sorted.flatMap { q =>
      // plan-construction errors are other specs' business; the sweep
      // only lints plans that build
      try {
        val df = SparkEntry.queries(q)(spark, TestSpark.Sf)
        val bad = df.queryExecution.optimizedPlan.collect {
          case w: org.apache.spark.sql.catalyst.plans.logical.Window
            if w.partitionSpec.isEmpty => w
        }
        if (bad.nonEmpty) Some(s"$q (${bad.size})") else None
      } catch { case _: Throwable => None }
    }
    assert(offenders.isEmpty,
      s"unpartitioned window(s) in: ${offenders.mkString(", ")}")
  }

  test("no CartesianProduct anywhere in the declared surface") {
    // BroadcastNestedLoopJoin is sanctioned where one side is a
    // bounded dim (knn brute's codebook, range-band dims); an actual
    // CartesianProduct (both sides shuffled, |L|×|R| work) never is
    val offenders = SparkEntry.queries.keys.toSeq.sorted.flatMap { q =>
      try {
        val p = SparkEntry.queries(q)(spark, TestSpark.Sf)
          .queryExecution.executedPlan.toString
        if (p.contains("CartesianProduct")) Some(q) else None
      } catch { case _: Throwable => None }
    }
    assert(offenders.isEmpty,
      s"cartesian product(s) in: ${offenders.mkString(", ")}")
  }
}
