package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.ops.Buckets

/** The bucket-pair scaffold under degenerate load: oversized buckets
  * must produce star pairs via a row-local projection (never a
  * collect_list buffer), the cap must be observable, and capped/uncapped
  * semantics must agree on buckets under the cap.
  */
class BucketsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def bucketDf(rows: Seq[(String, Long)]) =
    rows.toDF("bkt", "id")

  test("under-cap buckets expand to all pairs") {
    val df = bucketDf(Seq(("a", 1L), ("a", 2L), ("a", 3L), ("b", 7L), ("b", 9L), ("c", 5L)))
    val got = Buckets.pairs(df, Seq("bkt"), "id", maxBucket = 10)
      .as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 2L), (1L, 3L), (2L, 3L), (7L, 9L)))
  }

  test("over-cap bucket emits exactly the star to its min id") {
    val df = bucketDf((1L to 6L).map(i => ("hot", i)) :+ ("cold", 100L) :+ ("cold", 101L))
    val got = Buckets.pairs(df, Seq("bkt"), "id", maxBucket = 3)
      .as[(Long, Long)].collect().toSet
    val star = (2L to 6L).map(i => (1L, i)).toSet
    assert(got == star + ((100L, 101L)))
  }

  test("pair sets dedup across buckets (same pair from two bands once)") {
    val df = bucketDf(Seq(("a", 1L), ("a", 2L), ("b", 1L), ("b", 2L)))
    val got = Buckets.pairs(df, Seq("bkt"), "id", maxBucket = 10).collect()
    assert(got.length == 1)
  }

  test("degenerate single bucket at 50k ids: O(n) star output, no quadratic blowup") {
    // 50_000 ids in ONE bucket with cap 100: all-pairs would be 1.25e9
    // rows; the star path must emit exactly n-1, all anchored at the min.
    // The window's external sort streams the bucket (spilling at real
    // scale) — nothing list-collects it (see plan-shape test below).
    val n = 50000L
    val df = spark.range(1, n + 1).select(lit("hot").as("bkt"), $"id")
    val out = Buckets.pairs(df, Seq("bkt"), "id", maxBucket = 100)
    val agg = out.agg(
      count(lit(1)), min($"id_a"), max($"id_a"), countDistinct($"id_b"))
      .as[(Long, Long, Long, Long)].head()
    assert(agg == ((n - 1, 1L, 1L, n - 1)))
  }

  test("cap trigger is observable via the plan metric; silent when untriggered") {
    val hot = bucketDf((1L to 6L).map(i => ("hot", i)) :+ ("cold", 1L) :+ ("cold", 2L))
    val capped = Buckets.pairs(hot, Seq("bkt"), "id", maxBucket = 3)
    capped.collect()
    val m = capped.queryExecution.observedMetrics.collectFirst {
      case (k, v) if k.startsWith("graft_buckets_") => v
    }.getOrElse(fail("no graft_buckets_* observed metric in plan"))
    assert(m.getAs[Long]("capped_buckets") == 1L)
    assert(m.getAs[Long]("capped_rows") == 6L)

    val uncapped = Buckets.pairs(hot, Seq("bkt"), "id", maxBucket = 100)
    uncapped.collect()
    val m2 = uncapped.queryExecution.observedMetrics.collectFirst {
      case (k, v) if k.startsWith("graft_buckets_") => v
    }.get
    assert(m2.getAs[Long]("capped_buckets") == 0L)
  }

  test("drainCapCounts surfaces tripped caps once, then drains clean") {
    Buckets.drainCapCounts(10) // flush observations left by other tests
    val df = bucketDf((1L to 50L).map(i => ("hot", i)))
    Buckets.pairs(df, Seq("bkt"), "id", maxBucket = 10).count()
    val (caps, unreported) = Buckets.drainCapCounts()
    assert(unreported.isEmpty, s"executed plan must report: $unreported")
    assert(caps.values.sum == 1L, s"one tripped bucket expected: $caps")
    assert(Buckets.drainCapCounts(10)._1.isEmpty, "queue must be drained")
  }

  test("cap observations are THREAD-scoped: concurrent queries never cross-drain") {
    // The parallel Verify gate's soundness rests on this: two pool
    // threads each build + run + drain; the thread that trips a cap is
    // the only one that sees it, and a capless thread drains empty.
    Buckets.drainCapCounts(10)
    val tripped = new java.util.concurrent.atomic.AtomicReference[Map[String, Long]]()
    val clean = new java.util.concurrent.atomic.AtomicReference[Map[String, Long]]()
    val barrier = new java.util.concurrent.CyclicBarrier(2)
    val t1 = new Thread(() => {
      val df = bucketDf((1L to 50L).map(i => ("hot", i)))
      barrier.await()
      Buckets.pairs(df, Seq("bkt"), "id", maxBucket = 10).count()
      tripped.set(Buckets.drainCapCounts()._1)
    })
    val t2 = new Thread(() => {
      val df = bucketDf(Seq(("a", 1L), ("a", 2L), ("b", 3L), ("b", 4L)))
      barrier.await()
      Buckets.pairs(df, Seq("bkt"), "id", maxBucket = 10).count()
      clean.set(Buckets.drainCapCounts()._1)
    })
    t1.start(); t2.start(); t1.join(120000); t2.join(120000)
    assert(tripped.get != null && tripped.get.values.sum == 1L,
      s"capping thread must see its own trip: ${tripped.get}")
    assert(clean.get != null && clean.get.values.sum == 0L,
      s"capless thread must never see a sibling's trip: ${clean.get}")
    // and neither thread's observations leak into this (main) thread
    assert(Buckets.drainCapCounts(10)._1.isEmpty)
  }

  test("drainCapCounts names a built-but-never-executed plan as unreported") {
    Buckets.drainCapCounts(10) // flush observations left by other tests
    val df = bucketDf(Seq(("a", 1L), ("a", 2L)))
    Buckets.pairs(df, Seq("bkt"), "id", maxBucket = 10) // plan built, no action
    val (caps, unreported) = Buckets.drainCapCounts(timeoutMs = 50)
    assert(caps.isEmpty && unreported.size == 1,
      s"orphan observation must surface by name, got ($caps, $unreported)")
  }

  test("plan shape: bucket membership comes from a window, and the only " +
    "collect_list sits behind the under-cap filter") {
    val df = bucketDf(Seq(("a", 1L), ("a", 2L)))
    val plan = Buckets.pairs(df, Seq("bkt"), "id", maxBucket = 7)
      .queryExecution.executedPlan.toString
    assert(plan.contains("Window"), "bucket stats must be window-computed")
    // one logical collect_list aggregate = one partial + one final node
    val finals =
      "functions=\\[collect_list".r.findAllMatchIn(plan).length
    val partials =
      "functions=\\[partial_collect_list".r.findAllMatchIn(plan).length
    assert(finals == 1 && partials == 1,
      s"expected one collect_list agg, plan:\n$plan")
    // the list-collecting branch filters to buckets <= cap first
    assert(plan.contains("<= 7"), s"under-cap filter missing, plan:\n$plan")
  }
}
