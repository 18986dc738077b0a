package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Checkpoints

/** The bench/loop isolation mechanism must actually release blocks:
  * a regression here silently reintroduces the round-8 bench
  * pollution (block-manager state accumulating across queries). */
class CheckpointsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def persistedCount: Int =
    spark.sparkContext.getPersistentRDDs.size

  test("unpersist releases exactly the checkpointed frame's RDD") {
    // Sweep to a clean baseline first: leftovers from earlier suites in
    // the shared session can be unpersisted ASYNCHRONOUSLY by the
    // ContextCleaner mid-test (GC-driven), which made a before/after
    // delta assertion flaky. Our own strongly-referenced frame can't be
    // GC-cleaned, so absolute counts from zero are stable.
    Checkpoints.sweepAll(spark)
    val df = spark.range(1000).toDF("id").localCheckpoint()
    assert(df.count() == 1000)
    assert(persistedCount == 1,
      "localCheckpoint must register one persisted RDD")
    Checkpoints.unpersist(df)
    // unpersist(blocking=false): poll briefly for the async removal
    val deadline = System.nanoTime() + 5.seconds.toNanos
    while (persistedCount > 0 && System.nanoTime() < deadline)
      Thread.sleep(50)
    assert(persistedCount == 0,
      "checkpoint blocks must be released after unpersist")
  }

  test("unpersist on a plain plan is a safe no-op") {
    Checkpoints.sweepAll(spark)
    Checkpoints.unpersist(spark.range(10).toDF("id"))
    assert(persistedCount == 0)
  }

  test("sweepAll clears checkpoints and cached plans") {
    val a = spark.range(100).toDF("id").localCheckpoint()
    val b = spark.range(200).toDF("id").cache()
    assert(b.count() == 200 && a.count() == 100)
    assert(persistedCount >= 2)
    Checkpoints.sweepAll(spark)
    assert(persistedCount == 0,
      s"sweepAll must drop every persisted RDD, saw $persistedCount")
  }

  private implicit class IntSeconds(n: Int) {
    def seconds: scala.concurrent.duration.FiniteDuration =
      scala.concurrent.duration.Duration(n, "s")
  }
}
