package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.functions.AhoCorasick
import graft.streaming.StreamOps

/** Pins for the r14 optimization-round internals changes: each test
  * guards one rewrite/refactor whose SPEED was the point, asserting the
  * property that made it safe.
  */
class OptimizationR14Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  // --- streaming state-partition sizing ------------------------------

  test("scaledStatePartitions derives from input bytes, clamped to the " +
      "session ceiling, never zero") {
    val ceiling = spark.sessionState.conf.numShufflePartitions
    val mb = 1024L * 1024
    // tiny local feed: a handful of partitions, not the full width
    // (4 MiB target — measured crossover, see scaledStatePartitions)
    assert(StreamOps.scaledStatePartitions(spark, 2 * mb) == 1)
    assert(StreamOps.scaledStatePartitions(spark, 4 * mb) == 1)
    assert(StreamOps.scaledStatePartitions(spark, 16 * mb) == math.min(4, ceiling))
    // 100 TB-shaped input saturates at the session's width (the clamp
    // ceiling IS the cluster-scale behavior: plan unchanged at scale)
    assert(StreamOps.scaledStatePartitions(spark, 100L * mb * mb) == ceiling)
    // degenerate: empty input still yields a runnable query
    assert(StreamOps.scaledStatePartitions(spark, 0L) == 1)
  }

  test("file-source streaming twin still matches its batch result with " +
      "scaled state partitions (st_sessions end to end)") {
    // The partition count is internal routing: the emitted session set
    // must be byte-identical to the batch closure rule regardless of
    // how many state stores hold it. (The full oracle equality runs in
    // the gate; this pins the non-empty, duplicate-free shape cheaply.)
    val out = StreamOps.statefulSessions(spark, TestSpark.Sf)
      .select("user_id", "session_start_us", "n_events")
    val n = out.count()
    assert(n > 0, "finite feed must close at least one session")
    assert(out.distinct().count() == n, "sessions must not duplicate")
  }

  // --- executor-wide automaton cache ---------------------------------

  test("AhoCorasick.shared returns one instance per keyword list " +
      "(per-task rebuilds were ~240 ms/task on the funnel)") {
    val kws = IndexedSeq("foo", "bar", "baz")
    val a = AhoCorasick.shared(kws)
    val b = AhoCorasick.shared(IndexedSeq("foo", "bar", "baz")) // equal, not eq
    assert(a eq b, "equal keyword lists must share the built automaton")
    val c = AhoCorasick.shared(IndexedSeq("foo", "bar"))
    assert(!(a eq c), "different keyword lists must not collide")
    assert(a.countMatches("foo bar!").sum == 2)
  }

  // --- target-encoding single-pass rewrite ---------------------------

  test("LOO target-encoding min/max from per-brand extremes equals the " +
      "per-row form bit for bit (monotonicity rewrite)") {
    import spark.implicits._
    // Planted frame with ties, negatives, and a single-row category.
    val rows = Seq(
      ("a", "101.25"), ("a", "3.50"), ("a", "3.50"), ("a", "999.99"),
      ("b", "0.01"), ("b", "0.01"),
      ("c", "42.42"),
      ("d", "-7.30"), ("d", "55.00"), ("d", "55.00"), ("d", "54.99"))
    val base = rows.toDF("brand", "xs")
      .select($"brand", $"xs".cast("decimal(18,2)").as("x"))
    val bs = base.groupBy($"brand")
      .agg(count(lit(1)).as("n"), sum($"x").as("s"),
        min($"x").as("x_min"), max($"x").as("x_max"))
    val g = bs.agg((sum($"s").cast("double") / sum($"n").cast("double"))
      .as("mu"))
    def e(x: org.apache.spark.sql.Column) =
      (($"s" - x).cast("double") + lit(10.0) * $"mu") /
        ($"n" - 1 + 10).cast("double")
    // per-row form (the oracle's shape): min/max over every row's enc
    val perRow = base.join(bs, Seq("brand")).crossJoin(g)
      .select($"brand", e($"x").as("enc"))
      .groupBy($"brand").agg(min($"enc").as("lo"), max($"enc").as("hi"))
      .orderBy($"brand").collect()
    // extreme-x form (the rewritten query)
    val ext = bs.crossJoin(g)
      .select($"brand", e($"x_max").as("lo"), e($"x_min").as("hi"))
      .orderBy($"brand").collect()
    assert(perRow.length == ext.length)
    perRow.zip(ext).foreach { case (p, x) =>
      assert(p.getString(0) == x.getString(0))
      assert(java.lang.Double.doubleToRawLongBits(p.getDouble(1)) ==
        java.lang.Double.doubleToRawLongBits(x.getDouble(1)),
        s"min enc bits differ for ${p.getString(0)}")
      assert(java.lang.Double.doubleToRawLongBits(p.getDouble(2)) ==
        java.lang.Double.doubleToRawLongBits(x.getDouble(2)),
        s"max enc bits differ for ${p.getString(0)}")
    }
  }
}
