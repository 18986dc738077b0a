package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.queries.Events

/** Hand vectors for the sequential signal models (Holt, Viterbi burst)
  * — the oracle hash-proves engine parity; these pin the SEMANTICS on
  * series where the right answer is computable by hand. */
class SignalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("burst decode: a sustained elevated run bursts, the baseline does not") {
    // mean 13, burst rate 1.15*13 = 14.95; y=20 gains ~0.85 nats/day in
    // state 1 (> the 0.5 entry penalty), y=10 prefers state 0 by ~0.55
    val xs = Seq(10L, 10L, 10L, 10L, 20L, 20L, 20L, 10L, 10L, 10L)
    val grid = xs.zipWithIndex
      .map { case (x, d) => ("a", d.toLong, x) }
      .toDF("event_type", "d", "x")
    val got = Events.burstDecodeOverGrid(grid)
      .orderBy($"d").select($"burst").as[Long].collect().mkString
    assert(got == "0000111000", s"decoded $got")
  }

  test("burst decode: an isolated spike below the entry gain stays calm") {
    // y=15 gains 15*ln(1.15) - 1.95 = 0.146 nats < the 0.5 entry
    // penalty — a single mild spike must NOT flip the state
    val xs = Seq(13L, 13L, 15L, 13L, 13L, 13L, 13L, 13L, 13L, 13L)
    val grid = xs.zipWithIndex
      .map { case (x, d) => ("a", d.toLong, x) }
      .toDF("event_type", "d", "x")
    val got = Events.burstDecodeOverGrid(grid)
      .orderBy($"d").select($"burst").as[Long].collect().mkString
    assert(got == "0000000000", s"decoded $got")
  }

  test("Holt-Winters: a pure weekly pattern is reproduced exactly") {
    // y_t = 100 + p[t%7] with a zero-sum pattern: the init lands
    // exactly on-model (l=100, b=0, s=p), every recurrence step is
    // then invariant, so forecasts equal 100 + p[(T+h)%7] to the bit
    val p = Seq(3L, -1L, 4L, -1L, -5L, 9L, -9L)
    val xs = (0 until 21).map(t => ("a", t.toLong, 100L + p(t % 7)))
    val grid = xs.toDF("event_type", "d", "x")
    val fc = Events.holtWintersOverGrid(grid)
      .orderBy($"h").as[(String, Long, Long)].collect()
    fc.foreach { case (_, h, v) =>
      assert(v == (100L + p(((20 + h) % 7).toInt)) * 1000000L,
        s"h=$h forecast=$v")
    }
  }

  test("Holt fold: a perfectly linear series forecasts the exact line") {
    // y_t = 5 + 3t: with l0=y0, b0=y1-y0 the recurrence is exact at
    // every step (l_t = y_t, b_t = 3), so forecasts are 5+3(T+h)
    val xs = (0 until 10).map(t => ("a", t.toLong, 5L + 3L * t))
    val grid = xs.toDF("event_type", "d", "x")
    val got = Events.holtOverDayGrid(grid)
      .orderBy($"h").as[(String, Long, Long)].collect()
    got.foreach { case (_, h, fc) =>
      assert(fc == (5L + 3L * (9 + h)) * 1000000L, s"h=$h fc=$fc")
    }
  }
}
