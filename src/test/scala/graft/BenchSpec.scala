package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins for the bench contamination sentinel (r11 judge directive #2):
  * BENCH_r10/r11 were both recorded on a contended machine and read as
  * regressions until a judge re-ran them quiet. spreadRatio + SpreadMax
  * are what make a polluted recording self-identify via
  * `"spread_ok":false` in the JSON line. */
class BenchSpec extends AnyFunSuite {

  test("spreadRatio is max/min over positive samples") {
    assert(Bench.spreadRatio(Seq(1.0, 2.0, 1.5)) == 2.0)
    assert(Bench.spreadRatio(Seq(0.8, 0.805, 0.81)) < 1.02)
    // the r11 contaminated shape: 6.3/5.4/6.1 vs a 0.8 quiet run would
    // never flag on its own samples (spread 1.17), but ev_ks_drift's
    // 8.388/4.590/1.154 does
    assert(Bench.spreadRatio(Seq(8.388, 4.590, 1.154)) > Bench.SpreadMax)
  }

  test("spreadRatio degenerate inputs: empty, single, zero samples") {
    assert(Bench.spreadRatio(Nil) == 1.0)
    assert(Bench.spreadRatio(Seq(0.5)) == 1.0)
    // a failed query times ~0 per sample; must not divide by zero or
    // self-flag as contamination
    assert(Bench.spreadRatio(Seq(0.0, 0.0, 0.0)) == 1.0)
    assert(Bench.spreadRatio(Seq(0.0, 1.0)) == 1.0)
  }

  test("SpreadMax is the 2x bar the judge graded r11 against") {
    assert(Bench.SpreadMax == 2.0)
    assert(Bench.spreadRatio(Seq(1.0, 1.99)) <= Bench.SpreadMax)
    assert(Bench.spreadRatio(Seq(1.0, 2.01)) > Bench.SpreadMax)
  }
}
