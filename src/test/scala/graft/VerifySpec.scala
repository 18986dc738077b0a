package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins for the gate's cap-observation adjudication — in particular the
  * OFF-LOCAL tolerance branch (r12 judge directive #1): in local[n]
  * accumulator updates are exactly-once, so the over-count-under-retry
  * path was dead code no run had ever taken until the local-cluster
  * gate existed. These pin every cell of the decision table so the
  * branch's semantics can't drift unobserved. */
class VerifySpec extends AnyFunSuite {
  private val caps = Map("graft_buckets_x" -> 3L)

  test("no-cap oracle: zero tripped is ok, any tripped fails — local or not") {
    assert(Verify.capVerdict("q", isLocal = true, 0L, None, Map.empty) == Verify.CapOk)
    assert(Verify.capVerdict("q", isLocal = false, 0L, None, Map.empty) == Verify.CapOk)
    assert(Verify.capVerdict("q", isLocal = true, 3L, None, caps).isInstanceOf[Verify.CapFail])
    // the retry tolerance must NOT leak to no-cap oracles: a tripped cap
    // off-local still means the output silently diverged from its oracle
    assert(Verify.capVerdict("q", isLocal = false, 3L, None, caps).isInstanceOf[Verify.CapFail])
  }

  test("cap-stating query on-local: exact equality, both directions fail") {
    val e = Some(5L)
    assert(Verify.capVerdict("dd_capped_star_pairs", isLocal = true, 5L, e, caps) == Verify.CapOk)
    assert(Verify.capVerdict("dd_capped_star_pairs", isLocal = true, 6L, e, caps)
      .isInstanceOf[Verify.CapFail]) // over-count has no legitimate local cause
    assert(Verify.capVerdict("dd_capped_star_pairs", isLocal = true, 4L, e, caps)
      .isInstanceOf[Verify.CapFail])
  }

  test("cap-stating query off-local: over-count warns, under-count still fails") {
    val e = Some(5L)
    assert(Verify.capVerdict("dd_capped_star_pairs", isLocal = false, 5L, e, caps) == Verify.CapOk)
    // the previously-dead branch: a retried stage re-adds its accumulator
    // updates, so tripped > n_capped is tolerable noise — warn, keep output
    Verify.capVerdict("dd_capped_star_pairs", isLocal = false, 7L, e, caps) match {
      case Verify.CapWarn(msg) =>
        assert(msg.contains("7") && msg.contains("5") && msg.contains("off-local"))
      case other => fail(s"expected CapWarn, got $other")
    }
    // under-count means updates were LOST, not retried — never tolerable
    assert(Verify.capVerdict("dd_capped_star_pairs", isLocal = false, 4L, e, caps)
      .isInstanceOf[Verify.CapFail])
  }
}
