package graft

import org.scalatest.funsuite.AnyFunSuite

/** Cross-engine determinism lints over the declared oracle SQL —
  * patterns retired after the round-9 sf0.1 gate caught real
  * divergences. These are string-level pins: cheap, but they catch
  * the exact regression shape that cost a correctness row.
  */
class OracleHygieneSpec extends AnyFunSuite {

  test("no raw value→DECIMAL casts of float-sourced columns") {
    // DuckDB casts FLOAT→DECIMAL by scaling in float32 (precision dies
    // at the 8th digit) while Spark quantizes the exact expansion; raw
    // doubles at scale ≥14 also diverge (double-scaled multiply vs
    // exact HALF_UP). The parity recipe is round(v::DOUBLE, k≤9) →
    // DECIMAL — never a direct cast of the raw element.
    for ((name, sql) <- SparkEntry.oracleSql) {
      assert(!sql.contains("CAST(v AS DECIMAL"),
        s"$name: oracle casts a raw element straight to DECIMAL — " +
          "route through round(v::DOUBLE, k) first")
      assert(!sql.contains("DECIMAL(28,14)"),
        s"$name: scale-14 decimal of raw values was retired (round-9 " +
          "parity bug) — use round(·, 9) → DECIMAL(28,12)")
    }
  }

  test("query names are unique across all spec families") {
    // SparkEntry.queries is a Map: a duplicate name silently drops one
    // implementation and the driver verifies whichever survived — a
    // round-10 near-miss (two d_snapshot_diff specs) proved the hazard
    val dups = SparkEntry.specs.groupBy(_.name).filter(_._2.size > 1).keys
    assert(dups.isEmpty,
      s"duplicate query names: ${dups.toSeq.sorted.mkString(", ")}")
  }

  test("every declared query carries an oracle") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing.isEmpty,
      s"queries without oracles: ${missing.toSeq.sorted.mkString(", ")} — " +
        "round 9 reached oracle coverage 100%; keep it there (bounds-" +
        "verify approximate outputs like q_approx_sketches does)")
  }
}
