package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Density

/** Hand-computed DBSCAN vectors for [[Density.dbscanGrid]] (eps=1,
  * minPts=4, L∞): a dense single cell (the no-pair-enumeration
  * shortcut path), two chain clusters with cores and borders, a border
  * point reachable from BOTH clusters (must take the MIN label — the
  * deterministic tie-break), and an isolated noise point.
  */
class DensitySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("dbscanGrid labels cores, borders, tie-break border, noise") {
    import spark.implicits._
    val pts = Seq(
      // cluster A: cores 2 and 4, borders 1 and 3
      (1L, 9L, 11L), (2L, 9L, 12L), (3L, 9L, 13L), (4L, 10L, 12L),
      // cluster B: cores 5 and 7, borders 6 and 8
      (5L, 12L, 12L), (6L, 13L, 11L), (7L, 13L, 12L), (8L, 13L, 13L),
      // border of BOTH (core neighbors 4 and 5) -> min label wins
      (9L, 11L, 12L),
      // isolated noise
      (10L, 50L, 50L),
      // dense single cell: 4 cohabitants, all core via cell_n alone
      (11L, 30L, 30L), (12L, 30L, 30L), (13L, 30L, 30L), (14L, 30L, 30L)
    ).toDF("id", "x", "y")

    val got = Density.dbscanGrid(pts, eps = 1L, minPts = 4L)
      .select($"id", $"is_core", $"cluster")
      .collect()
      .map(r => (r.getLong(0), r.getBoolean(1), r.getLong(2)))
      .sortBy(_._1)

    val expected = Seq(
      (1L, false, 2L), (2L, true, 2L), (3L, false, 2L), (4L, true, 2L),
      (5L, true, 5L), (6L, false, 5L), (7L, true, 5L), (8L, false, 5L),
      (9L, false, 2L), // tie-break: min(2, 5)
      (10L, false, -1L),
      (11L, true, 11L), (12L, true, 11L), (13L, true, 11L),
      (14L, true, 11L))
    assert(got.toSeq == expected)
  }

  test("dbscanGrid with no dense region is all noise") {
    import spark.implicits._
    val pts = Seq((1L, 0L, 0L), (2L, 10L, 10L), (3L, 20L, 0L))
      .toDF("id", "x", "y")
    val got = Density.dbscanGrid(pts, eps = 1L, minPts = 2L)
      .select($"id", $"is_core", $"cluster").collect()
      .map(r => (r.getLong(0), r.getBoolean(1), r.getLong(2))).sortBy(_._1)
    assert(got.toSeq == Seq((1L, false, -1L), (2L, false, -1L),
      (3L, false, -1L)))
  }

  test("dbscanGridIncremental equals full recompute across a merge") {
    import spark.implicits._
    // Base = the main vector set. The batch drops two points into the
    // bridge cell: old border 9 becomes core, clusters A (label 2) and
    // B (label 5) merge, and B's out-of-halo borders (6, 8) must be
    // re-labelled through the rename map without a new search.
    val basePts = Seq(
      (1L, 9L, 11L), (2L, 9L, 12L), (3L, 9L, 13L), (4L, 10L, 12L),
      (5L, 12L, 12L), (6L, 13L, 11L), (7L, 13L, 12L), (8L, 13L, 13L),
      (9L, 11L, 12L), (10L, 50L, 50L),
      (11L, 30L, 30L), (12L, 30L, 30L), (13L, 30L, 30L), (14L, 30L, 30L)
    ).toDF("id", "x", "y")
    val batch = Seq((15L, 11L, 12L), (16L, 11L, 13L)).toDF("id", "x", "y")

    def canon(df: org.apache.spark.sql.DataFrame) = df
      .select($"id", $"is_core", $"cluster").collect()
      .map(r => (r.getLong(0), r.getBoolean(1), r.getLong(2))).sortBy(_._1)

    val incr = canon(
      Density.dbscanGridIncremental(basePts, batch, eps = 1L, minPts = 4L))
    val full = canon(
      Density.dbscanGrid(basePts.unionAll(batch), eps = 1L, minPts = 4L))
    assert(incr.toSeq == full.toSeq)
    // and the merge actually happened the way the vector intends
    assert(incr.toSeq == Seq(
      (1L, false, 2L), (2L, true, 2L), (3L, false, 2L), (4L, true, 2L),
      (5L, true, 2L), (6L, false, 2L), (7L, true, 2L), (8L, false, 2L),
      (9L, true, 2L), (10L, false, -1L),
      (11L, true, 11L), (12L, true, 11L), (13L, true, 11L),
      (14L, true, 11L), (15L, true, 2L), (16L, true, 2L)))
  }

  test("incrementalState folds batches: three-way split equals one-shot") {
    import spark.implicits._
    val b1 = Seq( // the two arms, cores not yet connected to anything new
      (1L, 9L, 11L), (2L, 9L, 12L), (3L, 9L, 13L), (4L, 10L, 12L),
      (5L, 12L, 12L), (6L, 13L, 11L), (7L, 13L, 12L), (8L, 13L, 13L)
    ).toDF("id", "x", "y")
    val b2 = Seq( // bridge border, noise, dense far cell
      (9L, 11L, 12L), (10L, 50L, 50L),
      (11L, 30L, 30L), (12L, 30L, 30L), (13L, 30L, 30L), (14L, 30L, 30L)
    ).toDF("id", "x", "y")
    val b3 = Seq((15L, 11L, 12L), (16L, 11L, 13L)).toDF("id", "x", "y")

    def canon(df: org.apache.spark.sql.DataFrame) = df
      .select($"id", $"is_core", $"cluster").collect()
      .map(r => (r.getLong(0), r.getBoolean(1), r.getLong(2))).sortBy(_._1)

    val s1 = Density.solve(b1, eps = 1L, minPts = 4L)
    val s2 = Density.incrementalState(s1, b2, eps = 1L, minPts = 4L)
    // the intermediate fold must itself equal a one-shot solve
    assert(canon(s2.labels).toSeq ==
      canon(Density.dbscanGrid(b1.unionAll(b2), 1L, 4L)).toSeq)
    val s3 = Density.incrementalState(s2, b3, eps = 1L, minPts = 4L)
    assert(canon(s3.labels).toSeq ==
      canon(Density.dbscanGrid(b1.unionAll(b2).unionAll(b3), 1L, 4L)).toSeq)
  }

  test("incremental rejects id collisions loudly (deletion/update out of contract)") {
    import spark.implicits._
    val base = Seq((1L, 0L, 0L), (2L, 1L, 0L), (3L, 0L, 1L))
      .toDF("id", "x", "y")
    // re-sending id 2 (a "move") must fail fast, not silently double it
    val resend = Seq((2L, 5L, 5L), (9L, 6L, 6L)).toDF("id", "x", "y")
    val e = intercept[IllegalArgumentException] {
      Density.dbscanGridIncremental(base, resend, eps = 1L, minPts = 3L)
        .collect()
    }
    assert(e.getMessage.contains("out of contract")
      && e.getMessage.contains("2"), e.getMessage)
    // disjoint ids still fold fine (the guard must not reject growth)
    val fresh = Seq((10L, 5L, 5L), (11L, 6L, 6L)).toDF("id", "x", "y")
    assert(Density.dbscanGridIncremental(base, fresh, eps = 1L, minPts = 3L)
      .count() == 5)
  }

  test("dbscanGrid eps>1 groups by coarser cells exactly") {
    import spark.implicits._
    // eps=3: points at x=0 and x=3 are within L-inf 3 (adjacent cells);
    // x=0 and x=7 are not (distance 7 > 3, two cells apart).
    val pts = Seq((1L, 0L, 0L), (2L, 3L, 0L), (3L, 7L, 0L), (4L, 2L, 1L))
      .toDF("id", "x", "y")
    val got = Density.dbscanGrid(pts, eps = 3L, minPts = 3L)
      .select($"id", $"is_core", $"cluster").collect()
      .map(r => (r.getLong(0), r.getBoolean(1), r.getLong(2))).sortBy(_._1)
    // 1,2,4 mutually within 3 -> all core, label 1; 3 sees only 2 & 4?
    // d(3,2)=4>3, d(3,4)=5>3 -> isolated noise.
    assert(got.toSeq == Seq((1L, true, 1L), (2L, true, 1L),
      (3L, false, -1L), (4L, true, 1L)))
  }
}
