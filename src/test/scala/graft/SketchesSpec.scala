package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

/** Approximate sketches pinned against exact values (no SQL oracle —
  * HLL/KLL internals differ per engine by design). */
class SketchesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("approx_count_distinct within 5% of exact; approx median within 1 quantity") {
    val li = spark.read.parquet(s"${TestSpark.Sf}/lineitem.parquet")
    val rows = li.groupBy($"l_returnflag")
      .agg(
        approx_count_distinct($"l_partkey").as("approx"),
        countDistinct($"l_partkey").as("exact"),
        percentile_approx($"l_quantity", lit(0.5), lit(1000)).as("amed"),
        percentile($"l_quantity", lit(0.5)).as("emed"))
      .collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val (a, e) = (r.getAs[Long]("approx").toDouble, r.getAs[Long]("exact").toDouble)
      assert(math.abs(a - e) / e < 0.05, s"hll off: $a vs $e")
      assert(math.abs(r.getAs[Double]("amed") - r.getAs[Double]("emed")) <= 1.0)
    }
  }

  test("KMV sketch: merge = union-then-retake; estimate within 25% on synthetic vocab") {
    // the mergeability the d_kmv_distinct design rests on: k smallest
    // of (A ∪ B) == k smallest of (kmin(A) ∪ kmin(B))
    val k = 64
    val rnd = new scala.util.Random(11)
    val a = Seq.fill(5000)(rnd.nextLong().abs % (1L << 48)).distinct
    val b = Seq.fill(5000)(rnd.nextLong().abs % (1L << 48)).distinct
    def kmin(xs: Seq[Long]) = xs.distinct.sorted.take(k)
    assert(kmin(a ++ b) == kmin(kmin(a) ++ kmin(b)))
    // estimator sanity on uniform 48-bit hashes
    val u = (a ++ b).distinct
    val est = (k - 1) * math.pow(2, 48) / kmin(u).last
    assert(math.abs(est - u.size) / u.size < 0.25, s"est $est vs ${u.size}")
  }
}
