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

  test("count-min: est >= exact for every token; split-merge equals one-shot sketch") {
    import graft.ops.CountMin
    val (d, w) = (4, 128)
    val rnd = new scala.util.Random(7)
    // zipf-ish synthetic stream: token i appears ~ 2000/i times
    val stream = (1 to 50).flatMap(i => Seq.fill(2000 / i)(s"t$i")) ++
      Seq.fill(500)(s"rare${rnd.nextInt(400)}")
    val toks = stream.toDF("tok")
    val counters = CountMin.sketch(toks, "tok", d, w)
    // merge = sum of the halves' matrices, cell by cell (the property
    // map-side combine relies on)
    val (h1, h2) = stream.splitAt(stream.size / 2)
    val merged = CountMin.sketch(h1.toDF("tok"), "tok", d, w)
      .unionByName(CountMin.sketch(h2.toDF("tok"), "tok", d, w))
      .groupBy("row", "bucket").agg(sum("cnt").as("cnt"))
    assert(counters.except(merged).isEmpty && merged.except(counters).isEmpty,
      "split-merge sketch must equal the one-shot sketch")
    val exact = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val probes = exact.keys.toSeq.toDF("tok")
    val est = CountMin.estimate(counters, probes, "tok", d, w)
      .as[(String, Long)].collect().toMap
    exact.foreach { case (t, n) =>
      assert(est(t) >= n, s"CMS must never undercount: $t est=${est(t)} exact=$n")
    }
    // never-seen token estimates from empty-or-collided buckets: still
    // defined (>= 0), and bounded by the worst single-cell load
    val unseen = CountMin.estimate(counters, Seq("absent").toDF("tok"), "tok", d, w)
      .as[(String, Long)].collect().head._2
    assert(unseen >= 0L)
  }
}
