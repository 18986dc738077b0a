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

  test("t-digest: rank error < 1% on 100k points, mergeable, bounded size") {
    import graft.ops.TDigest
    val rnd = new scala.util.Random(7)
    // skewed data (squared uniform) — tails are where t-digest must hold
    val xs = Vector.fill(100000) { val u = rnd.nextDouble(); u * u * 1000.0 }
    val sorted = xs.sorted
    def rankOf(v: Double): Double = {
      val below = sorted.count(_ < v)
      below.toDouble / sorted.size
    }
    val one = xs.foldLeft(TDigest.empty)(TDigest.add)
    for (q <- Seq(0.05, 0.5, 0.95, 0.99)) {
      val est = TDigest.quantile(one, q)
      assert(math.abs(rankOf(est) - q) < 0.01,
        s"one-pass q=$q est=$est rank=${rankOf(est)}")
    }
    // mergeability: 8 shard sketches merged == same rank guarantees
    val merged = xs.grouped(12500)
      .map(_.foldLeft(TDigest.empty)(TDigest.add))
      .reduce(TDigest.merge)
    for (q <- Seq(0.05, 0.5, 0.95, 0.99)) {
      val est = TDigest.quantile(merged, q)
      assert(math.abs(rankOf(est) - q) < 0.01,
        s"merged q=$q est=$est rank=${rankOf(est)}")
    }
    // state stays bounded: the k1 scale caps clusters at δ (they sit
    // between δ/2 when every cluster fills its quota and δ worst-case)
    assert(merged.cs.length <= TDigest.Compression && merged.buf.isEmpty,
      s"centroids=${merged.cs.length}")
    // weight conservation across compress/merge
    assert(merged.cs.map(_._2).sum == xs.size.toLong)
  }

  test("explicit-register HLL: mergeability is exact, estimate within 10% at m=256") {
    import graft.ops.Hll
    // shard registers merged by elementwise max == whole-corpus registers,
    // bit for bit (the property q_hll_union and st_hll_users rest on)
    val vals = (1L to 20000L).toDF("v").withColumn("g", lit("all"))
    val whole = Hll.registers(vals, Seq("g"), $"v")
    val shards = vals.withColumn("g", (($"v" % 3)).cast("string"))
    val merged = Hll.registers(shards, Seq("g"), $"v")
      .groupBy($"reg").agg(max($"mr").as("mr"))
      .withColumn("g", lit("all")).select($"g", $"reg", $"mr")
    assert(whole.except(merged).isEmpty && merged.except(whole).isEmpty,
      "max-merged shard registers != whole-corpus registers")
    // estimator sanity well above the linear-counting range
    val est = Hll.estimate(whole, Seq("g"))
      .select($"est_distinct", $"used_linear").as[(Double, Boolean)]
      .collect().head
    assert(!est._2, "20k distinct must not use linear counting")
    assert(math.abs(est._1 - 20000) / 20000 < 0.10, s"hll est ${est._1}")
    // register count can never exceed m (the constant-state bound)
    assert(whole.count() <= Hll.m)
  }

  test("HLL fast path (xxhash64): same merge law, estimate within envelope") {
    import graft.ops.Hll
    val vals = (1L to 20000L).toDF("v")
      .select(concat(lit("k"), $"v".cast("string")).as("v"))
    val whole = Hll.registersFast(vals.withColumn("g", lit("all")), Seq("g"), $"v")
    val merged = Hll.registersFast(
        vals.withColumn("g", (crc32($"v") % 4).cast("string")), Seq("g"), $"v")
      .groupBy($"reg").agg(max($"mr").as("mr"))
      .withColumn("g", lit("all")).select($"g", $"reg", $"mr")
    assert(whole.except(merged).isEmpty && merged.except(whole).isEmpty)
    val est = Hll.estimate(whole, Seq("g"))
      .select($"est_distinct").as[Double].collect().head
    assert(math.abs(est - 20000) / 20000 < 0.13, s"fast-path est $est")
  }

  test("explicit-register HLL: linear-counting branch fires and is accurate when sparse") {
    import graft.ops.Hll
    val tiny = (1L to 40L).toDF("v").withColumn("g", lit("t"))
    val est = Hll.estimate(Hll.registers(tiny, Seq("g"), $"v"), Seq("g"))
      .select($"est_distinct", $"used_linear", $"zeros")
      .as[(Double, Boolean, Long)].collect().head
    assert(est._2, "40 distinct at m=256 must take the linear-counting branch")
    assert(est._3 >= 256 - 40)
    assert(math.abs(est._1 - 40) / 40 < 0.20, s"linear-counting est ${est._1}")
  }

  test("AMS join-size estimate lands within 2x of exact on the declared query") {
    // the tug-of-war product estimator is unbiased with relative
    // std ~ sqrt(F2(R)F2(S))/(|R ⋈ S| sqrt(24)); on this data that is
    // ~20%, so 2x is a conservative never-pathological band
    val row = graft.queries.Relational.qJoinSizeAms
      .fn(spark, TestSpark.Sf)
      .select($"est_join_size", $"exact_join_size")
      .as[(Long, Long)].collect().head
    assert(row._2 > 0)
    val ratio = row._1.toDouble / row._2
    assert(ratio > 0.5 && ratio < 2.0, s"join-size est off: $row")
  }

  test("t-digest udaf: distributed rank error bounded on lineitem prices") {
    import graft.ops.TDigest
    val tdq = udaf(TDigest.aggregator(Seq(0.5, 0.95)),
      org.apache.spark.sql.Encoders.scalaDouble)
    val li = spark.read.parquet(s"${TestSpark.Sf}/lineitem.parquet")
      .repartition(8) // force multi-partition partials + merges
    val est = li.agg(tdq($"l_extendedprice").as("e")).select(
      $"e".getItem(0).as("e50"), $"e".getItem(1).as("e95"))
      .as[(Double, Double)].collect().head
    val n = li.count().toDouble
    val r50 = li.filter($"l_extendedprice" < est._1).count() / n
    val r95 = li.filter($"l_extendedprice" < est._2).count() / n
    assert(math.abs(r50 - 0.5) < 0.02, s"p50 rank $r50")
    assert(math.abs(r95 - 0.95) < 0.02, s"p95 rank $r95")
  }
}
