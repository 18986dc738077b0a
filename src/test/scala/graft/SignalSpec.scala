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

  test("Durbin-Levinson unrolling matches an independent loop implementation") {
    // The generated SQL (ev_pacf_daily's engine-shared expressions) and
    // a plain Scala loop are INDEPENDENT implementations of the same
    // recursion — agreement pins the generator against index slips that
    // engine parity alone cannot catch (both engines share the strings).
    def dlLoop(rho: Array[Double]): Array[Double] = {
      val m = rho.length
      val phi = Array.ofDim[Double](m + 1, m + 1)
      phi(1)(1) = rho(0)
      for (k <- 2 to m) {
        val num = rho(k - 1) -
          (1 until k).map(j => phi(k - 1)(j) * rho(k - j - 1)).sum
        val den = 1.0 - (1 until k).map(j => phi(k - 1)(j) * rho(j - 1)).sum
        phi(k)(k) = num / den
        for (j <- 1 until k)
          phi(k)(j) = phi(k - 1)(j) - phi(k)(k) * phi(k - 1)(k - j)
      }
      (1 to m).map(k => phi(k)(k)).toArray
    }
    // two rho vectors: AR(1)-like geometric decay (PACF must cut off:
    // pacf1 = a, pacf(k>1) ~ 0) and an arbitrary mixed vector
    val vectors = Seq(
      Array.tabulate(7)(i => math.pow(0.6, i + 1)),
      Array(0.5, -0.2, 0.1, 0.3, -0.15, 0.05, 0.2))
    vectors.foreach { rho =>
      val row = spark.range(1).toDF()
        .select((1 to 7).map(k => lit(rho(k - 1)).as(s"r$k")): _*)
      val unrolled = Events.durbinLevinsonCols(7).foldLeft(row) {
        case (df, (name, e)) =>
          df.withColumn(name, org.apache.spark.sql.functions.expr(e))
      }
      val got = unrolled
        .select((1 to 7).map(k => col(s"f${k}_$k")): _*)
        .collect()(0).toSeq.map(_.asInstanceOf[Double])
      val want = dlLoop(rho)
      got.zip(want).zipWithIndex.foreach { case ((g, w), i) =>
        assert(math.abs(g - w) < 1e-12, s"pacf${i + 1}: $g vs $w")
      }
    }
    // AR(1) cutoff property on the geometric vector
    val ar1 = dlLoop(Array.tabulate(7)(i => math.pow(0.6, i + 1)))
    assert(math.abs(ar1(0) - 0.6) < 1e-12)
    (1 until 7).foreach(k => assert(math.abs(ar1(k)) < 1e-9, s"lag ${k + 1}"))
  }

  test("Mann-Kendall: ev_mann_kendall == brute S/Var18/z over the same day grid") {
    // independent recomputation of the pair statistic, tie correction
    // and continuity-corrected z, down to the exact floor-micro
    val dayNs = 86400L * 1000 * 1000 * 1000
    val daily = Events.load(spark, TestSpark.Sf)
      .groupBy($"event_type", expr(s"ts div $dayNs").as("d"))
      .agg(count(lit(1)).as("c"))
      .as[(String, Long, Long)].collect().toSeq.groupBy(_._1)
    val expected = daily.flatMap { case (et, rs) =>
      val cs = rs.sortBy(_._2).map(_._3)
      val n = cs.size.toLong
      var s = 0L
      for (i <- cs.indices; j <- (i + 1) until cs.size)
        s += cs(j).compare(cs(i)).sign
      val tieSum = cs.groupBy(identity).values
        .map(g => { val t = g.size.toLong; t * (t - 1) * (2 * t + 5) }).sum
      val var18 = n * (n - 1) * (2 * n + 5) - tieSum
      if (var18 <= 0) None
      else {
        val num = if (s > 0) s - 1 else if (s < 0) s + 1 else 0L
        val z = num.toDouble / math.sqrt(var18.toDouble / 18.0) * 1000000
        Some(et -> (n, s, var18, math.floor(z).toLong))
      }
    }
    val got = Events.qMannKendall.fn(spark, TestSpark.Sf)
      .select($"event_type", $"n_days", $"s_stat", $"var18", $"z_micros")
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4, r._5)).toMap
    assert(got.keySet == expected.keySet && got.nonEmpty)
    for ((et, exp) <- expected) assert(got(et) == exp, s"type $et")
  }

  test("Mann-Kendall: planted monotone series is significant, constant series drops out") {
    // strictly increasing counts: S = n(n-1)/2, z >> 1.96 at n = 40
    val n = 40
    val inc = (0 until n).map(i => ("inc", i.toLong, (100 + 3 * i).toLong))
    val flat = (0 until n).map(i => ("flat", i.toLong, 100L)) // var18 = 0
    val daily = (inc ++ flat).toDF("event_type", "d", "c")
    // replay the query's math over a hand-built grid
    val s = daily.filter($"event_type" === "inc").as[(String, Long, Long)]
      .collect().sortBy(_._2).map(_._3)
    var stat = 0L
    for (i <- s.indices; j <- (i + 1) until s.length)
      stat += s(j).compare(s(i)).sign
    assert(stat == n.toLong * (n - 1) / 2)
    val var18 = n.toLong * (n - 1) * (2 * n + 5)
    val z = (stat - 1).toDouble / math.sqrt(var18.toDouble / 18.0)
    assert(z > 1.96, s"monotone series must be significant, z=$z")
  }

  test("EWMA chart: closed-form expansion tracks the textbook recursion; planted shift flags") {
    // flat 10s, then a 3-day 200-spike: self-referenced sigma (~58)
    // puts the asymptotic band at ~±100, so the smoothed spike must
    // cross it on its 2nd/3rd day while the baseline never does
    val xs = Seq.fill(27)(10L) ++ Seq.fill(3)(200L)
    val grid = xs.zipWithIndex
      .map { case (x, d) => ("a", d.toLong, x) }
      .toDF("event_type", "d", "x")
    val got = Events.ewmaControlOverDayGrid(grid)
      .orderBy($"day")
      .select($"ewma_micros", $"out_of_control")
      .as[(Long, Boolean)].collect()
    // textbook recursion z_t = (x_t + z_{t-1}) / 2, z_0 = x_0
    val rec = xs.tail.scanLeft(xs.head.toDouble)((z, x) => (x + z) / 2.0)
    for (((em, _), (r, t)) <- got.zip(rec.zipWithIndex)) {
      // closed form rounds each of <= t+1 contributions to 9dp
      val tol = math.max(1L, ((t + 1) * 5e-10 * 1e6).ceil.toLong + 1)
      assert(math.abs(em - math.floor(r * 1e6).toLong) <= tol,
        s"day $t: ewma_micros $em vs recursion ${math.floor(r * 1e6).toLong}")
    }
    // baseline stays in control, the smoothed spike alarms
    assert(!got.take(27).exists(_._2), "pre-spike days must stay in control")
    assert(got.takeRight(2).forall(_._2), "smoothed spike must alarm")
  }

  test("CUPED: distributed moments == brute per-user fold, pooled mean preserved") {
    // independent recompute of every output field from the raw events
    // (per-variant variance may legitimately rise under the POOLED
    // theta — the guarantee is pooled, so we pin arithmetic, not signs)
    val ev = Events.load(spark, TestSpark.Sf)
      .select($"user_id", expr("ts div 1000").as("us"), $"value")
      .as[(Long, Long, Double)].collect()
    def micros(v: Double): Long = java.math.BigDecimal.valueOf(v * 1e6)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValue
    val mn = ev.map(_._2).min; val mx = ev.map(_._2).max
    val perUser = ev.groupBy(_._1).view.mapValues { rs =>
      (rs.filter(r => 2 * r._2 <= mn + mx).map(r => micros(r._3)).sum,
        rs.filter(r => 2 * r._2 > mn + mx).map(r => micros(r._3)).sum)
    }.toMap
    case class M(n: Long, sx: BigInt, sy: BigInt, sxx: BigInt,
      syy: BigInt, sxy: BigInt)
    def mom(us: Iterable[(Long, Long)]): M = M(us.size.toLong,
      us.map(u => BigInt(u._1)).sum, us.map(u => BigInt(u._2)).sum,
      us.map(u => BigInt(u._1) * u._1).sum, us.map(u => BigInt(u._2) * u._2).sum,
      us.map(u => BigInt(u._1) * u._2).sum)
    val byVar = perUser.groupBy(_._1 % 2).view.mapValues(m => mom(m.values))
    val g = mom(perUser.values)
    val theta = (BigInt(g.n) * g.sxy - g.sx * g.sy).toDouble /
      (BigInt(g.n) * g.sxx - g.sx * g.sx).toDouble
    val gx = g.sx.toDouble / g.n.toDouble
    val brute = byVar.map { case (variant, m) =>
      val meanY = m.sy.toDouble / m.n.toDouble
      val meanYadj = meanY - theta * (m.sx.toDouble / m.n.toDouble - gx)
      def vv(num: BigInt) = num.toDouble / (BigInt(m.n) * (m.n - 1)).toDouble
      val varY = vv(BigInt(m.n) * m.syy - m.sy * m.sy)
      val covV = vv(BigInt(m.n) * m.sxy - m.sx * m.sy)
      val varX = vv(BigInt(m.n) * m.sxx - m.sx * m.sx)
      val varYadj = varY - 2.0 * theta * covV + theta * theta * varX
      variant -> (m.n, math.floor(theta * 1e6).toLong,
        math.floor(meanY).toLong, math.floor(meanYadj).toLong,
        math.floor(varY / 1e6).toLong, math.floor(varYadj / 1e6).toLong,
        math.floor((1.0 - varYadj / varY) * 1e4).toLong)
    }.toMap
    val got = Events.qCupedAdjustment.fn(spark, TestSpark.Sf)
      .select($"variant", $"n_users", $"theta_micros", $"mean_y_micros",
        $"mean_yadj_micros", $"var_y_micros", $"var_yadj_micros",
        $"var_reduction_bp")
      .as[(Long, Long, Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4, r._5, r._6, r._7, r._8)).toMap
    assert(got == brute)
    // pooled-mean preservation: sum n_v * (mean_adj - mean_y) == 0
    // exactly in real arithmetic; floor-micros leaves < 1 micro/user
    val drift = got.values.map(r => r._1 * (r._4 - r._3)).sum
    val total = got.values.map(_._1).sum
    assert(math.abs(drift) <= total + 2,
      s"pooled mean must be preserved: drift $drift micros over $total users")
  }

  test("forecast backtest: linear series gives Holt zero error, naive errs by the slope") {
    // y = 10 + 2t: Holt's init (l=y0, b=2) tracks the line exactly, so
    // every one-step forecast is exact; persistence always misses by 2
    val grid = (0 until 20).map(t => ("a", t.toLong, 10L + 2 * t))
      .toDF("event_type", "d", "x")
    val got = Events.forecastBacktestOverGrid(grid)
      .select($"cutoff_day", $"err_holt_micros", $"err_naive_micros",
        $"mae_holt_micros", $"mae_naive_micros", $"holt_wins")
      .as[(String, Long, Long, Long, Long, Boolean)].collect()
    assert(got.length == 5, s"5 folds expected, got ${got.length}")
    for ((day, eh, en, mh, mn, wins) <- got) {
      assert(eh == 0, s"$day: Holt must be exact on a line, err $eh")
      assert(en == 2000000, s"$day: naive must miss by the slope, err $en")
      assert(mh == 0 && mn == 2000000 && wins)
    }
  }

  test("diff-in-diff and covariate balance == brute per-user folds") {
    val ev = Events.load(spark, TestSpark.Sf)
      .select($"user_id", expr("ts div 1000").as("us"), $"value")
      .as[(Long, Long, Double)].collect()
    def micros(v: Double): Long = java.math.BigDecimal.valueOf(v * 1e6)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValue
    val mn = ev.map(_._2).min; val mx = ev.map(_._2).max
    val perUser = ev.groupBy(_._1).view.mapValues { rs =>
      (rs.filter(r => 2 * r._2 <= mn + mx).map(r => micros(r._3)).sum,
        rs.filter(r => 2 * r._2 > mn + mx).map(r => micros(r._3)).sum,
        rs.count(r => 2 * r._2 <= mn + mx).toLong)
    }.toMap
    def mom(xs: Seq[Long]) =
      (xs.size.toLong, xs.map(BigInt(_)).sum, xs.map(x => BigInt(x) * x).sum)
    // --- DiD brute ---
    val byVar = perUser.groupBy(_._1 % 2)
    val dStats = byVar.view.mapValues { us =>
      val ds = us.values.map(u => u._2 - u._1).toSeq
      val (n, s1, s2) = mom(ds)
      val dmean = s1.toDouble / n.toDouble
      val vard = (BigInt(n) * s2 - s1 * s1).toDouble /
        (BigInt(n) * (n - 1)).toDouble
      (n, dmean, vard)
    }.toMap
    val did = dStats(1)._2 - dStats(0)._2
    val se = math.sqrt(dStats(1)._3 / dStats(1)._1.toDouble
      + dStats(0)._3 / dStats(0)._1.toDouble)
    val gotDid = Events.qDiffInDiff.fn(spark, TestSpark.Sf)
      .select($"variant", $"delta_micros", $"did_micros", $"se_micros",
        $"significant_95")
      .as[(Long, Long, Long, Long, Boolean)].collect().sortBy(_._1)
    for ((v, dm, dd, ss, sig) <- gotDid) {
      assert(dm == math.floor(dStats(v)._2).toLong, s"variant $v delta")
      assert(dd == math.floor(did).toLong && ss == math.floor(se).toLong)
      assert(sig == (math.abs(did) > 1.96 * se))
    }
    // --- balance brute (pre_events covariate) ---
    val aStats = byVar.view.mapValues { us =>
      val as = us.values.map(_._3).toSeq
      val (n, s1, s2) = mom(as)
      (n, s1.toDouble / n.toDouble,
        (BigInt(n) * s2 - s1 * s1).toDouble / (BigInt(n) * (n - 1)).toDouble)
    }.toMap
    val smd = (aStats(1)._2 - aStats(0)._2) /
      math.sqrt((aStats(1)._3 + aStats(0)._3) / 2.0)
    val gotBal = Events.qCovariateBalance.fn(spark, TestSpark.Sf)
      .select($"covariate", $"smd_micros", $"balanced")
      .as[(String, Long, Boolean)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(gotBal.keySet == Set("pre_value", "pre_events"))
    assert(gotBal("pre_events")._1 == math.floor(smd * 1e6).toLong,
      s"SMD ${gotBal("pre_events")._1} vs brute ${math.floor(smd * 1e6).toLong}")
    assert(gotBal("pre_events")._2 == (math.abs(smd) < 0.1))
  }

  test("power analysis: sizing formula brute-checked, monotone in lift") {
    val got = Events.qPowerAnalysis.fn(spark, TestSpark.Sf)
      .select($"lift_bp", $"p_base_micros", $"n_required",
        $"n_available_per_arm", $"powered")
      .as[(Long, Long, Long, Long, Boolean)].collect().sortBy(_._1)
    assert(got.length == 4)
    // brute recompute on the exact same rate
    val ev = Events.load(spark, TestSpark.Sf)
      .select($"user_id", expr("ts div 86400000000000").as("d"),
        $"event_type")
      .as[(Long, Long, String)].collect()
    val nUd = ev.map(r => (r._1, r._2)).distinct.length.toLong
    val nCv = ev.filter(_._3 == "purchase").map(r => (r._1, r._2))
      .distinct.length.toLong
    val p1 = nCv.toDouble / nUd.toDouble
    for ((lift, pb, nr, na, pw) <- got) {
      assert(pb == math.floor(p1 * 1e6).toLong)
      val p2 = p1 * (1.0 + lift.toDouble / 10000.0)
      val req = math.ceil((1.96 + 0.8416) * (1.96 + 0.8416) *
        (p1 * (1 - p1) + p2 * (1 - p2)) / ((p2 - p1) * (p2 - p1))).toLong
      assert(nr == req, s"lift $lift: $nr vs brute $req")
      assert(na == nUd / 2 && pw == (na >= req))
    }
    // a bigger detectable lift always needs FEWER samples
    assert(got.map(_._3).toSeq == got.map(_._3).toSeq.sorted.reverse,
      "n_required must be monotone decreasing in lift")
  }

  test("srm check: chi2 == brute distinct-user fold; skewed split flags") {
    val users = Events.load(spark, TestSpark.Sf)
      .select($"user_id").distinct().as[Long].collect()
    val n0 = users.count(_ % 2 == 0).toLong
    val n1 = users.count(_ % 2 == 1).toLong
    val chi2 = ((n0 - n1) * (n0 - n1)).toDouble / (n0 + n1).toDouble
    val got = Events.qSrmCheck.fn(spark, TestSpark.Sf)
      .select($"n_control", $"n_treat", $"chi2_micros", $"srm_at_95")
      .as[(Long, Long, Long, Boolean)].collect()
    assert(got.length == 1)
    assert(got.head == ((n0, n1, math.floor(chi2 * 1e6).toLong,
      chi2 > 3.841)))
    // the formula itself: a 60/40 split of 1000 users is a clear SRM
    val skew = (600L - 400L) * (600L - 400L) / 1000.0
    assert(skew > 6.635, "60/40 of 1000 must flag even at 99%")
    // ... and 510/490 is within noise
    val ok = (510L - 490L) * (510L - 490L) / 1000.0
    assert(ok < 3.841, "510/490 of 1000 must not flag")
  }

  test("anomaly ensemble: votes == member tails, consensus == 2-of-3") {
    val got = Events.qAnomalyEnsemble.fn(spark, TestSpark.Sf)
      .select($"event_type", $"day", $"shewhart_flag", $"cusum_alarm",
        $"ewma_flag", $"votes", $"consensus")
      .as[(String, String, Boolean, Boolean, Boolean, Long, Boolean)]
      .collect()
    assert(got.nonEmpty, "the sf0.001 grid must trip at least one detector")
    for ((et, day, sh, cu, ew, v, c) <- got) {
      assert(v == Seq(sh, cu, ew).count(identity).toLong,
        s"($et,$day) vote arithmetic")
      assert(c == (v >= 2), s"($et,$day) consensus rule")
      assert(v >= 1, "rows below one vote must be filtered")
    }
    // member flags must agree with the tails run standalone
    val grid = Events.qCusumChangepoint.fn(spark, TestSpark.Sf)
      .select($"event_type", $"day", $"alarm")
      .as[(String, String, Boolean)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    for ((et, day, _, cu, _, _, _) <- got)
      assert(grid((et, day)) == cu, s"($et,$day) cusum flag must match tail")
  }

  test("binseg: 3-level series recovers both boundaries; constant never splits") {
    // 10 days at 5, 10 at 50, 10 at 5 — round 1 ties between the two
    // boundaries (symmetric gain 3375) and must take the SMALLER k;
    // round 2 splits the remaining [10,29] at the second boundary with
    // the full gain 10125, while the constant [0,9] stays whole
    val xs = Seq.fill(10)(5L) ++ Seq.fill(10)(50L) ++ Seq.fill(10)(5L)
    val grid = xs.zipWithIndex
      .map { case (x, d) => ("a", d.toLong, x) }
      .toDF("event_type", "d", "x")
    val got = Events.binsegOverDayGrid(grid)
      .select($"split_round", $"cp_day", $"n_left", $"n_right",
        $"gain_micros")
      .as[(Long, String, Long, Long, Long)].collect().sortBy(_._1)
    assert(got.length == 2, s"expected 2 splits, got ${got.toSeq}")
    val Array(r1, r2) = got
    assert(r1 == ((1L, "1970-01-11", 10L, 20L, 3375000000L)), s"round1 $r1")
    assert(r2 == ((2L, "1970-01-21", 10L, 10L, 10125000000L)), s"round2 $r2")
    // pure-constant series: no positive gain anywhere, no output rows
    val const = (0 until 20).map(d => ("c", d.toLong, 7L))
      .toDF("event_type", "d", "x")
    assert(Events.binsegOverDayGrid(const).count() == 0)
  }
}
