package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.Row

/** SECOND-EVIDENCE hand vectors for the float-discipline statistics
  * queries (r12 judge directive #3): the driver gate compares Spark
  * against a DuckDB oracle AUTHORED BY THE SAME BUILDER, so a formula
  * misunderstanding mirrors into both engines and hash-matches green
  * (the round-12 EWMA variance-denominator lesson). These vectors are
  * the independent leg: a tiny PLANTED documents table with known
  * contents, run through the REAL `SparkEntry.queries` functions, and
  * compared against literals computed from the CANONICAL textbook
  * formulas in an independent implementation (Python, midrank/Fraction
  * arithmetic; the MI vector additionally cross-checked against the
  * H(L)+H(S)−H(L,S) entropy identity). Exact-integer outputs compare
  * exactly; floor-micro floats allow ±2 micros (libm ulp drift), which
  * still catches any formula error (wrong tie correction, wrong
  * variance, swapped marginals — all ≫ 1e-4 shifts).
  *
  * Planted corpus (9 docs, 3 sources, 2 langs): global length ties
  * WITHIN and ACROSS sources exercise the tie-corrected paths; token
  * counts are monotone with length in source a, anti-monotone in b,
  * tied in c. */
class StatVectorsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** temp sf-dir holding ONLY the planted documents.parquet */
  private lazy val dir: String = {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft-statvec").toFile
    d.deleteOnExit()
    Seq(
      (1L, "w1 w2", "en", "a", 40L),
      (2L, "w1 w2 w3", "en", "a", 90L),
      (3L, "h1 h2 h3 h4 h5", "hi", "a", 150L),
      (4L, "w1 w1 w2 w3", "en", "b", 90L),
      (5L, "h1", "hi", "b", 200L),
      (6L, "w2 w2", "en", "c", 250L),
      (7L, "w1 w3 w4", "en", "c", 250L),
      (8L, "h1 h2 h2 h1 h3 h2 h1", "hi", "c", 480L),
      (9L, "w1 w2 w3 w4 w5 w6 w7 w8 w9", "en", "c", 551L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"${d.getAbsolutePath}/documents.parquet")
    d.getAbsolutePath
  }

  private def run(name: String): Array[Row] =
    SparkEntry.queries(name)(spark, dir).collect()

  private def approx(got: Long, want: Long, tol: Long = 2): Boolean =
    math.abs(got - want) <= tol

  test("d_mann_whitney: tie-corrected rank-sum z against textbook midranks") {
    // midranks over lengths {40,90,90,150,200,250,250,480,551};
    // U = R − n(n+1)/2, z = (U − nm/2)/sqrt(nm/12·((N+1) − Σ(t³−t)/(N(N−1))))
    val want = Map( // source -> (n, rank_sum_x2, u_x2, z_micros)
      "a" -> (3L, 15L, 3L, -1952834L),
      "b" -> (2L, 15L, 9L, -738102L),
      "c" -> (4L, 60L, 40L, 2470160L))
    val got = run("d_mann_whitney")
    assert(got.length == 3)
    got.foreach { r =>
      val (n, r2, u2, z) = want(r.getString(0))
      assert(r.getLong(1) == n && r.getLong(2) == r2 && r.getLong(3) == u2,
        s"${r.getString(0)}: integer rank plumbing")
      assert(approx(r.getLong(4), z), s"${r.getString(0)}: z ${r.getLong(4)} want $z")
    }
  }

  test("d_kruskal_wallis: tie-corrected H against textbook formula") {
    // H = [12/(N(N+1))·ΣRᵢ²/nᵢ − 3(N+1)] / (1 − Σ(t³−t)/(N³−N)) = 6.355932…
    val Array(r) = run("d_kruskal_wallis")
    assert(r.getLong(0) == 9L && r.getLong(1) == 3L)
    assert(approx(r.getLong(2), 6355932L), s"H ${r.getLong(2)}")
  }

  test("d_anova_lengths: one-way F against textbook SSB/SSW") {
    // F = (SSB/(k−1))/(SSW/(N−k)) = 5.769239… on the planted lengths
    val Array(r) = run("d_anova_lengths")
    assert(r.getLong(0) == 9L && r.getLong(1) == 3L)
    assert(approx(r.getLong(2), 5769239L), s"F ${r.getLong(2)}")
  }

  test("d_spearman_lengths: midrank rho — monotone +1, anti-monotone −1, tied 0.948") {
    val want = Map("a" -> 1000000L, "b" -> -1000000L, "c" -> 948683L)
    val got = run("d_spearman_lengths")
    assert(got.length == 3)
    got.foreach { r =>
      assert(approx(r.getLong(2), want(r.getString(0))),
        s"${r.getString(0)}: rho ${r.getLong(2)}")
    }
  }

  test("d_gini_lengths: midrank Gini exact to the micro (integer path)") {
    // G = Σ(2r̄ᵢ−n−1)xᵢ/(nΣx), exact rationals floored at 1e6
    val want = Map("a" -> 261904L, "b" -> 189655L, "c" -> 185009L)
    val got = run("d_gini_lengths")
    assert(got.length == 3)
    got.foreach { r =>
      assert(r.getLong(2) == want(r.getString(0)), // exact: all-integer path
        s"${r.getString(0)}: gini ${r.getLong(2)}")
    }
  }

  test("d_effect_sizes: Cliff's delta exact, Cohen's d vs pooled-variance textbook") {
    // δ = (#(x>y) − #(x<y))/(n₁n₂) from the literal pair count;
    // d = (m₁−m₂)/sqrt((SS₁+SS₂)/(n₁+n₂−2))
    val want = Map( // source -> (delta_micros exact, d_micros ±2)
      "a" -> (-833334L, -1387981L),
      "b" -> (-357143L, -629090L),
      "c" -> (1000000L, 2392442L))
    val got = run("d_effect_sizes")
    assert(got.length == 3)
    got.foreach { r =>
      val (dl, dd) = want(r.getString(0))
      assert(r.getLong(2) == dl, s"${r.getString(0)}: delta ${r.getLong(2)}")
      assert(approx(r.getLong(3), dd), s"${r.getString(0)}: d ${r.getLong(3)}")
    }
  }

  test("d_lang_source_mi: cell terms + total vs direct MI and the entropy identity") {
    // MI = Σ (nᵢⱼ/N)·ln(nᵢⱼN/(nᵢnⱼ)) = 0.020383341, cross-checked against
    // H(L)+H(S)−H(L,S) = 0.0203833411…
    val wantTerms = Map(
      ("en", "a") -> 0.0, ("en", "b") -> -0.031964675,
      ("en", "c") -> 0.039261012, ("hi", "a") -> 0.0,
      ("hi", "b") -> 0.045051679, ("hi", "c") -> -0.031964675)
    val got = run("d_lang_source_mi")
    assert(got.length == 6)
    got.foreach { r =>
      val key = (r.getString(0), r.getString(1))
      assert(math.abs(r.getDouble(3) - wantTerms(key)) < 2e-6, s"$key term")
      assert(math.abs(r.getDouble(4) - 0.020383341) < 2e-6, s"$key total")
    }
  }

  test("d_drift_psi: per-bin PSI terms and total vs direct computation") {
    // slices by doc_id parity; bins (n_chars−48)/51 clamped to [0,9];
    // empty-side bins take the 1e-4 floor; PSI = Σ(p0−p1)·ln(p0/p1)
    val want = Map( // bin -> (p0, p1, term)
      0L -> (0.5, 0.2, 0.274887), 2L -> (0.0001, 0.4, 3.31679),
      3L -> (0.25, 0.2, 0.011157), 8L -> (0.25, 0.0001, 1.955229),
      9L -> (0.0001, 0.2, 1.51942))
    val got = run("d_drift_psi")
    assert(got.length == 5)
    got.foreach { r =>
      val (p0, p1, term) = want(r.getLong(0))
      assert(math.abs(r.getDouble(1) - p0) < 1e-9 &&
        math.abs(r.getDouble(2) - p1) < 1e-9, s"bin ${r.getLong(0)} shares")
      assert(math.abs(r.getDouble(3) - term) < 2e-6, s"bin ${r.getLong(0)} term")
      assert(math.abs(r.getDouble(4) - 7.077483) < 1e-5, "psi total")
    }
  }

  test("d_zipf_slope: OLS slope on the log-log frequency table vs direct fit") {
    // per-lang token frequencies, rank by (count desc, token), slope of
    // round(log10·,6) points: en −1.046047, hi −1.120212
    val got = run("d_zipf_slope").map(r =>
      r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got.keySet == Set("en", "hi"))
    assert(got("en")._1 == 9L && got("hi")._1 == 5L, "vocab sizes")
    assert(math.abs(got("en")._2 - -1.046047) < 1e-5, s"en ${got("en")._2}")
    assert(math.abs(got("hi")._2 - -1.120212) < 1e-5, s"hi ${got("hi")._2}")
  }

  // =================================================================
  // Wave 2: events-table statistics. Planted feed: a 14-day click
  // series with alternating daily counts [5,1,4,2,6,1,5,2,4,1,6,2,5,1]
  // (strong lag-1 anticorrelation, Ljung-Box-rejectable), plus 8 users'
  // view->purchase funnels with known conversion latencies (30/60/600/
  // 1500/2880/5760 minutes; two users censored). Expected literals from
  // the same independent Python transcription of the textbook formulas;
  // KM/logrank additionally cross-checked against the plain product-
  // limit / hypergeometric forms.

  private lazy val evDir: String = {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft-statvec-ev").toFile
    d.deleteOnExit()
    Seq(
      (1L, 3600000000000L, 100L, "click", 0.5, ""),
      (2L, 4200000000000L, 101L, "click", 1.5, ""),
      (3L, 4800000000000L, 102L, "click", 2.5, ""),
      (4L, 5400000000000L, 103L, "click", 3.5, ""),
      (5L, 6000000000000L, 104L, "click", 4.5, ""),
      (6L, 90000000000000L, 102L, "click", 7.5, ""),
      (7L, 176400000000000L, 104L, "click", 4.5, ""),
      (8L, 177000000000000L, 100L, "click", 5.5, ""),
      (9L, 177600000000000L, 101L, "click", 6.5, ""),
      (10L, 178200000000000L, 102L, "click", 7.5, ""),
      (11L, 262800000000000L, 101L, "click", 1.5, ""),
      (12L, 263400000000000L, 102L, "click", 2.5, ""),
      (13L, 349200000000000L, 103L, "click", 8.5, ""),
      (14L, 349800000000000L, 104L, "click", 9.5, ""),
      (15L, 350400000000000L, 100L, "click", 0.5, ""),
      (16L, 351000000000000L, 101L, "click", 1.5, ""),
      (17L, 351600000000000L, 102L, "click", 2.5, ""),
      (18L, 352200000000000L, 103L, "click", 3.5, ""),
      (19L, 435600000000000L, 100L, "click", 5.5, ""),
      (20L, 522000000000000L, 102L, "click", 2.5, ""),
      (21L, 522600000000000L, 103L, "click", 3.5, ""),
      (22L, 523200000000000L, 104L, "click", 4.5, ""),
      (23L, 523800000000000L, 100L, "click", 5.5, ""),
      (24L, 524400000000000L, 101L, "click", 6.5, ""),
      (25L, 608400000000000L, 104L, "click", 9.5, ""),
      (26L, 609000000000000L, 100L, "click", 0.5, ""),
      (27L, 694800000000000L, 101L, "click", 6.5, ""),
      (28L, 695400000000000L, 102L, "click", 7.5, ""),
      (29L, 696000000000000L, 103L, "click", 8.5, ""),
      (30L, 696600000000000L, 104L, "click", 9.5, ""),
      (31L, 781200000000000L, 103L, "click", 3.5, ""),
      (32L, 867600000000000L, 100L, "click", 0.5, ""),
      (33L, 868200000000000L, 101L, "click", 1.5, ""),
      (34L, 868800000000000L, 102L, "click", 2.5, ""),
      (35L, 869400000000000L, 103L, "click", 3.5, ""),
      (36L, 870000000000000L, 104L, "click", 4.5, ""),
      (37L, 870600000000000L, 100L, "click", 5.5, ""),
      (38L, 954000000000000L, 102L, "click", 7.5, ""),
      (39L, 954600000000000L, 103L, "click", 8.5, ""),
      (40L, 1040400000000000L, 104L, "click", 4.5, ""),
      (41L, 1041000000000000L, 100L, "click", 5.5, ""),
      (42L, 1041600000000000L, 101L, "click", 6.5, ""),
      (43L, 1042200000000000L, 102L, "click", 7.5, ""),
      (44L, 1042800000000000L, 103L, "click", 8.5, ""),
      (45L, 1126800000000000L, 101L, "click", 1.5, ""),
      (46L, 36000000000000L, 1L, "view", 1.25, ""),
      (47L, 72000000000000L, 1L, "purchase", 2.75, ""),
      (48L, 122400000000000L, 2L, "view", 2.25, ""),
      (49L, 295200000000000L, 2L, "purchase", 4.75, ""),
      (50L, 201600000000000L, 3L, "view", 3.25, ""),
      (51L, 32400000000000L, 4L, "view", 4.25, ""),
      (52L, 34200000000000L, 4L, "purchase", 8.75, ""),
      (53L, 367200000000000L, 5L, "view", 5.25, ""),
      (54L, 457200000000000L, 5L, "purchase", 10.75, ""),
      (55L, 475200000000000L, 6L, "view", 6.25, ""),
      (56L, 93600000000000L, 7L, "view", 7.25, ""),
      (57L, 97200000000000L, 7L, "purchase", 14.75, ""),
      (58L, 547200000000000L, 8L, "view", 8.25, ""),
      (59L, 892800000000000L, 8L, "purchase", 16.75, "")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"${d.getAbsolutePath}/events.parquet")
    d.getAbsolutePath
  }

  private def runEv(name: String): Array[Row] =
    SparkEntry.queries(name)(spark, evDir).collect()

  test("ev_chi2_weekday: Pearson chi2 over the full type x dow grid") {
    // chi2 = sum over ALL 18 grid cells (zeros included) of (O-E)^2/E
    val Array(r) = runEv("ev_chi2_weekday")
    assert(math.abs(r.getDouble(0) - 7.118814) < 1e-4, s"chi2 ${r.getDouble(0)}")
    assert(r.getLong(1) == 12L && r.getLong(2) == 59L)
  }

  test("ev_theilsen_trend: median pairwise slope + median residual intercept") {
    val want = Map( // type -> (slope, intercept, n_days)
      "click" -> (0.0, 3.0, 14L),
      "purchase" -> (0.0, 1.0, 5L),
      "view" -> (-0.166667, 1.916667, 6L))
    val got = runEv("ev_theilsen_trend")
    assert(got.length == 3)
    got.foreach { r =>
      val (sl, ic, nd) = want(r.getString(0))
      assert(math.abs(r.getDouble(1) - sl) < 1e-5, s"${r.getString(0)} slope")
      assert(math.abs(r.getDouble(2) - ic) < 1e-5, s"${r.getString(0)} intercept")
      assert(r.getLong(3) == nd, s"${r.getString(0)} n_days")
    }
  }

  test("ev_winsorized_stats: clip counts at interpolated p01/p99, clipped mean") {
    val want = Map( // type -> (lo, hi, mean)
      "click" -> (0L, 0L, 4.788888),
      "purchase" -> (1L, 1L, 9.75),
      "view" -> (1L, 1L, 4.75))
    val got = runEv("ev_winsorized_stats")
    assert(got.length == 3)
    got.foreach { r =>
      val (lo, hi, m) = want(r.getString(0))
      assert(r.getLong(1) == lo && r.getLong(2) == hi, s"${r.getString(0)} clips")
      assert(math.abs(r.getDouble(3) - m) < 2e-6, s"${r.getString(0)} mean")
    }
  }

  test("ev_two_proportion_ab: pooled z on the planted conversion cohorts") {
    // grp1 converts 2/4 within 24h, grp0 1/4; z = 0.730296...
    val Array(r) = runEv("ev_two_proportion_ab")
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((4L, 2L, 4L, 1L)))
    assert(r.getLong(4) == 500000L && r.getLong(5) == 250000L)
    assert(approx(r.getLong(6), 730296L), s"z ${r.getLong(6)}")
  }

  test("ev_survival_km: product-limit curve hits the textbook fractions") {
    // 8 at risk, one conversion at each planted latency, no ties:
    // S = 7/8, 6/8, ... floored at 1e-6 by the log-sum path
    val want = Map( // t_min -> (n_at_risk, survival)
      30L -> (8L, 0.875), 60L -> (7L, 0.75), 600L -> (6L, 0.625),
      1500L -> (5L, 0.5), 2880L -> (4L, 0.375), 5760L -> (3L, 0.25))
    val got = runEv("ev_survival_km")
    assert(got.length == 6)
    got.foreach { r =>
      val (ar, sv) = want(r.getLong(0))
      assert(r.getLong(1) == ar, s"t=${r.getLong(0)} at-risk")
      assert(r.getLong(2) == 1L && r.getLong(3) == 0L, s"t=${r.getLong(0)} d/c")
      assert(math.abs(r.getDouble(4) - sv) < 2e-6, s"t=${r.getLong(0)} survival")
    }
  }

  test("ev_logrank: hypergeometric E/V sums vs the textbook fold") {
    // textbook E1 = 2.554761904..., V = 1.394620, z = 0.377020
    val Array(r) = runEv("ev_logrank")
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((8L, 4L, 3L)))
    assert(math.abs(r.getLong(3) - 2554761L) <= 6L, // per-term micro floors
      s"e1 ${r.getLong(3)}")
    assert(approx(r.getLong(4), 377020L, tol = 3), s"z ${r.getLong(4)}")
  }

  test("ev_acf_daily: per-lag Pearson over the zero-filled day spine") {
    val want = Map[(String, Int), Option[Double]](
      ("click", 1) -> Some(-0.878103), ("click", 2) -> Some(0.786982),
      ("click", 3) -> Some(-0.869546), ("click", 4) -> Some(0.90028),
      ("click", 5) -> Some(-0.935414), ("click", 6) -> Some(0.927273),
      ("click", 7) -> Some(-0.805076),
      ("purchase", 1) -> Some(0.0), ("purchase", 2) -> Some(0.114708),
      ("purchase", 3) -> Some(0.046374), ("purchase", 4) -> Some(-0.193649),
      ("purchase", 5) -> Some(0.685994), ("purchase", 6) -> Some(-0.534522),
      ("purchase", 7) -> Some(0.0),
      ("view", 1) -> Some(0.420084), ("view", 2) -> Some(-0.534522),
      ("view", 3) -> Some(-0.522233),
      ("view", 4) -> None, ("view", 5) -> None, ("view", 6) -> None)
    val got = runEv("ev_acf_daily")
    assert(got.length == want.size, s"rows ${got.length}")
    got.foreach { r =>
      val k = (r.getString(0), r.getLong(1).toInt)
      want(k) match {
        case Some(v) => assert(!r.isNullAt(3) &&
          math.abs(r.getDouble(3) - v) < 1e-5, s"$k acf")
        case None => assert(r.isNullAt(3), s"$k must be null (zero variance)")
      }
    }
  }

  test("ev_ljung_box: Q statistic vs the standard-estimator fold; short series drop") {
    // click Q = 59.283244 (strong alternation -> rejected at 14.067);
    // purchase Q = 3.993298 (white-noise-compatible); view spine is 7
    // days < 8 and must not appear
    val got = runEv("ev_ljung_box").map(r =>
      r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(got.keySet == Set("click", "purchase"))
    assert(got("click")._1 == 14L && got("click")._3)
    assert(math.abs(got("click")._2 - 59283244L) <= 10L, s"${got("click")._2}")
    assert(got("purchase")._1 == 11L && !got("purchase")._3)
    assert(math.abs(got("purchase")._2 - 3993298L) <= 10L, s"${got("purchase")._2}")
  }

  test("ev_granger_pairs: closed-form lag-1 OLS F per ordered type pair") {
    val want = Map( // (cause, effect) -> (n, f_micros, signal)
      ("click", "purchase") -> (10L, 1400000L, false),
      ("click", "view") -> (6L, 40723L, false),
      ("purchase", "click") -> (10L, 35368L, false),
      ("purchase", "view") -> (6L, 5593350L, true),
      ("view", "click") -> (6L, 15307678L, true),
      ("view", "purchase") -> (6L, 529411L, false))
    val got = runEv("ev_granger_pairs")
    assert(got.length == 6)
    got.foreach { r =>
      val (n, f, sig) = want((r.getString(0), r.getString(1)))
      assert(r.getLong(2) == n, s"${r.getString(0)}->${r.getString(1)} n")
      assert(approx(r.getLong(3), f, tol = 5),
        s"${r.getString(0)}->${r.getString(1)} F ${r.getLong(3)}")
      assert(r.getBoolean(4) == sig, s"${r.getString(0)}->${r.getString(1)} signal")
    }
  }

  test("ev_markov_stationary: absorbing click chain -> (1, 0); purchase never a source") {
    // click->click always; view mass leaks to the absorbing purchase
    // column and renormalization sends it to the closed click class
    val got = runEv("ev_markov_stationary").map(r =>
      r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got.keySet == Set("click", "view"),
      "purchase is never a source state and must not appear")
    assert(got("click")._1 >= 999995L && got("click")._2 == 762711L)
    assert(got("view")._1 <= 5L && got("view")._2 == 135593L)
  }

  // =================================================================
  // Wave 3: entropy / smoothing / calibration / transform vectors.

  test("d_entropy_scores: Shannon entropy per doc vs direct -sum(p log2 p)") {
    val want = Map( // doc_id -> (len(text), char_entropy, n_tok, token_entropy)
      1L -> (5L, 1.921929, 2L, 1.0), 2L -> (8L, 2.155639, 3L, 1.584963),
      3L -> (14L, 2.406667, 5L, 2.32193), 4L -> (11L, 2.118078, 4L, 1.5),
      5L -> (2L, 1.0, 1L, 0.0), 6L -> (5L, 1.521928, 2L, 0.0),
      7L -> (8L, 2.155639, 3L, 1.584963), 8L -> (20L, 2.088377, 7L, 1.448815),
      9L -> (26L, 2.68008, 9L, 3.169926))
    val got = run("d_entropy_scores")
    assert(got.length == 9)
    got.foreach { r =>
      val (nc, ce, nt, te) = want(r.getLong(0))
      assert(r.getLong(1) == nc && r.getLong(3) == nt, s"doc ${r.getLong(0)} counts")
      assert(math.abs(r.getDouble(2) - ce) < 3e-6, s"doc ${r.getLong(0)} char H")
      assert(math.abs(r.getDouble(4) - te) < 3e-6, s"doc ${r.getLong(0)} token H")
      assert(r.getBoolean(5) == (ce < 3.0), s"doc ${r.getLong(0)} low flag")
    }
  }

  test("d_kneser_ney: interpolated KN bigram probs vs textbook D=0.75 form") {
    // p_KN(w2|w1) = (max(c-0.75,0) + 0.75·n1+(w1·)·|{·w2}|/T) / c(w1·) —
    // every planted bigram cross-checked against the plain float form
    val want = Map(
      "w1 w2" -> (4L, 581140L), "w2 w3" -> (3L, 601973L),
      "h1 h2" -> (2L, 495614L), "h2 h1" -> (2L, 342105L),
      "w3 w4" -> (2L, 644736L), "h1 h3" -> (1L, 135964L),
      "h2 h2" -> (1L, 151315L), "h2 h3" -> (1L, 121710L),
      "h3 h2" -> (1L, 243421L), "h3 h4" -> (1L, 164473L),
      "h4 h5" -> (1L, 289473L), "w1 w1" -> (1L, 61403L),
      "w1 w3" -> (1L, 81140L), "w2 w2" -> (1L, 101973L),
      "w4 w5" -> (1L, 289473L), "w5 w6" -> (1L, 289473L),
      "w6 w7" -> (1L, 289473L), "w7 w8" -> (1L, 289473L),
      "w8 w9" -> (1L, 289473L))
    val got = run("d_kneser_ney")
    assert(got.length == 19, s"19 planted bigram types, got ${got.length}")
    got.foreach { r =>
      val (n, pk) = want(r.getString(0))
      assert(r.getLong(1) == n, s"${r.getString(0)} count")
      assert(r.getLong(2) == pk, // exact integer path
        s"${r.getString(0)} p_kn ${r.getLong(2)} want $pk")
    }
  }

  test("d_isotonic_calibration: PAV fit pools the planted violation exactly") {
    // en rates by bucket: 0/2, 2/3, 1/4, 1/1 — buckets 1,2 violate and
    // must pool to 3/7; hi is already monotone and must pass through
    val want = Map( // (lang, x) -> (w, n_pos, fitted_micros)
      ("en", 0L) -> (2L, 0L, 0L), ("en", 1L) -> (3L, 2L, 428571L),
      ("en", 2L) -> (4L, 1L, 428571L), ("en", 3L) -> (1L, 1L, 1000000L),
      ("hi", 0L) -> (1L, 0L, 0L), ("hi", 1L) -> (2L, 1L, 500000L),
      ("hi", 2L) -> (2L, 2L, 1000000L))
    val got = SparkEntry.queries("d_isotonic_calibration")(spark, isoDir).collect()
    assert(got.length == 7)
    got.foreach { r =>
      val (w, np, f) = want((r.getString(0), r.getLong(1)))
      assert(r.getLong(2) == w && r.getLong(3) == np,
        s"(${r.getString(0)},${r.getLong(1)}) inputs")
      assert(r.getLong(4) == f, // exact: min-max over floored block means
        s"(${r.getString(0)},${r.getLong(1)}) fitted ${r.getLong(4)} want $f")
    }
  }

  test("q_benford_audit: chi-square vs Benford expectations on planted digits") {
    val want = Map( // digit -> (n, observed, chi_term)
      "1" -> (7L, 0.35, 0.007966), "2" -> (3L, 0.15, 0.003866),
      "3" -> (3L, 0.15, 0.005027), "4" -> (1L, 0.05, 0.022707),
      "5" -> (2L, 0.1, 0.005474), "6" -> (1L, 0.05, 0.00429),
      "7" -> (1L, 0.05, 0.001101), "8" -> (1L, 0.05, 2.6e-05),
      "9" -> (1L, 0.05, 0.000393))
    val got = SparkEntry.queries("q_benford_audit")(spark, benfordDir).collect()
    assert(got.length == 9)
    got.foreach { r =>
      val (n, obs, chi) = want(r.getString(0))
      assert(r.getLong(1) == n, s"digit ${r.getString(0)} n")
      assert(math.abs(r.getDouble(2) - obs) < 1e-9, s"digit ${r.getString(0)} observed")
      // expected must be the true Benford mass, not a mirror of ours
      assert(math.abs(r.getDouble(3) - math.log10(1 + 1.0 / r.getString(0).toInt))
        < 1e-6, s"digit ${r.getString(0)} Benford expectation")
      assert(math.abs(r.getDouble(4) - chi) < 2e-6, s"digit ${r.getString(0)} chi")
      assert(math.abs(r.getDouble(5) - 0.05085) < 1e-5, "chi total")
    }
  }

  test("ev_haar_daily: unnormalized integer Haar transform equals a direct loop") {
    val want = Map[(String, Long, Long), Long](
      ("click", 0L, 0L) -> 45L,
      ("click", 1L, 0L) -> 4L,
      ("click", 1L, 1L) -> 2L,
      ("click", 1L, 2L) -> 5L,
      ("click", 1L, 3L) -> 3L,
      ("click", 1L, 4L) -> 3L,
      ("click", 1L, 5L) -> 4L,
      ("click", 1L, 6L) -> 4L,
      ("click", 1L, 7L) -> 0L,
      ("click", 1L, 8L) -> 0L,
      ("click", 1L, 9L) -> 0L,
      ("click", 1L, 10L) -> 0L,
      ("click", 1L, 11L) -> 0L,
      ("click", 1L, 12L) -> 0L,
      ("click", 1L, 13L) -> 0L,
      ("click", 1L, 14L) -> 0L,
      ("click", 1L, 15L) -> 0L,
      ("click", 2L, 0L) -> 0L,
      ("click", 2L, 1L) -> 0L,
      ("click", 2L, 2L) -> -3L,
      ("click", 2L, 3L) -> 6L,
      ("click", 2L, 4L) -> 0L,
      ("click", 2L, 5L) -> 0L,
      ("click", 2L, 6L) -> 0L,
      ("click", 2L, 7L) -> 0L,
      ("click", 3L, 0L) -> -2L,
      ("click", 3L, 1L) -> 7L,
      ("click", 3L, 2L) -> 0L,
      ("click", 3L, 3L) -> 0L,
      ("click", 4L, 0L) -> 7L,
      ("click", 4L, 1L) -> 0L,
      ("click", 5L, 0L) -> 45L,
      ("purchase", 0L, 0L) -> 6L,
      ("purchase", 1L, 0L) -> 1L,
      ("purchase", 1L, 1L) -> -1L,
      ("purchase", 1L, 2L) -> -1L,
      ("purchase", 1L, 3L) -> 0L,
      ("purchase", 1L, 4L) -> 0L,
      ("purchase", 1L, 5L) -> 1L,
      ("purchase", 1L, 6L) -> 0L,
      ("purchase", 1L, 7L) -> 0L,
      ("purchase", 1L, 8L) -> 0L,
      ("purchase", 1L, 9L) -> 0L,
      ("purchase", 1L, 10L) -> 0L,
      ("purchase", 1L, 11L) -> 0L,
      ("purchase", 1L, 12L) -> 0L,
      ("purchase", 1L, 13L) -> 0L,
      ("purchase", 1L, 14L) -> 0L,
      ("purchase", 1L, 15L) -> 0L,
      ("purchase", 2L, 0L) -> 2L,
      ("purchase", 2L, 1L) -> 1L,
      ("purchase", 2L, 2L) -> -1L,
      ("purchase", 2L, 3L) -> 0L,
      ("purchase", 2L, 4L) -> 0L,
      ("purchase", 2L, 5L) -> 0L,
      ("purchase", 2L, 6L) -> 0L,
      ("purchase", 2L, 7L) -> 0L,
      ("purchase", 3L, 0L) -> 3L,
      ("purchase", 3L, 1L) -> 1L,
      ("purchase", 3L, 2L) -> 0L,
      ("purchase", 3L, 3L) -> 0L,
      ("purchase", 4L, 0L) -> 4L,
      ("purchase", 4L, 1L) -> 0L,
      ("purchase", 5L, 0L) -> 6L,
      ("view", 0L, 0L) -> 8L,
      ("view", 1L, 0L) -> 0L,
      ("view", 1L, 1L) -> 1L,
      ("view", 1L, 2L) -> 0L,
      ("view", 1L, 3L) -> 1L,
      ("view", 1L, 4L) -> 0L,
      ("view", 1L, 5L) -> 0L,
      ("view", 1L, 6L) -> 0L,
      ("view", 1L, 7L) -> 0L,
      ("view", 1L, 8L) -> 0L,
      ("view", 1L, 9L) -> 0L,
      ("view", 1L, 10L) -> 0L,
      ("view", 1L, 11L) -> 0L,
      ("view", 1L, 12L) -> 0L,
      ("view", 1L, 13L) -> 0L,
      ("view", 1L, 14L) -> 0L,
      ("view", 1L, 15L) -> 0L,
      ("view", 2L, 0L) -> 3L,
      ("view", 2L, 1L) -> 1L,
      ("view", 2L, 2L) -> 0L,
      ("view", 2L, 3L) -> 0L,
      ("view", 2L, 4L) -> 0L,
      ("view", 2L, 5L) -> 0L,
      ("view", 2L, 6L) -> 0L,
      ("view", 2L, 7L) -> 0L,
      ("view", 3L, 0L) -> 2L,
      ("view", 3L, 1L) -> 0L,
      ("view", 3L, 2L) -> 0L,
      ("view", 3L, 3L) -> 0L,
      ("view", 4L, 0L) -> 8L,
      ("view", 4L, 1L) -> 0L,
      ("view", 5L, 0L) -> 8L
    )
    val got = runEv("ev_haar_daily")
    assert(got.length == want.size, s"rows ${got.length} want ${want.size}")
    got.foreach { r =>
      val k = (r.getString(0), r.getLong(1), r.getLong(2))
      assert(r.getLong(3) == want(k), s"$k coeff ${r.getLong(3)} want ${want(k)}") // exact ints
    }
  }

  test("d_mad_lengths: lower median + MAD exact on the planted lengths") {
    // a: lengths (40,90,150) -> median 90, devs (50,0,60) -> MAD 50
    // b: (90,200) -> lower median 90, devs (0,110) -> lower median 0
    // c: (250,250,480,551) -> rank-2 median 250, devs (0,0,230,301) -> 0
    val want = Map(
      "a" -> (3L, 90L, 50L), "b" -> (2L, 90L, 0L), "c" -> (4L, 250L, 0L))
    val got = run("d_mad_lengths")
    assert(got.length == 3)
    got.foreach { r =>
      val (n, med, mad) = want(r.getString(0))
      assert(r.getLong(1) == n && r.getLong(2) == med && r.getLong(3) == mad,
        s"${r.getString(0)}: (${r.getLong(1)},${r.getLong(2)},${r.getLong(3)})")
    }
  }

  /** planted PAV table: q-marked texts with a monotonicity violation */
  private lazy val isoDir: String = {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft-statvec-iso").toFile
    d.deleteOnExit()
    Seq(
      (1L, "no letter", "en", "s", 50L), (2L, "no letter", "en", "s", 60L),
      (3L, "has q here", "en", "s", 150L), (4L, "has q here", "en", "s", 160L),
      (5L, "no letter", "en", "s", 170L), (6L, "no letter", "en", "s", 250L),
      (7L, "no letter", "en", "s", 260L), (8L, "has q here", "en", "s", 270L),
      (9L, "no letter", "en", "s", 280L), (10L, "has q here", "en", "s", 350L),
      (11L, "no letter", "hi", "s", 50L), (12L, "has q here", "hi", "s", 150L),
      (13L, "no letter", "hi", "s", 160L), (14L, "has q here", "hi", "s", 250L),
      (15L, "has q here", "hi", "s", 260L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"${d.getAbsolutePath}/documents.parquet")
    d.getAbsolutePath
  }

  /** planted orders with known leading-digit counts (7,3,3,1,2,1,1,1,1) */
  private lazy val benfordDir: String = {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft-statvec-ben").toFile
    d.deleteOnExit()
    Seq(1.5, 12.0, 19.99, 100.0, 2.25, 25.0, 3.5, 31.0, 35.99, 4.75,
        5.0, 55.5, 6.0, 7.25, 8.5, 9.99, 11.0, 13.5, 17.0, 21.0)
      .zipWithIndex.map { case (p, i) => (i.toLong, p) }
      .toDF("o_orderkey", "o_totalprice")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"${d.getAbsolutePath}/orders.parquet")
    d.getAbsolutePath
  }

  test("ev_seasonal_decompose: two-way additive decomposition on a planted grid") {
    // 2 days x 3 hours of error counts (2,4,6 / 4,6,9): trend = day
    // mean over observed hours, seasonal = hour-of-day mean over days,
    // residual = n - trend - seasonal + grand mean (31/6)
    val want = Map( // window_start -> (n, trend_day, seasonal_hour, residual)
      "1970-01-01 01:00:00" -> (2L, 4.0, 3.0, 0.166667),
      "1970-01-01 02:00:00" -> (4L, 4.0, 5.0, 0.166667),
      "1970-01-01 03:00:00" -> (6L, 4.0, 7.5, -0.333333),
      "1970-01-02 01:00:00" -> (4L, 6.333333, 3.0, -0.166667),
      "1970-01-02 02:00:00" -> (6L, 6.333333, 5.0, -0.166667),
      "1970-01-02 03:00:00" -> (9L, 6.333333, 7.5, 0.333333))
    val got = SparkEntry.queries("ev_seasonal_decompose")(spark, seasonalDir).collect()
    assert(got.length == 6)
    got.foreach { r =>
      assert(r.getString(0) == "error")
      val (n, tr, se, res) = want(r.getString(1))
      assert(r.getLong(2) == n, s"${r.getString(1)} n")
      assert(math.abs(r.getDouble(3) - tr) < 1e-6, s"${r.getString(1)} trend")
      assert(math.abs(r.getDouble(4) - se) < 1e-6, s"${r.getString(1)} seasonal")
      assert(math.abs(r.getDouble(5) - res) < 2e-6, s"${r.getString(1)} residual")
    }
  }

  /** planted error-event hour grid for the seasonal decomposition */
  private lazy val seasonalDir: String = {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft-statvec-sea").toFile
    d.deleteOnExit()
    Seq(
      (1L, 3600000000000L, 100L, "error", 1.0, ""),
      (2L, 3660000000000L, 101L, "error", 1.0, ""),
      (3L, 7200000000000L, 100L, "error", 1.0, ""),
      (4L, 7260000000000L, 101L, "error", 1.0, ""),
      (5L, 7320000000000L, 102L, "error", 1.0, ""),
      (6L, 7380000000000L, 103L, "error", 1.0, ""),
      (7L, 10800000000000L, 100L, "error", 1.0, ""),
      (8L, 10860000000000L, 101L, "error", 1.0, ""),
      (9L, 10920000000000L, 102L, "error", 1.0, ""),
      (10L, 10980000000000L, 103L, "error", 1.0, ""),
      (11L, 11040000000000L, 104L, "error", 1.0, ""),
      (12L, 11100000000000L, 105L, "error", 1.0, ""),
      (13L, 90000000000000L, 100L, "error", 1.0, ""),
      (14L, 90060000000000L, 101L, "error", 1.0, ""),
      (15L, 90120000000000L, 102L, "error", 1.0, ""),
      (16L, 90180000000000L, 103L, "error", 1.0, ""),
      (17L, 93600000000000L, 100L, "error", 1.0, ""),
      (18L, 93660000000000L, 101L, "error", 1.0, ""),
      (19L, 93720000000000L, 102L, "error", 1.0, ""),
      (20L, 93780000000000L, 103L, "error", 1.0, ""),
      (21L, 93840000000000L, 104L, "error", 1.0, ""),
      (22L, 93900000000000L, 105L, "error", 1.0, ""),
      (23L, 97200000000000L, 100L, "error", 1.0, ""),
      (24L, 97260000000000L, 101L, "error", 1.0, ""),
      (25L, 97320000000000L, 102L, "error", 1.0, ""),
      (26L, 97380000000000L, 103L, "error", 1.0, ""),
      (27L, 97440000000000L, 104L, "error", 1.0, ""),
      (28L, 97500000000000L, 105L, "error", 1.0, ""),
      (29L, 97560000000000L, 106L, "error", 1.0, ""),
      (30L, 97620000000000L, 107L, "error", 1.0, ""),
      (31L, 97680000000000L, 108L, "error", 1.0, "")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"${d.getAbsolutePath}/events.parquet")
    d.getAbsolutePath
  }

  test("d_retrieval_eval: MRR and nDCG@10 vs direct BM25+DCG computation") {
    // planted index: query terms qa..qf with distinct dfs 8..3 (so the
    // derived 2x3-term queries are fixed); doc 3 is graded 3 for both
    // queries but padded to 28 tokens so BM25 demotes it below lower-
    // graded docs — the ranking DIVERGES from the ideal ordering and
    // nDCG < 1 (0.996258 / 0.983291 from the independent computation)
    val want = Map(
      0L -> (6L, 1.0, 0.996258),
      1L -> (3L, 1.0, 0.983291))
    val got = SparkEntry.queries("d_retrieval_eval")(spark, irDir).collect()
    assert(got.length == 2)
    got.foreach { r =>
      val (n3, mrr, ndcg) = want(r.getLong(0))
      assert(r.getLong(1) == n3, s"q${r.getLong(0)} n_relevant")
      assert(math.abs(r.getDouble(2) - mrr) < 1e-9, s"q${r.getLong(0)} mrr")
      assert(math.abs(r.getDouble(3) - ndcg) < 2e-6,
        s"q${r.getLong(0)} ndcg ${r.getDouble(3)}")
    }
  }

  test("d_ranking_agreement: RBO@5 of fully-agreeing 2-neighbor lists = 0.306694") {
    // three identical docs: both rankers (tfidf cosine, winnow overlap)
    // order each doc's two neighbors identically (tie-break by id), so
    // RBO@5 is the closed-form truncated sum
    // 0.1·(1/1 + 0.9·2/2 + 0.81·2/3 + 0.729·2/4 + 0.6561·2/5) = 0.3066944
    val got = SparkEntry.queries("d_ranking_agreement")(spark, rboDir).collect()
    assert(got.length == 3, s"3 agreeing queries, got ${got.length}")
    assert(got.map(_.getLong(0)).toSet == Set(1L, 2L, 3L))
    got.foreach { r =>
      assert(math.abs(r.getDouble(1) - 0.306694) < 1e-6,
        s"q${r.getLong(0)} rbo ${r.getDouble(1)}")
    }
  }

  /** planted BM25 index: controlled dfs + one long high-grade doc */
  private lazy val irDir: String = {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft-statvec-ir").toFile
    d.deleteOnExit()
    Seq(
      (1L, "qa qb qc qd qe qf", "en", "s", 10L),
      (2L, "qa qb qc qd qe qf f2a", "en", "s", 20L),
      (3L, "qa qb qc qd qe qf f3a f3b f3c f3d f3e f3f f3g f3h f3i f3j f3k f3l f3m f3n f3o f3p f3q f3r f3s f3t f3u f3v", "en", "s", 30L),
      (4L, "qa qb qc qd qe f4a f4b f4c", "en", "s", 40L),
      (5L, "qa qb qc qd f5a f5b f5c f5d", "en", "s", 50L),
      (6L, "qa qb qc f6a f6b f6c f6d f6e", "en", "s", 60L),
      (7L, "qa qb f7a f7b f7c f7d f7e f7f", "en", "s", 70L),
      (8L, "qa f8a f8b f8c f8d f8e f8f f8g", "en", "s", 80L),
      (9L, "f9a f9b f9c", "en", "s", 90L),
      (10L, "f10a f10b f10c", "en", "s", 100L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"${d.getAbsolutePath}/documents.parquet")
    d.getAbsolutePath
  }

  /** planted ranking-agreement corpus: 3 identical 12-token docs (both
    * similarity systems must pair them) + disjoint-vocabulary fillers */
  private lazy val rboDir: String = {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft-statvec-rbo").toFile
    d.deleteOnExit()
    val same = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    Seq(
      (1L, same, "en", "s", 10L),
      (2L, same, "en", "s", 20L),
      (3L, same, "en", "s", 30L),
      (4L, "u4a u4b u4c u4d u4e u4f u4g u4h u4i", "en", "s", 40L),
      (5L, "u5a u5b u5c u5d u5e u5f u5g u5h u5i", "en", "s", 50L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"${d.getAbsolutePath}/documents.parquet")
    d.getAbsolutePath
  }

  // =================================================================
  // Wave 4: lexical-formula vectors (PMI, RAKE, TextRank, Flesch).

  private lazy val lexDir: String = {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft-statvec-lex").toFile
    d.deleteOnExit()
    Seq(
      (1L, "big deal the red car a big deal", "en", "s", 10L),
      (2L, "big deal the red car", "en", "s", 20L),
      (3L, "big deal a red car", "en", "s", 30L),
      (4L, "big deal red car", "en", "s", 40L),
      (5L, "big deal the fast train", "en", "s", 50L),
      (6L, "big deal a fast train", "en", "s", 60L),
      (7L, "red car the quick brown fox", "en", "s", 70L),
      (8L, "quick brown fox runs", "en", "s", 80L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"${d.getAbsolutePath}/documents.parquet")
    d.getAbsolutePath
  }
  private def runLex(name: String): Array[Row] =
    SparkEntry.queries(name)(spark, lexDir).collect()

  test("d_collocations: PMI of the planted >= 5-count bigrams vs direct log-ratio") {
    // "red car" x5 and "big deal" x7 clear the noise floor; PMI =
    // log10(p(ab)/(p(a)p(b))) with the query's 6dp share rounding
    val got = runLex("d_collocations")
    assert(got.length == 2)
    val byRk = got.map(r => r.getLong(0) ->
      (r.getString(1), r.getString(2), r.getLong(3), r.getDouble(4))).toMap
    assert(byRk(1L)._1 == "red" && byRk(1L)._2 == "car" && byRk(1L)._3 == 5L)
    assert(math.abs(byRk(1L)._4 - 1.016047) < 2e-6, s"${byRk(1L)._4}")
    assert(byRk(2L)._1 == "big" && byRk(2L)._2 == "deal" && byRk(2L)._3 == 7L)
    assert(math.abs(byRk(2L)._4 - 0.869919) < 2e-6, s"${byRk(2L)._4}")
  }

  test("d_rake_keyphrases: deg/freq island scores vs a direct RAKE fold") {
    val want = Map( // phrase -> (n_words, n_occ, rake_score)
      "quick brown fox runs" -> (4L, 1L, 14.5),
      "quick brown fox" -> (3L, 1L, 10.5),
      "big deal red car" -> (4L, 1L, 9.371428),
      "red car" -> (2L, 4L, 4.8),
      "big deal" -> (2L, 6L, 4.571428),
      "fast train" -> (2L, 2L, 4.0))
    val got = runLex("d_rake_keyphrases")
    assert(got.length == 6)
    got.foreach { r =>
      val (nw, no, sc) = want(r.getString(0))
      assert(r.getLong(1) == nw && r.getLong(2) == no, s"${r.getString(0)} counts")
      assert(math.abs(r.getDouble(3) - sc) < 2e-6, s"${r.getString(0)} score")
    }
  }

  test("d_textrank_keywords: 3 damped weighted-PageRank rounds vs a direct loop") {
    // the isolated fast-train pair is a fixed point at exactly 0.1;
    // brown (bridging quick/fox with weight 2 edges) ranks first
    val want = Map( // tok -> (degree, textrank)
      "brown" -> (2L, 0.15144861), "fox" -> (2L, 0.123534375),
      "deal" -> (2L, 0.114103951), "red" -> (2L, 0.105686035),
      "fast" -> (1L, 0.1), "train" -> (1L, 0.1),
      "big" -> (1L, 0.094313965), "car" -> (1L, 0.08589605),
      "quick" -> (1L, 0.076465625), "runs" -> (1L, 0.048551389))
    val got = runLex("d_textrank_keywords")
    assert(got.length == 10)
    got.foreach { r =>
      val (dg, tr) = want(r.getString(0))
      assert(r.getLong(1) == dg, s"${r.getString(0)} degree")
      assert(math.abs(r.getDouble(2) - tr) < 1e-8,
        s"${r.getString(0)} textrank ${r.getDouble(2)}")
    }
  }

  test("d_readability: Flesch/FK from vowel-run syllables vs direct formulas") {
    val want = Map( // doc_id -> (w, sy, sent, fre, fk, band)
      1L -> (8L, 8L, 1L, 114.115, -0.67, "easy"),
      5L -> (5L, 5L, 1L, 117.16, -1.84, "easy"))
    val got = runLex("d_readability")
    assert(got.length == 2)
    got.foreach { r =>
      val (w, sy, sent, fre, fk, band) = want(r.getLong(0))
      assert(r.getLong(1) == w && r.getLong(2) == sy && r.getLong(3) == sent,
        s"doc ${r.getLong(0)} counts")
      assert(math.abs(r.getDouble(4) - fre) < 2e-6, s"doc ${r.getLong(0)} fre")
      assert(math.abs(r.getDouble(5) - fk) < 2e-6, s"doc ${r.getLong(0)} fk")
      assert(r.getString(6) == band, s"doc ${r.getLong(0)} band")
    }
  }
}
