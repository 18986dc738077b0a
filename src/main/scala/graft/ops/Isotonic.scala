package graft.ops

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Isotonic regression by Pool-Adjacent-Violators (Ayer et al. '55,
  * Barlow et al. '72) — THE monotone calibration op: fit the best
  * non-decreasing step function to (score, label-rate) points under
  * squared loss, the standard way a quality-classifier score becomes a
  * probability without assuming a parametric link.
  *
  * Exactness: points carry INTEGER (sum_y, weight); the PAV stack
  * compares block means by cross-multiplication (sy·w' vs sy'·w — no
  * float ever enters the fit), so the fitted value at every point is
  * an exact rational sy/sw, emitted as floor(1e6·sy/sw). The oracle
  * needs no stack: PAV's fitted value equals the minimax
  * max_{j≤i} min_{k≥i} mean(y[j..k]) (Barlow et al., Thm 1.4.4), and
  * because floor is monotone it commutes with both min and max — so
  * the oracle can take min/max over FLOORED integer-micros means of
  * prefix-sum ranges and still land on the identical integer.
  *
  * Scale shape: the fold is per-KEY row-local (the Holt/Viterbi
  * discipline — one collected array per group, never a driver loop);
  * group state is the distinct-score domain, which calibration inputs
  * bucket by construction. Cross-multiplication stays in Long — safe
  * while sy·w < 2^63 (weights and label sums are doc counts; a corpus
  * would need ~3e9 docs PER SCORE BUCKET to overflow). */
object Isotonic {

  /** @param points (key: string, x: long, w: long, sy: long) — at most
    *               one row per (key, x); w ≥ 1, 0 ≤ sy ≤ w.
    * @return (key, x, w, sy, fitted_micros) with fitted_micros the
    *         exact floor of 1e6 × the isotonic fit at x, non-decreasing
    *         in x within each key. */
  def pavFit(points: DataFrame): DataFrame = {
    val s = points.sparkSession
    import s.implicits._
    val grouped = points
      .groupBy($"key")
      .agg(sort_array(collect_list(struct($"x", $"w", $"sy"))).as("pts"))
      .as[(String, Seq[(Long, Long, Long)])]
    val fitted = grouped.flatMap { case (key, pts) =>
      // PAV stack: blocks of (sw, sy, count of points); merge while the
      // left neighbor's mean EXCEEDS the new block's (non-decreasing fit,
      // pooling ties is harmless). Cross-multiplied integer compares.
      val bw = new Array[Long](pts.length)
      val by = new Array[Long](pts.length)
      val bn = new Array[Int](pts.length)
      var top = -1
      pts.foreach { case (_, w, sy) =>
        top += 1; bw(top) = w; by(top) = sy; bn(top) = 1
        while (top > 0 && by(top - 1) * bw(top) > by(top) * bw(top - 1)) {
          bw(top - 1) += bw(top); by(top - 1) += by(top)
          bn(top - 1) += bn(top); top -= 1
        }
      }
      // expand blocks back to points, in x order
      val out = new Array[(String, Long, Long, Long, Long)](pts.length)
      var i = 0
      var b = 0
      while (b <= top) {
        val fm = math.floorDiv(1000000L * by(b), bw(b))
        var r = 0
        while (r < bn(b)) {
          val (x, w, sy) = pts(i)
          out(i) = (key, x, w, sy, fm)
          i += 1; r += 1
        }
        b += 1
      }
      out.toSeq
    }(Encoders.tuple(Encoders.STRING, Encoders.scalaLong,
      Encoders.scalaLong, Encoders.scalaLong, Encoders.scalaLong))
    fitted.toDF("key", "x", "w", "sy", "fitted_micros")
  }
}
