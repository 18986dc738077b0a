package graft.ops

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Mergeable t-digest quantile sketch (Dunning & Ertl, "Computing
  * extremely accurate quantiles using t-digests", 2019) as a typed
  * Aggregator — the distributed-quantile tool that replaces a global
  * sort: each partition folds its rows into a bounded centroid list
  * (map-side partial aggregation), partials merge associatively at the
  * shuffle, and the driver never sees more than O(δ) centroids per
  * group. Complements the engine's KMV (distinct), CMS (frequency) and
  * native HLL/percentile_approx surfaces with the canonical
  * user-extendable quantile sketch.
  *
  * Centroid sizing uses the k1 (arcsine) scale function k(q) =
  * δ/(2π)·asin(2q−1): a cluster may span quantiles only while
  * k(q_right) − k(q_left) ≤ 1, which keeps clusters tiny at the tails
  * (the p95/p99 cases a latency/length monitor cares about) and caps
  * the centroid count between δ/2 (all quotas filled) and δ
  * (worst-case fragmentation) regardless of input size. Estimates
  * depend on partition merge order (like every
  * parallel sketch), so correctness gates use rank-tolerance bounds,
  * not value equality.
  */
object TDigest {

  /** Sketch state: compressed centroids + an uncompressed point buffer
    * (buffering amortizes the sort in [[compress]] across BufMax adds).
    * `n` carries the buffer length so the per-row flush check in [[add]]
    * is O(1) — List.length is an O(buf) traversal, which on the per-row
    * aggregation hot path compounds to O(BufMax²) per flush cycle. */
  final case class TD(cs: List[(Double, Long)], buf: List[Double], n: Int)

  val Compression = 200
  val BufMax = 512

  def empty: TD = TD(Nil, Nil, 0)

  private def kScale(q: Double): Double =
    Compression / (2.0 * math.Pi) * math.asin(2.0 * q - 1.0)
  private def kInverse(k: Double): Double =
    (math.sin(k * 2.0 * math.Pi / Compression) + 1.0) / 2.0

  /** One merge pass (Ertl's merging digest): sort by mean, open a
    * cluster, absorb neighbors while the cluster's right quantile stays
    * under qLimit = k⁻¹(k(q_left)+1). Output length ≤ δ regardless of
    * input size. */
  private[ops] def compress(cs: List[(Double, Long)]): List[(Double, Long)] = {
    if (cs.isEmpty) return Nil
    val sorted = cs.sortBy(_._1)
    val total = sorted.iterator.map(_._2).sum.toDouble
    val out = scala.collection.mutable.ListBuffer.empty[(Double, Long)]
    var (m, w) = sorted.head
    var wLeft = 0L // weight emitted strictly left of the open cluster
    var qLimit = kInverse(kScale(0.0) + 1.0)
    sorted.tail.foreach { case (cm, cw) =>
      if ((wLeft + w + cw) / total <= qLimit) {
        m += (cm - m) * cw.toDouble / (w + cw)
        w += cw
      } else {
        out += ((m, w)); wLeft += w
        qLimit = kInverse(kScale(wLeft / total) + 1.0)
        m = cm; w = cw
      }
    }
    out += ((m, w))
    out.toList
  }

  def add(td: TD, x: Double): TD = {
    val nb = x :: td.buf
    if (td.n + 1 >= BufMax) TD(compress(td.cs ::: nb.map((_, 1L))), Nil, 0)
    else TD(td.cs, nb, td.n + 1)
  }

  def merge(a: TD, b: TD): TD =
    TD(compress(a.cs ::: b.cs ::: (a.buf ::: b.buf).map((_, 1L))), Nil, 0)

  /** Quantile by midpoint interpolation between adjacent centroids —
    * the standard t-digest readout. */
  def quantile(tdIn: TD, q: Double): Double = {
    val cs = compress(tdIn.cs ::: tdIn.buf.map((_, 1L)))
    if (cs.isEmpty) return Double.NaN
    if (cs.length == 1) return cs.head._1
    val total = cs.iterator.map(_._2).sum.toDouble
    val target = q * total
    var cum = 0.0
    val mids = cs.map { case (m, w) =>
      val mid = cum + w / 2.0; cum += w; (mid, m)
    }
    if (target <= mids.head._1) cs.head._1
    else if (target >= mids.last._1) cs.last._1
    else mids.sliding(2).collectFirst {
      case List((m1, v1), (m2, v2)) if target >= m1 && target <= m2 =>
        if (m2 == m1) v1 else v1 + (v2 - v1) * (target - m1) / (m2 - m1)
    }.getOrElse(cs.last._1)
  }

  /** Aggregator emitting the requested quantiles (one array, one pass). */
  def aggregator(qs: Seq[Double]): Aggregator[Double, TD, Seq[Double]] =
    new Aggregator[Double, TD, Seq[Double]] {
      def zero: TD = empty
      def reduce(b: TD, x: Double): TD = add(b, x)
      def merge(a: TD, b: TD): TD = TDigest.merge(a, b)
      def finish(r: TD): Seq[Double] = qs.map(quantile(r, _))
      def bufferEncoder: Encoder[TD] = ExpressionEncoder[TD]()
      def outputEncoder: Encoder[Seq[Double]] = ExpressionEncoder[Seq[Double]]()
    }
}
