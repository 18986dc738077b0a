package graft.ops

import java.math.{BigDecimal => JBigDecimal, BigInteger, RoundingMode}

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** One-pass PCA sufficient statistics: per-row `v·vᵀ` plus per-dim
  * sums and the row count, accumulated as EXACT scale-9 integers and
  * merged associatively. This replaces the exploded self-join shape
  * (N·dim rows checkpointed, joined on vec_id into an N·dim²
  * intermediate before the (i,j) agg) with a single partial-agg pass:
  * each partition ships ONE dim²-sized buffer to the driver, so the
  * corpus is scanned once and nothing row-scale crosses an exchange.
  *
  * Exactness contract (what lets the DuckDB oracle replay the sums
  * byte-identically): every product is rounded with Spark's own
  * `round(x, 9)` semantics — `BigDecimal.valueOf(x).setScale(9,
  * HALF_UP)` — and accumulated as its unscaled BigInteger. Integer
  * addition is associative and commutative, so partition order and
  * merge order cannot change the result, and the final
  * `new BigDecimal(acc, 9).doubleValue` equals DuckDB's
  * `CAST(SUM(CAST(round(x, 9) AS DECIMAL)) AS DOUBLE)`.
  *
  * Scale shape: buffer is dim + dim(dim+1)/2 BigIntegers (dim=64 →
  * 2 144 cells, a few hundred KB worst case) regardless of corpus
  * size; per-row work is dim²/2 multiply-round-adds. At 100 TB the
  * plan is scan → partial agg → one merged row — the same
  * driver-bounded-result argument as the k-means codebook collects.
  */
object PcaMoments {

  /** Mutable exact buffer; kryo-serialized between partials. */
  final class Buf(var n: Long,
                  val sums: Array[BigInteger],
                  val prods: Array[BigInteger]) extends Serializable

  /** Exact decimal sums surfaced as doubles (the decimal→double cast
    * both engines apply after summing), upper triangle row-major. */
  final case class Stats(n: Long, sums: Array[Double], prods: Array[Double])

  private def s9(d: Double): BigInteger =
    JBigDecimal.valueOf(d).setScale(9, RoundingMode.HALF_UP).unscaledValue

  /** Upper-triangle flat index for 0-based (i ≤ j). */
  @inline private def ut(dim: Int, i: Int, j: Int): Int =
    (i * (2 * dim - i - 1)) / 2 + j

  def aggregator(dim: Int): Aggregator[Array[Float], Buf, Stats] =
    new Aggregator[Array[Float], Buf, Stats] {
      private val utLen = dim * (dim + 1) / 2
      def zero: Buf = new Buf(0L,
        Array.fill(dim)(BigInteger.ZERO), Array.fill(utLen)(BigInteger.ZERO))
      def reduce(b: Buf, v: Array[Float]): Buf = {
        b.n += 1 // count every row (the oracle's COUNT(*) over the table)
        if (v != null && v.length == dim) {
          var i = 0
          while (i < dim) {
            val vi = v(i).toDouble
            b.sums(i) = b.sums(i).add(s9(vi))
            var j = i
            while (j < dim) {
              val k = ut(dim, i, j)
              b.prods(k) = b.prods(k).add(s9(vi * v(j).toDouble))
              j += 1
            }
            i += 1
          }
        }
        b
      }
      def merge(a: Buf, b: Buf): Buf = {
        a.n += b.n
        var i = 0
        while (i < dim) { a.sums(i) = a.sums(i).add(b.sums(i)); i += 1 }
        var k = 0
        while (k < utLen) { a.prods(k) = a.prods(k).add(b.prods(k)); k += 1 }
        a
      }
      def finish(r: Buf): Stats = Stats(r.n,
        r.sums.map(bi => new JBigDecimal(bi, 9).doubleValue),
        r.prods.map(bi => new JBigDecimal(bi, 9).doubleValue))
      def bufferEncoder: Encoder[Buf] = Encoders.kryo[Buf]
      def outputEncoder: Encoder[Stats] = ExpressionEncoder[Stats]()
    }

  /** Rehydrate the symmetric dim×dim product-sum matrix from the
    * upper triangle (round(va·vb, 9) is symmetric — IEEE multiply
    * commutes — so the mirror is exact, matching the oracle's full
    * (i,j) GROUP BY). */
  def squareProds(st: Stats, dim: Int): Array[Array[Double]] =
    Array.tabulate(dim, dim) { (i, j) =>
      val (a, b) = if (i <= j) (i, j) else (j, i)
      st.prods(ut(dim, a, b))
    }

  /** Mutable plain-double buffer for the fast path. */
  final class FastBuf(var n: Long,
                      val sums: Array[Double],
                      val prods: Array[Double]) extends Serializable

  /** PRODUCTION-SPEED moments: same sufficient statistics in plain
    * doubles (no per-element rounding, no big-integer churn) — ~10³×
    * cheaper per row than [[aggregator]], at the cost of
    * aggregation-order float noise plus the exact path's own 9dp
    * per-product rounding (combined ≤ n·5e-10 absolute;
    * VectorOpsSpec pins the parity bound). Use this for
    * real 100 TB runs; the exact-decimal aggregator exists so the
    * DuckDB oracle can replay the sums bit-for-bit, not because PCA
    * needs decimal precision. */
  def fastAggregator(dim: Int): Aggregator[Array[Float], FastBuf, Stats] =
    new Aggregator[Array[Float], FastBuf, Stats] {
      private val utLen = dim * (dim + 1) / 2
      def zero: FastBuf =
        new FastBuf(0L, new Array[Double](dim), new Array[Double](utLen))
      def reduce(b: FastBuf, v: Array[Float]): FastBuf = {
        b.n += 1
        if (v != null && v.length == dim) {
          var i = 0
          while (i < dim) {
            val vi = v(i).toDouble
            b.sums(i) += vi
            var j = i
            while (j < dim) {
              b.prods(ut(dim, i, j)) += vi * v(j).toDouble
              j += 1
            }
            i += 1
          }
        }
        b
      }
      def merge(a: FastBuf, b: FastBuf): FastBuf = {
        a.n += b.n
        var i = 0
        while (i < dim) { a.sums(i) += b.sums(i); i += 1 }
        var k = 0
        while (k < utLen) { a.prods(k) += b.prods(k); k += 1 }
        a
      }
      def finish(r: FastBuf): Stats = Stats(r.n, r.sums, r.prods)
      def bufferEncoder: Encoder[FastBuf] = Encoders.kryo[FastBuf]
      def outputEncoder: Encoder[Stats] = ExpressionEncoder[Stats]()
    }
}
