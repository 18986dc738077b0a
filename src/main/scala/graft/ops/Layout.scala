package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-LAYOUT operators: multi-dimensional clustering for scan
  * pruning. Sorting 100 TB by one column makes that column's min/max
  * file statistics razor-sharp and every other column's useless;
  * interleaving the bits of two key columns (Morton / Z-order — the
  * public technique behind Delta's OPTIMIZE ZORDER BY and Hudi's
  * layout optimization) keeps BOTH columns' value ranges locally
  * narrow in every output file, so predicates on either column prune.
  *
  * Everything here is exact integer arithmetic (shifts and masks over
  * non-negative longs) — bit-identical in any engine — and the
  * repartition rides Spark's own RangePartitioning over the computed
  * key, which samples range bounds distributively (no driver-side
  * histogram, no skew cliff: equal keys hash to one partition but a
  * Z-key is near-unique by construction).
  */
object Layout {

  /** Morton interleave of the low `bits` bits of two NON-NEGATIVE
    * integer columns: bit i of x lands at position 2i, bit i of y at
    * 2i+1. Built as a fixed sum of `bits` shift/mask terms per column
    * — pure codegen'd integer ops, no UDF, no HOF allocation. Inputs
    * are CLAMPED to 2^bits − 1 first, so an under-quantized column
    * folds into the top cell of its dimension instead of aliasing
    * far-apart values onto the same key (a silent mask would put value
    * v and v + 2^bits in one file and destroy the min/max pruning the
    * layout exists for). 16 bits per dimension = 4G cells. */
  def zOrder2(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    val top = lit((1L << bits) - 1)
    val (xc, yc) = (least(x, top), least(y, top))
    val terms = (0 until bits).flatMap { i =>
      Seq(
        shiftleft(shiftright(xc, i).bitwiseAND(lit(1L)), 2 * i),
        shiftleft(shiftright(yc, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }
    terms.reduce(_ + _)
  }

  /** The same construction as a DuckDB SQL snippet (single source for
    * oracles — clamp and term list generated from the same loop). */
  def zOrder2Sql(x: String, y: String, bits: Int = 16): String = {
    val top = (1L << bits) - 1
    val (xc, yc) = (s"LEAST($x, $top)", s"LEAST($y, $top)")
    (0 until bits).flatMap { i =>
      Seq(s"((($xc >> $i) & 1) << ${2 * i})",
        s"((($yc >> $i) & 1) << ${2 * i + 1})")
    }.mkString(" + ")
  }

  /** Range-repartition `df` by the Z-order key of two quantized
    * columns and tag each row with its key — the write-side layout
    * step: `zorderBy(df, $"a", $"b", 200).write.parquet(...)` yields
    * files whose per-file min/max statistics are tight on BOTH a and
    * b. The range exchange samples bounds on the executors (Spark's
    * RangePartitioning), so the only full pass is the write itself. */
  def zorderBy(df: DataFrame, x: Column, y: Column, partitions: Int,
      bits: Int = 16): DataFrame =
    df.withColumn("_graft_zkey", zOrder2(x, y, bits))
      .repartitionByRange(partitions, col("_graft_zkey"))
}
