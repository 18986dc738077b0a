package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data profiling (ANALYZE-style corpus QA): per-column null counts,
  * exact distinct counts, min/max, and mean stringified length, in ONE
  * aggregate over the table — the multi-distinct is planned by Spark as
  * a single scan with an Expand (one input pass regardless of column
  * count), then the wide row unpivots via `stack` in a plain
  * projection. Nothing driver-side, no per-column re-scan.
  */
object Profile {

  /** @return one row per profiled column:
    *         (column_name, n_rows, n_nulls, n_distinct, min_val,
    *         max_val, avg_len) — min/max stringified for a uniform
    *         schema, avg_len over the stringified value. */
  def profileColumns(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profileColumns needs at least one column")
    val aggs = cols.flatMap { c =>
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"_nn_$c"),
        countDistinct(col(c)).as(s"_nd_$c"),
        min(col(c)).cast("string").as(s"_mn_$c"),
        max(col(c)).cast("string").as(s"_mx_$c"),
        round(avg(length(col(c).cast("string"))), 6).as(s"_al_$c"))
    } :+ count(lit(1)).as("_n")
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stackExpr = s"stack(${cols.size}, " + cols.map(c =>
      s"'$c', _nn_$c, _nd_$c, _mn_$c, _mx_$c, _al_$c").mkString(", ") +
      ") as (column_name, n_nulls, n_distinct, min_val, max_val, avg_len)"
    one.selectExpr("_n as n_rows", stackExpr)
      .select(col("column_name"), col("n_rows"), col("n_nulls"),
        col("n_distinct"), col("min_val"), col("max_val"), col("avg_len"))
  }
}
