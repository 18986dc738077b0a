package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data profiling (ANALYZE-style corpus QA): per-column null counts,
  * exact distinct counts, min/max, and mean stringified length, in ONE
  * aggregate over the table — the multi-distinct is planned by Spark as
  * a single scan with an Expand (one input pass regardless of column
  * count), then the wide row unpivots via an explode over literal
  * structs in a plain projection. Nothing driver-side, no per-column
  * re-scan. Internal aliases are index-keyed and labels are Column
  * literals, so column names never pass through a SQL parser string
  * (names with spaces/quotes/backticks profile fine).
  */
object Profile {

  /** @return one row per profiled column:
    *         (column_name, n_rows, n_nulls, n_distinct, min_val,
    *         max_val, avg_len) — min/max stringified for a uniform
    *         schema, avg_len over the stringified value. */
  def profileColumns(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profileColumns needs at least one column")
    // positional rename: toDF never parses names, so the original
    // names (however weird) exist only as data labels from here on
    val names = df.columns.toSeq
    val safe = df.toDF(names.indices.map(i => s"_c$i"): _*)
    val pos = cols.map { c =>
      val i = names.indexOf(c)
      require(i >= 0, s"profileColumns: no such column '$c'")
      i
    }
    val aggs = cols.zip(pos).zipWithIndex.flatMap { case ((_, p), i) =>
      val v = col(s"_c$p")
      Seq(
        sum(when(v.isNull, 1L).otherwise(0L)).as(s"_nn_$i"),
        countDistinct(v).as(s"_nd_$i"),
        min(v).cast("string").as(s"_mn_$i"),
        max(v).cast("string").as(s"_mx_$i"),
        round(avg(length(v.cast("string"))), 6).as(s"_al_$i"))
    } :+ count(lit(1)).as("_n")
    val one = safe.agg(aggs.head, aggs.tail: _*)
    val entries = cols.zipWithIndex.map { case (c, i) =>
      struct(lit(c).as("column_name"), col(s"_nn_$i").as("n_nulls"),
        col(s"_nd_$i").as("n_distinct"), col(s"_mn_$i").as("min_val"),
        col(s"_mx_$i").as("max_val"), col(s"_al_$i").as("avg_len"))
    }
    one.select(col("_n").as("n_rows"), explode(array(entries: _*)).as("_p"))
      .select(col("_p.column_name"), col("n_rows"), col("_p.n_nulls"),
        col("_p.n_distinct"), col("_p.min_val"), col("_p.max_val"),
        col("_p.avg_len"))
  }
}
