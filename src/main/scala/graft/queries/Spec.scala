package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One engine operator exposed through the driver contract: a Spark
  * implementation plus (when SQL-expressible) a DuckDB oracle over the
  * same parquet tables. Column names/types must line up exactly — the
  * driver sorts columns by name and hash-compares values.
  *
  * Determinism rules used throughout so Spark and DuckDB hash-match:
  *  - double sums go through DECIMAL (associative, order-independent),
  *    then CAST to DOUBLE at the end;
  *  - derived integers are cast to BIGINT on both sides (DuckDB SUM(int)
  *    is HUGEINT, Spark is LONG);
  *  - timestamps are emitted as formatted strings;
  *  - every query ORDER BYs a deterministic key set.
  */
final case class Spec(
    name: String,
    oracle: Option[String],
    bench: Boolean = false)(
    val fn: (SparkSession, String) => DataFrame)

object Spec {
  /** micros-precision timestamp → string, identical in Spark/DuckDB. */
  val SparkTsFmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
  val DuckTsFmt = "%Y-%m-%d %H:%M:%S.%f"
}
