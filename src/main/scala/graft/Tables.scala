package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided parquet tables (TESTDATA.md).
  *
  * One parquet file per table under `$dir/`. All queries take the sf
  * directory explicitly so the same code runs at any scale factor; at
  * cluster scale these would be partitioned directories instead of single
  * files and nothing here changes (`spark.read.parquet` takes globs).
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  // A scale-adaptive "fan-out" (repartition to scheduler width when the
  // input's byte size proves the scan is under-split) was prototyped in
  // r14 and REJECTED on measurement: a whole-bench A/B read +10.6 s over
  // 33 rows, and targeted A/Bs on the three heaviest compute-dense scans
  // (pipeline funnel, BM25 tf build, MinHash signatures) each lost or
  // tied — the added exchange, its retry-determinism sort, and the extra
  // AQE stage cost more than the parallelism bought, and the funnel's
  // per-row work scales ~3×, not 32×, across cores (allocation-bound).
  // See OPTIMIZATION_r14.md for the numbers before re-proposing it.

  /** Multi-path scan (SURVEY S2/S3 list form): one DataFrame over many
    * files — Spark unions the file splits for free, no UnionExec. */
  def loadMany(spark: SparkSession, paths: Seq[String]): DataFrame =
    spark.read.parquet(paths: _*)

  /** Manifest scan (SURVEY S3): newline-separated list of parquet paths. */
  def loadManifest(spark: SparkSession, manifestPath: String): DataFrame =
    graft.sources.DocSources.readManifest(spark, manifestPath)

  /** Register every table as a temp view so `spark.sql` mirrors the
    * DuckDB oracle text closely. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
