package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator registers a [[graft.queries.Spec]]: the
  * Spark implementation plus (when SQL-expressible) a DuckDB oracle over
  * the same parquet tables. Specs live in domain modules:
  * [[Relational]] (star-schema), [[Events]] (time/session ops), and the
  * text/dedup/similarity modules.
  */
object SparkEntry {

  def specs: Seq[Spec] =
    Relational.specs ++ Events.specs ++ TextOps.specs ++ CleaningOps.specs ++
      Lexical.specs ++ Dedup.specs ++ Similarity.specs ++ Multimodal.specs ++
      StreamingQ.specs ++ TrainingPrep.specs ++ Retrieval.specs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q1PricingSummary.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    specs.map(sp => sp.name -> sp.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    specs.flatMap(sp => sp.oracle.map(o => sp.name -> o)).toMap

  /** Headline subset timed by [[Bench]]. */
  def benchQueries: Seq[Spec] = specs.filter(_.bench)
}
