package graft.ops

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.execution.LogicalRDD

/** Lifecycle hygiene for `localCheckpoint` in iterative loops.
  *
  * `localCheckpoint()` persists the materialized rows in the block
  * manager and nothing evicts them until the session dies — so a loop
  * that checkpoints every round (PageRank, connected components) leaks
  * one superseded RDD per round, and in a shared JVM (the bench
  * harness, a long-lived notebook) that state accumulates across
  * queries and pollutes later timings. These helpers drop exactly the
  * blocks backing a superseded checkpointed Dataset, and let a harness
  * sweep everything between isolated runs.
  */
object Checkpoints {

  /** Unpersist the block-manager state behind a checkpointed Dataset.
    * Safe on any Dataset: plans without a LogicalRDD are a no-op, so
    * loops can call this unconditionally on the previous round's
    * frame (only AFTER the next round is materialized — the next
    * checkpoint's eager build is the last reader of these blocks). */
  def unpersist(df: Dataset[_]): Unit =
    df.queryExecution.logical.collect {
      case l: LogicalRDD => l.rdd
    }.foreach(_.unpersist(blocking = false))

  /** Drop ALL persisted RDDs in the context — cached plans and local
    * checkpoints alike. For harness isolation between independent
    * queries (bench), never inside a query. */
  def sweepAll(spark: SparkSession): Unit = {
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = true))
  }
}
