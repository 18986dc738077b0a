package graft.queries

import graft.Tables
import graft.lid.Ensemble
import graft.streaming.StreamOps

/** Streaming + LID specs (results of non-relational subsystems surfaced
  * through the driver contract). */
object StreamingQ {

  /** Structured-Streaming tumbling-window counts — oracle is the plain
    * batch SQL (streaming/batch parity is the whole point). */
  val stTumbling: Spec = Spec(
    "st_tumbling_hourly",
    oracle = Some("""
      SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
             event_type, COUNT(*) AS n_events
      FROM events GROUP BY window_start, event_type
      ORDER BY window_start, event_type""")) { (s, dir) =>
    StreamOps.tumblingCounts(s, dir)
  }

  /** Streaming exact dedup on event_id (ids are unique in the synthetic
    * feed, so per-type uniques = per-type counts). */
  val stDedup: Spec = Spec(
    "st_dedup_count",
    oracle = Some("""
      SELECT event_type, COUNT(DISTINCT event_id) AS n_unique
      FROM events GROUP BY event_type ORDER BY event_type""")) { (s, dir) =>
    StreamOps.streamingDedupCount(s, dir)
  }

  /** Heuristic LID ensemble (no SQL oracle — model-style subsystem;
    * parity covered by multilingual ScalaTest fixtures). */
  val dLid: Spec = Spec(
    "d_lid_ensemble",
    oracle = None) { (s, dir) =>
    import s.implicits._
    Ensemble.annotate(
        s, Tables.load(s, dir, "documents").filter($"doc_id" % 20 === 0),
        "doc_id", "text")
      .orderBy($"doc_id")
  }

  /** Whole fused pipeline (clean → stats → flag/remove → exact+fuzzy
    * dedup) as a single headline metric; CC clustering makes it
    * non-SQL-expressible, so rows-only. */
  val pipelineE2e: Spec = Spec(
    "pipeline_e2e",
    oracle = None,
    bench = true) { (s, dir) =>
    import graft.pipeline.{Pipeline, PipelineConfig}
    new Pipeline(s, PipelineConfig())
      .run(Tables.load(s, dir, "documents"))
      .orderBy(org.apache.spark.sql.functions.col("doc_id"))
  }

  val specs: Seq[Spec] = Seq(stTumbling, stDedup, dLid, pipelineE2e)
}
