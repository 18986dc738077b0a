package graft.queries

import org.apache.spark.sql.functions._

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

  /** Stateful streaming sessionization (flatMapGroupsWithState +
    * EventTimeTimeout), oracle-backed: over a finite source the emitted
    * set is exactly (a) every non-final session per user (closed
    * in-batch by the 30-min gap) plus (b) final sessions whose timeout
    * timestamp (session end in ms + 30 min) lies strictly below the
    * final watermark (max event time in ms − 30 min) — the no-data
    * micro-batch fires those timeouts. The oracle states that closure
    * rule in SQL over the same batch sessionization. */
  val stSessions: Spec = Spec(
    "st_sessions",
    oracle = Some("""
      WITH m AS (
        SELECT user_id, event_id, epoch_us(ts) AS ts_us,
          CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                 OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
               THEN 1 ELSE 0 END AS brk
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)),
      sessed AS (
        SELECT user_id, ts_us,
          SUM(brk) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        FROM m),
      sess AS (
        SELECT user_id, session_id,
          MIN(ts_us) AS session_start_us, MAX(ts_us) AS session_end_us,
          COUNT(*) AS n_events
        FROM sessed GROUP BY user_id, session_id),
      mx AS (SELECT MAX(epoch_us(ts)) AS max_us FROM events),
      lastmark AS (
        SELECT user_id, MAX(session_id) AS last_id FROM sess GROUP BY user_id)
      SELECT s.user_id,
        CAST(session_start_us AS BIGINT) AS session_start_us,
        CAST(session_end_us AS BIGINT) AS session_end_us,
        CAST(n_events AS BIGINT) AS n_events
      FROM sess s JOIN lastmark l ON s.user_id = l.user_id CROSS JOIN mx
      WHERE s.session_id < l.last_id
         OR (session_end_us // 1000 + 1800000) < (max_us // 1000 - 1800000)
      ORDER BY s.user_id, session_start_us""")) { (s, dir) =>
    import s.implicits._
    StreamOps.statefulSessions(s, dir)
      .select($"user_id", $"session_start_us", $"session_end_us", $"n_events")
      .orderBy($"user_id", $"session_start_us")
  }

  /** The SCRIPT member of the LID ensemble, oracle-backed: the Unicode-
    * script histogram vote IS SQL-expressible, so this pins the script
    * detector against DuckDB on text carrying Devanagari / Bengali /
    * Latin-only rows (letters = \p{L} on both sides; vowel signs are
    * marks, not letters, in both engines). */
  val dLidScript: Spec = Spec(
    "d_lid_script",
    oracle = Some("""
      WITH r AS (SELECT doc_id,
          substr(text,1,15) || CASE doc_id % 3
            WHEN 0 THEN repeat(' नमस', 10)
            WHEN 1 THEN repeat(' রাম', 10) ELSE '' END AS rich
        FROM documents WHERE doc_id % 5 = 0),
      c AS (SELECT doc_id,
          length(regexp_replace(regexp_replace(rich,
            '[^\x{0900}-\x{097f}]', '', 'g'), '[^\p{L}]', '', 'g')) AS n_hi,
          length(regexp_replace(regexp_replace(rich,
            '[^\x{0980}-\x{09ff}]', '', 'g'), '[^\p{L}]', '', 'g')) AS n_bn,
          length(regexp_replace(rich, '[^a-zA-Z]', '', 'g')) AS n_lat
        FROM r)
      SELECT doc_id,
        CASE WHEN n_hi > n_bn AND n_hi > n_lat THEN 'hi'
             WHEN n_bn > n_hi AND n_bn > n_lat THEN 'bn'
             ELSE 'en' END AS script_lang,
        ROUND(CASE
          WHEN n_hi > n_bn AND n_hi > n_lat
            THEN CAST(n_hi AS DOUBLE) / (n_hi + n_bn + n_lat)
          WHEN n_bn > n_hi AND n_bn > n_lat
            THEN CAST(n_bn AS DOUBLE) / (n_hi + n_bn + n_lat)
          ELSE 0.3 * CAST(n_lat AS DOUBLE) / (n_hi + n_bn + n_lat)
        END, 6) AS script_conf
      FROM c ORDER BY doc_id""")) { (s, dir) =>
    import s.implicits._
    val rich = concat(substring($"text", 1, 15),
      when($"doc_id" % 3 === 0, repeat(lit(" नमस"), 10))
        .when($"doc_id" % 3 === 1, repeat(lit(" রাম"), 10))
        .otherwise(lit("")))
    val input = Tables.load(s, dir, "documents")
      .filter($"doc_id" % 5 === 0)
      .select($"doc_id", rich.as("rich"))
    Ensemble.annotate(s, input, "doc_id", "rich")
      .select($"doc_id", $"script_lang",
        round($"script_conf", 6).as("script_conf"))
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

  val specs: Seq[Spec] = Seq(stTumbling, stDedup, stSessions, dLid, dLidScript,
    pipelineE2e)
}
