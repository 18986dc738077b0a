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

  /** APPEND-mode hourly counts ([[StreamOps.tumblingAppendFrom]]) —
    * closed hours only, emitted once, state evicted: the
    * unbounded-runtime twin of st_tumbling_hourly (which keeps the
    * full-grid complete-mode form). The oracle states the closed-hour
    * prefix: hours whose END precedes the final watermark
    * max(ts) − 1 hour. */
  val stTumblingAppend: Spec = Spec(
    "st_tumbling_append",
    oracle = Some("""
      WITH mx AS (SELECT max(ts) AS m FROM events)
      SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
             event_type, COUNT(*) AS n_events
      FROM events, mx
      WHERE date_trunc('hour', ts) + INTERVAL 1 HOUR <= m - INTERVAL 1 HOUR
      GROUP BY window_start, event_type
      ORDER BY window_start, event_type""")) { (s, dir) =>
    import s.implicits._
    StreamOps.tumblingAppend(s, dir)
      .orderBy($"window_start", $"event_type")
  }

  /** NATIVE session windows in APPEND mode ([[StreamOps
    * .sessionAppendAgg]]): Spark's session state store merges per-user
    * windows across batches and the watermark evicts each session the
    * moment it closes. The oracle states the closed-session PREFIX of
    * the batch sessionization: sessions whose end (last event + the
    * 30-minute gap) is ≤ the final watermark (max event time truncated
    * to whole ms, − 30 min) — the same emission predicate the tumbling
    * append twin pins, applied to data-dependent window bounds. */
  val stSessionAppend: Spec = Spec(
    "st_session_append",
    oracle = Some("""
      WITH wm AS (SELECT (epoch_us(MAX(ts)) // 1000 - 1800000) * 1000
          AS wm_us FROM events),
      m AS (
        SELECT user_id, event_id, epoch_us(ts) AS ts_us,
          CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                 OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
               THEN 1 ELSE 0 END AS brk
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)),
      sessed AS (
        SELECT user_id, ts_us,
          SUM(brk) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        FROM m),
      sess AS (
        SELECT user_id,
          MIN(ts_us) AS start_us, MAX(ts_us) + 1800000000 AS end_us,
          COUNT(*) AS n_events
        FROM sessed GROUP BY user_id, sid)
      SELECT user_id,
        strftime(make_timestamp(start_us), '%Y-%m-%d %H:%M:%S.%f')
          AS session_start,
        strftime(make_timestamp(end_us), '%Y-%m-%d %H:%M:%S.%f')
          AS session_end,
        n_events
      FROM sess CROSS JOIN wm
      WHERE end_us <= wm_us
      ORDER BY user_id, session_start""")) { (s, dir) =>
    import s.implicits._
    StreamOps.sessionAppend(s, dir)
      .orderBy($"user_id", $"session_start")
  }

  /** Streaming sliding windows (1h every 15min) — oracle is the batch
    * shift-and-replicate SQL; streaming/batch parity is the point. */
  val stSliding: Spec = Spec(
    "st_sliding_hourly",
    oracle = Some("""
      SELECT strftime(time_bucket(INTERVAL '15 minutes', ts)
               - i * INTERVAL '15 minutes', '%Y-%m-%d %H:%M:%S') AS window_start,
             event_type, COUNT(*) AS n_events
      FROM events CROSS JOIN unnest(range(0, 4)) AS t(i)
      GROUP BY window_start, event_type
      ORDER BY window_start, event_type""")) { (s, dir) =>
    StreamOps.slidingCounts(s, dir)
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

  /** Stream-static enrichment (streaming events ⋈ broadcast customer
    * dim → watermarked hourly agg per segment) — oracle is the batch
    * join+agg; parity proves the stream-side plan computes the batch
    * answer. */
  val stEnrich: Spec = Spec(
    "st_enrich_hourly",
    oracle = Some("""
      SELECT strftime(date_trunc('hour', e.ts), '%Y-%m-%d %H:%M:%S') AS window_start,
             c.c_mktsegment AS mktsegment, COUNT(*) AS n_events,
             CAST(SUM(CAST(e.value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
      FROM events e JOIN customer c ON e.user_id = c.c_custkey
      GROUP BY window_start, mktsegment
      ORDER BY window_start, mktsegment""")) { (s, dir) =>
    StreamOps.enrichedCounts(s, dir)
  }

  /** Stream-stream event-time interval join (clicks ⋈ same-user views
    * within the preceding 10 minutes, watermarked both sides) — oracle
    * is the batch interval self-join in epoch_us; inner-join emission is
    * watermark-independent so the finite-source result is exactly the
    * batch answer. */
  val stClickView: Spec = Spec(
    "st_click_view",
    oracle = Some("""
      SELECT a.event_id AS click_id, b.event_id AS view_id,
             a.user_id AS user_id,
             epoch_us(a.ts) - epoch_us(b.ts) AS lag_us
      FROM events a JOIN events b
        ON a.user_id = b.user_id
        AND a.event_type = 'click' AND b.event_type = 'view'
        AND epoch_us(b.ts) >= epoch_us(a.ts) - 600000000
        AND epoch_us(b.ts) <= epoch_us(a.ts)
      ORDER BY click_id, view_id""")) { (s, dir) =>
    StreamOps.clickViewJoin(s, dir)
  }

  /** LEFT-OUTER stream-stream interval join
    * ([[StreamOps.clickViewOuterFrom]]): matched pairs are the inner
    * join's (watermark-independent); an unmatched click's null-extended
    * row emits only once the watermark seals its window — the oracle
    * states matched ∪ (unmatched with click_ts < max(ts) − 1 h), the
    * closed-prefix contract of the append-mode family applied to a
    * join. NULLS FIRST stated explicitly (Spark's ASC default;
    * DuckDB's is NULLS LAST). */
  val stClickViewOuter: Spec = Spec(
    "st_click_view_outer",
    oracle = Some("""
      WITH mx AS (SELECT max(ts) AS m FROM events),
      a AS (SELECT event_id, user_id, ts FROM events
            WHERE event_type = 'click'),
      b AS (SELECT event_id, user_id, ts FROM events
            WHERE event_type = 'view'),
      matched AS (
        SELECT a.event_id AS click_id, b.event_id AS view_id,
               a.user_id AS user_id,
               epoch_us(a.ts) - epoch_us(b.ts) AS lag_us
        FROM a JOIN b
          ON a.user_id = b.user_id
          AND epoch_us(b.ts) >= epoch_us(a.ts) - 600000000
          AND epoch_us(b.ts) <= epoch_us(a.ts)),
      sealed AS (
        SELECT a.event_id AS click_id, CAST(NULL AS BIGINT) AS view_id,
               a.user_id AS user_id, CAST(NULL AS BIGINT) AS lag_us
        FROM a, mx
        WHERE a.ts < m - INTERVAL 1 HOUR
          AND NOT EXISTS (SELECT 1 FROM matched WHERE click_id = a.event_id))
      SELECT * FROM matched
      UNION ALL SELECT * FROM sealed
      ORDER BY click_id, view_id NULLS FIRST""")) { (s, dir) =>
    StreamOps.clickViewOuter(s, dir)
  }

  /** Heuristic LID ensemble, FULLY oracled: every head was made
    * integer-exact ([[graft.lid.TrigramScore]]) so
    * [[graft.lid.LidOracle]] can replay all four detectors (trigram
    * cosine argmaxes, stopword hits, the generated-regex script
    * histogram, the indic roman-ratio router) plus the majority/
    * priority vote in DuckDB — per-detector langs and 6dp confidences
    * hash-match. Multilingual fixtures additionally pinned in
    * LidSpec. */
  val dLid: Spec = Spec(
    "d_lid_ensemble",
    oracle = Some(graft.lid.LidOracle.ensembleSql)) { (s, dir) =>
    import s.implicits._
    Ensemble.annotate(
        s, Tables.load(s, dir, "documents").filter($"doc_id" % 20 === 0),
        "doc_id", "text")
      .select($"doc_id", $"doc_lang",
        $"indic_lang", round($"indic_conf", 6).as("indic_conf"),
        $"ngram_lang", round($"ngram_conf", 6).as("ngram_conf"),
        $"stop_lang", round($"stop_conf", 6).as("stop_conf"),
        $"script_lang", round($"script_conf", 6).as("script_conf"))
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
      ORDER BY s.user_id, session_start_us"""),
    bench = true) { (s, dir) =>
    import s.implicits._
    StreamOps.statefulSessions(s, dir)
      .select($"user_id", $"session_start_us", $"session_end_us", $"n_events")
      .orderBy($"user_id", $"session_start_us")
  }

  /** Streaming DATA-QUALITY MONITOR: the q_expectations pattern on a
    * live feed — hourly violation counters for value-range /
    * referential (vs the broadcast customer dim) / type-domain /
    * props-parse rules; oracle is the batch hour-grouped audit. The
    * value-range rule carries a REAL violation in the corpus, so the
    * counting path is proven, not just zeros. */
  val stQualityMonitor: Spec = Spec(
    "st_quality_monitor",
    oracle = Some("""
      SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S')
          AS window_start,
        COUNT(*) AS n_events,
        CAST(SUM(CASE WHEN value > 400 THEN 1 ELSE 0 END) AS BIGINT)
          AS value_over_400,
        CAST(SUM(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
          AS fk_user_miss,
        CAST(SUM(CASE WHEN event_type NOT IN
            ('view', 'click', 'signup', 'purchase', 'error')
          THEN 1 ELSE 0 END) AS BIGINT) AS type_unknown,
        CAST(SUM(CASE WHEN json_extract_string(props, '$.k') IS NULL
          THEN 1 ELSE 0 END) AS BIGINT) AS props_invalid
      FROM events
        LEFT JOIN (SELECT DISTINCT c_custkey FROM customer) c
        ON c.c_custkey = events.user_id
      GROUP BY window_start ORDER BY window_start""")) { (s, dir) =>
    StreamOps.qualityMonitor(s, dir)
  }

  /** Stateful streaming ATTRIBUTION: the batch ev_attribution rollup
    * maintained from the live event feed — per-user 7-day touch
    * buffers ([[StreamOps.attributionFrom]]) emit first/last/linear
    * credits at purchase time with the identical integer remainder
    * rule, so the oracle IS the batch SQL verbatim
    * ([[Events.attributionOracleSql]]): every credit the banded join
    * derives after the fact, the state machine derives on arrival. */
  val stAttribution: Spec = Spec(
    "st_attribution",
    oracle = Some(Events.attributionOracleSql)) { (s, dir) =>
    import s.implicits._
    StreamOps.statefulAttribution(s, dir)
      .filter($"model".isin("first", "last", "linear"))
      .groupBy($"model", $"touch_type")
      .agg((sum($"credit").cast("double") / 1000000.0).as("attributed_value"),
        count(lit(1)).as("n_credits"))
      .orderBy($"model", $"touch_type")
  }

  /** The TIME-DECAY model's streaming half: the same per-user touch
    * buffers emit decay credits at purchase time with the batch
    * day-weight/floor/remainder rules, so the oracle is
    * ev_attribution_decay's SQL verbatim. */
  val stAttributionDecay: Spec = Spec(
    "st_attribution_decay",
    oracle = Events.qAttributionDecay.oracle) { (s, dir) =>
    import s.implicits._
    StreamOps.statefulAttribution(s, dir)
      .filter($"model" === "decay")
      .groupBy($"touch_type")
      .agg((sum($"credit").cast("double") / 1000000.0).as("attributed_value"),
        count(lit(1)).as("n_credits"))
      .orderBy($"touch_type")
  }

  /** Streaming ENTRY/EXIT matrix: the batch ev_entry_exit report
    * maintained from the stateful session stream — sessions close by
    * the same 30-minute gap / EventTimeTimeout rule as st_sessions
    * (state per user is one fixed-width tuple; the exit label
    * overwrites in place), and the closed sessions aggregate into the
    * (entry, exit) matrix. The oracle states the identical closure
    * rule over the batch sessionization, then rolls up — the matrix
    * differs from the batch twin's exactly by the final-open-session
    * rows the stream correctly refuses to close. */
  val stEntryExit: Spec = Spec(
    "st_entry_exit",
    oracle = Some("""
      WITH m AS (
        SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us,
          CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                 OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
               THEN 1 ELSE 0 END AS brk
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)),
      sessed AS (
        SELECT user_id, event_id, event_type, ts_us,
          SUM(brk) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        FROM m),
      fe AS (SELECT user_id, session_id, event_type, ts_us,
          row_number() OVER (PARTITION BY user_id, session_id
            ORDER BY ts_us, event_id) AS rf,
          COUNT(*) OVER (PARTITION BY user_id, session_id) AS ne
        FROM sessed),
      sess AS (SELECT user_id, session_id,
          MAX(ts_us) AS session_end_us,
          MIN(CASE WHEN rf = 1 THEN event_type END) AS entry_type,
          MIN(CASE WHEN rf = ne THEN event_type END) AS exit_type,
          COUNT(*) AS n_events
        FROM fe GROUP BY 1, 2),
      mx AS (SELECT MAX(epoch_us(ts)) AS max_us FROM events),
      lastmark AS (
        SELECT user_id, MAX(session_id) AS last_id FROM sess GROUP BY user_id),
      closed AS (
        SELECT s.* FROM sess s JOIN lastmark l ON s.user_id = l.user_id
        CROSS JOIN mx
        WHERE s.session_id < l.last_id
           OR (session_end_us // 1000 + 1800000) < (max_us // 1000 - 1800000))
      SELECT entry_type, exit_type, CAST(COUNT(*) AS BIGINT) AS n_sessions,
        round(CAST(SUM(n_events) AS DOUBLE) / COUNT(*), 6) AS avg_events
      FROM closed GROUP BY 1, 2 ORDER BY entry_type, exit_type""")) { (s, dir) =>
    import s.implicits._
    StreamOps.statefulEntryExit(s, dir)
      .groupBy($"entry_type", $"exit_type")
      .agg(count(lit(1)).as("n_sessions"),
        round(sum($"n_events").cast("double") / count(lit(1)), 6)
          .as("avg_events"))
      .orderBy($"entry_type", $"exit_type")
  }

  /** The SCRIPT member of the LID ensemble, oracle-backed: the Unicode-
    * script histogram vote IS SQL-expressible, so this pins the script
    * detector against DuckDB on text carrying Devanagari / Bengali /
    * Latin-only rows (letters = \p{L} on both sides; vowel signs are
    * marks, not letters, in both engines). */
  /** Shared by d_lid_script and its streaming twin. */
  private val lidScriptOracleSql: String = """
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
      FROM c ORDER BY doc_id"""

  /** The script-vote projection shared by batch and streaming LID. */
  private def lidScriptCols(s: org.apache.spark.sql.SparkSession,
      src: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import s.implicits._
    val rich = concat(substring($"text", 1, 15),
      when($"doc_id" % 3 === 0, repeat(lit(" नमस"), 10))
        .when($"doc_id" % 3 === 1, repeat(lit(" রাম"), 10))
        .otherwise(lit("")))
    val input = src.filter($"doc_id" % 5 === 0)
      .select($"doc_id", rich.as("rich"))
    Ensemble.annotate(s, input, "doc_id", "rich")
      .select($"doc_id", $"script_lang",
        round($"script_conf", 6).as("script_conf"))
  }

  val dLidScript: Spec = Spec(
    "d_lid_script",
    oracle = Some(lidScriptOracleSql)) { (s, dir) =>
    import s.implicits._
    lidScriptCols(s, Tables.load(s, dir, "documents")).orderBy($"doc_id")
  }

  /** LID evaluation harness: confusion matrix of the script vote
    * against the corpus' labeled `lang` column — the accuracy report a
    * model-swap ships with (per cell: doc count + mean confidence).
    * Aggregation is a (true, predicted) hash agg over the detector
    * projection — cells are languages², so the summary is driver-tiny
    * at any corpus size. Confidence averages as DECIMAL with the FLOOR
    * 1e6 rule (6dp means divided by counts land on half-way points). */
  val dLidConfusion: Spec = Spec(
    "d_lid_confusion",
    oracle = Some(s"""
      WITH det AS ($lidScriptOracleSql)
      SELECT d.lang AS true_lang, det.script_lang AS pred_lang,
        COUNT(*) AS n_docs,
        FLOOR(CAST(SUM(CAST(det.script_conf AS DECIMAL(18,6))) AS DOUBLE)
          / COUNT(*) * 1e6) / 1e6 AS mean_conf
      FROM det JOIN documents d ON det.doc_id = d.doc_id
      GROUP BY true_lang, pred_lang ORDER BY true_lang, pred_lang""")) { (s, dir) =>
    import s.implicits._
    val det = lidScriptCols(s, Tables.load(s, dir, "documents"))
    det.join(Tables.load(s, dir, "documents").select($"doc_id", $"lang"),
        "doc_id")
      .groupBy($"lang".as("true_lang"), $"script_lang".as("pred_lang"))
      .agg(count(lit(1)).as("n_docs"),
        (floor(sum($"script_conf".cast("decimal(18,6)")).cast("double")
          / count(lit(1)) * 1e6) / 1e6).as("mean_conf"))
      .orderBy($"true_lang", $"pred_lang")
  }

  /** COHEN'S KAPPA of the script detector against the labeled corpus —
    * the chance-corrected agreement summary over the confusion matrix
    * [[dLidConfusion]] prints raw (accuracy alone flatters a detector
    * on a skewed language mix; κ subtracts what marginal guessing
    * would score). Entirely exact until one division:
    * κ = (N·Σnᵢᵢ − Σ rowᵢ·colᵢ) / (N² − Σ rowᵢ·colᵢ) — integer
    * cross-multiplied form, DECIMAL products, floor-micros. One hash
    * agg to the languages² cell frame; everything after is
    * marginal-sized. */
  val dLidKappa: Spec = Spec(
    "d_lid_kappa",
    oracle = Some(s"""
      WITH det AS ($lidScriptOracleSql),
      ct AS (SELECT d.lang AS t, det.script_lang AS p,
          CAST(COUNT(*) AS BIGINT) AS n
        FROM det JOIN documents d ON det.doc_id = d.doc_id GROUP BY 1, 2),
      nn AS (SELECT CAST(SUM(n) AS BIGINT) AS n FROM ct),
      ag AS (SELECT CAST(COALESCE(SUM(CASE WHEN t = p THEN n END), 0)
          AS BIGINT) AS agree FROM ct),
      mt AS (SELECT t AS l, CAST(SUM(n) AS BIGINT) AS rt FROM ct GROUP BY 1),
      mp AS (SELECT p AS l, CAST(SUM(n) AS BIGINT) AS ct FROM ct GROUP BY 1),
      pe AS (SELECT CAST(COALESCE(SUM(mt.rt::HUGEINT * mp.ct), 0)
          AS HUGEINT) AS e
        FROM mt JOIN mp ON mp.l = mt.l)
      SELECT nn.n AS n_docs, ag.agree AS n_agree,
        CAST(FLOOR(CAST(ag.agree AS DOUBLE) / CAST(nn.n AS DOUBLE)
          * 1000000) AS BIGINT) AS accuracy_micros,
        CAST(FLOOR(CAST(nn.n::HUGEINT * ag.agree - pe.e AS DOUBLE)
          / CAST(nn.n::HUGEINT * nn.n - pe.e AS DOUBLE) * 1000000)
          AS BIGINT) AS kappa_micros
      FROM nn, ag, pe
      WHERE nn.n::HUGEINT * nn.n - pe.e > 0""")) { (s, dir) =>
    import s.implicits._
    val det = lidScriptCols(s, Tables.load(s, dir, "documents"))
    val ct = det
      .join(Tables.load(s, dir, "documents").select($"doc_id", $"lang"),
        "doc_id")
      .groupBy($"lang".as("t"), $"script_lang".as("p"))
      .agg(count(lit(1)).as("n"))
      .localCheckpoint() // marginals + diagonal + total share the cells
    val nn = ct.agg(sum($"n").cast("long").as("n"))
    val ag = ct.agg(coalesce(sum(when($"t" === $"p", $"n")), lit(0L))
      .cast("long").as("agree"))
    val mt = ct.groupBy($"t".as("l")).agg(sum($"n").cast("long").as("rt"))
    val mp = ct.groupBy($"p".as("l")).agg(sum($"n").cast("long").as("cc"))
    val pe = mt.join(mp, Seq("l"))
      .agg(coalesce(sum($"rt".cast("decimal(38,0)") * $"cc"),
        lit(0).cast("decimal(38,0)")).as("e"))
    nn.crossJoin(ag).crossJoin(pe)
      .filter($"n".cast("decimal(38,0)") * $"n" - $"e" > 0)
      .select($"n".as("n_docs"), $"agree".as("n_agree"),
        floor($"agree".cast("double") / $"n".cast("double") * 1e6)
          .cast("long").as("accuracy_micros"),
        floor(($"n".cast("decimal(38,0)") * $"agree" - $"e").cast("double")
          / ($"n".cast("decimal(38,0)") * $"n" - $"e").cast("double")
          * 1e6).cast("long").as("kappa_micros"))
  }

  /** STREAMING LID: the ensemble's mapPartitions annotation is
    * stateless, so the identical column logic runs on an unbounded
    * document feed (append mode, no state store) — "tag language as
    * docs arrive from the crawler". Shares [[lidScriptCols]] and the
    * oracle with d_lid_script. */
  val stLidScript: Spec = Spec(
    "st_lid_script",
    oracle = Some(lidScriptOracleSql)) { (s, dir) =>
    import s.implicits._
    StreamOps.docFlagsStream(s, dir, src => lidScriptCols(s, src),
      "st_lid_mem").orderBy($"doc_id")
  }

  /** The full-funnel oracle SQL (clean -> stats -> flag/remove -> exact
    * dedup -> MinHash-LSH fuzzy dedup with CC clustering), parameterized
    * by the `base` CTE so [[pipelineE2e]] (pre-extracted text) and
    * [[pipelineE2eDom]] (DOM block extraction first) replay the
    * IDENTICAL funnel behind different front doors. */
  private def pipelineOracleOver(baseSelect: String): String = {
    val ng5 =
      "list_transform(range(1, greatest(len(lt)-3, 1)), i -> array_to_string(lt[i:i+4], ' '))"
    s"""
      WITH RECURSIVE base AS ($baseSelect),
      tok AS (SELECT *, string_split(text, ' ') AS l,
              ${TextOps.trivSqlRouted("text", "lang")} AS lt FROM base),
      st AS (
        SELECT doc_id, text, lang, source, n_chars, l,
          CAST(len(l) AS BIGINT) AS words_count,
          CAST(length(text) AS BIGINT) AS char_count,
          CAST(strlen(text) AS BIGINT) AS bytes,
          CAST(list_sum(list_transform(l, x -> length(x))) AS DOUBLE) / len(l)
            AS mean_word_len,
          CAST(len(list_filter(l, x -> x = 'slow' OR x = 'dup')) +
            len(list_filter(list_transform(range(1, len(l)),
              i -> array_to_string(l[i:i+1], ' ')), g -> g = 'hash join')) AS DOUBLE)
            / len(l) AS nsfw_ratio,
          CAST(length(regexp_replace(text, '[a-z ]', '', 'g')) AS DOUBLE)
            / length(text) AS non_li_ratio,
          CAST(len(list_filter(l, x -> x = 'the' OR x = 'a')) AS DOUBLE)
            / len(l) AS stopword_ratio,
          CASE WHEN len($ng5) = 0 THEN 0.0
            ELSE CAST(len($ng5) - len(list_filter($ng5,
              g -> len(list_filter($ng5, h -> h = g)) = 1)) AS DOUBLE)
              / len($ng5) END AS word_rep_score
        FROM tok),
      fl AS (
        SELECT *,
          words_count <= 60 AS has_less_words,
          mean_word_len <= 3.2 AS is_short_words_heavy,
          nsfw_ratio >= 0.04 AS is_nsfw_heavy,
          non_li_ratio >= 0.05 AS is_non_li_heavy,
          word_rep_score >= 0.10 AS has_word_repetition
        FROM st),
      surv AS (
        SELECT * FROM fl
        WHERE NOT has_less_words AND NOT is_short_words_heavy
          AND NOT is_nsfw_heavy AND NOT is_non_li_heavy
          AND NOT has_word_repetition),
      ex AS (
        SELECT * FROM surv
        QUALIFY row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) = 1),
      sh AS (
        SELECT doc_id, list_distinct(list_transform(range(1, greatest(len(l)-1, 1)),
          i -> array_to_string(l[i:i+2], ' '))) AS sh
        FROM ex WHERE len(l) >= 3),
      sig AS (SELECT doc_id, list_transform(range(0, 32),
          p -> CAST(list_min(list_transform(sh, s ->
            (CAST(2*p*2654435761 + 1 AS HUGEINT) *
               (('0x' || substr(md5(s), 1, 15))::BIGINT) + (p*40503 + 7))
              % 2305843009213693951)) AS BIGINT)) AS sig
        FROM sh),
      bands AS (SELECT doc_id, b,
          md5(b::VARCHAR || '|' || array_to_string(sig[b*4+1:b*4+4], '')) AS bk
        FROM sig CROSS JOIN unnest(range(0, 8)) AS t(b)),
      pairs AS (SELECT DISTINCT a.doc_id AS ida, b.doc_id AS idb
        FROM bands a JOIN bands b ON a.b = b.b AND a.bk = b.bk
          AND a.doc_id < b.doc_id),
      verified AS (
        SELECT ida, idb FROM pairs
        JOIN sh sa ON sa.doc_id = ida JOIN sh sb ON sb.doc_id = idb
        WHERE CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE) /
          (len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh))) >= 0.5),
      edges AS (SELECT ida AS src, idb AS dst FROM verified
        UNION ALL SELECT idb, ida FROM verified),
      walk(id, comp) AS (
        SELECT src, src FROM edges
        UNION
        SELECT e.dst, w.comp FROM walk w JOIN edges e ON e.src = w.id),
      labels AS (SELECT id, MIN(comp) AS component FROM walk GROUP BY id),
      dropids AS (SELECT id FROM labels WHERE id <> component)
      SELECT doc_id, text, lang, source, n_chars, words_count, char_count,
        bytes, mean_word_len, nsfw_ratio, non_li_ratio, stopword_ratio,
        word_rep_score, has_less_words, is_short_words_heavy, is_nsfw_heavy,
        is_non_li_heavy, has_word_repetition
      FROM ex WHERE doc_id NOT IN (SELECT id FROM dropids)
      ORDER BY doc_id"""
  }

  /** Whole fused pipeline (clean → stats → flag/remove → exact dedup →
    * MinHash-LSH fuzzy dedup with connected-component clustering),
    * replayed END TO END by the oracle: cleaning + stats + flags as
    * list ops, exact dedup as a QUALIFY window, the LSH pair recipe
    * hash-for-hash, clusters as a recursive reachability CTE, and the
    * final anti-join — every output column (including the unrounded
    * double stats) must hash-match. The funnel tail is shared with
    * [[pipelineE2eDom]] via [[pipelineOracleOver]] — same funnel,
    * different front door. */
  val pipelineE2e: Spec = Spec(
    "pipeline_e2e",
    oracle = Some(pipelineOracleOver("""
        SELECT doc_id, regexp_replace(trim(lower(text)), '[\s\x0B]+', ' ', 'g') AS text,
               lang, source, n_chars
        FROM documents""")),
    bench = true) { (s, dir) =>
    import graft.pipeline.{Pipeline, PipelineConfig}
    new Pipeline(s, PipelineConfig())
      .run(Tables.load(s, dir, "documents"))
      .orderBy(org.apache.spark.sql.functions.col("doc_id"))
  }

  /** [[pipelineE2e]] with the DOM front door (r11 judge directive #8):
    * the same fused funnel, but the input is raw HTML and
    * `PipelineConfig(htmlInput, domExtract)` routes ExtractStage
    * through the block-tree extractor — chrome subtrees dropped by
    * structure, the d_dom_extract keep rule (length ≥ 25, link density
    * ≤ 0.2), newline reassembly — before clean/stats/flags/dedup. The
    * planted template exercises every keep-rule branch (nav chrome, a
    * link-dense teaser, a sub-25-char block, three content paragraphs
    * carrying the document text); the oracle reconstructs the
    * extraction literally and replays the IDENTICAL funnel tail via
    * [[pipelineOracleOver]]. */
  val pipelineE2eDom: Spec = Spec(
    "pipeline_e2e_dom",
    oracle = Some(pipelineOracleOver("""
        SELECT doc_id, regexp_replace(trim(lower(
          trim(regexp_replace('first section of the article body ' || substr(text, 1, 200), '\s+', ' ', 'g')) || chr(10) ||
          trim(regexp_replace('second section with further detail ' || substr(text, 201, 200), '\s+', ' ', 'g')) || chr(10) ||
          trim(regexp_replace('closing remarks with a long tail ' || substr(text, 401, 160), '\s+', ' ', 'g'))
        )), '[\s\x0B]+', ' ', 'g') AS text,
               lang, source, n_chars
        FROM documents""")),
    bench = true) { (s, dir) =>
    import s.implicits._
    import graft.pipeline.{Pipeline, PipelineConfig}
    val html = concat(
      lit("<html><body><nav><a href=\"/\">home</a> <a href=\"/x\">about</a></nav><article>"),
      lit("<p>first section of the article body "),
      substring($"text", 1, 200), lit("</p>"),
      lit("<p><a href=\"/more\">read more related links here</a></p>"),
      lit("<p>tiny</p>"),
      lit("<p>second section with further detail "),
      substring($"text", 201, 200), lit("</p>"),
      lit("<p>closing remarks with a long tail "),
      substring($"text", 401, 160), lit("</p>"),
      lit("</article></body></html>"))
    val input = Tables.load(s, dir, "documents").withColumn("text", html)
    new Pipeline(s, PipelineConfig(htmlInput = true, domExtract = true))
      .run(input)
      .orderBy($"doc_id")
  }

  /** STREAMING corpus checksum: the order-independent xor/sum snapshot
    * fingerprint (d_corpus_checksum) maintained as a complete-mode
    * per-source aggregation over the document feed — state is ONE row
    * of three numbers per source no matter how long the stream runs
    * (the folds are commutative, which is also why arrival order
    * cannot change the answer). The '__total__' row is derived
    * batch-side by MERGING the per-source partials — the same
    * 16-bytes-per-shard fold the scale rehearsal pins — and the oracle
    * is the batch ROLLUP SQL, shared. */
  val stCorpusChecksum: Spec = Spec(
    "st_corpus_checksum",
    oracle = Some(TrainingPrep.corpusChecksumOracleSql)) { (s, dir) =>
    import s.implicits._
    val m = lit(2305843009213693952L)
    val parts = StreamOps.docsAggStream(s, dir, src =>
      src.select($"source",
          conv(substring(md5(concat($"doc_id".cast("string"), lit("|"), $"text")),
            1, 12), 16, 10).cast("long").as("hv"))
        .groupBy($"source")
        .agg(count(lit(1)).as("n"), expr("bit_xor(hv)").as("x"),
          sum($"hv".cast("decimal(38,0)")).as("sm")),
      "st_checksum_mem")
    val total = parts
      .agg(sum($"n").as("n"), expr("bit_xor(x)").as("x"), sum($"sm").as("sm"))
      // empty-feed edge: the batch ROLLUP grand-total row carries n = 0
      // (COUNT over nothing), while SUM over no partials is null —
      // coalesce so the twins agree even on an empty corpus
      .select(lit("__total__").as("source"),
        coalesce($"n", lit(0L)).as("n"), $"x", $"sm")
    parts.select($"source", $"n", $"x", $"sm").unionByName(total)
      .select($"source", $"n", $"x".as("xor_sig"),
        ($"sm" % m).cast("long").as("sum_sig"))
      .orderBy($"source")
  }

  /** STREAMING Neyman allocation: the per-source (n, Σx, Σx²) moment
    * row maintained as a complete-mode aggregation over the document
    * feed — 3 numbers per source of state — with the variance-optimal
    * sample-budget fold ([[TrainingPrep.neymanOverMoments]]) as a
    * batch view over that state: the live "how should today's sample
    * budget split across sources" monitor an ingestion pipeline keeps.
    * Shares the batch oracle — moment sums are order-free. */
  val stNeymanAllocation: Spec = Spec(
    "st_neyman_allocation",
    oracle = Some(TrainingPrep.neymanOracleSql)) { (s, dir) =>
    import s.implicits._
    val moments = StreamOps.docsAggStream(s, dir, src =>
      src.select($"source",
          size(split($"text", " ", -1)).cast("decimal(38,0)").as("x"))
        .groupBy($"source")
        .agg(count(lit(1)).cast("decimal(38,0)").as("n"),
          sum($"x").as("sx"), sum($"x" * $"x").as("sxx")),
      "st_neyman_mem")
    TrainingPrep.neymanOverMoments(moments)
  }

  /** STREAMING doc flagging — the cleaning pipeline's stats+flags run
    * unchanged on an unbounded document feed (stateless projections:
    * no state store, no watermark, append mode). Column logic is
    * shared with the batch d_doc_flags via TextOps.statsCols, and the
    * oracle IS the batch SQL — streaming/batch parity on the text
    * pipeline itself, not just the event operators. */
  val stDocFlags: Spec = Spec(
    "st_doc_flags",
    oracle = Some(s"""
      SELECT doc_id, words_count, ROUND(mean_word_len, 6) AS mean_word_len,
        ROUND(nsfw_ratio, 6) AS nsfw_ratio, ROUND(word_rep_score, 6) AS word_rep_score,
        ${TextOps.flagsSql}
      FROM (${TextOps.statsSql}) WHERE doc_id % 20 = 0 ORDER BY doc_id""")) { (s, dir) =>
    import s.implicits._
    StreamOps.docFlagsStream(s, dir, src =>
      graft.ops.Flagging.addFlags(
        TextOps.statsCols(src.filter($"doc_id" % 20 === 0)))
        .select($"doc_id", $"words_count",
          round($"mean_word_len", 6).as("mean_word_len"),
          round($"nsfw_ratio", 6).as("nsfw_ratio"),
          round($"word_rep_score", 6).as("word_rep_score"),
          $"has_less_words", $"is_short_words_heavy", $"is_nsfw_heavy",
          $"is_non_li_heavy", $"has_word_repetition"),
      "st_doc_flags_mem")
      .orderBy($"doc_id")
  }

  /** STREAMING heavy hitters (Misra–Gries per micro-batch + exact
    * recount, [[StreamOps.heavyHittersStart]]) — the oracle is the
    * same plain SQL as batch d_heavy_hitters because the recount makes
    * the output exact regardless of batch boundaries or summary
    * merge order. Same injected hot/warm tokens as the batch query. */
  val stHeavyHitters: Spec = Spec(
    "st_heavy_hitters",
    oracle = Some("""
      WITH tok AS (
        SELECT unnest(string_split(text, ' ')) AS tok FROM documents
        UNION ALL
        SELECT 'hotword' FROM documents CROSS JOIN unnest(range(0, 8))
        UNION ALL
        SELECT 'warmword' FROM documents CROSS JOIN unnest(range(0, 2))),
      t AS (SELECT CAST(COUNT(*) AS BIGINT) AS total FROM tok),
      c AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS n FROM tok GROUP BY tok)
      SELECT tok, n, (SELECT total FROM t) AS total
      FROM c WHERE n * 20 > (SELECT total FROM t) ORDER BY tok""")) { (s, dir) =>
    import s.implicits._
    val outDir = graft.ops.Scratch.dir("graft_st_hh")
    val src = s.readStream.schema(StreamOps.documentsSchema)
      .option("pathGlobFilter", "documents.parquet").parquet(dir)
    val toks = src.select(explode(concat(
      graft.ops.Text.tokens($"text"),
      array((0 until 8).map(_ => lit("hotword")): _*),
      array(lit("warmword"), lit("warmword")))).as("tok"))
    StreamOps.heavyHittersBatches(s, toks, "tok", 20, outDir)
      .orderBy($"tok")
  }

  /** STREAMING count-min ([[StreamOps.cmsStart]]): per-batch d×w
    * matrices summed cell-wise into the global sketch — CMS linearity
    * means batch boundaries cannot change the result, so this shares
    * the batch d_cms_counts oracle verbatim. Multi-batch merge ==
    * one-shot additionally pinned on a MemoryStream in StreamingSpec. */
  val stCmsCounts: Spec = Spec(
    "st_cms_counts",
    oracle = Some(TrainingPrep.cmsOracleSql)) { (s, dir) =>
    import s.implicits._
    val outDir = graft.ops.Scratch.dir("graft_st_cms")
    val src = s.readStream.schema(StreamOps.documentsSchema)
      .option("pathGlobFilter", "documents.parquet").parquet(dir)
    val toks = src.select(explode(graft.ops.Text.tokens($"text")).as("tok"))
    StreamOps.cmsBatches(s, toks, "tok", d = 4, w = 128, outDir)
  }

  /** STREAMING drift monitor: the watermarked tumbling count query
    * maintains the (window, type) table; PSI is a batch view over that
    * state — the standard streaming-monitor split (stream keeps the
    * cheap sufficient statistics, the expensive comparison runs over
    * the bounded result). Shares [[Events.psiOverWindowCounts]] and the
    * batch oracle with ev_drift_windowed. */
  val stDriftWindowed: Spec = Spec(
    "st_drift_windowed",
    oracle = Some(Events.driftOracleSql)) { (s, dir) =>
    import s.implicits._
    Events.psiOverWindowCounts(
      StreamOps.tumblingCounts(s, dir, sink = "st_drift_mem")
        .select($"window_start", $"event_type", $"n_events".as("n")))
  }

  /** STREAMING windowed-KS monitor: the watermarked daily tumbling agg
    * maintains the (day, type, quantized value) count table — the
    * bounded sufficient statistic — and the KS + p-value comparison is
    * a batch view over it, sharing [[Events.ksOverDayValueCounts]] and
    * the batch oracle with ev_ks_windowed (same split as
    * st_drift_windowed: the stream keeps cheap bounded state, the
    * expensive comparison runs over the bounded result). */
  val stKsWindowed: Spec = Spec(
    "st_ks_windowed",
    oracle = Some(Events.ksWindowedOracleSql)) { (s, dir) =>
    Events.ksOverDayValueCounts(
      StreamOps.dailyValueCounts(s, dir, sink = "st_ks_mem"))
  }

  /** APPEND-mode twin of the KS sufficient statistic
    * ([[StreamOps.dailyValueCountsAppendFrom]]): closed days are
    * emitted exactly once as the watermark passes them and their state
    * is evicted — the unbounded-runtime deployment shape. The oracle
    * states the closed-day prefix directly: every (day, type,
    * quantized value) count whose day END precedes the final watermark
    * max(ts) − 1 day (Spark emission predicate window.end ≤ watermark;
    * the trailing open day is exactly what never appears). */
  val stKsCountsAppend: Spec = Spec(
    "st_ks_counts_append",
    oracle = Some("""
      WITH mx AS (SELECT max(ts) AS m FROM events)
      SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS window_day,
        event_type, round(value, 1) AS v, COUNT(*) AS cnt
      FROM events, mx
      WHERE date_trunc('day', ts) + INTERVAL 1 DAY <= m - INTERVAL 1 DAY
      GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""")) { (s, dir) =>
    import s.implicits._
    StreamOps.dailyValueCountsAppend(s, dir)
      .orderBy($"window_day", $"event_type", $"v")
  }

  /** STATEFUL streaming Markov transitions: flatMapGroupsWithState
    * keeps each user's LAST event so a transition split across
    * micro-batches is still emitted — per-key continuity no per-batch
    * window has. Shares [[Events.markovOverPairs]] and the batch
    * oracle with ev_markov_transitions; the cross-batch path is
    * pinned by the two-batch MemoryStream test in StreamingSpec. */
  val stMarkov: Spec = Spec(
    "st_markov_transitions",
    oracle = Some(Events.markovOracleSql)) { (s, dir) =>
    import s.implicits._
    Events.markovOverPairs(
      StreamOps.markovPairs(s, dir).select($"cur", $"nxt"))
  }

  /** STREAMING HITS: the same watermarked per-user transition-pair
    * state the Markov twin maintains; the guarded driver fold
    * ([[Events.hitsOverPairs]]) runs as a batch view over it — sharing
    * the batch oracle with ev_hits_transitions. The state universe
    * (distinct event types, needed so types with no transitions still
    * report zero scores) is a bounded dimension read alongside the
    * stream, exactly like the lexicon frames the quality monitors
    * join. */
  val stHits: Spec = Spec(
    "st_hits_transitions",
    oracle = Events.qHitsTransitions.oracle) { (s, dir) =>
    import s.implicits._
    val states = Events.load(s, dir).select($"event_type").distinct()
      .as[String].collect().toSeq.sorted
    Events.hitsOverPairs(
      StreamOps.markovPairs(s, dir, sink = "st_hits_mem")
        .select($"cur", $"nxt"), states)
  }

  /** STREAMING seasonal decomposition: the watermarked tumbling count
    * query maintains the hourly table; trend/seasonal/residual run as
    * a batch view over that bounded state — the st_drift_windowed
    * split, sharing [[Events.seasonalOverHourCounts]] + the batch
    * oracle with ev_seasonal_decompose. */
  val stSeasonal: Spec = Spec(
    "st_seasonal_decompose",
    oracle = Some(Events.seasonalOracleSql)) { (s, dir) =>
    import s.implicits._
    Events.seasonalOverHourCounts(
      StreamOps.tumblingCounts(s, dir, sink = "st_seasonal_mem")
        .filter($"event_type" === "error")
        .select($"event_type", $"window_start", $"n_events".as("n"))
        .localCheckpoint())
  }

  /** STREAMING CUSUM changepoints: the watermarked daily tumbling
    * count query maintains the days × |types| grid; the CUSUM
    * statistic (prefix-identity form) runs as a batch view over that
    * bounded state — the st_seasonal_decompose split, sharing
    * [[Events.spineFill]] + [[Events.cusumOverDayGrid]] and the batch
    * oracle with ev_cusum_changepoint. */
  val stCusum: Spec = Spec(
    "st_cusum_changepoint",
    oracle = Some(Events.cusumOracleSql)) { (s, dir) =>
    Events.cusumOverDayGrid(Events.spineFill(
      StreamOps.dailyTypeCounts(s, dir, sink = "st_cusum_mem")))
  }

  /** STREAMING EWMA control chart: the same watermarked daily count
    * grid, the dyadic-weight smoothing + exact-variance limits as a
    * batch view over it — sharing [[Events.spineFill]] +
    * [[Events.ewmaControlOverDayGrid]] and the batch oracle with
    * ev_ewma_control (the st_cusum_changepoint split). In a production
    * deployment the closed-form expansion collapses to the O(1)
    * recursion z ← (x + z)/2 inside the stateful store; the shared
    * tail keeps the verify surface bit-identical to the batch chart. */
  val stEwmaControl: Spec = Spec(
    "st_ewma_control",
    oracle = Some(Events.ewmaControlOracleSql)) { (s, dir) =>
    Events.ewmaControlOverDayGrid(Events.spineFill(
      StreamOps.dailyTypeCounts(s, dir, sink = "st_ewma_mem")))
  }

  /** STREAMING binary segmentation: the same watermarked daily count
    * grid, the two-round prefix-sum changepoint search as a batch view
    * over it — sharing [[Events.spineFill]] +
    * [[Events.binsegOverDayGrid]] and the batch oracle with
    * ev_binseg_changepoint (the st_cusum_changepoint split). */
  val stBinseg: Spec = Spec(
    "st_binseg_changepoint",
    oracle = Some(Events.qBinsegChangepoint.oracle.get)) { (s, dir) =>
    Events.binsegOverDayGrid(Events.spineFill(
      StreamOps.dailyTypeCounts(s, dir, sink = "st_binseg_mem")))
  }

  /** STREAMING anomaly ensemble: Shewhart + CUSUM + EWMA consensus as
    * a batch view over the same watermarked daily count grid — the
    * three member tails are exactly the batch ones, so this shares the
    * ev_anomaly_ensemble oracle (st_cusum_changepoint split). */
  val stAnomalyEnsemble: Spec = Spec(
    "st_anomaly_ensemble",
    oracle = Events.qAnomalyEnsemble.oracle) { (s, dir) =>
    Events.anomalyEnsembleOverDayGrid(Events.spineFill(
      StreamOps.dailyTypeCounts(s, dir, sink = "st_ensemble_mem")))
  }

  /** STREAMING forecast backtest: the same watermarked daily count
    * grid, the rolling-origin Holt-vs-naive evaluation as a batch view
    * over it — sharing [[Events.spineFill]] +
    * [[Events.forecastBacktestOverGrid]] and the batch oracle with
    * ev_forecast_backtest (the st_holt_forecast split: the stream
    * maintains the bounded day-grid state, the evaluation harness
    * reads it). */
  val stForecastBacktest: Spec = Spec(
    "st_forecast_backtest",
    oracle = Events.qForecastBacktest.oracle) { (s, dir) =>
    Events.forecastBacktestOverGrid(Events.spineFill(
      StreamOps.dailyTypeCounts(s, dir, sink = "st_backtest_mem")))
  }

  /** STREAMING Granger screening: the same watermarked daily count
    * grid, the pairwise lag-1 F-test as a batch view over it — sharing
    * [[Events.spineFill]] + [[Events.grangerOverGrid]] and the batch
    * oracle with ev_granger_pairs. */
  val stGrangerPairs: Spec = Spec(
    "st_granger_pairs",
    oracle = Some(Events.grangerOracleSql)) { (s, dir) =>
    Events.grangerOverGrid(Events.spineFill(
      StreamOps.dailyTypeCounts(s, dir, sink = "st_granger_mem")))
  }

  /** STREAMING PACF: the same watermarked daily count grid, the
    * Durbin–Levinson identification pass as a batch view over it —
    * sharing [[Events.spineFill]] + [[Events.pacfOverGrid]] and the
    * batch oracle with ev_pacf_daily. */
  val stPacfDaily: Spec = Spec(
    "st_pacf_daily",
    oracle = Some(Events.pacfOracleSql)) { (s, dir) =>
    Events.pacfOverGrid(Events.spineFill(
      StreamOps.dailyTypeCounts(s, dir, sink = "st_pacf_mem")))
  }

  /** STREAMING Ljung–Box: the same watermarked daily count grid, the
    * white-noise portmanteau statistic as a batch view over it —
    * sharing [[Events.spineFill]] + [[Events.ljungBoxOverGrid]] and
    * the batch oracle with ev_ljung_box (the st_cusum_changepoint
    * split). */
  val stLjungBox: Spec = Spec(
    "st_ljung_box",
    oracle = Some(Events.ljungBoxOracleSql)) { (s, dir) =>
    Events.ljungBoxOverGrid(Events.spineFill(
      StreamOps.dailyTypeCounts(s, dir, sink = "st_ljung_mem")))
  }

  /** STREAMING Mann-Kendall: the watermarked per-(type, day) count grid
    * (the same bounded sufficient statistic the CUSUM/Holt/Ljung-Box
    * monitors consume) with the trend-significance fold
    * ([[Events.mannKendallOverGrid]]) as a batch view over that state —
    * sharing the exact oracle with ev_mann_kendall. No spine fill: MK
    * pairs observed days only, matching the batch form. */
  val stMannKendall: Spec = Spec(
    "st_mann_kendall",
    oracle = Some(Events.mannKendallOracleSql)) { (s, dir) =>
    Events.mannKendallOverGrid(
      StreamOps.dailyTypeCounts(s, dir, sink = "st_mk_mem")
        .withColumnRenamed("cnt", "c"))
  }

  /** STREAMING Holt forecast: the watermarked stream maintains the
    * bounded per-(type, day) count grid (the same sufficient statistic
    * the CUSUM monitor consumes); the level/trend fold and the 7-day
    * forecast run as a batch view over that state — sharing
    * [[Events.spineFill]] + [[Events.holtOverDayGrid]] and the batch
    * oracle with ev_holt_forecast. */
  val stHoltForecast: Spec = Spec(
    "st_holt_forecast",
    oracle = Some(Events.holtOracleSql)) { (s, dir) =>
    Events.holtOverDayGrid(Events.spineFill(
      StreamOps.dailyTypeCounts(s, dir, sink = "st_holt_mem")))
  }

  /** STREAMING t-digest quantiles: one mergeable digest per event type
    * as complete-mode state (≤ δ centroids each, forever), partial
    * digests merging across batches exactly as across partitions; the
    * rank-tolerance gate is a batch counting pass against the streamed
    * estimates (the q_tdigest_quantiles discipline — parallel-sketch
    * estimates depend on merge order, so the gate bounds RANK, not
    * value). */
  val stTdigest: Spec = Spec(
    "st_tdigest",
    oracle = Some("""
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        TRUE AS p50_ok, TRUE AS p95_ok
      FROM events GROUP BY event_type ORDER BY event_type""")) { (s, dir) =>
    import s.implicits._
    val sk = StreamOps.tdigestValueQuantiles(s, dir)
      .select($"event_type", $"est".getItem(0).as("e50"),
        $"est".getItem(1).as("e95"))
    val ev = Events.load(s, dir)
    ev.join(broadcast(sk), Seq("event_type"))
      .groupBy($"event_type").agg(
        count(lit(1)).as("n"),
        sum(when($"value" < $"e50", 1L).otherwise(0L)).as("c50"),
        sum(when($"value" < $"e95", 1L).otherwise(0L)).as("c95"))
      .select($"event_type", $"n",
        ($"c50" >= $"n" * 0.47 && $"c50" <= $"n" * 0.53).as("p50_ok"),
        ($"c95" >= $"n" * 0.92 && $"c95" <= $"n" * 0.98).as("p95_ok"))
      .orderBy($"event_type")
  }

  /** STREAMING AMS F2: the 61 tug-of-war counters run as ONE
    * complete-mode global aggregate (state = one row, mergeable by
    * addition across batches); the median-of-means estimate is a
    * batch view — sharing [[Events.amsOverBitSums]] and the exact
    * oracle with ev_ams_f2. The canonical "sketch as streaming state"
    * shape: constant state for an unbounded stream. */
  val stAmsF2: Spec = Spec(
    "st_ams_f2",
    oracle = Some(Events.amsOracleSql)) { (s, dir) =>
    Events.amsOverBitSums(
      StreamOps.amsBitSums(s, dir),
      Events.load(s, dir))
  }

  /** STREAMING HLL: the per-(event_type) distinct user-day sketch (the
    * DAU primitive every serving layer keeps) as a complete-mode
    * register aggregation — 256 state rows per type for an unbounded
    * stream, merged across batches by elementwise max; the estimate
    * fold ([[graft.ops.Hll.estimate]]) is a batch view over that
    * bounded state. The oracle replays the md5-derived registers over
    * the batch table, so the ESTIMATE hash-matches (the stream/batch
    * equality is HLL mergeability itself); exact distinct shipped
    * alongside. */
  val stHllUsers: Spec = Spec(
    "st_hll_users",
    oracle = Some(s"""
      WITH regs AS ${graft.ops.Hll.regSql(
        "event_type",
        "user_id || '|' || strftime(ts, '%Y-%m-%d')", "events", "event_type")},
      est AS (${graft.ops.Hll.estSql("event_type")})
      SELECT e.event_type, e.nonzero_regs, e.zeros, e.used_linear,
        e.est_distinct, x.exact_distinct
      FROM est e JOIN (SELECT event_type,
          CAST(COUNT(DISTINCT user_id || '|' || strftime(ts, '%Y-%m-%d')) AS BIGINT)
            AS exact_distinct
        FROM events GROUP BY event_type) x USING (event_type)
      ORDER BY e.event_type""")) { (s, dir) =>
    import s.implicits._
    val regs = StreamOps.hllUserDayRegisters(s, dir)
    val exact = Events.load(s, dir).select($"event_type",
        concat($"user_id".cast("string"), lit("|"),
          date_format(timestamp_micros(expr("ts div 1000")), "yyyy-MM-dd"))
          .as("user_day"))
      .groupBy($"event_type")
      .agg(countDistinct($"user_day").as("exact_distinct"))
    graft.ops.Hll.estimate(regs, Seq("event_type"))
      .join(exact, "event_type")
      .select($"event_type", $"nonzero_regs", $"zeros", $"used_linear",
        $"est_distinct", $"exact_distinct")
      .orderBy($"event_type")
  }

  /** STREAMING burst detection: the same watermarked per-(type, day)
    * count grid, with the Viterbi decode ([[Events
    * .burstDecodeOverGrid]]) as a batch view over the bounded state —
    * sharing the exact oracle with ev_burst_viterbi. */
  val stBurstViterbi: Spec = Spec(
    "st_burst_viterbi",
    oracle = Some(Events.burstOracleSql)) { (s, dir) =>
    Events.burstDecodeOverGrid(Events.spineFill(
      StreamOps.dailyTypeCounts(s, dir, sink = "st_burst_mem")))
  }

  /** STREAMING Holt-Winters: seasonal forecast as a batch view over
    * the streamed day grid — sharing [[Events.holtWintersOverGrid]]
    * and the oracle with ev_holt_winters. */
  val stHoltWinters: Spec = Spec(
    "st_holt_winters",
    oracle = Some(Events.holtWintersOracleSql)) { (s, dir) =>
    Events.holtWintersOverGrid(Events.spineFill(
      StreamOps.dailyTypeCounts(s, dir, sink = "st_hw_mem")))
  }

  /** STREAMING LOCF gap-fill: the watermarked daily stream maintains
    * the per-(type, day) sparse-reading grid; the carry-forward tail
    * runs as a batch view over that bounded state — sharing
    * [[Events.gapFillOverDayValues]] and the batch oracle with
    * ev_gap_fill. */
  val stGapFill: Spec = Spec(
    "st_gap_fill",
    oracle = Some(Events.gapFillOracleSql)) { (s, dir) =>
    Events.gapFillOverDayValues(
      StreamOps.dailySparseValues(s, dir, sink = "st_gapfill_mem"))
  }

  /** STATEFUL streaming path mining: last-TWO-events state per user,
    * so 3-step paths split across micro-batches at either position
    * still count ([[graft.streaming.StreamOps.pathTriplesFrom]]).
    * Shares [[Events.pathsOverTriples]] and the batch oracle with
    * ev_path_analysis. */
  val stPath: Spec = Spec(
    "st_path_analysis",
    oracle = Some(Events.pathOracleSql)) { (s, dir) =>
    import s.implicits._
    Events.pathsOverTriples(
      StreamOps.pathTriples(s, dir).select($"a", $"b", $"c"))
  }

  /** STREAMING MinHash near-dup: foreachBatch accumulates an LSH state
    * store and emits each batch's verified pairs vs prior state + in
    * batch ([[graft.streaming.StreamOps.minhashIncrementalStart]]).
    * Over the finite verify feed the accumulated pairs are EXACTLY the
    * one-shot dd_minhash_pairs set, so this shares its oracle verbatim;
    * the multi-batch state path (pairs split across arrivals) is pinned
    * by the MemoryStream twin in StreamingSpec. */
  /** STREAMING novelty ([[graft.streaming.StreamOps.noveltyStart]]):
    * per-batch scoring against the accumulated first-seen gram store.
    * Over a doc_id-ordered feed the accumulated scores equal the
    * one-shot d_novelty_scores, so this shares its oracle verbatim;
    * the multi-batch state path is pinned by the MemoryStream twin in
    * StreamingSpec. */
  val stNovelty: Spec = Spec(
    "st_novelty",
    oracle = Some(Dedup.noveltySql)) { (s, dir) =>
    import s.implicits._
    val outDir = graft.ops.Scratch.dir("graft_st_nov")
    val src = s.readStream.schema(StreamOps.documentsSchema)
      .option("pathGlobFilter", "documents.parquet").parquet(dir)
    StreamOps.noveltyBatches(s, src, "doc_id", "text", outDir)
      .select($"doc_id", $"n_grams", $"n_novel", $"novelty")
      .orderBy($"doc_id")
  }

  val stMinhashPairs: Spec = Spec(
    "st_minhash_pairs",
    oracle = Some(Dedup.minhashPairsSql)) { (s, dir) =>
    import s.implicits._
    val outDir = graft.ops.Scratch.dir("graft_st_mh")
    val src = s.readStream.schema(StreamOps.documentsSchema)
      .option("pathGlobFilter", "documents.parquet").parquet(dir)
    StreamOps.minhashPairsBatches(s, src, "doc_id", "text", outDir)
      .select($"id_a", $"id_b", $"jaccard")
      .orderBy($"id_a", $"id_b")
  }

  /** STREAMING rate-anomaly monitor: hourly counts accumulate in the
    * complete-mode tumbling aggregate ([[StreamOps.tumblingCounts]]),
    * and the shared z-score tail ([[Events.rateAnomalyOverCounts]])
    * runs batch-side over that bounded hours-scale table — the same
    * stream-head/batch-tail split as st_drift_windowed, sharing the
    * batch oracle verbatim. */
  val stRateAnomaly: Spec = Spec(
    "st_rate_anomaly",
    oracle = Some(Events.rateAnomalyOracleSql)) { (s, dir) =>
    import s.implicits._
    Events.rateAnomalyOverCounts(
      StreamOps.tumblingCounts(s, dir, sink = "st_rate_anom_mem")
        .select($"window_start", $"event_type", $"n_events"))
  }

  /** The closed-hour count CTE every append-mode monitor oracle shares:
    * hours whose END precedes the final watermark max(ts) − 1 h — the
    * st_tumbling_append emission predicate. */
  private val closedHourCountsCte = """mx AS (SELECT max(ts) AS m FROM events),
      hc AS (
        SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
               event_type, COUNT(*) AS n_events
        FROM events, mx
        WHERE date_trunc('hour', ts) + INTERVAL 1 HOUR <= m - INTERVAL 1 HOUR
        GROUP BY window_start, event_type)"""

  /** APPEND-mode rate-anomaly monitor — the unbounded-runtime twin of
    * [[stRateAnomaly]]: hourly counts come from the watermark-evicting
    * append aggregate ([[StreamOps.tumblingAppendFrom]] — each closed
    * hour emitted exactly once, state never holds more than the open
    * hours), and the shared z-score tail runs over that closed-hour
    * table. The monitor therefore never alerts on a PARTIAL hour (the
    * complete-mode twin's last rows can), at the cost of one hour of
    * watermark lag. Oracle: the batch z-score SQL over the closed-hour
    * prefix. Eviction + the anomaly emission are pinned on a
    * MemoryStream feed in StreamingSpec. */
  val stRateAnomalyAppend: Spec = Spec(
    "st_rate_anomaly_append",
    oracle = Some(Events.rateAnomalyOracleOver(closedHourCountsCte))) { (s, dir) =>
    import s.implicits._
    Events.rateAnomalyOverCounts(
      StreamOps.tumblingAppend(s, dir, sink = "st_rate_anom_app_mem")
        .select($"window_start", $"event_type", $"n_events"))
  }

  /** APPEND-mode seasonal decomposition — the unbounded-runtime twin of
    * [[stSeasonal]]: the same watermark-evicting append head (closed
    * hours only; state ≤ open hours) feeds the trend/seasonal/residual
    * batch tail. The decomposition means shift slightly vs the
    * complete-mode twin because open hours drop out — which is the
    * POINT: a residual computed against a partial last hour is exactly
    * the false alarm the append form exists to prevent. The oracle
    * replays the closed-hour prefix through the shared decomposition
    * SQL. NOTE the watermark rides max(ts) over ALL event types (the
    * stream aggregates every type; the error filter is downstream), so
    * the oracle's mx scans events unfiltered. */
  val stSeasonalAppend: Spec = Spec(
    "st_seasonal_append",
    oracle = Some(Events.seasonalOracleOver(
      """mx AS (SELECT max(ts) AS m FROM events),
      hc AS (SELECT event_type,
          strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
          COUNT(*) AS n
        FROM events, mx
        WHERE event_type = 'error'
          AND date_trunc('hour', ts) + INTERVAL 1 HOUR <= m - INTERVAL 1 HOUR
        GROUP BY 1, 2)"""))) { (s, dir) =>
    import s.implicits._
    Events.seasonalOverHourCounts(
      StreamOps.tumblingAppend(s, dir, sink = "st_seasonal_app_mem")
        .filter($"event_type" === "error")
        .select($"event_type", $"window_start", $"n_events".as("n"))
        // the decomposition tail self-joins this table (trend/seasonal/
        // grand-mean branches) — checkpoint the bounded statistic so the
        // MemoryPlan leaf becomes re-referenceable (the stSeasonal note)
        .localCheckpoint())
  }

  /** STREAMING incremental clustering: the file-stream twin of
    * dd_cc_incremental — per micro-batch LSH pairs merge into a
    * persisted labelling with touched-components-only re-solve
    * ([[StreamOps.clustersIncrementalStart]]); draining the corpus
    * must land on EXACTLY the one-shot batch clustering, which the
    * full-corpus recursive-CTE oracle states. */
  val stCcIncremental: Spec = Spec(
    "st_cc_incremental",
    oracle = Some(Dedup.minhashClustersSql)) { (s, dir) =>
    import s.implicits._
    val outDir = graft.ops.Scratch.dir("graft_st_cc")
    val src = s.readStream.schema(StreamOps.documentsSchema)
      .option("pathGlobFilter", "documents.parquet").parquet(dir)
    StreamOps.clusterBatches(s, src, "doc_id", "text", outDir)
      .groupBy($"component")
      .agg(count(lit(1)).as("cluster_size"), max($"id").as("max_id"))
      .orderBy($"component")
  }

  /** STREAMING funnel (first-touch-per-step): the stream keeps
    * per-(user, type) min event times — order-independent state, 3
    * longs per user — and the level computation (strict
    * view < click < purchase inside 24 h of first view) runs batch-side
    * over that bounded table. Different step semantics than the batch
    * [[Events.qFunnelWindowed]] (first click OVERALL must follow the
    * first view, not first-click-after-view) because streaming
    * correctness under out-of-order arrival demands order-independent
    * state; the oracle states these semantics directly. */
  val stFunnelLevels: Spec = Spec(
    "st_funnel_levels",
    oracle = Some("""
      WITH m AS (
        SELECT user_id,
          MIN(CASE WHEN event_type = 'view' THEN epoch_us(ts) END) AS tv,
          MIN(CASE WHEN event_type = 'click' THEN epoch_us(ts) END) AS tc,
          MIN(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) AS tp
        FROM events GROUP BY user_id),
      lv AS (
        SELECT user_id,
          CASE WHEN tc IS NOT NULL AND tp IS NOT NULL
                 AND tv < tc AND tc < tp AND tp - tv <= 86400000000 THEN 3
               WHEN tc IS NOT NULL AND tv < tc
                 AND tc - tv <= 86400000000 THEN 2
               ELSE 1 END AS level
        FROM m WHERE tv IS NOT NULL)
      SELECT CAST(level AS BIGINT) AS level, COUNT(*) AS n_users
      FROM lv GROUP BY level ORDER BY level""")) { (s, dir) =>
    import s.implicits._
    val windowUs = 86400000000L
    val mins = StreamOps.funnelMins(s, dir, "st_funnel_mem")
    val m = mins.groupBy($"user_id")
      .pivot("event_type", Seq("view", "click", "purchase"))
      .agg(first($"min_tus"))
      .withColumnRenamed("view", "tv")
      .withColumnRenamed("click", "tc")
      .withColumnRenamed("purchase", "tp")
    m.filter($"tv".isNotNull)
      .select(
        when($"tc".isNotNull && $"tp".isNotNull &&
            $"tv" < $"tc" && $"tc" < $"tp" && $"tp" - $"tv" <= windowUs, 3)
          .when($"tc".isNotNull && $"tv" < $"tc" &&
            $"tc" - $"tv" <= windowUs, 2)
          .otherwise(1).cast("long").as("level"))
      .groupBy($"level")
      .agg(count(lit(1)).as("n_users"))
      .orderBy($"level")
  }

  /** STREAMING BM25 index maintenance: documents stream through
    * foreachBatch, which appends per-document tf/dl partials (pure
    * partition appends — per-doc facts never merge); df and corpus
    * scalars are re-derived from the accumulated index at query time.
    * Scoring reads ONLY index tables via the same
    * [[Retrieval.scoreIndex]] tail as the batch queries, and the result
    * over the finite feed equals the one-shot ranking — the oracle is
    * d_bm25_topk's verbatim. */
  val stBm25Indexed: Spec = Spec(
    "st_bm25_indexed",
    oracle = Retrieval.dBm25TopK.oracle) { (s, dir) =>
    val indexDir = graft.ops.Scratch.dir("graft_st_bm25")
    val src = s.readStream.schema(StreamOps.documentsSchema)
      .option("pathGlobFilter", "documents.parquet").parquet(dir)
    val q = StreamOps.bm25IndexStart(s, src, "doc_id", "text", indexDir)
    try q.processAllAvailable()
    finally q.stop()
    val (tf, dl, df, stats) = StreamOps.bm25IndexFrames(s, indexDir)
    Retrieval.scoreIndex(s, tf, dl, df, stats)
  }

  /** Streaming as-of enrich — the stateful twin of `ev_asof_last_click`
    * (same oracle SQL verbatim): one long of state per user, in-batch
    * replay sorted by the batch window's exact sort key, ordered-feed
    * contract across batches (StreamingSpec pins a two-batch
    * MemoryStream split). */
  val stAsofLastClick: Spec = Spec(
    "st_asof_last_click",
    oracle = Some("""
      SELECT p.event_id, p.user_id, MAX(epoch_us(c.ts)) AS last_click_us
      FROM events p
      LEFT JOIN events c
        ON c.user_id = p.user_id AND c.event_type = 'click'
          AND epoch_us(c.ts) <= epoch_us(p.ts)
      WHERE p.event_type = 'purchase'
      GROUP BY p.event_id, p.user_id
      ORDER BY p.event_id""")) { (s, dir) =>
    StreamOps.asofLastClick(s, dir)
  }

  /** STREAMING source-NSFW rollup — the crawl-curation blocklist
    * report maintained live over the document feed: the stream's only
    * state is the |sources|-bounded aggregate (complete mode), the
    * plan is shared verbatim with the batch d_source_nsfw_rollup via
    * [[Lexical.sourceRollupFrom]], and over the finite feed the final
    * table equals the batch answer — so the oracle IS the batch SQL. */
  val stNsfwRollup: Spec = Spec(
    "st_nsfw_rollup",
    oracle = Some(Lexical.sourceRollupOracle)) { (s, dir) =>
    StreamOps.docsAggStream(s, dir, Lexical.sourceRollupFrom,
      "st_nsfw_rollup_mem")
      .orderBy(org.apache.spark.sql.functions.col("source"))
  }

  /** STREAMING incremental DBSCAN over the embedding feed: points are
    * integer grid projections of the first two embedding coordinates
    * (exact float→double widening then one multiply-add and a floor —
    * bit-identical in both engines), each micro-batch folds into the
    * persisted clustering halo-locally
    * ([[graft.streaming.StreamOps.dbscanStart]]), and monotone growth
    * makes the drained result equal the one-shot solve — so the batch
    * brute-force oracle states the streamed answer exactly. */
  val stDbscan: Spec = Spec(
    "st_dbscan",
    oracle = Some("""
      WITH RECURSIVE feats AS (
        SELECT vec_id AS id,
          CAST(floor(CAST(embedding[1] AS DOUBLE) * 60 + 100) AS BIGINT)
            AS x,
          CAST(floor(CAST(embedding[2] AS DOUBLE) * 60 + 100) AS BIGINT)
            AS y
        FROM embeddings),
      nbrs AS (
        SELECT a.id AS ua, b.id AS ub
        FROM feats a JOIN feats b ON a.id <> b.id
          AND abs(a.x - b.x) <= 1 AND abs(a.y - b.y) <= 1),
      deg AS (
        SELECT f.id, COUNT(n.ub) AS nn
        FROM feats f LEFT JOIN nbrs n ON n.ua = f.id GROUP BY f.id),
      core AS (SELECT id FROM deg WHERE nn + 1 >= 5),
      cedges AS (
        SELECT n.ua AS src, n.ub AS dst FROM nbrs n
        JOIN core ca ON ca.id = n.ua JOIN core cb ON cb.id = n.ub),
      walk(id, comp) AS (
        SELECT id, id FROM core
        UNION
        SELECT e.dst, w.comp FROM walk w JOIN cedges e ON e.src = w.id),
      labels AS (SELECT id, MIN(comp) AS cluster FROM walk GROUP BY id),
      assigned AS (
        SELECT f.id,
          COALESCE(l.cluster,
            (SELECT MIN(l2.cluster) FROM nbrs n
             JOIN labels l2 ON l2.id = n.ub WHERE n.ua = f.id),
            -1) AS cluster,
          (l.cluster IS NOT NULL) AS is_core
        FROM feats f LEFT JOIN labels l ON l.id = f.id)
      SELECT cluster, COUNT(*)::BIGINT AS size,
        SUM(CASE WHEN is_core THEN 1 ELSE 0 END)::BIGINT AS n_core,
        MIN(id) AS min_vec, MAX(id) AS max_vec
      FROM assigned GROUP BY cluster ORDER BY cluster""")) { (s, dir) =>
    import s.implicits._
    val outDir = graft.ops.Scratch.dir("graft_st_dbscan")
    val src = s.readStream.schema(StreamOps.embeddingsSchema)
      .option("pathGlobFilter", "embeddings.parquet").parquet(dir)
    val pts = src.select($"vec_id".as("id"),
      floor(element_at($"embedding", 1).cast("double") * 60 + 100)
        .cast("long").as("x"),
      floor(element_at($"embedding", 2).cast("double") * 60 + 100)
        .cast("long").as("y"))
    StreamOps.dbscanBatches(s, pts, eps = 1L, minPts = 5L, outDir)
      .groupBy($"cluster")
      .agg(count(lit(1)).as("size"),
        sum(when($"is_core", 1L).otherwise(0L)).as("n_core"),
        min($"id").as("min_vec"), max($"id").as("max_vec"))
      .orderBy($"cluster")
  }

  /** STREAMING ANN serving — the similarity family's streaming twin
    * (every other heavy family has one; vectors didn't): an unbounded
    * stream of query embeddings answered per micro-batch against a
    * STATIC corpus via the per-partition HNSW index
    * ([[graft.streaming.StreamOps.knnServeBatches]]). No streaming
    * state at all — the corpus is the state, fixed outside the stream;
    * per-batch answers land in idempotent overwrite dirs. The oracle
    * is brute-force truth: at verify scale the HNSW beam is
    * exhaustive-exact per partition (see e_knn_hnsw), so the served
    * answers must hash-match the exact top-5. */
  val stKnnHnsw: Spec = Spec(
    "st_knn_hnsw",
    oracle = Some(s"""
      WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 40 = 21),
      scored AS (
        SELECT q.vec_id AS qid, c.vec_id AS cid,
          ${Similarity.cosSql("q.embedding", "c.embedding")} AS cos
        FROM q JOIN embeddings c ON c.vec_id <> q.vec_id),
      r AS (SELECT qid, cid, cos,
        CAST(row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS BIGINT) AS rk
        FROM scored)
      SELECT qid, rk, cid, ROUND(cos, 6) AS cos_sim
      FROM r WHERE rk <= 5 ORDER BY qid, rk""")) { (s, dir) =>
    import s.implicits._
    val outDir = graft.ops.Scratch.dir("graft_st_knn")
    val src = s.readStream.schema(StreamOps.embeddingsSchema)
      .option("pathGlobFilter", "embeddings.parquet").parquet(dir)
      .filter($"vec_id" % 40 === 21)
      .select($"vec_id".as("id"), $"embedding".as("vec"))
    val corpus = Tables.load(s, dir, "embeddings")
      .select($"vec_id".as("id"), $"embedding".as("vec"))
    StreamOps.knnServeBatches(s, src, corpus, 5, outDir)
      .select($"qid", $"rk", $"cid", round($"cos_sim", 6).as("cos_sim"))
      .orderBy($"qid", $"rk")
  }

  /** STREAMING media-ingest quarantine — the crawl front door for
    * binary payloads: documents arrive as an unbounded feed, each
    * micro-batch's blobs flow through the SAME
    * [[graft.ops.Multimodal.robustDecodeHash]] as the batch path
    * (completeness gate → decode → EXIF normalization), and the
    * rollup counts clean vs quarantined rows by reason. Stateless
    * per-row decode + a status/reason-bounded aggregate (≤ a handful
    * of groups), so state never grows with corpus. The oracle restates
    * the four-byte-class contract (mm_jpeg_robust) in id arithmetic —
    * the stream must land on exactly the batch outcome counts. */
  val stMediaQuarantine: Spec = Spec(
    "st_media_quarantine",
    oracle = Some("""
      SELECT status, reason, CAST(COUNT(*) AS BIGINT) AS n_docs
      FROM (
        SELECT
          CASE WHEN (doc_id // 20) % 5 IN (3, 4) THEN 'quarantined'
               ELSE 'ok' END AS status,
          CASE WHEN (doc_id // 20) % 5 = 3 THEN 'undecodable'
               WHEN (doc_id // 20) % 5 = 4 THEN 'truncated'
               ELSE 'decoded' END AS reason
        FROM documents WHERE doc_id % 20 = 10)
      GROUP BY status, reason ORDER BY status, reason""")) { (s, dir) =>
    import s.implicits._
    StreamOps.docsAggStream(s, dir, src => {
      val ids = src.filter($"doc_id" % 20 === 10)
        .select($"doc_id").as[java.lang.Long]
      graft.ops.Multimodal.robustDecodeHash(
        graft.ops.Multimodal.syntheticRobustJpegBlobs(ids)).toDF()
        .groupBy($"status", $"reason").agg(count(lit(1)).as("n_docs"))
    }, "st_media_quarantine_mem")
      .orderBy($"status", $"reason")
  }

  val specs: Seq[Spec] = Seq(stTumbling, stTumblingAppend, stSliding,
    stMediaQuarantine,
    stKnnHnsw,
    stDedup, stSessions, stSessionAppend,
    stEnrich, stClickView, stClickViewOuter, dLid, dLidScript,
    dLidConfusion, dLidKappa, pipelineE2e, pipelineE2eDom,
    stDocFlags, stHeavyHitters, stDriftWindowed, stLidScript,
    stMinhashPairs, stFunnelLevels, stBm25Indexed, stCmsCounts, stNovelty,
    stAsofLastClick, stCcIncremental, stRateAnomaly, stKsWindowed,
    stKsCountsAppend, stMarkov, stRateAnomalyAppend, stSeasonalAppend,
    stSeasonal, stPath, stNsfwRollup, stEntryExit, stAttribution,
    stQualityMonitor, stAttributionDecay, stCusum, stLjungBox,
    stGrangerPairs, stPacfDaily, stGapFill, stDbscan,
    stHoltForecast, stAmsF2, stTdigest, stBurstViterbi, stHoltWinters,
    stHllUsers, stMannKendall, stCorpusChecksum, stNeymanAllocation,
    stEwmaControl, stBinseg, stHits, stForecastBacktest, stAnomalyEnsemble)
}
