package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Event-stream operators over the `events` table (batch form; the
  * streaming twins live in graft.streaming): tumbling windows,
  * sessionization with an inactivity gap, as-of (latest prior event)
  * join, and a per-user funnel pivot.
  *
  * Every operator works on `ts` as raw nanos-since-epoch (long) and does
  * exact integer time arithmetic — cheaper than timestamps (pure long
  * comparisons, fully codegen'd) and immune to truncation mismatches vs
  * the oracle. [[load]] normalizes whatever the parquet carries
  * (TIMESTAMP(NANOS) via `nanosAsLong`, or plain micros timestamps) to
  * that contract, so the query bodies are storage-schema-independent.
  *
  * Scale: every operator here is a single window or hash-agg partitioned
  * by `user_id` / calendar bucket — state per key is O(session), nothing
  * global. The as-of join is the union+window trick: O(n log n) per user
  * partition instead of a quadratic range join.
  */
object Events {

  /** Normalize a `ts` column of any supported storage type to
    * nanos-since-epoch long — the single time contract every events
    * operator (batch and streaming) computes on. Timestamp-typed input
    * converts via a tz-independent MICROSECOND diff from the epoch
    * (NTZ wall-clock and the oracle's naive parquet timestamps agree by
    * construction); long input (a TIMESTAMP(NANOS) file read with
    * `spark.sql.legacy.parquet.nanosAsLong=true`) passes through. */
  def tsToNanos(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    df.schema("ts").dataType match {
      case LongType => df
      case TimestampNTZType => df.withColumn("ts",
        expr("timestampdiff(MICROSECOND, TIMESTAMP_NTZ'1970-01-01 00:00:00', ts) * 1000"))
      case TimestampType =>
        // unix_micros on a naive parquet timestamp is only oracle-equal
        // when the wall clock was interpreted as UTC at read time —
        // assert the precondition instead of silently shifting
        require(df.sparkSession.conf.get("spark.sql.session.timeZone") == "UTC",
          "events.ts read as TIMESTAMP requires spark.sql.session.timeZone=UTC " +
            "(naive parquet micros must be interpreted as UTC wall clock)")
        df.withColumn("ts", unix_micros(col("ts")) * 1000)
      case other => throw new IllegalArgumentException(
        s"events.ts has unsupported type $other (expected long nanos or a timestamp)")
    }
  }

  /** Events with `ts` normalized to nanos-since-epoch long (see
    * [[tsToNanos]]). */
  def load(s: SparkSession, dir: String): DataFrame =
    tsToNanos(s.read.parquet(s"$dir/events.parquet"))

  /** Tumbling 1-hour windows per event type. */
  val qTumbling: Spec = Spec(
    "ev_tumbling_hourly",
    oracle = Some("""
      SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
             event_type, COUNT(*) AS n_events,
             CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
      FROM events
      GROUP BY window_start, event_type
      ORDER BY window_start, event_type"""),
    bench = true) { (s, dir) =>
    import s.implicits._
    val hourNs = 3600L * 1000 * 1000 * 1000
    load(s, dir)
      .withColumn("window_start",
        date_format(timestamp_micros(expr(s"(ts - ts % $hourNs) div 1000")),
          "yyyy-MM-dd HH:mm:ss"))
      .groupBy($"window_start", $"event_type")
      .agg(count(lit(1)).as("n_events"),
        sum($"value".cast("decimal(18,6)")).cast("double").as("total_value"))
      .orderBy($"window_start", $"event_type")
  }

  /** Sessionization: 30-minute inactivity gap, assembled with two windows
    * (lag → session-break flags → running sum = session id). All time
    * arithmetic in micros on both sides (DuckDB reads the nanos parquet
    * at micros precision). */
  val qSessionize: Spec = Spec(
    "ev_sessionize",
    oracle = Some("""
      WITH m AS (
        SELECT user_id, event_id, epoch_us(ts) AS ts_us,
          CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                 OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
               THEN 1 ELSE 0 END AS brk
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)),
      sessed AS (
        SELECT user_id, event_id, ts_us,
          CAST(SUM(brk) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        FROM m)
      SELECT user_id, session_id, COUNT(*) AS n_events,
        strftime(make_timestamp(MIN(ts_us)), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
        strftime(make_timestamp(MAX(ts_us)), '%Y-%m-%d %H:%M:%S.%f') AS session_end
      FROM sessed GROUP BY user_id, session_id
      ORDER BY user_id, session_id"""),
    bench = true) { (s, dir) =>
    import s.implicits._
    val gapUs = 1800L * 1000 * 1000
    val w = Window.partitionBy($"user_id").orderBy($"ts_us", $"event_id")
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    load(s, dir)
      .withColumn("ts_us", expr("ts div 1000"))
      .withColumn("brk",
        when(lag($"ts_us", 1).over(w).isNull ||
          $"ts_us" - lag($"ts_us", 1).over(w) > gapUs, 1).otherwise(0))
      .withColumn("session_id", sum($"brk").over(run).cast("long"))
      .groupBy($"user_id", $"session_id")
      .agg(count(lit(1)).as("n_events"),
        date_format(timestamp_micros(min($"ts_us")), Spec.SparkTsFmt)
          .as("session_start"),
        date_format(timestamp_micros(max($"ts_us")), Spec.SparkTsFmt)
          .as("session_end"))
      .orderBy($"user_id", $"session_id")
  }

  /** [[qSessionize]]'s idiom RIDING
    * [[graft.plans.SessionizeToSessionWindow]]: the body writes the
    * exact lag → gap-flag → running-sum → groupBy shape users
    * hand-write (plus the non-null ts guard the rule requires to keep
    * null-row semantics provably equal), installs the rule via the
    * scoped [[graft.plans.RuleScope]], and REQUIREs the plan became a
    * native session-window aggregate (grouping attribute carrying
    * `SessionWindow.marker`, physical `MergingSessions`) before
    * returning — so the green driver row proves the rewrite fired AND
    * preserved semantics against the window-form oracle. The rewrite
    * drops both event-wide window passes and the event-wide hash
    * aggregate; sessions merge inline in the sorted scan and the
    * ordinal ids come from a row_number over SESSIONS (output
    * cardinality). */
  val qSessionizeRewritten: Spec = Spec(
    "ev_sessionize_rewritten",
    oracle = Some("""
      WITH e AS (
        SELECT user_id, event_id, epoch_us(ts) AS ts_us FROM events
        WHERE ts IS NOT NULL),
      m AS (
        SELECT user_id, event_id, ts_us,
          CASE WHEN lag(ts_us) OVER w IS NULL
                 OR ts_us - lag(ts_us) OVER w > 1800000000
               THEN 1 ELSE 0 END AS brk
        FROM e
        WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
      sessed AS (
        SELECT user_id, event_id, ts_us,
          CAST(SUM(brk) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        FROM m)
      SELECT user_id, session_id, COUNT(*) AS n_events,
        strftime(make_timestamp(MIN(ts_us)), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
        strftime(make_timestamp(MAX(ts_us)), '%Y-%m-%d %H:%M:%S.%f') AS session_end
      FROM sessed GROUP BY user_id, session_id
      ORDER BY user_id, session_id""")) { (s, dir) =>
    import s.implicits._
    graft.plans.RuleScope.withRules(s,
        Seq(graft.plans.SessionizeToSessionWindow)) {
      val gapUs = 1800L * 1000 * 1000
      val w = Window.partitionBy($"user_id").orderBy($"ts_us", $"event_id")
      val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val df = load(s, dir)
        .withColumn("ts_us", expr("ts div 1000"))
        .filter($"ts_us".isNotNull)
        .withColumn("brk",
          when(lag($"ts_us", 1).over(w).isNull ||
            $"ts_us" - lag($"ts_us", 1).over(w) > gapUs, 1).otherwise(0))
        .withColumn("session_id", sum($"brk").over(run).cast("long"))
        .groupBy($"user_id", $"session_id")
        .agg(count(lit(1)).as("n_events"),
          date_format(timestamp_micros(min($"ts_us")), Spec.SparkTsFmt)
            .as("session_start"),
          date_format(timestamp_micros(max($"ts_us")), Spec.SparkTsFmt)
            .as("session_end"))
        .orderBy($"user_id", $"session_id")
      require(df.queryExecution.optimizedPlan.collect {
          case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate
              if a.groupingExpressions.exists {
                case att: org.apache.spark.sql.catalyst.expressions.Attribute =>
                  att.metadata.contains(org.apache.spark.sql.catalyst
                    .expressions.SessionWindow.marker)
                case _ => false
              } => a
        }.nonEmpty,
        "SessionizeToSessionWindow did not fire on the sessionize idiom")
      df
    }
  }

  /** As-of join: each purchase paired with the user's latest prior (or
    * simultaneous) click. Implemented as one sorted window over the
    * unioned event kinds — sort key puts clicks before purchases at
    * equal ts so "or equal" resolves like the oracle's `c.ts <= p.ts`. */
  val qAsofClick: Spec = Spec(
    "ev_asof_last_click",
    oracle = Some("""
      SELECT p.event_id, p.user_id, MAX(epoch_us(c.ts)) AS last_click_us
      FROM events p
      LEFT JOIN events c
        ON c.user_id = p.user_id AND c.event_type = 'click'
          AND epoch_us(c.ts) <= epoch_us(p.ts)
      WHERE p.event_type = 'purchase'
      GROUP BY p.event_id, p.user_id
      ORDER BY p.event_id""")) { (s, dir) =>
    import s.implicits._
    val w = Window.partitionBy($"user_id")
      .orderBy($"ts_us",
        when($"event_type" === "click", 0).otherwise(1), $"event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    load(s, dir)
      .filter($"event_type".isin("click", "purchase"))
      .withColumn("ts_us", expr("ts div 1000"))
      .withColumn("last_click_us",
        last(when($"event_type" === "click", $"ts_us"), ignoreNulls = true).over(w))
      .filter($"event_type" === "purchase")
      .select($"event_id", $"user_id", $"last_click_us")
      .orderBy($"event_id")
  }

  /** As-of join WITH TOLERANCE: last click within 10 minutes before
    * each purchase, else a -1 sentinel (null-free output keeps the
    * hash compare engine-agnostic). The oracle states the semantics
    * independently via DuckDB's native ASOF LEFT JOIN + gap filter —
    * not a transliteration of the window plan. */
  val qAsofTolerance: Spec = Spec(
    "ev_asof_click_tolerance",
    oracle = Some("""
      WITH p AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us
                 FROM events WHERE event_type = 'purchase'),
      c AS (SELECT user_id, epoch_us(ts) AS ts_us
            FROM events WHERE event_type = 'click')
      SELECT p.event_id, p.user_id,
        COALESCE(CASE WHEN p.ts_us - c.ts_us <= 600000000 THEN c.ts_us END, -1)
          AS last_click_us
      FROM p ASOF LEFT JOIN c
        ON c.user_id = p.user_id AND c.ts_us <= p.ts_us
      ORDER BY event_id""")) { (s, dir) =>
    import s.implicits._
    val w = Window.partitionBy($"user_id")
      .orderBy($"ts_us",
        when($"event_type" === "click", 0).otherwise(1), $"event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    load(s, dir)
      .filter($"event_type".isin("click", "purchase"))
      .withColumn("ts_us", expr("ts div 1000"))
      .withColumn("last_click_us",
        last(when($"event_type" === "click", $"ts_us"), ignoreNulls = true).over(w))
      .filter($"event_type" === "purchase")
      .select($"event_id", $"user_id",
        coalesce(
          when($"ts_us" - $"last_click_us" <= 600000000L, $"last_click_us"),
          lit(-1L)).as("last_click_us"))
      .orderBy($"event_id")
  }

  /** Per-user funnel pivot with fixed event-type columns. */
  val qFunnel: Spec = Spec(
    "ev_user_funnel",
    oracle = Some("""
      SELECT user_id,
        COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS view,
        COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS click,
        COUNT(CASE WHEN event_type = 'signup' THEN 1 END) AS signup,
        COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
        COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS error,
        CAST(COALESCE(SUM(CASE WHEN event_type = 'purchase'
          THEN CAST(value AS DECIMAL(18,6)) END), 0) AS DOUBLE) AS purchase_value
      FROM events GROUP BY user_id ORDER BY user_id""")) { (s, dir) =>
    import s.implicits._
    load(s, dir)
      .groupBy($"user_id")
      .pivot("event_type", Seq("view", "click", "signup", "purchase", "error"))
      .agg(count(lit(1)))
      .na.fill(0, Seq("view", "click", "signup", "purchase", "error"))
      .join(
        load(s, dir).groupBy($"user_id")
          .agg(coalesce(
            sum(when($"event_type" === "purchase", $"value").cast("decimal(18,6)")),
            lit(0).cast("decimal(18,6)")).cast("double").as("purchase_value")),
        Seq("user_id"))
      .orderBy($"user_id")
  }

  /** Semi-structured JSON extraction from the props payload column. */
  val qPropsJson: Spec = Spec(
    "ev_props_json",
    oracle = Some("""
      SELECT event_type,
        CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        CAST(MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k,
        COUNT(*) AS n
      FROM events GROUP BY event_type ORDER BY event_type""")) { (s, dir) =>
    import s.implicits._
    load(s, dir)
      .select($"event_type",
        get_json_object($"props", "$.k").cast("long").as("k"))
      .groupBy($"event_type")
      .agg(sum($"k").as("sum_k"), max($"k").as("max_k"),
        count(lit(1)).as("n"))
      .orderBy($"event_type")
  }

  /** Sliding windows (1h length, 15min slide): every event lands in
    * exactly 4 windows; Spark's window() generator vs an explicit
    * shift-and-replicate oracle. */
  val qSliding: Spec = Spec(
    "ev_sliding_windows",
    oracle = Some("""
      SELECT strftime(time_bucket(INTERVAL '15 minutes', ts)
               - i * INTERVAL '15 minutes', '%Y-%m-%d %H:%M:%S') AS window_start,
             event_type, COUNT(*) AS n_events
      FROM events CROSS JOIN unnest(range(0, 4)) AS t(i)
      GROUP BY window_start, event_type
      ORDER BY window_start, event_type""")) { (s, dir) =>
    import s.implicits._
    load(s, dir)
      .withColumn("ts_utc", timestamp_micros(expr("ts div 1000")))
      .groupBy(
        window($"ts_utc", "1 hour", "15 minutes"),
        $"event_type")
      .agg(count(lit(1)).as("n_events"))
      .select(
        date_format($"window.start", "yyyy-MM-dd HH:mm:ss").as("window_start"),
        $"event_type", $"n_events")
      .orderBy($"window_start", $"event_type")
  }

  /** AMS "tug-of-war" second-moment sketch (Alon, Matias & Szegedy '96)
    * of the user-frequency vector, MEDIAN-OF-MEANS form (the paper's
    * high-probability construction — the median of raw Z² would sit at
    * the χ²₁ median, ~0.455·F2): 60 estimators Z_i = Σ_events
    * sign_i(user), signs = 60 BITS of one md5 per event (the
    * replayable-hash discipline the LSH family uses; one hash yields
    * all estimators), est = median over 5 groups of mean(Z², 12 per
    * group), beside the exact F2 = Σ_u f(u)² for comparison. F2 is the
    * self-join size — THE statistic a planner wants before joining a
    * stream on a skewed key — and the sketch computes it in ONE pass
    * with 60 counters, no per-user grouping, mergeable across
    * partitions by plain addition (map-side partial sums).
    * Deterministic signs ⇒ exact oracle, not a bounds gate.
    *
    * The counter aggregation is exposed as [[amsBitSumsAgg]] /
    * [[amsOverBitSums]] so the streaming twin (st_ams_f2) can maintain
    * the same 61 counters as a complete-mode streaming aggregate (ONE
    * state row — the sketch IS the state bound) and run the estimate
    * as a batch view over it. */
  def amsBitSumsAgg(ev: DataFrame): DataFrame = {
    val hashed = ev.select(
      md5(concat(lit("ams_"), col("user_id").cast("string"))).as("h"))
    // bit i of the md5 hex: hex char i/4 (1-based substr), bit 3-i%4
    def bit(i: Int) =
      shiftright(conv(substring(col("h"), i / 4 + 1, 1), 16, 10).cast("int"),
        3 - i % 4).bitwiseAND(1)
    val bitSums = count(lit(1)).as("n") +:
      (0 until 60).map(i => sum(bit(i)).cast("long").as(s"b$i"))
    hashed.agg(bitSums.head, bitSums.tail: _*)
  }

  def amsOverBitSums(bs: DataFrame, ev: DataFrame): DataFrame = {
    val groupMeans = (0 until 5).map(j =>
      expr(s"(${(0 until 12).map(i =>
        s"((2*b${j * 12 + i} - n)*(2*b${j * 12 + i} - n))").mkString(" + ")
      }) div 12").as(s"g$j"))
    val est = bs.select(groupMeans: _*)
      .select(element_at(sort_array(array((0 until 5).map(j =>
        col(s"g$j")): _*)), 3).as("est_f2"))
    val ex = ev.groupBy(col("user_id")).agg(count(lit(1)).as("c"))
      .agg(sum(col("c") * col("c")).cast("long").as("exact_f2"),
        count(lit(1)).as("n_users"))
    est.crossJoin(broadcast(ex))
  }

  val amsOracleSql: String = {
    def bitSql(i: Int) =
      s"""((CAST('0x' || substr(h, ${i / 4 + 1}, 1) AS INT) >> ${3 - i % 4}) & 1)"""
    val bitSums = (0 until 60).map(i =>
      s"CAST(SUM(${bitSql(i)}) AS BIGINT) AS b$i").mkString(", ")
    val zs = (0 until 60).map(i => s"(2*b$i - n)*(2*b$i - n)")
    val groups = zs.grouped(12).zipWithIndex.map { case (g, j) =>
      s"(${g.mkString(" + ")}) // 12 AS g$j" }.mkString(", ")
    s"""
      WITH e AS (SELECT md5('ams_' || user_id::VARCHAR) AS h FROM events),
      bs AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, $bitSums FROM e),
      gm AS (SELECT $groups FROM bs),
      med AS (SELECT gv AS est FROM (
          SELECT gv, row_number() OVER (ORDER BY gv) AS rn
          FROM (SELECT unnest([g0, g1, g2, g3, g4]) AS gv FROM gm))
        WHERE rn = 3),
      ex AS (SELECT CAST(SUM(c * c) AS BIGINT) AS exact_f2,
          CAST(COUNT(*) AS BIGINT) AS n_users
        FROM (SELECT COUNT(*) AS c FROM events GROUP BY user_id))
      SELECT CAST(med.est AS BIGINT) AS est_f2, ex.exact_f2, ex.n_users
      FROM med CROSS JOIN ex"""
  }

  val qAmsF2: Spec = Spec(
    "ev_ams_f2",
    oracle = Some(amsOracleSql)) { (s, dir) =>
    amsOverBitSums(amsBitSumsAgg(load(s, dir)), load(s, dir))
  }

  /** Pearson χ² test of independence between event type and weekday —
    * the categorical drift test beside the numeric ones (KS, PSI,
    * Mann-Whitney): does the type mix move with the day of week? All
    * observed/expected products stay in BIGINT ((O·T − R·C)² computed
    * in double after one exact integer subtraction), each cell's
    * contribution is rounded to 6dp DECIMAL so the cell sum is
    * aggregation-order-free, and the full R×C grid (including any
    * zero-observed cell) is materialized from the margins — χ² is
    * wrong without the empty cells. One hash agg + two margin aggs +
    * a broadcast grid join; nothing per-event after the first count. */
  val qChi2Weekday: Spec = Spec(
    "ev_chi2_weekday",
    oracle = Some("""
      WITH o AS (SELECT event_type,
          (CAST(FLOOR(epoch_us(ts) / 86400000000) AS BIGINT) + 4) % 7 AS dow,
          CAST(COUNT(*) AS BIGINT) AS o
        FROM events GROUP BY 1, 2),
      r AS (SELECT event_type, CAST(SUM(o) AS BIGINT) AS r FROM o GROUP BY 1),
      c AS (SELECT dow, CAST(SUM(o) AS BIGINT) AS c FROM o GROUP BY 1),
      t AS (SELECT CAST(SUM(o) AS BIGINT) AS t FROM o),
      grid AS (SELECT r.event_type, c.dow, r.r, c.c,
          COALESCE(o.o, 0) AS o
        FROM r CROSS JOIN c LEFT JOIN o
          ON o.event_type = r.event_type AND o.dow = c.dow),
      cells AS (SELECT
          CAST(round(CAST(g.o * t.t - g.r * g.c AS DOUBLE)
              * CAST(g.o * t.t - g.r * g.c AS DOUBLE)
            / (CAST(t.t AS DOUBLE) * g.r * g.c), 6) AS DECIMAL(18,6))
            AS contrib
        FROM grid g CROSS JOIN t),
      dims AS (SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM r) AS nr,
          (SELECT CAST(COUNT(*) AS BIGINT) FROM c) AS nc)
      SELECT CAST(SUM(contrib) AS DOUBLE) AS chi2,
        (nr - 1) * (nc - 1) AS dof,
        (SELECT t FROM t) AS n
      FROM cells CROSS JOIN dims GROUP BY nr, nc""")) { (s, dir) =>
    import s.implicits._
    val o = load(s, dir)
      .select($"event_type",
        ((($"ts" / lit(dayNs)).cast("long") + 4) % 7).as("dow"))
      .groupBy($"event_type", $"dow").agg(count(lit(1)).as("o"))
      .localCheckpoint() // margins + grid share one count pass
    val r = o.groupBy($"event_type").agg(sum($"o").cast("long").as("r"))
    val c = o.groupBy($"dow").agg(sum($"o").cast("long").as("c"))
    val t = broadcast(o.agg(sum($"o").cast("long").as("t")))
    val grid = r.crossJoin(broadcast(c))
      .join(o, Seq("event_type", "dow"), "left")
      .withColumn("o", coalesce($"o", lit(0L)))
      .crossJoin(t)
    val diff = ($"o" * $"t" - $"r" * $"c").cast("double")
    val cells = grid.select(
      round(diff * diff / ($"t".cast("double") * $"r" * $"c"), 6)
        .cast("decimal(18,6)").as("contrib"))
    val dims = broadcast(r.agg(count(lit(1)).as("nr")))
      .crossJoin(broadcast(c.agg(count(lit(1)).as("nc"))))
    cells.agg(sum($"contrib").cast("double").as("chi2"))
      .crossJoin(dims).crossJoin(t)
      .select($"chi2", (($"nr" - 1) * ($"nc" - 1)).as("dof"),
        $"t".as("n"))
  }

  /** DISTINCT users per sliding window (1h length, 15min slide) — the
    * harder sibling of [[qSliding]]'s counts: COUNT(DISTINCT) cannot
    * map-side-combine as a plain sum, so Spark expands it to the
    * two-phase (window, user) partial-dedup then per-window count —
    * state per window stays |distinct users|, never |events|, and the
    * 4× window replication is a constant factor. The audience metric
    * (concurrent reach) every rate monitor wants next to raw counts. */
  val qSlidingDistinct: Spec = Spec(
    "ev_sliding_distinct",
    oracle = Some("""
      SELECT strftime(time_bucket(INTERVAL '15 minutes', ts)
               - i * INTERVAL '15 minutes', '%Y-%m-%d %H:%M:%S') AS window_start,
             COUNT(DISTINCT user_id) AS n_users, COUNT(*) AS n_events
      FROM events CROSS JOIN unnest(range(0, 4)) AS t(i)
      GROUP BY window_start
      ORDER BY window_start""")) { (s, dir) =>
    import s.implicits._
    load(s, dir)
      .withColumn("ts_utc", timestamp_micros(expr("ts div 1000")))
      .groupBy(window($"ts_utc", "1 hour", "15 minutes"))
      .agg(countDistinct($"user_id").as("n_users"),
        count(lit(1)).as("n_events"))
      .select(
        date_format($"window.start", "yyyy-MM-dd HH:mm:ss").as("window_start"),
        $"n_users", $"n_events")
      .orderBy($"window_start")
  }

  /** Native session windows (session_window built-in) — must equal the
    * manual lag/cumsum sessionization: start = min ts, end = max ts +
    * the 30-minute gap. */
  val qSessionWindowNative: Spec = Spec(
    "ev_session_window_native",
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
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        FROM m)
      SELECT user_id,
        strftime(make_timestamp(MIN(ts_us)), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
        strftime(make_timestamp(MAX(ts_us) + 1800000000), '%Y-%m-%d %H:%M:%S.%f') AS session_end,
        COUNT(*) AS n_events
      FROM sessed GROUP BY user_id, sid
      ORDER BY user_id, session_start""")) { (s, dir) =>
    import s.implicits._
    load(s, dir)
      .withColumn("ts_utc", timestamp_micros(expr("ts div 1000")))
      .groupBy(session_window($"ts_utc", "30 minutes"), $"user_id")
      .agg(count(lit(1)).as("n_events"))
      .select($"user_id",
        date_format($"session_window.start", Spec.SparkTsFmt).as("session_start"),
        date_format($"session_window.end", Spec.SparkTsFmt).as("session_end"),
        $"n_events")
      .orderBy($"user_id", $"session_start")
  }

  /** Range-frame rate counting: events per user in the trailing 5
    * minutes of each event (RANGE frame over micros). */
  val qRate5Min: Spec = Spec(
    "ev_rate_5min",
    oracle = Some("""
      SELECT event_id, user_id,
        CAST(COUNT(*) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
          RANGE BETWEEN 300000000 PRECEDING AND CURRENT ROW) AS BIGINT) AS n_5min
      FROM events WHERE user_id % 10 = 0
      ORDER BY event_id""")) { (s, dir) =>
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts_us")
      .rangeBetween(-300000000L, 0L)
    load(s, dir)
      .filter($"user_id" % 10 === 0)
      .withColumn("ts_us", expr("ts div 1000"))
      .select($"event_id", $"user_id",
        count(lit(1)).over(w).cast("long").as("n_5min"))
      .orderBy($"event_id")
  }

  /** Robust per-type anomaly detection: median/MAD z-scores (the
    * outlier rule that survives heavy tails where mean/stddev melt).
    * Median and MAD are exact percentile(0.5) — a dyadic fraction, so
    * Spark `percentile` and DuckDB `quantile_cont` interpolate
    * bit-identically — and every z is pure per-row double arithmetic
    * on identical inputs (no order-dependent sums anywhere). The
    * two-phase shape (tiny per-type stats broadcast back over the
    * stream) is the standard firehose-anomaly plan: the event scan
    * never shuffles. */
  val qValueOutliers: Spec = Spec(
    "ev_value_outliers",
    oracle = Some("""
      WITH med AS (
        SELECT event_type,
          quantile_cont(value, 0.5) AS med
        FROM events GROUP BY event_type),
      mad AS (
        SELECT e.event_type,
          quantile_cont(abs(e.value - m.med), 0.5) AS mad, MIN(m.med) AS med
        FROM events e JOIN med m ON e.event_type = m.event_type
        GROUP BY e.event_type)
      SELECT e.event_type,
        CAST(COUNT(*) AS BIGINT) AS n_events,
        round(MIN(m.med), 6) AS median_value,
        round(MIN(m.mad), 6) AS mad_value,
        CAST(COUNT(CASE WHEN abs(e.value - m.med) > 3 * 1.4826 * m.mad
                        THEN 1 END) AS BIGINT) AS n_outliers
      FROM events e JOIN mad m ON e.event_type = m.event_type
      GROUP BY e.event_type ORDER BY e.event_type""")) { (s, dir) =>
    import s.implicits._
    val ev = load(s, dir)
    val med = ev.groupBy($"event_type")
      .agg(percentile($"value", lit(0.5)).as("med"))
    val mad = ev.join(broadcast(med), "event_type")
      .groupBy($"event_type")
      .agg(percentile(abs($"value" - $"med"), lit(0.5)).as("mad"),
        min($"med").as("med"))
    ev.join(broadcast(mad), "event_type")
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n_events"),
        round(min($"med"), 6).as("median_value"),
        round(min($"mad"), 6).as("mad_value"),
        sum(when(abs($"value" - $"med") > lit(3) * lit(1.4826) * $"mad", 1L)
          .otherwise(0L)).as("n_outliers"))
      .orderBy($"event_type")
  }

  /** WINDOWED PSI drift over event time — the monitoring twin of
    * d_drift_psi (corpus-slice PSI, TrainingPrep): each tumbling hour's
    * event-type distribution scored against the global reference
    * distribution (the counts re-aggregated by type). Missing
    * categories take the standard 1e-4 floor via a (window × type)
    * grid — windows-per-year × #types rows, bounded. Terms round to
    * 6dp and sum as DECIMAL per window so the per-window total is
    * aggregation-order-independent; reference counts ride a broadcast,
    * so the plan is two hash aggs over one corpus scan plus a
    * bounded-partition window — no scale-variant reducer. Takes the
    * (window_start, event_type, n) count table as input, shared by the
    * batch query (ev_drift_windowed) and the streaming twin
    * (st_drift_windowed) so the two cannot drift. */
  def psiOverWindowCounts(wcRaw: DataFrame): DataFrame = {
    val s = wcRaw.sparkSession
    import s.implicits._
    val wc = wcRaw.select($"window_start", $"event_type", $"n")
      .localCheckpoint() // one upstream evaluation; three consumers
    val wt = wc.groupBy($"window_start").agg(sum($"n").as("wtot"))
    val g = wc.groupBy($"event_type").agg(sum($"n").as("gn"))
    val gp = g.crossJoin(broadcast(g.agg(sum($"gn").as("gtot"))))
      .select($"event_type",
        round($"gn".cast("double") / $"gtot", 6).as("p_ref"))
    val p = wt.crossJoin(broadcast(gp))
      .join(wc, Seq("window_start", "event_type"), "left")
      .select($"window_start", $"event_type",
        coalesce(round($"n".cast("double") / $"wtot", 6), lit(0.0001))
          .as("p_win"),
        $"p_ref")
    p.withColumn("term",
        round(($"p_win" - $"p_ref") * log($"p_win" / $"p_ref"), 6)
          .cast("decimal(18,6)"))
      .select($"window_start", $"event_type", $"p_win", $"p_ref",
        $"term".cast("double").as("psi_term"),
        sum($"term").over(org.apache.spark.sql.expressions.Window
          .partitionBy($"window_start")).cast("double").as("psi_window"))
      .orderBy($"window_start", $"event_type")
  }

  /** The PSI tail shared by every drift oracle: expects a `w` CTE of
    * (window_start, event_type) memberships. */
  private val driftTailSql: String = """
      wc AS (SELECT window_start, event_type, CAST(COUNT(*) AS BIGINT) AS n
             FROM w GROUP BY window_start, event_type),
      wt AS (SELECT window_start, CAST(SUM(n) AS BIGINT) AS wtot
             FROM wc GROUP BY window_start),
      g AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS gn
            FROM w GROUP BY event_type),
      gp AS (SELECT event_type,
               round(CAST(gn AS DOUBLE) / (SELECT SUM(gn) FROM g), 6) AS p_ref
             FROM g),
      p AS (
        SELECT wt.window_start, gp.event_type,
          COALESCE(round(CAST(wc.n AS DOUBLE) / wt.wtot, 6), 0.0001) AS p_win,
          gp.p_ref
        FROM wt CROSS JOIN gp
        LEFT JOIN wc ON wc.window_start = wt.window_start
                    AND wc.event_type = gp.event_type),
      terms AS (
        SELECT window_start, event_type, p_win, p_ref,
          CAST(round((p_win - p_ref) * ln(p_win / p_ref), 6) AS DECIMAL(18,6)) AS term
        FROM p)
      SELECT window_start, event_type, p_win, p_ref,
        CAST(term AS DOUBLE) AS psi_term,
        CAST(SUM(term) OVER (PARTITION BY window_start) AS DOUBLE) AS psi_window
      FROM terms ORDER BY window_start, event_type"""

  /** Drift oracle over a given window-membership CTE body. */
  def driftOracleFrom(wSql: String): String =
    s"WITH w AS ($wSql), $driftTailSql"

  /** The tumbling-hourly drift oracle (shared with st_drift_windowed). */
  val driftOracleSql: String = driftOracleFrom("""
        SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
               event_type FROM events""")

  val qDriftWindowed: Spec = Spec(
    "ev_drift_windowed",
    oracle = Some(driftOracleSql)) { (s, dir) =>
    import s.implicits._
    val hourNs = 3600L * 1000 * 1000 * 1000
    val wc = load(s, dir)
      .withColumn("window_start",
        date_format(timestamp_micros(expr(s"(ts - ts % $hourNs) div 1000")),
          "yyyy-MM-dd HH:mm:ss"))
      .groupBy($"window_start", $"event_type")
      .agg(count(lit(1)).as("n"))
    psiOverWindowCounts(wc)
  }

  /** SLIDING-window drift: the same PSI over 1h windows every 15 min —
    * four overlapping windows per event, so short drift episodes
    * surface at 15-minute resolution instead of being averaged into an
    * hour. The uniform 4× membership inflation cancels in both the
    * window and reference ratios. */
  val qDriftSliding: Spec = Spec(
    "ev_drift_sliding",
    oracle = Some(driftOracleFrom("""
        SELECT strftime(time_bucket(INTERVAL '15 minutes', ts)
                 - i * INTERVAL '15 minutes', '%Y-%m-%d %H:%M:%S') AS window_start,
               event_type
        FROM events CROSS JOIN unnest(range(0, 4)) AS t(i)"""))) { (s, dir) =>
    import s.implicits._
    val wc = load(s, dir)
      .withColumn("ts_utc", timestamp_micros(expr("ts div 1000")))
      .groupBy(window($"ts_utc", "1 hour", "15 minutes"), $"event_type")
      .agg(count(lit(1)).as("n"))
      .select(date_format($"window.start", "yyyy-MM-dd HH:mm:ss")
        .as("window_start"), $"event_type", $"n")
    psiOverWindowCounts(wc)
  }

  /** Cohort retention: users grouped by first-activity day, then for
    * each (cohort, day-offset) the count of cohort members active that
    * day — the canonical product-analytics triangle every OLAP engine
    * ships (Mixpanel/Amplitude retention, ClickHouse retention()).
    *
    * Scale shape: first-seen is a hash agg keyed by user (map-side
    * combined min), joined back on user_id — AQE broadcasts the
    * first-seen table while it fits and degrades to shuffle when the
    * user dimension outgrows it; the final distinct-count agg is keyed
    * by (cohort, offset), whose cardinality is days², not events. All
    * time math is exact integer nanos (see the object note). */
  val qCohortRetention: Spec = Spec(
    "ev_cohort_retention",
    oracle = Some("""
      WITH f AS (
        SELECT user_id, date_trunc('day', MIN(ts)) AS cohort_day
        FROM events GROUP BY user_id),
      act AS (
        SELECT DISTINCT e.user_id, f.cohort_day,
          datediff('day', f.cohort_day, date_trunc('day', e.ts)) AS day_offset
        FROM events e JOIN f ON e.user_id = f.user_id),
      size AS (
        SELECT cohort_day, COUNT(*) AS cohort_users FROM f GROUP BY cohort_day)
      SELECT strftime(a.cohort_day, '%Y-%m-%d') AS cohort_day,
        CAST(a.day_offset AS BIGINT) AS day_offset,
        COUNT(*) AS n_active, ANY_VALUE(s.cohort_users) AS cohort_users,
        round(CAST(COUNT(*) AS DOUBLE) / ANY_VALUE(s.cohort_users), 6)
          AS retention
      FROM act a JOIN size s ON a.cohort_day = s.cohort_day
      GROUP BY a.cohort_day, a.day_offset
      ORDER BY cohort_day, day_offset""")) { (s, dir) =>
    import s.implicits._
    val dayNs = 86400L * 1000 * 1000 * 1000
    val ev = load(s, dir)
      .select($"user_id", ($"ts" - $"ts" % dayNs).as("day_ns"))
    val first = ev.groupBy($"user_id")
      .agg(min($"day_ns").as("cohort_ns"))
    val sizes = first.groupBy($"cohort_ns")
      .agg(count(lit(1)).as("cohort_users"))
    ev.join(first, "user_id")
      .select($"user_id", $"cohort_ns",
        (($"day_ns" - $"cohort_ns") / dayNs).cast("long").as("day_offset"))
      .distinct()
      .groupBy($"cohort_ns", $"day_offset")
      .agg(count(lit(1)).as("n_active"))
      .join(broadcast(sizes), "cohort_ns")
      .select(
        date_format(timestamp_micros(expr("cohort_ns div 1000")), "yyyy-MM-dd")
          .as("cohort_day"),
        $"day_offset", $"n_active", $"cohort_users",
        round($"n_active".cast("double") / $"cohort_users", 6).as("retention"))
      .orderBy($"cohort_day", $"day_offset")
  }

  /** Windowed SEQUENCED funnel (the ClickHouse `windowFunnel` shape,
    * first-touch anchored): view → click → purchase must occur in
    * order, each step strictly after the previous, with the whole
    * chain inside a 24-hour window of the user's FIRST view. Unlike
    * [[qFunnel]] (unordered per-user counts), order and timing gate
    * each level.
    *
    * Scale shape: three chained hash aggs on user_id (anchor, then min
    * qualifying next-step per level) — each join is keyed on user_id
    * and AQE-degradable; no per-user event-sorted window is needed
    * because first-touch anchoring only wants MINs. All arithmetic is
    * exact integer time (ns in Spark, µs in the oracle — same
    * comparisons). */
  val qFunnelWindowed: Spec = Spec(
    "ev_funnel_windowed",
    oracle = Some("""
      WITH t1 AS (
        SELECT user_id, MIN(epoch_us(ts)) AS t1 FROM events
        WHERE event_type = 'view' GROUP BY user_id),
      t2 AS (
        SELECT e.user_id, ANY_VALUE(t1.t1) AS t1, MIN(epoch_us(e.ts)) AS t2
        FROM events e JOIN t1 ON e.user_id = t1.user_id
        WHERE e.event_type = 'click' AND epoch_us(e.ts) > t1.t1
        GROUP BY e.user_id),
      t3 AS (
        SELECT e.user_id, MIN(epoch_us(e.ts)) AS t3
        FROM events e JOIN t2 ON e.user_id = t2.user_id
        WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > t2.t2
        GROUP BY e.user_id),
      lv AS (
        SELECT t1.user_id,
          CASE WHEN t3.t3 IS NOT NULL AND t3.t3 - t1.t1 <= 86400000000 THEN 3
               WHEN t2.t2 IS NOT NULL AND t2.t2 - t1.t1 <= 86400000000 THEN 2
               ELSE 1 END AS level,
          CASE WHEN t3.t3 IS NOT NULL AND t3.t3 - t1.t1 <= 86400000000
                 THEN t3.t3 - t1.t1
               WHEN t2.t2 IS NOT NULL AND t2.t2 - t1.t1 <= 86400000000
                 THEN t2.t2 - t1.t1
               ELSE 0 END AS reach_us
        FROM t1 LEFT JOIN t2 ON t1.user_id = t2.user_id
        LEFT JOIN t3 ON t1.user_id = t3.user_id)
      SELECT CAST(level AS BIGINT) AS level, COUNT(*) AS n_users,
        CAST(SUM(reach_us) AS BIGINT) AS total_reach_us
      FROM lv GROUP BY level ORDER BY level""")) { (s, dir) =>
    import s.implicits._
    val windowUs = 86400000000L // 24 h in µs — ts cols below are µs
    val ev = load(s, dir)
      .select($"user_id", $"event_type", expr("ts div 1000").as("tus"))
    val t1 = ev.filter($"event_type" === "view")
      .groupBy($"user_id").agg(min($"tus").as("t1"))
    val t2 = ev.filter($"event_type" === "click")
      .join(t1, "user_id").filter($"tus" > $"t1")
      .groupBy($"user_id").agg(min($"tus").as("t2"))
    val t3 = ev.filter($"event_type" === "purchase")
      .join(t2, "user_id").filter($"tus" > $"t2")
      .groupBy($"user_id").agg(min($"tus").as("t3"))
    val lv = t1
      .join(t2, Seq("user_id"), "left")
      .join(t3, Seq("user_id"), "left")
      .select(
        when($"t3".isNotNull && $"t3" - $"t1" <= windowUs, 3)
          .when($"t2".isNotNull && $"t2" - $"t1" <= windowUs, 2)
          .otherwise(1).cast("long").as("level"),
        when($"t3".isNotNull && $"t3" - $"t1" <= windowUs, $"t3" - $"t1")
          .when($"t2".isNotNull && $"t2" - $"t1" <= windowUs, $"t2" - $"t1")
          .otherwise(0L).as("reach_us"))
    lv.groupBy($"level")
      .agg(count(lit(1)).as("n_users"),
        sum($"reach_us").cast("long").as("total_reach_us"))
      .orderBy($"level")
  }

  /** Daily active users split into NEW (first-ever activity that day)
    * vs RETURNING — the DAU companion of [[qCohortRetention]]. The
    * "running distinct" trap is avoided the standard way: a per-user
    * first-seen hash agg turns the cumulative-distinct question into a
    * per-day count of firsts; active counts are a distinct on
    * (user, day) — both keyed aggs, no unbounded window state. */
  val qDauNewReturning: Spec = Spec(
    "ev_dau_new_returning",
    oracle = Some("""
      WITH ud AS (
        SELECT DISTINCT user_id, date_trunc('day', ts) AS day FROM events),
      f AS (SELECT user_id, MIN(day) AS first_day FROM ud GROUP BY user_id),
      a AS (
        SELECT ud.day, COUNT(*) AS dau,
          COUNT(CASE WHEN ud.day = f.first_day THEN 1 END) AS new_users
        FROM ud JOIN f ON ud.user_id = f.user_id GROUP BY ud.day)
      SELECT strftime(day, '%Y-%m-%d') AS day, dau, new_users,
        CAST(dau - new_users AS BIGINT) AS returning_users
      FROM a ORDER BY day""")) { (s, dir) =>
    import s.implicits._
    val dayNs = 86400L * 1000 * 1000 * 1000
    val ud = load(s, dir)
      .select($"user_id", ($"ts" - $"ts" % dayNs).as("day_ns"))
      .distinct()
    val first = ud.groupBy($"user_id").agg(min($"day_ns").as("first_ns"))
    ud.join(first, "user_id")
      .groupBy($"day_ns")
      .agg(count(lit(1)).as("dau"),
        count(when($"day_ns" === $"first_ns", 1)).as("new_users"))
      .select(
        date_format(timestamp_micros(expr("day_ns div 1000")), "yyyy-MM-dd")
          .as("day"),
        $"dau", $"new_users",
        ($"dau" - $"new_users").cast("long").as("returning_users"))
      .orderBy($"day")
  }

  /** Exponentially time-decayed activity score per user (half-life
    * 1 day, evaluated at the corpus max timestamp) — the recency-
    * weighted engagement feature every ranking/abuse system computes:
    * recent events count ~1, week-old events ~1/128. Per-event weights
    * 0.5^(Δt/day) round to 9dp and sum as DECIMAL, so the per-user
    * score is aggregation-order-free and pow's last-ulp engine
    * variance is absorbed (the unigram-LM recipe on a new
    * transcendental). One scan, one broadcast max, one hash agg. */
  val qDecayScore: Spec = Spec(
    "ev_decay_score",
    oracle = Some("""
      WITH e AS (SELECT user_id, epoch_us(ts) AS us FROM events),
      mx AS (SELECT MAX(us) AS m FROM e),
      t AS (SELECT user_id,
          CAST(round(power(0.5, (m - us) / 86400000000.0), 9)
            AS DECIMAL(18,9)) AS w
        FROM e CROSS JOIN mx)
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
        ROUND(CAST(SUM(w) AS DOUBLE), 6) AS decay_score
      FROM t GROUP BY user_id ORDER BY user_id""")) { (s, dir) =>
    import s.implicits._
    val e = load(s, dir).withColumn("us", expr("ts div 1000"))
    val mx = broadcast(e.agg(max($"us").as("m")))
    e.crossJoin(mx)
      .withColumn("w",
        round(pow(lit(0.5), ($"m" - $"us") / lit(86400000000.0d)), 9)
          .cast("decimal(18,9)"))
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n_events"),
        round(sum($"w").cast("double"), 6).as("decay_score"))
      .orderBy($"user_id")
  }

  /** Per-user value TREND: the least-squares slope of event value over
    * event time (days since the corpus min), for users with ≥ 5
    * events — grouped regression, the feature behind "is this user's
    * engagement rising or falling". Same hash-stable least-squares
    * recipe as the Zipf fit: (x, y) round to 6dp DECIMALs, the four
    * sums are exact in any aggregation order, and only the closed-form
    * divisions run in doubles. One scan, one broadcast min, one
    * per-user agg — no window, no sort. */
  val qUserTrend: Spec = Spec(
    "ev_user_trend",
    oracle = Some("""
      WITH e AS (SELECT user_id, epoch_us(ts) AS us, value FROM events),
      mn AS (SELECT MIN(us) AS m FROM e),
      pts AS (SELECT user_id,
          CAST(round((us - m) / 86400000000.0, 6) AS DECIMAL(18,6)) AS x,
          CAST(round(value, 6) AS DECIMAL(18,6)) AS y
        FROM e CROSS JOIN mn),
      s AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n,
          SUM(x) AS sx, SUM(y) AS sy, SUM(x*y) AS sxy, SUM(x*x) AS sxx
        FROM pts GROUP BY user_id HAVING COUNT(*) >= 5)
      SELECT user_id, n,
        round((n * CAST(sxy AS DOUBLE) -
               CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
              (n * CAST(sxx AS DOUBLE) -
               CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6) AS value_slope
      FROM s ORDER BY user_id""")) { (s, dir) =>
    import s.implicits._
    val e = load(s, dir).select($"user_id", expr("ts div 1000").as("us"),
      $"value")
    val mn = broadcast(e.agg(min($"us").as("m")))
    val pts = e.crossJoin(mn)
      .select($"user_id",
        round(($"us" - $"m") / lit(86400000000.0d), 6)
          .cast("decimal(18,6)").as("x"),
        round($"value", 6).cast("decimal(18,6)").as("y"))
    pts.groupBy($"user_id")
      .agg(count(lit(1)).as("n"),
        sum($"x").as("sx"), sum($"y").as("sy"),
        sum($"x" * $"y").as("sxy"), sum($"x" * $"x").as("sxx"))
      .filter($"n" >= 5)
      .select($"user_id", $"n",
        round(($"n" * $"sxy".cast("double") -
            $"sx".cast("double") * $"sy".cast("double")) /
          ($"n" * $"sxx".cast("double") -
            $"sx".cast("double") * $"sx".cast("double")), 6)
          .as("value_slope"))
      .orderBy($"user_id")
  }

  /** Event-rate ANOMALY detection: each hour's event count per type
    * z-scored against its own trailing 24-hour baseline (rows frame,
    * excluding the current hour), reporting hours with |z| ≥ 2 — the
    * rate-spike monitor every ingestion pipeline runs. The variance is
    * computed from EXACT integer frame sums (n, Σx, Σx²) with one
    * closed-form double expression — not a stddev aggregate, whose
    * streaming accumulation order could differ between engines — so
    * both sides produce bit-identical z-scores before rounding.
    *
    * Scale shape: hash-agg to hourly counts (calendar-bounded), then a
    * window partitioned by event_type over hours — the windowed frame
    * is hours-scale, never event-scale.
    *
    * This z-score tail is shared by the batch query (ev_rate_anomaly)
    * and the streaming twin (st_rate_anomaly): it takes the
    * (window_start, event_type, n_events) hourly count table, so the
    * two cannot drift. */
  def rateAnomalyOverCounts(hc: DataFrame): DataFrame = {
    val s = hc.sparkSession
    import s.implicits._
    val w = Window.partitionBy($"event_type").orderBy($"window_start")
      .rowsBetween(-24, -1)
    hc.select($"window_start", $"event_type", $"n_events")
      .withColumn("n24", count(lit(1)).over(w))
      .withColumn("s1", sum($"n_events").over(w))
      .withColumn("s2", sum($"n_events" * $"n_events").over(w))
      .filter($"n24" === 24 &&
        ($"s2" - $"s1".cast("double") * $"s1" / $"n24") > 0)
      .select($"window_start", $"event_type", $"n_events",
        round($"s1".cast("double") / $"n24", 6).as("baseline_mean"),
        round(($"n_events" - $"s1".cast("double") / $"n24") /
          sqrt(($"s2" - $"s1".cast("double") * $"s1" / $"n24") / ($"n24" - 1)), 6)
          .as("zscore"))
      .filter(abs($"zscore") >= 2.0)
      .orderBy($"window_start", $"event_type")
  }

  /** The z-score oracle tail over ANY `hc` CTE producing
    * (window_start, event_type, n_events) — shared by the batch query,
    * the complete-mode stream twin, and the append-mode twin (whose hc
    * is the closed-hour prefix). */
  def rateAnomalyOracleOver(hcCte: String): String = s"""
      WITH $hcCte,
      fr AS (
        SELECT window_start, event_type, n_events,
          COUNT(*) OVER w AS n24,
          SUM(n_events) OVER w AS s1,
          SUM(n_events * n_events) OVER w AS s2
        FROM hc
        WINDOW w AS (PARTITION BY event_type ORDER BY window_start
                     ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)),
      z AS (
        SELECT window_start, event_type, n_events,
          round(CAST(s1 AS DOUBLE) / n24, 6) AS baseline_mean,
          round((n_events - CAST(s1 AS DOUBLE) / n24) /
            sqrt((s2 - CAST(s1 AS DOUBLE) * s1 / n24) / (n24 - 1)), 6) AS zscore
        FROM fr
        WHERE n24 = 24 AND (s2 - CAST(s1 AS DOUBLE) * s1 / n24) > 0)
      SELECT window_start, event_type, CAST(n_events AS BIGINT) AS n_events,
        baseline_mean, zscore
      FROM z WHERE abs(zscore) >= 2.0
      ORDER BY window_start, event_type"""

  val rateAnomalyOracleSql: String = rateAnomalyOracleOver("""hc AS (
        SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
               event_type, COUNT(*) AS n_events
        FROM events GROUP BY window_start, event_type)""")

  val qRateAnomaly: Spec = Spec(
    "ev_rate_anomaly",
    oracle = Some(rateAnomalyOracleSql)) { (s, dir) =>
    import s.implicits._
    val hourNs = 3600L * 1000 * 1000 * 1000
    rateAnomalyOverCounts(load(s, dir)
      .withColumn("window_start",
        date_format(timestamp_micros(expr(s"(ts - ts % $hourNs) div 1000")),
          "yyyy-MM-dd HH:mm:ss"))
      .groupBy($"window_start", $"event_type")
      .agg(count(lit(1)).as("n_events")))
  }

  /** Two-sample Kolmogorov–Smirnov drift test per event type: the
    * `value` distribution of the EARLY half of the timeline (reference)
    * vs the LATE half (current), split at the midpoint timestamp.
    * KS = max over pooled values of |ECDF_ref − ECDF_cur| — the
    * distribution-shift alarm that, unlike PSI (ev_drift_windowed),
    * needs no binning choice and is sensitive anywhere on the CDF, not
    * just where bin mass moves.
    *
    * Exactness: both ECDFs advance as INTEGER cumulative counts over
    * the distinct-value grid, and the sup statistic is maximized in
    * cross-multiplied integer form — max |cum_ref·n_cur − cum_cur·n_ref|
    * — so engines compare exact integers and divide exactly once at the
    * end (exact while n_ref·n_cur < 2^63, i.e. ~3e9 rows per side per
    * type; beyond that quantize values first, which bounds the grid the
    * same way PSI's bins do).
    *
    * Scale shape: one scan → (type, value) hash-agg with both side
    * counts taken in the same pass; the two cumulative counts ride ONE
    * [[graft.ops.Skew.prefixSumsByKey]] pass (range-partitioned, no
    * single-reducer per-type window, one checkpoint + one broadcast for
    * both ECDFs); totals are a types-sized broadcast. */
  val qKsDrift: Spec = Spec(
    "ev_ks_drift",
    bench = true,
    oracle = Some("""
      WITH b AS (SELECT (MIN(epoch_us(ts)) + MAX(epoch_us(ts))) // 2 AS mid
                 FROM events),
      c AS (SELECT event_type, value,
              SUM(CASE WHEN epoch_us(ts) <= b.mid THEN 1 ELSE 0 END) AS ca,
              SUM(CASE WHEN epoch_us(ts) > b.mid THEN 1 ELSE 0 END) AS cb
            FROM events CROSS JOIN b GROUP BY event_type, value),
      t AS (SELECT event_type, SUM(ca) AS na, SUM(cb) AS nb
            FROM c GROUP BY event_type),
      cum AS (SELECT event_type, value,
              SUM(ca) OVER (PARTITION BY event_type ORDER BY value) AS cr,
              SUM(cb) OVER (PARTITION BY event_type ORDER BY value) AS cc
            FROM c),
      d AS (SELECT cum.event_type,
              MAX(abs(cr * t.nb - cc * t.na)) AS dmax,
              MIN(t.na) AS na, MIN(t.nb) AS nb
            FROM cum JOIN t ON t.event_type = cum.event_type
            GROUP BY cum.event_type)
      SELECT event_type, CAST(na AS BIGINT) AS n_ref, CAST(nb AS BIGINT) AS n_cur,
        round(CAST(dmax AS DOUBLE) / (na * nb), 6) AS ks_stat
      FROM d ORDER BY event_type""")) { (s, dir) =>
    import s.implicits._
    val e = load(s, dir)
      .select($"event_type", $"value", expr("ts div 1000").as("us"))
    val mid = broadcast(e.agg(
      expr("(min(us) + max(us)) div 2").as("mid")))
    val counts = e.crossJoin(mid)
      .groupBy($"event_type", $"value")
      .agg(
        sum(when($"us" <= $"mid", 1L).otherwise(0L)).as("ca"),
        sum(when($"us" > $"mid", 1L).otherwise(0L)).as("cb"))
    val totals = broadcast(counts.groupBy($"event_type")
      .agg(sum($"ca").as("na"), sum($"cb").as("nb")))
    val cum = graft.ops.Skew.prefixSumsByKey(
      counts, "event_type", Seq($"value"),
      Seq($"ca" -> "cr", $"cb" -> "cc"))
    cum.join(totals, "event_type")
      .groupBy($"event_type")
      .agg(max(abs($"cr" * $"nb" - $"cc" * $"na")).as("dmax"),
        min($"na").as("na"), min($"nb").as("nb"))
      .select($"event_type", $"na".as("n_ref"), $"nb".as("n_cur"),
        round($"dmax".cast("double") / ($"na" * $"nb"), 6).as("ks_stat"))
      .orderBy($"event_type")
  }

  /** KS tail shared by ev_ks_windowed and st_ks_windowed: takes the
    * (event_type, window_day, v, cnt) quantized daily count table and
    * computes each day's KS statistic + asymptotic p-value against the
    * type's FIRST day. Everything here is BOUNDED by construction —
    * the 0.1-quantization caps the value grid at range/step points per
    * type, days are calendar-bounded, and every window partition is
    * (type[, day])-keyed over that grid — so no frame scales with the
    * event count. The p-value is the 5-term asymptotic Kolmogorov
    * series 2·Σ(−1)^{k−1}·exp(−2k²·n_eff·D²), written in identical
    * literal op order in both engines. */
  def ksOverDayValueCounts(c: DataFrame): DataFrame = {
    val s = c.sparkSession
    import s.implicits._
    val f = broadcast(c.groupBy($"event_type").agg(min($"window_day").as("d0")))
    val cf = c.join(f, "event_type")
    val refc0 = cf.filter($"window_day" === $"d0")
      .select($"event_type", $"v", $"cnt")
    val nr = broadcast(refc0.groupBy($"event_type").agg(sum($"cnt").as("n_ref")))
    val grid = c.select($"event_type", $"v").distinct()
    val wr = Window.partitionBy($"event_type").orderBy($"v")
    val refc = grid.join(refc0, Seq("event_type", "v"), "left")
      .withColumn("cumr", sum(coalesce($"cnt", lit(0L))).over(wr))
      .select($"event_type", $"v", $"cumr")
    val winRows = cf.filter($"window_day" =!= $"d0")
    val wins = winRows.select($"event_type", $"window_day").distinct()
    val nw = winRows.groupBy($"event_type", $"window_day")
      .agg(sum($"cnt").as("n_win"))
    val ww = Window.partitionBy($"event_type", $"window_day").orderBy($"v")
    val cw = wins.join(grid, "event_type")
      .join(c, Seq("event_type", "window_day", "v"), "left")
      .withColumn("cumw", sum(coalesce($"cnt", lit(0L))).over(ww))
      .select($"event_type", $"window_day", $"v", $"cumw")
    cw.join(refc, Seq("event_type", "v"))
      .join(nr, "event_type")
      .join(nw, Seq("event_type", "window_day"))
      .groupBy($"event_type", $"window_day")
      .agg(max(abs($"cumw" * $"n_ref" - $"cumr" * $"n_win")).as("dmax"),
        min($"n_ref").as("n_ref"), min($"n_win").as("n_win"))
      .withColumn("d", $"dmax".cast("double") / ($"n_ref" * $"n_win"))
      .withColumn("lam2",
        $"n_ref".cast("double") * $"n_win" / ($"n_ref" + $"n_win") * $"d" * $"d")
      .select($"event_type", $"window_day", $"n_ref", $"n_win",
        round($"d", 6).as("ks_stat"),
        round(least(lit(1.0), lit(2.0) *
          (exp(lit(-2.0) * $"lam2") - exp(lit(-8.0) * $"lam2")
            + exp(lit(-18.0) * $"lam2") - exp(lit(-32.0) * $"lam2")
            + exp(lit(-50.0) * $"lam2"))), 6).as("p_value"))
      .orderBy($"event_type", $"window_day")
  }

  /** Oracle for the windowed KS monitor, shared with the streaming
    * twin. Mirrors [[ksOverDayValueCounts]] stage by stage. */
  val ksWindowedOracleSql: String = """
      WITH c AS (
        SELECT event_type, strftime(date_trunc('day', ts), '%Y-%m-%d') AS window_day,
          round(value, 1) AS v, COUNT(*) AS cnt
        FROM events GROUP BY 1, 2, 3),
      f AS (SELECT event_type, MIN(window_day) AS d0 FROM c GROUP BY 1),
      grid AS (SELECT DISTINCT event_type, v FROM c),
      refc0 AS (SELECT c.event_type, c.v, c.cnt FROM c
        JOIN f ON f.event_type = c.event_type AND c.window_day = f.d0),
      nr AS (SELECT event_type, SUM(cnt) AS n_ref FROM refc0 GROUP BY 1),
      refc AS (
        SELECT g.event_type, g.v,
          SUM(COALESCE(r.cnt, 0)) OVER (PARTITION BY g.event_type ORDER BY g.v) AS cumr
        FROM grid g LEFT JOIN refc0 r ON r.event_type = g.event_type AND r.v = g.v),
      wins AS (SELECT DISTINCT c.event_type, c.window_day FROM c
        JOIN f ON f.event_type = c.event_type WHERE c.window_day <> f.d0),
      nw AS (SELECT c.event_type, c.window_day, SUM(cnt) AS n_win FROM c
        JOIN f ON f.event_type = c.event_type WHERE c.window_day <> f.d0
        GROUP BY 1, 2),
      gw AS (SELECT w.event_type, w.window_day, g.v FROM wins w
        JOIN grid g ON g.event_type = w.event_type),
      cw AS (
        SELECT gw.event_type, gw.window_day, gw.v,
          SUM(COALESCE(c.cnt, 0)) OVER (PARTITION BY gw.event_type, gw.window_day
            ORDER BY gw.v) AS cumw
        FROM gw LEFT JOIN c ON c.event_type = gw.event_type
          AND c.window_day = gw.window_day AND c.v = gw.v),
      dm AS (
        SELECT cw.event_type, cw.window_day,
          MAX(abs(cw.cumw * nr.n_ref - refc.cumr * nw.n_win)) AS dmax,
          MIN(nr.n_ref) AS n_ref, MIN(nw.n_win) AS n_win
        FROM cw
        JOIN refc ON refc.event_type = cw.event_type AND refc.v = cw.v
        JOIN nr ON nr.event_type = cw.event_type
        JOIN nw ON nw.event_type = cw.event_type AND nw.window_day = cw.window_day
        GROUP BY 1, 2),
      pv AS (
        SELECT event_type, window_day, n_ref, n_win,
          CAST(dmax AS DOUBLE) / (n_ref * n_win) AS d,
          (CAST(n_ref AS DOUBLE) * n_win / (n_ref + n_win))
            * (CAST(dmax AS DOUBLE) / (n_ref * n_win))
            * (CAST(dmax AS DOUBLE) / (n_ref * n_win)) AS lam2
        FROM dm)
      SELECT event_type, window_day,
        CAST(n_ref AS BIGINT) AS n_ref, CAST(n_win AS BIGINT) AS n_win,
        round(d, 6) AS ks_stat,
        round(LEAST(1.0, 2 * (exp(-2 * lam2) - exp(-8 * lam2) + exp(-18 * lam2)
          - exp(-32 * lam2) + exp(-50 * lam2))), 6) AS p_value
      FROM pv ORDER BY event_type, window_day"""

  /** WINDOWED KS monitor: each day's `value` distribution tested
    * against the type's FIRST day (the fixed reference), with the
    * asymptotic p-value — the per-window twin of [[qKsDrift]] and the
    * binning-free counterpart of the PSI monitor ([[qDriftWindowed]]).
    * Values quantize to 0.1 FIRST: that is the deliberate monitoring
    * trade that makes every downstream structure bounded (grid ≤
    * range/step per type) where full-resolution KS ([[qKsDrift]])
    * keeps the exact grid. Shares [[ksOverDayValueCounts]] with
    * st_ks_windowed, so batch and streaming cannot drift. */
  val qKsWindowed: Spec = Spec(
    "ev_ks_windowed",
    oracle = Some(ksWindowedOracleSql)) { (s, dir) =>
    import s.implicits._
    ksOverDayValueCounts(load(s, dir)
      .select($"event_type",
        date_format(timestamp_micros(expr("ts div 1000")), "yyyy-MM-dd")
          .as("window_day"),
        round($"value", 1).as("v"))
      .groupBy($"event_type", $"window_day", $"v")
      .agg(count(lit(1)).as("cnt")))
  }

  /** NEAREST-event as-of join: each purchase paired with the click
    * closest in time in EITHER direction within a ±10-minute
    * tolerance — the sensor-alignment flavor of as-of (backward-only:
    * [[qAsofClick]]); ties in |Δt| resolve backward, equal-timestamp
    * clicks count as backward (Δ=0). -1 sentinel when no click
    * qualifies, and the chosen direction is reported.
    *
    * One sorted pass computes BOTH candidates: the union frame sorts
    * (ts, clicks-before-purchases), so the backward frame's running
    * last-click and the forward frame's next-click are two frames of
    * the SAME window spec — one partition sort, one WindowExec, no
    * join. The oracle states the semantics independently via grouped
    * min/max joins. */
  val qAsofNearest: Spec = Spec(
    "ev_asof_nearest",
    oracle = Some("""
      WITH p AS (SELECT event_id, user_id, epoch_us(ts) AS t
                 FROM events WHERE event_type = 'purchase'),
      c AS (SELECT user_id, epoch_us(ts) AS ct
            FROM events WHERE event_type = 'click'),
      b AS (SELECT p.event_id, MAX(ct) AS bt FROM p
            JOIN c ON c.user_id = p.user_id AND ct <= t GROUP BY 1),
      f AS (SELECT p.event_id, MIN(ct) AS ft FROM p
            JOIN c ON c.user_id = p.user_id AND ct > t GROUP BY 1)
      SELECT p.event_id, p.user_id,
        CASE
          WHEN bt IS NOT NULL AND (ft IS NULL OR t - bt <= ft - t)
               AND t - bt <= 600000000 THEN bt
          WHEN ft IS NOT NULL AND ft - t <= 600000000 THEN ft
          ELSE -1 END AS nearest_click_us,
        CASE
          WHEN bt IS NOT NULL AND (ft IS NULL OR t - bt <= ft - t)
               AND t - bt <= 600000000 THEN 'backward'
          WHEN ft IS NOT NULL AND ft - t <= 600000000 THEN 'forward'
          ELSE 'none' END AS direction
      FROM p LEFT JOIN b ON b.event_id = p.event_id
        LEFT JOIN f ON f.event_id = p.event_id
      ORDER BY p.event_id""")) { (s, dir) =>
    import s.implicits._
    val order = Seq($"ts_us",
      when($"event_type" === "click", 0).otherwise(1), $"event_id")
    val wB = Window.partitionBy($"user_id").orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wF = Window.partitionBy($"user_id").orderBy(order: _*)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val click = when($"event_type" === "click", $"ts_us")
    load(s, dir)
      .filter($"event_type".isin("click", "purchase"))
      .withColumn("ts_us", expr("ts div 1000"))
      // one select carrying BOTH window expressions: same partition+order,
      // different frames → the analyzer plans a single WindowExec
      .select($"event_id", $"user_id", $"event_type", $"ts_us",
        last(click, ignoreNulls = true).over(wB).as("bt"),
        first(click, ignoreNulls = true).over(wF).as("ft"))
      .filter($"event_type" === "purchase")
      .withColumn("t", $"ts_us")
      .select($"event_id", $"user_id",
        when($"bt".isNotNull && ($"ft".isNull || $"t" - $"bt" <= $"ft" - $"t")
            && $"t" - $"bt" <= 600000000L, $"bt")
          .when($"ft".isNotNull && $"ft" - $"t" <= 600000000L, $"ft")
          .otherwise(-1L).as("nearest_click_us"),
        when($"bt".isNotNull && ($"ft".isNull || $"t" - $"bt" <= $"ft" - $"t")
            && $"t" - $"bt" <= 600000000L, "backward")
          .when($"ft".isNotNull && $"ft" - $"t" <= 600000000L, "forward")
          .otherwise("none").as("direction"))
      .orderBy($"event_id")
  }

  /** Per-type WINSORIZATION (robust clipping at p01/p99) with the
    * winsorized mean — the standard tail-taming preprocessor for
    * value streams whose raw mean one fat-fingered event can drag
    * ([[qValueOutliers]] flags the outliers; this REPAIRS the
    * aggregate). Exactness: percentile(0.01/0.99) interpolates
    * identically in both engines (the [[qValueOutliers]] parity
    * argument), each clipped value rounds to 6dp and sums as DECIMAL —
    * aggregation-order-free — with one double division at the end.
    *
    * Scale shape: two-phase — a types-sized percentile table computed
    * in one agg, broadcast back over the stream; the clip + decimal
    * sum is one map + hash agg. The event scan never shuffles. */
  val qWinsorizedStats: Spec = Spec(
    "ev_winsorized_stats",
    oracle = Some("""
      WITH p AS (
        SELECT event_type,
          quantile_cont(value, 0.01) AS p01,
          quantile_cont(value, 0.99) AS p99
        FROM events GROUP BY 1),
      w AS (
        SELECT e.event_type,
          CASE WHEN e.value < p.p01 THEN 1 ELSE 0 END AS lo,
          CASE WHEN e.value > p.p99 THEN 1 ELSE 0 END AS hi,
          CAST(round(CASE WHEN e.value < p.p01 THEN p.p01
               WHEN e.value > p.p99 THEN p.p99
               ELSE e.value END, 6) AS DECIMAL(18,6)) AS wv
        FROM events e JOIN p ON p.event_type = e.event_type)
      SELECT event_type,
        CAST(SUM(lo) AS BIGINT) AS n_clipped_low,
        CAST(SUM(hi) AS BIGINT) AS n_clipped_high,
        FLOOR(CAST(SUM(wv) AS DOUBLE) / COUNT(*) * 1000000) / 1000000
          AS winsorized_mean
      FROM w GROUP BY 1 ORDER BY 1""")) { (s, dir) =>
    import s.implicits._
    val e = load(s, dir).select($"event_type", $"value")
    val p = broadcast(e.groupBy($"event_type")
      .agg(expr("percentile(value, 0.01)").as("p01"),
        expr("percentile(value, 0.99)").as("p99")))
    e.join(p, "event_type")
      .select($"event_type",
        when($"value" < $"p01", 1L).otherwise(0L).as("lo"),
        when($"value" > $"p99", 1L).otherwise(0L).as("hi"),
        round(when($"value" < $"p01", $"p01")
          .when($"value" > $"p99", $"p99")
          .otherwise($"value"), 6).cast("decimal(18,6)").as("wv"))
      .groupBy($"event_type")
      .agg(sum($"lo").as("n_clipped_low"), sum($"hi").as("n_clipped_high"),
        // floor-truncate, not round: the mean of 6dp decimals is an
        // exact rational that can land ON a rounding half-boundary,
        // where engine round() implementations disagree (round-9 gate)
        (floor(sum($"wv").cast("double") / count(lit(1)) * 1000000)
          .cast("double") / 1000000).as("winsorized_mean"))
      .orderBy($"event_type")
  }

  /** Conversion LATENCY percentiles per acquisition day: each user's
    * first-view → first-purchase delta, cohorted by the day of the
    * first view — the time-to-convert distribution growth dashboards
    * track next to [[qCohortRetention]]'s who-converts counts. Exact
    * percentile interpolation over integer micros deltas (engine-
    * identical), one double division to seconds at the end.
    *
    * Scale shape: one per-user hash agg (first-view/first-purchase
    * mins in a single pass), then a days-keyed percentile agg over the
    * converted-users frame — user-scale, never event-scale, and the
    * output is calendar-bounded. */
  val qConversionTime: Spec = Spec(
    "ev_conversion_time",
    oracle = Some("""
      WITH f AS (SELECT user_id,
          MIN(CASE WHEN event_type='view' THEN epoch_us(ts) END) AS v,
          MIN(CASE WHEN event_type='purchase' THEN epoch_us(ts) END) AS p
        FROM events GROUP BY user_id),
      d AS (SELECT user_id, p - v AS delta,
          strftime(make_timestamp(v), '%Y-%m-%d') AS view_day
        FROM f WHERE v IS NOT NULL AND p IS NOT NULL AND p >= v)
      SELECT view_day, CAST(COUNT(*) AS BIGINT) AS n_converted,
        round(quantile_cont(delta, 0.5) / 1000000.0, 6) AS p50_sec,
        round(quantile_cont(delta, 0.9) / 1000000.0, 6) AS p90_sec
      FROM d GROUP BY view_day ORDER BY view_day""")) { (s, dir) =>
    import s.implicits._
    val f = load(s, dir)
      .withColumn("us", expr("ts div 1000"))
      .groupBy($"user_id")
      .agg(min(when($"event_type" === "view", $"us")).as("v"),
        min(when($"event_type" === "purchase", $"us")).as("p"))
    f.filter($"v".isNotNull && $"p".isNotNull && $"p" >= $"v")
      .select(($"p" - $"v").as("delta"),
        date_format(timestamp_micros($"v"), "yyyy-MM-dd").as("view_day"))
      .groupBy($"view_day")
      .agg(count(lit(1)).as("n_converted"),
        round(expr("percentile(delta, 0.5)") / 1000000.0, 6).as("p50_sec"),
        round(expr("percentile(delta, 0.9)") / 1000000.0, 6).as("p90_sec"))
      .orderBy($"view_day")
  }

  /** First-order MARKOV transition matrix over per-user event streams:
    * counts and probabilities of each event_type → next-event_type
    * step — the behavioral model behind "what do users do after X"
    * product analytics and sequence-anomaly baselines
    * ([[qFunnelWindowed]] checks ONE prescribed path; this measures
    * ALL observed steps). Exact: integer pair counts, one double
    * division per cell, 6dp.
    *
    * Scale shape: the lead() window partitions by user (per-user
    * history-bounded frames — the [[qRate5Min]] argument); the matrix
    * agg is |types|²-keyed — constant-size output no matter the event
    * count. */
  /** Shared with the stateful streaming twin st_markov_transitions. */
  val markovOracleSql: String = """
      WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us, event_id
                 FROM events),
      p AS (SELECT user_id, event_type AS cur,
          lead(event_type) OVER (PARTITION BY user_id ORDER BY us, event_id) AS nxt
        FROM e),
      c AS (SELECT cur, nxt, COUNT(*) AS n FROM p WHERE nxt IS NOT NULL
            GROUP BY 1, 2),
      t AS (SELECT cur, SUM(n) AS tot FROM c GROUP BY 1)
      SELECT c.cur, c.nxt, CAST(c.n AS BIGINT) AS n_transitions,
        round(CAST(c.n AS DOUBLE) / t.tot, 6) AS p_transition
      FROM c JOIN t ON t.cur = c.cur
      ORDER BY c.cur, c.nxt"""

  val qMarkovTransitions: Spec = Spec(
    "ev_markov_transitions",
    oracle = Some(markovOracleSql)) { (s, dir) =>
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"us", $"event_id")
    markovOverPairs(load(s, dir)
      .select($"user_id", $"event_type", expr("ts div 1000").as("us"),
        $"event_id")
      .withColumn("nxt", lead($"event_type", 1).over(w))
      .filter($"nxt".isNotNull)
      .select($"event_type".as("cur"), $"nxt"))
  }

  /** Transition-matrix tail over a (cur, nxt) pair frame — shared by
    * the batch query and the stateful streaming twin
    * (st_markov_transitions), so the two cannot drift. */
  def markovOverPairs(pairs: DataFrame): DataFrame = {
    val s = pairs.sparkSession
    import s.implicits._
    val c = pairs.groupBy($"cur", $"nxt").agg(count(lit(1)).as("n"))
    val t = c.groupBy($"cur").agg(sum($"n").as("tot"))
    c.join(broadcast(t), "cur")
      .select($"cur", $"nxt", $"n".as("n_transitions"),
        round($"n".cast("double") / $"tot", 6).as("p_transition"))
      .orderBy($"cur", $"nxt")
  }

  /** One stationary-distribution power-iteration oracle round:
    * 9dp-rounded x·p contributions summed per target as DECIMAL
    * (aggregation-order-free), then L1-renormalized — the
    * eigencentrality discipline on the transition matrix. */
  private def msStepCte(t: Int): String = s"""
      ct$t AS (SELECT pm.nxt AS state,
          CAST(round(x.x * pm.p, 9) AS DECIMAL(28,12)) AS cc
        FROM pm JOIN x${t - 1} x ON x.state = pm.cur),
      cs$t AS MATERIALIZED (SELECT state, SUM(cc) AS sc FROM ct$t GROUP BY state),
      tt$t AS (SELECT SUM(sc) AS tt FROM cs$t),
      x$t AS MATERIALIZED (SELECT s.state,
          CAST(COALESCE(c.sc, 0) AS DOUBLE) / CAST(t.tt AS DOUBLE) AS x
        FROM states s LEFT JOIN cs$t c ON c.state = s.state
        CROSS JOIN tt$t t)"""

  /** STATIONARY DISTRIBUTION of the event Markov chain — where
    * [[qMarkovTransitions]] says "what happens after X", this says
    * where the chain SETTLES: the long-run share of each event type if
    * users kept behaving per the observed transition matrix, reported
    * next to the empirical marginal (they agree iff the chain is
    * already mixed — the gap is the behavioral-drift signal). Eight
    * synchronous power-iteration rounds from the uniform vector, each
    * round the PageRank/eigencentrality float discipline (9dp-rounded
    * cell products, DECIMAL sums, one L1 renormalization), so both
    * engines land on identical floor-micros.
    *
    * Scale shape: the pair scan is the transitions query's (per-user
    * lead window); everything after lives on the |types|² matrix —
    * constant work regardless of event count. */
  val qMarkovStationary: Spec = Spec(
    "ev_markov_stationary",
    oracle = Some(s"""
      WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us, event_id
                 FROM events),
      pr AS (SELECT user_id, event_type AS cur,
          lead(event_type) OVER (PARTITION BY user_id ORDER BY us, event_id) AS nxt
        FROM e),
      c AS (SELECT cur, nxt, COUNT(*) AS n FROM pr WHERE nxt IS NOT NULL
            GROUP BY 1, 2),
      t AS (SELECT cur, SUM(n) AS tot FROM c GROUP BY 1),
      pm AS (SELECT c.cur, c.nxt, round(CAST(c.n AS DOUBLE) / t.tot, 6) AS p
        FROM c JOIN t ON t.cur = c.cur),
      states AS (SELECT DISTINCT cur AS state FROM pm),
      k AS (SELECT CAST(COUNT(*) AS BIGINT) AS k FROM states),
      x0 AS (SELECT state, 1.0e0 / k.k AS x FROM states CROSS JOIN k),
      ${(1 to 8).map(msStepCte).mkString(",")},
      emp AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n FROM events
              GROUP BY 1),
      te AS (SELECT SUM(n) AS tot FROM emp)
      SELECT x.state AS event_type,
        CAST(FLOOR(x.x * 1000000) AS BIGINT) AS stationary_micros,
        CAST(FLOOR(CAST(emp.n AS DOUBLE) / te.tot * 1000000) AS BIGINT)
          AS empirical_micros
      FROM x8 x JOIN emp ON emp.event_type = x.state CROSS JOIN te
      ORDER BY event_type""")) { (s, dir) =>
    import s.implicits._
    val ev = load(s, dir)
    val cells = collectMatrix(transitionMatrix(ev))
    val states = cells.map(_._1).distinct.sorted
    var x: Map[String, Double] = states.map(_ -> 1.0 / states.size).toMap
    for (_ <- 1 to 8) {
      val sums = matVec(cells, x, byCur = false)
      // the oracle's tt sums over ALL contribution targets, including
      // ones that never appear as a source state
      val tt = sums.values.foldLeft(java.math.BigDecimal.ZERO)(_.add(_))
      x = states.map(st => st ->
        sums.getOrElse(st, java.math.BigDecimal.ZERO).doubleValue()
          / tt.doubleValue()).toMap
    }
    val local = states.map(st =>
      (st, math.floor(x(st) * 1000000).toLong))
    val emp = ev.groupBy($"event_type").agg(count(lit(1)).as("n"))
    val te = emp.agg(sum($"n").as("tot"))
    local.toDF("event_type", "stationary_micros")
      .join(emp, "event_type")
      .crossJoin(broadcast(te))
      .select($"event_type", $"stationary_micros",
        floor($"n".cast("double") / $"tot" * 1000000).cast("long")
          .as("empirical_micros"))
      .orderBy($"event_type")
  }

  /** The (cur, nxt, p) transition matrix: distributed pair scan + the
    * 6dp cell probabilities of [[markovOverPairs]]. */
  private def transitionMatrix(ev: DataFrame): DataFrame = {
    import ev.sparkSession.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"us", $"event_id")
    val pairs = ev
      .select($"user_id", $"event_type", expr("ts div 1000").as("us"),
        $"event_id")
      .withColumn("nxt", lead($"event_type", 1).over(w))
      .filter($"nxt".isNotNull)
      .select($"event_type".as("cur"), $"nxt")
    val c = pairs.groupBy($"cur", $"nxt").agg(count(lit(1)).as("n"))
    val t = c.groupBy($"cur").agg(sum($"n").as("tot"))
    c.join(broadcast(t), "cur")
      .select($"cur", $"nxt", round($"n".cast("double") / $"tot", 6).as("p"))
  }

  /** The bounded matrix collected for a DRIVER-SIDE exact fold — the
    * k-means-centroids discipline: the corpus scan stays distributed,
    * only the |types|² cell matrix (guarded) crosses to the driver,
    * where 8-24 tiny mat-vec rounds cost microseconds instead of a
    * shuffle round-trip each (the distributed loop form measured 270 s
    * at sf0.01 — all scheduler overhead, zero data). */
  private def collectMatrix(pm: DataFrame): Seq[(String, String, Double)] = {
    val rows = pm.collect()
    require(rows.length <= 65536,
      s"transition matrix too large for a driver fold: ${rows.length} cells")
    rows.toSeq.map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
  }

  /** One exact mat-vec round replicating the oracle's float discipline:
    * per cell round(p·v, 9) as HALF_UP decimal (BigDecimal.valueOf =
    * the engines' shortest-repr double→decimal path), summed exactly.
    * byCur: group contributions by source row (Neumann step v' = Q·v);
    * otherwise by target (power iteration x' = x·P). */
  private def matVec(cells: Seq[(String, String, Double)],
      v: Map[String, Double], byCur: Boolean)
      : Map[String, java.math.BigDecimal] = {
    val sums = scala.collection.mutable.HashMap
      .empty[String, java.math.BigDecimal]
    for ((cur, nxt, p) <- cells) {
      val src = if (byCur) nxt else cur
      val dst = if (byCur) cur else nxt
      v.get(src).foreach { vv =>
        val cc = java.math.BigDecimal.valueOf(
            (if (byCur) p * vv else vv * p))
          .setScale(9, java.math.RoundingMode.HALF_UP)
        sums(dst) = sums.getOrElse(dst, java.math.BigDecimal.ZERO).add(cc)
      }
    }
    sums.toMap
  }

  /** One HITS oracle round over the integer-weighted transition graph:
    * authority a(j) = L1-normalized Σ_i h(i)·n(i,j), then hub
    * h(i) = L1-normalized Σ_j a(j)·n(i,j) — each half-step the
    * eigencentrality float discipline (9dp-rounded contributions,
    * DECIMAL sums, one double division). */
  private def hitsStepCte(r: Int): String = s"""
      ac$r AS (SELECT pm.nxt AS state,
          CAST(round(h.x * pm.n, 9) AS DECIMAL(28,12)) AS c
        FROM pm JOIN h${r - 1} h ON h.state = pm.cur),
      acs$r AS MATERIALIZED (SELECT state, SUM(c) AS sc FROM ac$r GROUP BY state),
      act$r AS (SELECT SUM(sc) AS tt FROM acs$r),
      a$r AS MATERIALIZED (SELECT s.state,
          CASE WHEN t.tt IS NULL OR t.tt = 0 THEN 0.0e0
               ELSE CAST(COALESCE(c.sc, 0) AS DOUBLE) / CAST(t.tt AS DOUBLE)
          END AS x
        FROM states s CROSS JOIN act$r t LEFT JOIN acs$r c ON c.state = s.state),
      hc$r AS (SELECT pm.cur AS state,
          CAST(round(a.x * pm.n, 9) AS DECIMAL(28,12)) AS c
        FROM pm JOIN a$r a ON a.state = pm.nxt),
      hcs$r AS MATERIALIZED (SELECT state, SUM(c) AS sc FROM hc$r GROUP BY state),
      hct$r AS (SELECT SUM(sc) AS tt FROM hcs$r),
      h$r AS MATERIALIZED (SELECT s.state,
          CASE WHEN t.tt IS NULL OR t.tt = 0 THEN 0.0e0
               ELSE CAST(COALESCE(c.sc, 0) AS DOUBLE) / CAST(t.tt AS DOUBLE)
          END AS x
        FROM states s CROSS JOIN hct$r t LEFT JOIN hcs$r c ON c.state = s.state)"""

  /** HITS HUBS & AUTHORITIES (Kleinberg '99) of the DIRECTED event
    * transition graph: authorities are the event types user journeys
    * FUNNEL INTO, hubs are the types that FEED the authorities — the
    * asymmetric "what leads where" ranking a directed graph supports
    * and the undirected similarity graph cannot (there HITS collapses
    * to [[graft.queries.Similarity.eEigenCentrality]]'s eigenvector;
    * see its Scaladoc). Four synchronous a/h rounds over the
    * integer-count adjacency, each half-step L1-normalized under the
    * eigencentrality float discipline, reported next to the exact
    * in/out transition masses.
    *
    * Scale shape: the corpus-sized work is the ONE per-user lead
    * window of [[qMarkovTransitions]]; everything after lives on the
    * guarded |types|² cell matrix, driver-folded exactly like
    * [[qMarkovStationary]] (the distributed loop form is pure
    * scheduler overhead at any scale — the matrix does not grow with
    * data). */
  val qHitsTransitions: Spec = Spec(
    "ev_hits_transitions",
    oracle = Some(s"""
      WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us, event_id
                 FROM events),
      pr AS (SELECT user_id, event_type AS cur,
          lead(event_type) OVER (PARTITION BY user_id ORDER BY us, event_id) AS nxt
        FROM e),
      pm AS (SELECT cur, nxt, CAST(COUNT(*) AS BIGINT) AS n FROM pr
             WHERE nxt IS NOT NULL GROUP BY 1, 2),
      states AS (SELECT DISTINCT event_type AS state FROM events),
      k AS (SELECT CAST(COUNT(*) AS BIGINT) AS k FROM states),
      h0 AS (SELECT state, 1.0e0 / k.k AS x FROM states CROSS JOIN k),
      ${(1 to 4).map(hitsStepCte).mkString(",")},
      outs AS (SELECT cur AS state, CAST(SUM(n) AS BIGINT) AS o FROM pm
               GROUP BY 1),
      ins AS (SELECT nxt AS state, CAST(SUM(n) AS BIGINT) AS i FROM pm
              GROUP BY 1)
      SELECT s.state AS event_type,
        CAST(FLOOR(h.x * 1000000) AS BIGINT) AS hub_micros,
        CAST(FLOOR(a.x * 1000000) AS BIGINT) AS auth_micros,
        COALESCE(o.o, 0) AS out_transitions,
        COALESCE(i.i, 0) AS in_transitions
      FROM states s
      JOIN h4 h ON h.state = s.state
      JOIN a4 a ON a.state = s.state
      LEFT JOIN outs o ON o.state = s.state
      LEFT JOIN ins i ON i.state = s.state
      ORDER BY event_type""")) { (s, dir) =>
    import s.implicits._
    val ev = load(s, dir)
    val w = Window.partitionBy($"user_id").orderBy($"us", $"event_id")
    val pairs = ev
      .select($"user_id", $"event_type", expr("ts div 1000").as("us"),
        $"event_id")
      .withColumn("nxt", lead($"event_type", 1).over(w))
      .filter($"nxt".isNotNull)
      .select($"event_type".as("cur"), $"nxt")
    val states = ev.select($"event_type").distinct()
      .as[String].collect().toSeq.sorted
    hitsOverPairs(pairs, states)
  }

  /** The HITS tail over a (cur, nxt) pair frame: one hash agg to the
    * guarded |types|² cell matrix, the exact driver fold, the readout
    * — shared by the batch query and the streaming twin
    * (st_hits_transitions). */
  def hitsOverPairs(pairs: DataFrame, states: Seq[String]): DataFrame = {
    val s = pairs.sparkSession
    import s.implicits._
    val pm = pairs.groupBy($"cur", $"nxt").agg(count(lit(1)).as("n"))
    val rows = pm.collect()
    require(rows.length <= 65536,
      s"transition matrix too large for a driver fold: ${rows.length} cells")
    val cells = rows.toSeq.map(r =>
      (r.getString(0), r.getString(1), r.getLong(2)))
    val (h, a) = hitsFold(cells, states, rounds = 4)
    val outs = cells.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val ins = cells.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    states.map(st => (st,
        math.floor(h(st) * 1000000).toLong,
        math.floor(a(st) * 1000000).toLong,
        outs.getOrElse(st, 0L), ins.getOrElse(st, 0L)))
      .toDF("event_type", "hub_micros", "auth_micros",
        "out_transitions", "in_transitions")
      .orderBy($"event_type")
  }

  /** The HITS driver fold over bounded (src, dst, weight) cells,
    * replicating [[hitsStepCte]]'s float discipline half-step for
    * half-step (9dp HALF_UP contribution rounding, exact decimal sums,
    * one double division per normalization). Returns (hub, authority)
    * score maps after `rounds` synchronous a-then-h updates from the
    * uniform hub vector. */
  private[graft] def hitsFold(cells: Seq[(String, String, Long)],
      states: Seq[String], rounds: Int)
      : (Map[String, Double], Map[String, Double]) = {
    import java.math.{BigDecimal => JBD, RoundingMode}
    def half(v: Map[String, Double], bySrc: Boolean)
        : Map[String, Double] = {
      val sums = scala.collection.mutable.HashMap.empty[String, JBD]
      for ((cur, nxt, n) <- cells) {
        val (src, dst) = if (bySrc) (cur, nxt) else (nxt, cur)
        v.get(src).foreach { x =>
          val c = JBD.valueOf(x * n).setScale(9, RoundingMode.HALF_UP)
          sums(dst) = sums.getOrElse(dst, JBD.ZERO).add(c)
        }
      }
      val tt = sums.values.foldLeft(JBD.ZERO)(_.add(_))
      states.map(st => st ->
        (if (tt.signum == 0) 0.0
         else sums.getOrElse(st, JBD.ZERO).doubleValue() / tt.doubleValue()))
        .toMap
    }
    var h: Map[String, Double] = states.map(_ -> 1.0 / states.size).toMap
    var a: Map[String, Double] = states.map(_ -> 0.0).toMap
    for (_ <- 1 to rounds) {
      a = half(h, bySrc = true) // authorities gather over in-edges
      h = half(a, bySrc = false) // hubs gather over out-edges
    }
    (h, a)
  }

  /** One truncated-Neumann oracle round: v_{k+1}(i) = Σ_j Q_ij·v_k(j)
    * with 9dp-rounded products DECIMAL-summed per state; the
    * accumulator rides along exactly (decimal + decimal). va is
    * MATERIALIZED: each round references its predecessor through two
    * paths (mc and the acc carry), and DuckDB's CTE inlining would
    * otherwise double the expanded plan per round — 2²⁴ scans
    * surfaced as "too many open files" before any rows flowed. */
  private def nsStepCte(t: Int): String = s"""
      mc$t AS (SELECT q.cur AS state,
          CAST(round(q.p * v.v, 9) AS DECIMAL(28,12)) AS cc
        FROM q JOIN va${t - 1} v ON v.state = q.nxt),
      ms$t AS (SELECT state, SUM(cc) AS sc FROM mc$t GROUP BY state),
      va$t AS MATERIALIZED (SELECT s.state,
          CAST(COALESCE(m.sc, 0) AS DOUBLE) AS v,
          a.acc + COALESCE(m.sc, 0) AS acc
        FROM states s LEFT JOIN ms$t m ON m.state = s.state
        JOIN va${t - 1} a ON a.state = s.state)"""

  /** EXPECTED STEPS TO CONVERSION from each state — the absorption-time
    * view that completes the Markov trio ([[qMarkovTransitions]]: one
    * step; [[qMarkovStationary]]: the limit; this: how LONG the walk to
    * 'purchase' is from each starting behavior). t = Σ_k Q^k·1 over the
    * purchase-deleted substochastic matrix Q, TRUNCATED at K = 24
    * rounds — the tail is bounded by ρ^K/(1−ρ) with ρ = per-step
    * non-conversion mass (~0.8 here ⇒ ≲ 2.5% underestimate), and both
    * engines replay the identical 24 rounds (9dp-rounded products,
    * DECIMAL sums — the stationary query's discipline, plus an exact
    * decimal ACCUMULATOR so the partial sums never re-round). The
    * one-step conversion probability rides alongside for context.
    *
    * Scale shape: one pair scan (the transitions window), then 24
    * rounds over the |types|² matrix — constant work per round. */
  val qConversionSteps: Spec = Spec(
    "ev_conversion_steps",
    oracle = Some(s"""
      WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us, event_id
                 FROM events),
      pr AS (SELECT user_id, event_type AS cur,
          lead(event_type) OVER (PARTITION BY user_id ORDER BY us, event_id) AS nxt
        FROM e),
      c AS (SELECT cur, nxt, COUNT(*) AS n FROM pr WHERE nxt IS NOT NULL
            GROUP BY 1, 2),
      t AS (SELECT cur, SUM(n) AS tot FROM c GROUP BY 1),
      pm AS (SELECT c.cur, c.nxt, round(CAST(c.n AS DOUBLE) / t.tot, 6) AS p
        FROM c JOIN t ON t.cur = c.cur),
      q AS MATERIALIZED (SELECT cur, nxt, p FROM pm
            WHERE cur <> 'purchase' AND nxt <> 'purchase'),
      states AS MATERIALIZED (SELECT DISTINCT cur AS state FROM pm
                 WHERE cur <> 'purchase'),
      va0 AS (SELECT state, 1.0e0 AS v,
          CAST(1.0 AS DECIMAL(28,12)) AS acc FROM states),
      ${(1 to 24).map(nsStepCte).mkString(",")},
      direct AS (SELECT cur AS state, p AS p_convert FROM pm
                 WHERE nxt = 'purchase')
      SELECT a.state AS event_type,
        CAST(FLOOR(CAST(a.acc AS DOUBLE) * 1000000) AS BIGINT)
          AS exp_steps_micros,
        COALESCE(d.p_convert, 0.0e0) AS p_convert_1step
      FROM va24 a LEFT JOIN direct d ON d.state = a.state
      ORDER BY event_type""")) { (s, dir) =>
    import s.implicits._
    val cells = collectMatrix(transitionMatrix(load(s, dir)))
    val q = cells.filter(c => c._1 != "purchase" && c._2 != "purchase")
    val states = cells.collect {
      case (cur, _, _) if cur != "purchase" => cur }.distinct.sorted
    var v: Map[String, Double] = states.map(_ -> 1.0).toMap
    var acc: Map[String, java.math.BigDecimal] = states.map(_ ->
      java.math.BigDecimal.ONE.setScale(12)).toMap
    for (_ <- 1 to 24) {
      val sums = matVec(q, v, byCur = true)
      v = states.map(st => st ->
        sums.getOrElse(st, java.math.BigDecimal.ZERO).doubleValue()).toMap
      acc = states.map(st => st ->
        acc(st).add(sums.getOrElse(st, java.math.BigDecimal.ZERO))).toMap
    }
    val direct = cells.collect {
      case (cur, "purchase", p) => cur -> p }.toMap
    states.map(st =>
        (st, math.floor(acc(st).doubleValue() * 1000000).toLong,
          direct.getOrElse(st, 0.0)))
      .toDF("event_type", "exp_steps_micros", "p_convert_1step")
      .orderBy($"event_type")
  }

  /** Two-way additive SEASONAL DECOMPOSITION of the hourly rate (one
    * type, 'error', to keep output focused): each hour's count splits
    * into the day trend (that day's mean hourly count), the hour-of-day
    * seasonal (that slot's mean across days) and the residual
    * n − trend − seasonal + grand-mean — the classic two-way ANOVA
    * decomposition that [[qRateAnomaly]]'s trailing z-score can't give:
    * a nightly batch job stops looking anomalous once the 02:00 slot
    * carries its own baseline. Means are exact integer sums with one
    * double division (observed hours only — absent slots stay absent);
    * residual arithmetic is fixed IEEE order.
    *
    * Scale shape: three calendar-bounded hash aggs over the hourly
    * count table (hours × types rows, never events) joined back
    * broadcast-small. */
  /** Decomposition tail over an (event_type, window_start, n) hourly
    * count table — day and hour-of-day derive from the window_start
    * STRING so the batch query and the streaming twin
    * (st_seasonal_decompose) share it verbatim. */
  def seasonalOverHourCounts(hc0: DataFrame): DataFrame = {
    val s = hc0.sparkSession
    import s.implicits._
    val hc = hc0.select($"event_type", $"window_start", $"n",
      substring($"window_start", 1, 10).as("d"),
      substring($"window_start", 12, 2).cast("long").as("h"))
    val se = hc.groupBy($"event_type", $"h")
      .agg(sum($"n").as("ssn"), count(lit(1)).as("scn"))
    val tr = hc.groupBy($"event_type", $"d")
      .agg(sum($"n").as("tsn"), count(lit(1)).as("tcn"))
    val g = hc.groupBy($"event_type")
      .agg(sum($"n").as("gsn"), count(lit(1)).as("gcn"))
    hc.join(broadcast(tr), Seq("event_type", "d"))
      .join(broadcast(se), Seq("event_type", "h"))
      .join(broadcast(g), "event_type")
      .select($"event_type", $"window_start", $"n".as("n_events"),
        round($"tsn".cast("double") / $"tcn", 6).as("trend_day"),
        round($"ssn".cast("double") / $"scn", 6).as("seasonal_hour"),
        round($"n" - $"tsn".cast("double") / $"tcn" - $"ssn".cast("double") / $"scn"
          + $"gsn".cast("double") / $"gcn", 6).as("residual"))
      .orderBy($"event_type", $"window_start")
  }

  /** The decomposition oracle tail over ANY `hc` CTE producing
    * (event_type, window_start, n) — shared by the batch query, the
    * complete-mode stream twin, and the append-mode twin (whose hc is
    * the closed-hour prefix). */
  def seasonalOracleOver(hcCte: String): String = s"""
      WITH $hcCte,
      hx AS (SELECT event_type, window_start, n,
          substr(window_start, 1, 10) AS d,
          CAST(substr(window_start, 12, 2) AS BIGINT) AS h
        FROM hc),
      se AS (SELECT event_type, h, SUM(n) AS sn, COUNT(*) AS cn FROM hx GROUP BY 1, 2),
      tr AS (SELECT event_type, d, SUM(n) AS sn, COUNT(*) AS cn FROM hx GROUP BY 1, 2),
      g AS (SELECT event_type, SUM(n) AS sn, COUNT(*) AS cn FROM hx GROUP BY 1)
      SELECT hx.event_type, hx.window_start, CAST(hx.n AS BIGINT) AS n_events,
        round(CAST(tr.sn AS DOUBLE) / tr.cn, 6) AS trend_day,
        round(CAST(se.sn AS DOUBLE) / se.cn, 6) AS seasonal_hour,
        round(hx.n - CAST(tr.sn AS DOUBLE) / tr.cn - CAST(se.sn AS DOUBLE) / se.cn
          + CAST(g.sn AS DOUBLE) / g.cn, 6) AS residual
      FROM hx
      JOIN tr ON tr.event_type = hx.event_type AND tr.d = hx.d
      JOIN se ON se.event_type = hx.event_type AND se.h = hx.h
      JOIN g ON g.event_type = hx.event_type
      ORDER BY hx.event_type, hx.window_start"""

  /** Oracle shared with st_seasonal_decompose. */
  val seasonalOracleSql: String = seasonalOracleOver(
    """hc AS (SELECT event_type,
          strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
          COUNT(*) AS n
        FROM events WHERE event_type = 'error' GROUP BY 1, 2)""")

  val qSeasonalDecompose: Spec = Spec(
    "ev_seasonal_decompose",
    oracle = Some(seasonalOracleSql)) { (s, dir) =>
    import s.implicits._
    val hourNs = 3600L * 1000 * 1000 * 1000
    seasonalOverHourCounts(load(s, dir)
      .filter($"event_type" === "error")
      .select($"event_type",
        date_format(timestamp_micros(expr(s"(ts - ts % $hourNs) div 1000")),
          "yyyy-MM-dd HH:mm:ss").as("window_start"))
      .groupBy($"event_type", $"window_start")
      .agg(count(lit(1)).as("n")))
  }

  /** Top 3-step event PATHS: the most common (a → b → c) sequences
    * across all users with their share of all 3-step windows — the
    * path-mining complement of [[qMarkovTransitions]] (first-order
    * steps can't see that view→view→click dominates). Two lead()
    * columns over the same per-user window, path-keyed count, rank on
    * the |types|³-bounded path table.
    *
    * Scale shape: the lead window is per-user history-bounded; the
    * path agg has at most |types|³ keys, so the rank window runs on a
    * constant-size frame. */
  /** Shared with the stateful streaming twin st_path_analysis. */
  val pathOracleSql: String = """
      WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us, event_id
                 FROM events),
      p AS (SELECT user_id, event_type AS a,
          lead(event_type, 1) OVER w AS b, lead(event_type, 2) OVER w AS c
        FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
      c3 AS (SELECT a || '>' || b || '>' || c AS path, COUNT(*) AS n
        FROM p WHERE b IS NOT NULL AND c IS NOT NULL GROUP BY 1),
      t AS (SELECT SUM(n) AS tot FROM c3),
      r AS (SELECT path, n, row_number() OVER (ORDER BY n DESC, path) AS rk
            FROM c3)
      SELECT CAST(rk AS BIGINT) AS rk, path, CAST(n AS BIGINT) AS n_paths,
        round(CAST(n AS DOUBLE) / t.tot, 6) AS share
      FROM r CROSS JOIN t WHERE rk <= 15 ORDER BY rk"""

  val qPathAnalysis: Spec = Spec(
    "ev_path_analysis",
    oracle = Some(pathOracleSql)) { (s, dir) =>
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"us", $"event_id")
    pathsOverTriples(load(s, dir)
      .select($"user_id", $"event_type", expr("ts div 1000").as("us"),
        $"event_id")
      .select($"event_type".as("a"),
        lead($"event_type", 1).over(w).as("b"),
        lead($"event_type", 2).over(w).as("c"))
      .filter($"b".isNotNull && $"c".isNotNull))
  }

  /** Top-path tail over an (a, b, c) triple frame — shared by the
    * batch query and the stateful streaming twin (st_path_analysis). */
  def pathsOverTriples(triples: DataFrame): DataFrame = {
    val s = triples.sparkSession
    import s.implicits._
    val paths = triples
      .groupBy(concat_ws(">", $"a", $"b", $"c").as("path"))
      .agg(count(lit(1)).as("n"))
    val tot = broadcast(paths.agg(sum($"n").as("tot")))
    // |types|³-bounded frame: collapse to one sorted array + posexplode
    // (the queryFrame idiom) — never an unpartitioned rank window
    paths
      .agg(sort_array(collect_list(
        struct((-$"n").as("negn"), $"path", $"n"))).as("ps"))
      .select(posexplode($"ps").as(Seq("i", "p")))
      .select(($"i" + 1).cast("long").as("rk"), $"p.path".as("path"),
        $"p.n".as("n_paths"))
      .filter($"rk" <= 15)
      .crossJoin(tot)
      .select($"rk", $"path", $"n_paths",
        round($"n_paths".cast("double") / $"tot", 6).as("share"))
      .orderBy($"rk")
  }

  /** SEASONALLY-ADJUSTED anomaly flags: hours whose decomposition
    * RESIDUAL ([[seasonalOverHourCounts]]) sits ≥3 robust z-scores
    * (median/MAD, the [[qValueOutliers]] rule) from its type's
    * residual distribution — the alarm [[qRateAnomaly]]'s trailing
    * baseline raises falsely on recurring slots: here the 02:00 batch
    * job is part of the seasonal term and only NOVEL deviations
    * remain. Median/MAD are exact percentile(0.5); z arithmetic is
    * per-row fixed IEEE order on identical 6dp residuals.
    *
    * Scale shape: residuals ride the shared tail (hours-scale); the
    * per-type med/MAD pair is a types-sized agg broadcast back. */
  val qSeasonalAnomaly: Spec = Spec(
    "ev_seasonal_anomaly",
    oracle = Some("""
      WITH hc AS (SELECT event_type,
          strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
          COUNT(*) AS n
        FROM events WHERE event_type = 'error' GROUP BY 1, 2),
      hx AS (SELECT event_type, window_start, n,
          substr(window_start, 1, 10) AS d,
          CAST(substr(window_start, 12, 2) AS BIGINT) AS h FROM hc),
      se AS (SELECT event_type, h, SUM(n) AS sn, COUNT(*) AS cn FROM hx GROUP BY 1, 2),
      tr AS (SELECT event_type, d, SUM(n) AS sn, COUNT(*) AS cn FROM hx GROUP BY 1, 2),
      g AS (SELECT event_type, SUM(n) AS sn, COUNT(*) AS cn FROM hx GROUP BY 1),
      r AS (SELECT hx.event_type, hx.window_start, hx.n,
          round(hx.n - CAST(tr.sn AS DOUBLE) / tr.cn - CAST(se.sn AS DOUBLE) / se.cn
            + CAST(g.sn AS DOUBLE) / g.cn, 6) AS residual
        FROM hx JOIN tr ON tr.event_type = hx.event_type AND tr.d = hx.d
        JOIN se ON se.event_type = hx.event_type AND se.h = hx.h
        JOIN g ON g.event_type = hx.event_type),
      med AS (SELECT event_type, quantile_cont(residual, 0.5) AS md
              FROM r GROUP BY 1),
      mad AS (SELECT r.event_type,
          quantile_cont(abs(r.residual - m.md), 0.5) AS mad, MIN(m.md) AS md
        FROM r JOIN med m ON m.event_type = r.event_type GROUP BY 1)
      SELECT r.event_type, r.window_start, CAST(r.n AS BIGINT) AS n_events,
        r.residual,
        round((r.residual - mad.md) / (1.4826 * mad.mad), 6) AS seasonal_z
      FROM r JOIN mad ON mad.event_type = r.event_type
      WHERE abs((r.residual - mad.md) / (1.4826 * mad.mad)) >= 3
      ORDER BY r.event_type, r.window_start""")) { (s, dir) =>
    import s.implicits._
    val hourNs = 3600L * 1000 * 1000 * 1000
    val r = seasonalOverHourCounts(load(s, dir)
      .filter($"event_type" === "error")
      .select($"event_type",
        date_format(timestamp_micros(expr(s"(ts - ts % $hourNs) div 1000")),
          "yyyy-MM-dd HH:mm:ss").as("window_start"))
      .groupBy($"event_type", $"window_start")
      .agg(count(lit(1)).as("n")))
      .select($"event_type", $"window_start", $"n_events", $"residual")
      .localCheckpoint() // med/MAD and the flag scan share the residuals
    val med = r.groupBy($"event_type")
      .agg(expr("percentile(residual, 0.5)").as("md"))
    val mad = r.join(broadcast(med), "event_type")
      .groupBy($"event_type")
      .agg(expr("percentile(abs(residual - md), 0.5)").as("mad"),
        min($"md").as("md"))
    val z = ($"residual" - $"md") / (lit(1.4826) * $"mad")
    r.join(broadcast(mad), "event_type")
      .filter(abs(z) >= 3)
      .select($"event_type", $"window_start", $"n_events", $"residual",
        round(z, 6).as("seasonal_z"))
      .orderBy($"event_type", $"window_start")
  }

  /** DAU / MAU30 STICKINESS per day: daily active users over trailing
    * 30-day distinct actives — THE product-health ratio next to
    * [[qDauNewReturning]]'s split. Exact (no sketch): the (day, user)
    * dedup is the sufficient statistic, and the trailing-window
    * distinct expands each active-day row into the ≤30 calendar days
    * it supports — a bounded 30× blowup of the USER-DAY table (never
    * events), then one (day, user)-distinct hash agg. At petabyte
    * scale the same plan holds because user-days is the small frame;
    * if it weren't, the KMV path (d_kmv_setops) slots in per day.
    * DuckDB date arithmetic and Spark date_sub agree on the calendar
    * window by construction. */
  val qStickiness: Spec = Spec(
    "ev_stickiness",
    oracle = Some("""
      WITH du AS (SELECT DISTINCT strftime(ts, '%Y-%m-%d') AS d, user_id
                  FROM events),
      days AS (SELECT DISTINCT d FROM du),
      dau AS (SELECT d, COUNT(*) AS dau FROM du GROUP BY 1),
      mau AS (SELECT days.d, COUNT(DISTINCT du.user_id) AS mau
        FROM days JOIN du ON du.d <= days.d
          AND du.d >= strftime(CAST(days.d AS DATE) - INTERVAL '29 days', '%Y-%m-%d')
        GROUP BY 1)
      SELECT dau.d AS day, CAST(dau.dau AS BIGINT) AS dau,
        CAST(mau.mau AS BIGINT) AS mau30,
        round(CAST(dau.dau AS DOUBLE) / mau.mau, 6) AS stickiness
      FROM dau JOIN mau ON mau.d = dau.d ORDER BY day""")) { (s, dir) =>
    import s.implicits._
    val du = load(s, dir)
      .select(date_format(timestamp_micros(expr("ts div 1000")), "yyyy-MM-dd")
        .as("d"), $"user_id")
      .distinct()
      .localCheckpoint() // dau, the day grid and the window join share it
    val days = du.select($"d").distinct()
    val dau = du.groupBy($"d").agg(count(lit(1)).as("dau"))
    val mau = days.as("x")
      .join(du.as("u"),
        $"u.d" <= $"x.d" &&
          $"u.d" >= date_format(date_sub(to_date($"x.d"), 29), "yyyy-MM-dd"))
      .groupBy($"x.d".as("d"))
      .agg(countDistinct($"u.user_id").as("mau"))
    dau.join(mau, "d")
      .select($"d".as("day"), $"dau", $"mau".as("mau30"),
        round($"dau".cast("double") / $"mau", 6).as("stickiness"))
      .orderBy($"day")
  }

  /** Daily BOUNCE RATE: users whose day holds exactly one event over
    * all active users that day — the shallow-engagement ratio read
    * next to [[qStickiness]]. One (day, user) hash agg then a
    * days-keyed summary; integer counts, one division. */
  val qBounceRate: Spec = Spec(
    "ev_bounce_rate",
    oracle = Some("""
      WITH ue AS (SELECT strftime(ts, '%Y-%m-%d') AS d, user_id, COUNT(*) AS n
        FROM events GROUP BY 1, 2)
      SELECT d AS day, CAST(COUNT(*) AS BIGINT) AS active_users,
        CAST(SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT) AS bounced,
        round(CAST(SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*), 6)
          AS bounce_rate
      FROM ue GROUP BY d ORDER BY day""")) { (s, dir) =>
    import s.implicits._
    load(s, dir)
      .select(date_format(timestamp_micros(expr("ts div 1000")), "yyyy-MM-dd")
        .as("d"), $"user_id")
      .groupBy($"d", $"user_id").agg(count(lit(1)).as("n"))
      .groupBy($"d")
      .agg(count(lit(1)).as("active_users"),
        sum(when($"n" === 1, 1L).otherwise(0L)).as("bounced"))
      .select($"d".as("day"), $"active_users", $"bounced",
        round($"bounced".cast("double") / $"active_users", 6).as("bounce_rate"))
      .orderBy($"day")
  }

  /** User CONCENTRATION (Pareto) report: users ranked by event count,
    * cut into deciles, each decile's share of all events — the
    * "top 10% generate X%" skew report for capacity planning and
    * abuse triage (a heavy decile-0 share also warns the engine: those
    * keys are the shuffle hot spots [[graft.ops.Skew]] exists for).
    * Exact integer counts; one division per decile row.
    *
    * Scale shape: per-user counts are one hash agg; the global rank
    * rides the two-phase [[graft.ops.Skew.globalRowNumber]] over the
    * USER-scale frame (never events, never one reducer); totals are a
    * 1-row broadcast. */
  val qUserConcentration: Spec = Spec(
    "ev_user_concentration",
    oracle = Some("""
      WITH u AS (SELECT user_id, COUNT(*) AS n FROM events GROUP BY 1),
      r AS (SELECT user_id, n,
          row_number() OVER (ORDER BY n DESC, user_id) AS rk,
          (SELECT COUNT(*) FROM u) AS nu,
          (SELECT SUM(n) FROM u) AS tot
        FROM u),
      d AS (SELECT ((rk - 1) * 10) // nu AS decile, n, tot FROM r)
      SELECT CAST(decile AS BIGINT) AS decile,
        CAST(COUNT(*) AS BIGINT) AS n_users,
        CAST(SUM(n) AS BIGINT) AS n_events,
        round(CAST(SUM(n) AS DOUBLE) / MIN(tot), 6) AS share
      FROM d GROUP BY decile ORDER BY decile""")) { (s, dir) =>
    import s.implicits._
    val u = load(s, dir).groupBy($"user_id").agg(count(lit(1)).as("n"))
    val ranked = graft.ops.Skew.globalRowNumber(
      u.withColumn("negn", -$"n"), Seq($"negn", $"user_id"))
    val tots = broadcast(u.agg(count(lit(1)).as("nu"), sum($"n").as("tot")))
    ranked.crossJoin(tots)
      .select(expr("((rn - 1) * 10) div nu").as("decile"), $"n", $"tot")
      .groupBy($"decile")
      .agg(count(lit(1)).as("n_users"), sum($"n").as("n_events"),
        round(sum($"n").cast("double") / min($"tot"), 6).as("share"))
      .select($"decile".cast("long").as("decile"), $"n_users", $"n_events",
        $"share")
      .orderBy($"decile")
  }


  /** INTER-ARRIVAL gap percentiles per event type: the time since the
    * user's previous event (any type), attributed to the arriving
    * event's type — the cadence profile behind session-gap and
    * rate-limit tuning ([[qSessionize]]'s 30-minute gap should sit far
    * in this distribution's tail, which this query verifies). Exact
    * integer micros gaps, engine-identical percentile interpolation,
    * one division to seconds.
    *
    * Scale shape: one per-user lag window (history-bounded frames), a
    * types-keyed percentile agg over the gap frame. */
  val qInterArrival: Spec = Spec(
    "ev_interarrival",
    oracle = Some("""
      WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us, event_id
                 FROM events),
      g AS (SELECT event_type,
          us - lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id) AS gap
        FROM e)
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_gaps,
        round(quantile_cont(gap, 0.5) / 1000000.0, 6) AS p50_sec,
        round(quantile_cont(gap, 0.95) / 1000000.0, 6) AS p95_sec
      FROM g WHERE gap IS NOT NULL GROUP BY event_type
      ORDER BY event_type""")) { (s, dir) =>
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"us", $"event_id")
    load(s, dir)
      .select($"user_id", $"event_type", expr("ts div 1000").as("us"),
        $"event_id")
      .withColumn("gap", $"us" - lag($"us", 1).over(w))
      .filter($"gap".isNotNull)
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n_gaps"),
        round(expr("percentile(gap, 0.5)") / 1000000.0, 6).as("p50_sec"),
        round(expr("percentile(gap, 0.95)") / 1000000.0, 6).as("p95_sec"))
      .orderBy($"event_type")
  }

  /** MULTI-TOUCH revenue ATTRIBUTION: each purchase's value credited to
    * the user's view/click touches inside a 7-day lookback under three
    * standard models in one pass — first-touch (all value to the
    * earliest touch), last-touch (to the latest), and linear (split
    * evenly). Purchases with no touch in the window credit a synthetic
    * `(direct)` channel, so every model's column sums to total purchase
    * revenue — the invariant that makes the three models comparable.
    *
    * Exactness: value rides as scale-6 micro-units (BIGINT); the linear
    * split is integer floor-division with the remainder assigned to the
    * first touch (largest-remainder style, deterministic via the
    * (ts, event_id) total order) — no float division anywhere, so the
    * per-model totals are exact and engine-identical.
    *
    * Scale shape: ONE banded join (touches to purchases on user_id +
    * 7-day band — per-user × lookback-bounded matches, the
    * [[qAsofTolerance]] argument), then ONE sorted window over p_id:
    * rf (first), rl derived as n_rows − rf + 1 (the reverse rank needs
    * no second sort), and both counts on the same spec's unbounded
    * frame — a single Exchange + WindowExec. The three models unpivot
    * via `stack` (one Generate, no triple re-scan of the join), and the
    * final agg is |models|×|channels|-keyed — constant-size output. */
  /** Shared by ev_attribution and its stateful streaming twin
    * st_attribution (identical credit semantics → identical rollup). */
  val attributionOracleSql: String = """
      WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us, event_id,
          CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT) AS vm
        FROM events),
      p AS (SELECT event_id AS p_id, user_id, us AS p_us, vm FROM e
            WHERE event_type = 'purchase'),
      t AS (SELECT user_id, us AS t_us, event_id AS t_id,
              event_type AS touch_type
            FROM e WHERE event_type IN ('view', 'click')),
      j AS (SELECT p.p_id, p.vm, t.touch_type, t.t_us, t.t_id
            FROM p LEFT JOIN t ON t.user_id = p.user_id
              AND t.t_us <= p.p_us AND t.t_us > p.p_us - 604800000000),
      w AS (SELECT p_id, vm, coalesce(touch_type, '(direct)') AS touch_type,
          COUNT(t_id) OVER (PARTITION BY p_id) AS n,
          COUNT(*) OVER (PARTITION BY p_id) AS nr,
          row_number() OVER (PARTITION BY p_id ORDER BY t_us, t_id) AS rf
        FROM j),
      c AS (SELECT touch_type,
          CASE WHEN rf = 1 THEN vm END AS first_credit,
          CASE WHEN nr - rf + 1 = 1 THEN vm END AS last_credit,
          CASE WHEN n = 0 THEN vm
               ELSE vm // n + CASE WHEN rf = 1 THEN vm % n ELSE 0 END
          END AS linear_credit
        FROM w),
      u AS (
        SELECT 'first' AS model, touch_type, first_credit AS credit FROM c
        UNION ALL
        SELECT 'last', touch_type, last_credit FROM c
        UNION ALL
        SELECT 'linear', touch_type, linear_credit FROM c)
      SELECT model, touch_type,
        CAST(SUM(credit) AS DOUBLE) / 1000000.0 AS attributed_value,
        CAST(COUNT(credit) AS BIGINT) AS n_credits
      FROM u WHERE credit IS NOT NULL
      GROUP BY model, touch_type ORDER BY model, touch_type"""

  val qAttribution: Spec = Spec(
    "ev_attribution",
    oracle = Some(attributionOracleSql),
    bench = true) { (s, dir) =>
    import s.implicits._
    val lookbackUs = 7L * 24 * 3600 * 1000 * 1000
    val e = load(s, dir).select($"user_id", $"event_type",
      expr("ts div 1000").as("us"), $"event_id",
      ($"value".cast("decimal(18,6)") * 1000000).cast("long").as("vm"))
    val p = e.filter($"event_type" === "purchase")
      .select($"event_id".as("p_id"), $"user_id", $"us".as("p_us"), $"vm")
    val t = e.filter($"event_type".isin("view", "click"))
      .select($"user_id".as("t_user"), $"us".as("t_us"),
        $"event_id".as("t_id"), $"event_type".as("touch_type"))
    val j = p.join(t,
      $"t_user" === $"user_id" && $"t_us" <= $"p_us" &&
        $"t_us" > $"p_us" - lookbackUs, "left")
    // one sorted window spec carries the first-rank AND both counts
    // (unbounded frame); the reverse rank is nr - rf + 1, not a second
    // sort — the (t_us, t_id) order is total, so the identity is exact
    val wf = Window.partitionBy($"p_id").orderBy($"t_us", $"t_id")
    val full = wf.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val w = j.select($"vm",
      coalesce($"touch_type", lit("(direct)")).as("touch_type"),
      count($"t_id").over(full).as("n"),
      count(lit(1)).over(full).as("nr"),
      row_number().over(wf).as("rf"))
    w.select($"touch_type",
        when($"rf" === 1, $"vm").as("first_credit"),
        when($"nr" - $"rf" + 1 === 1, $"vm").as("last_credit"),
        when($"n" === 0, $"vm")
          .otherwise(expr("vm div n") +
            when($"rf" === 1, $"vm" % $"n").otherwise(0L))
          .as("linear_credit"))
      .select($"touch_type", expr(
        "stack(3, 'first', first_credit, 'last', last_credit, " +
          "'linear', linear_credit) AS (model, credit)"))
      .filter($"credit".isNotNull)
      .groupBy($"model", $"touch_type")
      .agg((sum($"credit").cast("double") / 1000000.0).as("attributed_value"),
        count($"credit").as("n_credits"))
      .select($"model", $"touch_type", $"attributed_value", $"n_credits")
      .orderBy($"model", $"touch_type")
  }

  /** TIME-DECAY attribution: the fourth standard model — credit decays
    * with touch age. Weights are EXACT integers (w = 7 − whole days of
    * age ∈ [1,7], so a same-day touch weighs 7× a six-day-old one);
    * each touch gets ⌊vm·w / W⌋ micro-units and the first touch takes
    * the remainder, so per-purchase conservation is exact — the same
    * largest-remainder discipline as [[qAttribution]]'s linear model,
    * generalized to non-uniform weights. `(direct)` purchases keep
    * full value.
    *
    * Scale shape: the same banded join + ONE sorted window spec
    * (rank + both weight sums ride one sort; the base-credit sum is a
    * second frame on the same partitioning, so the exchange is shared);
    * output is |channels|-keyed. */
  val qAttributionDecay: Spec = Spec(
    "ev_attribution_decay",
    oracle = Some("""
      WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us, event_id,
          CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT) AS vm
        FROM events),
      p AS (SELECT event_id AS p_id, user_id, us AS p_us, vm FROM e
            WHERE event_type = 'purchase'),
      t AS (SELECT user_id, us AS t_us, event_id AS t_id,
              event_type AS touch_type
            FROM e WHERE event_type IN ('view', 'click')),
      j AS (SELECT p.p_id, p.vm, p.p_us, t.touch_type, t.t_us, t.t_id
            FROM p LEFT JOIN t ON t.user_id = p.user_id
              AND t.t_us <= p.p_us AND t.t_us > p.p_us - 604800000000),
      w AS (SELECT p_id, vm, coalesce(touch_type, '(direct)') AS touch_type,
          CASE WHEN t_id IS NULL THEN 0
               ELSE 7 - (p_us - t_us) // 86400000000 END AS wt,
          COUNT(t_id) OVER (PARTITION BY p_id) AS n,
          row_number() OVER (PARTITION BY p_id ORDER BY t_us, t_id) AS rf
        FROM j),
      s AS (SELECT *, SUM(wt) OVER (PARTITION BY p_id) AS tw FROM w),
      b AS (SELECT *, CASE WHEN n = 0 THEN vm ELSE (vm * wt) // tw END
              AS base FROM s),
      c AS (SELECT *, SUM(base) OVER (PARTITION BY p_id) AS bsum FROM b),
      cr AS (SELECT touch_type,
          base + CASE WHEN rf = 1 THEN vm - bsum ELSE 0 END AS credit
        FROM c)
      SELECT touch_type,
        CAST(SUM(credit) AS DOUBLE) / 1000000.0 AS attributed_value,
        CAST(COUNT(*) AS BIGINT) AS n_credits
      FROM cr GROUP BY touch_type ORDER BY touch_type""")) { (s, dir) =>
    import s.implicits._
    val lookbackUs = 7L * 24 * 3600 * 1000 * 1000
    val dayUs = 86400000000L
    val e = load(s, dir).select($"user_id", $"event_type",
      expr("ts div 1000").as("us"), $"event_id",
      ($"value".cast("decimal(18,6)") * 1000000).cast("long").as("vm"))
    val p = e.filter($"event_type" === "purchase")
      .select($"event_id".as("p_id"), $"user_id", $"us".as("p_us"), $"vm")
    val t = e.filter($"event_type".isin("view", "click"))
      .select($"user_id".as("t_user"), $"us".as("t_us"),
        $"event_id".as("t_id"), $"event_type".as("touch_type"))
    val j = p.join(t,
      $"t_user" === $"user_id" && $"t_us" <= $"p_us" &&
        $"t_us" > $"p_us" - lookbackUs, "left")
    val wf = Window.partitionBy($"p_id").orderBy($"t_us", $"t_id")
    val full = wf.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    j.select($"p_id", $"vm",
        coalesce($"touch_type", lit("(direct)")).as("touch_type"),
        when($"t_id".isNull, 0L)
          .otherwise(lit(7L) - expr(s"(p_us - t_us) div $dayUs")).as("wt"),
        count($"t_id").over(full).as("n"),
        row_number().over(wf).as("rf"))
      .withColumn("tw", sum($"wt").over(Window.partitionBy($"p_id")))
      .withColumn("base",
        when($"n" === 0, $"vm").otherwise(expr("(vm * wt) div tw")))
      .withColumn("bsum", sum($"base").over(Window.partitionBy($"p_id")))
      .select($"touch_type",
        ($"base" + when($"rf" === 1, $"vm" - $"bsum").otherwise(0L))
          .as("credit"))
      .groupBy($"touch_type")
      .agg((sum($"credit").cast("double") / 1000000.0).as("attributed_value"),
        count(lit(1)).as("n_credits"))
      .orderBy($"touch_type")
  }

  /** RFM SEGMENTATION: per purchasing user, Recency (days since last
    * purchase vs the corpus's latest purchase), Frequency (purchase
    * count) and Monetary (exact micro-unit revenue), each cut into
    * quintile scores 1–5 by global rank, then mapped to the classic
    * marketing segments (champion / loyal / big_spender / at_risk /
    * hibernating / regular) and summarized per segment.
    *
    * The quintile is the [[qUserConcentration]] equal-split bucket
    * formula `((rn−1)·5) div n_users + 1` over a deterministic
    * (metric, user_id) total order — pure integer math both engines
    * replay exactly, with none of ntile's remainder-placement
    * ambiguity.
    *
    * Scale shape: purchases collapse to ONE user-keyed hash agg (the
    * frame every later step works on — users, not events); the three
    * global ranks ride [[graft.ops.Skew.globalRowNumber]] sequentially
    * (each a range shuffle of the USER frame + broadcast offsets —
    * never a single-reducer global window, never a join-back: each
    * rank column is appended in place); corpus totals are a 1-row
    * broadcast; the segment rollup is ≤6 rows. */
  val qRfm: Spec = Spec(
    "ev_rfm",
    oracle = Some("""
      WITH p AS (SELECT user_id, epoch_us(ts) AS us,
          CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT) AS vm
        FROM events WHERE event_type = 'purchase'),
      u AS (SELECT user_id, MAX(us) AS mx, CAST(COUNT(*) AS BIGINT) AS f,
              SUM(vm) AS m
            FROM p GROUP BY 1),
      g AS (SELECT MAX(mx) AS mu, COUNT(*) AS nu FROM u),
      r AS (SELECT u.*, CAST((g.mu - u.mx) // 86400000000 AS BIGINT)
              AS r_days, g.nu
            FROM u CROSS JOIN g),
      k AS (SELECT *,
          row_number() OVER (ORDER BY r_days DESC, user_id) AS rr,
          row_number() OVER (ORDER BY f, user_id) AS rf,
          row_number() OVER (ORDER BY m, user_id) AS rm
        FROM r),
      sc AS (SELECT user_id, r_days, f, m,
          ((rr - 1) * 5) // nu + 1 AS r_score,
          ((rf - 1) * 5) // nu + 1 AS f_score,
          ((rm - 1) * 5) // nu + 1 AS m_score
        FROM k),
      seg AS (SELECT *, CASE
          WHEN r_score >= 4 AND f_score >= 4 AND m_score >= 4 THEN 'champion'
          WHEN r_score >= 4 AND f_score >= 4 THEN 'loyal'
          WHEN m_score >= 4 AND r_score >= 3 THEN 'big_spender'
          WHEN r_score <= 2 AND f_score >= 4 THEN 'at_risk'
          WHEN r_score <= 2 AND f_score <= 2 THEN 'hibernating'
          ELSE 'regular' END AS segment
        FROM sc)
      SELECT segment, CAST(COUNT(*) AS BIGINT) AS n_users,
        CAST(SUM(m) AS DOUBLE) / 1000000.0 AS total_value,
        round(CAST(SUM(r_days) AS DOUBLE) / COUNT(*), 6) AS avg_recency_days,
        round(CAST(SUM(f) AS DOUBLE) / COUNT(*), 6) AS avg_frequency
      FROM seg GROUP BY segment ORDER BY segment""")) { (s, dir) =>
    import s.implicits._
    val dayUs = 86400000000L
    val p = load(s, dir).filter($"event_type" === "purchase")
      .select($"user_id", expr("ts div 1000").as("us"),
        ($"value".cast("decimal(18,6)") * 1000000).cast("long").as("vm"))
    val u = p.groupBy($"user_id")
      .agg(max($"us").as("mx"), count(lit(1)).as("f"), sum($"vm").as("m"))
    val g = broadcast(u.agg(max($"mx").as("mu"), count(lit(1)).as("nu")))
    val r = u.crossJoin(g)
      .select($"user_id", $"f", $"m", $"nu",
        expr(s"(mu - mx) div $dayUs").as("r_days"))
    // stalest user ranks 1 → score 1; most recent ranks nu → score 5
    val withRr = graft.ops.Skew.globalRowNumber(
        r.withColumn("negr", -$"r_days"), Seq($"negr", $"user_id"))
      .withColumnRenamed("rn", "rr").drop("negr")
    val withRf = graft.ops.Skew.globalRowNumber(withRr, Seq($"f", $"user_id"))
      .withColumnRenamed("rn", "rf")
    val withRm = graft.ops.Skew.globalRowNumber(withRf, Seq($"m", $"user_id"))
      .withColumnRenamed("rn", "rm")
    val sc = withRm.select($"user_id", $"r_days", $"f", $"m",
      expr("((rr - 1) * 5) div nu + 1").as("r_score"),
      expr("((rf - 1) * 5) div nu + 1").as("f_score"),
      expr("((rm - 1) * 5) div nu + 1").as("m_score"))
    sc.select($"r_days", $"f", $"m",
        when($"r_score" >= 4 && $"f_score" >= 4 && $"m_score" >= 4, "champion")
          .when($"r_score" >= 4 && $"f_score" >= 4, "loyal")
          .when($"m_score" >= 4 && $"r_score" >= 3, "big_spender")
          .when($"r_score" <= 2 && $"f_score" >= 4, "at_risk")
          .when($"r_score" <= 2 && $"f_score" <= 2, "hibernating")
          .otherwise("regular").as("segment"))
      .groupBy($"segment")
      .agg(count(lit(1)).as("n_users"),
        (sum($"m").cast("double") / 1000000.0).as("total_value"),
        round(sum($"r_days").cast("double") / count(lit(1)), 6)
          .as("avg_recency_days"),
        round(sum($"f").cast("double") / count(lit(1)), 6)
          .as("avg_frequency"))
      .orderBy($"segment")
  }

  /** Session ENTRY/EXIT matrix: sessions cut with [[qSessionize]]'s
    * 30-minute gap, each labeled by its first and last event type, then
    * counted per (entry, exit) pair with the mean session depth — the
    * landing/exit-page analysis that tells a funnel owner where
    * sessions start and where they die ([[qBounceRate]] measures HOW
    * MANY die shallow; this says WHERE).
    *
    * Scale shape: the session cut is the per-user lag+running-sum
    * window (history-bounded frames); entry/exit come from ONE
    * (user, session)-keyed hash agg via struct-ordered min_by/max_by —
    * no second window cascade, partial aggregation map-side; the final
    * matrix is |types|²-keyed. */
  val qEntryExit: Spec = Spec(
    "ev_entry_exit",
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
          CAST(SUM(brk) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
            AS session_id
        FROM m),
      fe AS (SELECT user_id, session_id, event_type,
          row_number() OVER (PARTITION BY user_id, session_id
            ORDER BY ts_us, event_id) AS rf,
          COUNT(*) OVER (PARTITION BY user_id, session_id) AS ne
        FROM sessed),
      pairs AS (SELECT user_id, session_id,
          MIN(CASE WHEN rf = 1 THEN event_type END) AS entry_type,
          MIN(CASE WHEN rf = ne THEN event_type END) AS exit_type,
          MIN(ne) AS n_events
        FROM fe GROUP BY 1, 2)
      SELECT entry_type, exit_type, CAST(COUNT(*) AS BIGINT) AS n_sessions,
        round(CAST(SUM(n_events) AS DOUBLE) / COUNT(*), 6) AS avg_events
      FROM pairs GROUP BY 1, 2 ORDER BY entry_type, exit_type""")) { (s, dir) =>
    import s.implicits._
    val gapUs = 1800L * 1000 * 1000
    val w = Window.partitionBy($"user_id").orderBy($"ts_us", $"event_id")
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    load(s, dir)
      .select($"user_id", $"event_id", $"event_type",
        expr("ts div 1000").as("ts_us"))
      .withColumn("brk",
        when(lag($"ts_us", 1).over(w).isNull ||
          $"ts_us" - lag($"ts_us", 1).over(w) > gapUs, 1).otherwise(0))
      .withColumn("session_id", sum($"brk").over(run).cast("long"))
      .groupBy($"user_id", $"session_id")
      .agg(
        min_by($"event_type", struct($"ts_us", $"event_id")).as("entry_type"),
        max_by($"event_type", struct($"ts_us", $"event_id")).as("exit_type"),
        count(lit(1)).as("n_events"))
      .groupBy($"entry_type", $"exit_type")
      .agg(count(lit(1)).as("n_sessions"),
        round(sum($"n_events").cast("double") / count(lit(1)), 6)
          .as("avg_events"))
      .orderBy($"entry_type", $"exit_type")
  }

  private val dayNs = 86400L * 1000 * 1000 * 1000

  /** Per-type daily event counts on a COMPLETE day spine (missing days
    * as 0): the shared grid under the ACF and CUSUM diagnostics. Day
    * index = integer days since epoch — pure long arithmetic on the
    * raw-nanos ts contract. Spine width is calendar-bounded (days ×
    * |types|), so the explode and every downstream per-type window are
    * constant-factor regardless of corpus scale. */
  private def dailyCountSpine(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val counts = load(s, dir)
      .select($"event_type", ($"ts" / lit(dayNs)).cast("long").as("d"))
      .groupBy($"event_type", $"d").agg(count(lit(1)).as("cnt"))
    spineFill(counts)
  }

  /** Complete the per-type day grid from observed (event_type, d, cnt)
    * rows: silent days become x=0. Shared by the batch spine build and
    * the streaming twin (whose counts arrive from a windowed stream). */
  def spineFill(counts: DataFrame): DataFrame = {
    val spine = counts.groupBy(col("event_type"))
      .agg(min(col("d")).as("mn"), max(col("d")).as("mx"))
      .select(col("event_type"), explode(sequence(col("mn"), col("mx"))).as("d"))
    spine.join(counts, Seq("event_type", "d"), "left")
      .select(col("event_type"), col("d"),
        coalesce(col("cnt"), lit(0L)).as("x"))
  }

  /** The oracle's replay of [[dailyCountSpine]]. */
  private val dailySpineSql = """
      raw AS (SELECT event_type,
          CAST(FLOOR(epoch_us(ts) / 86400000000) AS BIGINT) AS d
        FROM events),
      cnts AS (SELECT event_type, d, COUNT(*) AS cnt FROM raw GROUP BY 1, 2),
      bounds AS (SELECT event_type, MIN(d) AS mn, MAX(d) AS mx
        FROM cnts GROUP BY 1),
      spine AS (SELECT b.event_type, CAST(u.d AS BIGINT) AS d
        FROM bounds b CROSS JOIN UNNEST(range(b.mn, b.mx + 1)) AS u(d)),
      grid AS (SELECT s.event_type, s.d, COALESCE(c.cnt, 0) AS x
        FROM spine s LEFT JOIN cnts c
          ON c.event_type = s.event_type AND c.d = s.d)"""

  /** Autocorrelation function of the per-type daily count series at
    * lags 1–7 — the seasonality detector that tells the drift monitors
    * whether a weekly cycle explains an apparent shift (lag-7 spike)
    * before anyone trusts a KS alarm. Pearson correlation over the
    * lag-aligned pairs of the complete daily grid (gaps count as 0 —
    * a silent day is a real observation of zero traffic, not missing
    * data).
    *
    * Engine parity: all six sufficient statistics (n, Σx, Σy, Σx²,
    * Σy², Σxy) are exact integer sums; the discriminants and the final
    * ratio are fixed-order IEEE double ops both engines replay
    * bit-for-bit; zero-variance series yield NULL via an explicit
    * guard, not engine-specific inf. Scale shape: one grid build, ONE
    * per-type window producing all 7 leads, a stack to (lag, x, y),
    * one hash agg — the window frames are calendar-bounded. */
  val qAcfDaily: Spec = Spec(
    "ev_acf_daily",
    oracle = Some(s"""
      WITH $dailySpineSql,
      led AS (SELECT event_type, d, x,
          lead(x, 1) OVER w AS y1, lead(x, 2) OVER w AS y2,
          lead(x, 3) OVER w AS y3, lead(x, 4) OVER w AS y4,
          lead(x, 5) OVER w AS y5, lead(x, 6) OVER w AS y6,
          lead(x, 7) OVER w AS y7
        FROM grid WINDOW w AS (PARTITION BY event_type ORDER BY d)),
      pairs AS (
        SELECT event_type, lag, x, y FROM (
          SELECT event_type, 1 AS lag, x, y1 AS y FROM led UNION ALL
          SELECT event_type, 2, x, y2 FROM led UNION ALL
          SELECT event_type, 3, x, y3 FROM led UNION ALL
          SELECT event_type, 4, x, y4 FROM led UNION ALL
          SELECT event_type, 5, x, y5 FROM led UNION ALL
          SELECT event_type, 6, x, y6 FROM led UNION ALL
          SELECT event_type, 7, x, y7 FROM led)
        WHERE y IS NOT NULL),
      st AS (SELECT event_type, lag,
          CAST(COUNT(*) AS BIGINT) AS n,
          CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
          CAST(SUM(x*x) AS BIGINT) AS sxx, CAST(SUM(y*y) AS BIGINT) AS syy,
          CAST(SUM(x*y) AS BIGINT) AS sxy
        FROM pairs GROUP BY 1, 2)
      SELECT event_type, CAST(lag AS BIGINT) AS lag, n AS n_pairs,
        round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
               - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
          / NULLIF(sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                         - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                      * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                         - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 0), 6)
          AS acf
      FROM st ORDER BY event_type, lag""")) { (s, dir) =>
    import s.implicits._
    val w = Window.partitionBy($"event_type").orderBy($"d")
    val led = dailyCountSpine(s, dir)
      .select($"event_type" +: $"x" +:
        (1 to 7).map(k => lead($"x", k).over(w).as(s"y$k")): _*)
    val pairs = led.select($"event_type",
      expr("stack(7, 1, y1, 2, y2, 3, y3, 4, y4, 5, y5, 6, y6, 7, y7)")
        .as(Seq("lag", "y")), $"x")
      .filter($"y".isNotNull)
    val st = pairs.groupBy($"event_type", $"lag").agg(
      count(lit(1)).as("n"),
      sum($"x").as("sx"), sum($"y").as("sy"),
      sum($"x" * $"x").as("sxx"), sum($"y" * $"y").as("syy"),
      sum($"x" * $"y").as("sxy"))
    def d(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      c.cast("double")
    val den = sqrt((d($"n") * d($"sxx") - d($"sx") * d($"sx")) *
      (d($"n") * d($"syy") - d($"sy") * d($"sy")))
    st.select($"event_type", $"lag".cast("long").as("lag"),
        $"n".cast("long").as("n_pairs"),
        round((d($"n") * d($"sxy") - d($"sx") * d($"sy")) /
          when(den === 0, lit(null)).otherwise(den), 6).as("acf"))
      .orderBy($"event_type", $"lag")
  }

  /** Ljung–Box portmanteau test (Ljung & Box '78) of the per-type
    * daily series against white noise, lags 1–7:
    * Q = N(N+2)·Σₖ ρ̂ₖ²/(N−k) with the STANDARD acf estimator
    * ρ̂ₖ = Σ(xₜ−x̄)(xₜ₊ₖ−x̄)/Σ(xₜ−x̄)² (one global mean — unlike
    * [[qAcfDaily]]'s per-lag Pearson, this is the estimator the test's
    * χ² null distribution assumes). The closing statistic of the
    * time-series kit: ACF locates the cycle, CUSUM the break — Q says
    * whether there is ANY autocorrelation to chase at all.
    *
    * Engine parity: multiplying the acf numerator and denominator by
    * N² clears the rational mean, so ρ̂ₖ = [N²Cₖ − NS(Aₖ+Bₖ) +
    * (N−k)S²] / [N²Q₀ − NS²] is a ratio of EXACT 128-bit integers
    * (Cₖ = Σxₜxₜ₊ₖ, Aₖ/Bₖ the lag-aligned sums, S/Q₀ the global
    * sums); the seven ρ̂ₖ²/(N−k) terms then add in one EXPLICIT
    * fixed-order expression (t1+t2+…+t7 — never a float aggregate
    * whose order the engine picks). Scale shape: identical to
    * [[qAcfDaily]] — one calendar-bounded window for all leads, hash
    * aggs, a 7-way conditional pivot per type. */
  val ljungBoxOracleSql: String = s"""
      WITH $dailySpineSql,
      tot AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
          SUM(x::HUGEINT) AS s, SUM(x::HUGEINT * x) AS q0
        FROM grid GROUP BY 1),
      led AS (SELECT event_type, x,
          lead(x, 1) OVER w AS y1, lead(x, 2) OVER w AS y2,
          lead(x, 3) OVER w AS y3, lead(x, 4) OVER w AS y4,
          lead(x, 5) OVER w AS y5, lead(x, 6) OVER w AS y6,
          lead(x, 7) OVER w AS y7
        FROM grid WINDOW w AS (PARTITION BY event_type ORDER BY d)),
      pairs AS (
        SELECT event_type, lag, x, y FROM (
          SELECT event_type, 1 AS lag, x, y1 AS y FROM led UNION ALL
          SELECT event_type, 2, x, y2 FROM led UNION ALL
          SELECT event_type, 3, x, y3 FROM led UNION ALL
          SELECT event_type, 4, x, y4 FROM led UNION ALL
          SELECT event_type, 5, x, y5 FROM led UNION ALL
          SELECT event_type, 6, x, y6 FROM led UNION ALL
          SELECT event_type, 7, x, y7 FROM led)
        WHERE y IS NOT NULL),
      lg AS (SELECT event_type, lag, SUM(x::HUGEINT * y) AS ck,
          SUM(x::HUGEINT) AS ak, SUM(y::HUGEINT) AS bk
        FROM pairs GROUP BY 1, 2),
      rho AS (SELECT l.event_type, l.lag,
          CAST(t.n::HUGEINT * t.n * l.ck - t.n::HUGEINT * t.s * (l.ak + l.bk)
            + (t.n - l.lag)::HUGEINT * t.s * t.s AS DOUBLE)
          / CAST(t.n::HUGEINT * t.n * t.q0 - t.n::HUGEINT * t.s * t.s
            AS DOUBLE) AS r,
          t.n AS n
        FROM lg l JOIN tot t ON t.event_type = l.event_type
        WHERE t.n::HUGEINT * t.n * t.q0 - t.n::HUGEINT * t.s * t.s > 0),
      tm AS (SELECT event_type, MAX(n) AS n,
          MAX(CASE WHEN lag = 1 THEN r * r / (n - 1) END) AS t1,
          MAX(CASE WHEN lag = 2 THEN r * r / (n - 2) END) AS t2,
          MAX(CASE WHEN lag = 3 THEN r * r / (n - 3) END) AS t3,
          MAX(CASE WHEN lag = 4 THEN r * r / (n - 4) END) AS t4,
          MAX(CASE WHEN lag = 5 THEN r * r / (n - 5) END) AS t5,
          MAX(CASE WHEN lag = 6 THEN r * r / (n - 6) END) AS t6,
          MAX(CASE WHEN lag = 7 THEN r * r / (n - 7) END) AS t7
        FROM rho GROUP BY 1)
      SELECT event_type, n AS n_days,
        CAST(FLOOR(n * (n + 2.0) * (t1 + t2 + t3 + t4 + t5 + t6 + t7)
          * 1000000) AS BIGINT) AS q_lb_micros,
        n * (n + 2.0) * (t1 + t2 + t3 + t4 + t5 + t6 + t7) > 14.067
          AS white_noise_rejected
      FROM tm WHERE n >= 8 ORDER BY event_type"""

  val qLjungBox: Spec = Spec(
    "ev_ljung_box",
    oracle = Some(ljungBoxOracleSql)) { (s, dir) =>
    ljungBoxOverGrid(dailyCountSpine(s, dir))
  }

  /** The Ljung–Box tail behind [[qLjungBox]], over any (event_type, d,
    * x) grid — shared by the batch query and the streaming twin (whose
    * grid arrives from the watermarked daily count stream). */
  def ljungBoxOverGrid(grid: DataFrame): DataFrame = {
    val s = grid.sparkSession
    import s.implicits._
    val tot = grid.groupBy($"event_type").agg(
      count(lit(1)).as("n"),
      sum($"x".cast("decimal(38,0)")).as("s"),
      sum($"x".cast("decimal(38,0)") * $"x").as("q0"))
    val w = Window.partitionBy($"event_type").orderBy($"d")
    val led = grid
      .select($"event_type" +: $"x" +:
        (1 to 7).map(k => lead($"x", k).over(w).as(s"y$k")): _*)
    val pairs = led.select($"event_type",
      expr("stack(7, 1, y1, 2, y2, 3, y3, 4, y4, 5, y5, 6, y6, 7, y7)")
        .as(Seq("lag", "y")), $"x")
      .filter($"y".isNotNull)
    val lg = pairs.groupBy($"event_type", $"lag").agg(
      sum($"x".cast("decimal(38,0)") * $"y").as("ck"),
      sum($"x".cast("decimal(38,0)")).as("ak"),
      sum($"y".cast("decimal(38,0)")).as("bk"))
    val rho = lg.join(tot, "event_type")
      .filter(expr("cast(n as decimal(38,0)) * n * q0" +
        " - cast(n as decimal(38,0)) * s * s > 0"))
      .select($"event_type", $"lag", $"n",
        (expr("cast(n as decimal(38,0)) * n * ck" +
          " - cast(n as decimal(38,0)) * s * (ak + bk)" +
          " + cast(n - lag as decimal(38,0)) * s * s").cast("double")
          / expr("cast(n as decimal(38,0)) * n * q0" +
            " - cast(n as decimal(38,0)) * s * s").cast("double")).as("r"))
    val aggCols = max($"n").as("n") +:
      (1 to 7).map(k =>
        max(when($"lag" === k, $"r" * $"r" / ($"n" - k))).as(s"t$k"))
    val tm = rho.groupBy($"event_type").agg(aggCols.head, aggCols.tail: _*)
    val qsum = $"t1" + $"t2" + $"t3" + $"t4" + $"t5" + $"t6" + $"t7"
    tm.filter($"n" >= 8)
      .select($"event_type", $"n".as("n_days"),
        floor($"n" * ($"n" + lit(2.0)) * qsum * 1e6).cast("long")
          .as("q_lb_micros"),
        ($"n" * ($"n" + lit(2.0)) * qsum > 14.067)
          .as("white_noise_rejected"))
      .orderBy($"event_type")
  }

  /** Granger-causality screening (Granger '69) between every ordered
    * pair of event-type daily series: does A's yesterday help predict
    * B's today beyond B's own yesterday? F-test of the lag-1
    * unrestricted model y=B_t ~ (B_{t−1}, A_{t−1}) against the
    * restricted y ~ B_{t−1}, on the intersection of the two spines —
    * the causal-screening pass a metric system runs before anyone
    * trusts a dashboard arrow.
    *
    * Exactness discipline: every centered moment C_ab = n·Σab − Σa·Σb
    * is an EXACT 128-bit integer; the OLS closed forms (2×2 normal
    * equations by determinant) then evaluate in doubles cast from
    * those exact integers with IDENTICAL op order on both engines —
    * RSS_r·n·C11 = Cyy·C11 − C1y² and RSS_u·n·det = Cyy·det − (C1y²C22
    * − 2·C1y·C2y·C12 + C2y²·C11), det = C11C22 − C12², so
    * F = (RSS_r−RSS_u)(n−3)/RSS_u needs no intermediate that depends
    * on engine-chosen accumulation order. Degenerate pairs (det ≤ 0 or
    * RSS_u ≤ 0 — constant series) drop on both sides. Scale shape: the
    * pair table is |types|²·days (calendar-bounded); one window for
    * the two lags, one hash agg for the ten moments. */
  val grangerOracleSql: String = s"""
      WITH $dailySpineSql,
      pg AS (SELECT a.event_type AS cause, b.event_type AS effect,
          b.d, CAST(b.x AS BIGINT) AS y, CAST(a.x AS BIGINT) AS xa
        FROM grid a JOIN grid b ON a.d = b.d
          AND a.event_type <> b.event_type),
      lagd AS (SELECT cause, effect, d, y,
          lag(y) OVER w AS x1, lag(xa) OVER w AS x2
        FROM pg WINDOW w AS (PARTITION BY cause, effect ORDER BY d)),
      rows_ AS (SELECT * FROM lagd WHERE x1 IS NOT NULL),
      m AS (SELECT cause, effect, CAST(COUNT(*) AS BIGINT) AS n,
          SUM(y::HUGEINT) AS sy, SUM(x1::HUGEINT) AS s1,
          SUM(x2::HUGEINT) AS s2,
          SUM(y::HUGEINT * y) AS syy, SUM(x1::HUGEINT * x1) AS s11,
          SUM(x2::HUGEINT * x2) AS s22, SUM(x1::HUGEINT * x2) AS s12,
          SUM(x1::HUGEINT * y) AS s1y, SUM(x2::HUGEINT * y) AS s2y
        FROM rows_ GROUP BY 1, 2),
      c AS (SELECT cause, effect, n,
          CAST(n * syy - sy * sy AS DOUBLE) AS cyy,
          CAST(n * s11 - s1 * s1 AS DOUBLE) AS c11,
          CAST(n * s22 - s2 * s2 AS DOUBLE) AS c22,
          CAST(n * s12 - s1 * s2 AS DOUBLE) AS c12,
          CAST(n * s1y - s1 * sy AS DOUBLE) AS c1y,
          CAST(n * s2y - s2 * sy AS DOUBLE) AS c2y
        FROM m WHERE n > 3),
      f AS (SELECT cause, effect, n,
          (cyy * c11 - c1y * c1y) * (c11 * c22 - c12 * c12)
            - (cyy * (c11 * c22 - c12 * c12)
               - (c1y * c1y * c22 - 2 * c1y * c2y * c12
                  + c2y * c2y * c11)) * c11 AS num,
          (cyy * (c11 * c22 - c12 * c12)
            - (c1y * c1y * c22 - 2 * c1y * c2y * c12
               + c2y * c2y * c11)) * c11 AS den
        FROM c WHERE c11 * c22 - c12 * c12 > 0 AND c11 > 0)
      SELECT cause, effect, n AS n_days,
        CAST(FLOOR(num * (n - 3) / den * 1000000) AS BIGINT) AS f_micros,
        num * (n - 3) / den > 4.0 AS granger_signal
      FROM f WHERE den > 0
      ORDER BY cause, effect"""

  val qGrangerPairs: Spec = Spec(
    "ev_granger_pairs",
    oracle = Some(grangerOracleSql)) { (s, dir) =>
    grangerOverGrid(dailyCountSpine(s, dir))
  }

  /** The Granger tail behind [[qGrangerPairs]], over any (event_type,
    * d, x) grid — shared with the streaming twin. */
  def grangerOverGrid(grid: DataFrame): DataFrame = {
    val s = grid.sparkSession
    import s.implicits._
    val pg = grid.as("a").join(grid.as("b"),
        col("a.d") === col("b.d") &&
          col("a.event_type") =!= col("b.event_type"))
      .select(col("a.event_type").as("cause"),
        col("b.event_type").as("effect"), col("b.d").as("d"),
        col("b.x").as("y"), col("a.x").as("xa"))
    val w = Window.partitionBy($"cause", $"effect").orderBy($"d")
    val lagd = pg
      .withColumn("x1", lag($"y", 1).over(w))
      .withColumn("x2", lag($"xa", 1).over(w))
      .filter($"x1".isNotNull)
    def dsum(c: org.apache.spark.sql.Column) =
      sum(c.cast("decimal(38,0)"))
    val m = lagd.groupBy($"cause", $"effect").agg(
      count(lit(1)).as("n"),
      dsum($"y").as("sy"), dsum($"x1").as("s1"), dsum($"x2").as("s2"),
      sum($"y".cast("decimal(38,0)") * $"y").as("syy"),
      sum($"x1".cast("decimal(38,0)") * $"x1").as("s11"),
      sum($"x2".cast("decimal(38,0)") * $"x2").as("s22"),
      sum($"x1".cast("decimal(38,0)") * $"x2").as("s12"),
      sum($"x1".cast("decimal(38,0)") * $"y").as("s1y"),
      sum($"x2".cast("decimal(38,0)") * $"y").as("s2y"))
    val c = m.filter($"n" > 3).select($"cause", $"effect", $"n",
      ($"n" * $"syy" - $"sy" * $"sy").cast("double").as("cyy"),
      ($"n" * $"s11" - $"s1" * $"s1").cast("double").as("c11"),
      ($"n" * $"s22" - $"s2" * $"s2").cast("double").as("c22"),
      ($"n" * $"s12" - $"s1" * $"s2").cast("double").as("c12"),
      ($"n" * $"s1y" - $"s1" * $"sy").cast("double").as("c1y"),
      ($"n" * $"s2y" - $"s2" * $"sy").cast("double").as("c2y"))
    val det = $"c11" * $"c22" - $"c12" * $"c12"
    val p = $"c1y" * $"c1y" * $"c22" - lit(2) * $"c1y" * $"c2y" * $"c12" +
      $"c2y" * $"c2y" * $"c11"
    val f = c.filter(det > 0 && $"c11" > 0)
      .select($"cause", $"effect", $"n",
        (($"cyy" * $"c11" - $"c1y" * $"c1y") * det -
          ($"cyy" * det - p) * $"c11").as("num"),
        (($"cyy" * det - p) * $"c11").as("den"))
    f.filter($"den" > 0)
      .select($"cause", $"effect", $"n".as("n_days"),
        floor($"num" * ($"n" - 3) / $"den" * 1e6).cast("long")
          .as("f_micros"),
        ($"num" * ($"n" - 3) / $"den" > 4.0).as("granger_signal"))
      .orderBy($"cause", $"effect")
  }

  /** Durbin–Levinson recursion unrolled to maxLag levels as NAMED SQL
    * expressions — φ_kk = (ρ_k − Σ_{j<k} φ_{k−1,j}·ρ_{k−j}) /
    * (1 − Σ_{j<k} φ_{k−1,j}·ρ_j), φ_kj = φ_{k−1,j} − φ_kk·φ_{k−1,k−j}.
    * ONE generator feeds BOTH engines (Spark parses the same strings
    * via expr(), the oracle splices them into a CTE chain), so the
    * two sides cannot drift by transcription — and the fixed textual
    * op order is the float-parity guarantee. Returns (name, expr)
    * pairs in dependency order over input columns r1..r{maxLag}. */
  private[graft] def durbinLevinsonCols(maxLag: Int): Seq[(String, String)] = {
    val out = Seq.newBuilder[(String, String)]
    out += ("f1_1" -> "r1")
    for (k <- 2 to maxLag) {
      val num = (1 until k)
        .map(j => s"f${k - 1}_$j * r${k - j}").mkString(" + ")
      val den = (1 until k)
        .map(j => s"f${k - 1}_$j * r$j").mkString(" + ")
      out += (s"f${k}_$k" -> s"(r$k - ($num)) / (1.0 - ($den))")
      for (j <- 1 until k)
        out += (s"f${k}_$j" -> s"f${k - 1}_$j - f${k}_$k * f${k - 1}_${k - j}")
    }
    out.result()
  }

  /** Partial autocorrelation of the per-type daily series, lags 1–7 —
    * the other half of the Box–Jenkins identification pair: ACF tails
    * off / PACF cuts off ⇒ AR order, and vice versa for MA. ACF inputs
    * are the standard estimator with exact 128-bit moments (the
    * [[qLjungBox]] machinery, pivoted to one row per type); the
    * Durbin–Levinson recursion then runs as [[durbinLevinsonCols]]'
    * generated expressions — the SAME strings on both engines (parsed
    * by expr() here, spliced into the oracle CTE chain there), so the
    * float pipeline is fixed-order by construction. EventsStatSpec
    * pins the generated unrolling against an independent loop
    * implementation of the recursion. */
  val pacfOracleSql: String = {
      // build the CTE chain textually: dl0 over rp, dl1 over dl0, …
      val ctes = durbinLevinsonCols(7).zipWithIndex.map {
        case ((n, e), i) =>
          val src = if (i == 0) "rp" else s"dl${i - 1}"
          s"dl$i AS (SELECT *, $e AS $n FROM $src)"
      }.mkString(",\n      ")
      val last = s"dl${durbinLevinsonCols(7).size - 1}"
      s"""
      WITH $dailySpineSql,
      tot AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
          SUM(x::HUGEINT) AS s, SUM(x::HUGEINT * x) AS q0
        FROM grid GROUP BY 1),
      led AS (SELECT event_type, x,
          lead(x, 1) OVER w AS y1, lead(x, 2) OVER w AS y2,
          lead(x, 3) OVER w AS y3, lead(x, 4) OVER w AS y4,
          lead(x, 5) OVER w AS y5, lead(x, 6) OVER w AS y6,
          lead(x, 7) OVER w AS y7
        FROM grid WINDOW w AS (PARTITION BY event_type ORDER BY d)),
      pairs AS (
        SELECT event_type, lag, x, y FROM (
          SELECT event_type, 1 AS lag, x, y1 AS y FROM led UNION ALL
          SELECT event_type, 2, x, y2 FROM led UNION ALL
          SELECT event_type, 3, x, y3 FROM led UNION ALL
          SELECT event_type, 4, x, y4 FROM led UNION ALL
          SELECT event_type, 5, x, y5 FROM led UNION ALL
          SELECT event_type, 6, x, y6 FROM led UNION ALL
          SELECT event_type, 7, x, y7 FROM led)
        WHERE y IS NOT NULL),
      lg AS (SELECT event_type, lag, SUM(x::HUGEINT * y) AS ck,
          SUM(x::HUGEINT) AS ak, SUM(y::HUGEINT) AS bk
        FROM pairs GROUP BY 1, 2),
      rho AS (SELECT l.event_type, l.lag,
          CAST(t.n::HUGEINT * t.n * l.ck - t.n::HUGEINT * t.s * (l.ak + l.bk)
            + (t.n - l.lag)::HUGEINT * t.s * t.s AS DOUBLE)
          / CAST(t.n::HUGEINT * t.n * t.q0 - t.n::HUGEINT * t.s * t.s
            AS DOUBLE) AS r,
          t.n AS n
        FROM lg l JOIN tot t ON t.event_type = l.event_type
        WHERE t.n::HUGEINT * t.n * t.q0 - t.n::HUGEINT * t.s * t.s > 0),
      rp AS (SELECT event_type, MAX(n) AS n,
          MAX(CASE WHEN lag = 1 THEN r END) AS r1,
          MAX(CASE WHEN lag = 2 THEN r END) AS r2,
          MAX(CASE WHEN lag = 3 THEN r END) AS r3,
          MAX(CASE WHEN lag = 4 THEN r END) AS r4,
          MAX(CASE WHEN lag = 5 THEN r END) AS r5,
          MAX(CASE WHEN lag = 6 THEN r END) AS r6,
          MAX(CASE WHEN lag = 7 THEN r END) AS r7
        FROM rho GROUP BY 1),
      $ctes
      SELECT event_type, n AS n_days,
        round(f1_1, 6) AS pacf1, round(f2_2, 6) AS pacf2,
        round(f3_3, 6) AS pacf3, round(f4_4, 6) AS pacf4,
        round(f5_5, 6) AS pacf5, round(f6_6, 6) AS pacf6,
        round(f7_7, 6) AS pacf7
      FROM $last WHERE n >= 9 ORDER BY event_type"""
    }

  val qPacfDaily: Spec = Spec(
    "ev_pacf_daily",
    oracle = Some(pacfOracleSql)) { (s, dir) =>
    pacfOverGrid(dailyCountSpine(s, dir))
  }

  /** The PACF tail behind [[qPacfDaily]], over any (event_type, d, x)
    * grid — shared with the streaming twin. */
  def pacfOverGrid(grid: DataFrame): DataFrame = {
    val s = grid.sparkSession
    import s.implicits._
    val tot = grid.groupBy($"event_type").agg(
      count(lit(1)).as("n"),
      sum($"x".cast("decimal(38,0)")).as("s"),
      sum($"x".cast("decimal(38,0)") * $"x").as("q0"))
    val w = Window.partitionBy($"event_type").orderBy($"d")
    val led = grid
      .select($"event_type" +: $"x" +:
        (1 to 7).map(k => lead($"x", k).over(w).as(s"y$k")): _*)
    val pairs = led.select($"event_type",
      expr("stack(7, 1, y1, 2, y2, 3, y3, 4, y4, 5, y5, 6, y6, 7, y7)")
        .as(Seq("lag", "y")), $"x")
      .filter($"y".isNotNull)
    val lg = pairs.groupBy($"event_type", $"lag").agg(
      sum($"x".cast("decimal(38,0)") * $"y").as("ck"),
      sum($"x".cast("decimal(38,0)")).as("ak"),
      sum($"y".cast("decimal(38,0)")).as("bk"))
    val rho = lg.join(tot, "event_type")
      .filter(expr("cast(n as decimal(38,0)) * n * q0" +
        " - cast(n as decimal(38,0)) * s * s > 0"))
      .select($"event_type", $"lag", $"n",
        (expr("cast(n as decimal(38,0)) * n * ck" +
          " - cast(n as decimal(38,0)) * s * (ak + bk)" +
          " + cast(n - lag as decimal(38,0)) * s * s").cast("double")
          / expr("cast(n as decimal(38,0)) * n * q0" +
            " - cast(n as decimal(38,0)) * s * s").cast("double")).as("r"))
    val rpCols = max($"n").as("n") +:
      (1 to 7).map(k => max(when($"lag" === k, $"r")).as(s"r$k"))
    val rp = rho.groupBy($"event_type").agg(rpCols.head, rpCols.tail: _*)
    val dl = durbinLevinsonCols(7).foldLeft(rp) {
      case (df, (name, e)) => df.withColumn(name, expr(e))
    }
    dl.filter($"n" >= 9)
      .select($"event_type" +: $"n".as("n_days") +:
        (1 to 7).map(k => round(col(s"f${k}_$k"), 6).as(s"pacf$k")): _*)
      .orderBy($"event_type")
  }

  /** Holt linear-trend exponential smoothing (Holt '57) over the
    * per-type daily count grid, forecasting the next 7 days — the
    * capacity-planning forecast that pairs with [[qAcfDaily]]'s
    * seasonality check and [[qCusum]]'s changepoint alarm. Level/trend
    * recurrence with α = β = 1/2: l_t = y_t/2 + (l+b)/2, b_t =
    * (l_t − l)/2 + b/2, initialized l_0 = y_0, b_0 = y_1 − y_0;
    * forecast ŷ(h) = l_T + h·b_T.
    *
    * Engine parity: a smoothing recurrence is inherently ordered, so
    * instead of decimal-sum tricks the parity rests on IEEE
    * determinism — both engines evaluate the IDENTICAL op sequence
    * (halving is exact scaling, adds round the same way), so l/b are
    * bit-identical and the floored-micros emission matches. Scale
    * shape: the grid is calendar-bounded (days × |types|), each type's
    * series folds row-locally over a collected array (never a driver
    * loop), and the recurrence parallelizes BY KEY — the classic way
    * a sequential model scales out on Spark.
    *
    * The fold is exposed over any (event_type, d, x) day grid — shared
    * by the batch query and the streaming twin (st_holt_forecast),
    * which maintains the same grid from a watermarked stream and runs
    * this as a batch view over that bounded state. */
  def holtOverDayGrid(grid: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    val series = grid
      .groupBy(col("event_type"))
      .agg(sort_array(collect_list(struct(col("d"), col("x")))).as("sv"))
      .select(col("event_type"),
        transform(col("sv"), e => e.getField("x").cast("double")).as("ys"))
      .filter(size(col("ys")) >= 2)
    val fitted = series.withColumn("st",
      aggregate(
        slice(col("ys"), lit(2), size(col("ys")) - 1),
        struct(element_at(col("ys"), 1).as("l"),
          (element_at(col("ys"), 2) - element_at(col("ys"), 1)).as("b")),
        (acc, y) => struct(
          (lit(0.5) * y + lit(0.5) * (acc.getField("l") + acc.getField("b")))
            .as("l"),
          (lit(0.5) * ((lit(0.5) * y +
              lit(0.5) * (acc.getField("l") + acc.getField("b"))) -
              acc.getField("l")) + lit(0.5) * acc.getField("b")).as("b"))))
    fitted
      .select(col("event_type"), col("st.l").as("l"), col("st.b").as("b"),
        explode(sequence(lit(1L), lit(7L))).as("h"))
      .select(col("event_type"), col("h"),
        floor((col("l") + col("h") * col("b")) * 1e6).cast("long")
          .as("forecast_micros"))
      .orderBy(col("event_type"), col("h"))
  }

  val holtOracleSql: String = s"""
      WITH RECURSIVE $dailySpineSql,
      mn AS (SELECT event_type, MIN(d) AS mn FROM grid GROUP BY 1),
      idx AS (SELECT g.event_type, g.d - m.mn AS t, CAST(g.x AS DOUBLE) AS y
        FROM grid g JOIN mn m ON m.event_type = g.event_type),
      tmax AS (SELECT event_type, MAX(t) AS tm FROM idx GROUP BY 1),
      hw AS (
        SELECT i0.event_type, CAST(0 AS BIGINT) AS t, i0.y AS l,
          i1.y - i0.y AS b
        FROM idx i0 JOIN idx i1
          ON i1.event_type = i0.event_type AND i1.t = 1
        WHERE i0.t = 0
        UNION ALL
        SELECT h.event_type, h.t + 1,
          0.5 * i.y + 0.5 * (h.l + h.b),
          0.5 * ((0.5 * i.y + 0.5 * (h.l + h.b)) - h.l) + 0.5 * h.b
        FROM hw h JOIN idx i
          ON i.event_type = h.event_type AND i.t = h.t + 1),
      fin AS (SELECT h.event_type, h.l, h.b FROM hw h
        JOIN tmax m ON m.event_type = h.event_type AND h.t = m.tm)
      SELECT event_type, CAST(u.hh AS BIGINT) AS h,
        CAST(FLOOR((l + u.hh * b) * 1000000) AS BIGINT) AS forecast_micros
      FROM fin CROSS JOIN UNNEST(range(1, 8)) AS u(hh)
      ORDER BY event_type, h"""

  val qHoltForecast: Spec = Spec(
    "ev_holt_forecast",
    oracle = Some(holtOracleSql)) { (s, dir) =>
    holtOverDayGrid(dailyCountSpine(s, dir))
  }

  /** ROLLING-ORIGIN FORECAST BACKTEST (Tashman '00 — the evaluation
    * harness every forecaster needs before anyone trusts it): for each
    * of the last 5 cutoff days, fit Holt on the prefix, forecast ONE
    * step ahead, score against the realized count, and report the
    * per-type MAE next to the naive last-value baseline's — the same
    * measure-don't-guess pattern as e_ivf_recall/e_hnsw_recall, aimed
    * at [[qHoltForecast]]. `holt_wins` is the honest headline: a
    * smoother that cannot beat persistence has no business
    * forecasting.
    *
    * Engine parity: the oracle's recursive CTE materializes the Holt
    * state at EVERY prefix t, so each cutoff's one-step forecast is
    * the same arithmetic as the Spark side's per-cutoff prefix fold
    * (identical IEEE update expressions, proven by ev_holt_forecast);
    * fold errors are bit-identical doubles, MAEs are 9dp-rounded
    * DECIMAL sums (order-free) with one division.
    *
    * Scale shape: the grid agg is the corpus-sized work; each type's
    * series collects once (calendar-bounded array) and the 5 prefix
    * folds are O(T) array scans — at 100 TB the cost stays where it
    * already was, in the day-grid hash agg. */
  val qForecastBacktest: Spec = Spec(
    "ev_forecast_backtest",
    oracle = Some(s"""
      WITH RECURSIVE $dailySpineSql,
      mn AS (SELECT event_type, MIN(d) AS mn FROM grid GROUP BY 1),
      idx AS (SELECT g.event_type, g.d - m.mn AS t, CAST(g.x AS DOUBLE) AS y
        FROM grid g JOIN mn m ON m.event_type = g.event_type),
      tmax AS (SELECT event_type, MAX(t) AS tm FROM idx GROUP BY 1),
      hw AS (
        SELECT i0.event_type, CAST(0 AS BIGINT) AS t, i0.y AS l,
          i1.y - i0.y AS b
        FROM idx i0 JOIN idx i1
          ON i1.event_type = i0.event_type AND i1.t = 1
        WHERE i0.t = 0
        UNION ALL
        SELECT h.event_type, h.t + 1,
          0.5 * i.y + 0.5 * (h.l + h.b),
          0.5 * ((0.5 * i.y + 0.5 * (h.l + h.b)) - h.l) + 0.5 * h.b
        FROM hw h JOIN idx i
          ON i.event_type = h.event_type AND i.t = h.t + 1),
      folds AS (
        SELECT h.event_type, h.t, m.mn,
          h.l + h.b AS f, i.y AS actual, ip.y AS prev
        FROM hw h
        JOIN tmax x ON x.event_type = h.event_type
        JOIN mn m ON m.event_type = h.event_type
        JOIN idx i ON i.event_type = h.event_type AND i.t = h.t + 1
        JOIN idx ip ON ip.event_type = h.event_type AND ip.t = h.t
        WHERE h.t >= GREATEST(1, x.tm - 5) AND h.t <= x.tm - 1),
      e AS (
        SELECT event_type, t, mn, f, actual,
          abs(f - actual) AS eh, abs(actual - prev) AS en
        FROM folds),
      mae AS (
        SELECT event_type,
          CAST(FLOOR(CAST(SUM(CAST(round(eh, 9) AS DECIMAL(28,12)))
            AS DOUBLE) / COUNT(*) * 1000000) AS BIGINT) AS mae_holt_micros,
          CAST(FLOOR(CAST(SUM(CAST(round(en, 9) AS DECIMAL(28,12)))
            AS DOUBLE) / COUNT(*) * 1000000) AS BIGINT) AS mae_naive_micros
        FROM e GROUP BY event_type)
      SELECT e.event_type,
        strftime(make_timestamp((e.mn + e.t) * 86400000000),
          '%Y-%m-%d') AS cutoff_day,
        CAST(FLOOR(e.f * 1000000) AS BIGINT) AS forecast_micros,
        CAST(e.actual AS BIGINT) AS actual,
        CAST(FLOOR(e.eh * 1000000) AS BIGINT) AS err_holt_micros,
        CAST(FLOOR(e.en * 1000000) AS BIGINT) AS err_naive_micros,
        m.mae_holt_micros, m.mae_naive_micros,
        m.mae_holt_micros < m.mae_naive_micros AS holt_wins
      FROM e JOIN mae m ON m.event_type = e.event_type
      ORDER BY e.event_type, cutoff_day""")) { (s, dir) =>
    forecastBacktestOverGrid(dailyCountSpine(s, dir))
  }

  /** The backtest tail over a complete (event_type, d, x) day grid —
    * exposed for the hand-vector pins. */
  def forecastBacktestOverGrid(grid: DataFrame): DataFrame = {
    val s = grid.sparkSession
    import s.implicits._
    val series = grid
      .groupBy($"event_type")
      .agg(sort_array(collect_list(struct($"d", $"x"))).as("sv"),
        min($"d").as("mn"))
      .select($"event_type", $"mn",
        transform($"sv", e => e.getField("x").cast("double")).as("ys"))
      .filter(size($"ys") >= 3)
      .localCheckpoint() // 5 prefix folds share one collected series
    val step = (acc: org.apache.spark.sql.Column,
        y: org.apache.spark.sql.Column) => struct(
      (lit(0.5) * y + lit(0.5) * (acc.getField("l") + acc.getField("b")))
        .as("l"),
      (lit(0.5) * ((lit(0.5) * y +
          lit(0.5) * (acc.getField("l") + acc.getField("b"))) -
          acc.getField("l")) + lit(0.5) * acc.getField("b")).as("b"))
    val folds = series
      .select($"event_type", $"mn", $"ys",
        explode(sequence(lit(1L), lit(5L))).as("k"))
      .withColumn("p", size($"ys") - $"k")
      .filter($"p" >= 2)
      .withColumn("st", aggregate(
        slice($"ys", lit(2), $"p" - 1),
        struct(element_at($"ys", 1).as("l"),
          (element_at($"ys", 2) - element_at($"ys", 1)).as("b")),
        step))
      .select($"event_type", $"mn", ($"p" - 1).cast("long").as("t"),
        ($"st.l" + $"st.b").as("f"),
        element_at($"ys", ($"p" + 1).cast("int")).as("actual"),
        element_at($"ys", $"p".cast("int")).as("prev"))
      .withColumn("eh", abs($"f" - $"actual"))
      .withColumn("en", abs($"actual" - $"prev"))
      .localCheckpoint() // fold rows feed the MAE AND the output
    val mae = folds.groupBy($"event_type")
      .agg(
        floor(sum(round($"eh", 9).cast("decimal(28,12)")).cast("double")
          / count(lit(1)) * 1e6).cast("long").as("mae_holt_micros"),
        floor(sum(round($"en", 9).cast("decimal(28,12)")).cast("double")
          / count(lit(1)) * 1e6).cast("long").as("mae_naive_micros"))
    folds.join(broadcast(mae), Seq("event_type"))
      .select($"event_type",
        date_format(timestamp_micros(($"mn" + $"t") * lit(86400000000L)),
          "yyyy-MM-dd").as("cutoff_day"),
        floor($"f" * 1e6).cast("long").as("forecast_micros"),
        $"actual".cast("long").as("actual"),
        floor($"eh" * 1e6).cast("long").as("err_holt_micros"),
        floor($"en" * 1e6).cast("long").as("err_naive_micros"),
        $"mae_holt_micros", $"mae_naive_micros",
        ($"mae_holt_micros" < $"mae_naive_micros").as("holt_wins"))
      .orderBy($"event_type", $"cutoff_day")
  }

  /** Holt-Winters ADDITIVE-SEASONAL smoothing (Winters '60, period 7 —
    * the weekly cycle [[qAcfDaily]] detects) over the same grid,
    * forecasting the next 7 days with level + trend + day-of-week
    * seasonal terms, α = β = γ = 1/2:
    * l_t = (y_t − s_{t−7})/2 + (l+b)/2, b_t = (l_t − l)/2 + b/2,
    * s_t = (y_t − l_t)/2 + s_{t−7}/2; init l = mean(week 1),
    * b = (mean(week 2) − mean(week 1))/7, s_i = y_i − l.
    *
    * Same IEEE-determinism parity as [[holtOverDayGrid]]: the week
    * means are exact-integer sums divided once, every recurrence step
    * is identical fixed-order double ops in both engines, and the
    * seasonal state travels as a ROTATING 7-slot buffer (head = the
    * s_{t−7} the next step consumes, so forecasts read slot h
    * directly). The oracle's recursive CTE carries the same buffer as
    * seven rotating columns, and its fin join gates on tm >= 13 —
    * mirroring the Spark side's size >= 14 filter, so series too short
    * for the two-week init drop out of BOTH engines (a 7–13-day series
    * would otherwise anchor at t=6 with a partial week-2 sum and emit
    * oracle-only rows). Scale shape: per-key row-local fold, like
    * every sequential model here. */
  val holtWintersOracleSql: String = s"""
      WITH RECURSIVE $dailySpineSql,
      mn AS (SELECT event_type, MIN(d) AS mn FROM grid GROUP BY 1),
      idx AS (SELECT g.event_type, g.d - m.mn AS t, CAST(g.x AS DOUBLE) AS y,
          g.x AS xi
        FROM grid g JOIN mn m ON m.event_type = g.event_type),
      tmax AS (SELECT event_type, MAX(t) AS tm FROM idx GROUP BY 1),
      ini AS (SELECT event_type,
          CAST(SUM(xi) FILTER (WHERE t < 7) AS DOUBLE) / 7 AS l0,
          (CAST(SUM(xi) FILTER (WHERE t >= 7 AND t < 14) AS DOUBLE)
            - CAST(SUM(xi) FILTER (WHERE t < 7) AS DOUBLE)) / 49 AS b0
        FROM idx GROUP BY 1),
      hw AS (
        SELECT i.event_type, CAST(6 AS BIGINT) AS t, ini.l0 AS l, ini.b0 AS b,
          MAX(CASE WHEN i.t = 0 THEN i.y END) - ini.l0 AS s0,
          MAX(CASE WHEN i.t = 1 THEN i.y END) - ini.l0 AS s1,
          MAX(CASE WHEN i.t = 2 THEN i.y END) - ini.l0 AS s2,
          MAX(CASE WHEN i.t = 3 THEN i.y END) - ini.l0 AS s3,
          MAX(CASE WHEN i.t = 4 THEN i.y END) - ini.l0 AS s4,
          MAX(CASE WHEN i.t = 5 THEN i.y END) - ini.l0 AS s5,
          MAX(CASE WHEN i.t = 6 THEN i.y END) - ini.l0 AS s6
        FROM idx i JOIN ini ON ini.event_type = i.event_type
        WHERE i.t < 7
        GROUP BY i.event_type, ini.l0, ini.b0
        UNION ALL
        SELECT h.event_type, h.t + 1,
          0.5 * (i.y - h.s0) + 0.5 * (h.l + h.b),
          0.5 * ((0.5 * (i.y - h.s0) + 0.5 * (h.l + h.b)) - h.l) + 0.5 * h.b,
          h.s1, h.s2, h.s3, h.s4, h.s5, h.s6,
          0.5 * (i.y - (0.5 * (i.y - h.s0) + 0.5 * (h.l + h.b))) + 0.5 * h.s0
        FROM hw h JOIN idx i
          ON i.event_type = h.event_type AND i.t = h.t + 1),
      fin AS (SELECT h.* FROM hw h
        JOIN tmax m ON m.event_type = h.event_type AND h.t = m.tm
          AND m.tm >= 13)
      SELECT event_type, CAST(u.hh AS BIGINT) AS h,
        CAST(FLOOR((l + u.hh * b +
          CASE u.hh WHEN 1 THEN s0 WHEN 2 THEN s1 WHEN 3 THEN s2
            WHEN 4 THEN s3 WHEN 5 THEN s4 WHEN 6 THEN s5 ELSE s6 END)
          * 1000000) AS BIGINT) AS forecast_micros
      FROM fin CROSS JOIN UNNEST(range(1, 8)) AS u(hh)
      ORDER BY event_type, h"""

  val qHoltWinters: Spec = Spec(
    "ev_holt_winters",
    bench = true, // r10-family headline row: forecast fold regression guard
    oracle = Some(holtWintersOracleSql)) { (s, dir) =>
    holtWintersOverGrid(dailyCountSpine(s, dir))
  }

  /** The Holt-Winters fold behind [[qHoltWinters]], over any
    * (event_type, d, x) grid — exposed for hand-vector tests. */
  def holtWintersOverGrid(grid: DataFrame): DataFrame = {
    import grid.sparkSession.implicits._
    val series = grid
      .groupBy($"event_type")
      .agg(sort_array(collect_list(struct($"d", $"x"))).as("sv"))
      .select($"event_type",
        transform($"sv", e => e.getField("x")).as("xs"))
      .filter(size($"xs") >= 14)
    def weekSum(c: org.apache.spark.sql.Column, from: Int) =
      aggregate(slice(c, lit(from), lit(7)), lit(0L), (a, e) => a + e)
        .cast("double")
    val init = series
      .withColumn("l0", weekSum($"xs", 1) / 7)
      .withColumn("b0", (weekSum($"xs", 8) - weekSum($"xs", 1)) / 49)
      .withColumn("sinit", transform(slice($"xs", lit(1), lit(7)),
        e => e.cast("double") - $"l0"))
    val folded = init.withColumn("st",
      aggregate(
        slice($"xs", lit(8), size($"xs") - 7),
        struct($"l0".as("l"), $"b0".as("b"), $"sinit".as("s")),
        (acc, xi) => {
          val y = xi.cast("double")
          val l = acc.getField("l"); val b = acc.getField("b")
          val sArr = acc.getField("s")
          val head = element_at(sArr, 1)
          def nl = lit(0.5) * (y - head) + lit(0.5) * (l + b)
          struct(
            nl.as("l"),
            (lit(0.5) * (nl - l) + lit(0.5) * b).as("b"),
            concat(slice(sArr, 2, 6),
              array(lit(0.5) * (y - nl) + lit(0.5) * head)).as("s"))
        }))
    folded
      .select($"event_type", $"st.l".as("l"), $"st.b".as("b"),
        $"st.s".as("sa"), explode(sequence(lit(1L), lit(7L))).as("h"))
      .select($"event_type", $"h",
        floor(($"l" + $"h" * $"b" +
          element_at($"sa", $"h".cast("int"))) * 1e6)
          .cast("long").as("forecast_micros"))
      .orderBy($"event_type", $"h")
  }

  /** Burst detection as a 2-state Viterbi decode (Kleinberg '02,
    * "Bursty and hierarchical structure in streams", the 2-state
    * automaton): state 0 emits at the series' mean rate r, state 1 at
    * 1.15r (tuned to the feed's ±13% daily variation); per-day costs are the Poisson negative log-likelihoods
    * (constant y! dropped), entering the burst state costs γ = 5e5
    * micros, leaving is free — the decoded state sequence marks
    * sustained elevated-rate runs, robust to the single-day spikes
    * that fool a threshold.
    *
    * Engine parity: float work (one ln per state) is rounded to
    * integer MICROS once per (day, state); the entire DP then runs in
    * BIGINT compares/adds with an explicit ≤ tie-break, and the argmin
    * path rides along as a '0'/'1' string — both engines decode the
    * identical path. Scale shape: the DP folds row-locally over each
    * type's calendar-bounded array (the [[qHoltForecast]] discipline:
    * sequential models parallelize BY KEY), costs are one keyed join,
    * and nothing is per-event after the grid build. */
  val burstOracleSql: String = s"""
      WITH RECURSIVE $dailySpineSql,
      r AS (SELECT event_type, CAST(SUM(x) AS DOUBLE) / COUNT(*) AS r0
        FROM grid GROUP BY 1),
      mn AS (SELECT event_type, MIN(d) AS mn FROM grid GROUP BY 1),
      c AS (SELECT g.event_type, g.d - m.mn AS t, g.d, g.x,
          CAST(round((r.r0 - g.x * ln(r.r0)) * 1000000) AS BIGINT) AS c0,
          CAST(round((1.15 * r.r0 - g.x * ln(1.15 * r.r0)) * 1000000) AS BIGINT) AS c1
        FROM grid g JOIN r USING (event_type) JOIN mn m USING (event_type)),
      tm AS (SELECT event_type, MAX(t) AS tm FROM c GROUP BY 1),
      dp AS (
        SELECT event_type, CAST(0 AS BIGINT) AS t, c0 AS v0,
          c1 + 500000 AS v1, '0' AS p0, '1' AS p1
        FROM c WHERE t = 0
        UNION ALL
        SELECT d.event_type, d.t + 1,
          c.c0 + CASE WHEN d.v0 <= d.v1 THEN d.v0 ELSE d.v1 END,
          c.c1 + CASE WHEN d.v0 + 500000 <= d.v1
                      THEN d.v0 + 500000 ELSE d.v1 END,
          CASE WHEN d.v0 <= d.v1 THEN d.p0 ELSE d.p1 END || '0',
          CASE WHEN d.v0 + 500000 <= d.v1 THEN d.p0 ELSE d.p1 END || '1'
        FROM dp d JOIN c ON c.event_type = d.event_type AND c.t = d.t + 1),
      fin AS (SELECT dp.event_type,
          CASE WHEN v0 <= v1 THEN p0 ELSE p1 END AS path
        FROM dp JOIN tm ON tm.event_type = dp.event_type AND dp.t = tm.tm)
      SELECT c.event_type, c.d, c.x AS y,
        CAST(substr(f.path, CAST(c.t AS INT) + 1, 1) AS BIGINT) AS burst
      FROM c JOIN fin f USING (event_type)
      ORDER BY event_type, d"""

  val qBurstViterbi: Spec = Spec(
    "ev_burst_viterbi",
    oracle = Some(burstOracleSql)) { (s, dir) =>
    burstDecodeOverGrid(dailyCountSpine(s, dir))
  }

  /** The Viterbi decode behind [[qBurstViterbi]], over any
    * (event_type, d, x) grid — exposed so tests can pin the decode on
    * hand-built series independent of the oracle. */
  def burstDecodeOverGrid(g: DataFrame): DataFrame = {
    import g.sparkSession.implicits._
    val gamma = 500000L
    val r = g.groupBy($"event_type")
      .agg((sum($"x").cast("double") / count(lit(1))).as("r0"))
    val mins = g.groupBy($"event_type").agg(min($"d").as("mn"))
    val c = g.join(r, "event_type").join(mins, "event_type")
      .select($"event_type", $"d", ($"d" - $"mn").as("t"), $"x",
        round(($"r0" - $"x" * log($"r0")) * 1e6).cast("long").as("c0"),
        round((lit(1.15) * $"r0" - $"x" * log(lit(1.15) * $"r0")) * 1e6)
          .cast("long").as("c1"))
    val arr = c.groupBy($"event_type")
      .agg(sort_array(collect_list(struct($"t", $"d", $"x", $"c0", $"c1")))
        .as("a"))
    val folded = arr.withColumn("st",
      aggregate(
        slice($"a", lit(2), size($"a") - 1),
        struct(
          element_at($"a", 1).getField("c0").as("v0"),
          (element_at($"a", 1).getField("c1") + lit(gamma)).as("v1"),
          lit("0").as("p0"), lit("1").as("p1")),
        (acc, e) => struct(
          (e.getField("c0") +
            least(acc.getField("v0"), acc.getField("v1"))).as("v0"),
          (e.getField("c1") +
            least(acc.getField("v0") + lit(gamma), acc.getField("v1")))
            .as("v1"),
          concat(when(acc.getField("v0") <= acc.getField("v1"),
            acc.getField("p0")).otherwise(acc.getField("p1")), lit("0"))
            .as("p0"),
          concat(when(acc.getField("v0") + lit(gamma) <= acc.getField("v1"),
            acc.getField("p0")).otherwise(acc.getField("p1")), lit("1"))
            .as("p1"))))
      .withColumn("path",
        when($"st.v0" <= $"st.v1", $"st.p0").otherwise($"st.p1"))
    folded
      .select($"event_type", explode(transform($"a", (e, i) =>
        struct(e.getField("d").as("d"), e.getField("x").as("y"),
          element_at(split($"path", ""), (i + 1).cast("int")).as("b"))))
        .as("z"))
      .select($"event_type", $"z.d".as("d"), $"z.y".as("y"),
        $"z.b".cast("long").as("burst"))
      .orderBy($"event_type", $"d")
  }

  /** Unnormalized Haar wavelet decomposition (Haar 1910; the classic
    * time-series compression/denoising basis) of each type's first 32
    * grid days (zero-padded): level-ℓ smooth s[k] = s'[2k] + s'[2k+1],
    * detail d[k] = s'[2k] − s'[2k+1], five levels down to one approx
    * coefficient — a big |detail| at level ℓ, offset k localizes a
    * burst of duration ~2^ℓ days at day k·2^ℓ, the multi-resolution
    * complement of [[qCusum]]'s single-shift detector. Unnormalized
    * Haar is pure INTEGER arithmetic, so both engines agree exactly.
    * Scale shape: five calendar-bounded hash aggregates (32 → 16 → …
    * → 1 rows per type), each with map-side partials; nothing is
    * per-event after the first grid build. */
  val qHaarDaily: Spec = Spec(
    "ev_haar_daily",
    oracle = Some(s"""
      WITH $dailySpineSql,
      mn AS (SELECT event_type, MIN(d) AS mn FROM grid GROUP BY 1),
      t0 AS (SELECT g.event_type, g.d - m.mn AS t, g.x
        FROM grid g JOIN mn m USING (event_type) WHERE g.d - m.mn < 32),
      sp AS (SELECT m.event_type, u.t
        FROM mn m CROSS JOIN UNNEST(range(0, 32)) AS u(t)),
      g32 AS (SELECT sp.event_type, sp.t AS k,
          CAST(COALESCE(t0.x, 0) AS BIGINT) AS s
        FROM sp LEFT JOIN t0
          ON t0.event_type = sp.event_type AND t0.t = sp.t),
      l1 AS (SELECT event_type, k // 2 AS k, CAST(SUM(s) AS BIGINT) AS s,
          CAST(SUM(CASE WHEN k % 2 = 0 THEN s ELSE -s END) AS BIGINT) AS d
        FROM g32 GROUP BY 1, 2),
      l2 AS (SELECT event_type, k // 2 AS k, CAST(SUM(s) AS BIGINT) AS s,
          CAST(SUM(CASE WHEN k % 2 = 0 THEN s ELSE -s END) AS BIGINT) AS d
        FROM l1 GROUP BY 1, 2),
      l3 AS (SELECT event_type, k // 2 AS k, CAST(SUM(s) AS BIGINT) AS s,
          CAST(SUM(CASE WHEN k % 2 = 0 THEN s ELSE -s END) AS BIGINT) AS d
        FROM l2 GROUP BY 1, 2),
      l4 AS (SELECT event_type, k // 2 AS k, CAST(SUM(s) AS BIGINT) AS s,
          CAST(SUM(CASE WHEN k % 2 = 0 THEN s ELSE -s END) AS BIGINT) AS d
        FROM l3 GROUP BY 1, 2),
      l5 AS (SELECT event_type, k // 2 AS k, CAST(SUM(s) AS BIGINT) AS s,
          CAST(SUM(CASE WHEN k % 2 = 0 THEN s ELSE -s END) AS BIGINT) AS d
        FROM l4 GROUP BY 1, 2)
      SELECT event_type, CAST(level AS BIGINT) AS level,
        CAST(k AS BIGINT) AS k, CAST(coeff AS BIGINT) AS coeff
      FROM (
        SELECT event_type, 0 AS level, k, s AS coeff FROM l5
        UNION ALL SELECT event_type, 5, k, d FROM l5
        UNION ALL SELECT event_type, 4, k, d FROM l4
        UNION ALL SELECT event_type, 3, k, d FROM l3
        UNION ALL SELECT event_type, 2, k, d FROM l2
        UNION ALL SELECT event_type, 1, k, d FROM l1)
      ORDER BY event_type, level, k""")) { (s, dir) =>
    import s.implicits._
    val g = dailyCountSpine(s, dir)
    val mins = g.groupBy($"event_type").agg(min($"d").as("mn"))
    val t0 = g.join(mins, "event_type")
      .select($"event_type", ($"d" - $"mn").as("t"), $"x")
      .filter($"t" < 32)
    val spine32 = mins
      .select($"event_type", explode(sequence(lit(0L), lit(31L))).as("t"))
    var smooth = spine32.join(t0, Seq("event_type", "t"), "left")
      .select($"event_type", $"t".as("k"), coalesce($"x", lit(0L)).as("s"))
    var out: DataFrame = null
    for (lvl <- 1 to 5) {
      val paired = smooth.select($"event_type",
        expr("k div 2").as("k2"),
        when($"k" % 2 === 0, $"s").otherwise(-$"s").as("sd"), $"s")
      val nxt = paired.groupBy($"event_type", $"k2")
        .agg(sum($"s").as("s"), sum($"sd").as("d"))
      val det = nxt.select($"event_type", lit(lvl.toLong).as("level"),
        $"k2".as("k"), $"d".as("coeff"))
      out = if (out == null) det else out.unionAll(det)
      smooth = nxt.select($"event_type", $"k2".as("k"), $"s")
    }
    out
      .unionAll(smooth.select($"event_type", lit(0L).as("level"),
        $"k", $"s".as("coeff")))
      .select($"event_type", $"level", $"k".cast("long").as("k"),
        $"coeff".cast("long").as("coeff"))
      .orderBy($"event_type", $"level", $"k")
  }

  /** CUSUM changepoint detection on the per-type daily count series —
    * the sustained-shift detector that complements [[qRateAnomaly]]'s
    * point-outlier z-scores: a level change too small to trip any
    * single-day gate accumulates linearly in the CUSUM statistic and
    * alarms within days. One-sided recursions
    * S⁺_t = max(0, S⁺_{t-1} + (x_t − μ)), S⁻ symmetric, computed
    * WITHOUT sequential recursion via the prefix identity
    * S⁺_t = P_t − min(0, min_{j≤t} P_j) (P = running sum of
    * deviations) — two window functions over one calendar-bounded
    * per-type frame instead of an inherently serial scan.
    *
    * Everything is integer: μ is the floored per-type mean, the
    * threshold h = 5·⌈σ⌉ derives from integer sufficient statistics
    * (its one sqrt is fixed IEEE), so both engines agree exactly. */
  /** Shared with the streaming twin st_cusum_changepoint. */
  val cusumOracleSql: String = s"""
      WITH $dailySpineSql,
      st AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
          CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(x*x) AS BIGINT) AS sxx
        FROM grid GROUP BY 1),
      par AS (SELECT event_type, sx // n AS mu,
          5 * CAST(ceil(sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
            - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
            / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))) AS BIGINT) AS h
        FROM st),
      pre0 AS (SELECT g.event_type, g.d, g.x, p.mu, p.h,
          SUM(g.x - p.mu) OVER (PARTITION BY g.event_type ORDER BY g.d
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pp
        FROM grid g JOIN par p ON p.event_type = g.event_type),
      pre AS (SELECT event_type, d, x, mu, h, pp,
          MIN(pp) OVER w AS mn, MAX(pp) OVER w AS mx
        FROM pre0 WINDOW w AS (PARTITION BY event_type ORDER BY d
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
      SELECT event_type,
        strftime(make_timestamp(d * 86400000000), '%Y-%m-%d') AS day,
        CAST(x AS BIGINT) AS x, CAST(mu AS BIGINT) AS mu,
        CAST(h AS BIGINT) AS h,
        CAST(pp - LEAST(0, mn) AS BIGINT) AS cusum_pos,
        CAST(GREATEST(0, mx) - pp AS BIGINT) AS cusum_neg,
        (pp - LEAST(0, mn) > h OR GREATEST(0, mx) - pp > h) AS alarm
      FROM pre ORDER BY event_type, day"""

  /** The CUSUM tail over a complete (event_type, d, x) day grid —
    * shared by the batch query and the streaming twin. */
  def cusumOverDayGrid(grid: DataFrame): DataFrame = {
    val s = grid.sparkSession
    import s.implicits._
    val par = grid.groupBy($"event_type").agg(
        count(lit(1)).as("n"), sum($"x").as("sx"),
        sum($"x" * $"x").as("sxx"))
      .select($"event_type", ($"sx" / $"n").cast("long").as("mu"),
        (lit(5) * ceil(sqrt(
          ($"n".cast("double") * $"sxx".cast("double") -
            $"sx".cast("double") * $"sx".cast("double")) /
            ($"n".cast("double") * $"n".cast("double")))).cast("long"))
          .as("h"))
    val w = Window.partitionBy($"event_type").orderBy($"d")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val pre = grid.join(par, Seq("event_type"))
      .withColumn("pp", sum($"x" - $"mu").over(w))
      .withColumn("mn", min($"pp").over(w))
      .withColumn("mx", max($"pp").over(w))
    pre.select($"event_type",
        date_format(timestamp_micros($"d" * lit(86400000000L)), "yyyy-MM-dd")
          .as("day"),
        $"x".cast("long").as("x"), $"mu", $"h",
        ($"pp" - least(lit(0L), $"mn")).cast("long").as("cusum_pos"),
        (greatest(lit(0L), $"mx") - $"pp").cast("long").as("cusum_neg"),
        ($"pp" - least(lit(0L), $"mn") > $"h" ||
          greatest(lit(0L), $"mx") - $"pp" > $"h").as("alarm"))
      .orderBy($"event_type", $"day")
  }

  val qCusumChangepoint: Spec = Spec(
    "ev_cusum_changepoint",
    oracle = Some(cusumOracleSql)) { (s, dir) =>
    cusumOverDayGrid(dailyCountSpine(s, dir))
  }

  /** Dyadic EWMA weights w(k) = 2^-k for k = 0..128: every value is an
    * exact power of two (exponent shift, no rounding), so λ = 1/2
    * makes the whole smoothing ladder exactly representable — the
    * trick that lets an "approximate" EWMA hash-match across engines.
    * The oracle receives the SAME values as exact decimal literals
    * (2^-k has a finite k-digit expansion; correctly-rounded parse
    * recovers the identical double). Terms older than 128 steps drop
    * on BOTH engines via the inner weight join — w(129) < 1.5e-39 is
    * far below the 9dp contribution rounding for any feasible count. */
  private val EwmaMaxLag = 128
  private def ewmaWeights(s: SparkSession): DataFrame = {
    import s.implicits._
    (0 to EwmaMaxLag).map(k => (k.toLong, math.scalb(1.0, -k)))
      .toDF("k", "w")
  }
  private val ewmaWeightsSql: String = {
    val rows = (0 to EwmaMaxLag).map { k =>
      val w = java.math.BigDecimal.ONE
        .divide(new java.math.BigDecimal(2).pow(k)).toPlainString
      s"(CAST($k AS BIGINT), CAST('$w' AS DOUBLE))"
    }
    s"wt(k, w) AS (SELECT * FROM (VALUES ${rows.mkString(", ")}))"
  }

  /** Shared with the streaming twin st_ewma_control. */
  val ewmaControlOracleSql: String = s"""
      WITH $dailySpineSql,
      $ewmaWeightsSql,
      idx AS (SELECT event_type, d, x,
          row_number() OVER (PARTITION BY event_type ORDER BY d) - 1 AS t
        FROM grid),
      par AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS nd,
          SUM(x::HUGEINT) AS s, SUM(x::HUGEINT * x) AS q
        FROM idx GROUP BY event_type HAVING COUNT(*) > 1),
      st AS (SELECT event_type, CAST(s AS DOUBLE) / CAST(nd AS DOUBLE) AS mu,
          sqrt(CAST(nd * q - s * s AS DOUBLE)
            / CAST(nd * (nd - 1) AS DOUBLE)) AS sig
        FROM par),
      z AS (SELECT a.event_type, a.d, a.x, a.t,
          CAST(SUM(CAST(round(b.x * wt.w, 9) AS DECIMAL(28,12)))
            AS DOUBLE) AS ewma
        FROM idx a JOIN idx b
          ON b.event_type = a.event_type AND b.t <= a.t
        JOIN wt ON wt.k = CASE WHEN b.t = 0 THEN a.t ELSE a.t - b.t + 1 END
        GROUP BY a.event_type, a.d, a.x, a.t),
      lim AS (SELECT z.event_type, z.d, z.x, z.ewma,
          st.mu + 3.0e0 * st.sig
            * sqrt((1.0e0 + 2.0e0 * COALESCE(w2.w, 0.0e0)) / 3.0e0) AS ucl,
          st.mu - 3.0e0 * st.sig
            * sqrt((1.0e0 + 2.0e0 * COALESCE(w2.w, 0.0e0)) / 3.0e0) AS lcl
        FROM z JOIN st ON st.event_type = z.event_type
        LEFT JOIN wt w2 ON w2.k = 2 * z.t)
      SELECT event_type,
        strftime(make_timestamp(d * 86400000000), '%Y-%m-%d') AS day,
        CAST(x AS BIGINT) AS x,
        CAST(FLOOR(ewma * 1000000) AS BIGINT) AS ewma_micros,
        CAST(FLOOR(lcl * 1000000) AS BIGINT) AS lcl_micros,
        CAST(FLOOR(ucl * 1000000) AS BIGINT) AS ucl_micros,
        ewma > ucl OR ewma < lcl AS out_of_control
      FROM lim ORDER BY event_type, day"""

  /** The EWMA-chart tail over a complete (event_type, d, x) day grid —
    * shared by the batch query and the streaming twin. */
  def ewmaControlOverDayGrid(grid: DataFrame): DataFrame = {
    val s = grid.sparkSession
    import s.implicits._
    val idx = grid
      .withColumn("t", row_number().over(
        Window.partitionBy($"event_type").orderBy($"d")).cast("long") - 1)
      .localCheckpoint() // both sides of the triangular join + moments
    val par = idx.groupBy($"event_type")
      .agg(count(lit(1)).as("nd"),
        sum($"x".cast("decimal(38,0)")).as("s"),
        sum($"x".cast("decimal(38,0)") * $"x").as("q"))
      .filter($"nd" > 1)
    val st = par.select($"event_type",
      ($"s".cast("double") / $"nd".cast("double")).as("mu"),
      sqrt(($"nd" * $"q" - $"s" * $"s").cast("double") /
        ($"nd" * ($"nd" - 1)).cast("double")).as("sig"))
    val wt = broadcast(ewmaWeights(s))
    val a = idx.select($"event_type", $"d", $"x", $"t")
    val b = idx.select($"event_type".as("et_b"), $"x".as("xb"), $"t".as("tb"))
    val z = a.join(b, $"et_b" === $"event_type" && $"tb" <= $"t")
      .join(wt,
        $"k" === when($"tb" === 0, $"t").otherwise($"t" - $"tb" + 1))
      .groupBy($"event_type", $"d", $"x", $"t")
      .agg(sum(round($"xb" * $"w", 9).cast("decimal(28,12)"))
        .cast("double").as("ewma"))
    val fac = sqrt((lit(1.0) + lit(2.0) * coalesce($"w2", lit(0.0))) / lit(3.0))
    z.join(broadcast(st), Seq("event_type"))
      .join(broadcast(ewmaWeights(s).select($"k".as("k2"), $"w".as("w2"))),
        $"k2" === lit(2) * $"t", "left")
      .select($"event_type",
        date_format(timestamp_micros($"d" * lit(86400000000L)), "yyyy-MM-dd")
          .as("day"),
        $"x".cast("long").as("x"),
        floor($"ewma" * 1e6).cast("long").as("ewma_micros"),
        floor(($"mu" - lit(3.0) * $"sig" * fac) * 1e6).cast("long")
          .as("lcl_micros"),
        floor(($"mu" + lit(3.0) * $"sig" * fac) * 1e6).cast("long")
          .as("ucl_micros"),
        ($"ewma" > $"mu" + lit(3.0) * $"sig" * fac ||
          $"ewma" < $"mu" - lit(3.0) * $"sig" * fac).as("out_of_control"))
      .orderBy($"event_type", $"day")
  }

  /** EWMA CONTROL CHART (Roberts '59; the SPC standard for detecting
    * SMALL persistent shifts that a Shewhart/3σ rule misses) over the
    * per-type daily count series: λ = 1/2 smoothing started at
    * z₀ = x₀, with the time-dependent limits μ ± 3σ·√((1+2·4⁻ᵗ)/3) —
    * the EXACT variance of the estimator under the x₀ start (wide at
    * t=0 where z is one raw observation, shrinking to the textbook
    * asymptote σ²·λ/(2−λ) = σ²/3).
    * Complements [[qCusumChangepoint]] (CUSUM localizes a single level
    * shift; the EWMA chart flags every excursion against a smoothed
    * memory) and [[qRateAnomaly]] (whose z-score has no memory at
    * all).
    *
    * Exactness: λ = 1/2 makes every smoothing weight 2^-k an EXACT
    * double (see [[ewmaWeights]]); contributions are 9dp-rounded
    * products summed as DECIMAL (order-free), μ/σ come from exact
    * integer moments with one float division each, and the limit
    * arithmetic is fixed-order IEEE — both engines land on identical
    * bits, surfaced as floor-micros.
    *
    * Scale shape: the corpus-size-dependent work is ONE hash agg to
    * the day grid; the closed-form expansion is a triangular self-join
    * of the grid (|types|·T²/2 rows — grows with the SQUARE OF TIME,
    * not with data; a decade of days is ~53M pairs) joined to a
    * 129-row broadcast weight table. The recursive streaming form
    * (st_ewma_control) carries O(1) state per type instead. */
  val qEwmaControl: Spec = Spec(
    "ev_ewma_control",
    oracle = Some(ewmaControlOracleSql)) { (s, dir) =>
    ewmaControlOverDayGrid(dailyCountSpine(s, dir))
  }

  /** CUPED variance-reduced A/B readout (Deng, Xu, Kohavi & Walker
    * '13 — the experimentation-platform standard): users split into
    * two deterministic variants (user_id parity); each user's metric
    * is their SECOND-half-of-window value total (y), the covariate
    * their FIRST-half total (x); the pooled θ = cov(x,y)/var(x) gives
    * the adjusted metric y − θ(x − x̄), whose per-variant mean is
    * unchanged in expectation but whose variance drops by the squared
    * x-y correlation — the sensitivity win that lets experiments
    * conclude earlier. Reports per variant both raw and adjusted
    * means/variances and the realized variance reduction in basis
    * points.
    *
    * Engine parity: per-event values become exact integer micros at
    * the scan (round half-away-from-zero, identical in both engines);
    * every per-user and per-variant moment (n, Σx, Σy, Σx², Σy², Σxy)
    * is then an exact DECIMAL(38,0) integer, the pre/post split
    * compares 2·us ≤ min+max in integers (no division), and θ, means,
    * variances are fixed-order IEEE ops on those exact integers —
    * identical bits, surfaced as floor-micros.
    *
    * Scale shape: one bounds agg (broadcast 1-row), ONE conditional
    * hash agg to per-user (x, y) — users are high-cardinality, no
    * skew — and one 2-row variant agg; θ folds from the 2-row frame.
    * Nothing beyond the user agg touches corpus-sized data. */
  /** The A/B per-user / per-variant moment scaffold shared by the
    * experimentation oracles (CUPED, diff-in-diff, covariate balance):
    * integer-micro values, the no-division pre/post split, per-user
    * (x, y) totals, per-variant exact moments. */
  private val abMomentsCte: String = """
      ev AS (SELECT user_id, epoch_us(ts) AS us,
          CAST(round(value * 1000000) AS BIGINT) AS vm
        FROM events),
      bounds AS (SELECT MIN(us) AS mn, MAX(us) AS mx FROM ev),
      u AS (SELECT user_id,
          SUM(CASE WHEN 2 * us <= bounds.mn + bounds.mx THEN vm
              ELSE 0 END)::HUGEINT AS x,
          SUM(CASE WHEN 2 * us > bounds.mn + bounds.mx THEN vm
              ELSE 0 END)::HUGEINT AS y
        FROM ev CROSS JOIN bounds GROUP BY user_id),
      v AS (SELECT user_id % 2 AS variant, CAST(COUNT(*) AS BIGINT) AS n,
          SUM(x) AS sx, SUM(y) AS sy, SUM(x * x) AS sxx,
          SUM(y * y) AS syy, SUM(x * y) AS sxy
        FROM u GROUP BY 1)"""

  /** The Spark twin of [[abMomentsCte]]: the 2-row per-variant moment
    * frame over per-user pre/post integer-micro totals. */
  private def abMoments(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = load(s, dir)
      .select($"user_id", expr("ts div 1000").as("us"),
        round($"value" * 1e6).cast("long").as("vm"))
    val bounds = broadcast(ev.agg(min($"us").as("mn"), max($"us").as("mx")))
    val u = ev.crossJoin(bounds)
      .groupBy($"user_id")
      .agg(
        sum(when(lit(2) * $"us" <= $"mn" + $"mx", $"vm").otherwise(0L)
          .cast("decimal(38,0)")).as("x"),
        sum(when(lit(2) * $"us" > $"mn" + $"mx", $"vm").otherwise(0L)
          .cast("decimal(38,0)")).as("y"))
    u.groupBy(($"user_id" % 2).as("variant"))
      .agg(count(lit(1)).as("n"), sum($"x").as("sx"), sum($"y").as("sy"),
        sum($"x" * $"x").as("sxx"), sum($"y" * $"y").as("syy"),
        sum($"x" * $"y").as("sxy"))
  }

  val qCupedAdjustment: Spec = Spec(
    "ev_cuped_adjustment",
    oracle = Some(s"""
      WITH $abMomentsCte,
      g AS (SELECT SUM(n) AS n, SUM(sx) AS sx, SUM(sy) AS sy,
          SUM(sxx) AS sxx, SUM(sxy) AS sxy
        FROM v),
      th AS (SELECT
          CAST(g.n * g.sxy - g.sx * g.sy AS DOUBLE)
            / CAST(g.n * g.sxx - g.sx * g.sx AS DOUBLE) AS theta,
          CAST(g.sx AS DOUBLE) / CAST(g.n AS DOUBLE) AS gx
        FROM g WHERE g.n * g.sxx - g.sx * g.sx > 0),
      r AS (SELECT v.variant, v.n,
          CAST(v.sy AS DOUBLE) / CAST(v.n AS DOUBLE) AS mean_y,
          CAST(v.sy AS DOUBLE) / CAST(v.n AS DOUBLE)
            - th.theta * (CAST(v.sx AS DOUBLE) / CAST(v.n AS DOUBLE)
                          - th.gx) AS mean_yadj,
          CAST(v.n * v.syy - v.sy * v.sy AS DOUBLE)
            / CAST(v.n * (v.n - 1) AS DOUBLE) AS var_y,
          CAST(v.n * v.sxy - v.sx * v.sy AS DOUBLE)
            / CAST(v.n * (v.n - 1) AS DOUBLE) AS cov_v,
          CAST(v.n * v.sxx - v.sx * v.sx AS DOUBLE)
            / CAST(v.n * (v.n - 1) AS DOUBLE) AS var_x,
          th.theta
        FROM v CROSS JOIN th WHERE v.n > 1)
      SELECT CAST(variant AS BIGINT) AS variant, n AS n_users,
        CAST(FLOOR(theta * 1000000) AS BIGINT) AS theta_micros,
        CAST(FLOOR(mean_y) AS BIGINT) AS mean_y_micros,
        CAST(FLOOR(mean_yadj) AS BIGINT) AS mean_yadj_micros,
        CAST(FLOOR(var_y / 1000000) AS BIGINT) AS var_y_micros,
        CAST(FLOOR((var_y - 2.0e0 * theta * cov_v
                    + theta * theta * var_x) / 1000000) AS BIGINT)
          AS var_yadj_micros,
        CAST(FLOOR((1.0e0 - (var_y - 2.0e0 * theta * cov_v
                             + theta * theta * var_x) / var_y) * 10000)
          AS BIGINT) AS var_reduction_bp
      FROM r WHERE var_y > 0 ORDER BY variant""")) { (s, dir) =>
    import s.implicits._
    val v = abMoments(s, dir)
      .localCheckpoint() // 2-row frame: feeds theta AND the readout
    val g = v.agg(sum($"n").as("gn"), sum($"sx").as("gsx"),
      sum($"sy").as("gsy"), sum($"sxx").as("gsxx"), sum($"sxy").as("gsxy"))
    val th = broadcast(g
      .filter($"gn" * $"gsxx" - $"gsx" * $"gsx" > 0)
      .select(
        (($"gn" * $"gsxy" - $"gsx" * $"gsy").cast("double") /
          ($"gn" * $"gsxx" - $"gsx" * $"gsx").cast("double")).as("theta"),
        ($"gsx".cast("double") / $"gn".cast("double")).as("gx")))
    val meanY = $"sy".cast("double") / $"n".cast("double")
    val meanYadj = meanY - $"theta" *
      ($"sx".cast("double") / $"n".cast("double") - $"gx")
    val varY = ($"n" * $"syy" - $"sy" * $"sy").cast("double") /
      ($"n" * ($"n" - 1)).cast("double")
    val covV = ($"n" * $"sxy" - $"sx" * $"sy").cast("double") /
      ($"n" * ($"n" - 1)).cast("double")
    val varX = ($"n" * $"sxx" - $"sx" * $"sx").cast("double") /
      ($"n" * ($"n" - 1)).cast("double")
    val varYadj = varY - lit(2.0) * $"theta" * covV +
      $"theta" * $"theta" * varX
    v.filter($"n" > 1).crossJoin(th)
      .filter(varY > 0)
      .select($"variant".cast("long").as("variant"), $"n".as("n_users"),
        floor($"theta" * 1e6).cast("long").as("theta_micros"),
        floor(meanY).cast("long").as("mean_y_micros"),
        floor(meanYadj).cast("long").as("mean_yadj_micros"),
        floor(varY / 1e6).cast("long").as("var_y_micros"),
        floor(varYadj / 1e6).cast("long").as("var_yadj_micros"),
        floor((lit(1.0) - varYadj / varY) * 1e4).cast("long")
          .as("var_reduction_bp"))
      .orderBy($"variant")
  }

  /** SAMPLE RATIO MISMATCH check (Fabijan '19 — the #1 experiment
    * validity guardrail): is the observed variant split consistent
    * with the designed 50/50? A skewed split means assignment or
    * logging is broken and EVERY downstream readout (CUPED, DiD,
    * two-proportion) is invalid — platforms gate results on this
    * before showing them. χ² against equal expected counts collapses
    * to (n₀ − n₁)²/(n₀ + n₁), compared to the 1-df 95%/99% critical
    * values (3.841 / 6.635, shared literals).
    *
    * Engine parity: one COUNT DISTINCT split by parity, the statistic
    * is an exact-integer cross ratio with one float division,
    * floor-micros; the verdict is a comparison of identical doubles.
    * Units: USERS (assignment granularity), not events. */
  val qSrmCheck: Spec = Spec(
    "ev_srm_check",
    oracle = Some("""
      WITH u AS (SELECT DISTINCT user_id FROM events),
      c AS (SELECT
          CAST(COUNT(CASE WHEN user_id % 2 = 0 THEN 1 END) AS BIGINT) AS n0,
          CAST(COUNT(CASE WHEN user_id % 2 = 1 THEN 1 END) AS BIGINT) AS n1
        FROM u)
      SELECT n0 AS n_control, n1 AS n_treat,
        CAST(FLOOR(CAST((n0 - n1) * (n0 - n1) AS DOUBLE)
          / CAST(n0 + n1 AS DOUBLE) * 1000000) AS BIGINT) AS chi2_micros,
        CAST((n0 - n1) * (n0 - n1) AS DOUBLE) / CAST(n0 + n1 AS DOUBLE)
          > 3.841e0 AS srm_at_95,
        CAST((n0 - n1) * (n0 - n1) AS DOUBLE) / CAST(n0 + n1 AS DOUBLE)
          > 6.635e0 AS srm_at_99
      FROM c WHERE n0 + n1 > 0""")) { (s, dir) =>
    import s.implicits._
    val chi2 = (($"n0" - $"n1") * ($"n0" - $"n1")).cast("double") /
      ($"n0" + $"n1").cast("double")
    load(s, dir).select($"user_id").distinct()
      .agg(count(when($"user_id" % 2 === 0, 1)).as("n0"),
        count(when($"user_id" % 2 === 1, 1)).as("n1"))
      .filter($"n0" + $"n1" > 0)
      .select($"n0".as("n_control"), $"n1".as("n_treat"),
        floor(chi2 * 1e6).cast("long").as("chi2_micros"),
        (chi2 > 3.841).as("srm_at_95"),
        (chi2 > 6.635).as("srm_at_99"))
  }

  /** POWER ANALYSIS for the conversion A/B test: for a grid of target
    * lifts, the required per-arm sample size at 80% power / two-sided
    * α = 0.05 on the observed base conversion rate (unit = USER-DAY —
    * every user in this corpus eventually purchases, so the user-level
    * rate saturates at 1; the daily-conversion unit is what a
    * continuously-running experiment randomizes anyway),
    * n = (z_{α/2} + z_β)²·(p₁q₁ + p₂q₂)/(p₂ − p₁)², next to the
    * users actually available per arm — the "can this experiment even
    * conclude?" pre-flight every platform runs before assigning
    * traffic (z constants 1.96 / 0.8416 are the standard normal
    * quantiles, stated as shared literals).
    *
    * Engine parity: the base rate is one exact-integer ratio; the
    * sizing formula is fixed-order IEEE with one ceil; availability
    * is integer division. Scale shape: one conversion hash-agg, a
    * 4-row literal grid broadcast. */
  val qPowerAnalysis: Spec = Spec(
    "ev_power_analysis",
    oracle = Some("""
      WITH ud AS (SELECT user_id,
          CAST(FLOOR(epoch_us(ts) / 86400000000) AS BIGINT) AS d,
          event_type
        FROM events),
      b AS (SELECT
          CAST(COUNT(DISTINCT (user_id, d)) AS BIGINT) AS n_users,
          CAST(COUNT(DISTINCT CASE WHEN event_type = 'purchase'
            THEN (user_id, d) END) AS BIGINT) AS n_conv
        FROM ud),
      g AS (SELECT CAST(lift_bp AS BIGINT) AS lift_bp FROM (VALUES
        (100), (200), (500), (1000)) t(lift_bp)),
      c AS (SELECT g.lift_bp, b.n_users,
          CAST(b.n_conv AS DOUBLE) / CAST(b.n_users AS DOUBLE) AS p1
        FROM g CROSS JOIN b WHERE b.n_conv > 0 AND b.n_conv < b.n_users),
      s AS (SELECT lift_bp, n_users, p1,
          p1 * (1.0e0 + CAST(lift_bp AS DOUBLE) / 10000.0e0) AS p2
        FROM c),
      r AS (SELECT lift_bp, n_users, p1, p2,
          CAST(CEIL((1.96e0 + 0.8416e0) * (1.96e0 + 0.8416e0)
            * (p1 * (1.0e0 - p1) + p2 * (1.0e0 - p2))
            / ((p2 - p1) * (p2 - p1))) AS BIGINT) AS n_required
        FROM s WHERE p2 < 1.0e0)
      SELECT lift_bp,
        CAST(FLOOR(p1 * 1000000) AS BIGINT) AS p_base_micros,
        CAST(FLOOR(p2 * 1000000) AS BIGINT) AS p_target_micros,
        n_required, n_users // 2 AS n_available_per_arm,
        n_users // 2 >= n_required AS powered
      FROM r ORDER BY lift_bp""")) { (s, dir) =>
    import s.implicits._
    val b = broadcast(load(s, dir)
      .select($"user_id", ($"ts" / lit(86400L * 1000 * 1000 * 1000))
        .cast("long").as("d"), $"event_type")
      .agg(
        countDistinct($"user_id", $"d").as("n_users"),
        countDistinct(when($"event_type" === "purchase", $"user_id"),
          when($"event_type" === "purchase", $"d")).as("n_conv")))
    val g = Seq(100L, 200L, 500L, 1000L).toDF("lift_bp")
    val p1 = $"n_conv".cast("double") / $"n_users".cast("double")
    val zsum = lit(1.96) + lit(0.8416)
    g.crossJoin(b)
      .filter($"n_conv" > 0 && $"n_conv" < $"n_users")
      .withColumn("p1", p1)
      .withColumn("p2",
        $"p1" * (lit(1.0) + $"lift_bp".cast("double") / lit(10000.0)))
      .filter($"p2" < 1.0)
      .select($"lift_bp",
        floor($"p1" * 1e6).cast("long").as("p_base_micros"),
        floor($"p2" * 1e6).cast("long").as("p_target_micros"),
        ceil(zsum * zsum *
          ($"p1" * (lit(1.0) - $"p1") + $"p2" * (lit(1.0) - $"p2")) /
          (($"p2" - $"p1") * ($"p2" - $"p1"))).cast("long")
          .as("n_required"),
        expr("n_users div 2").as("n_available_per_arm"),
        (expr("n_users div 2") >=
          ceil(zsum * zsum *
            ($"p1" * (lit(1.0) - $"p1") + $"p2" * (lit(1.0) - $"p2")) /
            (($"p2" - $"p1") * ($"p2" - $"p1"))).cast("long")).as("powered"))
      .orderBy($"lift_bp")
  }

  /** DIFFERENCE-IN-DIFFERENCES readout (Card & Krueger '94 — the
    * causal-inference workhorse when randomization is imperfect): per
    * variant, each user's post-minus-pre change d = y − x; the DiD
    * estimate is the treated-vs-control gap of mean changes,
    * d̄₁ − d̄₀, which cancels both persistent user-level differences
    * AND the common time trend — complementing [[qCupedAdjustment]]
    * (same scaffold; CUPED reduces variance under clean randomization,
    * DiD de-biases when baselines differ). SE via the two-sample
    * Welch form on the per-user change variances; z-flagged at 95%.
    *
    * Engine parity: rides the shared [[abMomentsCte]] exact moments —
    * Σd = Σy − Σx and Σd² = Σy² − 2Σxy + Σx² are exact integer
    * identities (no second pass over users), and everything after is
    * fixed-order IEEE surfaced as floor-micros. */
  val qDiffInDiff: Spec = Spec(
    "ev_diff_in_diff",
    oracle = Some(s"""
      WITH $abMomentsCte,
      c AS (SELECT variant, n,
          CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS mean_pre,
          CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) AS mean_post,
          CAST(sy - sx AS DOUBLE) / CAST(n AS DOUBLE) AS dmean,
          CAST(n * (syy - 2 * sxy + sxx) - (sy - sx) * (sy - sx) AS DOUBLE)
            / CAST(n * (n - 1) AS DOUBLE) AS vard
        FROM v WHERE n > 1),
      d AS (SELECT t.dmean - c0.dmean AS did,
          sqrt(t.vard / CAST(t.n AS DOUBLE)
               + c0.vard / CAST(c0.n AS DOUBLE)) AS se
        FROM c t, c c0 WHERE t.variant = 1 AND c0.variant = 0)
      SELECT CAST(c.variant AS BIGINT) AS variant, c.n AS n_users,
        CAST(FLOOR(c.mean_pre) AS BIGINT) AS mean_pre_micros,
        CAST(FLOOR(c.mean_post) AS BIGINT) AS mean_post_micros,
        CAST(FLOOR(c.dmean) AS BIGINT) AS delta_micros,
        CAST(FLOOR(d.did) AS BIGINT) AS did_micros,
        CAST(FLOOR(d.se) AS BIGINT) AS se_micros,
        abs(d.did) > 1.96e0 * d.se AS significant_95
      FROM c CROSS JOIN d ORDER BY variant""")) { (s, dir) =>
    import s.implicits._
    val c = abMoments(s, dir).filter($"n" > 1)
      .select($"variant", $"n",
        ($"sx".cast("double") / $"n".cast("double")).as("mean_pre"),
        ($"sy".cast("double") / $"n".cast("double")).as("mean_post"),
        (($"sy" - $"sx").cast("double") / $"n".cast("double")).as("dmean"),
        (($"n" * ($"syy" - lit(2) * $"sxy" + $"sxx") -
          ($"sy" - $"sx") * ($"sy" - $"sx")).cast("double") /
          ($"n" * ($"n" - 1)).cast("double")).as("vard"))
      .localCheckpoint() // 2-row frame: DiD scalar AND the readout
    val d = broadcast(c.filter($"variant" === 1)
      .select($"dmean".as("dm1"), $"vard".as("v1"), $"n".as("n1"))
      .crossJoin(c.filter($"variant" === 0)
        .select($"dmean".as("dm0"), $"vard".as("v0"), $"n".as("n0")))
      .select(($"dm1" - $"dm0").as("did"),
        sqrt($"v1" / $"n1".cast("double")
          + $"v0" / $"n0".cast("double")).as("se")))
    c.crossJoin(d)
      .select($"variant".cast("long").as("variant"), $"n".as("n_users"),
        floor($"mean_pre").cast("long").as("mean_pre_micros"),
        floor($"mean_post").cast("long").as("mean_post_micros"),
        floor($"dmean").cast("long").as("delta_micros"),
        floor($"did").cast("long").as("did_micros"),
        floor($"se").cast("long").as("se_micros"),
        (abs($"did") > lit(1.96) * $"se").as("significant_95"))
      .orderBy($"variant")
  }

  /** COVARIATE BALANCE CHECK — the standardized mean difference (SMD)
    * table every experiment report opens with: per covariate (here
    * the PRE-period per-user totals and the pre event activity), the
    * variant-1-vs-variant-0 gap in pooled-SD units,
    * SMD = (m₁ − m₀)/√((v₁ + v₀)/2). |SMD| < 0.1 is the accepted
    * "balanced" bar; a failing row means randomization is suspect and
    * [[qDiffInDiff]] (not the raw contrast) is the right readout.
    *
    * Engine parity: the value covariate rides [[abMomentsCte]]'s exact
    * moments; the activity covariate gets its own exact per-user count
    * moments via the same split; all divisions/sqrt fixed IEEE,
    * floor-micros. */
  val qCovariateBalance: Spec = Spec(
    "ev_covariate_balance",
    oracle = Some(s"""
      WITH $abMomentsCte,
      ua AS (SELECT user_id,
          SUM(CASE WHEN 2 * us <= bounds.mn + bounds.mx THEN 1
              ELSE 0 END)::HUGEINT AS a
        FROM ev CROSS JOIN bounds GROUP BY user_id),
      va AS (SELECT user_id % 2 AS variant, CAST(COUNT(*) AS BIGINT) AS n,
          SUM(a) AS sx, SUM(a * a) AS sxx
        FROM ua GROUP BY 1),
      mset AS (
        SELECT 'pre_value' AS covariate, variant, n, sx, sxx FROM v
        UNION ALL
        SELECT 'pre_events', variant, n, sx, sxx FROM va),
      m AS (SELECT covariate, variant, n,
          CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS mean,
          CAST(n * sxx - sx * sx AS DOUBLE)
            / CAST(n * (n - 1) AS DOUBLE) AS var
        FROM mset WHERE n > 1),
      smd AS (SELECT t.covariate,
          t.n AS n_treat, c.n AS n_control,
          (t.mean - c.mean) / sqrt((t.var + c.var) / 2.0e0) AS smd
        FROM m t JOIN m c ON c.covariate = t.covariate
        WHERE t.variant = 1 AND c.variant = 0
          AND t.var + c.var > 0)
      SELECT covariate, n_treat, n_control,
        CAST(FLOOR(smd * 1000000) AS BIGINT) AS smd_micros,
        abs(smd) < 0.1e0 AS balanced
      FROM smd ORDER BY covariate""")) { (s, dir) =>
    import s.implicits._
    val ev = load(s, dir)
      .select($"user_id", expr("ts div 1000").as("us"))
    val bounds = broadcast(ev.agg(min($"us").as("mn"), max($"us").as("mx")))
    val va = ev.crossJoin(bounds)
      .groupBy($"user_id")
      .agg(sum(when(lit(2) * $"us" <= $"mn" + $"mx", 1L).otherwise(0L)
        .cast("decimal(38,0)")).as("a"))
      .groupBy(($"user_id" % 2).as("variant"))
      .agg(count(lit(1)).as("n"), sum($"a").as("sx"),
        sum($"a" * $"a").as("sxx"))
    val mset = abMoments(s, dir)
      .select(lit("pre_value").as("covariate"), $"variant", $"n", $"sx",
        $"sxx")
      .unionByName(va.select(lit("pre_events").as("covariate"), $"variant",
        $"n", $"sx", $"sxx"))
    val m = mset.filter($"n" > 1)
      .select($"covariate", $"variant", $"n",
        ($"sx".cast("double") / $"n".cast("double")).as("mean"),
        (($"n" * $"sxx" - $"sx" * $"sx").cast("double") /
          ($"n" * ($"n" - 1)).cast("double")).as("var"))
      .localCheckpoint() // tiny per-(covariate, variant) frame, joined
    val smd = m.filter($"variant" === 1)
      .select($"covariate", $"n".as("n_treat"), $"mean".as("m1"),
        $"var".as("v1"))
      .join(m.filter($"variant" === 0)
        .select($"covariate", $"n".as("n_control"), $"mean".as("m0"),
          $"var".as("v0")), Seq("covariate"))
      .filter($"v1" + $"v0" > 0)
      .select($"covariate", $"n_treat", $"n_control",
        (($"m1" - $"m0") / sqrt(($"v1" + $"v0") / lit(2.0))).as("smd"))
    smd.select($"covariate", $"n_treat", $"n_control",
        floor($"smd" * 1e6).cast("long").as("smd_micros"),
        (abs($"smd") < 0.1).as("balanced"))
      .orderBy($"covariate")
  }

  /** ANOMALY-DETECTOR ENSEMBLE over the per-type daily count series:
    * the three charts that watch the same grid — Shewhart (|x − μ| >
    * 3σ, memoryless), CUSUM ([[qCusumChangepoint]], cumulative level
    * shift) and the EWMA chart ([[qEwmaControl]], smoothed memory) —
    * joined into one per-day vote table with a ≥2-of-3 consensus
    * column. Detectors disagree BY DESIGN (Shewhart catches single
    * spikes CUSUM absorbs; CUSUM catches slow drifts Shewhart never
    * sees); the consensus view is what an on-call surface pages on,
    * and the disagreement pattern is itself the diagnosis.
    *
    * Engine parity: pure composition — each member tail is already
    * bit-identical across engines (their own oracles prove it), the
    * Shewhart flag is the EWMA-chart moment discipline, and the
    * ensemble adds only integer votes and boolean logic. Scale shape:
    * three calendar-bounded tails over ONE shared day grid, joined on
    * (type, day) — grid-sized, data-independent. */
  val qAnomalyEnsemble: Spec = Spec(
    "ev_anomaly_ensemble",
    oracle = Some(s"""
      WITH cus AS ($cusumOracleSql),
      ew AS ($ewmaControlOracleSql),
      $dailySpineSql,
      par AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS nd,
          SUM(x::HUGEINT) AS s, SUM(x::HUGEINT * x) AS q
        FROM grid GROUP BY event_type HAVING COUNT(*) > 1),
      st AS (SELECT event_type, CAST(s AS DOUBLE) / CAST(nd AS DOUBLE) AS mu,
          sqrt(CAST(nd * q - s * s AS DOUBLE)
            / CAST(nd * (nd - 1) AS DOUBLE)) AS sig
        FROM par),
      sh AS (SELECT g.event_type,
          strftime(make_timestamp(g.d * 86400000000), '%Y-%m-%d') AS day,
          CAST(g.x AS BIGINT) AS x,
          CAST(g.x AS DOUBLE) > st.mu + 3.0e0 * st.sig
            OR CAST(g.x AS DOUBLE) < st.mu - 3.0e0 * st.sig AS shewhart_flag
        FROM grid g JOIN st ON st.event_type = g.event_type),
      j AS (SELECT sh.event_type, sh.day, sh.x, sh.shewhart_flag,
          cus.alarm AS cusum_alarm, ew.out_of_control AS ewma_flag
        FROM sh
        JOIN cus ON cus.event_type = sh.event_type AND cus.day = sh.day
        JOIN ew ON ew.event_type = sh.event_type AND ew.day = sh.day),
      v AS (SELECT *,
          CAST(CASE WHEN shewhart_flag THEN 1 ELSE 0 END
            + CASE WHEN cusum_alarm THEN 1 ELSE 0 END
            + CASE WHEN ewma_flag THEN 1 ELSE 0 END AS BIGINT) AS votes
        FROM j)
      SELECT event_type, day, x, shewhart_flag, cusum_alarm, ewma_flag,
        votes, votes >= 2 AS consensus
      FROM v WHERE votes >= 1 ORDER BY event_type, day""")) { (s, dir) =>
    anomalyEnsembleOverDayGrid(dailyCountSpine(s, dir))
  }

  /** The ensemble tail over a complete (event_type, d, x) day grid —
    * shared by the batch query and the streaming twin. */
  def anomalyEnsembleOverDayGrid(grid0: DataFrame): DataFrame = {
    val s = grid0.sparkSession
    import s.implicits._
    val grid = grid0.localCheckpoint() // 3 member tails share it
    val cus = cusumOverDayGrid(grid)
      .select($"event_type", $"day", $"alarm".as("cusum_alarm"))
    val ew = ewmaControlOverDayGrid(grid)
      .select($"event_type", $"day", $"out_of_control".as("ewma_flag"))
    val par = grid.groupBy($"event_type")
      .agg(count(lit(1)).as("nd"),
        sum($"x".cast("decimal(38,0)")).as("s"),
        sum($"x".cast("decimal(38,0)") * $"x").as("q"))
      .filter($"nd" > 1)
    val st = par.select($"event_type",
      ($"s".cast("double") / $"nd".cast("double")).as("mu"),
      sqrt(($"nd" * $"q" - $"s" * $"s").cast("double") /
        ($"nd" * ($"nd" - 1)).cast("double")).as("sig"))
    val sh = grid.join(broadcast(st), Seq("event_type"))
      .select($"event_type",
        date_format(timestamp_micros($"d" * lit(86400000000L)), "yyyy-MM-dd")
          .as("day"),
        $"x".cast("long").as("x"),
        ($"x".cast("double") > $"mu" + lit(3.0) * $"sig" ||
          $"x".cast("double") < $"mu" - lit(3.0) * $"sig")
          .as("shewhart_flag"))
    val votes = ($"shewhart_flag".cast("int") + $"cusum_alarm".cast("int")
      + $"ewma_flag".cast("int")).cast("long")
    sh.join(cus, Seq("event_type", "day"))
      .join(ew, Seq("event_type", "day"))
      .withColumn("votes", votes)
      .filter($"votes" >= 1)
      .select($"event_type", $"day", $"x", $"shewhart_flag", $"cusum_alarm",
        $"ewma_flag", $"votes", ($"votes" >= 2).as("consensus"))
      .orderBy($"event_type", $"day")
  }

  /** One binary-segmentation oracle round: for each open segment
    * [a, b], every admissible split k (≥ 2 days each side) scores
    * gain = SSE(a,b) − SSE(a,k) − SSE(k+1,b) from the shared prefix
    * frame, and the row_number tie-break (max gain, then smallest k)
    * keeps only strictly-improving winners. */
  private def binsegSplitSql(seg: String): String = s"""
      SELECT event_type, a, b, k, gain FROM (
        SELECT c.*, row_number() OVER (PARTITION BY event_type, a
            ORDER BY gain DESC, k) AS rn
        FROM (
          SELECT s.event_type, s.a, s.b, p.t AS k,
            (CAST(pb.p2 - COALESCE(pa.p2, 0) AS DOUBLE)
              - CAST((pb.p1 - COALESCE(pa.p1, 0))
                     * (pb.p1 - COALESCE(pa.p1, 0)) AS DOUBLE)
                / CAST(s.b - s.a + 1 AS DOUBLE))
            - (CAST(p.p2 - COALESCE(pa.p2, 0) AS DOUBLE)
              - CAST((p.p1 - COALESCE(pa.p1, 0))
                     * (p.p1 - COALESCE(pa.p1, 0)) AS DOUBLE)
                / CAST(p.t - s.a + 1 AS DOUBLE))
            - (CAST(pb.p2 - p.p2 AS DOUBLE)
              - CAST((pb.p1 - p.p1) * (pb.p1 - p.p1) AS DOUBLE)
                / CAST(s.b - p.t AS DOUBLE)) AS gain
          FROM $seg s
          JOIN pre p ON p.event_type = s.event_type
            AND p.t BETWEEN s.a + 1 AND s.b - 2
          JOIN pre pb ON pb.event_type = s.event_type AND pb.t = s.b
          LEFT JOIN pre pa ON pa.event_type = s.event_type
            AND pa.t = s.a - 1) c) r
      WHERE rn = 1 AND gain > 0"""

  /** BINARY SEGMENTATION changepoint detection (Scott & Knott '74 —
    * the greedy multi-changepoint standard) over the per-type daily
    * count series: two recursion rounds over the squared-error cost,
    * so up to 3 changepoints per type. Complements
    * [[qCusumChangepoint]] (CUSUM detects ONE sustained shift against
    * a fixed reference mean; binseg localizes MULTIPLE mean segments
    * with no reference) — a profile reports both.
    *
    * Engine parity: segment SSEs collapse to prefix sums — per split,
    * cost(a,b) = S2 − S1²/n where S1/S2 are EXACT integer differences
    * of the prefix frame and the division is one IEEE op, so every
    * gain is bit-identical across engines and the argmax tie-break
    * (gain DESC, k ASC) is total. Guards: segments must leave ≥ 2
    * days each side; only strictly-positive gains split.
    *
    * Scale shape: the corpus-sized work is the ONE day-grid hash agg;
    * prefix sums are a calendar-bounded window; each round's candidate
    * frame is |types| × T rows (time-bounded, data-independent) joined
    * against two point-lookups of the prefix frame. Rounds are FIXED
    * at 2 — the depth a monitoring surface wants — so the plan is
    * static, no iteration-to-convergence. */
  val qBinsegChangepoint: Spec = Spec(
    "ev_binseg_changepoint",
    bench = true, // r12 wave-3 row: day-grid windows + two split rounds
    oracle = Some(s"""
      WITH $dailySpineSql,
      idx AS (SELECT event_type, d, x,
          row_number() OVER (PARTITION BY event_type ORDER BY d) - 1 AS t
        FROM grid),
      pre AS (SELECT event_type, d, t,
          SUM(x::HUGEINT) OVER w AS p1, SUM(x::HUGEINT * x) OVER w AS p2
        FROM idx WINDOW w AS (PARTITION BY event_type ORDER BY t
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
      meta AS (SELECT event_type, MIN(d) AS d0,
          CAST(COUNT(*) - 1 AS BIGINT) AS tmax FROM idx GROUP BY 1),
      segs1 AS (SELECT event_type, CAST(0 AS BIGINT) AS a, tmax AS b
        FROM meta WHERE tmax >= 3),
      best1 AS (${binsegSplitSql("segs1")}),
      segs2 AS (SELECT event_type, a, k AS b FROM best1
        UNION ALL SELECT event_type, k + 1 AS a, b FROM best1),
      best2 AS (${binsegSplitSql("segs2")}),
      alls AS (SELECT 1 AS split_round, * FROM best1
        UNION ALL SELECT 2, * FROM best2)
      SELECT f.event_type, CAST(f.split_round AS BIGINT) AS split_round,
        strftime(make_timestamp((m.d0 + f.k + 1) * 86400000000),
          '%Y-%m-%d') AS cp_day,
        strftime(make_timestamp((m.d0 + f.a) * 86400000000),
          '%Y-%m-%d') AS seg_start,
        strftime(make_timestamp((m.d0 + f.b) * 86400000000),
          '%Y-%m-%d') AS seg_end,
        CAST(f.k - f.a + 1 AS BIGINT) AS n_left,
        CAST(f.b - f.k AS BIGINT) AS n_right,
        CAST(FLOOR(f.gain * 1000000) AS BIGINT) AS gain_micros
      FROM alls f JOIN meta m USING (event_type)
      ORDER BY event_type, split_round, cp_day""")) { (s, dir) =>
    binsegOverDayGrid(dailyCountSpine(s, dir))
  }

  /** The binseg tail over a complete (event_type, d, x) day grid —
    * exposed for the hand-vector pins. */
  def binsegOverDayGrid(grid: DataFrame): DataFrame = {
    val s = grid.sparkSession
    import s.implicits._
    val idx = grid.withColumn("t", row_number().over(
      Window.partitionBy($"event_type").orderBy($"d")).cast("long") - 1)
    val wcum = Window.partitionBy($"event_type").orderBy($"t")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val pre = idx.select($"event_type", $"d", $"t",
        sum($"x".cast("decimal(38,0)")).over(wcum).as("p1"),
        sum(($"x".cast("decimal(38,0)") * $"x")).over(wcum).as("p2"))
      .localCheckpoint() // one prefix frame feeds both rounds' lookups
    val meta = idx.groupBy($"event_type")
      .agg(min($"d").as("d0"), (count(lit(1)) - 1).as("tmax"))
      .localCheckpoint() // segs1 + the final day mapping
    def bestSplit(segs: DataFrame): DataFrame = {
      val zero = "CAST(0 AS DECIMAL(38,0))"
      val gainSql = s"""
        (CAST(pb.p2 - COALESCE(pa.p2, $zero) AS DOUBLE)
          - CAST((pb.p1 - COALESCE(pa.p1, $zero))
                 * (pb.p1 - COALESCE(pa.p1, $zero)) AS DOUBLE)
            / CAST(s.b - s.a + 1 AS DOUBLE))
        - (CAST(p.p2 - COALESCE(pa.p2, $zero) AS DOUBLE)
          - CAST((p.p1 - COALESCE(pa.p1, $zero))
                 * (p.p1 - COALESCE(pa.p1, $zero)) AS DOUBLE)
            / CAST(p.t - s.a + 1 AS DOUBLE))
        - (CAST(pb.p2 - p.p2 AS DOUBLE)
          - CAST((pb.p1 - p.p1) * (pb.p1 - p.p1) AS DOUBLE)
            / CAST(s.b - p.t AS DOUBLE))"""
      segs.alias("s")
        .join(pre.alias("p"), expr("p.event_type = s.event_type" +
          " AND p.t BETWEEN s.a + 1 AND s.b - 2"))
        .join(pre.alias("pb"),
          expr("pb.event_type = s.event_type AND pb.t = s.b"))
        .join(pre.alias("pa"),
          expr("pa.event_type = s.event_type AND pa.t = s.a - 1"), "left")
        .selectExpr("s.event_type", "s.a", "s.b", "p.t AS k",
          s"($gainSql) AS gain")
        .withColumn("rn", row_number().over(Window
          .partitionBy($"event_type", $"a").orderBy($"gain".desc, $"k")))
        .filter($"rn" === 1 && $"gain" > 0)
        .drop("rn")
    }
    val segs1 = meta.filter($"tmax" >= 3)
      .select($"event_type", lit(0L).as("a"), $"tmax".as("b"))
    val best1 = bestSplit(segs1).localCheckpoint() // feeds segs2 AND output
    val segs2 = best1.select($"event_type", $"a", $"k".as("b"))
      .unionAll(best1.select($"event_type", ($"k" + 1).as("a"), $"b"))
    val best2 = bestSplit(segs2)
    val alls = best1.withColumn("split_round", lit(1L))
      .unionAll(best2.withColumn("split_round", lit(2L)))
    def dayStr(c: org.apache.spark.sql.Column) =
      date_format(timestamp_micros(c * lit(86400000000L)), "yyyy-MM-dd")
    alls.join(meta.select($"event_type", $"d0"), Seq("event_type"))
      .select($"event_type", $"split_round",
        dayStr($"d0" + $"k" + 1).as("cp_day"),
        dayStr($"d0" + $"a").as("seg_start"),
        dayStr($"d0" + $"b").as("seg_end"),
        ($"k" - $"a" + 1).cast("long").as("n_left"),
        ($"b" - $"k").cast("long").as("n_right"),
        floor($"gain" * 1e6).cast("long").as("gain_micros"))
      .orderBy($"event_type", $"split_round", $"cp_day")
  }

  /** Gap-fill with last-observation-carried-forward over a sparse
    * sensor-style feed (a deterministic 1-in-97 event subsample, so
    * real multi-day gaps exist at every scale): per type, the complete
    * day spine carries the last observed reading forward plus its age
    * in days — the standard repair step before any daily-grid model
    * consumes an irregular feed. Days before the first observation
    * stay NULL (nothing to carry) with NULL age.
    *
    * Scale shape: the sparse agg is a hash agg on (type, day); the
    * spine bounds come from the FULL table so leading gaps are real;
    * the carry-forward is one per-type calendar-bounded window
    * (last(ignoreNulls) + a running max for the age) — no self-join,
    * no recursion. Parity: the carried value is a stored double MAX
    * (order-free), ages are integer day arithmetic. */
  /** Shared with the streaming twin st_gap_fill. */
  val gapFillOracleSql: String = """
      WITH raw AS (SELECT event_type,
          CAST(FLOOR(epoch_us(ts) / 86400000000) AS BIGINT) AS d,
          value, event_id
        FROM events),
      obs AS (SELECT event_type, d, MAX(value) AS v
        FROM raw WHERE event_id % 97 = 0 GROUP BY 1, 2),
      bounds AS (SELECT event_type, MIN(d) AS mn, MAX(d) AS mx
        FROM raw GROUP BY 1),
      spine AS (SELECT b.event_type, CAST(u.d AS BIGINT) AS d
        FROM bounds b CROSS JOIN UNNEST(range(b.mn, b.mx + 1)) AS u(d)),
      g AS (SELECT s.event_type, s.d, o.v,
          (o.v IS NOT NULL) AS observed
        FROM spine s LEFT JOIN obs o
          ON o.event_type = s.event_type AND o.d = s.d),
      f AS (SELECT event_type, d, observed,
          last_value(v IGNORE NULLS) OVER w AS value_filled,
          d - MAX(CASE WHEN observed THEN d END) OVER w AS gap_age
        FROM g WINDOW w AS (PARTITION BY event_type ORDER BY d
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
      SELECT event_type,
        strftime(make_timestamp(d * 86400000000), '%Y-%m-%d') AS day,
        observed, value_filled, CAST(gap_age AS BIGINT) AS gap_age
      FROM f ORDER BY event_type, day"""

  /** The LOCF tail over per-(type, day) rows carrying the day's sparse
    * reading in `v` (null when the day had events but no reading) —
    * shared by the batch query and the streaming twin. Days with no
    * rows at all (fully silent) are restored by the spine. */
  def gapFillOverDayValues(days: DataFrame): DataFrame = {
    val s = days.sparkSession
    import s.implicits._
    val spine = days.groupBy($"event_type")
      .agg(min($"d").as("mn"), max($"d").as("mx"))
      .select($"event_type", explode(sequence($"mn", $"mx")).as("d"))
    val w = Window.partitionBy($"event_type").orderBy($"d")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(days.filter($"v".isNotNull), Seq("event_type", "d"), "left")
      .withColumn("observed", $"v".isNotNull)
      .withColumn("value_filled", last($"v", ignoreNulls = true).over(w))
      .withColumn("gap_age",
        ($"d" - max(when($"observed", $"d")).over(w)).cast("long"))
      .select($"event_type",
        date_format(timestamp_micros($"d" * lit(86400000000L)), "yyyy-MM-dd")
          .as("day"),
        $"observed", $"value_filled", $"gap_age")
      .orderBy($"event_type", $"day")
  }

  val qGapFill: Spec = Spec(
    "ev_gap_fill",
    oracle = Some(gapFillOracleSql)) { (s, dir) =>
    import s.implicits._
    val raw = load(s, dir)
      .select($"event_type", ($"ts" / lit(dayNs)).cast("long").as("d"),
        $"value", $"event_id")
    gapFillOverDayValues(raw
      .groupBy($"event_type", $"d")
      .agg(max(when($"event_id" % 97 === 0, $"value")).as("v")))
  }

  /** DBSCAN user segmentation: density clusters over the per-user
    * behavioural plane (x = integer mean event value, y = purchase
    * rate in percent) under the L∞ metric, eps=1, minPts=4 — the
    * density-based complement to the centroid clustering in the
    * similarity family (finds arbitrarily-shaped segments, calls the
    * sparse fringe NOISE instead of forcing it into a cluster).
    * Features are integer ratios (decimal sum, integer division), so
    * they are scale-stable (the plane doesn't stretch as event volume
    * grows) and bit-equal across engines.
    *
    * Spark plan: [[graft.ops.Density.dbscanGrid]] — one hash-agg for
    * features, exact eps-neighbor join via grid cells with the
    * dense-cell shortcut (same-cell pairs never enumerate; hot cells
    * cost O(n)), star-edge core graph into the shared CC solver. The
    * oracle is the definitional brute-force quadratic + recursive
    * min-label walk — feasible at oracle scale, and precisely what
    * the blocked plan must (and does) reproduce. */
  val qDbscanUsers: Spec = Spec(
    "ev_dbscan_users",
    bench = true,
    oracle = Some("""
      WITH RECURSIVE feats AS (
        SELECT user_id,
          (floor(SUM(CAST(value AS DECIMAL(18,6))))::BIGINT // COUNT(*))
            AS x,
          (100 * SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
            END)::BIGINT // COUNT(*)) AS y
        FROM events GROUP BY user_id),
      nbrs AS (
        SELECT a.user_id AS ua, b.user_id AS ub
        FROM feats a JOIN feats b ON a.user_id <> b.user_id
          AND abs(a.x - b.x) <= 1 AND abs(a.y - b.y) <= 1),
      deg AS (
        SELECT f.user_id, COUNT(n.ub) AS nn
        FROM feats f LEFT JOIN nbrs n ON n.ua = f.user_id
        GROUP BY f.user_id),
      core AS (SELECT user_id FROM deg WHERE nn + 1 >= 4),
      cedges AS (
        SELECT n.ua AS src, n.ub AS dst FROM nbrs n
        JOIN core ca ON ca.user_id = n.ua
        JOIN core cb ON cb.user_id = n.ub),
      walk(id, comp) AS (
        SELECT user_id, user_id FROM core
        UNION
        SELECT e.dst, w.comp FROM walk w JOIN cedges e ON e.src = w.id),
      labels AS (SELECT id AS user_id, MIN(comp) AS cluster
        FROM walk GROUP BY id),
      assigned AS (
        SELECT f.user_id,
          COALESCE(l.cluster,
            (SELECT MIN(l2.cluster) FROM nbrs n
             JOIN labels l2 ON l2.user_id = n.ub WHERE n.ua = f.user_id),
            -1) AS cluster,
          (l.cluster IS NOT NULL) AS is_core
        FROM feats f LEFT JOIN labels l ON l.user_id = f.user_id)
      SELECT cluster, COUNT(*)::BIGINT AS size,
        SUM(CASE WHEN is_core THEN 1 ELSE 0 END)::BIGINT AS n_core,
        MIN(user_id) AS min_user, MAX(user_id) AS max_user
      FROM assigned GROUP BY cluster ORDER BY cluster""")) { (s, dir) =>
    import s.implicits._
    val feats = load(s, dir)
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n"),
        floor(sum($"value".cast("decimal(18,6)"))).cast("long").as("fs"),
        sum(when($"event_type" === "purchase", 1L).otherwise(0L)).as("np"))
      .select($"user_id".as("id"), expr("fs div n").as("x"),
        expr("(100 * np) div n").as("y"))
    graft.ops.Density.dbscanGrid(feats, eps = 1L, minPts = 4L)
      .groupBy($"cluster")
      .agg(count(lit(1)).as("size"),
        sum(when($"is_core", 1L).otherwise(0L)).as("n_core"),
        min($"id").as("min_user"), max($"id").as("max_user"))
      .orderBy($"cluster")
  }

  /** THEIL–SEN robust trend per event type: slope = median of all
    * pairwise day-count slopes, intercept = median residual at that
    * slope — the estimator that shrugs off up to 29% outlier days
    * where [[qUserTrend]]'s OLS line chases them. Median parity rides
    * the [[qRollingMedian]] argument (Spark `percentile(0.5)` and
    * DuckDB `quantile_cont` share the interpolated definition over
    * identical doubles; slopes are exact-integer differences divided
    * once).
    *
    * Scale shape: the pairwise build is over the DAILY aggregate —
    * |days|² per type with days calendar-bounded, the same bounded-
    * frame argument as the ACF/seasonal family; the event scan itself
    * is one hash agg. Day indices via exact integer division of the
    * nanos timestamp (never a double quotient). */
  val qTheilSen: Spec = Spec(
    "ev_theilsen_trend",
    oracle = Some("""
      WITH d AS (
        SELECT event_type,
          CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS d,
          CAST(COUNT(*) AS BIGINT) AS c
        FROM events GROUP BY 1, 2),
      p AS (
        SELECT a.event_type, (b.c - a.c)::DOUBLE / (b.d - a.d) AS sl
        FROM d a JOIN d b ON a.event_type = b.event_type AND a.d < b.d),
      s AS (SELECT event_type, quantile_cont(sl, 0.5) AS slope
        FROM p GROUP BY 1),
      r AS (SELECT d.event_type, d.c - s.slope * d.d AS resid
        FROM d JOIN s ON s.event_type = d.event_type),
      i AS (SELECT event_type, quantile_cont(resid, 0.5) AS icpt
        FROM r GROUP BY 1),
      n AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days
        FROM d GROUP BY 1)
      SELECT s.event_type, round(s.slope, 6) AS slope,
        round(i.icpt, 6) AS intercept, n.n_days
      FROM s JOIN i USING (event_type) JOIN n USING (event_type)
      ORDER BY event_type""")) { (s, dir) =>
    import s.implicits._
    val dayNs = 86400L * 1000 * 1000 * 1000
    val daily = load(s, dir)
      .groupBy($"event_type", expr(s"ts div $dayNs").as("d"))
      .agg(count(lit(1)).as("c"))
      .localCheckpoint() // days×types rows, consumed by three branches
    val a = daily.select($"event_type", $"d".as("d1"), $"c".as("c1"))
    val b = daily.select($"event_type", $"d".as("d2"), $"c".as("c2"))
    val sl = a.join(b, Seq("event_type")).filter($"d1" < $"d2")
      .select($"event_type",
        (($"c2" - $"c1").cast("double") / ($"d2" - $"d1")).as("sl"))
      .groupBy($"event_type").agg(expr("percentile(sl, 0.5)").as("slope"))
    val icpt = daily.join(broadcast(sl), Seq("event_type"))
      .select($"event_type",
        ($"c".cast("double") - $"slope" * $"d").as("resid"))
      .groupBy($"event_type")
      .agg(expr("percentile(resid, 0.5)").as("icpt"))
    val nd = daily.groupBy($"event_type").agg(count(lit(1)).as("n_days"))
    sl.join(icpt, "event_type").join(nd, "event_type")
      .select($"event_type", round($"slope", 6).as("slope"),
        round($"icpt", 6).as("intercept"), $"n_days")
      .orderBy($"event_type")
  }

  /** Mann-Kendall trend test per event type over the daily count grid —
    * the SIGNIFICANCE companion of [[qTheilSen]] (Theil-Sen answers "how
    * steep", Mann-Kendall answers "is there a monotone trend at all",
    * Mann '45 / Kendall '75; the pair every monitoring stack reports
    * together). S = Σ_{i<j} sign(c_j − c_i) over day pairs, the
    * tie-corrected variance carried as the EXACT integer
    * 18·Var = n(n−1)(2n+5) − Σ t(t−1)(2t+5), and the continuity-
    * corrected z = (S∓1)/√(Var) needs exactly one float division —
    * floor-microed; the significance flag is an INTEGER compare on
    * z_micros (|z| ≥ 1.96 ⟺ |z_micros| ≥ 1960000), so no float
    * boundary exposure. Same bounded-frame scale argument as Theil-Sen:
    * the pair join is |days|² per type with days calendar-bounded; the
    * corpus scan is one hash agg.
    *
    * Shared by batch ev_mann_kendall and streaming st_mann_kendall —
    * the streamed complete-mode day grid equals the batch grid, so both
    * restate the same SQL. */
  private[graft] val mannKendallOracleSql: String = """
      WITH d AS (
        SELECT event_type,
          CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS d,
          CAST(COUNT(*) AS BIGINT) AS c
        FROM events GROUP BY 1, 2),
      s AS (
        SELECT a.event_type,
          SUM(CASE WHEN b.c > a.c THEN 1 WHEN b.c < a.c THEN -1 ELSE 0 END)
            AS s_stat
        FROM d a JOIN d b ON a.event_type = b.event_type AND a.d < b.d
        GROUP BY a.event_type),
      t AS (
        SELECT event_type,
          SUM(tv * (tv - 1) * (2 * tv + 5)) AS tie_sum
        FROM (SELECT event_type, c, CAST(COUNT(*) AS BIGINT) AS tv
              FROM d GROUP BY event_type, c)
        GROUP BY event_type),
      n AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days
        FROM d GROUP BY event_type),
      v AS (SELECT n.event_type, n.n_days,
          n.n_days * (n.n_days - 1) * (2 * n.n_days + 5) - t.tie_sum AS var18
        FROM n JOIN t USING (event_type))
      SELECT v.event_type, v.n_days,
        CAST(s.s_stat AS BIGINT) AS s_stat,
        CAST(v.var18 AS BIGINT) AS var18,
        CAST(FLOOR(
          CAST(CASE WHEN s.s_stat > 0 THEN s.s_stat - 1
                    WHEN s.s_stat < 0 THEN s.s_stat + 1
                    ELSE 0 END AS DOUBLE)
          / sqrt(CAST(v.var18 AS DOUBLE) / 18.0e0)
          * 1000000) AS BIGINT) AS z_micros,
        (ABS(CAST(FLOOR(
          CAST(CASE WHEN s.s_stat > 0 THEN s.s_stat - 1
                    WHEN s.s_stat < 0 THEN s.s_stat + 1
                    ELSE 0 END AS DOUBLE)
          / sqrt(CAST(v.var18 AS DOUBLE) / 18.0e0)
          * 1000000) AS BIGINT)) >= 1960000) AS significant
      FROM v JOIN s USING (event_type)
      WHERE v.var18 > 0
      ORDER BY v.event_type"""

  /** The Mann-Kendall fold over any (event_type, d, c) day grid. */
  private[graft] def mannKendallOverGrid(dailyIn: DataFrame): DataFrame = {
    import dailyIn.sparkSession.implicits._
    val daily = dailyIn.localCheckpoint() // days×types, three branches
    val a = daily.select($"event_type", $"d".as("d1"), $"c".as("c1"))
    val b = daily.select($"event_type", $"d".as("d2"), $"c".as("c2"))
    val sStat = a.join(b, Seq("event_type")).filter($"d1" < $"d2")
      .groupBy($"event_type").agg(
        sum(when($"c2" > $"c1", 1L).when($"c2" < $"c1", -1L).otherwise(0L))
          .as("s_stat"))
    val ties = daily.groupBy($"event_type", $"c")
      .agg(count(lit(1)).as("tv"))
      .groupBy($"event_type")
      .agg(sum($"tv" * ($"tv" - 1) * (lit(2) * $"tv" + 5)).as("tie_sum"))
    val nd = daily.groupBy($"event_type").agg(count(lit(1)).as("n_days"))
    val zRaw = when($"s_stat" > 0, $"s_stat" - 1)
      .when($"s_stat" < 0, $"s_stat" + 1).otherwise(lit(0L))
      .cast("double") / sqrt($"var18".cast("double") / lit(18.0)) * 1000000
    nd.join(ties, "event_type")
      .select($"event_type", $"n_days",
        ($"n_days" * ($"n_days" - 1) * (lit(2) * $"n_days" + 5) - $"tie_sum")
          .as("var18"))
      .join(sStat, "event_type")
      .filter($"var18" > 0)
      .select($"event_type", $"n_days", $"s_stat".cast("long").as("s_stat"),
        $"var18".cast("long").as("var18"),
        floor(zRaw).cast("long").as("z_micros"),
        (abs(floor(zRaw).cast("long")) >= 1960000L).as("significant"))
      .orderBy($"event_type")
  }

  val qMannKendall: Spec = Spec(
    "ev_mann_kendall",
    oracle = Some(mannKendallOracleSql)) { (s, dir) =>
    import s.implicits._
    val dayNs = 86400L * 1000 * 1000 * 1000
    mannKendallOverGrid(load(s, dir)
      .groupBy($"event_type", expr(s"ts div $dayNs").as("d"))
      .agg(count(lit(1)).as("c")))
  }

  /** INCREMENTAL DBSCAN: the corpus (user_id % 10 != 0) is clustered
    * once — that [[graft.ops.Density.DbscanState]] is the persisted
    * state — and the daily batch (user_id % 10 = 0) merges in touching
    * only the batch's cell neighborhood:
    * [[graft.ops.Density.dbscanGridIncremental]] recomputes degrees in
    * halo-1 only, feeds the new core edges through the shared
    * incremental CC solve, and re-labels out-of-halo borders by
    * joining their stored anchor components through the label-rename
    * map (corpus scanned, never re-paired). Growth is monotone
    * (degrees only rise, cores stay core, components only merge), so
    * the merged result provably equals a full recompute — and the
    * oracle states precisely that: it is the [[qDbscanUsers]] SQL over
    * ALL users, byte-identical. */
  val qDbscanIncremental: Spec = Spec(
    "ev_dbscan_incremental",
    oracle = qDbscanUsers.oracle) { (s, dir) =>
    import s.implicits._
    val feats = load(s, dir)
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n"),
        floor(sum($"value".cast("decimal(18,6)"))).cast("long").as("fs"),
        sum(when($"event_type" === "purchase", 1L).otherwise(0L)).as("np"))
      .select($"user_id".as("id"), expr("fs div n").as("x"),
        expr("(100 * np) div n").as("y"))
    graft.ops.Density.dbscanGridIncremental(
        feats.filter($"id" % 10 =!= 0), feats.filter($"id" % 10 === 0),
        eps = 1L, minPts = 4L)
      .groupBy($"cluster")
      .agg(count(lit(1)).as("size"),
        sum(when($"is_core", 1L).otherwise(0L)).as("n_core"),
        min($"id").as("min_user"), max($"id").as("max_user"))
      .orderBy($"cluster")
  }

  /** Hourly session CONCURRENCY via a sweep line: sessions (the
    * [[qSessionize]] 30-minute-gap cut) become +1/-1 boundary events,
    * the running sum of deltas is the number of simultaneously-active
    * sessions at every instant, and each (day, hour) reports its peak
    * plus the number of segment starts. Sessions are clipped to day
    * boundaries (a spanning session re-enters as a +1 at midnight), so
    * instantaneous counts are preserved while the sweep stays
    * day-local; an hourly zero-delta spine row carries the count into
    * hours with no boundary of their own. Closed-interval semantics:
    * +1 sorts before -1 at an equal instant.
    *
    * Scale shape: the interval-overlap problem WITHOUT the interval
    * join — boundaries ride [[Skew.prefixSumsByKey]] (range-partitioned
    * partials + broadcast offsets, day-keyed), so a day with a billion
    * sessions never funnels into a single reducer, and no pair of
    * sessions is ever compared. Determinism: equal (t, delta) rows
    * permute only within same-delta runs, where every prefix-sum
    * multiset (hence the hourly MAX) is identical. */
  val qConcurrencyHourly: Spec = Spec(
    "ev_concurrency_hourly",
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
        SELECT user_id, session_id, MIN(ts_us) AS sb, MAX(ts_us) AS se
        FROM sessed GROUP BY 1, 2),
      seg AS (
        SELECT CAST(u.d AS BIGINT) AS d,
          GREATEST(sb, u.d * 86400000000) AS cs,
          LEAST(se, (u.d + 1) * 86400000000 - 1) AS ce
        FROM sess CROSS JOIN
          UNNEST(range(sb // 86400000000, se // 86400000000 + 1)) AS u(d)),
      bounds AS (
        SELECT d, cs AS t, 1 AS delta FROM seg
        UNION ALL SELECT d, ce, -1 FROM seg),
      db AS (SELECT MIN(d) AS mnd, MAX(d) AS mxd FROM bounds),
      spine AS (
        SELECT CAST(a.dd AS BIGINT) AS d,
          a.dd * 86400000000 + b.h * 3600000000 AS t, 0 AS delta
        FROM db CROSS JOIN UNNEST(range(mnd, mxd + 1)) AS a(dd)
        CROSS JOIN UNNEST(range(0, 24)) AS b(h)),
      ev AS (
        SELECT d, t, delta FROM bounds
        UNION ALL SELECT d, t, delta FROM spine),
      run AS (
        SELECT d, t, delta,
          SUM(delta) OVER (PARTITION BY d ORDER BY t, delta DESC
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c
        FROM ev)
      SELECT strftime(make_timestamp(d * 86400000000), '%Y-%m-%d') AS day,
        (t % 86400000000) // 3600000000 AS hour,
        CAST(MAX(c) AS BIGINT) AS max_concurrent,
        CAST(SUM(CASE WHEN delta = 1 THEN 1 ELSE 0 END) AS BIGINT)
          AS n_starts
      FROM run GROUP BY 1, 2 ORDER BY day, hour""")) { (s, dir) =>
    import s.implicits._
    val dayUs = 86400L * 1000 * 1000
    val hourUs = 3600L * 1000 * 1000
    val gapUs = 1800L * 1000 * 1000
    val w = Window.partitionBy($"user_id").orderBy($"ts_us", $"event_id")
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val sess = load(s, dir)
      .withColumn("ts_us", expr("ts div 1000"))
      .withColumn("brk",
        when(lag($"ts_us", 1).over(w).isNull ||
          $"ts_us" - lag($"ts_us", 1).over(w) > gapUs, 1).otherwise(0))
      .withColumn("session_id", sum($"brk").over(run).cast("long"))
      .groupBy($"user_id", $"session_id")
      .agg(min($"ts_us").as("sb"), max($"ts_us").as("se"))
    val seg = sess
      .select($"sb", $"se",
        explode(sequence(expr(s"sb div $dayUs"), expr(s"se div $dayUs")))
          .as("d"))
      .select($"d", greatest($"sb", $"d" * dayUs).as("cs"),
        least($"se", ($"d" + 1) * dayUs - 1).as("ce"))
    val bounds = seg.select($"d", $"cs".as("t"), lit(1L).as("delta"))
      .unionAll(seg.select($"d", $"ce".as("t"), lit(-1L).as("delta")))
    val spine = bounds.agg(min($"d").as("mnd"), max($"d").as("mxd"))
      .select(explode(sequence($"mnd", $"mxd")).as("d"))
      .select($"d", explode(sequence(lit(0L), lit(23L))).as("h"))
      .select($"d", ($"d" * dayUs + $"h" * hourUs).as("t"),
        lit(0L).as("delta"))
    graft.ops.Skew.prefixSumsByKey(bounds.unionAll(spine), "d",
        Seq($"t", $"delta".desc), Seq(col("delta") -> "c"))
      .groupBy($"d", expr(s"(t % $dayUs) div $hourUs").as("hour"))
      .agg(max($"c").as("max_concurrent"),
        sum(when($"delta" === 1L, 1L).otherwise(0L)).as("n_starts"))
      .select(
        date_format(timestamp_micros($"d" * dayUs), "yyyy-MM-dd").as("day"),
        $"hour", $"max_concurrent", $"n_starts")
      .orderBy($"day", $"hour")
  }

  /** Kaplan–Meier survival curve for view→purchase conversion: the
    * censoring-aware upgrade of [[qConversionTime]] — that query drops
    * every user who never purchased, biasing latency low; KM keeps
    * them as RIGHT-CENSORED observations (followed from first view to
    * the corpus's observation cutoff) so S(t) = P(still unconverted
    * after t) is estimated on the full cohort. Classic product
    * estimator over duration minutes: at each duration t with d
    * conversions out of n at risk, S multiplies by (1 - d/n); censored
    * users leave the risk set without contributing a factor.
    *
    * Engine parity: the survival product runs in LOG space as an
    * EXACT INTEGER prefix sum — each factor's ln rounds to 9dp and
    * scales to a BIGINT, the cumulative sum is Long arithmetic
    * (order-free), and only the final exp/floor touches floating
    * point (floor-truncate to 6dp, the half-boundary-free discipline
    * the winsorized/centroid queries use). A d = n row (everyone
    * remaining converts) would be ln(0): flagged instead, forcing
    * S = 0 from that row on — the definitional value.
    *
    * Scale shape: one per-user hash agg (first view/purchase mins),
    * one duration-keyed agg (minutes-bounded table), then TWO
    * [[graft.ops.Skew.prefixSumsByKey]] passes (risk set, then the
    * log-product — the term needs n_at_risk, so the sums cannot
    * fuse); never an unpartitioned window, never event-scale state. */
  val qSurvivalKm: Spec = Spec(
    "ev_survival_km",
    oracle = Some("""
      WITH f AS (SELECT user_id,
          MIN(CASE WHEN event_type='view' THEN epoch_us(ts) END) AS v,
          MIN(CASE WHEN event_type='purchase' THEN epoch_us(ts) END) AS p
        FROM events GROUP BY user_id),
      mx AS (SELECT MAX(epoch_us(ts)) AS tmax FROM events),
      u AS (SELECT
          CASE WHEN p IS NOT NULL AND p >= v THEN (p - v) // 60000000
               ELSE (tmax - v) // 60000000 END AS t_min,
          CASE WHEN p IS NOT NULL AND p >= v THEN 1 ELSE 0 END AS ev
        FROM f CROSS JOIN mx WHERE v IS NOT NULL),
      g AS (SELECT t_min, CAST(SUM(ev) AS BIGINT) AS d,
          CAST(COUNT(*) - SUM(ev) AS BIGINT) AS c
        FROM u GROUP BY t_min),
      n AS (SELECT COUNT(*) AS nu FROM u),
      r AS (SELECT t_min, d, c,
          CAST(nu - COALESCE(SUM(d + c) OVER (ORDER BY t_min
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
            AS n_at_risk
        FROM g CROSS JOIN n),
      s AS (SELECT t_min, d, c, n_at_risk,
          SUM(CASE WHEN d < n_at_risk THEN CAST(round(
              ln(CAST(n_at_risk - d AS DOUBLE) / n_at_risk) * 1000000000, 0)
              AS BIGINT) ELSE 0 END)
            OVER (ORDER BY t_min ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS cum,
          SUM(CASE WHEN d >= n_at_risk AND d > 0 THEN 1 ELSE 0 END)
            OVER (ORDER BY t_min ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS z
        FROM r)
      SELECT t_min, n_at_risk, d AS n_conv, c AS n_cens,
        CASE WHEN z > 0 THEN 0.0::DOUBLE
             ELSE FLOOR(exp(cum / 1000000000.0) * 1000000) / 1000000
        END AS survival
      FROM s WHERE d > 0 ORDER BY t_min""")) { (s, dir) =>
    import s.implicits._
    val e = load(s, dir)
      .select($"user_id", $"event_type", expr("ts div 1000").as("us"))
    val f = e.groupBy($"user_id").agg(
      min(when($"event_type" === "view", $"us")).as("v"),
      min(when($"event_type" === "purchase", $"us")).as("p"))
    val mx = broadcast(e.agg(max($"us").as("tmax")))
    val u = f.crossJoin(mx).filter($"v".isNotNull)
      .select(
        when($"p".isNotNull && $"p" >= $"v", expr("(p - v) div 60000000"))
          .otherwise(expr("(tmax - v) div 60000000")).as("t_min"),
        when($"p".isNotNull && $"p" >= $"v", 1L).otherwise(0L).as("ev"))
    val g = u.groupBy($"t_min").agg(sum($"ev").as("d"),
      (count(lit(1)) - sum($"ev")).as("c"))
    val nu = broadcast(u.agg(count(lit(1)).as("nu")))
    val r = graft.ops.Skew.prefixSumsByKey(
        g.withColumn("k", lit(0)), "k", Seq($"t_min"),
        Seq(($"d" + $"c") -> "cum_all"))
      .crossJoin(nu)
      .withColumn("n_at_risk", $"nu" - $"cum_all" + $"d" + $"c")
      .withColumn("term",
        when($"d" < $"n_at_risk",
          round(log(($"n_at_risk" - $"d").cast("double") / $"n_at_risk")
            * 1e9, 0).cast("long"))
          .otherwise(0L))
      .withColumn("zflag",
        when($"d" >= $"n_at_risk" && $"d" > 0, 1L).otherwise(0L))
    graft.ops.Skew.prefixSumsByKey(r, "k", Seq($"t_min"),
        Seq(col("term") -> "cum", col("zflag") -> "z"))
      .filter($"d" > 0)
      .select($"t_min", $"n_at_risk", $"d".as("n_conv"), $"c".as("n_cens"),
        when($"z" > 0, lit(0.0d))
          .otherwise(floor(exp($"cum" / 1e9) * 1e6).cast("double") / 1e6)
          .as("survival"))
      .orderBy($"t_min")
  }

  /** Log-rank test (Mantel '66) between two user cohorts' conversion
    * survival curves — the inferential companion of [[qSurvivalKm]]:
    * KM draws the curves, log-rank says whether they DIFFER (does
    * cohort A convert faster?), correctly using right-censored users
    * that a naive latency comparison throws away. Cohorts split by
    * user_id parity; at each conversion time t the observed cohort-1
    * conversions compare against the hypergeometric expectation
    * d·n₁/n with variance d·n₁(n−n₁)(n−d)/(n²(n−1)).
    *
    * Engine parity: per-time expectation/variance terms are EXACT
    * integer micros via the split floor identity (128-bit
    * intermediates), their sums are exact integers, and Z/χ² evaluate
    * in one fixed-order float expression from those integers — the
    * documented trade: each term floors at 1e-6, so the statistic is
    * exact-to-micros-per-term, deterministic on both engines (a float
    * SUM over per-time terms would be accumulation-order-dependent).
    * Scale shape: one per-user agg, one duration-keyed agg (bounded
    * by distinct minutes), one prefix scaffold for both cohorts' risk
    * sets, one total agg. */
  val qLogrank: Spec = Spec(
    "ev_logrank",
    oracle = Some("""
      WITH f AS (SELECT user_id,
          MIN(CASE WHEN event_type='view' THEN epoch_us(ts) END) AS v,
          MIN(CASE WHEN event_type='purchase' THEN epoch_us(ts) END) AS p
        FROM events GROUP BY user_id),
      mx AS (SELECT MAX(epoch_us(ts)) AS tmax FROM events),
      u AS (SELECT user_id % 2 AS grp,
          CASE WHEN p IS NOT NULL AND p >= v THEN (p - v) // 60000000
               ELSE (tmax - v) // 60000000 END AS t_min,
          CASE WHEN p IS NOT NULL AND p >= v THEN 1 ELSE 0 END AS ev
        FROM f CROSS JOIN mx WHERE v IS NOT NULL),
      g AS (SELECT t_min,
          CAST(SUM(CASE WHEN grp = 1 THEN ev ELSE 0 END) AS BIGINT) AS d1,
          CAST(SUM(CASE WHEN grp = 1 THEN 1 - ev ELSE 0 END) AS BIGINT) AS c1,
          CAST(SUM(CASE WHEN grp = 0 THEN ev ELSE 0 END) AS BIGINT) AS d0,
          CAST(SUM(CASE WHEN grp = 0 THEN 1 - ev ELSE 0 END) AS BIGINT) AS c0
        FROM u GROUP BY t_min),
      nn AS (SELECT
          CAST(SUM(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS BIGINT) AS nu1,
          CAST(COUNT(*) AS BIGINT) AS nu
        FROM u),
      r AS (SELECT t_min, d1, d0,
          nu1 - COALESCE(SUM(d1 + c1) OVER (ORDER BY t_min
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n1,
          nu - COALESCE(SUM(d1 + c1 + d0 + c0) OVER (ORDER BY t_min
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n,
          nu1, nu
        FROM g CROSS JOIN nn),
      t AS (SELECT t_min, d1, d0, n1, n, nu1, nu, d1 + d0 AS d,
          ((d1 + d0)::HUGEINT * n1 // n) * 1000000
            + (((d1 + d0)::HUGEINT * n1 % n) * 1000000) // n AS e1m,
          CASE WHEN n > 1 THEN
            ((d1 + d0)::HUGEINT * n1 * (n - n1) * (n - d1 - d0)
              // (n::HUGEINT * n * (n - 1))) * 1000000
            + (((d1 + d0)::HUGEINT * n1 * (n - n1) * (n - d1 - d0)
                % (n::HUGEINT * n * (n - 1))) * 1000000)
              // (n::HUGEINT * n * (n - 1))
          ELSE 0 END AS vm
        FROM r WHERE d1 + d0 > 0),
      s AS (SELECT MAX(nu) AS n_users, MAX(nu1) AS n1_users,
          CAST(SUM(d1) AS BIGINT) AS o1,
          CAST(SUM(e1m) AS HUGEINT) AS se, CAST(SUM(vm) AS HUGEINT) AS sv
        FROM t)
      SELECT n_users, n1_users, o1,
        CAST(se AS BIGINT) AS e1_micros,
        CAST(FLOOR(CAST(o1 * 1000000 - se AS DOUBLE) / 1000000.0
          / sqrt(CAST(sv AS DOUBLE) / 1000000.0) * 1000000) AS BIGINT)
          AS z_micros
      FROM s WHERE sv > 0""")) { (s, dir) =>
    import s.implicits._
    val e = load(s, dir)
      .select($"user_id", $"event_type", expr("ts div 1000").as("us"))
    val f = e.groupBy($"user_id").agg(
      min(when($"event_type" === "view", $"us")).as("v"),
      min(when($"event_type" === "purchase", $"us")).as("p"))
    val mx = broadcast(e.agg(max($"us").as("tmax")))
    val u = f.crossJoin(mx).filter($"v".isNotNull)
      .select(($"user_id" % 2).as("grp"),
        when($"p".isNotNull && $"p" >= $"v", expr("(p - v) div 60000000"))
          .otherwise(expr("(tmax - v) div 60000000")).as("t_min"),
        when($"p".isNotNull && $"p" >= $"v", 1L).otherwise(0L).as("ev"))
    val g = u.groupBy($"t_min").agg(
      sum(when($"grp" === 1, $"ev").otherwise(0L)).as("d1"),
      sum(when($"grp" === 1, lit(1L) - $"ev").otherwise(0L)).as("c1"),
      sum(when($"grp" === 0, $"ev").otherwise(0L)).as("d0"),
      sum(when($"grp" === 0, lit(1L) - $"ev").otherwise(0L)).as("c0"))
    val nn = broadcast(u.agg(
      sum(when($"grp" === 1, 1L).otherwise(0L)).as("nu1"),
      count(lit(1)).as("nu")))
    val r = graft.ops.Skew.prefixSumsByKey(
        g.withColumn("k", lit(0)), "k", Seq($"t_min"),
        Seq(($"d1" + $"c1") -> "cum1",
          ($"d1" + $"c1" + $"d0" + $"c0") -> "cumall"))
      .crossJoin(nn)
      .select($"t_min", $"d1", $"d0",
        ($"nu1" - $"cum1" + $"d1" + $"c1").as("n1"),
        ($"nu" - $"cumall" + $"d1" + $"c1" + $"d0" + $"c0").as("n"),
        $"nu1", $"nu")
      .filter($"d1" + $"d0" > 0)
    val t = r.select($"t_min", $"d1", $"nu1", $"nu",
      expr("(cast(d1 + d0 as decimal(38,0)) * n1 div n) * 1000000" +
        " + ((cast(d1 + d0 as decimal(38,0)) * n1 % n) * 1000000) div n")
        .as("e1m"),
      when($"n" > 1,
        expr("(cast(d1 + d0 as decimal(38,0)) * n1 * (n - n1) * (n - d1 - d0)" +
          " div (cast(n as decimal(38,0)) * n * (n - 1))) * 1000000" +
          " + ((cast(d1 + d0 as decimal(38,0)) * n1 * (n - n1) * (n - d1 - d0)" +
          " % (cast(n as decimal(38,0)) * n * (n - 1))) * 1000000)" +
          " div (cast(n as decimal(38,0)) * n * (n - 1))"))
        .otherwise(0L).as("vm"))
    t.agg(max($"nu").as("n_users"), max($"nu1").as("n1_users"),
        sum($"d1").as("o1"),
        sum($"e1m".cast("decimal(38,0)")).as("se"),
        sum($"vm".cast("decimal(38,0)")).as("sv"))
      .filter($"sv" > 0)
      .select($"n_users", $"n1_users", $"o1",
        $"se".cast("long").as("e1_micros"),
        floor(($"o1" * 1000000 - $"se").cast("double") / 1000000.0
          / sqrt($"sv".cast("double") / 1000000.0) * 1e6).cast("long")
          .as("z_micros"))
  }

  /** Two-proportion z-test of view→purchase CONVERSION RATE between
    * the user-parity cohorts — the instantaneous-rate companion of
    * [[qLogrank]] (which compares the full time-to-convert curves):
    * z = (p₁−p₂)/√(p̂(1−p̂)(1/n₁+1/n₂)) under the pooled null;
    * conversion = first purchase within 24 h of first view (the
    * qFunnelWindowed gate — over an unbounded feed EVERY user
    * eventually purchases, so the raw rate is degenerate 100%). Counts
    * are exact integers; z is assembled once in fixed-order floats
    * written identically on both engines — the numerator clears
    * denominators as the exact integer c₁n₂ − c₂n₁ first, so only the
    * final normalized ratio is float at all. */
  val qTwoProportionAb: Spec = Spec(
    "ev_two_proportion_ab",
    oracle = Some("""
      WITH f AS (SELECT user_id,
          MIN(CASE WHEN event_type='view' THEN epoch_us(ts) END) AS v,
          MIN(CASE WHEN event_type='purchase' THEN epoch_us(ts) END) AS p
        FROM events GROUP BY user_id),
      u AS (SELECT user_id % 2 AS grp,
          CASE WHEN p IS NOT NULL AND p >= v AND p - v <= 86400000000
            THEN 1 ELSE 0 END AS conv
        FROM f WHERE v IS NOT NULL),
      g AS (SELECT
          CAST(SUM(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
          CAST(SUM(CASE WHEN grp = 1 THEN conv ELSE 0 END) AS BIGINT) AS c1,
          CAST(SUM(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
          CAST(SUM(CASE WHEN grp = 0 THEN conv ELSE 0 END) AS BIGINT) AS c2
        FROM u)
      SELECT n1, c1, n2, c2,
        (c1 * 1000000) // n1 AS p1_micros,
        (c2 * 1000000) // n2 AS p2_micros,
        CAST(FLOOR(CAST(c1 * n2 - c2 * n1 AS DOUBLE) / (n1 * n2)
          / sqrt((CAST(c1 + c2 AS DOUBLE) / (n1 + n2))
            * (1.0 - CAST(c1 + c2 AS DOUBLE) / (n1 + n2))
            * (1.0 / n1 + 1.0 / n2)) * 1000000) AS BIGINT) AS z_micros
      FROM g
      WHERE n1 > 0 AND n2 > 0 AND c1 + c2 > 0 AND c1 + c2 < n1 + n2""")) { (s, dir) =>
    import s.implicits._
    val f = load(s, dir)
      .select($"user_id", $"event_type", expr("ts div 1000").as("us"))
      .groupBy($"user_id").agg(
        min(when($"event_type" === "view", $"us")).as("v"),
        min(when($"event_type" === "purchase", $"us")).as("p"))
    val u = f.filter($"v".isNotNull)
      .select(($"user_id" % 2).as("grp"),
        when($"p".isNotNull && $"p" >= $"v" &&
          $"p" - $"v" <= 86400000000L, 1L).otherwise(0L).as("conv"))
    u.agg(
        sum(when($"grp" === 1, 1L).otherwise(0L)).as("n1"),
        sum(when($"grp" === 1, $"conv").otherwise(0L)).as("c1"),
        sum(when($"grp" === 0, 1L).otherwise(0L)).as("n2"),
        sum(when($"grp" === 0, $"conv").otherwise(0L)).as("c2"))
      .filter($"n1" > 0 && $"n2" > 0 &&
        $"c1" + $"c2" > 0 && $"c1" + $"c2" < $"n1" + $"n2")
      .select($"n1", $"c1", $"n2", $"c2",
        expr("(c1 * 1000000) div n1").as("p1_micros"),
        expr("(c2 * 1000000) div n2").as("p2_micros"),
        floor(($"c1" * $"n2" - $"c2" * $"n1").cast("double")
            / ($"n1" * $"n2")
          / sqrt((($"c1" + $"c2").cast("double") / ($"n1" + $"n2"))
            * (lit(1.0) - ($"c1" + $"c2").cast("double") / ($"n1" + $"n2"))
            * (lit(1.0) / $"n1" + lit(1.0) / $"n2")) * 1e6)
          .cast("long").as("z_micros"))
  }

  /** Z-ORDER layout key ([[graft.ops.Layout.zOrder2]]) over the two
    * dimensions events are actually queried by — user and hour: bit
    * interleave keeps BOTH ranges narrow inside every fixed-width key
    * bucket, which is what makes per-file min/max statistics prune
    * scans on either predicate after a layout rewrite. This query
    * oracles the exact interleave arithmetic and the narrowness it
    * buys: per-bucket min/max of both dimensions (each bucket of the
    * 2²⁰ key space covers a ≤ 2⁷-wide slab in x AND y — against a
    * one-column sort where the second dimension spans its full range
    * in every bucket). The physical write path (range repartition by
    * the key, executor-sampled bounds) is [[graft.ops.Layout
    * .zorderBy]], plan-pinned in PlanSpec. */
  val qZorderLayout: Spec = Spec(
    "ev_zorder_layout",
    oracle = Some(s"""
      WITH p AS (
        SELECT user_id % 1024 AS x,
          (epoch_us(ts) // 3600000000) % 1024 AS y
        FROM events),
      z AS (SELECT x, y,
        ${graft.ops.Layout.zOrder2Sql("x", "y", bits = 10)} AS zkey
        FROM p)
      SELECT zkey // 16384 AS bucket, CAST(COUNT(*) AS BIGINT) AS n,
        CAST(MIN(x) AS BIGINT) AS min_x, CAST(MAX(x) AS BIGINT) AS max_x,
        CAST(MIN(y) AS BIGINT) AS min_y, CAST(MAX(y) AS BIGINT) AS max_y
      FROM z GROUP BY bucket ORDER BY bucket""")) { (s, dir) =>
    import s.implicits._
    val p = load(s, dir).select(
      ($"user_id" % 1024).as("x"),
      (expr("(ts div 3600000000000) % 1024")).as("y"))
    p.withColumn("zkey", graft.ops.Layout.zOrder2($"x", $"y", bits = 10))
      .groupBy(expr("zkey div 16384").as("bucket"))
      .agg(count(lit(1)).as("n"),
        min($"x").as("min_x"), max($"x").as("max_x"),
        min($"y").as("min_y"), max($"y").as("max_y"))
      .orderBy($"bucket")
  }

  val specs: Seq[Spec] = Seq(qTumbling, qSessionize, qSessionizeRewritten,
    qAsofClick,
    qAsofTolerance, qFunnel, qPropsJson, qSliding, qSessionWindowNative,
    qRate5Min, qValueOutliers, qDriftWindowed, qDriftSliding,
    qCohortRetention, qFunnelWindowed, qDauNewReturning, qDecayScore,
    qUserTrend, qRateAnomaly, qKsDrift, qKsWindowed, qWinsorizedStats,
    qEwmaControl, qBinsegChangepoint, qCupedAdjustment, qAnomalyEnsemble,
    qDiffInDiff, qCovariateBalance, qPowerAnalysis, qSrmCheck,
    qAsofNearest, qConversionTime, qMarkovTransitions, qSeasonalDecompose,
    qPathAnalysis, qSeasonalAnomaly, qStickiness, qBounceRate,
    qUserConcentration, qInterArrival, qAttribution, qAttributionDecay,
    qRfm, qEntryExit, qAcfDaily, qLjungBox, qPacfDaily, qGrangerPairs, qCusumChangepoint, qGapFill, qDbscanUsers,
    qConcurrencyHourly, qDbscanIncremental, qTheilSen, qMannKendall,
    qMarkovStationary, qConversionSteps, qHitsTransitions,
    qSurvivalKm, qLogrank,
    qTwoProportionAb,
    qZorderLayout, qHoltForecast, qForecastBacktest, qSlidingDistinct,
    qHaarDaily, qAmsF2,
    qBurstViterbi, qHoltWinters, qChi2Weekday)
}
