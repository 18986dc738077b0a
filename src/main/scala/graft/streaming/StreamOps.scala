package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.ops.MinHash

/** Structured Streaming twins of the batch event operators (SURVEY
  * §2.12 — absent from the reference; engine addition). File source →
  * event-time window aggregation with watermark → memory sink; the
  * memory sink + processAllAvailable makes a finite parquet drive the
  * streaming query synchronously (local smoke), while the same plan
  * runs unbounded on a real source.
  */
object StreamOps {

  /** events file schema as stored (ts is a naive micros timestamp; the
    * source normalizes it to the raw-nanos long contract post-read,
    * see [[graft.queries.Events.tsToNanos]]). */
  val eventsSchema: StructType = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", TimestampNTZType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  /** Input-volume-derived shuffle/state partition count for a
    * streaming query (optimization guide §2.2: "fewer, larger reduce
    * partitions — size spark.sql.shuffle.partitions so partitions are
    * in the 100 MB–1 GB range rather than a few MB"). A streaming
    * query pins its state-partition count at first start, and EVERY
    * state partition pays real fixed costs per micro-batch: provider
    * load serialized behind StateStore's global `loadedProviders` lock
    * (r14 stack sampling: the top hot frame of st_sessions, ~40% of
    * all task samples, was tasks queueing in
    * StateStore.getStateStoreProvider), delta-file churn, maintenance
    * threads, and an M×R shuffle-block explosion. Sizing the count
    * from the bytes the shuffle actually carries — one partition per
    * `targetBytes` of input, clamped to [1, session shuffle
    * partitions] — keeps a 2 MB local feed on a handful of state
    * stores while a 100 TB feed still gets the full cluster width (the
    * clamp ceiling). The count derives from data, not from local[n];
    * `graft.streaming.targetPartitionBytes` overrides the default.
    * The 4 MiB default is measured, not guessed: the state-build path
    * processes ~3–4 MB/s/core here (BenchScale st_sessions, 16 MB
    * upsample: 1 partition 6.0 s, 4 partitions 3.8 s, 32 partitions
    * 4.5 s — per-partition fixed cost crosses single-thread throughput
    * at a few MB per partition per batch). */
  private[graft] def scaledStatePartitions(s: SparkSession, inputBytes: Long): Int = {
    val target = s.conf.getOption("graft.streaming.targetPartitionBytes")
      .map(_.toLong).getOrElse(4L * 1024 * 1024)
    val ceiling = s.sessionState.conf.numShufflePartitions
    math.min(ceiling.toLong, math.max(1L, (inputBytes + target - 1) / target)).toInt
  }

  /** A session whose streaming queries use [[scaledStatePartitions]] of
    * `dir/file` — a cheap newSession (shared SparkContext; SQL conf
    * rebuilt from the context's SparkConf, where every builder-time
    * setting of Verify/Bench lives) so the shared session's batch
    * queries keep their width and the parallel Verify gate stays
    * race-free (each derived session is private to its query). Returns
    * `s` untouched when the derived count already equals the
    * session's. */
  /** Source size in bytes through the Hadoop FileSystem API (r14 ADVICE:
    * java.io.File.length() returned the directory-ENTRY size — ~4 KB —
    * for a directory-shaped parquet dataset, silently collapsing a huge
    * feed to 1 state partition, and returned 0 off the local
    * filesystem). getContentSummary sums the contained file lengths on
    * any Hadoop filesystem; 0 on any failure means "unknown: change
    * nothing". */
  private[graft] def sourceBytes(s: SparkSession, path: String): Long =
    try {
      val p = new org.apache.hadoop.fs.Path(path)
      val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      val st = fs.getFileStatus(p)
      if (st.isDirectory) fs.getContentSummary(p).getLength else st.getLen
    } catch { case scala.util.control.NonFatal(_) => 0L }

  private def sessionFor(s: SparkSession, dir: String, file: String): SparkSession = {
    val bytes = sourceBytes(s, s"$dir/$file")
    if (bytes <= 0) return s // unknown size: change nothing
    val n = scaledStatePartitions(s, bytes)
    if (n >= s.sessionState.conf.numShufflePartitions) s
    else {
      val s2 = s.newSession()
      // newSession rebuilds SQL conf from the context's SparkConf, which
      // silently reverts any RUNTIME spark.conf.set(...) overrides on
      // the parent (r14 ADVICE: a test tweaking e.g. timeZone would see
      // its streaming twin diverge from the batch twin). Copy the
      // parent's effective-but-different values onto the clone before
      // overriding the partition count; non-settable keys are skipped.
      s.conf.getAll.foreach { case (k, v) =>
        if (s2.conf.getOption(k) != Some(v))
          try s2.conf.set(k, v)
          catch { case scala.util.control.NonFatal(_) => () }
      }
      s2.conf.set("spark.sql.shuffle.partitions", n.toString)
      s2
    }
  }

  /** Streaming events source with `ts` normalized to raw nanos — the
    * same contract as the batch [[graft.queries.Events.load]], so the
    * file twin and the MemoryStream twin (which feeds long tuples
    * directly) run identical downstream plans. */
  private def eventsStream(s: SparkSession, dir: String): DataFrame = {
    val s2 = sessionFor(s, dir, "events.parquet")
    graft.queries.Events.tsToNanos(
      s2.readStream.schema(eventsSchema)
        .option("pathGlobFilter", "events.parquet").parquet(dir))
  }

  /** Drain a finite streaming aggregate into its memory-sink table.
    * `processAllAvailable` makes any bounded source (file, MemoryStream)
    * drive the query synchronously; the same plan runs unbounded on a
    * real source. */
  /** State-operator row count of the most recently completed
    * [[runToTable]] query (sum over operators), for tests that pin the
    * per-key-bounded state contract — e.g. the Markov/path twins must
    * hold ONE state row per user, never one per event. None until a
    * query has run or when the query had no state operator. */
  @volatile private var lastStateRowsVar: Option[Long] = None
  def lastStateRows: Option[Long] = lastStateRowsVar

  private def runToTable(
      s: SparkSession, agg: DataFrame, sink: String, mode: String): DataFrame = {
    val q = agg.writeStream
      .outputMode(mode)
      .format("memory")
      .queryName(sink)
      .start()
    try q.processAllAvailable()
    finally {
      lastStateRowsVar = Option(q.lastProgress)
        .map(_.stateOperators.map(_.numRowsTotal).sum)
        .filter(_ => Option(q.lastProgress).exists(_.stateOperators.nonEmpty))
      q.stop()
    }
    // The memory sink registers its temp view on the QUERY's session,
    // which may be a partition-scaled clone (sessionFor) — resolve the
    // table there, not on the caller's session.
    agg.sparkSession.table(sink)
  }

  /** Tumbling 1-hour event counts over ANY streaming events frame
    * (events schema, ts as raw nanos) — source-agnostic: the file twin
    * and the MemoryStream twin (StreamingSpec) run this same plan. */
  def tumblingFrom(s: SparkSession, src: DataFrame, sink: String): DataFrame = {
    val agg = src
      .withColumn("ts_utc", timestamp_micros(expr("ts div 1000")))
      .withWatermark("ts_utc", "1 hour")
      .groupBy(window(col("ts_utc"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
    runToTable(s, agg, sink, "complete")
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col("event_type"), col("n_events"))
      .orderBy(col("window_start"), col("event_type"))
  }

  /** Tumbling 1-hour event counts as a streaming query, returned as the
    * final batch result table. `sink` must be unique per caller — two
    * queries sharing a memory-sink name would race on the temp view. */
  def tumblingCounts(s: SparkSession, dir: String,
      sink: String = "st_tumbling_mem"): DataFrame =
    tumblingFrom(s, eventsStream(s, dir), sink)

  /** APPEND-mode twin of [[tumblingFrom]] — the same
    * closed-window-prefix contract as
    * [[dailyValueCountsAppendFrom]]: each hour is emitted exactly once
    * when the watermark (max event time − 1 hour) passes its end and
    * its state is evicted, so a forever-running deployment holds at
    * most the open hours; the trailing hour(s) never appear on a
    * finite feed (emission predicate window.end ≤ watermark). */
  def tumblingAppendFrom(s: SparkSession, src: DataFrame,
      sink: String): DataFrame = {
    val agg = src
      .withColumn("ts_utc", timestamp_micros(expr("ts div 1000")))
      .withWatermark("ts_utc", "1 hour")
      .groupBy(window(col("ts_utc"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
    runToTable(s, agg, sink, "append")
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col("event_type"), col("n_events"))
  }

  def tumblingAppend(s: SparkSession, dir: String,
      sink: String = "st_tumbling_append_mem"): DataFrame =
    tumblingAppendFrom(s, eventsStream(s, dir), sink)

  /** Daily (event_type, 0.1-quantized value) counts as a streaming
    * query — the bounded sufficient statistic the windowed KS monitor
    * consumes ([[graft.queries.Events.ksOverDayValueCounts]]). State
    * bounding note: in COMPLETE output mode Spark retains all window
    * groups and the watermark evicts nothing — the state bound here
    * rests on the GRID, not the watermark: days × types × a 0.1-
    * quantized value axis is calendar-bounded by construction, and no
    * raw event is ever held. (Append mode would let the watermark
    * evict closed days, but on a finite feed the final day never
    * closes — complete mode is what makes the monitor's last-day rows
    * visible.) The KS + p-value comparison runs as a batch view over
    * this table. */
  def dailyValueCounts(s: SparkSession, dir: String,
      sink: String = "st_ks_mem"): DataFrame =
    dailyValueCountsFrom(s, eventsStream(s, dir), sink)

  /** [[dailyValueCounts]] over ANY streaming events frame (events
    * schema, ts as raw nanos) — source-agnostic like [[tumblingFrom]]:
    * the file twin and the MemoryStream twin (StreamingSpec) run this
    * same plan. */
  def dailyValueCountsFrom(s: SparkSession, src: DataFrame,
      sink: String): DataFrame = {
    val agg = src
      .withColumn("ts_utc", timestamp_micros(expr("ts div 1000")))
      .withWatermark("ts_utc", "1 day")
      .groupBy(window(col("ts_utc"), "1 day"), col("event_type"),
        round(col("value"), 1).as("v"))
      .agg(count(lit(1)).as("cnt"))
    runToTable(s, agg, sink, "complete")
      .select(date_format(col("window.start"), "yyyy-MM-dd").as("window_day"),
        col("event_type"), col("v"), col("cnt"))
      // The KS tail self-joins this table several times (grid/ref/
      // window branches). A MemoryPlan leaf cannot be deduplicated
      // across those references (conflicting-attribute analyzer error);
      // checkpointing the BOUNDED statistic table turns it into a
      // re-referenceable RDD-backed plan and freezes the monitor input.
      .localCheckpoint()
  }

  /** APPEND-mode twin of [[dailyValueCountsFrom]] — the unbounded-
    * runtime shape a real deployment needs: each closed day is emitted
    * EXACTLY ONCE when the watermark (max event time − 1 day) passes
    * its window end, and its state rows are evicted at that moment, so
    * state never holds more than the open days regardless of how long
    * the stream runs. On a finite feed the trailing day(s) never close
    * — the result is the closed-day PREFIX of the complete-mode grid
    * (Spark's emission predicate is window.end ≤ watermark, watermark
    * in whole milliseconds), which is what the oracle states. The
    * complete-mode form above remains the finite-feed oracle of the
    * FULL grid; this twin is the production shape, and the eviction
    * behavior is pinned by the two-batch MemoryStream test. */
  /** The watermarked streaming aggregation behind both daily-count
    * twins, exposed so tests can drive it with EXPLICIT micro-batch
    * boundaries (addData → processAllAvailable per batch) — the only
    * way to exercise mid-stream watermark behavior: a single
    * processAllAvailable over pre-queued data folds every add into one
    * batch, where no row is ever late. */
  def dailyValueCountsAgg(src: DataFrame): DataFrame = src
    .withColumn("ts_utc", timestamp_micros(expr("ts div 1000")))
    .withWatermark("ts_utc", "1 day")
    .groupBy(window(col("ts_utc"), "1 day"), col("event_type"),
      round(col("value"), 1).as("v"))
    .agg(count(lit(1)).as("cnt"))

  def dailyValueCountsAppendFrom(s: SparkSession, src: DataFrame,
      sink: String): DataFrame =
    runToTable(s, dailyValueCountsAgg(src), sink, "append")
      .select(date_format(col("window.start"), "yyyy-MM-dd").as("window_day"),
        col("event_type"), col("v"), col("cnt"))

  def dailyValueCountsAppend(s: SparkSession, dir: String,
      sink: String = "st_ks_append_mem"): DataFrame =
    dailyValueCountsAppendFrom(s, eventsStream(s, dir), sink)

  /** Daily per-type event counts as a streaming query — the bounded
    * sufficient statistic the CUSUM changepoint monitor consumes
    * ([[graft.queries.Events.cusumOverDayGrid]]). Same state-bound
    * argument as [[dailyValueCountsFrom]]: complete mode retains the
    * whole grid, but the grid is days × |types| by construction — no
    * raw event is held. Emits (event_type, d, cnt) with d = integer
    * days since epoch, the grid contract [[graft.queries.Events
    * .spineFill]] expects. */
  def dailyTypeCountsFrom(s: SparkSession, src: DataFrame,
      sink: String): DataFrame = {
    val agg = src
      .withColumn("ts_utc", timestamp_micros(expr("ts div 1000")))
      .withWatermark("ts_utc", "1 day")
      .groupBy(window(col("ts_utc"), "1 day"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
    runToTable(s, agg, sink, "complete")
      .select(col("event_type"),
        (unix_micros(col("window.start")) / lit(86400000000L))
          .cast("long").as("d"),
        col("cnt"))
      // the CUSUM tail references the grid through several branches
      // (spine agg + fill join + stats); checkpoint the BOUNDED table
      // so the MemoryPlan leaf is re-referenceable (same rationale as
      // dailyValueCountsFrom)
      .localCheckpoint()
  }

  def dailyTypeCounts(s: SparkSession, dir: String,
      sink: String = "st_cusum_mem"): DataFrame =
    dailyTypeCountsFrom(s, eventsStream(s, dir), sink)

  /** Daily per-type sparse sensor readings as a streaming query — the
    * bounded statistic the LOCF gap-fill monitor consumes
    * ([[graft.queries.Events.gapFillOverDayValues]]): per (type, day),
    * MAX(value) over the deterministic 1-in-97 subsample (NULL when
    * the day had traffic but no reading — max over an empty set).
    * Complete-mode grid state, days × |types| bounded, no raw events
    * held. */
  def dailySparseValuesFrom(s: SparkSession, src: DataFrame,
      sink: String): DataFrame = {
    val agg = src
      .withColumn("ts_utc", timestamp_micros(expr("ts div 1000")))
      .withWatermark("ts_utc", "1 day")
      .groupBy(window(col("ts_utc"), "1 day"), col("event_type"))
      .agg(max(when(col("event_id") % 97 === 0, col("value"))).as("v"))
    runToTable(s, agg, sink, "complete")
      .select(col("event_type"),
        (unix_micros(col("window.start")) / lit(86400000000L))
          .cast("long").as("d"),
        col("v"))
      .localCheckpoint() // bounded; re-referenced by spine + fill join
  }

  def dailySparseValues(s: SparkSession, dir: String,
      sink: String = "st_gapfill_mem"): DataFrame =
    dailySparseValuesFrom(s, eventsStream(s, dir), sink)

  /** Sliding 1-hour windows every 15 minutes as a streaming query —
    * each event lands in 4 overlapping windows; watermarked state,
    * complete-mode memory sink for the finite-source smoke. */
  def slidingCounts(s: SparkSession, dir: String): DataFrame = {
    val agg = eventsStream(s, dir)
      .withColumn("ts_utc", timestamp_micros(expr("ts div 1000")))
      .withWatermark("ts_utc", "1 hour")
      .groupBy(window(col("ts_utc"), "1 hour", "15 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
    runToTable(s, agg, "st_sliding_mem", "complete")
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col("event_type"), col("n_events"))
      .orderBy(col("window_start"), col("event_type"))
  }

  final case class SessEvent(user_id: Long, ts_us: Long, ts_utc: java.sql.Timestamp)
  final case class SessState(start: Long, end: Long, n: Long)
  final case class SessionOut(
      user_id: Long, session_start_us: Long, session_end_us: Long, n_events: Long)

  /** Event-time sessionization with custom state
    * (flatMapGroupsWithState + EventTimeTimeout): sessions close when
    * the 30-minute gap passes the watermark. Emits closed sessions
    * (append mode); sessions still open past the final watermark stay
    * in state — on an unbounded source they'd close on later data. */
  def statefulSessions(s: SparkSession, dir: String): DataFrame =
    sessionsFrom(s, eventsStream(s, dir), "st_sessions_mem")

  /** AMS F2 sketch as a STREAMING aggregate: the 61 tug-of-war
    * counters ([[graft.queries.Events.amsBitSumsAgg]]) run as one
    * complete-mode global aggregation — state is exactly ONE row of 61
    * BIGINTs no matter how long the stream runs (the sketch IS the
    * state bound; counters merge across batches by plain addition).
    * The median-of-means estimate runs as a batch view over that row
    * (st_ams_f2). */
  def amsBitSums(s: SparkSession, dir: String,
      sink: String = "st_ams_mem"): DataFrame =
    runToTable(s, graft.queries.Events.amsBitSumsAgg(eventsStream(s, dir)),
      sink, "complete")

  /** HLL registers as STREAMING state: the per-(event_type) distinct
    * user-day sketch ([[graft.ops.Hll]]) maintained as a complete-mode
    * (type, reg) max-rho aggregation — at most 256 state rows per type
    * no matter how long the stream runs (the registers ARE the state
    * bound; they merge across batches by elementwise max exactly as
    * across shards). The estimate fold runs as a batch view over that
    * bounded state (st_hll_users). */
  def hllUserDayRegisters(s: SparkSession, dir: String,
      sink: String = "st_hll_mem"): DataFrame = {
    val keyed = eventsStream(s, dir).select(
      col("event_type"),
      concat(col("user_id").cast("string"), lit("|"),
        date_format(timestamp_micros(expr("ts div 1000")), "yyyy-MM-dd"))
        .as("user_day"))
    runToTable(s,
      graft.ops.Hll.registers(keyed, Seq("event_type"), col("user_day")),
      sink, "complete")
  }

  /** t-digest quantiles as STREAMING state: the mergeable sketch
    * ([[graft.ops.TDigest]]) runs inside a complete-mode per-type
    * aggregation — state per group is one digest (≤ δ centroids no
    * matter how long the stream runs), partial digests merge across
    * batches exactly like across partitions. Emits (event_type, est
    * p50, est p95); the rank-tolerance check is the caller's batch
    * view (st_tdigest). */
  def tdigestValueQuantiles(s: SparkSession, dir: String,
      sink: String = "st_td_mem"): DataFrame = {
    val tdq = org.apache.spark.sql.functions.udaf(
      graft.ops.TDigest.aggregator(Seq(0.5, 0.95)),
      org.apache.spark.sql.Encoders.scalaDouble)
    val agg = eventsStream(s, dir)
      .groupBy(col("event_type"))
      .agg(tdq(col("value")).as("est"))
    runToTable(s, agg, sink, "complete")
  }

  /** NATIVE session windows (session_window built-in) in APPEND mode —
    * the declarative twin of [[statefulSessions]]' hand-rolled state
    * machine, and the unbounded-runtime shape: Spark's session state
    * store merges overlapping per-user windows across batches, and a
    * session is emitted EXACTLY ONCE when the watermark (max event time
    * − 30 min, whole ms) passes its end (last event + the 30-minute
    * gap), evicting its state rows at that moment. On a finite feed the
    * result is the closed-session prefix; sessions still open at the
    * final watermark remain in state (they'd close on later data on a
    * real source). Exposed separately so tests can drive explicit
    * micro-batch boundaries. */
  def sessionAppendAgg(src: DataFrame): DataFrame = src
    .withColumn("ts_utc", timestamp_micros(expr("ts div 1000")))
    .withWatermark("ts_utc", "30 minutes")
    .groupBy(session_window(col("ts_utc"), "30 minutes"), col("user_id"))
    .agg(count(lit(1)).as("n_events"))

  def sessionAppendFrom(s: SparkSession, src: DataFrame,
      sink: String): DataFrame =
    runToTable(s, sessionAppendAgg(src), sink, "append")
      .select(col("user_id"),
        date_format(col("session_window.start"),
          graft.queries.Spec.SparkTsFmt).as("session_start"),
        date_format(col("session_window.end"),
          graft.queries.Spec.SparkTsFmt).as("session_end"),
        col("n_events"))

  def sessionAppend(s: SparkSession, dir: String,
      sink: String = "st_session_append_mem"): DataFrame =
    sessionAppendFrom(s, eventsStream(s, dir), sink)

  /** Source-agnostic core of [[statefulSessions]] (same contract as
    * [[tumblingFrom]]). */
  def sessionsFrom(s: SparkSession, events: DataFrame, sink: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val gapUs = 1800L * 1000 * 1000

    val src = events
      .withColumn("ts_utc", timestamp_micros(expr("ts div 1000")))
      .withWatermark("ts_utc", "30 minutes")
      .select(col("user_id"), expr("ts div 1000").as("ts_us"), col("ts_utc"))
      .as[SessEvent]

    val sessions = src
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessState, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, events: Iterator[SessEvent], state: GroupState[SessState]) =>
          if (state.hasTimedOut) {
            val st = state.get
            state.remove()
            Iterator.single(SessionOut(user, st.start, st.end, st.n))
          } else {
            val ts = events.map(_.ts_us).toArray.sorted
            val closed = scala.collection.mutable.ArrayBuffer[SessionOut]()
            var cur = state.getOption.orNull
            for (t <- ts) {
              cur match {
                case null => cur = SessState(t, t, 1)
                case c if t - c.end > gapUs =>
                  closed += SessionOut(user, c.start, c.end, c.n)
                  cur = SessState(t, t, 1)
                case c => cur = SessState(c.start, t, c.n + 1)
              }
            }
            if (cur != null) {
              state.update(cur)
              state.setTimeoutTimestamp(cur.end / 1000 + gapUs / 1000)
            }
            closed.iterator
          }
      }

    runToTable(s, sessions.toDF(), sink, "append")
      .orderBy(col("user_id"), col("session_start_us"))
  }

  /** Streaming DATA-QUALITY MONITOR: the expectations pattern
    * (q_expectations) maintained live — hourly windows carry violation
    * counters for a value-range rule, a referential rule against the
    * broadcast static customer dim (stream-static join), an
    * event-type domain rule and a props-parse rule. State is
    * calendar-bounded (one row per hour × fixed counter columns); the
    * dim is broadcast once, never shuffled per batch. */
  def qualityMonitor(s: SparkSession, dir: String): DataFrame =
    qualityMonitorFrom(s, eventsStream(s, dir),
      s.read.parquet(s"$dir/customer.parquet").select(col("c_custkey")),
      "st_quality_mem")

  def qualityMonitorFrom(s: SparkSession, src: DataFrame,
      custKeys: DataFrame, sink: String): DataFrame = {
    val knownTypes = Seq("view", "click", "signup", "purchase", "error")
    val agg = src
      .withColumn("ts_utc", timestamp_micros(expr("ts div 1000")))
      .withWatermark("ts_utc", "1 hour")
      .join(broadcast(custKeys.distinct()),
        col("user_id") === col("c_custkey"), "left")
      .groupBy(window(col("ts_utc"), "1 hour"))
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("value") > 400, 1L).otherwise(0L)).as("value_over_400"),
        sum(when(col("c_custkey").isNull, 1L).otherwise(0L)).as("fk_user_miss"),
        sum(when(!col("event_type").isin(knownTypes: _*), 1L).otherwise(0L))
          .as("type_unknown"),
        sum(when(get_json_object(col("props"), "$.k").isNull, 1L)
          .otherwise(0L)).as("props_invalid"))
    runToTable(s, agg, sink, "complete")
      .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss")
          .as("window_start"),
        col("n_events"), col("value_over_400"), col("fk_user_miss"),
        col("type_unknown"), col("props_invalid"))
      .orderBy(col("window_start"))
  }

  final case class AttrEvent(user_id: Long, ts_us: Long, event_id: Long,
      event_type: String, vm: Long)
  final case class Touch(ts_us: Long, event_id: Long, touch_type: String)
  final case class AttrState(touches: List[Touch])
  final case class Credit(model: String, touch_type: String, credit: Long)

  /** Stateful MULTI-TOUCH ATTRIBUTION (flatMapGroupsWithState,
    * NoTimeout): per user, the state is the touch buffer for the last
    * 7 days — each arriving purchase sees exactly the touches the
    * batch banded join would pair it with (the event-time-ordered-feed
    * contract makes the at-purchase buffer complete), so first/last/
    * linear credits are emitted immediately and are IDENTICAL to the
    * batch twin's, integer remainder rule included. Touches older than
    * (current event − 7 d) evict on every update (a later purchase's
    * window can only move forward), so state per user is bounded by
    * the touch rate × lookback — the same frame the batch join holds
    * per user, never the full history. */
  def statefulAttribution(s: SparkSession, dir: String): DataFrame =
    attributionFrom(s, eventsStream(s, dir), "st_attribution_mem")

  def attributionFrom(s: SparkSession, events: DataFrame,
      sink: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val lookbackUs = 7L * 24 * 3600 * 1000 * 1000
    val src = events
      .select(col("user_id"), expr("ts div 1000").as("ts_us"),
        col("event_id"), col("event_type"),
        (col("value").cast("decimal(18,6)") * 1000000).cast("long").as("vm"))
      .as[AttrEvent]
    val credits = src
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[AttrState, Credit](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: Long, evs: Iterator[AttrEvent], state: GroupState[AttrState]) =>
          // touches sort BEFORE purchases at equal ts (the qAsofClick
          // trick): the batch band is t_us <= p_us, so a same-micro
          // touch with a larger event_id still attributes
          val sorted = evs.toArray.sortBy(e =>
            (e.ts_us, if (e.event_type == "purchase") 1 else 0, e.event_id))
          val out = scala.collection.mutable.ArrayBuffer[Credit]()
          var buf = state.getOption.map(_.touches).getOrElse(Nil)
          for (e <- sorted) {
            buf = buf.filter(_.ts_us > e.ts_us - lookbackUs)
            e.event_type match {
              case "view" | "click" =>
                buf = Touch(e.ts_us, e.event_id, e.event_type) :: buf
              case "purchase" =>
                // buffer already holds exactly (p_us - 7d, p_us] touches
                if (buf.isEmpty) {
                  out += Credit("first", "(direct)", e.vm)
                  out += Credit("last", "(direct)", e.vm)
                  out += Credit("linear", "(direct)", e.vm)
                  out += Credit("decay", "(direct)", e.vm)
                } else {
                  val n = buf.size.toLong
                  val first = buf.minBy(t => (t.ts_us, t.event_id))
                  val last = buf.maxBy(t => (t.ts_us, t.event_id))
                  out += Credit("first", first.touch_type, e.vm)
                  out += Credit("last", last.touch_type, e.vm)
                  val share = e.vm / n
                  val rem = e.vm % n
                  buf.foreach { t =>
                    out += Credit("linear", t.touch_type,
                      share + (if (t eq first) rem else 0L))
                  }
                  // time-decay model: integer day-weights w = 7 − age
                  // days, floor shares, remainder to the first touch —
                  // identical to the batch ev_attribution_decay rules
                  val dayUs = 86400000000L
                  def wt(t: Touch): Long = 7L - (e.ts_us - t.ts_us) / dayUs
                  val tw = buf.map(wt).sum
                  val bases = buf.map(t => t -> (e.vm * wt(t)) / tw)
                  val drem = e.vm - bases.map(_._2).sum
                  bases.foreach { case (t, b) =>
                    out += Credit("decay", t.touch_type,
                      b + (if (t eq first) drem else 0L))
                  }
                }
              case _ => () // non-touch, non-purchase events don't attribute
            }
          }
          if (buf.nonEmpty) state.update(AttrState(buf)) else state.remove()
          out.iterator
      }
    runToTable(s, credits.toDF(), sink, "append")
  }

  final case class SessEvent2(user_id: Long, ts_us: Long, event_id: Long,
      event_type: String, ts_utc: java.sql.Timestamp)
  final case class SessState2(start: Long, end: Long, n: Long,
      entry: String, exit: String)
  final case class SessionOut2(user_id: Long, session_start_us: Long,
      entry_type: String, exit_type: String, n_events: Long)

  /** [[sessionsFrom]] with entry/exit event types carried in the
    * session state — the streaming half of the batch entry/exit matrix
    * ([[graft.queries.Events.qEntryExit]]): state per user is ONE
    * (start, end, n, entry, exit) tuple regardless of session length
    * (the exit label overwrites in place; nothing accumulates
    * per-event), sessions close by the same 30-minute
    * gap / EventTimeTimeout rule, and the caller aggregates the closed
    * sessions into the (entry, exit) matrix. In-batch events sort by
    * (ts_us, event_id) so tie-breaks match the batch twin's window
    * order exactly. */
  def statefulEntryExit(s: SparkSession, dir: String): DataFrame =
    entryExitFrom(s, eventsStream(s, dir), "st_entry_exit_mem")

  def entryExitFrom(s: SparkSession, events: DataFrame,
      sink: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val gapUs = 1800L * 1000 * 1000
    val src = events
      .withColumn("ts_utc", timestamp_micros(expr("ts div 1000")))
      .withWatermark("ts_utc", "30 minutes")
      .select(col("user_id"), expr("ts div 1000").as("ts_us"),
        col("event_id"), col("event_type"), col("ts_utc"))
      .as[SessEvent2]
    val sessions = src
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessState2, SessionOut2](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, evs: Iterator[SessEvent2], state: GroupState[SessState2]) =>
          if (state.hasTimedOut) {
            val st = state.get
            state.remove()
            Iterator.single(SessionOut2(user, st.start, st.entry, st.exit, st.n))
          } else {
            val sorted = evs.toArray.sortBy(e => (e.ts_us, e.event_id))
            val closed = scala.collection.mutable.ArrayBuffer[SessionOut2]()
            var cur = state.getOption.orNull
            for (e <- sorted) {
              cur match {
                case null =>
                  cur = SessState2(e.ts_us, e.ts_us, 1, e.event_type, e.event_type)
                case c if e.ts_us - c.end > gapUs =>
                  closed += SessionOut2(user, c.start, c.entry, c.exit, c.n)
                  cur = SessState2(e.ts_us, e.ts_us, 1, e.event_type, e.event_type)
                case c =>
                  cur = SessState2(c.start, e.ts_us, c.n + 1, c.entry, e.event_type)
              }
            }
            if (cur != null) {
              state.update(cur)
              state.setTimeoutTimestamp(cur.end / 1000 + gapUs / 1000)
            }
            closed.iterator
          }
      }
    runToTable(s, sessions.toDF(), sink, "append")
  }

  final case class MarkovEvent(
      user_id: Long, ts_us: Long, event_id: Long, event_type: String)
  /** lastType feeds the emitted transition; (lastTs, lastId) exist for
    * exactly one purpose — the cross-batch ORDERING GUARD below: a
    * later micro-batch delivering an event before the stored position
    * violates the event-time-ordered-feed contract and must fail
    * loudly (silently emitting the pair would diverge from the batch
    * lead() twin with no signal). */
  final case class MarkovState(lastType: String, lastTs: Long, lastId: Long)
  final case class Transition(user_id: Long, cur: String, nxt: String)

  /** Per-user event-type TRANSITIONS as a stateful stream
    * (flatMapGroupsWithState, NoTimeout): the state is each user's
    * LAST event, so a transition whose two halves arrive in different
    * micro-batches is still emitted — the per-key continuity a
    * per-batch window could never give. Same event-time-ordered-feed
    * contract as the as-of twin; over a finite feed the emitted pair
    * multiset equals the batch lead() pairs exactly (the cross-batch
    * path is pinned by the MemoryStream twin in StreamingSpec). */
  def markovPairsFrom(s: SparkSession, events: DataFrame,
      sink: String): DataFrame =
    runToTable(s, markovPairsStream(s, events).toDF(), sink, "append")
      // the transition tail self-joins this table (counts vs per-cur
      // totals); checkpoint the bounded pair table so the MemoryPlan
      // leaf becomes re-referenceable (same fix as dailyValueCounts)
      .localCheckpoint()

  /** The transformed (pre-sink) transition stream — exposed so tests
    * can drive it through arbitrary sinks (e.g. a checkpointed parquet
    * sink for restart-continuity proofs). */
  def markovPairsStream(s: SparkSession, events: DataFrame)
      : org.apache.spark.sql.Dataset[Transition] = {
    import s.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val src = events
      .select(col("user_id"), expr("ts div 1000").as("ts_us"),
        col("event_id"), col("event_type"))
      .as[MarkovEvent]
    val pairs = src
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[MarkovState, Transition](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, evs: Iterator[MarkovEvent], state: GroupState[MarkovState]) =>
          val sorted = evs.toArray.sortBy(e => (e.ts_us, e.event_id))
          val out = scala.collection.mutable.ArrayBuffer[Transition]()
          var prev = state.getOption.orNull
          for (e <- sorted) {
            if (prev != null) {
              // ordering guard (the reason state carries lastTs/lastId):
              // within a batch the sort above rules this out, so a trip
              // here is a cross-batch regression — fail, don't emit a
              // pair the batch twin would never produce
              if (e.ts_us < prev.lastTs ||
                  (e.ts_us == prev.lastTs && e.event_id < prev.lastId))
                throw new IllegalStateException(
                  s"markov stream: out-of-order event (user=$user, " +
                    s"ts_us=${e.ts_us}, id=${e.event_id}) arrived after " +
                    s"(ts_us=${prev.lastTs}, id=${prev.lastId}) — the " +
                    "event-time-ordered-feed contract is violated")
              out += Transition(user, prev.lastType, e.event_type)
            }
            prev = MarkovState(e.event_type, e.ts_us, e.event_id)
          }
          if (prev != null) state.update(prev)
          out.iterator
      }
    pairs
  }

  /** [[markovPairsFrom]] over the file events source. */
  def markovPairs(s: SparkSession, dir: String,
      sink: String = "st_markov_mem"): DataFrame =
    markovPairsFrom(s, eventsStream(s, dir), sink)

  final case class Path2State(t1: String, t2: String)
  final case class PathTriple(user_id: Long, a: String, b: String, c: String)

  /** 3-step path triples as a stateful stream: the state is each
    * user's last TWO events, so triples spanning micro-batch
    * boundaries (in either of the two possible split positions) are
    * still emitted — the depth-2 sibling of [[markovPairsFrom]]. */
  def pathTriplesFrom(s: SparkSession, events: DataFrame,
      sink: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val src = events
      .select(col("user_id"), expr("ts div 1000").as("ts_us"),
        col("event_id"), col("event_type"))
      .as[MarkovEvent]
    val triples = src
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[Path2State, PathTriple](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, evs: Iterator[MarkovEvent], state: GroupState[Path2State]) =>
          val sorted = evs.toArray.sortBy(e => (e.ts_us, e.event_id))
          val out = scala.collection.mutable.ArrayBuffer[PathTriple]()
          var st = state.getOption.getOrElse(Path2State(null, null))
          for (e <- sorted) {
            if (st.t1 != null && st.t2 != null)
              out += PathTriple(user, st.t1, st.t2, e.event_type)
            st = Path2State(st.t2, e.event_type)
          }
          if (st.t2 != null) state.update(st)
          out.iterator
      }
    runToTable(s, triples.toDF(), sink, "append")
      .localCheckpoint() // the path tail re-references the bounded table
  }

  /** [[pathTriplesFrom]] over the file events source. */
  def pathTriples(s: SparkSession, dir: String,
      sink: String = "st_path_mem"): DataFrame =
    pathTriplesFrom(s, eventsStream(s, dir), sink)

  /** Stream-static enrichment join: the streaming events feed joined to
    * a BROADCAST static dimension (customer), then watermarked hourly
    * aggregation per market segment. The static side is re-broadcast per
    * micro-batch by Structured Streaming; at cluster scale this is the
    * standard "enrich the firehose with a dim table" shape — no shuffle
    * of the stream, one hash-agg after the join. */
  def enrichFrom(s: SparkSession, src: DataFrame, dim: DataFrame,
      sink: String): DataFrame = {
    val agg = src
      .withColumn("ts_utc", timestamp_micros(expr("ts div 1000")))
      .withWatermark("ts_utc", "1 hour")
      .join(broadcast(dim), col("user_id") === col("c_custkey"))
      .groupBy(window(col("ts_utc"), "1 hour"), col("c_mktsegment"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,6)")).cast("double").as("total_value"))
    runToTable(s, agg, sink, "complete")
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col("c_mktsegment").as("mktsegment"), col("n_events"), col("total_value"))
      .orderBy(col("window_start"), col("mktsegment"))
  }

  /** File-source driver of [[enrichFrom]]: events stream ⋈ customer. */
  def enrichedCounts(s: SparkSession, dir: String): DataFrame =
    enrichFrom(s, eventsStream(s, dir),
      s.read.parquet(s"$dir/customer.parquet")
        .select(col("c_custkey"), col("c_mktsegment")),
      "st_enrich_mem")

  /** Stream-stream event-time interval join: every click matched to the
    * same user's views in the 10 minutes before it. Both sides carry
    * watermarks and the join condition is on the event-time columns, so
    * Spark bounds each side's state (views older than click-watermark −
    * 10 min are dropped); inner-join emission itself is
    * watermark-independent, which keeps the finite-source result exactly
    * the batch interval join. */
  def clickViewJoinFrom(s: SparkSession, clicksSrc: DataFrame,
      viewsSrc: DataFrame, sink: String): DataFrame = {
    def side(df: DataFrame, typ: String, pfx: String): DataFrame = df
      .filter(col("event_type") === typ)
      .withColumn(s"${pfx}_ts", timestamp_micros(expr("ts div 1000")))
      .withWatermark(s"${pfx}_ts", "1 hour")
      .select(col("event_id").as(s"${pfx}_id"), col("user_id").as(s"${pfx}_user"),
        col(s"${pfx}_ts"), expr("ts div 1000").as(s"${pfx}_us"))
    val clicks = side(clicksSrc, "click", "click")
    val views = side(viewsSrc, "view", "view")
    val joined = clicks.join(views, expr(
      """click_user = view_user AND
        |view_ts >= click_ts - INTERVAL 10 MINUTES AND
        |view_ts <= click_ts""".stripMargin))
      .select(col("click_id"), col("view_id"), col("click_user").as("user_id"),
        (col("click_us") - col("view_us")).as("lag_us"))
    runToTable(s, joined, sink, "append")
      .orderBy(col("click_id"), col("view_id"))
  }

  /** File-source driver of [[clickViewJoinFrom]] — two independent
    * streaming scans of the same feed. */
  def clickViewJoin(s: SparkSession, dir: String): DataFrame =
    clickViewJoinFrom(s, eventsStream(s, dir), eventsStream(s, dir),
      "st_click_view_mem")

  /** LEFT-OUTER stream-stream interval join — the abandonment shape
    * ("which clicks never saw a view in their window"): matched pairs
    * emit eagerly exactly as the inner join does, while an UNMATCHED
    * click emits its null-extended row only once the watermark proves
    * no future view can land in its window (view_ts ≤ click_ts, so a
    * click is sealed when the watermark passes its own timestamp —
    * emission predicate click_ts < watermark = max event time − 1 h).
    * On a finite feed the trailing hour's unmatched clicks never seal;
    * the oracle states exactly that closed-prefix contract. State
    * stays watermark-bounded on both sides like the inner twin. */
  def clickViewOuterFrom(s: SparkSession, clicksSrc: DataFrame,
      viewsSrc: DataFrame, sink: String): DataFrame = {
    def side(df: DataFrame, typ: String, pfx: String): DataFrame = df
      .filter(col("event_type") === typ)
      .withColumn(s"${pfx}_ts", timestamp_micros(expr("ts div 1000")))
      .withWatermark(s"${pfx}_ts", "1 hour")
      .select(col("event_id").as(s"${pfx}_id"), col("user_id").as(s"${pfx}_user"),
        col(s"${pfx}_ts"), expr("ts div 1000").as(s"${pfx}_us"))
    val clicks = side(clicksSrc, "click", "click")
    val views = side(viewsSrc, "view", "view")
    val joined = clicks.join(views, expr(
      """click_user = view_user AND
        |view_ts >= click_ts - INTERVAL 10 MINUTES AND
        |view_ts <= click_ts""".stripMargin), "left_outer")
      .select(col("click_id"), col("view_id"), col("click_user").as("user_id"),
        (col("click_us") - col("view_us")).as("lag_us"))
    runToTable(s, joined, sink, "append")
      .orderBy(col("click_id"), col("view_id").asc_nulls_first)
  }

  def clickViewOuter(s: SparkSession, dir: String): DataFrame =
    clickViewOuterFrom(s, eventsStream(s, dir), eventsStream(s, dir),
      "st_click_view_outer_mem")

  final case class AsofEvent(event_id: Long, user_id: Long, ts_us: Long,
      is_purchase: Boolean)
  final case class AsofOut(event_id: Long, user_id: Long,
      last_click_us: Option[Long])

  /** Streaming AS-OF enrich (flatMapGroupsWithState, NoTimeout): every
    * purchase annotated with the user's latest prior-or-simultaneous
    * click — the streaming twin of the batch `ev_asof_last_click`
    * window. State per user is ONE long (last click ts) — bounded by
    * user cardinality, never by stream length. Within a micro-batch the
    * group's rows are sorted by the batch op's exact key (ts, clicks
    * before purchases at equal ts, event_id) and replayed against the
    * carried state, so a single-batch finite source reproduces the
    * batch answer EXACTLY; across batches the feed contract is per-user
    * event-time order (any global event-time split qualifies — the
    * same contract `st_novelty` declares), under which the replay stays
    * exact because the state is a monotone max. */
  def asofFrom(s: SparkSession, events: DataFrame, sink: String): DataFrame =
    runToTable(s, asofStreamFrame(s, events), sink, "append")
      .orderBy(col("event_id"))

  /** The unstarted streaming as-of frame — exposed so multi-batch tests
    * can drive the micro-batch boundaries themselves. */
  def asofStreamFrame(s: SparkSession, events: DataFrame): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    val src = events
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("event_id"), col("user_id"), expr("ts div 1000").as("ts_us"),
        (col("event_type") === "purchase").as("is_purchase"))
      .as[AsofEvent]
    val out = src.groupByKey(_.user_id)
      .flatMapGroupsWithState[Long, AsofOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) { (user, it, state) =>
        var last: Option[Long] = state.getOption
        val outBuf = Seq.newBuilder[AsofOut]
        it.toIndexedSeq
          .sortBy(e => (e.ts_us, e.is_purchase, e.event_id))
          .foreach { e =>
            if (!e.is_purchase) {
              if (last.forall(_ < e.ts_us)) last = Some(e.ts_us)
            } else outBuf += AsofOut(e.event_id, user, last)
          }
        last.foreach(state.update)
        outBuf.result().iterator
      }
    out.toDF
  }

  /** File-source driver of [[asofFrom]]. */
  def asofLastClick(s: SparkSession, dir: String): DataFrame =
    asofFrom(s, eventsStream(s, dir), "st_asof_mem")

  /** Streaming INCREMENTAL exact dedup via foreachBatch: each
    * micro-batch is content-hashed, first-win reduced within the batch
    * (min id per hash — same deterministic rule as the batch
    * d_dedup_by_key), anti-joined against the ACCUMULATED hash state of
    * all prior batches, and the survivors appended to both the output
    * and the state. This is the production stream-ingest shape the
    * watermark-bounded `dropDuplicatesWithinWatermark` cannot express:
    * state never expires — a document seen a month ago still
    * deduplicates today's arrival (the corpus-lifetime guarantee the
    * batch incremental dedup [dd_exact_incremental] gives).
    *
    * Exactly-once without a transactional sink: every batch writes to
    * its OWN `batch=<id>` directory with overwrite, so a Spark retry of
    * the same micro-batch overwrites rather than duplicates — the
    * textbook idempotent-foreachBatch pattern. State reads list only
    * batch dirs with id < the current batch, so a retry never
    * anti-joins against the partial state its own failed attempt wrote
    * (that would silently drop every survivor of the batch). The
    * anti-join side is a hash column only, so at
    * cluster scale the state scan is a single narrow column that AQE
    * can bucket or broadcast as its size dictates.
    *
    * @return survivors (idCol, textCol, _h) read back from the output
    *         dirs after the stream drains. */
  private def existingParquet(s: SparkSession, path: String): Option[DataFrame] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(p) && fs.listStatus(p).nonEmpty)
      Some(s.read.parquet(path)) else None
  }

  /** State dirs from batches STRICTLY BEFORE `batchId` — a micro-batch
    * retry must not see the `batch=<id>` dir its own failed attempt
    * wrote, or the batch anti-joins against its own hashes and writes
    * an empty survivors set. */
  private def priorState(s: SparkSession, stateDir: String,
      batchId: Long): Option[DataFrame] = {
    val p = new org.apache.hadoop.fs.Path(stateDir)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else {
      val prior = fs.listStatus(p).filter(_.isDirectory).map(_.getPath)
        .filter(d => d.getName.stripPrefix("batch=").toLongOption
          .exists(_ < batchId))
      if (prior.isEmpty) None
      else Some(s.read.parquet(prior.map(_.toString).toSeq: _*))
    }
  }

  /** Start the incremental-dedup stream; the caller drives it
    * (processAllAvailable between source feeds) and stops it. */
  def incrementalDedupStart(s: SparkSession, src: DataFrame,
      idCol: String, textCol: String,
      outDir: String): org.apache.spark.sql.streaming.StreamingQuery = {
    val stateDir = s"$outDir/state"
    val survDir = s"$outDir/survivors"
    src.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val hashed = batch.withColumn("_h", md5(col(textCol)))
        val firstInBatch = hashed
          .groupBy(col("_h")).agg(min(col(idCol)).as(idCol))
          .join(hashed, Seq("_h", idCol))
          .localCheckpoint() // feeds the bloom count AND the anti join
        val survivors = priorState(s, stateDir, batchId) match {
          case Some(st) =>
            // Bloom prefilter (the dd_bloom_incremental design, stream
            // side): a filter over the BATCH hashes — the small, bounded
            // side — prunes the accumulated state store to possible
            // collisions before the anti join, so the per-batch shuffle
            // is candidate-sized, not store-sized. Native Catalyst form:
            // bloom_filter_agg builds the filter binary, might_contain
            // probes it in codegen (no per-row Scala closure); the
            // filter bytes ride the plan as a literal, the same bounded
            // footprint the old driver broadcast had. No false
            // negatives ⇒ survivors are EXACTLY the un-prefiltered anti
            // join (StreamingSpec pins the results, and st_dedup_count's
            // oracle re-proves it every verify).
            val nBatch = math.max(firstInBatch.count(), 1000L)
            val bf = firstInBatch.agg(
              graft.functions.GraftFunctions.bloomFilterAgg(
                xxhash64(col("_h")), nBatch, nBatch * 10)).head
            val pruned =
              if (bf.isNullAt(0)) st.limit(0)
              else st.filter(graft.functions.GraftFunctions.bloomMightContain(
                bf.getAs[Array[Byte]](0), xxhash64(col("_h"))))
            firstInBatch.join(pruned, Seq("_h"), "left_anti")
          case None => firstInBatch
        }
        // overwrite THIS batch's directories: a micro-batch retry
        // rewrites them instead of appending duplicates
        survivors.write.mode("overwrite").parquet(s"$survDir/batch=$batchId")
        survivors.select(col("_h")).write.mode("overwrite")
          .parquet(s"$stateDir/batch=$batchId")
        ()
      }
      .start()
  }

  /** Survivors accumulated across every processed batch. */
  def incrementalDedupResult(s: SparkSession, outDir: String): DataFrame =
    existingParquet(s, s"$outDir/survivors").getOrElse(s.emptyDataFrame)

  /** Bounded-source convenience: start, drain, stop, read back. */
  def incrementalDedupBatches(s: SparkSession, src: DataFrame,
      idCol: String, textCol: String, outDir: String): DataFrame = {
    val q = incrementalDedupStart(s, src, idCol, textCol, outDir)
    try q.processAllAvailable()
    finally q.stop()
    incrementalDedupResult(s, outDir)
  }

  /** STREAMING heavy hitters: per micro-batch, a k-counter Misra–Gries
    * summary (≤ k rows, the bounded sketch) plus the batch's raw token
    * column land in `batch=<id>` dirs — idempotent on retry like
    * [[incrementalDedupStart]]. The union of per-batch summaries
    * contains every GLOBAL heavy hitter: if Σcᵢ > Σnᵢ/k then some
    * batch has cᵢ > nᵢ/k (average argument), and the MG invariant
    * (counter ≥ c − n/k) keeps that token in that batch's summary.
    * [[heavyHittersResult]] then recounts candidates EXACTLY over the
    * archived tokens — the recount is what makes MG merge-order
    * nondeterminism irrelevant: whatever summaries arose, the output
    * is "all tokens with count > total/k, true counts", stateable as
    * plain SQL (st_heavy_hitters). At cluster scale the token archive
    * is the landed bronze table the stream writes anyway (kappa
    * shape); the summaries are ≤ k rows per batch. */
  def heavyHittersStart(s: SparkSession, src: DataFrame, tokCol: String,
      k: Int, outDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    src.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        import batch.sparkSession.implicits._
        val toks = batch.select(col(tokCol).as("tok"))
        toks.as[String]
          .groupByKey(_ => 0)
          .agg(graft.ops.HeavyHitters.aggregator(k).toColumn)
          .flatMap(_._2).toDF("tok")
          .write.mode("overwrite").parquet(s"$outDir/summaries/batch=$batchId")
        toks.write.mode("overwrite").parquet(s"$outDir/tokens/batch=$batchId")
        ()
      }
      .start()

  /** Exact heavy-hitter recount over the drained stream: candidates =
    * union of batch summaries (bounded, broadcast), counts from the
    * archived token column, true threshold n·k > total. */
  def heavyHittersResult(s: SparkSession, outDir: String, k: Int): DataFrame = {
    import s.implicits._
    // a stream that never saw a batch has no dirs — empty result, not
    // a missing-path AnalysisException
    (existingParquet(s, s"$outDir/summaries"),
        existingParquet(s, s"$outDir/tokens")) match {
      case (Some(sums), Some(tokens)) =>
        heavyHitterRecount(s, sums, tokens, k)
      case _ =>
        Seq.empty[(String, Long, Long)].toDF("tok", "n", "total")
    }
  }

  private def heavyHitterRecount(s: SparkSession, sums: DataFrame,
      tokens: DataFrame, k: Int): DataFrame = {
    import s.implicits._
    val cands = sums.select($"tok").distinct()
    val toks = tokens.select($"tok")
    val total = toks.agg(count(lit(1)).as("total"))
    toks.join(broadcast(cands), Seq("tok"), "left_semi")
      .groupBy($"tok").agg(count(lit(1)).as("n"))
      .crossJoin(broadcast(total))
      .filter($"n" * k > $"total")
      .select($"tok", $"n", $"total")
  }

  /** Bounded-source convenience: start, drain, stop, recount. */
  def heavyHittersBatches(s: SparkSession, src: DataFrame, tokCol: String,
      k: Int, outDir: String): DataFrame = {
    val q = heavyHittersStart(s, src, tokCol, k, outDir)
    try q.processAllAvailable()
    finally q.stop()
    heavyHittersResult(s, outDir, k)
  }

  /** STREAMING count-min sketch: each micro-batch writes ITS OWN d×w
    * counter matrix (≤ d·w rows) plus its raw token column to
    * `batch=<id>` dirs — idempotent overwrite on retry, like
    * [[heavyHittersStart]]. The global sketch is the CELL-WISE SUM of
    * the batch matrices: CMS is linear (sketch(A ⊎ B) = sketch(A) +
    * sketch(B)), the same property map-side combine exploits inside a
    * batch, so batch boundaries cannot change the result — which is
    * why st_cms_counts restates the batch oracle verbatim. The token
    * archive (the bronze table a kappa pipeline lands anyway) only
    * feeds the probe-selection/exact-count side; the sketch itself
    * stays ≤ d·w rows per batch no matter the stream volume. */
  def cmsStart(s: SparkSession, src: DataFrame, tokCol: String,
      d: Int, w: Int, outDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    src.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val toks = batch.select(col(tokCol).as("tok"))
        graft.ops.CountMin.sketch(toks, "tok", d, w)
          .write.mode("overwrite").parquet(s"$outDir/sketch/batch=$batchId")
        toks.write.mode("overwrite").parquet(s"$outDir/tokens/batch=$batchId")
        ()
      }
      .start()

  /** Assemble the drained stream's global CMS (cell-wise sum) and
    * estimate the top-10 exact tokens — same output contract as batch
    * d_cms_counts. */
  def cmsResult(s: SparkSession, outDir: String, d: Int, w: Int): DataFrame = {
    import s.implicits._
    (existingParquet(s, s"$outDir/sketch"),
        existingParquet(s, s"$outDir/tokens")) match {
      case (Some(sk), Some(tokens)) =>
        val counters = sk.groupBy($"row", $"bucket").agg(sum($"cnt").as("cnt"))
        val probes = tokens.groupBy($"tok").agg(count(lit(1)).as("exact_n"))
          .orderBy($"exact_n".desc, $"tok").limit(10)
        graft.ops.CountMin.estimate(counters, probes, "tok", d, w)
          .join(probes, "tok")
          .select($"tok", $"exact_n", $"cms_est")
          .orderBy($"exact_n".desc, $"tok")
      case _ =>
        Seq.empty[(String, Long, Long)].toDF("tok", "exact_n", "cms_est")
    }
  }

  /** Bounded-source convenience: start, drain, stop, assemble. */
  def cmsBatches(s: SparkSession, src: DataFrame, tokCol: String,
      d: Int, w: Int, outDir: String): DataFrame = {
    val q = cmsStart(s, src, tokCol, d, w, outDir)
    try q.processAllAvailable()
    finally q.stop()
    cmsResult(s, outDir, d, w)
  }

  /** Streaming MinHash LSH near-dup: foreachBatch maintains a parquet
    * LSH state store ([[graft.ops.MinHash.lshState]] rows — shingle
    * sets + signatures + band keys, never raw text) and emits each
    * micro-batch's verified pairs against all PRIOR state plus within
    * the batch ([[graft.ops.MinHash.incrementalCandidatePairs]]: the
    * batch side broadcasts, corpus state is only scanned in buckets the
    * batch touches — per-batch cost scales with the batch, never the
    * accumulated corpus). Feeding a corpus through in ANY batch split
    * accumulates exactly the one-shot
    * [[graft.ops.MinHash.candidatePairs]] pair set: each pair is
    * emitted once, by the batch of its later-arriving member (ids are
    * unique across the feed by contract). Idempotent per-batch
    * overwrite dirs + strictly-prior state reads, exactly as
    * [[incrementalDedupStart]]. */
  def minhashIncrementalStart(s: SparkSession, src: DataFrame,
      idCol: String, textCol: String,
      outDir: String): org.apache.spark.sql.streaming.StreamingQuery = {
    val stateDir = s"$outDir/state"
    val pairsDir = s"$outDir/pairs"
    src.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val st = MinHash.lshState(batch, idCol, textCol).localCheckpoint()
        val prior = priorState(s, stateDir, batchId).getOrElse(st.limit(0))
        MinHash.incrementalCandidatePairs(st, prior)
          .select(col("id_a"), col("id_b"),
            round(col("jaccard"), 6).as("jaccard"))
          .write.mode("overwrite").parquet(s"$pairsDir/batch=$batchId")
        st.write.mode("overwrite").parquet(s"$stateDir/batch=$batchId")
        ()
      }
      .start()
  }

  /** Latest full labelling from batches STRICTLY BEFORE `batchId`
    * (labels dirs each hold the complete post-batch labelling, so only
    * the newest prior dir is read — same retry-safety rule as
    * [[priorState]]). */
  private def priorLabels(s: SparkSession, labelsDir: String,
      batchId: Long): Option[DataFrame] = {
    val p = new org.apache.hadoop.fs.Path(labelsDir)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else fs.listStatus(p).filter(_.isDirectory).map(_.getPath)
      .flatMap(d => d.getName.stripPrefix("batch=").toLongOption
        .filter(_ < batchId).map(_ -> d))
      .sortBy(_._1).lastOption
      .map { case (_, d) => s.read.parquet(d.toString) }
  }

  /** STREAMING incremental near-dup clustering: each micro-batch's LSH
    * pairs (batch-internal + batch↔accumulated-signature-state, the
    * [[minhashIncrementalStart]] recipe) merge into the persisted
    * component labelling via
    * [[graft.ops.ConnectedComponents.incremental]] — only components
    * the batch touches are re-solved, so per-batch cost tracks the
    * batch, not the corpus. Every union of per-batch pair sets equals
    * the full pair set (a pair is internal to exactly one batch or
    * crosses from a later batch to earlier state), and the incremental
    * merge provably equals a full recompute, so after draining a
    * finite source the final labelling IS the one-shot batch
    * clustering — the oracle states it with the full-corpus recursive
    * CTE. Same idempotent batch=<id> overwrite layout as the other
    * dedup stores; labels dirs hold the complete post-batch labelling
    * and only the newest prior dir is read. */
  def clustersIncrementalStart(s: SparkSession, src: DataFrame,
      idCol: String, textCol: String,
      outDir: String): org.apache.spark.sql.streaming.StreamingQuery = {
    val stateDir = s"$outDir/state"
    val labelsDir = s"$outDir/labels"
    src.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        import s.implicits._
        val st = MinHash.lshState(batch, idCol, textCol).localCheckpoint()
        val prior = priorState(s, stateDir, batchId).getOrElse(st.limit(0))
        val newEdges = MinHash.incrementalCandidatePairs(st, prior)
          .select(col("id_a").as("src"), col("id_b").as("dst"))
        val base = priorLabels(s, labelsDir, batchId)
          .getOrElse(Seq.empty[(Long, Long)].toDF("id", "component"))
        graft.ops.ConnectedComponents.incremental(base, newEdges)
          .write.mode("overwrite").parquet(s"$labelsDir/batch=$batchId")
        st.write.mode("overwrite").parquet(s"$stateDir/batch=$batchId")
        ()
      }
      .start()
  }

  /** Drive [[clustersIncrementalStart]] over a finite source; returns
    * the final labelling (id, component). */
  def clusterBatches(s: SparkSession, src: DataFrame, idCol: String,
      textCol: String, outDir: String): DataFrame = {
    val q = clustersIncrementalStart(s, src, idCol, textCol, outDir)
    try q.processAllAvailable()
    finally q.stop()
    priorLabels(s, s"$outDir/labels", Long.MaxValue)
      .getOrElse {
        import s.implicits._
        Seq.empty[(Long, Long)].toDF("id", "component")
      }
  }

  /** Drive [[minhashIncrementalStart]] to completion over a finite
    * source and return the accumulated pair set. */
  def minhashPairsBatches(s: SparkSession, src: DataFrame, idCol: String,
      textCol: String, outDir: String): DataFrame = {
    val q = minhashIncrementalStart(s, src, idCol, textCol, outDir)
    try q.processAllAvailable()
    finally q.stop()
    existingParquet(s, s"$outDir/pairs").getOrElse(s.emptyDataFrame)
  }

  /** STREAMING novelty scoring: each micro-batch scores its documents
    * against the accumulated first-seen gram store, then appends the
    * grams it INTRODUCED (anti-join vs prior state) to the store — so
    * every gram lives in exactly one batch dir with its first_doc.
    * Feed contract (documented like the BM25 indexer's unique-id rule):
    * batches arrive in doc_id order — then a gram's global first_doc is
    * min(store, batch) and the accumulated scores equal the one-shot
    * batch d_novelty_scores exactly (min distributes over the batch
    * split). Same idempotent batch=<id> overwrite layout and
    * retry-safe prior-state read as the dedup stores. */
  def noveltyStart(s: SparkSession, src: DataFrame, idCol: String,
      textCol: String,
      outDir: String): org.apache.spark.sql.streaming.StreamingQuery = {
    val stateDir = s"$outDir/state"
    val scoreDir = s"$outDir/scores"
    src.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val g = batch
          .select(col(idCol), explode(graft.ops.SubstrDedup.gramHashes(
            graft.ops.Text.tokens(col(textCol)), 8)).as("gh"))
          .distinct()
          .localCheckpoint() // feeds batch-first, scoring, and the append
        val batchFirst = g.groupBy(col("gh")).agg(min(col(idCol)).as("bf"))
          .localCheckpoint()
        val prior = priorState(s, stateDir, batchId)
        val first = prior match {
          case Some(st) => batchFirst
            .join(st, Seq("gh"), "left")
            .select(col("gh"),
              least(col("bf"), coalesce(col("first_doc"), col("bf")))
                .as("first_doc"))
          case None => batchFirst.select(col("gh"), col("bf").as("first_doc"))
        }
        g.join(first, Seq("gh"))
          .groupBy(col(idCol))
          .agg(count(lit(1)).as("n_grams"),
            sum(when(col("first_doc") === col(idCol), 1L).otherwise(0L))
              .as("n_novel"))
          .select(col(idCol), col("n_grams"), col("n_novel"),
            round(col("n_novel").cast("double") / col("n_grams"), 6)
              .as("novelty"))
          .write.mode("overwrite").parquet(s"$scoreDir/batch=$batchId")
        val introduced = prior match {
          case Some(st) => batchFirst.join(st, Seq("gh"), "left_anti")
          case None => batchFirst
        }
        introduced.select(col("gh"), col("bf").as("first_doc"))
          .write.mode("overwrite").parquet(s"$stateDir/batch=$batchId")
        ()
      }
      .start()
  }

  /** Drive [[noveltyStart]] to completion over a finite source and
    * return the accumulated per-document scores. */
  def noveltyBatches(s: SparkSession, src: DataFrame, idCol: String,
      textCol: String, outDir: String): DataFrame = {
    val q = noveltyStart(s, src, idCol, textCol, outDir)
    try q.processAllAvailable()
    finally q.stop()
    existingParquet(s, s"$outDir/scores").getOrElse(s.emptyDataFrame)
  }

  /** STREAMING BM25 index maintenance: each micro-batch appends its
    * (doc, term, tf) and (doc, dl) partials to per-batch parquet dirs —
    * tf/dl are PER-DOCUMENT facts, so new docs are pure partition
    * appends with no merge step; df and the corpus scalars are
    * vocabulary-/unit-sized and re-derived from the accumulated tf at
    * query time (one hash agg over the index, never over raw text).
    * Same idempotent batch=<id> overwrite layout as the dedup stores.
    * Ids must be unique across the feed (re-ingesting a doc would
    * double-count its terms — dedup upstream, exactly as a production
    * indexer does). */
  def bm25IndexStart(s: SparkSession, src: DataFrame,
      idCol: String, textCol: String,
      indexDir: String): org.apache.spark.sql.streaming.StreamingQuery = {
    src.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val tf = batch
          .select(col(idCol).as("doc_id"),
            explode(graft.ops.Text.tokens(col(textCol))).as("term"))
          .groupBy(col("doc_id"), col("term"))
          .agg(count(lit(1)).cast("double").as("tf"))
          .localCheckpoint()
        tf.write.mode("overwrite").parquet(s"$indexDir/tf/batch=$batchId")
        tf.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl"))
          .write.mode("overwrite").parquet(s"$indexDir/dl/batch=$batchId")
        ()
      }
      .start()
  }

  /** Read the accumulated streaming index back as the (tf, dl, df,
    * stats) frames the batch scorer consumes — df/stats re-derived
    * from the stored tf/dl (index-sized aggs, no text). */
  def bm25IndexFrames(s: SparkSession, indexDir: String)
      : (DataFrame, DataFrame, DataFrame, DataFrame) = {
    val tf = s.read.parquet(s"$indexDir/tf")
      .select(col("doc_id"), col("term"), col("tf"))
    val dl = s.read.parquet(s"$indexDir/dl").select(col("doc_id"), col("dl"))
    val df = tf.groupBy(col("term"))
      .agg(count(lit(1)).cast("double").as("df"))
    val stats = dl.agg(count(lit(1)).cast("double").as("n_docs"),
      sum(col("dl")).as("sum_dl"))
    (tf, dl, df, stats)
  }

  /** documents schema for the streaming source twin. */
  val documentsSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType),
    StructField("lang", StringType), StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** STREAMING document flagging: the cleaning pipeline's stats + flag
    * stages are stateless projections/filters, so the identical column
    * logic runs on an unbounded document feed with no state store at
    * all (append mode, no watermark needed) — the "flag documents as
    * they arrive from the crawler" shape. Takes the stat/flag columns
    * as a function so the batch query (d_doc_flags) and this twin
    * cannot drift. */
  def docFlagsStream(s: SparkSession, dir: String,
      flagged: DataFrame => DataFrame, sink: String): DataFrame = {
    val src = sessionFor(s, dir, "documents.parquet")
      .readStream.schema(documentsSchema)
      .option("pathGlobFilter", "documents.parquet").parquet(dir)
    runToTable(s, flagged(src), sink, "append")
  }

  /** AGGREGATING transform over the streaming document feed, complete
    * mode (the transform ends in a groupBy agg whose final table is
    * the answer — state is the group-count-bounded aggregate, never
    * raw documents). */
  def docsAggStream(s: SparkSession, dir: String,
      agg: DataFrame => DataFrame, sink: String): DataFrame = {
    val src = sessionFor(s, dir, "documents.parquet")
      .readStream.schema(documentsSchema)
      .option("pathGlobFilter", "documents.parquet").parquet(dir)
    runToTable(s, agg(src), sink, "complete")
  }

  /** STREAMING funnel statistics: the stream maintains per-(user, type)
    * MIN event times — an order-independent streaming aggregate, so
    * arbitrary cross-batch arrival order cannot change the state (the
    * reason this uses first-touch-per-step semantics: "first click
    * after first view" needs order-dependent state that out-of-order
    * delivery corrupts; strict mins need 3 longs per user, period).
    * Level math over the bounded per-user state runs batch-side — the
    * same stream-keeps-sufficient-statistics split as st_drift_windowed.
    * Complete output mode is fine: state cardinality is users × 3, not
    * events. */
  def funnelMins(s: SparkSession, dir: String, sink: String): DataFrame =
    funnelMinsFrom(s, eventsStream(s, dir)
      .select(col("user_id"), col("event_type"),
        expr("ts div 1000").as("tus")), sink)

  /** Source-agnostic core of [[funnelMins]]: any streaming frame with
    * (user_id, event_type, tus µs) — the MemoryStream twin feeds this
    * with adversarial cross-batch arrival orders. */
  def funnelMinsFrom(s: SparkSession, src: DataFrame,
      sink: String): DataFrame =
    runToTable(s,
      src.filter(col("event_type").isin("view", "click", "purchase"))
        .groupBy(col("user_id"), col("event_type"))
        .agg(min(col("tus")).as("min_tus")),
      sink, "complete")

  val embeddingsSchema: StructType = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType)),
    StructField("label", IntegerType)))

  /** STREAMING incremental DBSCAN: each micro-batch of (id, x, y)
    * points folds into the persisted clustering via
    * [[graft.ops.Density.incrementalState]] — per-batch work is
    * halo-local (degrees and edges only near the batch's cells, the
    * ev_dbscan_incremental argument), so a steady point feed costs
    * per-batch, not per-corpus. Growth is monotone, so after draining
    * a finite source the labelling equals the one-shot solve — which
    * is exactly what the batch oracle states. State (census, core
    * labels, border anchors, labels) uses the same idempotent
    * batch=<id> overwrite layout as the dedup stores; each dir holds
    * the complete post-batch frame, so a retried batch re-derives from
    * strictly-prior dirs and overwrites its own. */
  def dbscanStart(s: SparkSession, src: DataFrame, eps: Long,
      minPts: Long,
      outDir: String): org.apache.spark.sql.streaming.StreamingQuery = {
    src.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val prior = for {
          sc <- priorLabels(s, s"$outDir/scored", batchId)
          co <- priorLabels(s, s"$outDir/core", batchId)
          an <- priorLabels(s, s"$outDir/anchors", batchId)
          la <- priorLabels(s, s"$outDir/labels", batchId)
        } yield graft.ops.Density.DbscanState(sc, co, an, la)
        val st = prior match {
          case Some(base) =>
            graft.ops.Density.incrementalState(base, batch, eps, minPts)
          case None => graft.ops.Density.solve(batch, eps, minPts)
        }
        st.scored.write.mode("overwrite")
          .parquet(s"$outDir/scored/batch=$batchId")
        st.coreLabels.write.mode("overwrite")
          .parquet(s"$outDir/core/batch=$batchId")
        st.anchorPairs.write.mode("overwrite")
          .parquet(s"$outDir/anchors/batch=$batchId")
        st.labels.write.mode("overwrite")
          .parquet(s"$outDir/labels/batch=$batchId")
        ()
      }
      .start()
  }

  /** Drive [[dbscanStart]] over a finite source; returns the final
    * labelling (id, x, y, is_core, cluster). */
  def dbscanBatches(s: SparkSession, src: DataFrame, eps: Long,
      minPts: Long, outDir: String): DataFrame = {
    val q = dbscanStart(s, src, eps, minPts, outDir)
    try q.processAllAvailable()
    finally q.stop()
    priorLabels(s, s"$outDir/labels", Long.MaxValue)
      .getOrElse(s.emptyDataFrame)
  }

  /** Streaming ANN SERVING: micro-batches of query vectors answered
    * against a STATIC corpus by the per-partition HNSW index
    * ([[graft.ops.Vectors.knnHnsw]]: index built per corpus partition
    * inside the batch job, queries broadcast, candidates merged through
    * the bounded TopK aggregator) — the dual of
    * [[minhashIncrementalStart]], where the corpus grows and the
    * queries are the state; here the corpus is fixed and the query
    * stream is unbounded, so there is NO streaming state at all.
    * Per-batch results land in idempotent overwrite dirs (a micro-batch
    * retry rewrites its own dir — the [[incrementalDedupStart]]
    * discipline); the return value reads the accumulated answers back.
    * A long-lived server would persist `corpus` so the index inputs
    * are not re-scanned per batch — callers own that choice. */
  def knnServeBatches(s: SparkSession, queries: DataFrame,
      corpus: DataFrame, k: Int, outDir: String): DataFrame = {
    val q = queries.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.ops.Vectors.knnHnsw(batch, corpus, k)
          .write.mode("overwrite").parquet(s"$outDir/batch=$batchId")
        ()
      }
      .start()
    try q.processAllAvailable()
    finally q.stop()
    s.read.parquet(outDir).drop("batch")
  }

  /** Streaming exact-dedup: dropDuplicatesWithinWatermark on event_id.
    * Returns the deduped count table (memory sink, append). */
  def streamingDedupCount(s: SparkSession, dir: String): DataFrame = {
    val src = eventsStream(s, dir)
    val deduped = src
      .withColumn("ts_utc", timestamp_micros(expr("ts div 1000")))
      .withWatermark("ts_utc", "2 hours")
      .dropDuplicatesWithinWatermark("event_id")
    runToTable(s, deduped, "st_dedup_mem", "append")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_unique"))
      .orderBy(col("event_type"))
  }
}
