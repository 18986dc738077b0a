package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Structured Streaming twins of the batch event operators (SURVEY
  * §2.12 — absent from the reference; engine addition). File source →
  * event-time window aggregation with watermark → memory sink; the
  * memory sink + processAllAvailable makes a finite parquet drive the
  * streaming query synchronously (local smoke), while the same plan
  * runs unbounded on a real source.
  */
object StreamOps {

  /** events schema with ts as raw nanos (see queries.Events). */
  val eventsSchema: StructType = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", LongType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  /** Streaming events source with `ts` as raw nanos. Like
    * [[graft.queries.Events.load]]: the nanosAsLong conf is asserted
    * (set by every session builder in this repo at construction), not
    * mutated — a query function never side-effects shared session conf. */
  private def eventsStream(s: SparkSession, dir: String): DataFrame = {
    require(
      s.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") == "true",
      "streaming events queries need spark.sql.legacy.parquet.nanosAsLong=true at session construction")
    s.readStream.schema(eventsSchema)
      .option("pathGlobFilter", "events.parquet").parquet(dir)
  }

  /** Drain a finite streaming aggregate into its memory-sink table.
    * `processAllAvailable` makes any bounded source (file, MemoryStream)
    * drive the query synchronously; the same plan runs unbounded on a
    * real source. */
  private def runToTable(
      s: SparkSession, agg: DataFrame, sink: String, mode: String): DataFrame = {
    val q = agg.writeStream
      .outputMode(mode)
      .format("memory")
      .queryName(sink)
      .start()
    try q.processAllAvailable()
    finally q.stop()
    s.table(sink)
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
    * final batch result table. */
  def tumblingCounts(s: SparkSession, dir: String): DataFrame =
    tumblingFrom(s, eventsStream(s, dir), "st_tumbling_mem")

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
