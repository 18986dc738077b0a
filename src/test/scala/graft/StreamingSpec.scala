package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.queries.Events
import graft.streaming.StreamOps

/** Streaming/batch parity on the finite events feed. */
class StreamingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("streaming sketch state is the SKETCH, not the data: one row for " +
      "AMS, one digest per type for t-digest") {
    StreamOps.amsBitSums(spark, TestSpark.Sf, sink = "st_ams_state_probe")
      .collect()
    assert(StreamOps.lastStateRows.contains(1L),
      s"AMS global agg must hold exactly one state row: ${StreamOps.lastStateRows}")
    val types = Events.load(spark, TestSpark.Sf)
      .select("event_type").distinct().count()
    StreamOps.tdigestValueQuantiles(spark, TestSpark.Sf,
      sink = "st_td_state_probe").collect()
    assert(StreamOps.lastStateRows.contains(types),
      s"t-digest agg must hold one digest per type ($types): ${StreamOps.lastStateRows}")
  }

  test("streaming HLL registers: state bounded by m x types, equals batch registers") {
    import graft.ops.Hll
    val streamed = StreamOps.hllUserDayRegisters(spark, TestSpark.Sf,
      sink = "st_hll_state_probe")
    val types = Events.load(spark, TestSpark.Sf)
      .select("event_type").distinct().count()
    val state = StreamOps.lastStateRows
    assert(state.exists(n => n > 0 && n <= Hll.m * types),
      s"HLL state must be <= m*types (${Hll.m * types}): $state")
    // cross-batch max-merge == one-shot batch registers, bit for bit
    val batch = Hll.registers(
      Events.load(spark, TestSpark.Sf).select($"event_type",
        concat($"user_id".cast("string"), lit("|"),
          date_format(timestamp_micros(expr("ts div 1000")), "yyyy-MM-dd"))
          .as("user_day")),
      Seq("event_type"), $"user_day")
    assert(streamed.except(batch).isEmpty && batch.except(streamed).isEmpty,
      "streamed registers != batch registers")
  }

  test("streaming tumbling counts == batch tumbling counts") {
    val streamed = StreamOps.tumblingCounts(spark, TestSpark.Sf)
      .as[(String, String, Long)].collect().toSet
    val batch = Events.qTumbling.fn(spark, TestSpark.Sf)
      .select("window_start", "event_type", "n_events")
      .as[(String, String, Long)].collect().toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("append-mode KS counts: closed days emitted once, state evicted " +
      "to the open suffix (two-batch MemoryStream)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rows = Events.load(spark, TestSpark.Sf)
      .selectExpr("event_id", "ts", "user_id", "event_type", "value", "props")
      .as[(Long, Long, Long, String, Double, String)].collect().toSeq
      .sortBy(_._2)
    // two micro-batches so eviction happens MID-STREAM, not just at end
    val (early, late) = rows.splitAt(rows.length / 2)
    val ms = MemoryStream[(Long, Long, Long, String, Double, String)]
    ms.addData(early)
    ms.addData(late)
    val src = ms.toDF()
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = StreamOps.dailyValueCountsAppendFrom(spark, src, "st_ks_append_msrc")
      .as[(String, String, Double, Long)].collect()
    // exactly-once emission of closed days: no (day,type,v) key twice
    // (a re-emission after batch-2 updates would double-count the key)
    assert(got.length == got.map(r => (r._1, r._2, r._3)).distinct.length,
      "append mode re-emitted a closed window")
    // the emitted set is the closed-day prefix: day end <= max_ts - 1d
    val dayUs = 86400L * 1000 * 1000
    val maxUs = rows.map(_._2 / 1000).max
    val wmUs = (maxUs / 1000 - 86400000L) * 1000 // watermark is whole ms
    val expect = rows
      .map(r => ((r._2 / 1000) / dayUs, r._4,
        BigDecimal(r._5).setScale(1, BigDecimal.RoundingMode.HALF_UP).toDouble))
      .groupBy(identity).view.mapValues(_.size.toLong)
      .filter { case ((day, _, _), _) => (day + 1) * dayUs <= wmUs }
      .map { case ((day, t, v), n) =>
        (java.time.LocalDate.ofEpochDay(day).toString, t, v, n) }
      .toSet
    assert(got.toSet == expect, s"closed-day prefix mismatch: " +
      s"got ${got.length} rows, expected ${expect.size}")
    // EVICTION pin: final state holds only the OPEN days' groups — the
    // whole point of the append twin; complete mode would retain every
    // (day,type,v) group ever seen
    val openGroups = rows
      .map(r => ((r._2 / 1000) / dayUs, r._4,
        BigDecimal(r._5).setScale(1, BigDecimal.RoundingMode.HALF_UP).toDouble))
      .distinct.count { case (day, _, _) => (day + 1) * dayUs > wmUs }
    val allGroups = rows
      .map(r => ((r._2 / 1000) / dayUs, r._4,
        BigDecimal(r._5).setScale(1, BigDecimal.RoundingMode.HALF_UP).toDouble))
      .distinct.size
    val state = StreamOps.lastStateRows
    assert(state.exists(_ == openGroups.toLong),
      s"state must hold exactly the open-day groups ($openGroups of " +
        s"$allGroups total), got $state")
  }

  test("append-mode rate-anomaly monitor: alerts only on CLOSED hours, " +
      "state evicted to the open set") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val hourNs = 3600L * 1000 * 1000 * 1000
    // type "a": 24 baseline hours alternating 10/11 events (variance > 0
    // so the z-denominator is live), then a 100-event spike in hour 24;
    // a single type-"b" sentinel in hour 26 drives the watermark to
    // hour 25, closing hours 0..24 and leaving hour 26 open.
    val rows = (0 until 25).flatMap { h =>
      val n = if (h == 24) 100 else if (h % 2 == 0) 10 else 11
      (0 until n).map(i =>
        (h * 100L + i, h * hourNs + i * 1000L, 1L, "a", 1.0, "{}"))
    } :+ (9999L, 26 * hourNs, 2L, "b", 1.0, "{}")
    val ms = MemoryStream[(Long, Long, Long, String, Double, String)]
    ms.addData(rows)
    val src = ms.toDF()
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val closed = StreamOps.tumblingAppendFrom(spark, src,
      sink = "st_rate_anom_msrc")
    // head: exactly the closed hours 0..24 of type a, hour 26 withheld
    assert(closed.count() == 25L,
      s"closed-hour rows: ${closed.count()} (hour 26 must stay open)")
    // EVICTION pin: state holds only the open groups — the hour-26 "b"
    // window; complete mode would retain all 26 (hour, type) groups
    assert(StreamOps.lastStateRows.contains(1L),
      s"state must hold exactly the open hour-26 group: ${StreamOps.lastStateRows}")
    // tail: the monitor alerts exactly once, on the spike hour, with the
    // baseline mean of the 24 closed predecessors
    val alerts = Events.rateAnomalyOverCounts(
        closed.select($"window_start", $"event_type", $"n_events"))
      .as[(String, String, Long, Double, Double)].collect().toList
    assert(alerts.map(a => (a._1, a._2, a._3, a._4)) ==
      List(("1970-01-02 00:00:00", "a", 100L, 10.5)),
      s"exactly the hour-24 spike must alert: $alerts")
    assert(alerts.head._5 > 100.0, s"spike z-score: ${alerts.head._5}")
  }

  test("append-mode session windows: cross-batch sessions MERGE, closed " +
      "sessions emit once, state evicted to the open set") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val minNs = 60L * 1000 * 1000 * 1000
    def ev(id: Long, tMin: Long, user: Long) =
      (id, tMin * minNs, user, "click", 1.0, "{}")
    val ms = MemoryStream[(Long, Long, Long, String, Double, String)]
    val src = ms.toDF()
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val q = StreamOps.sessionAppendAgg(src).writeStream
      .outputMode("append").format("memory").queryName("st_sess_msrc").start()
    try {
      // batch 1: u1 opens a session (0,10min); u2 a singleton at 5min
      ms.addData(Seq(ev(1, 0, 1), ev(2, 10, 1), ev(3, 5, 2)))
      q.processAllAvailable()
      // batch 2: u1 extends the SAME session (20min < 10+30 gap) — the
      // state store must merge, not open a second window; u3 opens near
      // the new max (290min) and stays open; u99 at 300min drives the
      // watermark to 270min, closing u1/u2 but not u3/u99
      ms.addData(Seq(ev(4, 20, 1), ev(5, 290, 3), ev(6, 300, 99)))
      q.processAllAvailable()
      val got = spark.table("st_sess_msrc")
        .select($"user_id",
          org.apache.spark.sql.functions.unix_micros($"session_window.start"),
          org.apache.spark.sql.functions.unix_micros($"session_window.end"),
          $"n_events")
        .as[(Long, Long, Long, Long)].collect().toSet
      val minUs = 60L * 1000 * 1000
      assert(got == Set(
        (1L, 0L, 50 * minUs, 3L), // merged across batches: 0,10 + 20
        (2L, 5 * minUs, 35 * minUs, 1L)),
        s"closed-session set wrong: $got")
      // state holds exactly the two OPEN sessions (u3, u99)
      val state = Option(q.lastProgress)
        .map(_.stateOperators.map(_.numRowsTotal).sum)
      assert(state.contains(2L), s"open-session state rows: $state")
    } finally q.stop()
  }

  test("append mode DROPS late rows (never misfiles them) and reports the count") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dayUs = 86400L * 1000 * 1000
    def ev(id: Long, dayOffUs: Long, typ: String): (Long, Long, Long, String, Double, String) =
      (id, dayOffUs * 1000, id, typ, 1.0, "{}") // ts raw nanos
    // batch 1 establishes the watermark at day 9 (max day10 − 1d);
    // batch 2 sends one row 7 days LATE (day 2) + one fresh (day 10).
    // Explicit processAllAvailable per add: one call over pre-queued
    // data would fold both adds into a single batch where nothing is
    // late yet.
    val ms = MemoryStream[(Long, Long, Long, String, Double, String)]
    val src = ms.toDF()
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val q = StreamOps.dailyValueCountsAgg(src).writeStream
      .outputMode("append").format("memory").queryName("st_late_msrc").start()
    try {
      ms.addData(Seq(ev(1, 2 * dayUs, "click"), ev(2, 10 * dayUs, "click")))
      q.processAllAvailable()
      ms.addData(Seq(ev(3, 2 * dayUs + 1, "click"), ev(4, 10 * dayUs + 1, "click")))
      q.processAllAvailable()
      val got = spark.table("st_late_msrc")
        .select(org.apache.spark.sql.functions.date_format(
            $"window.start", "yyyy-MM-dd"), $"event_type", $"v", $"cnt")
        .as[(String, String, Double, Long)].collect().toSet
      // day 2's count must be 1 (batch-1 row only): the late twin was
      // dropped at the gate, NOT added to an already-emitted window and
      // NOT emitted as a duplicate row
      assert(got == Set(("1970-01-03", "click", 1.0, 1L)),
        s"late row must not re-open or duplicate the closed day: $got")
      val dropped = q.recentProgress
        .flatMap(_.stateOperators.map(_.numRowsDroppedByWatermark)).sum
      assert(dropped >= 1L, s"watermark drop must be observable: $dropped")
    } finally q.stop()
  }

  test("outer stream-stream join: cross-batch match suppresses the null row; " +
      "only sealed unmatched clicks emit null") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val minUs = 60L * 1000 * 1000
    def ev(id: Long, tMinUs: Long, typ: String, user: Long) =
      (id, tMinUs * 1000, user, typ, 1.0, "{}")
    val mc = MemoryStream[(Long, Long, Long, String, Double, String)]
    val mv = MemoryStream[(Long, Long, Long, String, Double, String)]
    def src(ms: MemoryStream[(Long, Long, Long, String, Double, String)]) =
      ms.toDF().toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val table = "st_cv_outer_msrc"
    // drive the op's join shape with explicit micro-batch boundaries
    // (clickViewOuterFrom runs its own processAllAvailable, which would
    // fold the staged adds into one batch — restate the same plan and
    // start the sink manually, as the append-KS eviction test does).
    // batch 1: click u1 @ t=100min (its view comes LATER); click u2
    // @ t=10min (never matched; sealed once wm passes it)
    mc.addData(Seq(ev(1, 100 * minUs, "click", 1), ev(2, 10 * minUs, "click", 2)))
    mv.addData(Seq(ev(90, 95 * minUs, "view", 9))) // unrelated user
    val sq = {
      val clicks = src(mc); val views = src(mv)
      def side(df: org.apache.spark.sql.DataFrame, typ: String, pfx: String) = {
        import org.apache.spark.sql.functions._
        df.filter(col("event_type") === typ)
          .withColumn(s"${pfx}_ts",
            timestamp_micros(org.apache.spark.sql.functions.expr("ts div 1000")))
          .withWatermark(s"${pfx}_ts", "1 hour")
          .select(col("event_id").as(s"${pfx}_id"),
            col("user_id").as(s"${pfx}_user"), col(s"${pfx}_ts"))
      }
      import org.apache.spark.sql.functions._
      side(clicks, "click", "click")
        .join(side(views, "view", "view"), expr(
          """click_user = view_user AND
            |view_ts >= click_ts - INTERVAL 10 MINUTES AND
            |view_ts <= click_ts""".stripMargin), "left_outer")
        .select(col("click_id"), col("view_id"))
        .writeStream.outputMode("append").format("memory")
        .queryName(table).start()
    }
    try {
      sq.processAllAvailable()
      // batch 2: the matching view for click 1 (same batch-time window),
      // plus a far-future view that pushes the watermark past click 2
      mv.addData(Seq(ev(91, 96 * minUs, "view", 1),
        ev(92, 300 * minUs, "view", 9))) // user 9: advances wm, matches nothing
      mc.addData(Seq(ev(3, 300 * minUs, "click", 3)))
      sq.processAllAvailable()
      val got = spark.table(table)
        .collect().map(r => (r.getLong(0), Option(r.get(1)))).toSet
      // click 1 matched across batches: pair emitted, NO null row
      assert(got.contains((1L, Some(91L))), s"cross-batch match lost: $got")
      assert(!got.contains((1L, None)),
        s"matched click must not also emit null-extended: $got")
      // click 2 sealed (wm = 300min - 60min >> 10min): null row emitted
      assert(got.contains((2L, None)), s"sealed unmatched click missing: $got")
      // click 3 is in the open tail: nothing emitted for it yet
      assert(!got.exists(_._1 == 3L), s"open-tail click leaked: $got")
    } finally sq.stop()
  }

  test("stateful sessionization (flatMapGroupsWithState) matches batch sessions") {
    val emitted = StreamOps.statefulSessions(spark, TestSpark.Sf)
      .as[(Long, Long, Long, Long)].collect().toSet

    // Batch-side expectation, sessionized in plain Scala.
    val gapUs = 1800L * 1000 * 1000
    val evs = Events.load(spark, TestSpark.Sf)
      .selectExpr("user_id", "ts div 1000 as ts_us")
      .as[(Long, Long)].collect()
    val maxTs = evs.map(_._2).max
    val all = evs.groupBy(_._1).flatMap { case (u, rows) =>
      val ts = rows.map(_._2).sorted
      val sessions = scala.collection.mutable.ArrayBuffer[(Long, Long, Long, Long)]()
      var start = ts.head; var end = ts.head; var n = 1L
      for (t <- ts.tail) {
        if (t - end > gapUs) { sessions += ((u, start, end, n)); start = t; end = t; n = 1 }
        else { end = t; n += 1 }
      }
      sessions += ((u, start, end, n))
      sessions.map(s => (s, s == sessions.last))
    }.toSeq
    val allSet = all.map(_._1).toSet
    // non-last sessions close in-batch; last sessions only when the
    // final watermark (maxTs - 30min) passes their 30min timeout.
    val certain = all.collect {
      case (s, false) => s
      case (s, true) if s._3 < maxTs - 2 * gapUs - 1000000L => s
    }.toSet
    assert(emitted.subsetOf(allSet), "emitted sessions must be real sessions")
    assert(certain.subsetOf(emitted), "all watermark-closed sessions must emit")
    assert(emitted.nonEmpty)
  }

  test("non-file source: MemoryStream twins of tumbling + sessions match the file-source runs") {
    // Same plans, different source (VERDICT r3 task 4): feed the events
    // rows through an in-memory streaming source — the unbounded-source
    // shape (file/Kafka/rate) — and require bit-identical results to the
    // file-source twins above.
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rows = Events.load(spark, TestSpark.Sf)
      .selectExpr("event_id", "ts", "user_id", "event_type", "value", "props")
      .as[(Long, Long, Long, String, Double, String)].collect().toSeq

    val msT = MemoryStream[(Long, Long, Long, String, Double, String)]
    msT.addData(rows)
    val srcT = msT.toDF()
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val gotT = StreamOps.tumblingFrom(spark, srcT, "st_tumbling_msrc")
      .as[(String, String, Long)].collect().toSet
    val fileT = StreamOps.tumblingCounts(spark, TestSpark.Sf)
      .as[(String, String, Long)].collect().toSet
    assert(gotT == fileT)
    assert(gotT.nonEmpty)

    val msS = MemoryStream[(Long, Long, Long, String, Double, String)]
    msS.addData(rows)
    val srcS = msS.toDF()
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val gotS = StreamOps.sessionsFrom(spark, srcS, "st_sessions_msrc")
      .as[(Long, Long, Long, Long)].collect().toSet
    val fileS = StreamOps.statefulSessions(spark, TestSpark.Sf)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(gotS == fileS)
    assert(gotS.nonEmpty)
  }

  test("streaming entry/exit: two-batch feed equals file run; state stays per-user") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rows = Events.load(spark, TestSpark.Sf)
      .selectExpr("event_id", "ts", "user_id", "event_type", "value", "props")
      .as[(Long, Long, Long, String, Double, String)].collect().toSeq
    // split mid-stream: sessions spanning the boundary must be stitched
    // from state (start/entry survive batch 1; end/exit updated in 2)
    val (early, late) = rows.sortBy(_._2).splitAt(rows.length / 2)
    val ms = MemoryStream[(Long, Long, Long, String, Double, String)]
    ms.addData(early)
    ms.addData(late)
    val src = ms.toDF()
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = StreamOps.entryExitFrom(spark, src, "st_ee_msrc")
      .as[(Long, Long, String, String, Long)].collect().toSet
    val file = StreamOps.statefulEntryExit(spark, TestSpark.Sf)
      .as[(Long, Long, String, String, Long)].collect().toSet
    assert(got == file,
      "boundary-spanning sessions must close with batch-equal entry/exit")
    assert(got.nonEmpty)
    // state-bound pin: one fixed-width session tuple per user — the
    // exit label overwrites, nothing accumulates per-event
    val users = rows.map(_._3).distinct.size
    val stateRows = StreamOps.lastStateRows
    assert(stateRows.exists(_ <= users),
      s"entry/exit state must be <= $users (one row per user), got $stateRows")
  }

  test("streaming attribution: purchases attribute batch-1 touches from state") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rows = Events.load(spark, TestSpark.Sf)
      .selectExpr("event_id", "ts", "user_id", "event_type", "value", "props")
      .as[(Long, Long, Long, String, Double, String)].collect().toSeq
    // split mid-stream: purchases in batch 2 must see batch-1 touches
    // through the per-user 7-day buffer, not just in-batch ones
    val (early, late) = rows.sortBy(_._2).splitAt(rows.length / 2)
    val ms = MemoryStream[(Long, Long, Long, String, Double, String)]
    ms.addData(early)
    ms.addData(late)
    val src = ms.toDF()
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = StreamOps.attributionFrom(spark, src, "st_attr_msrc")
      .groupBy($"model", $"touch_type")
      .agg(org.apache.spark.sql.functions.sum($"credit").as("c"),
        org.apache.spark.sql.functions.count($"credit").as("n"))
      .as[(String, String, Long, Long)].collect().toSet
    val file = StreamOps.statefulAttribution(spark, TestSpark.Sf)
      .groupBy($"model", $"touch_type")
      .agg(org.apache.spark.sql.functions.sum($"credit").as("c"),
        org.apache.spark.sql.functions.count($"credit").as("n"))
      .as[(String, String, Long, Long)].collect().toSet
    assert(got == file,
      "two-batch credits must equal the single-batch run exactly")
    assert(got.nonEmpty)
    // state bound: one touch-buffer row per user (the buffer itself is
    // rate×lookback bounded inside the row)
    val users = rows.map(_._3).distinct.size
    val stateRows = StreamOps.lastStateRows
    assert(stateRows.exists(_ <= users),
      s"attribution state must be <= $users rows, got $stateRows")
  }

  test("checkpoint restart: stateful stream resumes exactly-once across a stop") {
    // The production fault-tolerance contract the memory-sink smoke
    // tests can't show: a REAL checkpointLocation + a replayable file
    // sink, the query stopped cold between batches, a NEW query
    // restarted from the same checkpoint — emitted transitions must
    // equal the uninterrupted run exactly (no loss from the stop, no
    // dupes from the replay, per-user state recovered from the store).
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val base = java.nio.file.Files
      .createTempDirectory("graft_restart").toString
    val ckpt = s"$base/ckpt"
    val out = s"$base/out"
    val rows = Events.load(spark, TestSpark.Sf)
      .selectExpr("event_id", "ts", "user_id", "event_type", "value", "props")
      .as[(Long, Long, Long, String, Double, String)].collect().toSeq
    val (early, late) = rows.sortBy(_._2).splitAt(rows.length / 2)
    val ms = MemoryStream[(Long, Long, Long, String, Double, String)]
    def stream() = StreamOps.markovPairsStream(spark, ms.toDF()
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
    def run(): Unit = {
      val q = stream().writeStream
        .outputMode("append").format("parquet")
        .option("checkpointLocation", ckpt).option("path", out)
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    ms.addData(early)
    run() // batch 1, then the query stops cold
    ms.addData(late)
    run() // fresh query instance resumes from the checkpoint
    val resumed = spark.read.parquet(out)
      .as[(Long, String, String)].collect()
    val single = StreamOps.markovPairsFrom(spark, {
      val ms2 = MemoryStream[(Long, Long, Long, String, Double, String)]
      ms2.addData(rows)
      ms2.toDF().toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    }, "st_restart_ref")
      .select($"user_id", $"cur", $"nxt")
      .as[(Long, String, String)].collect()
    // multiset equality: same transition may legitimately repeat
    def ms3(x: Seq[(Long, String, String)]) =
      x.groupBy(identity).view.mapValues(_.size).toMap
    assert(ms3(resumed.toSeq) == ms3(single.toSeq),
      "restart run must equal the uninterrupted run exactly once")
    assert(resumed.nonEmpty)
  }

  test("non-file source: MemoryStream stream-stream interval join matches the file-source run") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rows = Events.load(spark, TestSpark.Sf)
      .selectExpr("event_id", "ts", "user_id", "event_type", "value", "props")
      .as[(Long, Long, Long, String, Double, String)].collect().toSeq
    def memSrc(): org.apache.spark.sql.DataFrame = {
      val ms = MemoryStream[(Long, Long, Long, String, Double, String)]
      ms.addData(rows)
      ms.toDF().toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    }
    val got = StreamOps.clickViewJoinFrom(spark, memSrc(), memSrc(), "st_cv_msrc")
      .as[(Long, Long, Long, Long)].collect().toSet
    val file = StreamOps.clickViewJoin(spark, TestSpark.Sf)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == file)
    assert(got.nonEmpty)
  }

  test("streaming dedup-within-watermark preserves unique event counts") {
    val got = StreamOps.streamingDedupCount(spark, TestSpark.Sf)
      .as[(String, Long)].collect().toMap
    val batch = Events.load(spark, TestSpark.Sf)
      .groupBy("event_type").count()
      .as[(String, Long)].collect().toMap
    assert(got == batch)
  }

  test("streaming as-of: two-batch event-time-ordered feed equals the file-source run") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rows = Events.load(spark, TestSpark.Sf)
      .selectExpr("event_id", "ts", "user_id", "event_type", "value", "props")
      .as[(Long, Long, Long, String, Double, String)].collect().toSeq
    // feed contract: a global event-time split is per-user ordered too
    val cut = rows.map(_._2).sorted.apply(rows.size / 2)
    val (batch0, batch1) = rows.partition(_._2 < cut)
    val ms = MemoryStream[(Long, Long, Long, String, Double, String)]
    val src = ms.toDF()
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val q = StreamOps.asofStreamFrame(spark, src).writeStream
      .outputMode("append").format("memory").queryName("st_asof_msrc").start()
    try {
      ms.addData(batch0)
      q.processAllAvailable()
      ms.addData(batch1) // purchases here must see batch-0 clicks via STATE
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("st_asof_msrc")
      .as[(Long, Long, Option[Long])].collect().toSet
    val file = StreamOps.asofLastClick(spark, TestSpark.Sf)
      .as[(Long, Long, Option[Long])].collect().toSet
    assert(got == file)
    assert(got.nonEmpty)
    // the state actually carried: some batch-1 purchase's last click is
    // a batch-0 click (strictly before the cut)
    assert(got.exists { case (_, _, lc) => lc.exists(_ < cut / 1000) })
  }

  test("foreachBatch incremental dedup: cross-batch state, first-win, idempotent dirs") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val outDir = java.nio.file.Files
      .createTempDirectory("graft_incdedup").toString
    val ms = MemoryStream[(Long, String)]
    val q = StreamOps.incrementalDedupStart(
      spark, ms.toDF().toDF("doc_id", "text"), "doc_id", "text", outDir)
    try {
      // batch 0: in-batch duplicate (ids 2,3 same text) → min id 2 wins
      ms.addData(Seq((1L, "alpha"), (2L, "beta"), (3L, "beta")))
      q.processAllAvailable()
      // batch 1: cross-batch duplicate ("alpha" again, new id) must be
      // dropped by the STATE, not by in-batch logic; "gamma" is new
      ms.addData(Seq((10L, "alpha"), (11L, "gamma")))
      q.processAllAvailable()
      // batch 2: everything seen before → zero survivors
      ms.addData(Seq((20L, "beta"), (21L, "gamma")))
      q.processAllAvailable()
    } finally q.stop()
    val got = StreamOps.incrementalDedupResult(spark, outDir)
      .select($"doc_id", $"text").as[(Long, String)].collect().toSet
    assert(got == Set((1L, "alpha"), (2L, "beta"), (11L, "gamma")))
    // == global batch dedup of the full feed (keep-min per content)
    val all = Seq((1L, "alpha"), (2L, "beta"), (3L, "beta"),
      (10L, "alpha"), (11L, "gamma"), (20L, "beta"), (21L, "gamma"))
    val expect = all.groupBy(_._2).map { case (_, g) => g.minBy(_._1) }.toSet
    assert(got == expect)
  }

  test("streaming funnel mins: out-of-order cross-batch arrival is irrelevant") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // (user, type, tus): user 1 converts fully; user 2's click precedes
    // their first view (level 1 under strict-mins semantics); user 3
    // views only. Delivered in REVERSE time order split across batches —
    // the min-per-(user, type) state must not care.
    val events = Seq(
      (1L, "view", 100L), (1L, "click", 200L), (1L, "purchase", 300L),
      (2L, "click", 50L), (2L, "view", 80L), (2L, "purchase", 400L),
      (3L, "view", 10L))
    val ms = MemoryStream[(Long, String, Long)]
    ms.addData(events.sortBy(-_._3).take(3)) // latest events first
    ms.addData(events.sortBy(-_._3).drop(3))
    val mins = graft.streaming.StreamOps.funnelMinsFrom(
      spark, ms.toDF().toDF("user_id", "event_type", "tus"), "st_fm_mem")
    val got = mins.as[(Long, String, Long)].collect().toSet
    val expect = events.groupBy(e => (e._1, e._2))
      .map { case ((u, t), g) => (u, t, g.map(_._3).min) }.toSet
    assert(got == expect)
    // level math over the state: 1→3 (ordered chain), 2→1 (click
    // before first view breaks the chain), 3→1
    val lv = got.groupBy(_._1).map { case (u, rows) =>
      val m = rows.map(r => r._2 -> r._3).toMap
      val tv = m.get("view"); val tc = m.get("click"); val tp = m.get("purchase")
      u -> ((tv, tc, tp) match {
        case (Some(v), Some(c), Some(p)) if v < c && c < p => 3
        case (Some(v), Some(c), _) if v < c => 2
        case (Some(_), _, _) => 1
        case _ => 0
      })
    }
    assert(lv == Map(1L -> 3, 2L -> 1, 3L -> 1))
  }

  test("streaming bm25 index: multi-batch accumulation equals one-shot ranking") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val indexDir = java.nio.file.Files
      .createTempDirectory("graft_st_bm25_mem").toString
    val docs = spark.read.parquet(s"${TestSpark.Sf}/documents.parquet")
      .select($"doc_id", $"text").as[(Long, String)].collect().toSeq
    val (b0, b1) = docs.partition(_._1 % 2 == 0)
    val ms = MemoryStream[(Long, String)]
    val q = graft.streaming.StreamOps.bm25IndexStart(
      spark, ms.toDF().toDF("doc_id", "text"), "doc_id", "text", indexDir)
    try {
      ms.addData(b0); q.processAllAvailable()
      ms.addData(b1); q.processAllAvailable()
    } finally q.stop()
    val (tf, dl, df, stats) =
      graft.streaming.StreamOps.bm25IndexFrames(spark, indexDir)
    val got = graft.queries.Retrieval.scoreIndex(spark, tf, dl, df, stats)
      .as[(Long, Long, Long, Double)].collect().toSeq
    val direct = SparkEntry.queries("d_bm25_topk")(spark, TestSpark.Sf)
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(got == direct)
    assert(got.nonEmpty)
  }

  test("streaming media quarantine: multi-batch counts equal the one-shot rollup") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ids = spark.read.parquet(s"${TestSpark.Sf}/documents.parquet")
      .filter($"doc_id" % 20 === 10).select($"doc_id").as[Long]
      .collect().toSeq
    // split so both batches carry a mix of clean and quarantined classes
    val (b0, b1) = ids.partition(_ % 40 == 10)
    assert(b0.nonEmpty && b1.nonEmpty)
    def rollup(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
      graft.ops.Multimodal.robustDecodeHash(
        graft.ops.Multimodal.syntheticRobustJpegBlobs(
          df.select($"doc_id").as[java.lang.Long])).toDF()
        .groupBy($"status", $"reason").agg(count(lit(1)).as("n_docs"))
    val ms = MemoryStream[Long]
    val q = rollup(ms.toDF().toDF("doc_id")).writeStream
      .outputMode("complete").format("memory")
      .queryName("st_media_q_twin").start()
    try {
      ms.addData(b0); q.processAllAvailable()
      ms.addData(b1); q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("st_media_q_twin")
      .as[(String, String, Long)].collect().toSet
    val direct = rollup(
      spark.read.parquet(s"${TestSpark.Sf}/documents.parquet")
        .filter($"doc_id" % 20 === 10))
      .as[(String, String, Long)].collect().toSet
    assert(got == direct)
    assert(got.exists(_._1 == "quarantined"),
      "the corpus must exercise the quarantine path")
    assert(got.exists(_._1 == "ok"))
  }

  test("streaming minhash: multi-batch accumulation equals one-shot pair set") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val outDir = java.nio.file.Files
      .createTempDirectory("graft_st_mh_mem").toString
    val docs = spark.read.parquet(s"${TestSpark.Sf}/documents.parquet")
      .select($"doc_id", $"text").as[(Long, String)].collect().toSeq
    val (batch1, batch0) = docs.partition(_._1 % 10 == 0)
    val ms = MemoryStream[(Long, String)]
    val q = graft.streaming.StreamOps.minhashIncrementalStart(
      spark, ms.toDF().toDF("doc_id", "text"), "doc_id", "text", outDir)
    try {
      ms.addData(batch0) // the accumulated "corpus"
      q.processAllAvailable()
      ms.addData(batch1) // the increment: cross-batch pairs need STATE
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.read.parquet(s"$outDir/pairs")
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    val oneShot = graft.ops.MinHash.candidatePairs(
        spark.read.parquet(s"${TestSpark.Sf}/documents.parquet"),
        "doc_id", "text", shingleSize = 3, numPerm = 32, bands = 8,
        threshold = 0.5)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(got == oneShot)
    // cross-batch pairs exist (the state path actually fired)
    assert(got.exists { case (a, b) => (a % 10 == 0) != (b % 10 == 0) })
  }

  test("streaming ANN serving: two-batch query feed equals one-shot exact top-k") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val outDir = java.nio.file.Files
      .createTempDirectory("graft_st_knn_mem").toString
    val emb = spark.read.parquet(s"${TestSpark.Sf}/embeddings.parquet")
      .select($"vec_id".as("id"), $"embedding".as("vec"))
    val queries = emb.filter($"id" % 25 === 3)
      .as[(Long, Array[Float])].collect().toSeq
    val (b0, b1) = queries.partition(_._1 < 250)
    val ms = MemoryStream[(Long, Array[Float])]
    ms.addData(b0)
    ms.addData(b1) // two micro-batches; answers accumulate per-batch
    val got = graft.streaming.StreamOps.knnServeBatches(
        spark, ms.toDF().toDF("id", "vec"), emb, 5, outDir)
      .select($"qid", $"rk", $"cid").as[(Long, Long, Long)].collect().toSet
    val exact = graft.ops.Vectors.knnBrute(
        emb.filter($"id" % 25 === 3), emb, 5)
      .select($"qid", $"rk", $"cid").as[(Long, Long, Long)].collect().toSet
    assert(got == exact,
      "served answers must equal exact top-5 (HNSW exhaustive at this scale)")
    assert(got.map(_._1) == queries.map(_._1).toSet,
      "every streamed query answered exactly once across batches")
  }

  test("streaming incremental clustering: three-batch merge equals one-shot clusters") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val outDir = java.nio.file.Files
      .createTempDirectory("graft_st_cc_mem").toString
    val docs = spark.read.parquet(s"${TestSpark.Sf}/documents.parquet")
      .select($"doc_id", $"text").as[(Long, String)].collect().toSeq
    val slices = docs.groupBy(d => (d._1 % 3).toInt)
    val ms = MemoryStream[(Long, String)]
    val q = graft.streaming.StreamOps.clustersIncrementalStart(
      spark, ms.toDF().toDF("doc_id", "text"), "doc_id", "text", outDir)
    try (0 to 2).foreach { i =>
      ms.addData(slices(i)) // cross-batch merges need BOTH stores
      q.processAllAvailable()
    } finally q.stop()
    val labelDirs = new java.io.File(s"$outDir/labels").listFiles()
      .filter(_.getName.startsWith("batch=")).map(_.toString).sorted
    val got = spark.read.parquet(labelDirs.last)
      .as[(Long, Long)].collect().toMap
    val oneShot = graft.ops.MinHash.clusters(graft.ops.MinHash.candidatePairs(
        spark.read.parquet(s"${TestSpark.Sf}/documents.parquet"),
        "doc_id", "text", shingleSize = 3, numPerm = 32, bands = 8,
        threshold = 0.5))
      .as[(Long, Long)].collect().toMap
    assert(got == oneShot)
    // at least one component spans batches (the merge path actually fired)
    val byComp = got.groupBy(_._2).values
    assert(byComp.exists(m => m.keys.map(_ % 3).toSet.size > 1))
  }

  test("streaming novelty: ordered multi-batch accumulation equals one-shot scores") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions.{count, explode, lit, min, sum, when}
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val outDir = java.nio.file.Files
      .createTempDirectory("graft_st_nov_mem").toString
    val docs = spark.read.parquet(s"${TestSpark.Sf}/documents.parquet")
      .select($"doc_id", $"text").as[(Long, String)].collect().toSeq
    // feed contract: batches in doc_id order
    val cut = docs.map(_._1).sorted.apply(docs.size / 2)
    val (batch0, batch1) = docs.partition(_._1 < cut)
    val ms = MemoryStream[(Long, String)]
    val q = graft.streaming.StreamOps.noveltyStart(
      spark, ms.toDF().toDF("doc_id", "text"), "doc_id", "text", outDir)
    try {
      ms.addData(batch0)
      q.processAllAvailable()
      ms.addData(batch1) // re-seen grams must resolve via the STATE store
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.read.parquet(s"$outDir/scores")
      .select($"doc_id", $"n_grams", $"n_novel")
      .as[(Long, Long, Long)].collect().map { case (a, b, c) => (a, (b, c)) }.toMap
    val g = spark.read.parquet(s"${TestSpark.Sf}/documents.parquet")
      .select($"doc_id", explode(graft.ops.SubstrDedup.gramHashes(
        graft.ops.Text.tokens($"text"), 8)).as("gh"))
      .distinct()
    val f = g.groupBy($"gh").agg(min($"doc_id").as("first_doc"))
    val oneShot = g.join(f, Seq("gh"))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_grams"),
        sum(when($"first_doc" === $"doc_id", 1L).otherwise(0L)).as("n_novel"))
      .as[(Long, Long, Long)].collect().map { case (a, b, c) => (a, (b, c)) }.toMap
    assert(got == oneShot)
    // batch-1 docs repeating batch-0 content score below 1 (state fired)
    assert(oneShot.exists { case (id, (_, novel)) => id >= cut && novel == 0L } ||
      got.exists { case (id, (ng, novel)) => id >= cut && novel < ng })
  }

  test("streaming heavy hitters: cross-batch heavy token found even when light per batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val outDir = java.nio.file.Files
      .createTempDirectory("graft_st_hh_mem").toString
    val ms = MemoryStream[String]
    val q = graft.streaming.StreamOps.heavyHittersStart(
      spark, ms.toDF().toDF("tok"), "tok", 4, outDir)
    // "spread" is never a within-batch majority (k=4 → threshold is
    // n/4 per the final recount) but is heavy globally; fillers differ
    // per batch so no filler accumulates.
    try {
      ms.addData(Seq("spread", "spread", "a1", "a2", "a3", "a4"))
      q.processAllAvailable()
      ms.addData(Seq("spread", "spread", "b1", "b2", "b3", "b4"))
      q.processAllAvailable()
      ms.addData(Seq("spread", "spread", "c1", "c2", "c3", "c4"))
      q.processAllAvailable()
    } finally q.stop()
    val got = graft.streaming.StreamOps.heavyHittersResult(spark, outDir, 4)
      .as[(String, Long, Long)].collect().toSet
    // total 18; only "spread" (6) exceeds 18/4
    assert(got == Set(("spread", 6L, 18L)))
  }

  test("heavy hitters on a stream that never saw a batch returns empty") {
    val outDir = java.nio.file.Files
      .createTempDirectory("graft_hh_empty").toString
    assert(graft.streaming.StreamOps
      .heavyHittersResult(spark, outDir, 4).isEmpty)
  }

  test("streaming CMS: cell-wise sum over batches equals the one-shot sketch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val (d, w) = (4, 128)
    val outDir = java.nio.file.Files
      .createTempDirectory("graft_st_cms_mem").toString
    val ms = MemoryStream[String]
    val q = graft.streaming.StreamOps.cmsStart(
      spark, ms.toDF().toDF("tok"), "tok", d, w, outDir)
    val b1 = Seq.fill(30)("x") ++ Seq("p", "q", "r")
    val b2 = Seq.fill(20)("x") ++ Seq.fill(9)("y") ++ Seq("p")
    try {
      ms.addData(b1); q.processAllAvailable()
      ms.addData(b2); q.processAllAvailable()
    } finally q.stop()
    val got = graft.streaming.StreamOps.cmsResult(spark, outDir, d, w)
      .as[(String, Long, Long)].collect()
      .map(t => t._1 -> (t._2, t._3)).toMap
    // one-shot over the concatenated stream, through the batch op
    val oneShot = graft.ops.CountMin.estimate(
        graft.ops.CountMin.sketch((b1 ++ b2).toDF("tok"), "tok", d, w),
        got.keys.toSeq.toDF("tok"), "tok", d, w)
      .as[(String, Long)].collect().toMap
    assert(got.view.mapValues(_._2).toMap == oneShot,
      "merged stream sketch must equal the one-shot sketch")
    // exact counts correct and estimates never undercount
    assert(got("x") == (50L, 50L) && got("p")._1 == 2L)
    got.foreach { case (t, (exact, est)) => assert(est >= exact, t) }
  }

  test("incremental dedup retry: batch must ignore its own failed-attempt state") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions.md5
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val outDir = java.nio.file.Files
      .createTempDirectory("graft_incretry").toString
    // Simulate a failed first attempt of batch 0 that wrote its state
    // partition before dying: on replay the batch must NOT anti-join
    // against these (its own) hashes, or every survivor is dropped.
    Seq("alpha", "beta").toDF("t").select(md5($"t").as("_h"))
      .write.parquet(s"$outDir/state/batch=0")
    val ms = MemoryStream[(Long, String)]
    val q = StreamOps.incrementalDedupStart(
      spark, ms.toDF().toDF("doc_id", "text"), "doc_id", "text", outDir)
    try {
      ms.addData(Seq((1L, "alpha"), (2L, "beta")))
      q.processAllAvailable()
      // next batch still sees batch 0's (rewritten) state
      ms.addData(Seq((10L, "alpha"), (11L, "gamma")))
      q.processAllAvailable()
    } finally q.stop()
    val got = StreamOps.incrementalDedupResult(spark, outDir)
      .select($"doc_id", $"text").as[(Long, String)].collect().toSet
    assert(got == Set((1L, "alpha"), (2L, "beta"), (11L, "gamma")))
  }

  test("streaming markov: transition spanning the batch boundary is emitted from state") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rows = Events.load(spark, TestSpark.Sf)
      .selectExpr("event_id", "ts", "user_id", "event_type", "value", "props")
      .as[(Long, Long, Long, String, Double, String)].collect().toSeq
    val (early, late) = rows.sortBy(_._2).splitAt(rows.length / 2)
    val ms = MemoryStream[(Long, Long, Long, String, Double, String)]
    ms.addData(early)
    ms.addData(late)
    val src = ms.toDF()
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = Events.markovOverPairs(
        StreamOps.markovPairsFrom(spark, src, "st_markov_msrc")
          .select($"cur", $"nxt"))
      .as[(String, String, Long, Double)].collect().toSet
    val batch = Events.qMarkovTransitions.fn(spark, TestSpark.Sf)
      .as[(String, String, Long, Double)].collect().toSet
    assert(got == batch,
      "stateful twin must emit boundary-spanning transitions")
    assert(got.nonEmpty)
    // state-bound pin: the contract is ONE state row per user (the
    // last event only) — a regression that accumulates per-event state
    // would show numRowsTotal ~ event count >> distinct users
    val users = rows.map(_._3).distinct.size
    val stateRows = StreamOps.lastStateRows
    assert(stateRows.exists(_ <= users),
      s"markov state must be <= $users (one row per user), got $stateRows")
  }

  test("streaming paths: triples spanning the batch boundary are emitted from state") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rows = Events.load(spark, TestSpark.Sf)
      .selectExpr("event_id", "ts", "user_id", "event_type", "value", "props")
      .as[(Long, Long, Long, String, Double, String)].collect().toSeq
    val (early, late) = rows.sortBy(_._2).splitAt(rows.length / 2)
    val ms = MemoryStream[(Long, Long, Long, String, Double, String)]
    ms.addData(early)
    ms.addData(late)
    val src = ms.toDF()
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = Events.pathsOverTriples(
        StreamOps.pathTriplesFrom(spark, src, "st_path_msrc")
          .select($"a", $"b", $"c"))
      .as[(Long, String, Long, Double)].collect().toSet
    val batch = Events.qPathAnalysis.fn(spark, TestSpark.Sf)
      .as[(Long, String, Long, Double)].collect().toSet
    assert(got == batch,
      "last-two-events state must emit boundary-spanning triples")
    assert(got.nonEmpty)
    // state-bound pin: last-TWO events per user is still one state row
    // per user — per-event accumulation would blow past this
    val users = rows.map(_._3).distinct.size
    val stateRows = StreamOps.lastStateRows
    assert(stateRows.exists(_ <= users),
      s"path state must be <= $users (one row per user), got $stateRows")
  }

  test("streaming windowed KS: two-batch MemoryStream feed equals the file-source run") {
    // The daily count agg is linear, so batch boundaries cannot change
    // the sufficient statistic — and therefore cannot change the KS
    // view over it. Split the feed mid-stream to prove it.
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rows = Events.load(spark, TestSpark.Sf)
      .selectExpr("event_id", "ts", "user_id", "event_type", "value", "props")
      .as[(Long, Long, Long, String, Double, String)].collect().toSeq
    val (early, late) = rows.sortBy(_._2).splitAt(rows.length / 2)
    val ms = MemoryStream[(Long, Long, Long, String, Double, String)]
    ms.addData(early)
    ms.addData(late)
    val src = ms.toDF()
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = Events.ksOverDayValueCounts(
        StreamOps.dailyValueCountsFrom(spark, src, "st_ks_msrc"))
      .as[(String, String, Long, Long, Double, Double)].collect().toSet
    val file = Events.ksOverDayValueCounts(
        StreamOps.dailyValueCounts(spark, TestSpark.Sf, "st_ks_file_twin"))
      .as[(String, String, Long, Long, Double, Double)].collect().toSet
    assert(got == file)
    assert(got.nonEmpty)
  }

  test("streaming DBSCAN: three-batch fold through the parquet state " +
      "equals the one-shot solve") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val outDir = java.nio.file.Files
      .createTempDirectory("graft_st_dbscan_mem").toString
    // DensitySpec's merge vector, sliced so the later batches promote a
    // border to core and merge two clusters ACROSS the state store.
    val pts = Seq(
      (1L, 9L, 11L), (2L, 9L, 12L), (3L, 9L, 13L), (4L, 10L, 12L),
      (5L, 12L, 12L), (6L, 13L, 11L), (7L, 13L, 12L), (8L, 13L, 13L),
      (9L, 11L, 12L), (10L, 50L, 50L),
      (11L, 30L, 30L), (12L, 30L, 30L), (13L, 30L, 30L), (14L, 30L, 30L),
      (15L, 11L, 12L), (16L, 11L, 13L))
    val slices = Seq(pts.take(8), pts.slice(8, 14), pts.drop(14))
    val ms = MemoryStream[(Long, Long, Long)]
    val q = graft.streaming.StreamOps.dbscanStart(
      spark, ms.toDF().toDF("id", "x", "y"), eps = 1L, minPts = 4L, outDir)
    try slices.foreach { sl =>
      ms.addData(sl)
      q.processAllAvailable()
    } finally q.stop()
    val labelDirs = new java.io.File(s"$outDir/labels").listFiles()
      .filter(_.getName.startsWith("batch=")).map(_.toString).sorted
    assert(labelDirs.length == 3) // three folds actually ran
    def canon(df: org.apache.spark.sql.DataFrame) = df
      .select($"id", $"is_core", $"cluster").collect()
      .map(r => (r.getLong(0), r.getBoolean(1), r.getLong(2))).sortBy(_._1)
    val got = canon(spark.read.parquet(labelDirs.last))
    val oneShot = canon(graft.ops.Density.dbscanGrid(
      pts.toDF("id", "x", "y"), eps = 1L, minPts = 4L))
    assert(got.toSeq == oneShot.toSeq)
    // the final batch merged the two arm clusters (labels 2 and 5 -> 2)
    assert(got.count(_._3 == 2L) == 11)
  }
}
