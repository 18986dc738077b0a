package graft.tools

import org.apache.spark.sql.functions._

import graft.Sessions
import graft.queries.Events

/** Scale curves for the round-10 second-session families — run by hand:
  *
  *   sbt "Test/runMain graft.tools.SketchStress"
  *
  * Three claims to back with numbers (results recorded in
  * ARCHITECTURE.md "Scale probes"):
  *  1. t-digest: one-pass global quantiles scale linearly (state ≤ δ
  *     centroids per partial, merge cost independent of n);
  *  2. AMS F2: 61 counters, linear one-pass, no per-key state;
  *  3. sequential folds (Holt) scale in the NUMBER OF KEYS with
  *     calendar-bounded per-key work — 100k independent series fold in
  *     one pass with no shuffle beyond the grid group-by.
  */
object SketchStress {
  def main(args: Array[String]): Unit = {
    val s = Sessions.local(32)
    import s.implicits._
    def time(tag: String)(f: => Long): Double = {
      val t0 = System.nanoTime(); val n = f
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[sketchstress] $tag: $dt%.1fs ($n rows)")
      dt
    }

    println("[sketchstress] == t-digest one-pass curve ==")
    val tdq = udaf(graft.ops.TDigest.aggregator(Seq(0.5, 0.95)),
      org.apache.spark.sql.Encoders.scalaDouble)
    for (n <- Seq(1000000L, 4000000L, 16000000L)) {
      val df = s.range(n).select(
        (col("id") % 97).cast("double").as("v")).localCheckpoint()
      time(s"tdigest n=$n") {
        df.agg(tdq(col("v"))).collect(); n
      }
    }

    println("[sketchstress] == AMS F2 61-counter curve ==")
    for (n <- Seq(1000000L, 4000000L, 16000000L)) {
      val ev = s.range(n).select((col("id") % 100000).as("user_id"))
        .localCheckpoint()
      time(s"ams n=$n") {
        Events.amsBitSumsAgg(ev).collect(); n
      }
    }

    println("[sketchstress] == Holt fold: keys × 64-day series ==")
    for (k <- Seq(10000L, 50000L, 100000L)) {
      val grid = s.range(k * 64).select(
        concat(lit("t"), expr("id div 64")).as("event_type"),
        (col("id") % 64).as("d"),
        (col("id") % 13 + 5).as("x")).localCheckpoint()
      time(s"holt keys=$k") {
        Events.holtOverDayGrid(grid).count()
      }
    }
  }
}
