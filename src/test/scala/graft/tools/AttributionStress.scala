package graft.tools

import org.apache.spark.sql.functions._

import graft.Sessions

/** Dev-only growth probe for the attribution family: replicate the
  * sf0.1 events N× ACROSS USERS (new user_ids per replica, so the
  * per-user frame stays constant while total rows grow — the shape a
  * 100 TB event log actually has) and time the batch banded join
  * (ev_attribution's plan). Cost must grow ~linearly in rows: the
  * join is user-keyed and each purchase's candidate set is bounded by
  * the 7-day per-user touch frame, so no quadratic term can appear.
  *
  * Run: Test/runMain graft.tools.AttributionStress [mult ...]
  */
object AttributionStress {
  def main(args: Array[String]): Unit = {
    val mults = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(4, 16)
    val s = Sessions.local(32)

    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[attr-stress] $tag: ${(System.nanoTime() - t0) / 1e9}%.1fs"); r
    }

    val ev0 = graft.queries.Events.load(s, "/root/testdata/sf0.1")
    val n0 = ev0.count()
    def evAt(m: Int) = (0 until m).map { i =>
      ev0.select((col("event_id") + lit(i * 10000000L)).as("event_id"),
        col("ts"), (col("user_id") + lit(i * 1000000L)).as("user_id"),
        col("event_type"), col("value"), col("props"))
    }.reduce(_ unionAll _).repartition(32)

    for (m <- mults) {
      val dir = s"/tmp/attr_stress_$m"
      evAt(m).write.mode("overwrite").parquet(s"$dir/events.parquet")
      val rows = n0 * m
      time(s"ev_attribution ${m}x ($rows rows)") {
        graft.queries.Events.qAttribution.fn(s, dir)
          .write.mode("overwrite").format("noop").save()
      }
    }
  }
}
