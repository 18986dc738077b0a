package graft.tools

import org.apache.spark.sql.functions._

import graft.Sessions

/** Scale rehearsal for the round-12 third-wave operators — run by hand:
  *
  *   sbt "Test/runMain graft.tools.Wave3Stress [mult]"
  *
  * Upsamples sf0.1 by `mult` (default 64×) and measures the shapes the
  * new statistics must keep at 100 TB:
  *  - chi² feature selection: the (term, lang) contingency is bounded
  *    by VOCAB × LANGS — 64× the rows with the same texts must leave
  *    the cell count unchanged (only the presence-explode scan grows);
  *  - target encoding: brand moments stay |brands| rows while the
  *    fact side grows 64×; the rejoin is broadcast, no row shuffle;
  *  - CUPED: per-user moment state grows with USERS (upsampled
  *    deliberately), never with events per user;
  *  - EWMA chart + binseg: the day grid is TIME-bounded — 64× the
  *    events land on the same days, so the triangular expansion and
  *    the split-candidate frames must not grow at all.
  */
object Wave3Stress {
  def main(args: Array[String]): Unit = {
    val mult = args.headOption.map(_.toInt).getOrElse(64)
    val s = Sessions.local(32)
    import s.implicits._
    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[w3stress] $tag: ${(System.nanoTime() - t0) / 1e9}%.1fs"); r
    }

    // ---- chi2 terms: contingency bounded by vocab x langs ----
    val docs0 = s.read.parquet("/root/testdata/sf0.1/documents.parquet")
    val docs = (0 until mult).map { i =>
      docs0.select((col("doc_id") + lit(i * 1000000L)).as("doc_id"),
        col("text"), col("lang"), col("source"), col("n_chars"))
    }.reduce(_ unionAll _).localCheckpoint()
    val nd = docs.count()
    println(s"[w3stress] corpus: $nd docs (${mult}x)")
    val base = time(s"chi2 contingency over $nd docs") {
      docs0.select($"lang",
          explode(array_distinct(split($"text", " ", -1))).as("term"))
        .filter($"term" =!= "")
        .groupBy($"term", $"lang").count().count()
    }
    val up = time(s"chi2 contingency over ${mult}x docs") {
      docs.select($"lang",
          explode(array_distinct(split($"text", " ", -1))).as("term"))
        .filter($"term" =!= "")
        .groupBy($"term", $"lang").count().count()
    }
    assert(up == base, s"contingency grew under upsampling: $base -> $up")
    println(s"[w3stress] chi2 cells: $base at 1x == $up at ${mult}x (bounded)")

    // ---- target encoding: moment frame bounded by |brands| ----
    val li0 = s.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
    val part = s.read.parquet("/root/testdata/sf0.1/part.parquet")
    val li = (0 until mult).map(i =>
      li0.select(($"l_orderkey" + lit(i * 10000000L)).as("l_orderkey"),
        $"l_partkey", $"l_extendedprice")).reduce(_ unionAll _)
    time(s"target encoding over ${mult}x lineitem") {
      val b = li.join(broadcast(part), $"p_partkey" === $"l_partkey")
        .select($"p_brand", $"l_extendedprice".cast("decimal(18,2)").as("x"))
      val bs = b.groupBy($"p_brand")
        .agg(count(lit(1)).as("n"), sum($"x").as("sx")).localCheckpoint()
      val nb = bs.count()
      val enc = b.join(broadcast(bs), Seq("p_brand"))
        .groupBy($"p_brand").agg(min(($"sx" - $"x").cast("double")).as("mn"))
        .count()
      println(s"[w3stress] brands: $nb moment rows, $enc encoded groups")
    }

    // ---- CUPED: state scales with users, not events ----
    val ev0 = graft.queries.Events.load(s, "/root/testdata/sf0.1")
    val ev = (0 until mult).map(i =>
      ev0.select(($"user_id" + lit(i * 100000L)).as("user_id"), $"ts",
        $"value", $"event_type")).reduce(_ unionAll _)
    time(s"cuped per-user moments over ${mult}x events/users") {
      val e = ev.select($"user_id", expr("ts div 1000").as("us"),
        round($"value" * 1e6).cast("long").as("vm"))
      val bounds = broadcast(e.agg(min($"us").as("mn"), max($"us").as("mx")))
      val u = e.crossJoin(bounds).groupBy($"user_id")
        .agg(sum(when(lit(2) * $"us" <= $"mn" + $"mx", $"vm").otherwise(0L)
          .cast("decimal(38,0)")).as("x"),
          sum(when(lit(2) * $"us" > $"mn" + $"mx", $"vm").otherwise(0L)
            .cast("decimal(38,0)")).as("y"))
      val nu = u.groupBy(($"user_id" % 2).as("v"))
        .agg(count(lit(1)).as("n"), sum($"x" * $"y").as("sxy")).count()
      println(s"[w3stress] cuped variant rows: $nu")
    }

    // ---- EWMA + binseg: day grid is time-bounded ----
    val grid0 = ev0.select($"event_type", expr("ts div 86400000000000").as("d"))
      .groupBy($"event_type", $"d").agg(count(lit(1)).as("cnt"))
    val gridUp = ev.select($"event_type", expr("ts div 86400000000000").as("d"))
      .groupBy($"event_type", $"d").agg(count(lit(1)).as("cnt"))
    val g0 = grid0.count(); val g1 = gridUp.count()
    assert(g0 == g1, s"day grid grew under upsampling: $g0 -> $g1")
    time(s"ewma chart over the ${mult}x-fed day grid") {
      graft.queries.Events.ewmaControlOverDayGrid(
        graft.queries.Events.spineFill(gridUp)).count()
    }
    time(s"binseg over the ${mult}x-fed day grid") {
      graft.queries.Events.binsegOverDayGrid(
        graft.queries.Events.spineFill(gridUp)).count()
    }
    println(s"[w3stress] day grid: $g0 cells at 1x == $g1 at ${mult}x (bounded)")
    s.stop()
  }
}
