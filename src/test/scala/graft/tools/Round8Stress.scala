package graft.tools

import org.apache.spark.sql.functions._

import graft.Sessions
import graft.ops.{Skew, Text}

/** Dev-only stress for the round-8 families: replicate the sf0.1
  * corpus/events N× and time the scale-critical paths —
  *
  * - SNM pairs (globalRowNumber + rank equi-join): candidates are w·n
  *   by construction, so cost must grow ~linearly in n.
  * - CDC chunks (explode → doc-local window → hash agg, no join).
  * - Exact KS (prefixSumsByKey over the distinct-value grid).
  * - Windowed KS (quantized grid — the bounded-by-construction path;
  *   cost should grow with the COUNT table, much slower than events).
  *
  * Run: Test/runMain graft.tools.Round8Stress [multDocs] [multEvents]
  */
object Round8Stress {
  def main(args: Array[String]): Unit = {
    val multD = args.headOption.map(_.toInt).getOrElse(64)
    val multE = args.drop(1).headOption.map(_.toInt).getOrElse(64)
    val s = Sessions.local(32)
    import s.implicits._

    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[r8stress] $tag: ${(System.nanoTime() - t0) / 1e9}%.1fs"); r
    }

    val docs0 = s.read.parquet("/root/testdata/sf0.1/documents.parquet")
    def docsAt(m: Int) = (0 until m).map { i =>
      docs0.select((col("doc_id") + lit(i * 1000000L)).as("doc_id"),
        // perturb the head per replica so SNM sort keys don't all collide
        concat(lit(s"v$i "), col("text")).as("text"))
    }.reduce(_ unionAll _)

    for (m <- Seq(multD / 4, multD).distinct.filter(_ >= 1)) {
      val d = docsAt(m)
      val norm = d.select($"doc_id", Text.normalizeWs($"text").as("norm"))
      val snm = time(s"snm pairs ${m}x (${5000L * m} docs)") {
        val ranked = Skew.globalRowNumber(
            norm.withColumn("sk", substring($"norm", 1, 24)),
            Seq($"sk", $"doc_id"))
          .select($"doc_id", substring($"norm", 1, 64).as("pfx"), $"rn")
        val left = ranked.select($"doc_id".as("id_a"), $"pfx".as("pa"),
          $"rn".as("rn_a"))
        val right = ranked.select($"doc_id".as("id_b"), $"pfx".as("pb"),
          $"rn".as("rn_b"))
        left.select($"id_a", $"pa",
            explode(typedlit(Seq(1L, 2L, 3L))).as("j"), $"rn_a")
          .withColumn("rn_b", $"rn_a" + $"j")
          .join(right, "rn_b")
          .filter(levenshtein($"pa", $"pb") <= 20)
          .count()
      }
      println(s"[r8stress] snm pairs ${m}x: $snm")

      val cdc = time(s"cdc dup chunks ${m}x") {
        val n = d.select($"doc_id", Text.normalizeWs($"text").as("norm"))
          .filter(length($"norm") >= 8)
        val cuts = n.select($"doc_id", $"norm",
            explode(sequence(lit(1L), length($"norm").cast("long") - 7)).as("i"))
          .filter(conv(substring(md5($"norm".substr($"i", lit(8))), 1, 12), 16, 10)
            .cast("long") % 32 === 0)
          .select($"doc_id", $"norm", ($"i" + 7).as("cut"))
        val allcut = cuts
          .union(n.select($"doc_id", $"norm", length($"norm").cast("long").as("cut")))
          .distinct()
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy($"doc_id").orderBy($"cut")
        allcut
          .withColumn("cstart", coalesce(lag($"cut", 1).over(w), lit(0L)) + 1)
          .select(md5(expr("substring(norm, cstart, cut - cstart + 1)")).as("h"))
          .groupBy($"h").agg(count(lit(1)).as("n"))
          .filter($"n" > 1).count()
      }
      println(s"[r8stress] cdc dup chunks ${m}x: $cdc")
    }

    val ev0 = graft.queries.Events.load(s, "/root/testdata/sf0.1")
      .select($"event_type", $"value", $"ts")
    def evAt(m: Int) = (0 until m).map { i =>
      // jitter value per replica so the distinct-value grid grows too
      ev0.select($"event_type", ($"value" + lit(i * 0.001)).as("value"), $"ts")
    }.reduce(_ unionAll _)

    for (m <- Seq(multE / 4, multE).distinct.filter(_ >= 1)) {
      val e = evAt(m).withColumn("us", expr("ts div 1000"))
      val ks = time(s"exact ks ${m}x (${100000L * m} events)") {
        val mid = broadcast(e.agg(expr("(min(us) + max(us)) div 2").as("mid")))
        val counts = e.crossJoin(mid)
          .groupBy($"event_type", $"value")
          .agg(sum(when($"us" <= $"mid", 1L).otherwise(0L)).as("ca"),
            sum(when($"us" > $"mid", 1L).otherwise(0L)).as("cb"))
        val totals = broadcast(counts.groupBy($"event_type")
          .agg(sum($"ca").as("na"), sum($"cb").as("nb")))
        Skew.prefixSumsByKey(counts, "event_type", Seq($"value"),
            Seq($"ca" -> "cr", $"cb" -> "cc"))
          .join(totals, "event_type")
          .groupBy($"event_type")
          .agg(max(abs($"cr" * $"nb" - $"cc" * $"na")).as("dmax"))
          .count()
      }
      println(s"[r8stress] exact ks ${m}x rows: $ks")

      val ksw = time(s"windowed ks ${m}x") {
        graft.queries.Events.ksOverDayValueCounts(
          e.select($"event_type",
              date_format(timestamp_micros($"us"), "yyyy-MM-dd").as("window_day"),
              round($"value", 1).as("v"))
            .groupBy($"event_type", $"window_day", $"v")
            .agg(count(lit(1)).as("cnt"))).count()
      }
      println(s"[r8stress] windowed ks ${m}x rows: $ksw")
    }
    s.stop()
  }
}
