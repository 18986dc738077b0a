package graft.tools

import org.apache.spark.sql.functions._

import graft.Sessions
import graft.ops.Hll

/** Scale rehearsal for the round-12 families — run by hand:
  *
  *   sbt "Test/runMain graft.tools.Round12Stress [mult]"
  *
  * Upsamples the sf0.1 corpus (default 64× ≈ 320k docs / 32M frames)
  * and runs the new operators at that scale, checking the shapes that
  * must hold at 100 TB:
  *  - Kendall cells: the cell count is bounded by the VALUE DOMAIN, so
  *    upsampling rows 64× must not grow cells at all (same texts →
  *    same (x,y) pairs) — cost grows only in the first hash-agg scan;
  *  - lang×source MI: contingency stays |langs|×|sources| regardless
  *    of rows;
  *  - shot detection: frames explode 64×, the window is per-video —
  *    linear scaling, no quadratic blowup;
  *  - HLL registers: per-group state pinned at ≤ 256 rows while input
  *    grows; estimate error stays in the envelope;
  *  - corpus checksum: the rollup total equals the xor/sum-merge of
  *    per-shard checksums computed INDEPENDENTLY (the 16-bytes-moved
  *    merge a snapshot comparison at 100 TB rides).
  */
object Round12Stress {
  def main(args: Array[String]): Unit = {
    val mult = args.headOption.map(_.toInt).getOrElse(64)
    val s = Sessions.local(32)
    import s.implicits._
    val docs0 = s.read.parquet("/root/testdata/sf0.1/documents.parquet")
    val docs = (0 until mult).map { i =>
      docs0.select((col("doc_id") + lit(i * 1000000L)).as("doc_id"),
        col("text"), col("lang"),
        // distinct per-copy sources so group cardinality grows too
        concat(col("source"), lit("_"), lit(i % 8)).as("source"),
        col("n_chars"))
    }.reduce(_ unionAll _).localCheckpoint()
    val n = docs.count()
    println(s"[r12stress] corpus: $n docs (${mult}x), sources x8")
    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[r12stress] $tag: ${(System.nanoTime() - t0) / 1e9}%.1fs"); r
    }

    // Kendall: cells bounded by value domain (same texts upsampled)
    val d = docs.select($"source", $"n_chars".as("x"),
      size(split($"text", " ", -1)).cast("long").as("y"))
    val cells = time(s"kendall cell build over $n rows") {
      val c = d.groupBy($"source", $"x", $"y").agg(count(lit(1)).as("c"))
        .localCheckpoint()
      c.count()
    }
    println(s"[r12stress] kendall cells: $cells (sources x8, value domain fixed)")

    // MI: contingency bounded
    val mi = time("lang x source MI") {
      val cont = docs.groupBy($"lang", $"source").agg(count(lit(1)).as("nij"))
        .localCheckpoint()
      cont.count()
    }
    println(s"[r12stress] MI contingency cells: $mi")

    // shot detection: frames explode mult x 5000 x ~50
    val shots = time("shot detection over exploded frames") {
      val meta = docs.select($"doc_id",
        (lit(1) + length($"text") % 100).as("n_frames"), md5($"text").as("checksum"))
      val frames = meta.select($"doc_id", $"checksum",
          explode(sequence(lit(0L), $"n_frames" - 1)).as("frame_id"))
        .select($"doc_id", $"frame_id",
          conv(substring(md5(concat($"checksum", lit("|"),
            $"frame_id".cast("string"))), 1, 2), 16, 10).cast("long").as("luma"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"doc_id").orderBy($"frame_id")
      frames
        .withColumn("prev", lag($"luma", 1).over(w))
        .withColumn("b", when($"prev".isNull || abs($"luma" - $"prev") > 64, 1L)
          .otherwise(0L))
        .withColumn("shot", sum($"b").over(w.rowsBetween(
          org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
        .groupBy($"doc_id", $"shot").agg(count(lit(1)).as("nf"))
        .count()
    }
    println(s"[r12stress] shots: $shots")

    // HLL: state bound + estimate under growth
    time("hll registers per source") {
      val regs = Hll.registersFast(docs, Seq("source"),
        concat($"doc_id".cast("string"), $"text")).localCheckpoint()
      val maxRegs = regs.groupBy($"source").agg(count(lit(1)).as("m"))
        .agg(max($"m")).as[Long].collect().head
      assert(maxRegs <= Hll.m, s"register state exceeded m: $maxRegs")
      val est = Hll.estimate(regs, Seq("source"))
        .agg(sum($"est_distinct")).as[Double].collect().head
      println(f"[r12stress] hll total est=$est%.0f (exact=$n) " +
        f"err=${math.abs(est - n) / n * 100}%.2f%% maxregs=$maxRegs")
    }

    // checksum merge: independent per-shard checksums fold to the total
    time("checksum shard-merge equality") {
      val hv = docs.select($"source",
        conv(substring(md5(concat($"doc_id".cast("string"), lit("|"), $"text")),
          1, 12), 16, 10).cast("long").as("hv")).localCheckpoint()
      val whole = hv.agg(
        expr("bit_xor(hv)").as("x"),
        (sum($"hv".cast("decimal(38,0)")) % lit(2305843009213693952L))
          .cast("long").as("sm")).as[(Long, Long)].collect().head
      val parts = hv.groupBy($"source").agg(
        expr("bit_xor(hv)").as("x"),
        sum($"hv".cast("decimal(38,0)")).as("sm"))
      val merged = parts.agg(
        expr("bit_xor(x)").as("x"),
        (sum($"sm") % lit(2305843009213693952L)).cast("long").as("sm"))
        .as[(Long, Long)].collect().head
      assert(merged == whole, s"shard merge $merged != whole $whole")
      println(s"[r12stress] checksum shard-merge == whole-corpus: OK $whole")
    }
    s.stop()
  }
}
