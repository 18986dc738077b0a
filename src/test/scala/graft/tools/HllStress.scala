package graft.tools

import org.apache.spark.sql.functions._

import graft.Sessions
import graft.ops.Hll

/** Scale curve for the explicit-register HLL family — run by hand:
  *
  *   sbt "Test/runMain graft.tools.HllStress"
  *
  * Claims to back with numbers (recorded in ARCHITECTURE.md):
  *  1. on WIDE values (64-char strings — the distinct-URL/user-day
  *     workload) the register build beats countDistinct, because the
  *     exact path must shuffle every distinct string while the sketch
  *     shuffles ≤ m rows per group;
  *  2. the md5 (oracle-parity) hash is the slow part; the xxhash64
  *     production path closes the gap — both are the same sketch;
  *  3. the estimate stays inside the ~1.04/√m ≈ 6.5% envelope;
  *  4. sharded registers max-merge to the whole-corpus answer (256
  *     rows per shard moved, zero re-scan).
  */
object HllStress {
  def main(args: Array[String]): Unit = {
    val s = Sessions.local(32)
    import s.implicits._
    def time[T](tag: String)(f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[hllstress] $tag: $dt%.2fs")
      (r, dt)
    }
    val n = 20000000L // fixed input rows; distinct cardinality varies
    for (card <- Seq(100000L, 1000000L, 10000000L)) {
      // 64-char string values: distinct URLs / user-day keys shape
      val df = s.range(n)
        .select(concat(lit("https://example.com/corpus/shard/"),
          lpad((col("id") % card).cast("string"), 31, "0")).as("v"))
        .localCheckpoint()
      val (estM, tMd5) = time(s"md5 registers card=$card") {
        Hll.estimate(
          Hll.registers(df.withColumn("g", lit("all")), Seq("g"), col("v")),
          Seq("g")).select(col("est_distinct")).as[Double].collect().head
      }
      val (estX, tXx) = time(s"xxhash64 registers card=$card") {
        Hll.estimate(
          Hll.registersFast(df.withColumn("g", lit("all")), Seq("g"), col("v")),
          Seq("g")).select(col("est_distinct")).as[Double].collect().head
      }
      val (_, tExact) = time(s"countDistinct card=$card") {
        df.agg(countDistinct(col("v"))).collect()
      }
      val (errM, errX) =
        (math.abs(estM - card) / card, math.abs(estX - card) / card)
      println(f"[hllstress] card=$card md5_err=${errM * 100}%.2f%% " +
        f"xx_err=${errX * 100}%.2f%% md5=${tMd5}%.2fs xx=${tXx}%.2fs " +
        f"exact=${tExact}%.2fs xx_speedup=${tExact / tXx}%.2fx")
      assert(errM < 0.13 && errX < 0.13,
        s"estimate outside 2x the m=256 envelope: md5=$estM xx=$estX vs $card")
    }
    // shard merge: 32 shards' registers (32*256 rows) max-merge to the
    // one-shot whole-corpus registers, bit for bit (both hash paths)
    val df = s.range(n).select((col("id") % 1000000L).as("v"))
      .localCheckpoint()
    for ((tag, build) <- Seq[(String,
        (org.apache.spark.sql.DataFrame, Seq[String],
         org.apache.spark.sql.Column) => org.apache.spark.sql.DataFrame)](
        ("md5", Hll.registers), ("xxhash64", Hll.registersFast))) {
      val whole = build(df.withColumn("g", lit("all")), Seq("g"), col("v"))
      val merged = build(
          df.withColumn("g", (col("v") % 32).cast("string")), Seq("g"), col("v"))
        .groupBy(col("reg")).agg(max(col("mr")).as("mr"))
        .select(lit("all").as("g"), col("reg"), col("mr"))
      assert(whole.except(merged).isEmpty && merged.except(whole).isEmpty)
      println(s"[hllstress] 32-shard max-merge == one-shot registers ($tag): OK")
    }
    s.stop()
  }
}
