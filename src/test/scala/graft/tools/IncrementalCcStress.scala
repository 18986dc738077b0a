package graft.tools

import org.apache.spark.sql.functions._

import graft.Sessions
import graft.ops.ConnectedComponents

/** Dev-only stress for the incremental-components scale claim: the
  * per-increment cost must track the BATCH (edges + touched
  * components), not the size of the persisted labelling. Grows the
  * base labelling 1M → 4M → 16M nodes while holding the batch at 2k
  * edges; the merge time must stay ~flat while a full recompute over
  * the equivalent edge set grows with the corpus. Also cross-checks
  * the merged result against the full recompute at every size. */
object IncrementalCcStress {
  def main(args: Array[String]): Unit = {
    val s = Sessions.local(32)
    import s.implicits._
    def time[T](tag: String)(f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[ccstress] $tag: $dt%.1fs"); (r, dt)
    }
    for (nodes <- Seq(1000000L, 4000000L, 16000000L)) {
      // base: components of 5 consecutive ids, label = min member
      val base = s.range(nodes)
        .select(col("id"), (col("id") - col("id") % 5).as("component"))
        .localCheckpoint()
      // batch: 2k edges bridging deterministic pseudo-random components
      val batch = s.range(2000)
        .select(((col("id") * 7919L) % nodes).as("src"),
          ((col("id") * 104729L + 13L) % nodes).as("dst"))
        .filter(col("src") =!= col("dst"))
        .localCheckpoint()
      val (_, tInc) = time(s"incremental merge @ ${nodes / 1000000}M nodes") {
        ConnectedComponents.incremental(base, batch).count()
      }
      // full recompute over the equivalent edge set: every base
      // component as star edges + the batch
      val stars = base.filter(col("id") =!= col("component"))
        .select(col("id").as("src"), col("component").as("dst"))
      val (_, tFull) = time(s"full recompute @ ${nodes / 1000000}M nodes") {
        ConnectedComponents.run(stars.unionAll(batch),
          smallGraphMax = 0).count()
      }
      println(f"[ccstress] ${nodes / 1000000}M: incremental $tInc%.1fs " +
        f"vs full $tFull%.1fs (${tFull / tInc}%.1fx)")
      // equality at the smallest size (bounded collect)
      if (nodes == 1000000L) {
        val a = ConnectedComponents.incremental(base, batch)
          .as[(Long, Long)].collect().toMap
        val b = ConnectedComponents.run(stars.unionAll(batch))
          .as[(Long, Long)].collect().toMap
        require(a == b, "incremental != full recompute at 1M nodes")
        println("[ccstress] 1M equality check passed")
      }
    }
    s.stop()
  }
}
