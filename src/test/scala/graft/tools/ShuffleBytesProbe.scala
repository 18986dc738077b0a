package graft.tools

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

import graft.SparkEntry

/** Measured shuffle evidence for the 100 TB story — run by hand:
  *
  *   sbt "Test/runMain graft.tools.ShuffleBytesProbe"
  *
  * For each headline query at sf0.1, prints bytes shuffled (stage
  * shuffle WRITE sum) next to the input bytes scanned, i.e. the
  * shuffle-to-scan ratio that decides whether the query's network cost
  * grows with the corpus or with the (bounded) group/sketch
  * cardinality. The aggregate/sketch family should sit orders of
  * magnitude below 1; joins sit near their key-carrying columns'
  * share. Results recorded in ARCHITECTURE.md. */
object ShuffleBytesProbe {
  def main(args: Array[String]): Unit = {
    val s = graft.Sessions.local(32)
    val dir = "/root/testdata/sf0.1"
    val shuffleW = new AtomicLong(0)
    val inputB = new AtomicLong(0)
    s.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        shuffleW.addAndGet(e.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
        inputB.addAndGet(e.stageInfo.taskMetrics.inputMetrics.bytesRead)
      }
    })
    val names = Seq("q1_pricing_summary", "q_hll_distinct", "d_token_stats",
      "q3_top_orders", "q5_region_revenue", "dd_minhash_pairs",
      "ev_sessionize", "e_pagerank_centrality", "d_kendall_tau",
      "ev_mann_kendall", "e_modularity", "mm_shot_detect")
    for (n <- names) {
      val fn = SparkEntry.queries(n)
      fn(s, dir).write.mode("overwrite").format("noop").save() // warm
      graft.ops.Checkpoints.sweepAll(s)
      // settle listener events from the warm run before zeroing
      Thread.sleep(500) // hand-run probe: let listener events settle
      shuffleW.set(0); inputB.set(0)
      fn(s, dir).write.mode("overwrite").format("noop").save()
      Thread.sleep(500) // hand-run probe: let listener events settle
      val (sw, in) = (shuffleW.get, inputB.get)
      println(f"[shuffle] $n%-24s shuffle=${sw / 1024.0 / 1024}%9.2f MiB  " +
        f"scan=${in / 1024.0 / 1024}%9.2f MiB  ratio=${sw.toDouble / math.max(in, 1)}%8.4f")
      graft.ops.Checkpoints.sweepAll(s)
    }
    s.stop()
  }
}
