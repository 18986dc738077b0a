package graft.tools

import graft.pipeline.{Pipeline, PipelineConfig}

/** Dev-only: stage-level wall-clock breakdown of the fused pipeline at
  * sf0.1 (the bench headline's cost structure). */
object PipelineProfile {
  def main(args: Array[String]): Unit = {
    val s = graft.Sessions.local(32)
    val docs = s.read.parquet("/root/testdata/sf0.1/documents.parquet")
    val p = new Pipeline(s, PipelineConfig())
    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $tag: ${(System.nanoTime() - t0) / 1e9}%.2fs"); r
    }
    // warmup
    p.run(docs).write.mode("overwrite").format("noop").save()
    time("full fused run") {
      p.run(docs).write.mode("overwrite").format("noop").save()
    }
    val upToFlags = Seq(p.CleanStage, p.StatsStage, p.FlagRemoveStage)
      .foldLeft(docs)((d, st) => st(d))
    time("clean+stats+flag only") {
      upToFlags.write.mode("overwrite").format("noop").save()
    }
    val exact = p.ExactDedupStage(upToFlags)
    time("...+ exact dedup") {
      exact.write.mode("overwrite").format("noop").save()
    }
    time("...+ fuzzy dedup (the rest)") {
      p.FuzzyDedupStage(exact).write.mode("overwrite").format("noop").save()
    }
    s.stop()
  }
}
