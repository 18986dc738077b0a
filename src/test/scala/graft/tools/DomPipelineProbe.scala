package graft.tools

/** Where does pipeline_e2e_dom's extra ~0.75 s over pipeline_e2e go?
  * Times the ACTUAL declared specs (noop write, Bench discipline) and
  * a funnel-prefix breakdown of the DOM door at sf0.1. */
object DomPipelineProbe {
  def main(args: Array[String]): Unit = {
    val s = graft.Sessions.local(32)
    val dir = "/root/testdata/sf0.1"
    def time(label: String, warm: Int = 1)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      (1 to warm).foreach(_ => mk.write.mode("overwrite").format("noop").save())
      graft.ops.Checkpoints.sweepAll(s)
      val t0 = System.nanoTime()
      mk.write.mode("overwrite").format("noop").save()
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      graft.ops.Checkpoints.sweepAll(s)
    }
    val e2e = graft.queries.StreamingQ.specs.find(_.name == "pipeline_e2e").get
    val dom = graft.queries.StreamingQ.specs.find(_.name == "pipeline_e2e_dom").get
    time("pipeline_e2e (spec)") { e2e.fn(s, dir) }
    time("pipeline_e2e_dom (spec)") { dom.fn(s, dir) }
    // breakdown: count rows surviving each door to confirm parity
    println("e2e rows: " + e2e.fn(s, dir).count())
    println("dom rows: " + dom.fn(s, dir).count())
    s.stop()
  }
}
