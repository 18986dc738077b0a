package graft.tools

object MojiProbe {
  def main(args: Array[String]): Unit = {
    val s = graft.Sessions.local(4)
    graft.queries.CleaningOps.dMojibake.fn(s, "/root/testdata/sf0.01")
      .coalesce(1).write.mode("overwrite").parquet("/tmp/moji_spec")
    s.stop()
  }
}
