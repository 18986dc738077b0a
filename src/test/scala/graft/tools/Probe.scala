package graft.tools

import graft.Sessions

/** Dev-only probe: schema/read sanity over the driver testdata. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(4)
    val dir = "/root/testdata/sf0.001"
    for (t <- graft.Tables.all) {
      try {
        val df = graft.Tables.load(spark, dir, t)
        println(s"== $t: ${df.schema.map(f => s"${f.name}:${f.dataType.simpleString}").mkString(", ")}")
        df.show(2, truncate = 60)
      } catch {
        case e: Throwable => println(s"== $t FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
