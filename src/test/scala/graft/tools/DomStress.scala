package graft.tools

import org.apache.spark.sql.functions._

/** DOM-parser throughput curve: time graft_dom_blocks (single-pass
  * block-tree parse) against the regex extract chain on m-times
  * replicated synthetic pages. The question 100 TB asks of a per-row
  * parser is bytes/sec and LINEARITY — the parser holds no cross-row
  * state, so the curve should be flat MB/s. Run:
  *   sbt -batch "Test/runMain graft.tools.DomStress"
  */
object DomStress {
  def main(args: Array[String]): Unit = {
    val s = graft.Sessions.local(32)
    import s.implicits._
    val base = s.read.parquet("/root/testdata/sf0.1/documents.parquet")
      .select($"doc_id", $"text")
    val html = concat(
      lit("<html><body><nav><a href=\"/\">home</a> <a href=\"/x\">about</a></nav>"),
      lit("<article><h1>heading "), substring($"text", 1, 40), lit("</h1>"),
      lit("<p>intro "), substring($"text", 41, 400), lit(" <b>bolded</b></p>"),
      lit("<div title=\"a > b\"><p>nested "), substring($"text", 441, 400),
      lit("</p><ul><li>item "), substring($"text", 841, 200),
      lit("<li>item "), substring($"text", 1041, 200), lit("</ul></div>"),
      lit("<script>var s = \"</div><p>fake\";</script>"),
      lit("<p>tail "), substring($"text", 1241, 400), lit("</article>"),
      lit("<footer>terms &amp; conditions <a href=\"/t\">legal</a></footer></body></html>"))
    for (m <- Seq(1, 4, 16)) {
      val pages = base
        .withColumn("r", explode(sequence(lit(1), lit(m))))
        .select(($"doc_id" * m + $"r").as("id"), html.as("html"))
        .localCheckpoint()
      val bytes = pages.agg(sum(length($"html"))).head.getLong(0)
      def time(label: String)(df: org.apache.spark.sql.DataFrame): Unit = {
        val t0 = System.nanoTime()
        df.write.mode("overwrite").format("noop").save()
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"DOMSTRESS m=$m%2d rows=${pages.count()}%8d " +
          f"mb=${bytes / 1e6}%8.1f $label%-12s ${dt}%6.2f s " +
          f"${bytes / 1e6 / dt}%7.1f MB/s")
      }
      time("dom_blocks") {
        pages.select($"id",
          explode(graft.functions.GraftFunctions.domBlocks($"html")).as("b"))
          .select($"id", $"b.pos", $"b.path", $"b.text", $"b.link_chars")
      }
      time("regex_chain") {
        pages.select($"id",
          graft.ops.Text.extractHtmlText($"html").as("t"))
      }
      graft.ops.Checkpoints.sweepAll(s)
    }
    s.stop()
  }
}
