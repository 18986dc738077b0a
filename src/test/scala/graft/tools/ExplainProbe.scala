package graft.tools
import org.apache.spark.sql.functions._
import graft.ops.{Skew, SubstrDedup, Text}
object ExplainProbe {
  def main(args: Array[String]): Unit = {
    val s = graft.Sessions.local(8)
    import s.implicits._
    val docs = s.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val spans = SubstrDedup.dupSpans(docs.select($"doc_id", Text.tokens($"text").as("l")), "doc_id", "l", 8, 2)
    spans.write.mode("overwrite").format("noop").save()
    println("=== dupSpans (post-AQE) ===")
    println(spans.queryExecution.executedPlan.toString.linesIterator.filter(l =>
      Seq("Exchange","Scan","Window","Aggregate","Join","Sort").exists(l.contains)).mkString("\n"))
    val ps = Skew.prefixSumByKey(docs.select($"doc_id", $"lang", Text.wordCount($"text").cast("long").as("v")), "lang", Seq($"doc_id"), $"v", "cum")
    ps.write.mode("overwrite").format("noop").save()
    println("=== prefixSumByKey (post-AQE) ===")
    println(ps.queryExecution.executedPlan.toString.linesIterator.filter(l =>
      Seq("Exchange","Scan","Window","Aggregate","Join","Sort").exists(l.contains)).mkString("\n"))
    s.stop()
  }
}
