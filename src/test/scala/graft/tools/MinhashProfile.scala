package graft.tools

import org.apache.spark.sql.functions._

import graft.Sessions
import graft.ops.{MinHash, Text}

/** Dev-only: stage-by-stage timing of the minhash pipeline at sf0.1. */
object MinhashProfile {
  def main(args: Array[String]): Unit = {
    val s = Sessions.local(32)
    val dir = "/root/testdata/sf0.1"
    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $tag: ${(System.nanoTime() - t0) / 1e9}%.2fs"); r
    }
    val docs = s.read.parquet(s"$dir/documents.parquet")
    time("warm scan")(docs.count())
    val withSets = docs
      .select(col("doc_id").as("id"), Text.shingleSet(col("text"), 3).as("sh"))
      .filter(size(col("sh")) > 0)
    time("shingle sets")(withSets.count())
    val sig = withSets.withColumn("sig", MinHash.signature(col("sh"), 32))
    time("signatures")(sig.select(sum(size(col("sig")))).collect())
    val banded = sig.select(col("id"),
      posexplode(MinHash.bandKeys(col("sig"), 8, 4)).as(Seq("band", "key")))
    time("bands")(banded.count())
    time("full candidatePairs")(
      MinHash.candidatePairs(docs, "doc_id", "text").count())
    time("full candidatePairs again")(
      MinHash.candidatePairs(docs, "doc_id", "text").count())
    s.stop()
  }
}
