package graft.tools

import org.apache.spark.sql.functions._

import graft.Sessions
import graft.ops.MinHash
import graft.pipeline.{Pipeline, PipelineConfig}

/** Dev-only stress: replicate the sf0.1 corpus 40× (≈200k docs, heavy
  * duplicate cliques) and run the dedup-critical paths — validates the
  * bucket-cap + CC behavior under the shape a 100 TB run sees. */
object ScaleStress {
  def main(args: Array[String]): Unit = {
    val s = Sessions.local(32)
    val docs0 = s.read.parquet("/root/testdata/sf0.1/documents.parquet")
    val n0 = docs0.count()
    val docs = (0 until 40).map { i =>
      docs0.select((col("doc_id") + lit(i * 1000000L)).as("doc_id"),
        col("text"), col("lang"), col("source"), col("n_chars"))
    }.reduce(_ unionAll _)
    println(s"[stress] corpus: ${n0 * 40} docs")
    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[stress] $tag: ${(System.nanoTime() - t0) / 1e9}%.1fs"); r
    }
    val pairs = time("minhash pairs") {
      val p = MinHash.candidatePairs(docs, "doc_id", "text", threshold = 0.5)
      p.count()
    }
    println(s"[stress] pairs: $pairs")
    val clusters = time("cc clusters") {
      MinHash.clusters(
        MinHash.candidatePairs(docs, "doc_id", "text", threshold = 0.5))
        .select(countDistinct(col("component"))).collect()(0).getLong(0)
    }
    println(s"[stress] components: $clusters")
    val kept = time("full pipeline") {
      new Pipeline(s, PipelineConfig()).run(docs).count()
    }
    println(s"[stress] pipeline survivors: $kept")
    s.stop()
  }
}
