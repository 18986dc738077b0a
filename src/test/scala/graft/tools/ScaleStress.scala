package graft.tools

import org.apache.spark.sql.functions._

import graft.Sessions
import graft.ops.{Buckets, MinHash}
import graft.pipeline.{Pipeline, PipelineConfig}

/** Dev-only stress: replicate the sf0.1 corpus N× (args(0), default
  * 128 ≈ 640k docs, every doc in an N-copy clique) and run the
  * dedup-critical paths — validates bucket-cap + CC behavior under the
  * shape a 100 TB run sees, and that cap trips are OBSERVED (drained
  * metric), never silent. */
object ScaleStress {
  def main(args: Array[String]): Unit = {
    val mult = args.headOption.map(_.toInt).getOrElse(128)
    val s = Sessions.local(32)
    val docs0 = s.read.parquet("/root/testdata/sf0.1/documents.parquet")
    val n0 = docs0.count()
    val docs = (0 until mult).map { i =>
      docs0.select((col("doc_id") + lit(i * 1000000L)).as("doc_id"),
        col("text"), col("lang"), col("source"), col("n_chars"))
    }.reduce(_ unionAll _)
    println(s"[stress] corpus: ${n0 * mult} docs (${mult}x)")
    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[stress] $tag: ${(System.nanoTime() - t0) / 1e9}%.1fs"); r
    }
    val pairs = time("minhash pairs") {
      val p = MinHash.candidatePairs(docs, "doc_id", "text", threshold = 0.5)
      p.count()
    }
    println(s"[stress] pairs: $pairs")
    // cap observability at scale: the default-cap run must REPORT its
    // cap state (zero trips is fine; unreported is not)
    val (capCounts, unreported) = Buckets.drainCapCounts()
    println(s"[stress] cap observations: $capCounts unreported: $unreported")
    require(unreported.isEmpty,
      s"cap state unobserved at ${mult}x: $unreported")
    // forced-trip probe: with the cap below the clique size every
    // duplicate clique exceeds it, so the metric MUST report trips
    val forced = time("forced-cap pairs") {
      MinHash.candidatePairs(docs, "doc_id", "text", threshold = 0.5,
        maxBucket = math.max(2, mult / 2)).count()
    }
    val (forcedCounts, forcedUnrep) = Buckets.drainCapCounts()
    println(s"[stress] forced pairs: $forced capped: $forcedCounts unreported: $forcedUnrep")
    require(forcedUnrep.isEmpty && forcedCounts.values.sum > 0,
      s"forced cap at maxBucket=${mult / 2} did not trip observably: " +
        s"$forcedCounts / $forcedUnrep")
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
