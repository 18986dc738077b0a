package graft.tools

import org.apache.spark.sql.functions._

import graft.Sessions
import graft.ops.{Buckets, SubstrDedup, Text, Winnow}

/** Dev-only stress for the round-7 second-pass families: replicate
  * sf0.1 documents N× (identical text per copy — the worst case for
  * every dedup path: every fingerprint/gram/term collides across all
  * copies) and time the corpus-scale paths of winnowing, novelty, and
  * TF-IDF pair generation.
  *
  * Run: sbt 'Test/runMain graft.tools.WinnowStress 16'
  */
object WinnowStress {
  def main(args: Array[String]): Unit = {
    val factor = args.headOption.map(_.toInt).getOrElse(16)
    val s = Sessions.local(32)
    import s.implicits._
    val docs0 = s.read.parquet("/root/testdata/sf0.1/documents.parquet")
    val docs = (0 until factor).map { i =>
      docs0.select((col("doc_id") + lit(i * 1000000L)).as("doc_id"),
        col("text"), col("lang"), col("source"), col("n_chars"))
    }.reduce(_ unionAll _).localCheckpoint()
    println(s"[stress] corpus: ${docs.count()} docs (${factor}x sf0.1)")
    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[stress] $tag: ${(System.nanoTime() - t0) / 1e9}%.1fs"); r
    }

    val toks = Text.tokens($"text")

    time("winnow selection + fingerprint dump (row-local)") {
      docs.filter(size(toks) >= 8)
        .select($"doc_id", explode(Winnow.selection(toks, 5, 4)).as("fp"))
        .select($"doc_id", (-$"fp.nj").cast("long").as("pos"), $"fp.h")
        .write.mode("overwrite").format("noop").save()
    }

    // every fingerprint collides across all N copies: bucket sizes = N×
    // the organic count — the exact shape the star cap exists for
    val pairs = time("winnow near-dup pairs (capped buckets, worst case)") {
      val fp = docs.filter(size(toks) >= 8)
        .select($"doc_id", explode(Winnow.selection(toks, 5, 4)).as("fp"))
        .select($"doc_id", $"fp.h".as("h48"))
        .distinct().localCheckpoint()
      val n = Buckets.pairs(fp, Seq("h48"), "doc_id").count()
      val (caps, _) = Buckets.drainCapCounts()
      println(s"[stress] capped buckets: ${caps.values.sum}")
      n
    }
    println(s"[stress] candidate pairs: $pairs")

    time("novelty scores (one gram exchange + join-back)") {
      val g = docs.select($"doc_id",
          explode(SubstrDedup.gramHashes(toks, 8)).as("gh"))
        .distinct().localCheckpoint()
      val f = g.groupBy($"gh").agg(min($"doc_id").as("first_doc"))
      g.join(f, Seq("gh")).groupBy($"doc_id")
        .agg(count(lit(1)).as("n_grams"),
          sum(when($"first_doc" === $"doc_id", 1L).otherwise(0L)).as("n_novel"))
        .write.mode("overwrite").format("noop").save()
    }

    time("entropy scores (row-local scaled-long sums)") {
      def entScaled(arr: org.apache.spark.sql.Column,
          n: org.apache.spark.sql.Column) =
        aggregate(
          transform(array_distinct(arr), sym => {
            val p = size(filter(arr, x => x === sym)).cast("double") / n
            round(p * log2(p) * lit(-1000000.0d)).cast("long")
          }),
          lit(0L), (acc, v) => acc + v)
      docs.select($"doc_id",
          (entScaled(toks, size(toks).cast("double")).cast("double")
            / 1000000).as("token_entropy"))
        .write.mode("overwrite").format("noop").save()
    }

    s.stop()
  }
}
