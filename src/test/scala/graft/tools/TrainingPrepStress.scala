package graft.tools

import org.apache.spark.sql.functions._

import graft.Sessions
import graft.ops.{Skew, SubstrDedup, Text}

/** Dev-only stress for the round-6 training-prep family: replicate
  * sf0.1 documents 8× (40k docs; identical text per copy — the dup-span
  * worst case, every position duplicated) and time each operator's
  * corpus-scale path. */
object TrainingPrepStress {
  def main(args: Array[String]): Unit = {
    val factor = args.headOption.map(_.toInt).getOrElse(8)
    val s = Sessions.local(32)
    import s.implicits._
    val docs0 = s.read.parquet("/root/testdata/sf0.1/documents.parquet")
    val docs = (0 until factor).map { i =>
      docs0.select((col("doc_id") + lit(i * 1000000L)).as("doc_id"),
        col("text"), col("lang"), col("source"), col("n_chars"))
    }.reduce(_ unionAll _).localCheckpoint()
    println(s"[stress] corpus: ${docs.count()} docs")
    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[stress] $tag: ${(System.nanoTime() - t0) / 1e9}%.1fs"); r
    }

    val spans = time("dup spans (8-gram, worst case: all text duplicated)") {
      SubstrDedup.dupSpans(
        docs.select($"doc_id", Text.tokens($"text").as("l")),
        "doc_id", "l", n = 8, minDocs = 2).count()
    }
    println(s"[stress] spans: $spans")

    // noop writes, not count(): count() lets Catalyst eliminate the
    // final outer join and prune the md5 reassembly — the Bench rule
    time("dup-span REMOVAL (worst case: rebuild all docs)") {
      SubstrDedup.removeDupSpans(
        docs.select($"doc_id", Text.tokens($"text").as("l")),
        "doc_id", "l", n = 8, minDocs = 2)
        .write.mode("overwrite").format("noop").save()
    }

    time("intra-doc dup fraction") {
      SubstrDedup.intraDupFraction(
        docs.select($"doc_id", Text.tokens($"text").as("l")),
        "doc_id", "l", n = 4)
        .write.mode("overwrite").format("noop").save()
    }

    val lm = time("unigram LM score") {
      val tok = docs.select($"doc_id", explode(Text.tokens($"text")).as("w"))
      val vocab = tok.groupBy($"w").agg(count(lit(1)).as("c"))
      val tot = vocab.agg(sum($"c").cast("long").as("total"))
      tok.join(vocab, "w").crossJoin(broadcast(tot))
        .withColumn("lp",
          round(log10($"c".cast("double") / $"total".cast("double")), 6)
            .cast("decimal(18,6)"))
        .groupBy($"doc_id")
        .agg(count(lit(1)).as("n_tok"),
          round(sum($"lp").cast("double") / count(lit(1)), 6).as("s"))
        .count()
    }
    println(s"[stress] lm rows: $lm")

    val packed = time("shard packing prefix sum") {
      Skew.prefixSumByKey(
        docs.select($"doc_id", $"lang",
          Text.wordCount($"text").cast("long").as("n_tok")),
        "lang", Seq($"doc_id"), $"n_tok", "cum").count()
    }
    println(s"[stress] packed rows: $packed")

    val sampled = time("stratified sample (TopK, k=1000)") {
      val k = 1000
      docs.select($"lang",
        conv(substring(md5($"doc_id".cast("string")), 1, 12), 16, 10)
          .cast("long").as("h48"), $"doc_id")
        .as[(String, Long, Long)]
        .groupByKey(_._1)
        .mapValues(t => (-t._2.toDouble, t._3))
        .agg(graft.ops.TopK.aggregator(k).toColumn)
        .flatMap { case (lang, hits) => hits.iterator.map(h => (lang, h._2)) }
        .count()
    }
    println(s"[stress] sampled: $sampled")

    // BM25 index economics: ONE build pass over text, then queries
    // never touch the corpus — time both halves separately.
    val idxDir = java.nio.file.Files
      .createTempDirectory("graft_stress_bm25").toString
    time("bm25 index BUILD (the only text pass)") {
      graft.queries.Retrieval.buildIndex(s, "", idxDir, Some(docs))
    }
    val ranked = time("bm25 QUERY from stored index (no corpus scan)") {
      graft.queries.Retrieval.scoreIndex(s,
        s.read.parquet(s"$idxDir/tf"),
        s.read.parquet(s"$idxDir/dl"),
        s.read.parquet(s"$idxDir/df"),
        s.read.parquet(s"$idxDir/stats")).count()
    }
    println(s"[stress] bm25 ranked rows: $ranked")
    s.stop()
  }
}
