package graft.tools

import org.apache.spark.sql.functions._
import graft.ops.Vectors
import graft.TestSpark

/** Stress curve: HNSW build + serve cost vs corpus size on synthetic
  * 32-dim vectors, with brute-force as the honesty baseline — records
  * where the graph index starts paying for itself and what recall the
  * approximate regime gives at production-ish ef. */
object HnswStress {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    import spark.implicits._
    val dim = 32
    for (n <- Seq(2000, 20000, 100000)) {
      val corpus = spark.range(n.toLong)
        .select($"id", transform(sequence(lit(1), lit(dim)),
          d => (pmod(xxhash64($"id" * lit(131) + d), lit(2000)) - 1000)
            .cast("float") / 1000f).cast("array<float>").as("vec"))
        .localCheckpoint()
      val queries = corpus.filter($"id" % (n / 50) === 1) // 50 queries
      def time(body: => Unit): Double = {
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
      }
      // brute baseline
      val bt = time {
        Vectors.knnBrute(queries, corpus, 10)
          .write.mode("overwrite").format("noop").save()
      }
      val exact = Vectors.knnBrute(queries, corpus, 10)
        .select($"qid", $"cid").as[(Long, Long)].collect().toSet
      // build-once cost (stored-index path)
      val idxDir = java.nio.file.Files
        .createTempDirectory(s"graft_hnsw_stress_$n").toString
      val build = time {
        Vectors.hnswWriteIndex(corpus, idxDir, m = 12,
          efConstruction = 96, numPartitions = 16)
      }
      // serve from stored at production-ish ef (approximate regime)
      val serve = time {
        Vectors.knnHnswStored(spark, idxDir, queries, 10, efSearch = 96)
          .write.mode("overwrite").format("noop").save()
      }
      val got = Vectors.knnHnswStored(spark, idxDir, queries, 10,
          efSearch = 96)
        .select($"qid", $"cid").as[(Long, Long)].collect().toSet
      val recall = (got intersect exact).size.toDouble / exact.size
      println(f"STRESS n=$n%7d brute=$bt%6.2fs build=$build%6.2fs " +
        f"serve=$serve%6.2fs recall@10=$recall%.3f " +
        f"perPart=${n / 16}%d ef=96")
      // query-volume sweep at the largest corpus: brute scales with
      // nq x corpus, the index with nq x (beam work) — the separation
      // that justifies paying the one-time build
      if (n == 100000) {
        val manyQ = corpus.filter($"id" % 50 === 1) // 2000 queries
        val bt2 = time {
          Vectors.knnBrute(manyQ, corpus, 10)
            .write.mode("overwrite").format("noop").save()
        }
        val sv2 = time {
          Vectors.knnHnswStored(spark, idxDir, manyQ, 10, efSearch = 96)
            .write.mode("overwrite").format("noop").save()
        }
        println(f"STRESS n=$n%7d nq=2000 brute=$bt2%6.2fs " +
          f"serveStored=$sv2%6.2fs speedup=${bt2 / sv2}%.1fx")
      }
    }
  }
}
