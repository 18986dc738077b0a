package graft.tools

import org.apache.spark.sql.functions._
import graft.ops.Vectors
import graft.TestSpark

/** Scratch probe: exactness of knnHnsw vs knnBrute at verify scales
  * and recall in the genuinely-approximate regime. Run with
  * `sbt "Test/runMain graft.tools.HnswProbe"`. */
object HnswProbe {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    import spark.implicits._
    for (sf <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
        "/root/testdata/sf0.1")) {
      val emb = spark.read.parquet(s"$sf/embeddings.parquet")
        .select($"vec_id".as("id"), $"embedding".as("vec"))
      val q = emb.filter($"id" % 40 === 1)
      val brute = Vectors.knnBrute(q, emb, 5)
        .select($"qid", $"rk", $"cid").collect().map(r =>
          (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val hnsw = Vectors.knnHnsw(q, emb, 5)
        .select($"qid", $"rk", $"cid").collect().map(r =>
          (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val hnsw2 = Vectors.knnHnsw(q, emb, 5)
        .select($"qid", $"rk", $"cid").collect().map(r =>
          (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      println(s"PROBE $sf exact=${hnsw == brute} deterministic=${hnsw == hnsw2} " +
        s"nq=${q.count()} overlap=${(hnsw & brute).size}/${brute.size}")
      // approximate regime: small ef on sf0.1
      if (sf.endsWith("0.1")) {
        val approx = Vectors.knnHnsw(q, emb, 5, efSearch = 24,
            efConstruction = 48, numPartitions = 4)
          .select($"qid", $"cid").collect().map(r =>
            (r.getLong(0), r.getLong(1))).toSet
        val bruteP = brute.map(t => (t._1, t._3))
        println(s"PROBE approx ef=24 recall=${(approx & bruteP).size.toDouble / bruteP.size}")
      }
    }
    spark.stop()
  }
}
