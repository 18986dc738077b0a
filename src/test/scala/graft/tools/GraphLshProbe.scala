package graft.tools

import org.apache.spark.sql.functions._

import graft.Sessions
import graft.ops.{Buckets, Vectors}

/** Dev-only probe: does the 16-bit/4-band hyperplane LSH candidate set
  * cover every label-blocked edge at the graph-family thresholds
  * (0.35 PageRank, 0.2 triangles)? Measures missed edges per SF. */
object GraphLshProbe {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(8)
    import spark.implicits._
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val dir = s"/root/testdata/$sf"
      val emb = graft.Tables.load(spark, dir, "embeddings")
        .select($"vec_id", $"embedding", $"label")
        .withColumn("n", Vectors.norm($"embedding"))
        .localCheckpoint()
      val a = emb.select($"label", $"vec_id".as("id_a"),
        $"embedding".as("va"), $"n".as("na"))
      val b = emb.select($"label", $"vec_id".as("id_b"),
        $"embedding".as("vb"), $"n".as("nb"))
      val scored = a.join(b, Seq("label"))
        .filter($"id_a" < $"id_b")
        .withColumn("cos", Vectors.cosine($"va", $"vb", $"na", $"nb"))
        .select($"id_a", $"id_b", $"cos")
        .localCheckpoint()
      // LSH candidates (uncapped here to isolate band recall from cap)
      val banded = emb
        .withColumn("sig", Vectors.hyperplaneSignature($"embedding", 16, 64))
        .select($"vec_id",
          posexplode(transform(sequence(lit(0), lit(3)), bnd =>
            aggregate(slice($"sig", bnd * 4 + 1, lit(4)),
              lit(0), (acc, v) => acc * 2 + v))).as(Seq("band", "key")))
      val cand = Buckets.pairs(banded, Seq("band", "key"), "vec_id",
          maxBucket = 1000000)
        .localCheckpoint()
      for (thr <- Seq(0.35, 0.2)) {
        val edges = scored.filter($"cos" >= thr)
        val nEdges = edges.count()
        val missed = edges.join(cand, Seq("id_a", "id_b"), "left_anti").count()
        println(s"PROBE $sf thr=$thr edges=$nEdges missedByLsh=$missed")
      }
      // bucket-size profile: how big do band buckets get?
      val bs = banded.groupBy($"band", $"key").count()
        .agg(max($"count").as("maxBucket"), expr("percentile(count, 0.99)"))
        .collect()(0)
      println(s"PROBE $sf bucketMax=${bs.get(0)} p99=${bs.get(1)}")
      // triangle yield on the LSH-candidate same-label verified graph
      val lbl = emb.select($"vec_id", $"label")
      val vedges = cand
        .join(scored, Seq("id_a", "id_b"))  // scored is label-blocked already
        .filter($"cos" >= 0.2)
        .select($"id_a".as("src"), $"id_b".as("dst"))
        .localCheckpoint()
      val tri = vedges.as("e1")
        .join(vedges.as("e2"), col("e2.src") === col("e1.dst"))
        .join(vedges.as("e3"),
          col("e3.src") === col("e1.src") && col("e3.dst") === col("e2.dst"))
        .count()
      val pr35 = cand.join(scored, Seq("id_a", "id_b"))
        .filter($"cos" >= 0.35).count()
      println(s"PROBE $sf lshEdges@0.2=${vedges.count()} triangles=$tri lshEdges@0.35=$pr35")
    }
    spark.stop()
  }
}
