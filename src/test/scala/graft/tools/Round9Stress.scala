package graft.tools

import org.apache.spark.sql.functions._

import graft.Sessions

/** Dev-only stress for the round-9 PCA rework: replicate the sf0.1
  * embeddings N× and time the covariance sufficient statistic both
  * ways —
  *
  * - NEW: `ops/PcaMoments` one-pass outer-product Aggregator (exact
  *   scale-9 integer buffers, one dim²-sized partial per partition).
  *   Cost must grow ~linearly in rows and ship nothing row-scale.
  * - OLD (round-8 shape, reproduced here for the A/B): posexplode to
  *   (vec_id, i, v) long form, localCheckpoint, self-join on vec_id
  *   into an N·dim² intermediate, then the (i,j) agg — the exploded
  *   shuffle the rework removed.
  *
  * Run: Test/runMain graft.tools.Round9Stress [mult ...]
  */
object Round9Stress {
  private val Dim = 64

  def main(args: Array[String]): Unit = {
    val mults = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(16, 128)
    val s = Sessions.local(32)
    import s.implicits._

    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[r9stress] $tag: ${(System.nanoTime() - t0) / 1e9}%.1fs"); r
    }

    val emb0 = s.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    val n0 = emb0.count()
    def embAt(m: Int) = (0 until m).map { i =>
      emb0.select((col("vec_id") + lit(i * 1000000L)).as("vec_id"),
        col("embedding"))
    }.reduce(_ unionAll _).repartition(32)

    for (m <- mults) {
      val e = embAt(m).localCheckpoint() // isolate gen cost from both timings
      val rows = n0 * m

      val st = time(s"pca moments one-pass ${m}x ($rows rows)") {
        e.select($"embedding").as[Array[Float]]
          .select(graft.ops.PcaMoments.aggregator(Dim).toColumn).head()
      }
      require(st.n == rows, s"moments row count ${st.n} != $rows")

      val s2old = time(s"pca exploded self-join ${m}x ($rows rows)") {
        val x = e
          .select($"vec_id", posexplode($"embedding").as(Seq("p", "vfl")))
          .select($"vec_id", ($"p" + 1).as("i"), $"vfl".cast("double").as("v"))
          .localCheckpoint()
        val xa = x.select($"vec_id", $"i".as("ia"), $"v".as("va"))
        val xb = x.select($"vec_id", $"i".as("jb"), $"v".as("vb"))
        val out = xa.join(xb, "vec_id")
          .groupBy($"ia", $"jb")
          .agg(sum(round($"va" * $"vb", 9).cast("decimal(28,12)"))
            .cast("double").as("sv"))
          .collect()
        graft.ops.Checkpoints.unpersist(x)
        out
      }
      // cross-check: identical sufficient statistics from both shapes
      val prods = graft.ops.PcaMoments.squareProds(st, Dim)
      s2old.foreach { r =>
        val (i, j) = (r.getAs[Number]("ia").intValue, r.getAs[Number]("jb").intValue)
        val d = math.abs(prods(i - 1)(j - 1) - r.getAs[Double]("sv"))
        require(d == 0.0, s"s2($i,$j) mismatch by $d")
      }
      println(s"[r9stress] ${m}x cross-check: all ${s2old.length} cells exact-equal")

      // Graph edge build (the round-8 fix): LSH-banded candidates
      // through the capped Buckets.pairs scaffold + exact cosine
      // verify. Must grow ~linearly in rows — the label-quadratic
      // shape it replaced grew with the square of the label sizes.
      val edges = time(s"lsh label edge build ${m}x ($rows rows)") {
        graft.queries.Similarity.lshLabelEdges(
          e.withColumn("label", (col("vec_id") % 7).cast("int")),
          threshold = 0.35).count()
      }
      println(s"[r9stress] ${m}x edges: $edges")
      graft.ops.Checkpoints.unpersist(e)
    }
    s.stop()
  }
}
