package graft.tools

import org.apache.spark.sql.functions._

import graft.Sessions

/** Dev-only scale curves for the graph/density tail (VERDICT r9
  * directive #7): back the "hot cell costs O(n), not O(n²)" DBSCAN
  * claim and the mutual-kNN Σ|cell|² bound with recorded numbers, the
  * way IncrementalCcStress backs the components merge.
  *
  * Three curves, each grown 4× per step so linear cost ≈ 4× per row:
  *
  *  1. DBSCAN hot cell: ONE cell holds n points (plus a sparse
  *     background so the plan isn't degenerate). The census is a
  *     window count and intra-cell core edges are a star to the cell
  *     min — no pair row ever materializes for the dense cell, so the
  *     curve must track n, not n².
  *  2. DBSCAN tiling: the sf0.1 user-feature points replicated m× into
  *     DISJOINT coordinate tiles — density constant, cell count grows.
  *     Work is Σ over cells of (census + bounded cross pairs): linear
  *     in tiles.
  *  3. Mutual-kNN: sf0.1 embeddings replicated m× into FRESH label
  *     blocks (cell size pinned at the base 200) — scoring is
  *     Σ|cell|² = m · 200², linear in m; the reciprocal join is k·n.
  *
  * Run: Test/runMain graft.tools.Round10Stress
  */
object Round10Stress {
  def main(args: Array[String]): Unit = {
    val s = Sessions.local(32)
    import s.implicits._
    def time(tag: String)(f: => Long): Double = {
      val t0 = System.nanoTime(); val n = f
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[r10stress] $tag: $dt%.1fs ($n rows)")
      dt
    }

    // -- 1. hot cell: n stacked points in one eps-cell + n/10 sparse
    println("[r10stress] == dbscan hot-cell curve (one dense cell) ==")
    for (n <- Seq(100000L, 400000L, 1600000L)) {
      val hot = s.range(n).select($"id",
        (lit(5L) + $"id" % 2).as("x"), (lit(5L) + expr("(id div 2) % 2")).as("y"))
      // background: 1 point per distant cell, ids disjoint
      val bg = s.range(n / 10).select(($"id" + 10000000L).as("id"),
        ($"id" * 7L + 1000L).as("x"), ($"id" * 11L + 1000L).as("y"))
      val pts = hot.unionAll(bg).repartition(32).localCheckpoint()
      time(s"hot-cell n=$n") {
        graft.ops.Density.dbscanGrid(pts, eps = 10L, minPts = 4L)
          .filter($"cluster" >= 0).count()
      }
      graft.ops.Checkpoints.unpersist(pts)
      graft.ops.Checkpoints.sweepAll(s)
    }

    // -- 2. tiling: sf0.1 user feats replicated into disjoint tiles
    println("[r10stress] == dbscan tiling curve (constant density) ==")
    val feats0 = graft.queries.Events.load(s, "/root/testdata/sf0.1")
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n"),
        floor(sum($"value".cast("decimal(18,6)"))).cast("long").as("fs"),
        sum(when($"event_type" === "purchase", 1L).otherwise(0L)).as("np"))
      .select($"user_id".as("id"), expr("fs div n").as("x"),
        expr("(100 * np) div n").as("y"))
      .as[(Long, Long, Long)].collect().toSeq // 1500 rows: driver-safe,
      // immune to the per-step sweepAll below
    val span = 1000000L // > any base coordinate: tiles never touch
    for (m <- Seq(8, 32, 128)) {
      val pts = (0 until m).flatMap { i =>
        feats0.map { case (id, x, y) =>
          (id + i * 10000000L, x + i * span, y) }
      }.toDF("id", "x", "y").repartition(32).localCheckpoint()
      time(s"tiling m=$m") {
        graft.ops.Density.dbscanGrid(pts, eps = 1L, minPts = 4L)
          .filter($"cluster" >= 0).count()
      }
      graft.ops.Checkpoints.unpersist(pts)
      graft.ops.Checkpoints.sweepAll(s)
    }

    // -- 3. mutual-kNN: embeddings replicated into fresh label blocks
    println("[r10stress] == mutual-knn curve (cell size pinned at 200) ==")
    val emb0 = s.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
      .select($"vec_id", $"embedding", $"label")
    for (m <- Seq(8, 32, 128)) {
      val emb = (0 until m).map { i =>
        emb0.select(($"vec_id" + i * 1000000L).as("id"),
          $"embedding".as("vec"),
          concat($"label", lit(s"_$i")).as("label"))
      }.reduce(_ unionAll _).repartition(32).localCheckpoint()
      time(s"mutual-knn m=$m (${2000L * m} vecs)") {
        val knn = graft.ops.Vectors.knnAllCell(emb, "label", 5)
          .localCheckpoint()
        val mut = knn.select($"qid".as("id_a"), $"cid".as("id_b"))
          .join(knn.select($"cid".as("id_a"), $"qid".as("id_b")),
            Seq("id_a", "id_b"))
          .filter($"id_a" < $"id_b")
        val n = mut.count()
        graft.ops.Checkpoints.unpersist(knn)
        n
      }
      graft.ops.Checkpoints.unpersist(emb)
      graft.ops.Checkpoints.sweepAll(s)
    }
    s.stop()
  }
}
