package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Level-synchronous graph traversal primitives over a (src, dst) edge
  * frame — the missing shape between [[ConnectedComponents]] (global
  * fixed point) and the PageRank rounds (value propagation): BFS wants
  * the MINIMUM hop per vertex, so each round expands only the CURRENT
  * FRONTIER and discards anything already reached.
  */
object Graphs {

  /** Breadth-first hop counts from `seed` over directed `edges`
    * (columns src, dst), up to `maxHops` levels. Returns (vid, hop)
    * for every vertex reachable within the budget, hop = minimum
    * number of edges from the seed set (seed rows are hop 0).
    *
    * Each round is ONE equi-join of the frontier against edges plus
    * one anti-join against the reached set — never a join against the
    * cumulative reach, and never more rows in flight than the frontier
    * × mean degree. Superseded round checkpoints unpersist as soon as
    * the next round materializes (the PageRank loop discipline), so a
    * long traversal holds at most two rounds of block-manager state.
    *
    * `maxHops` is a FIXED budget, not a convergence test: a declared
    * plan needs a bounded number of stages, and the caller decides how
    * far reachability is worth materializing (diameter rounds at 100×
    * would be data-dependent). */
  def bfsHops(edges: DataFrame, seed: DataFrame, maxHops: Int): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val e = edges.select(col("src"), col("dst"))
    var frontier = seed.select(col("vid")).distinct().localCheckpoint()
    var reached = frontier.select($"vid", lit(0L).as("hop")).localCheckpoint()
    for (h <- 1 to maxHops) {
      val next = e
        .join(frontier.withColumnRenamed("vid", "src"), Seq("src"))
        .select($"dst".as("vid")).distinct()
        .join(reached.select($"vid"), Seq("vid"), "left_anti")
        .localCheckpoint()
      Checkpoints.unpersist(frontier)
      val prevReached = reached
      reached = reached
        .unionAll(next.select($"vid", lit(h.toLong).as("hop")))
        .localCheckpoint()
      Checkpoints.unpersist(prevReached)
      frontier = next
    }
    Checkpoints.unpersist(frontier)
    reached
  }
}
