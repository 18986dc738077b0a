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

  /** DEGREE-ORDERED edge orientation (Ortmann & Brandes / the classic
    * compact-forward preprocessing): orient every undirected edge from
    * its lower-(degree, id) endpoint to the higher. Out-degrees under
    * this order are bounded by O(√m), so wedge enumeration over
    * out-neighbor pairs does O(m^1.5) work REGARDLESS of hubs — a
    * star's center has out-degree 0 (every spoke has lower degree and
    * points at it), where id-ordered wedges would go quadratic on the
    * hub. Input: unique undirected pairs (src, dst). Output: directed
    * (src, dst, dord) with dord = the destination's (degree, id)
    * struct, carried so the wedge join can order endpoints without
    * another degree lookup. */
  def orientByDegree(edges: DataFrame): DataFrame = {
    val e = edges.select(col("src"), col("dst"))
    val deg = e.select(col("src").as("id"))
      .unionAll(e.select(col("dst").as("id")))
      .groupBy(col("id")).agg(count(lit(1)).as("d"))
    e.join(deg.select(col("id").as("src"), col("d").as("ds")), Seq("src"))
      .join(deg.select(col("id").as("dst"), col("d").as("dd")), Seq("dst"))
      .select(
        when(struct(col("ds"), col("src")) < struct(col("dd"), col("dst")),
          col("src")).otherwise(col("dst")).as("src"),
        when(struct(col("ds"), col("src")) < struct(col("dd"), col("dst")),
          col("dst")).otherwise(col("src")).as("dst"),
        when(struct(col("ds"), col("src")) < struct(col("dd"), col("dst")),
          struct(col("dd").as("d"), col("dst").as("id")))
          .otherwise(struct(col("ds").as("d"), col("src").as("id")))
          .as("dord"))
  }

  /** Exactly-once triangle enumeration via degree-ordered wedges: with
    * every edge oriented low≺high by (degree, id), a triangle a≺b≺c
    * carries directed edges a→b, a→c, b→c and is found ONCE as the
    * wedge (b, c) at a closed by b→c. Returns one row (a, b, c) per
    * triangle — the SAME triangle set as id-ordered enumeration (so
    * downstream per-node counts and any id-ordered oracle are
    * unchanged), at hub-proof O(m^1.5) wedge cost.
    *
    * @param edges unique undirected pairs (src, dst). */
  def trianglesOrdered(edges: DataFrame): DataFrame = {
    val dir = orientByDegree(edges).localCheckpoint()
    dir.as("e1")
      .join(dir.as("e2"),
        col("e2.src") === col("e1.src") && col("e1.dord") < col("e2.dord"))
      .join(dir.as("e3"),
        col("e3.src") === col("e1.dst") && col("e3.dst") === col("e2.dst"))
      .select(col("e1.src").as("a"), col("e1.dst").as("b"),
        col("e2.dst").as("c"))
  }
}
