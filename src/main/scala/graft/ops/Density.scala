package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Density clustering (DBSCAN) over integer feature points under the
  * L∞ (Chebyshev) metric, grid-blocked so the eps-neighborhood join is
  * EXACT — no LSH recall loss, no verification misses.
  *
  * The geometric identity that makes this scale: with square cells of
  * side `eps` (coordinates floor-divided by eps), two points within
  * L∞ distance eps are always in the same or in 8-adjacent cells, and
  * two points in the SAME cell are always within eps of each other.
  * That second half is the dense-cell shortcut: same-cell neighbor
  * counts come from one windowed `count` per cell (no pair rows at
  * all), and the mutual-clique edges inside a cell collapse to star
  * edges onto the cell's minimum core id — reachability-preserving,
  * the same argument [[ConnectedComponents.incremental]] uses for its
  * re-entering clusters. A skewed corpus whose density piles into one
  * hot cell therefore costs O(n) there, not O(n²); only CROSS-cell
  * candidates are enumerated (each point against 8 neighbor cells),
  * which is the inherent output-bounded cost of an exact eps-join.
  *
  * DBSCAN semantics (Ester et al., KDD'96), deterministic variant:
  * core = |eps-neighborhood incl. self| >= minPts; clusters = connected
  * components of the core-core neighbor graph labelled by min core id;
  * border points (non-core with >=1 core neighbor) attach to the MIN
  * label among their core neighbors (the classic algorithm takes
  * whichever core claims the border first — min-label makes the
  * assignment order-free); noise = -1.
  */
object Density {

  /** @param points (id: long, x: long, y: long) integer feature points,
    *               ids unique, coordinates non-negative.
    * @return (id, x, y, is_core, cluster) one row per input point;
    *         cluster = min reachable core id, or -1 for noise. */
  def dbscanGrid(points: DataFrame, eps: Long, minPts: Long): DataFrame = {
    val s = points.sparkSession
    import s.implicits._
    require(eps >= 1, s"eps must be a positive integer, got $eps")

    val wCell = Window.partitionBy($"cx", $"cy")
    // cell coords + same-cell population in ONE shuffle (window count,
    // no count-join); materialized once — probes, targets, scoring and
    // the final assembly all reuse it.
    val cells = points
      .select($"id", $"x", $"y",
        expr(s"x div $eps").as("cx"), expr(s"y div $eps").as("cy"))
      .withColumn("cell_n", count(lit(1)).over(wCell))
      .localCheckpoint()

    // Cross-cell candidates: explode each point to its 8 neighbor
    // cells and equi-join back on the target cell. Each unordered
    // cross-cell pair surfaces exactly twice (once per direction, the
    // cell delta is unique) — so directed degree counts need no
    // distinct, and the undirected edge list is the ua<ub half.
    val offsets =
      for { dx <- -1 to 1; dy <- -1 to 1 if !(dx == 0 && dy == 0) }
        yield struct(lit(dx).as("dx"), lit(dy).as("dy"))
    val probes = cells
      .select($"id".as("ua"), $"x".as("xa"), $"y".as("ya"), $"cx", $"cy")
      .withColumn("o", explode(array(offsets: _*)))
      .select($"ua", $"xa", $"ya",
        ($"cx" + $"o.dx").as("tcx"), ($"cy" + $"o.dy").as("tcy"))
    val targets = cells.select($"id".as("ub"), $"x".as("xb"), $"y".as("yb"),
      $"cx".as("tcx"), $"cy".as("tcy"))
    val cross = probes.join(targets, Seq("tcx", "tcy"))
      .filter(abs($"xa" - $"xb") <= eps && abs($"ya" - $"yb") <= eps)
      .select($"ua", $"ub")

    // |neighborhood incl. self| = same-cell population + cross-cell
    // matches; the former never materializes pair rows.
    val crossDeg = cross.groupBy($"ua").agg(count(lit(1)).as("cdeg"))
    val scored = cells
      .join(crossDeg, cells("id") === crossDeg("ua"), "left")
      .select($"id", $"x", $"y", $"cx", $"cy", $"cell_n",
        ($"cell_n" + coalesce($"cdeg", lit(0L)) >= minPts).as("is_core"))
      .localCheckpoint()
    // NOTE: `cells` stays persisted until the caller's sweep — `cross`
    // is a lazy plan over it, re-executed by the core-edge and border
    // joins below, so an eager unpersist here would drop blocks that
    // are still upstream of unexecuted plans.

    // Core graph = per-cell star edges (intra-cell core cliques) +
    // verified cross-cell core-core pairs.
    val coreCells = scored.filter($"is_core")
      .withColumn("center", min($"id").over(wCell))
    val starEdges = coreCells.filter($"id" =!= $"center")
      .select($"id".as("src"), $"center".as("dst"))
    val coreIds = scored.filter($"is_core").select($"id")
    val crossCore = cross.filter($"ua" < $"ub")
      .join(coreIds.select($"id".as("ua")), Seq("ua"), "leftsemi")
      .join(coreIds.select($"id".as("ub")), Seq("ub"), "leftsemi")
      .select($"ua".as("src"), $"ub".as("dst"))
    val cc = ConnectedComponents.run(starEdges.unionAll(crossCore))
    // isolated cores (no core neighbor anywhere) label themselves
    val coreLab = coreIds
      .join(cc, coreIds("id") === cc("id"), "left")
      .select(coreIds("id"), coalesce($"component", coreIds("id")).as("cluster"))

    // Border attachment: min core-neighbor label. Same-cell cores are
    // neighbors by the cell identity and all share one label (clique),
    // so the cell contributes its min-core's label; cross-cell core
    // neighbors contribute theirs via the pair list. least() skips
    // nulls; both absent -> noise.
    val cellLab = coreCells.groupBy($"cx", $"cy")
      .agg(min($"id").as("ccm"))
      .join(coreLab.withColumnRenamed("id", "ccm"), Seq("ccm"))
      .select($"cx", $"cy", $"cluster".as("cell_cluster"))
    val crossLab = cross
      .join(coreLab.withColumnRenamed("id", "ub"), Seq("ub"))
      .groupBy($"ua").agg(min($"cluster").as("cross_cluster"))

    scored
      .join(coreLab.withColumnRenamed("cluster", "core_cluster"),
        Seq("id"), "left")
      .join(cellLab, Seq("cx", "cy"), "left")
      .join(crossLab, scored("id") === crossLab("ua"), "left")
      .select(scored("id"), $"x", $"y", $"is_core",
        when($"is_core", $"core_cluster")
          .otherwise(coalesce(least($"cell_cluster", $"cross_cluster"),
            lit(-1L))).as("cluster"))
  }
}
