package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
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
  * candidates are enumerated — and at DISTINCT-COORDINATE granularity
  * (each unique (x,y) against 8 neighbor cells, carrying its
  * multiplicity), because co-located points have identical
  * eps-neighborhoods: coincident mass (bot traffic, replicated users)
  * costs the join its coordinate count, never a quadratic pair count.
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

  /** Everything the batch solve knows, kept for incremental updates:
    * per-point census + core flags, the core labelling, and each
    * non-core point's core-neighbor components (the "anchor" pairs
    * that let borders re-label under cluster merges without a new
    * neighborhood search). */
  private[graft] final case class DbscanState(
      scored: DataFrame,      // (id, x, y, cx, cy, cell_n, is_core)
      coreLabels: DataFrame,  // (id, cluster) — core points only
      anchorPairs: DataFrame, // (id, comp) — per non-core point, the
                              //   components of its core neighbors
      labels: DataFrame)      // (id, x, y, is_core, cluster)

  private def cellCols(eps: Long)(df: DataFrame): DataFrame =
    df.select(col("id"), col("x"), col("y"),
      expr(s"x div $eps").as("cx"), expr(s"y div $eps").as("cy"))

  /** The 8 neighbor-cell offsets (no center — same-cell candidates are
    * handled by the cell census, never enumerated). */
  private val crossOffsets =
    for { dx <- -1 to 1; dy <- -1 to 1 if !(dx == 0 && dy == 0) }
      yield (dx, dy)

  private def offsetArray(offs: Seq[(Int, Int)]): Column =
    array(offs.map { case (dx, dy) =>
      struct(lit(dx).as("dx"), lit(dy).as("dy"))
    }: _*)

  /** Directed cross-cell eps-pairs: each `probes` point against all
    * `targets` points in its 8 adjacent cells (never the same cell).
    * Each unordered pair surfaces once per direction present in the
    * probe set — the cell delta is unique, so no dedup is needed for
    * degree counting. */
  private def crossPairs(probes: DataFrame, targets: DataFrame,
      eps: Long): DataFrame = {
    val p = probes
      .select(col("id").as("ua"), col("x").as("xa"), col("y").as("ya"),
        col("cx"), col("cy"))
      .withColumn("o", explode(offsetArray(crossOffsets)))
      .select(col("ua"), col("xa"), col("ya"),
        (col("cx") + col("o.dx")).as("tcx"),
        (col("cy") + col("o.dy")).as("tcy"))
    val t = targets.select(col("id").as("ub"), col("x").as("xb"),
      col("y").as("yb"), col("cx").as("tcx"), col("cy").as("tcy"))
    p.join(t, Seq("tcx", "tcy"))
      .filter(abs(col("xa") - col("xb")) <= eps &&
        abs(col("ya") - col("yb")) <= eps)
      .select(col("ua"), col("ub"))
  }

  /** Full solve retaining internals — see [[dbscanGrid]] for the
    * public contract. */
  private[graft] def solve(points: DataFrame, eps: Long,
      minPts: Long): DbscanState = {
    val s = points.sparkSession
    import s.implicits._
    require(eps >= 1, s"eps must be a positive integer, got $eps")

    val wCell = Window.partitionBy($"cx", $"cy")
    // cell coords + same-cell population in ONE shuffle (window count,
    // no count-join); materialized once — probes, targets, scoring and
    // the final assembly all reuse it. localCheckpoint here is
    // INTENTIONALLY eager: downstream broadcast planning needs real
    // sizes for this frame, and removing the eager cut was measured at
    // ~2x slower (see ARCHITECTURE.md, commit 2c70acc). Do not swap
    // for a lazy persist().
    val cells = cellCols(eps)(points)
      .withColumn("cell_n", count(lit(1)).over(wCell))
      .localCheckpoint()

    // COORDINATE COLLAPSE before the eps-join (r14 scale fix): all
    // points sharing (x, y) have IDENTICAL eps-neighborhoods, so the
    // cross-cell join runs at DISTINCT-coordinate granularity with
    // multiplicities — a corpus whose mass piles onto coincident
    // coordinates (bot traffic, replicated users) costs the join its
    // coordinate count, not its row count. The per-point form OOMed
    // (not spilled: execution memory exhausted under the checkpointed
    // pair blob) on the 64× upsample through exactly this blowup —
    // pair rows between adjacent dense cells grow QUADRATICALLY in the
    // co-located mass (4096× at 64×), while this form stays flat.
    // rep = min id at the coordinate; w = multiplicity.
    val uniq = cells.groupBy($"cx", $"cy", $"x", $"y")
      .agg(min($"id").as("id"), count(lit(1)).as("w"))
      .localCheckpoint()

    // The eps-join is the expensive frame and THREE consumers scan it
    // (degree count, core-core edges, border anchors) — cache it once
    // instead of re-running the explode+join per consumer. Output-
    // bounded (the exact coordinate-level eps-pair list), recomputable,
    // evictable.
    val cross = crossPairs(uniq, uniq, eps).localCheckpoint()

    // |neighborhood incl. self| = same-cell population + weighted
    // cross-cell matches; neither materializes per-point pair rows.
    val crossDegU = cross
      .join(uniq.select($"id".as("ub"), $"w".as("wb")), Seq("ub"))
      .groupBy($"ua").agg(sum($"wb").as("cdeg"))
    val uniqDeg = uniq.select($"id".as("rep"), $"x", $"y")
      .join(crossDegU.withColumnRenamed("ua", "rep"), Seq("rep"), "left")
      .select($"x", $"y", coalesce($"cdeg", lit(0L)).as("cdeg"))
    val scored = cells
      .join(uniqDeg, Seq("x", "y"), "left")
      .select($"id", $"x", $"y", $"cx", $"cy", $"cell_n",
        ($"cell_n" + coalesce($"cdeg", lit(0L)) >= minPts).as("is_core"))
      .localCheckpoint()

    // Core graph = per-cell star edges (intra-cell core cliques) +
    // verified cross-cell core-core REP pairs. Rep granularity keeps
    // connectivity exact: co-located cores share a cell, so the star
    // edges already chain them to the cell center; only one
    // representative per coordinate needs the cross-cell edge. The
    // component VERTEX sets (and hence min-id labels) are unchanged —
    // a non-rep core always sits in a multi-core cell (its coordinate
    // holds ≥ 2 points) and rides a star edge.
    val coreCells = scored.filter($"is_core")
      .withColumn("center", min($"id").over(wCell))
    val starEdges = coreCells.filter($"id" =!= $"center")
      .select($"id".as("src"), $"center".as("dst"))
    val coreIds = scored.filter($"is_core").select($"id")
    val coreRepIds = uniq.select($"id")
      .join(coreIds, Seq("id"), "leftsemi")
    val crossCore = cross.filter($"ua" < $"ub")
      .join(coreRepIds.select($"id".as("ua")), Seq("ua"), "leftsemi")
      .join(coreRepIds.select($"id".as("ub")), Seq("ub"), "leftsemi")
      .select($"ua".as("src"), $"ub".as("dst"))
    val cc = ConnectedComponents.run(starEdges.unionAll(crossCore))
    // isolated cores (no core neighbor anywhere) label themselves
    val coreLab = coreIds
      .join(cc, coreIds("id") === cc("id"), "left")
      .select(coreIds("id"),
        coalesce($"component", coreIds("id")).as("cluster"))

    // Anchor pairs: for every NON-core point, the component of each
    // core neighbor. Same-cell cores are neighbors by the cell
    // identity and all share one label (clique), so the cell
    // contributes its min-core's label; cross-cell core neighbors
    // contribute theirs via the pair list.
    val cellLab = coreCells.groupBy($"cx", $"cy")
      .agg(min($"id").as("ccm"))
      .join(coreLab.withColumnRenamed("id", "ccm"), Seq("ccm"))
      .select($"cx", $"cy", $"cluster".as("comp"))
    val nonCore = scored.filter(!$"is_core")
    val cellAnchor = nonCore.join(cellLab, Seq("cx", "cy"))
      .select($"id", $"comp")
    // cross anchors at rep granularity (co-located cores share one
    // cluster, so the per-point neighbor-comp SET is unchanged), then
    // expanded back to every point at the border coordinate.
    val nonCoreRepIds = uniq.select($"id")
      .join(nonCore.select($"id"), Seq("id"), "leftsemi")
    val crossAnchorU = cross
      .join(nonCoreRepIds.select($"id".as("ua")), Seq("ua"), "leftsemi")
      .join(coreLab.withColumnRenamed("id", "ub"), Seq("ub"))
      .select($"ua", $"cluster".as("comp"))
    val crossAnchor = crossAnchorU
      .join(uniq.select($"id".as("ua"), $"x", $"y"), Seq("ua"))
      .join(nonCore.select($"id", $"x", $"y"), Seq("x", "y"))
      .select($"id", $"comp")
    val anchorPairs = cellAnchor.unionAll(crossAnchor)

    // Assembly: cores from the CC labelling; borders take the min
    // anchor component; anchor-less non-cores are noise.
    val borderLab = anchorPairs.groupBy($"id")
      .agg(min($"comp").as("border_cluster"))
    val labels = scored
      .join(coreLab.withColumnRenamed("cluster", "core_cluster"),
        Seq("id"), "left")
      .join(borderLab, Seq("id"), "left")
      .select(scored("id"), $"x", $"y", $"is_core",
        when($"is_core", $"core_cluster")
          .otherwise(coalesce($"border_cluster", lit(-1L))).as("cluster"))
    DbscanState(scored, coreLab, anchorPairs, labels)
  }

  /** @param points (id: long, x: long, y: long) integer feature points,
    *               ids unique, coordinates non-negative.
    * @return (id, x, y, is_core, cluster) one row per input point;
    *         cluster = min reachable core id, or -1 for noise. */
  def dbscanGrid(points: DataFrame, eps: Long, minPts: Long): DataFrame =
    solve(points, eps, minPts).labels

  /** INCREMENTAL DBSCAN: merge a batch of new points into an existing
    * clustering, touching only the batch's neighborhood — provably
    * equal to a full recompute over base ∪ batch (points never leave a
    * cluster when the corpus only grows: degrees are monotone, so
    * cores stay core and components only merge; every change is
    * therefore reachable from the batch).
    *
    * Locality argument, in cell units (cells of side eps): batch
    * points can only touch degrees in HALO-1 (cells adjacent to a
    * batch cell — beyond it nothing is within eps of the batch);
    * newly-core points live in halo-1, so new core-core edges have an
    * endpoint in halo-1 and the other within halo-2; and a border
    * outside halo-1 keeps its exact neighbor COUNT but may gain a
    * newly-core NEIGHBOR (halo-2) or see its cluster renamed by a
    * merge (anywhere). The per-batch work is then:
    *   1. degrees recomputed for halo-1 ∪ batch only (cell census +
    *      cross pairs against halo-2 ∪ batch) — batch-proportional;
    *   2. the new-edge set (halo-1 star cells + verified cross pairs)
    *      into [[ConnectedComponents.incremental]] — batch-proportional
    *      plus affected components;
    *   3. borders in halo-1 ∪ batch re-anchor locally; borders outside
    *      re-label by JOINING their stored anchor components through
    *      the label-rename map (old label → new component of that
    *      label node) and min-ing in any newly-core neighbor — one
    *      broadcast-sized rename join over the stored anchor pairs,
    *      never a new neighborhood search.
    * The base corpus is scanned (linear) but never re-paired.
    *
    * @param basePoints (id, x, y) the already-clustered corpus.
    * @param batch (id, x, y) new points. Ids MUST be disjoint from the
    *              base — ENFORCED with a loud failure: growth is the
    *              contract, and updates/deletions (the non-monotone
    *              cases that can demote cores and split components)
    *              require a full re-solve.
    * @return (id, x, y, is_core, cluster) over base ∪ batch, equal to
    *         `dbscanGrid(base ∪ batch, eps, minPts)`. */
  def dbscanGridIncremental(basePoints: DataFrame, batch: DataFrame,
      eps: Long, minPts: Long): DataFrame =
    incrementalState(solve(basePoints, eps, minPts), batch, eps,
      minPts).labels

  /** State-in/state-out form of [[dbscanGridIncremental]], so a stream
    * can FOLD batches: each call returns the complete post-batch
    * [[DbscanState]] (census, core labelling, border anchors, labels),
    * ready to be the base of the next batch. Chaining invariant: the
    * state after any prefix of batches equals `solve` over the union
    * of those batches — each component (cell census, core flags,
    * labels, anchor pairs) is rebuilt where touched and carried (or
    * renamed) where provably unchanged. */
  private[graft] def incrementalState(base: DbscanState, batch: DataFrame,
      eps: Long, minPts: Long): DbscanState = {
    val s = batch.sparkSession
    import s.implicits._
    val scored = base.scored // cached by solve / checkpointed by prior fold

    // persist(), not localCheckpoint: per-fold frames derived from the
    // batch input have shallow lineage (no fold-chain growth), so this
    // is reuse-caching — the state carriers that DO chain across folds
    // (probes → scoredOut, newLabels) keep their eager checkpoints.
    val bat = cellCols(eps)(batch).persist()
    // DELETION (and point replacement) is OUT OF CONTRACT — the one
    // non-monotone case: removing mass can demote cores and SPLIT
    // components, which no halo-local repair can prove equal to a full
    // recompute (the equality invariant this op's tests pin). A batch
    // id that already exists in the base would silently act as "move/
    // re-send", violating that invariant — reject it loudly. The probe
    // broadcasts the (batch-sized) id set into one linear scan of the
    // stored census: no shuffle, batch-proportional like every other
    // per-fold frame here. Deletions require a full re-solve by design.
    val collision = scored.select($"id")
      .join(broadcast(bat.select($"id")), Seq("id"), "leftsemi")
    require(collision.isEmpty,
      "dbscanGridIncremental: batch re-sends id(s) already in the base " +
        s"(e.g. ${collision.limit(3).as[Long].collect().mkString(", ")}); " +
        "updates/deletions are out of contract — re-solve from scratch " +
        "or assign fresh ids")
    val batCellCnt = bat.groupBy($"cx", $"cy")
      .agg(count(lit(1)).as("bn"))

    // halo cell frames: batch cells grown by 1 and 2 rings — batch-
    // proportional, broadcast into every restriction join.
    val growOffsets = for { dx <- -1 to 1; dy <- -1 to 1 } yield (dx, dy)
    def grow(cells: DataFrame): DataFrame = cells
      .withColumn("o", explode(offsetArray(growOffsets)))
      .select(($"cx" + $"o.dx").as("cx"), ($"cy" + $"o.dy").as("cy"))
      .distinct()
    val halo1 = grow(bat.select($"cx", $"cy").distinct()).persist()
    val halo2 = grow(halo1).persist()

    val oldH1 = scored.join(broadcast(halo1), Seq("cx", "cy"), "leftsemi")
    val oldH2 = scored.join(broadcast(halo2), Seq("cx", "cy"), "leftsemi")
    val oldOut = scored.join(broadcast(halo1), Seq("cx", "cy"), "leftanti")

    // Recomputed census for the probe region: post-batch cell totals
    // (old cell_n + batch arrivals; batch cells may have no old rows).
    val oldCellCnt = oldH1.select($"cx", $"cy", $"cell_n").distinct()
    val probePts = oldH1
      .select($"id", $"x", $"y", $"cx", $"cy", $"cell_n",
        $"is_core".as("was_core"))
      .join(broadcast(batCellCnt), Seq("cx", "cy"), "left")
      .select($"id", $"x", $"y", $"cx", $"cy",
        ($"cell_n" + coalesce($"bn", lit(0L))).as("tot_n"), $"was_core",
        lit(true).as("is_old"))
      .unionAll(bat
        .join(broadcast(oldCellCnt), Seq("cx", "cy"), "left")
        .join(broadcast(batCellCnt), Seq("cx", "cy"))
        .select($"id", $"x", $"y", $"cx", $"cy",
          (coalesce($"cell_n", lit(0L)) + $"bn").as("tot_n"),
          lit(false).as("was_core"), lit(false).as("is_old")))

    val targetPts = oldH2.select($"id", $"x", $"y", $"cx", $"cy")
      .unionAll(bat.select($"id", $"x", $"y", $"cx", $"cy"))
    val cross = crossPairs(probePts, targetPts, eps)
    val crossDeg = cross.groupBy($"ua").agg(count(lit(1)).as("cdeg"))
    val probes = probePts
      .join(crossDeg, probePts("id") === crossDeg("ua"), "left")
      .select($"id", $"x", $"y", $"cx", $"cy", $"was_core", $"is_old",
        $"tot_n".as("cell_n"), // the post-batch census for this cell
        ($"tot_n" + coalesce($"cdeg", lit(0L)) >= minPts).as("is_core"))
      .localCheckpoint()

    // Post-batch core flags for the target region (halo-2 beyond
    // halo-1 keeps its stored flag — its degree cannot have changed).
    val coreAfter = probes.select($"id", $"is_core")
      .unionAll(oldH2.join(broadcast(halo1), Seq("cx", "cy"), "leftanti")
        .select($"id", $"is_core"))

    // New core edges: star edges over halo-1 cells' post-batch cores +
    // verified cross-cell core-core pairs. Cross pairs may appear in
    // one or both directions (targets beyond halo-1 are never probes),
    // so normalize + distinct.
    val wCell = Window.partitionBy($"cx", $"cy")
    val starEdges = probes.filter($"is_core")
      .withColumn("center", min($"id").over(wCell))
      .filter($"id" =!= $"center")
      .select($"id".as("src"), $"center".as("dst"))
    val coreSet = coreAfter.filter($"is_core").select($"id")
    val crossCoreEdges = cross
      .join(coreSet.select($"id".as("ua")), Seq("ua"), "leftsemi")
      .join(coreSet.select($"id".as("ub")), Seq("ub"), "leftsemi")
      .select(least($"ua", $"ub").as("src"),
        greatest($"ua", $"ub").as("dst"))
      .distinct()
    val newLabels = ConnectedComponents.incremental(
      base.coreLabels.select($"id", $"cluster".as("component")),
      starEdges.unionAll(crossCoreEdges)).localCheckpoint()

    // All post-batch cores with coordinates; isolated new cores (no
    // edge, not in base) label themselves.
    val coresOut = probes.filter($"is_core").select($"id", $"x", $"y")
      .unionAll(oldOut.filter($"is_core").select($"id", $"x", $"y"))
      .join(newLabels, Seq("id"), "left")
      .select($"id", $"x", $"y", lit(true).as("is_core"),
        coalesce($"component", $"id").as("cluster"))

    // Anchor pairs, recomputed region (halo-1 ∪ batch): same-cell
    // post-batch core label + cross-pair core labels, kept PRE-min so
    // the next fold can rename them like the base solve's anchors.
    val coreLabAll = coreSet.join(newLabels, Seq("id"), "left")
      .select($"id", coalesce($"component", $"id").as("cluster"))
    val nonCoreProbes = probes.filter(!$"is_core")
    val cellLab = probes.filter($"is_core")
      .groupBy($"cx", $"cy").agg(min($"id").as("ccm"))
      .join(coreLabAll.withColumnRenamed("id", "ccm"), Seq("ccm"))
      .select($"cx", $"cy", $"cluster".as("comp"))
    val probeCellAnchor = nonCoreProbes.join(cellLab, Seq("cx", "cy"))
      .select($"id", $"comp")
    val probeCrossAnchor = cross
      .join(nonCoreProbes.select($"id".as("ua")), Seq("ua"), "leftsemi")
      .join(coreLabAll.withColumnRenamed("id", "ub"), Seq("ub"))
      .select($"ua".as("id"), $"cluster".as("comp"))

    // Anchor pairs outside halo-1: stored anchors re-labelled through
    // the rename map (old component L -> new component of node L),
    // plus any newly-core neighbor (only reachable in halo-2).
    val anchoredIds = oldOut.filter(!$"is_core").select($"id")
    val rename = base.coreLabels.select($"cluster".as("comp")).distinct()
      .join(newLabels.withColumnRenamed("id", "comp"), Seq("comp"), "left")
      .select($"comp".as("old_comp"),
        coalesce($"component", $"comp").as("comp"))
    val outAnchorRenamed = base.anchorPairs
      .join(anchoredIds, Seq("id"), "leftsemi")
      .withColumnRenamed("comp", "old_comp")
      .join(broadcast(rename), Seq("old_comp"))
      .select($"id", $"comp")
    val newlyCore = probes
      .filter($"is_core" && $"is_old" && !$"was_core")
      .join(coreLabAll.withColumnRenamed("cluster", "nc_cluster"),
        Seq("id"))
    val outH2Borders = oldOut.filter(!$"is_core")
      .join(broadcast(halo2), Seq("cx", "cy"), "leftsemi")
      .select($"id", $"x", $"y", $"cx", $"cy")
    val ncAnchor = outH2Borders
      .withColumn("o", explode(offsetArray(growOffsets)))
      .select($"id", $"x".as("xb"), $"y".as("yb"),
        ($"cx" + $"o.dx").as("ncx"), ($"cy" + $"o.dy").as("ncy"))
      .join(newlyCore.select($"x".as("xn"), $"y".as("yn"),
        $"cx".as("ncx"), $"cy".as("ncy"), $"nc_cluster"),
        Seq("ncx", "ncy"))
      .filter(abs($"xb" - $"xn") <= eps && abs($"yb" - $"yn") <= eps)
      .select($"id", $"nc_cluster".as("comp"))

    val anchorPairs = probeCellAnchor.unionAll(probeCrossAnchor)
      .unionAll(outAnchorRenamed).unionAll(ncAnchor)

    // Assembly from the anchor pairs, exactly like the base solve.
    val borderLab = anchorPairs.groupBy($"id")
      .agg(min($"comp").as("border_cluster"))
    val nonCoreAll = nonCoreProbes.select($"id", $"x", $"y")
      .unionAll(oldOut.filter(!$"is_core").select($"id", $"x", $"y"))
    val bordersOut = nonCoreAll
      .join(borderLab, Seq("id"), "left")
      .select($"id", $"x", $"y", lit(false).as("is_core"),
        coalesce($"border_cluster", lit(-1L)).as("cluster"))
    val labels = coresOut.unionAll(bordersOut)

    val scoredOut = probes
      .select($"id", $"x", $"y", $"cx", $"cy", $"cell_n", $"is_core")
      .unionAll(
        oldOut.select($"id", $"x", $"y", $"cx", $"cy", $"cell_n",
          $"is_core"))
      .localCheckpoint()
    DbscanState(scoredOut, coreLabAll, anchorPairs, labels)
  }
}
