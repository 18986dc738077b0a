package graft.ops

import scala.collection.mutable

/** Deterministic HNSW — Hierarchical Navigable Small World graphs
  * (Malkov & Yashunin 2018, arXiv:1603.09320) — built PER PARTITION
  * inside `mapPartitions` and merged by a global top-k: the modern
  * high-recall ANN default, with the distributed shape this engine
  * uses for every index family (no driver-held graph, bounded memory
  * per partition, candidate rows = queries × partitions × k).
  *
  * Determinism (the property every oracle and restart in this repo
  * leans on): no RNG. Node levels come from a splitmix64 hash of the
  * vector id (`floor(-ln(u) * mL)` with u derived from the hash — the
  * same geometric distribution the paper samples, derandomized), and
  * insertion order is the caller's (sorted by id in
  * [[graft.ops.Vectors.knnHnsw]]); every heap tie breaks on id. Two
  * builds over the same rows produce identical graphs and identical
  * search results.
  *
  * Exactness at small population: `searchLayer` stops only when the
  * best unexpanded candidate is worse than the worst of `ef` results;
  * while fewer than `ef` results exist it NEVER stops early, so with
  * ef ≥ the partition population the search expands the whole
  * connected component — the graph search degrades gracefully to
  * exhaustive, which is what makes the verify-scale oracle exact
  * (recall == 1.0 deterministically) while the same code is genuinely
  * approximate, and fast, when partitions dwarf ef. VectorOpsSpec pins
  * the approximate regime's recall against the IVF-multiprobe row at
  * equal candidate budget.
  *
  * Similarity is COSINE (higher = better), converted internally to the
  * distance `1 - cos` the heap logic minimizes; norms are precomputed
  * once per node.
  */
object Hnsw {

  /** splitmix64 — the repo's standard derandomizer (same recipe as the
    * MinHash/hyperplane families): id → well-mixed 64 bits. */
  private def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Geometric level from the id hash: u ∈ (0,1], level =
    * floor(-ln(u) · mL), mL = 1/ln(M) — the paper's distribution with
    * the randomness replaced by a hash so the graph is a pure function
    * of the data. */
  private[graft] def levelOf(id: Long, m: Int): Int = {
    val bits = mix64(id) >>> 11 // 53 high-quality bits
    val u = (bits + 1).toDouble / (1L << 53).toDouble // (0,1]
    val mL = 1.0 / math.log(m.toDouble)
    math.floor(-math.log(u) * mL).toInt
  }

  /** A built per-partition index over `ids`/`vecs` (parallel arrays,
    * caller-sorted for determinism). Neighbor lists are index-based
    * (positions into the arrays), per level. */
  final class Index private[Hnsw] (
      val ids: Array[Long],
      val vecs: Array[Array[Float]],
      val norms: Array[Double],
      val m: Int,
      // links(level)(node) = neighbor positions
      private[Hnsw] val links: mutable.ArrayBuffer[Array[mutable.ArrayBuffer[Int]]],
      private[Hnsw] var entry: Int,
      private[Hnsw] var maxLevel: Int) {

    def size: Int = ids.length

    private def cos(q: Array[Float], qn: Double, i: Int): Double = {
      val v = vecs(i)
      var s = 0.0
      var j = 0
      val n = math.min(q.length, v.length)
      while (j < n) { s += q(j).toDouble * v(j).toDouble; j += 1 }
      val d = qn * norms(i)
      if (d == 0) 0.0 else s / d
    }

    private def dist(q: Array[Float], qn: Double, i: Int): Double =
      1.0 - cos(q, qn, i)

    /** Beam search at one level from `entries`: returns up to `ef`
      * nearest (dist asc, id asc) node positions with distances. */
    private[Hnsw] def searchLayer(q: Array[Float], qn: Double,
        entries: Seq[(Double, Int)], ef: Int, level: Int)
        : mutable.PriorityQueue[(Double, Int)] = {
      // results: max-heap by (dist, id) — worst on top, capped at ef
      val resultOrd = Ordering.by[(Double, Int), (Double, Long)](t =>
        (t._1, ids(t._2)))
      // candidates: min-heap by (dist, id)
      val results = mutable.PriorityQueue.empty[(Double, Int)](resultOrd)
      val cands = mutable.PriorityQueue.empty[(Double, Int)](resultOrd.reverse)
      val visited = new java.util.BitSet(ids.length)
      entries.foreach { case (d, i) =>
        if (!visited.get(i)) {
          visited.set(i)
          results.enqueue((d, i))
          cands.enqueue((d, i))
        }
      }
      while (results.size > ef) results.dequeue()
      while (cands.nonEmpty) {
        val (cd, ci) = cands.dequeue()
        // stop when the best unexpanded candidate can't improve a FULL
        // result set (never early while results < ef — the exactness
        // property the verify-scale oracle rides)
        if (results.size >= ef && cd > results.head._1) {
          cands.clear()
        } else {
          val nbrs = links(level)(ci)
          var j = 0
          while (j < nbrs.length) {
            val ni = nbrs(j)
            if (!visited.get(ni)) {
              visited.set(ni)
              val nd = dist(q, qn, ni)
              if (results.size < ef || nd < results.head._1 ||
                  (nd == results.head._1 && ids(ni) < ids(results.head._2))) {
                results.enqueue((nd, ni))
                cands.enqueue((nd, ni))
                if (results.size > ef) results.dequeue()
              }
            }
            j += 1
          }
        }
      }
      results
    }

    /** Greedy 1-NN descent through levels (maxLevel → target+1). */
    private def descend(q: Array[Float], qn: Double, toLevel: Int)
        : (Double, Int) = {
      var cur = entry
      var curD = dist(q, qn, cur)
      var lvl = maxLevel
      while (lvl > toLevel) {
        var improved = true
        while (improved) {
          improved = false
          val nbrs = links(lvl)(cur)
          var j = 0
          while (j < nbrs.length) {
            val ni = nbrs(j)
            val nd = dist(q, qn, ni)
            if (nd < curD || (nd == curD && ids(ni) < ids(cur))) {
              curD = nd; cur = ni; improved = true
            }
            j += 1
          }
        }
        lvl -= 1
      }
      (curD, cur)
    }

    /** Top-k by cosine (desc, id asc): (id, cosine) pairs. */
    def search(q: Array[Float], k: Int, ef: Int): Seq[(Long, Double)] = {
      if (ids.isEmpty) return Nil
      var qn = 0.0
      var j = 0
      while (j < q.length) { qn += q(j).toDouble * q(j).toDouble; j += 1 }
      qn = math.sqrt(qn)
      val ep = descend(q, qn, 0)
      val res = searchLayer(q, qn, Seq(ep), math.max(ef, k), 0)
      res.toSeq
        .map { case (d, i) => (ids(i), 1.0 - d) }
        .sortBy { case (id, c) => (-c, id) }
        .take(k)
    }
  }

  /** Serialized node row: position `seq` in the partition's id-sorted
    * order, the vector, and the per-level neighbor positions. Levels
    * are NOT stored — levelOf(id, m) re-derives them (hash levels are
    * a pure function of the id), and the entry point / max level
    * follow from the levels, so the stored index is exactly the data
    * plus the adjacency. */
  final case class NodeRow(seq: Int, id: Long, vec: Array[Float],
      links: Seq[Seq[Int]])

  /** Dump an index for persistence (parquet rows via the caller). */
  def toRows(idx: Index): Iterator[NodeRow] =
    (0 until idx.size).iterator.map { i =>
      val ls = idx.links.indices.map(l => idx.links(l)(i).toSeq)
      NodeRow(i, idx.ids(i), idx.vecs(i), ls)
    }

  /** Reconstruct an index from stored rows (any order — sorted by seq
    * here). Rebuilds norms, re-derives levels/entry from the id hash:
    * the entry point is the first node (in insertion = id order) that
    * achieved the running-max level, which for the full set is the
    * first node carrying the global max level. Search results are
    * IDENTICAL to the freshly built index (VectorOpsSpec pins it). */
  def fromRows(rows: Seq[NodeRow], m: Int): Index = {
    val sorted = rows.sortBy(_.seq).toArray
    val n = sorted.length
    val ids = sorted.map(_.id)
    val vecs = sorted.map(_.vec)
    val norms = vecs.map { v =>
      var s = 0.0
      var j = 0
      while (j < v.length) { s += v(j).toDouble * v(j); j += 1 }
      math.sqrt(s)
    }
    val nLevels = if (sorted.isEmpty) 0 else sorted.map(_.links.size).max
    val links = mutable.ArrayBuffer.tabulate(nLevels) { l =>
      Array.tabulate(n) { i =>
        val node = sorted(i)
        if (l < node.links.size)
          mutable.ArrayBuffer.from(node.links(l))
        else mutable.ArrayBuffer.empty[Int]
      }
    }
    val levels = ids.map(levelOf(_, m))
    val maxLevel = if (n == 0) -1 else levels.max
    val entry = if (n == 0) -1 else levels.indexOf(maxLevel)
    new Index(ids, vecs, norms, m, links, entry, maxLevel)
  }

  /** Build an index over (id, vec) rows. `rows` should be sorted by id
    * by the caller (determinism); duplicate ids are rejected. */
  def build(rows: Array[(Long, Array[Float])], m: Int,
      efConstruction: Int): Index =
    extend(None, rows, m, efConstruction)

  /** Insert `rows` into a COPY of `base` (base untouched), running the
    * identical insertion loop [[build]] uses — incremental index
    * maintenance: a batch of new vectors joins a stored graph without
    * re-inserting the corpus. The extended index equals what a fresh
    * build over base-order ++ batch-order rows would produce (same
    * deterministic insertion), and with ef >= the grown partition
    * population the search over it stays exhaustive-exact. Duplicate
    * ids (within the batch or against the base) are rejected. */
  def extend(baseOpt: Option[Index], rows: Array[(Long, Array[Float])],
      m: Int, efConstruction: Int): Index = {
    require(m >= 2, s"m must be >= 2, got $m")
    require(baseOpt.forall(_.m == m), "extend: m must match the base index")
    val base = baseOpt.getOrElse(
      new Index(Array.empty, Array.empty, Array.empty, m,
        mutable.ArrayBuffer.empty, entry = -1, maxLevel = -1))
    val nOld = base.size
    val n = nOld + rows.length
    val ids = java.util.Arrays.copyOf(base.ids, n)
    val vecs = java.util.Arrays.copyOf(
      base.vecs.asInstanceOf[Array[AnyRef]], n)
      .asInstanceOf[Array[Array[Float]]]
    val norms = java.util.Arrays.copyOf(base.norms, n)
    val seen = mutable.HashSet.empty[Long]
    base.ids.foreach(seen += _)
    var i = nOld
    while (i < n) {
      val (rid, rvec) = rows(i - nOld)
      require(seen.add(rid), s"duplicate vector id $rid in one partition")
      ids(i) = rid
      vecs(i) = rvec
      var s = 0.0
      var j = 0
      while (j < rvec.length) {
        s += rvec(j).toDouble * rvec(j).toDouble; j += 1
      }
      norms(i) = math.sqrt(s)
      i += 1
    }
    // clone the base adjacency into n-wide per-level arrays
    val links = mutable.ArrayBuffer.empty[Array[mutable.ArrayBuffer[Int]]]
    base.links.foreach { lvl =>
      val arr = Array.fill(n)(mutable.ArrayBuffer.empty[Int])
      var k = 0
      while (k < nOld) { arr(k) = lvl(k).clone(); k += 1 }
      links += arr
    }
    val idx = new Index(ids, vecs, norms, m, links,
      entry = base.entry, maxLevel = base.maxLevel)

    def ensureLevel(l: Int): Unit =
      while (links.size <= l)
        links += Array.fill(n)(mutable.ArrayBuffer.empty[Int])

    // max degree: 2M at level 0 (the paper's Mmax0), M above
    def maxDeg(level: Int): Int = if (level == 0) 2 * m else m

    /** Shrink `node`'s list at `level` to the maxDeg nearest (by
      * node-to-neighbor distance, id tie-break). */
    def shrink(node: Int, level: Int): Unit = {
      val lst = links(level)(node)
      val cap = maxDeg(level)
      if (lst.length > cap) {
        val q = vecs(node)
        var qn = norms(node)
        def d(i: Int): Double = {
          var s = 0.0
          var j = 0
          val len = math.min(q.length, vecs(i).length)
          while (j < len) { s += q(j).toDouble * vecs(i)(j).toDouble; j += 1 }
          val dn = qn * norms(i)
          1.0 - (if (dn == 0) 0.0 else s / dn)
        }
        val kept = lst.sortBy(i => (d(i), ids(i))).take(cap)
        links(level)(node) = kept
      }
    }

    i = nOld
    while (i < n) {
      val lvl = levelOf(ids(i), m)
      ensureLevel(lvl)
      if (idx.entry < 0) {
        idx.entry = i
        idx.maxLevel = lvl
      } else {
        val q = vecs(i)
        var qn = norms(i)
        def distTo(j: Int): Double = {
          var s = 0.0
          var t = 0
          val len = math.min(q.length, vecs(j).length)
          while (t < len) { s += q(t).toDouble * vecs(j)(t).toDouble; t += 1 }
          val dn = qn * norms(j)
          1.0 - (if (dn == 0) 0.0 else s / dn)
        }
        // descend to lvl+1 greedily
        var cur = idx.entry
        var curD = distTo(cur)
        var l = idx.maxLevel
        while (l > lvl) {
          var improved = true
          while (improved) {
            improved = false
            val nbrs = links(l)(cur)
            var j = 0
            while (j < nbrs.length) {
              val ni = nbrs(j)
              val nd = distTo(ni)
              if (nd < curD || (nd == curD && ids(ni) < ids(cur))) {
                curD = nd; cur = ni; improved = true
              }
              j += 1
            }
          }
          l -= 1
        }
        // connect at each level ≤ min(lvl, maxLevel)
        var ep = Seq((curD, cur))
        l = math.min(lvl, idx.maxLevel)
        while (l >= 0) {
          val found = idx.searchLayer(q, qn, ep, efConstruction, l)
          val nearest = found.toSeq
            .sortBy { case (dd, j) => (dd, ids(j)) }
          val selected = nearest.take(m)
          selected.foreach { case (_, j) =>
            links(l)(i) += j
            links(l)(j) += i
            shrink(j, l)
          }
          // next-level entries: this level's results
          ep = nearest
          l -= 1
        }
        if (lvl > idx.maxLevel) {
          idx.maxLevel = lvl
          idx.entry = i
        }
      }
      i += 1
    }
    idx
  }
}
