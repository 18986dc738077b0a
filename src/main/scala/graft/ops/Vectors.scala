package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding-similarity operators over `array<float>` columns — all
  * built-in HOFs (zip_with + left-fold aggregate), so the dot product
  * stays codegen'd and deterministic (sequential fold, exactly
  * mirrorable in an oracle).
  *
  * Scale path: brute-force top-k broadcasts the (small) query set
  * against the corpus — one scan, no shuffle of the big side; the
  * partitioned variant prunes candidates by a cell/bucket column first
  * (IVF shape: probe only matching cells). Norms are precomputed once
  * per side, never per pair.
  */
object Vectors {

  /** Sequential-fold dot product in double precision (tight-loop
    * expression; accumulation order identical to the HOF/oracle form). */
  def dot(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.bridge.column(
      graft.functions.FloatDot(
        org.apache.spark.sql.graft.bridge.expression(a),
        org.apache.spark.sql.graft.bridge.expression(b)))

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column, normA: Column, normB: Column): Column =
    dot(a, b) / (normA * normB)

  /** Scored pairs → per-query top-k via the typed TopK aggregator:
    * map-side partial top-k means each partition ships ≤k entries per
    * query, instead of a window sorting every scored pair through one
    * exchange. Tie semantics (score desc, id asc) match row_number. */
  private def topK(scored: DataFrame, k: Int): DataFrame = {
    val s = scored.sparkSession
    import s.implicits._
    scored.select(col("qid"), col("cos_sim"), col("cid"))
      .as[(Long, Double, Long)]
      .groupByKey(_._1)
      .mapValues(t => (t._2, t._3))
      .agg(TopK.aggregator(k).toColumn)
      .flatMap { case (qid, hits) =>
        hits.iterator.zipWithIndex.map { case ((score, cid), i) =>
          (qid, (i + 1).toLong, cid, score)
        }
      }
      .toDF("qid", "rk", "cid", "cos_sim")
  }

  /** Brute-force cosine top-k: every query row against every corpus row.
    * @param queries (id, vec); broadcast — keep it small.
    * @param corpus  (id, vec) plus optional carry columns. */
  def knnBrute(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val q = broadcast(queries
      .select(col("id").as("qid"), col("vec").as("qv"))
      .withColumn("qn", norm(col("qv"))))
    val c = corpus
      .select(col("id").as("cid"), col("vec").as("cv"))
      .withColumn("cn", norm(col("cv")))
    val scored = c.join(q, col("qid") =!= col("cid"))
      .withColumn("cos_sim", cosine(col("qv"), col("cv"), col("qn"), col("cn")))
    topK(scored, k)
  }

  /** int8 scalar quantization: each vector scaled into [-127,127] by
    * its own max-abs (scale carried alongside for exact dot recovery
    * up to quantization error). The 100 TB memory lever: 4× smaller
    * than float32, integer dot products for coarse scoring. The code
    * is floor(x + 0.5), not round(): floor over an IEEE double is
    * bit-identical across engines, which is what lets a plain-SQL
    * oracle restate the whole two-stage pipeline (e_knn_quantized). */
  def quantize(vec: Column): Column = {
    val maxAbs = array_max(transform(vec, v => abs(v.cast("double"))))
    struct(
      transform(vec, v =>
        floor(v.cast("double") / maxAbs * 127 + lit(0.5)).cast("int")).as("q"),
      (maxAbs / 127).as("scale"))
  }

  /** Quantized coarse dot product (exactly mirrors the float path's
    * fold but over int8 codes × scales). */
  def dotQuantized(a: Column, b: Column): Column =
    aggregate(
      zip_with(a.getField("q"), b.getField("q"),
        (x, y) => (x * y).cast("long")),
      lit(0L), (acc, v) => acc + v).cast("double") *
      a.getField("scale") * b.getField("scale")

  /** Two-stage ANN: coarse top-`rerank` by quantized cosine, exact
    * re-rank of those to top-k. The corpus scan reads int8 codes; the
    * float vectors are fetched only for the shortlisted candidates. */
  def knnQuantized(queries: DataFrame, corpus: DataFrame, k: Int,
      rerank: Int = 50): DataFrame = {
    val q = broadcast(queries
      .select(col("id").as("qid"), col("vec").as("qv"))
      .withColumn("qq", quantize(col("qv")))
      .withColumn("qn", norm(col("qv"))))
    val c = corpus
      .select(col("id").as("cid"), col("vec").as("cv"))
      .withColumn("cq", quantize(col("cv")))
      .withColumn("cn", norm(col("cv")))
    val coarse = c.join(q, col("qid") =!= col("cid"))
      .withColumn("cos_sim",
        dotQuantized(col("qq"), col("cq")) / (col("qn") * col("cn")))
    val shortlist = topK(coarse, rerank)
      .select(col("qid"), col("cid"))
    val exact = shortlist
      .join(c.select(col("cid"), col("cv"), col("cn")), Seq("cid"))
      .join(q.select(col("qid"), col("qv"), col("qn")), Seq("qid"))
      .withColumn("cos_sim", cosine(col("qv"), col("cv"), col("qn"), col("cn")))
    topK(exact, k)
  }

  /** Matryoshka / truncated-dimension two-stage ANN (the MRL serving
    * pattern): coarse cosine over only the first `coarseDims`
    * components — matryoshka-trained embeddings front-load
    * information, so a prefix slice is the cheapest flop/byte
    * reduction (4× here) and needs NO learned artifact at all — then
    * exact re-rank of the per-query shortlist on full vectors. Same
    * two-stage shape (broadcast queries, TopK shortlist, keyed rerank
    * joins) as [[knnQuantized]]. */
  def knnMatryoshka(queries: DataFrame, corpus: DataFrame, k: Int,
      coarseDims: Int = 16, rerank: Int = 50): DataFrame = {
    val q = broadcast(queries
      .select(col("id").as("qid"), col("vec").as("qv"))
      .withColumn("qs", slice(col("qv"), 1, coarseDims))
      .withColumn("qsn", norm(col("qs")))
      .withColumn("qn", norm(col("qv"))))
    val c = corpus
      .select(col("id").as("cid"), col("vec").as("cv"))
      .withColumn("cs", slice(col("cv"), 1, coarseDims))
      .withColumn("csn", norm(col("cs")))
      .withColumn("cn", norm(col("cv")))
    val coarse = c.join(q, col("qid") =!= col("cid"))
      .withColumn("cos_sim", cosine(col("qs"), col("cs"), col("qsn"), col("csn")))
    val shortlist = topK(coarse, rerank)
      .select(col("qid"), col("cid"))
    val exact = shortlist
      .join(c.select(col("cid"), col("cv"), col("cn")), Seq("cid"))
      .join(q.select(col("qid"), col("qv"), col("qn")), Seq("qid"))
      .withColumn("cos_sim", cosine(col("qv"), col("cv"), col("qn"), col("cn")))
    topK(exact, k)
  }

  /** Maximal-marginal-relevance re-rank (Carbonell & Goldstein '98):
    * shortlist `pool` candidates per query by exact cosine, then
    * greedily select `k` maximizing λ·rel(d) − (1−λ)·max_{s∈S}
    * sim(d, s) — the diversified-retrieval step that keeps a RAG
    * context window from filling with near-duplicates of one passage.
    *
    * Scale shape: the corpus-sized work is [[knnBrute]]'s one scan;
    * the MMR loop itself is group-local over ≤ `pool` candidates
    * (pool² sims per query, computed inside one mapGroups partition —
    * never a corpus shuffle). Determinism: relevance and candidate-
    * pair cosines round to 9dp before scoring (the fold mirrors
    * [[graft.functions.FloatDot]] exactly), score arithmetic is fixed
    * IEEE op order, ties break to the lowest candidate id — so a SQL
    * oracle replays every selection step.
    *
    * @return (qid, rk 1..k, cid, mmr_score rounded 6dp); rank 1's
    *         score is the plain relevance (no diversity term yet). */
  def mmrRerank(queries: DataFrame, corpus: DataFrame, k: Int,
      pool: Int = 20, lambda: Double = 0.7): DataFrame = {
    val s = queries.sparkSession
    import s.implicits._
    val shortlist = knnBrute(queries, corpus, pool).select(col("qid"), col("cid"))
    val cand = shortlist
      .join(corpus.select(col("id").as("cid"), col("vec").as("cv")), Seq("cid"))
      .join(broadcast(queries.select(col("id").as("qid"), col("vec").as("qv"))),
        Seq("qid"))
      .select(col("qid"), col("cid"), col("qv"), col("cv"))
      .as[(Long, Long, Seq[Float], Seq[Float])]
    def r9(x: Double): Double =
      BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    cand.groupByKey(_._1)
      .flatMapGroups { (qid, it) =>
        val rows = it.toArray
        val qv = rows.head._3.toArray
        val cid = rows.map(_._2)
        val cv = rows.map(_._4.toArray)
        val n = rows.length
        def dotd(a: Array[Float], b: Array[Float]): Double = {
          var acc = 0.0; var i = 0
          while (i < a.length) { acc += a(i).toDouble * b(i).toDouble; i += 1 }
          acc
        }
        def cos(a: Array[Float], b: Array[Float]): Double =
          dotd(a, b) / (math.sqrt(dotd(a, a)) * math.sqrt(dotd(b, b)))
        val rel = Array.tabulate(n)(i => r9(cos(qv, cv(i))))
        val sim = Array.tabulate(n, n)((i, j) =>
          if (i == j) 0.0 else r9(cos(cv(i), cv(j))))
        val selected = Array.fill(n)(false)
        val out = Seq.newBuilder[(Long, Long, Long, Double)]
        var step = 1
        while (step <= math.min(k, n)) {
          var best = -1; var bs = 0.0
          var i = 0
          while (i < n) {
            if (!selected(i)) {
              val sc =
                if (step == 1) rel(i)
                else {
                  var ms = Double.NegativeInfinity
                  var j = 0
                  while (j < n) {
                    if (selected(j) && sim(i)(j) > ms) ms = sim(i)(j)
                    j += 1
                  }
                  lambda * rel(i) - (1 - lambda) * ms
                }
              if (best < 0 || sc > bs || (sc == bs && cid(i) < cid(best))) {
                best = i; bs = sc
              }
            }
            i += 1
          }
          selected(best) = true
          out += ((qid, step.toLong, cid(best), r6(bs)))
          step += 1
        }
        out.result()
      }
      .toDF("qid", "rk", "cid", "mmr_score")
  }

  /** Nearest-centroid id for a vector against a (small) broadcast
    * centroid matrix: squared-L2 by sequential fold (bit-exact
    * mirrorable), ties to the lowest cell id via struct array_min. */
  def nearestCell(vec: Column, cents: Seq[Seq[Double]]): Column = {
    val c = typedLit(cents)
    array_min(transform(sequence(lit(0), lit(cents.size - 1)), j =>
      struct(
        aggregate(
          zip_with(vec, element_at(c, j + 1),
            (x, h) => (x.cast("double") - h) * (x.cast("double") - h)),
          lit(0.0d), (acc, v) => acc + v).as("dist"),
        j.cast("long").as("cell"))))
      .getField("cell")
  }

  /** Per-point SIMPLIFIED-silhouette inputs against a (small) broadcast
    * centroid matrix: the assigned cell (same squared-L2 fold + tie
    * rule as [[nearestCell]]), a = L2 distance to the OWN centroid and
    * b = L2 distance to the nearest OTHER centroid — everything the
    * centroid-variant silhouette s = (b-a)/max(a,b) needs, from ONE
    * projection pass (no joins; cost identical to the IVF assignment).
    * Expects columns (vec_id, embedding); returns (vec_id, cell, a, b).
    * sqrt is IEEE-exact so a/b are engine-mirrorable wherever the
    * squared fold is. */
  def silhouettePoints(emb: DataFrame, cents: Seq[Seq[Double]]): DataFrame = {
    val c = typedLit(cents)
    val arr = transform(sequence(lit(0), lit(cents.size - 1)), j =>
      struct(
        aggregate(
          zip_with(col("embedding"), element_at(c, j + 1),
            (x, h) => (x.cast("double") - h) * (x.cast("double") - h)),
          lit(0.0d), (acc, v) => acc + v).as("d"),
        j.cast("long").as("cell")))
    emb.select(col("vec_id"), col("embedding"))
      .withColumn("arr", arr)
      .withColumn("own", array_min(col("arr")))
      .withColumn("oth", array_min(filter(col("arr"),
        x => x.getField("cell") =!= col("own").getField("cell"))))
      .select(col("vec_id"), col("own").getField("cell").as("cell"),
        sqrt(col("own").getField("d")).as("a"),
        sqrt(col("oth").getField("d")).as("b"))
  }

  /** The `nprobe` nearest centroid ids, by (distance, cell) order —
    * IVF multiprobe: querying neighbors of the best cell recovers the
    * recall lost to hard cell boundaries. */
  def nearestCells(vec: Column, cents: Seq[Seq[Double]], nprobe: Int): Column = {
    val c = typedLit(cents)
    transform(
      slice(array_sort(transform(sequence(lit(0), lit(cents.size - 1)), j =>
        struct(
          aggregate(
            zip_with(vec, element_at(c, j + 1),
              (x, h) => (x.cast("double") - h) * (x.cast("double") - h)),
            lit(0.0d), (acc, v) => acc + v).as("dist"),
          j.cast("long").as("cell")))), 1, nprobe),
      s => s.getField("cell"))
  }

  /** Deterministic Lloyd's k-means for the IVF coarse quantizer:
    * first-k init (vec_id < k), FIXED iteration count, decimal-exact
    * per-(cell,pos) means — every step is engine-mirrorable, so learned
    * cells can be oracle-checked end to end. Centroids ride the driver
    * (k × dim doubles — tiny); each iteration is one broadcast argmin
    * projection + one (cell,pos)-keyed shuffle agg over the corpus. A
    * production quantizer would train on a SAMPLE and iterate to
    * convergence; the fixed shape here is chosen for determinism. */
  def kmeansCentroids(emb: DataFrame, k: Int, iters: Int): Seq[Seq[Double]] = {
    val base = emb.select(col("vec_id"), col("embedding"))
    // init: the k lowest-id vectors, whatever the id range — sparse or
    // offset ids must not under-train silently
    // Number, not Float: the frame may carry float embeddings or
    // double residuals (IVF-PQ trains on residual vectors)
    var cents: Seq[Seq[Double]] = base
      .orderBy("vec_id").limit(k).collect()
      .map(_.getSeq[Number](1).map(_.doubleValue()).toSeq).toSeq
    require(cents.size == k,
      s"k-means needs at least k=$k vectors, found ${cents.size}")
    for (_ <- 1 to iters) {
      val dim = cents.head.size
      val means = base
        .withColumn("cell", nearestCell(col("embedding"), cents))
        .select(col("cell"), posexplode(col("embedding")).as(Seq("pos", "v")))
        .groupBy(col("cell"), col("pos"))
        .agg((sum(round(col("v").cast("double"), 9).cast("decimal(28,12)")).cast("double") /
          count(lit(1))).as("c"))
        .collect()
        .map(r => (r.getLong(0).toInt, r.getInt(1), r.getDouble(2)))
      val next = Array.tabulate(k, dim)((cell, pos) => cents(cell)(pos))
      means.foreach { case (cell, pos, v) => next(cell)(pos) = v }
      cents = next.map(_.toSeq).toSeq
    }
    cents
  }

  /** Product-quantization codebooks: `m` subspaces × `k` centroids,
    * each learned by the deterministic Lloyd recipe
    * ([[kmeansCentroids]]) on that subspace's subvector frame. The
    * result is m×k×(dim/m) doubles on the driver (8×16×8 = 1 KiB here)
    * — the PQ memory story at 100 TB: corpus rows store m byte-sized
    * codes (8 bytes/vector vs 256 for float32), codebooks broadcast. */
  def pqCodebooks(emb: DataFrame, dim: Int, m: Int, k: Int,
      iters: Int): Seq[Seq[Seq[Double]]] = {
    require(dim % m == 0, s"dim=$dim must divide into m=$m subspaces")
    val sub = dim / m
    (0 until m).map { j =>
      kmeansCentroids(
        emb.select(col("vec_id"),
          slice(col("embedding"), j * sub + 1, sub).as("embedding")),
        k, iters)
    }
  }

  /** PQ encode: per subspace, the nearest codebook cell (L2, ties to
    * the lowest cell like [[nearestCell]]) — an array<long> of m codes
    * per vector, computed row-locally against the broadcast literal. */
  def pqCodes(vec: Column, books: Seq[Seq[Seq[Double]]]): Column = {
    val sub = books.head.head.size
    array(books.zipWithIndex.map { case (cb, j) =>
      nearestCell(slice(vec, j * sub + 1, sub), cb)
    }: _*)
  }

  /** PQ ANN with asymmetric-distance scoring (ADC): the corpus side is
    * scored from its m codes only — per subspace, dot(query subvector,
    * centroid[code]) — then the shortlist re-ranks exactly, as in
    * [[knnQuantized]]. Subspace dots round to 9dp and sum as DECIMAL,
    * so the coarse score is aggregation-order-independent and a SQL
    * oracle can restate the whole chain. */
  def knnPq(queries: DataFrame, corpus: DataFrame,
      books: Seq[Seq[Seq[Double]]], k: Int, rerank: Int = 50): DataFrame = {
    val m = books.size
    val sub = books.head.head.size
    val q = broadcast(queries
      .select(col("id").as("qid"), col("vec").as("qv"))
      .withColumn("qn", norm(col("qv"))))
    val c = corpus
      .select(col("id").as("cid"), col("vec").as("cv"))
      .withColumn("codes", pqCodes(col("cv"), books))
      .withColumn("cn", norm(col("cv")))
    val adc = (0 until m).map { j =>
      val cent = element_at(typedLit(books(j)),
        element_at(col("codes"), j + 1).cast("int") + 1)
      val qsub = slice(col("qv"), j * sub + 1, sub)
      round(aggregate(zip_with(qsub, cent, (x, h) => x.cast("double") * h),
        lit(0.0d), (acc, v) => acc + v), 9).cast("decimal(28,12)")
    }.reduce(_ + _)
    val coarse = c.join(q, col("qid") =!= col("cid"))
      .withColumn("cos_sim", adc.cast("double") / (col("qn") * col("cn")))
    val shortlist = topK(coarse, rerank).select(col("qid"), col("cid"))
    val exact = shortlist
      .join(c.select(col("cid"), col("cv"), col("cn")), Seq("cid"))
      .join(q.select(col("qid"), col("qv"), col("qn")), Seq("qid"))
      .withColumn("cos_sim", cosine(col("qv"), col("cv"), col("qn"), col("cn")))
    topK(exact, k)
  }

  /** Elementwise residual vs the row's cell centroid (double array) —
    * what IVF-PQ quantizes: residuals are small, so a 16-cell codebook
    * spends its resolution near zero instead of across the whole
    * embedding range. */
  def residual(vec: Column, cell: Column, cents: Seq[Seq[Double]]): Column =
    zip_with(vec, element_at(typedLit(cents), cell.cast("int") + 1),
      (x, c) => x.cast("double") - c)

  /** IVF-PQ search (FAISS-style composite index): corpus rows carry a
    * coarse cell + m residual codes; a query scores ONLY its own
    * cell's rows as dot(q, cell centroid) + Σ_m dot(q_sub_m,
    * codebook_m[code_m]) — the exact ADC decomposition of
    * dot(q, cent + residual≈PQ) — then the shortlist re-ranks exactly.
    * All dot terms round to 9dp and sum as DECIMAL (order-free), so
    * the whole chain is SQL-restatable. At scale: cells bound the scan
    * (1/nCells of the corpus per query), codes are m bytes per row,
    * centroids + codebooks broadcast.
    *
    * @param assigned (vec_id, embedding float[], cell, resid double[])
    * @param nprobe   probe the query's `nprobe` nearest cells (corpus
    *                 stays single-cell coded) — the standard recall
    *                 lever at hard cell boundaries; qcdot is computed
    *                 per probed cell so the ADC decomposition stays
    *                 exact for rows of the second cell too. */
  def knnIvfPq(assigned: DataFrame, cents: Seq[Seq[Double]],
      books: Seq[Seq[Seq[Double]]], queryPred: Column, k: Int,
      rerank: Int = 50, nprobe: Int = 1): DataFrame = {
    val m = books.size
    val sub = books.head.head.size
    val centsLit = typedLit(cents)
    val c = assigned
      .select(col("vec_id").as("cid"), col("embedding").as("cv"),
        col("cell"), pqCodes(col("resid"), books).as("codes"))
      .withColumn("cn", norm(col("cv")))
    // qBase stays ONE row per query — the re-rank must join against it,
    // not the per-probed-cell exploded frame, or every shortlist pair
    // duplicates nprobe times
    val qBase = broadcast(assigned.filter(queryPred)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
      .withColumn("qn", norm(col("qv"))))
    val q = broadcast(qBase
      .withColumn("cell", explode(nearestCells(col("qv"), cents, nprobe)))
      .withColumn("qcdot",
        round(aggregate(
          zip_with(col("qv"), element_at(centsLit, col("cell").cast("int") + 1),
            (x, h) => x.cast("double") * h),
          lit(0.0d), (acc, v) => acc + v), 9).cast("decimal(28,12)")))
    val adcRes = (0 until m).map { j =>
      val cent = element_at(typedLit(books(j)),
        element_at(col("codes"), j + 1).cast("int") + 1)
      val qsub = slice(col("qv"), j * sub + 1, sub)
      round(aggregate(zip_with(qsub, cent, (x, h) => x.cast("double") * h),
        lit(0.0d), (acc, v) => acc + v), 9).cast("decimal(28,12)")
    }.reduce(_ + _)
    val coarse = c.join(q, Seq("cell")).filter(col("qid") =!= col("cid"))
      .withColumn("cos_sim",
        (col("qcdot") + adcRes).cast("double") / (col("qn") * col("cn")))
    val shortlist = topK(coarse, rerank).select(col("qid"), col("cid"))
    val exact = shortlist
      .join(c.select(col("cid"), col("cv"), col("cn")), Seq("cid"))
      .join(qBase.select(col("qid"), col("qv"), col("qn")), Seq("qid"))
      .withColumn("cos_sim", cosine(col("qv"), col("cv"), col("qn"), col("cn")))
    topK(exact, k)
  }

  /** Deterministic ±1 random-hyperplane signs for bit `b`, dims 1..`dim`:
    * sign(b, d) = +1 iff the first hex char of md5("b_d") has even code.
    * md5-derived so an oracle can rebuild the identical matrix in SQL. */
  def hyperplaneSigns(nBits: Int, dim: Int): Seq[Seq[Double]] = {
    val digest = java.security.MessageDigest.getInstance("MD5")
    (0 until nBits).map { b =>
      (1 to dim).map { d =>
        val hex = digest.digest(s"${b}_$d".getBytes("UTF-8"))
          .map("%02x".format(_)).mkString
        if (hex.charAt(0).toInt % 2 == 0) 1.0 else -1.0
      }
    }
  }

  /** SimHash-style signature over an embedding: bit b = 1 iff the
    * sequential-fold dot with hyperplane b is positive. Row-local (no
    * shuffle); computed by one tight-loop expression with the signs
    * matrix baked in — see [[graft.functions.HyperplaneBits]]. */
  def hyperplaneSignature(vec: Column, nBits: Int, dim: Int): Column =
    org.apache.spark.sql.graft.bridge.column(
      graft.functions.HyperplaneBits(
        org.apache.spark.sql.graft.bridge.expression(vec),
        hyperplaneSigns(nBits, dim)))

  /** Near-duplicate pairs via random-hyperplane LSH + exact cosine
    * verification — the scale path that replaces all-pairs blocking:
    * candidates are generated bucket-locally per (band, band-key), so
    * cost is Σ bucket² instead of n²/|blocks|. Recall vs the exact
    * all-pairs form is probabilistic (pinned in VectorOpsSpec);
    * emitted pairs are always true positives (exact re-check).
    *
    * Band keys have nBits/bands bits, so key cardinality bounds the
    * bucket count per band — at corpus scale raise nBits (more, wider
    * bands) AND keep `maxBucket`: buckets past the cap star-connect to
    * their minimum (see Buckets.pairs) instead of going quadratic,
    * which an 8×-corpus stress probe showed dominating the runtime. */
  def neardupLsh(emb: DataFrame, threshold: Double, nBits: Int = 16,
      bands: Int = 4, dim: Int = 64, maxBucket: Int = 1000): DataFrame =
    neardupVerify(emb,
      neardupCandidates(emb, nBits, bands, dim, maxBucket), threshold)

  /** The band-bucket candidate pairs of [[neardupLsh]], BEFORE the
    * exact-cosine verification — split out (r15) so callers with a
    * cheap pair predicate (e.g. the same-label rule of the pagerank
    * graph builds) can prune candidates before paying the cosine pass
    * (guide §3: cheapest predicate first). */
  def neardupCandidates(emb: DataFrame, nBits: Int = 16,
      bands: Int = 4, dim: Int = 64, maxBucket: Int = 1000): DataFrame =
    neardupCandidatesBy(emb, Nil, nBits, bands, dim, maxBucket)

  /** [[neardupCandidates]] with extra columns appended to the band
    * bucket key (r15, guide §8: push an equality the verify would
    * apply anyway INTO the blocking key). Bucketing on
    * (band, key, extra…) emits exactly the (band, key) pairs whose
    * `extra` columns are equal — the candidate∩equality set — but the
    * pair expansion, the dedup exchange and every downstream join run
    * on that already-filtered set instead of filtering after the
    * explosion. With L roughly-uniform values of one extra column the
    * pair volume drops ~L×. Star-cap note: the cap triggers per
    * refined bucket, so a bucket that would trip on the coarse key may
    * stay exact here — strictly closer to the declared no-cap
    * semantics (and equal to it whenever the cap is silent, which the
    * graft_buckets observe metric makes checkable). */
  def neardupCandidatesBy(emb: DataFrame, extraKeyCols: Seq[String],
      nBits: Int = 16, bands: Int = 4, dim: Int = 64,
      maxBucket: Int = 1000): DataFrame = {
    val rowsPerBand = nBits / bands
    require(bands * rowsPerBand == nBits, "bands must divide nBits")
    val keyCols = col("vec_id") +: extraKeyCols.map(col)
    // Band keys via the fused IntBandKeys loop (r15): the HOF
    // composition (kept below as the property-test reference) ran
    // interpreted inside the signature scan stage and broke its
    // whole-stage codegen.
    val banded = emb
      .select(keyCols :+
        hyperplaneSignature(col("embedding"), nBits, dim).as("sig"): _*)
      .select(keyCols :+
        posexplode(org.apache.spark.sql.graft.bridge.column(
          graft.functions.IntBandKeys(
            org.apache.spark.sql.graft.bridge.expression(col("sig")),
            bands, rowsPerBand))).as(Seq("band", "key")): _*)
    Buckets.pairs(banded, Seq("band", "key") ++ extraKeyCols, "vec_id",
      maxBucket = maxBucket)
  }

  /** The HOF composition [[neardupCandidatesBy]]'s band keys fuse —
    * kept ONLY as the property-test reference. */
  private[graft] def intBandKeysHof(sig: Column, bands: Int,
      rowsPerBand: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)), b =>
      aggregate(slice(sig, b * rowsPerBand + 1, lit(rowsPerBand)),
        lit(0), (acc, v) => acc * 2 + v))

  /** Exact-cosine verification of candidate `pairs` (id_a, id_b)
    * against `emb` — the tail of [[neardupLsh]]. */
  def neardupVerify(emb: DataFrame, pairs: DataFrame,
      threshold: Double): DataFrame = {
    val withNorm = emb
      .select(col("vec_id"), col("embedding"))
      .withColumn("n", norm(col("embedding")))
    pairs
      .join(withNorm.select(col("vec_id").as("id_a"),
        col("embedding").as("va"), col("n").as("na")), Seq("id_a"))
      .join(withNorm.select(col("vec_id").as("id_b"),
        col("embedding").as("vb"), col("n").as("nb")), Seq("id_b"))
      .withColumn("cos_sim", cosine(col("va"), col("vb"), col("na"), col("nb")))
      .filter(col("cos_sim") >= threshold)
      .select(col("id_a"), col("id_b"), col("cos_sim"))
  }

  /** Join-free PCA projection: decimal-exact dot of the mean-centered
    * embedding with a LITERAL component vector — per-term `round(·, 9)`
    * then a sequential DECIMAL(28,12) fold, so the sum is
    * order-independent and byte-replayable by the oracle's
    * `SUM(CAST(round((v-m)*w, 9) AS DECIMAL(28,12)))`. The mean and
    * component are dim-sized driver arrays baked in as literals: no
    * explode, no join, no shuffle — one codegen'd map over the corpus. */
  def projectOnComponent(vec: Column, mean: Seq[Double], comp: Seq[Double])
      : Column = {
    val centered =
      zip_with(vec.cast("array<double>"), typedLit(mean), (v, m) => v - m)
    val terms = zip_with(centered, typedLit(comp),
      (c, w) => round(c * w, 9).cast("decimal(28,12)"))
    round(aggregate(terms, lit(0).cast("decimal(28,12)"),
      (acc, t) => (acc + t).cast("decimal(28,12)")).cast("double"), 6)
  }

  /** Cell-pruned (IVF-style) cosine top-k: candidates restricted to the
    * query's cell (here a precomputed partition column — with learned
    * centroids this is the nearest-centroid assignment). */
  def knnCell(queries: DataFrame, corpus: DataFrame, cellCol: String, k: Int)
      : DataFrame = {
    val q = broadcast(queries
      .select(col("id").as("qid"), col("vec").as("qv"), col(cellCol).as("cell"))
      .withColumn("qn", norm(col("qv"))))
    val c = corpus
      .select(col("id").as("cid"), col("vec").as("cv"), col(cellCol).as("cell"))
      .withColumn("cn", norm(col("cv")))
    val scored = c.join(q, Seq("cell")).filter(col("qid") =!= col("cid"))
      .withColumn("cos_sim", cosine(col("qv"), col("cv"), col("qn"), col("cn")))
    topK(scored, k)
  }

  /** Cell-restricted kNN where EVERY corpus vector is a query — the
    * all-to-all form behind kNN-graph builds (mutual-kNN filtering,
    * graph clustering). Unlike [[knnCell]] there is no broadcast (both
    * sides are corpus-scale): one shuffle join on the cell key, scoring
    * bounded by Σ|cell|², and the per-query top-k collapses map-side
    * through the bounded [[TopK]] aggregator — the pair set never
    * materializes beyond each cell partition. */
  def knnAllCell(corpus: DataFrame, cellCol: String, k: Int): DataFrame = {
    val q = corpus
      .select(col("id").as("qid"), col("vec").as("qv"), col(cellCol).as("cell"))
      .withColumn("qn", norm(col("qv")))
    val c = corpus
      .select(col("id").as("cid"), col("vec").as("cv"), col(cellCol).as("cell"))
      .withColumn("cn", norm(col("cv")))
    val scored = c.join(q, Seq("cell")).filter(col("qid") =!= col("cid"))
      .withColumn("cos_sim", cosine(col("qv"), col("cv"), col("qn"), col("cn")))
    topK(scored, k)
  }

  /** Graph ANN — per-partition HNSW ([[graft.ops.Hnsw]]) with a
    * global top-k merge: the corpus is hash-repartitioned on id,
    * `mapPartitions` builds one bounded deterministic HNSW per
    * partition (memory ∝ partition rows × (dim + 2M links) — no driver
    * index, no cross-partition graph), every partition answers all
    * broadcast queries via beam search, and the per-partition
    * candidates (≤ queries × partitions × k rows — tiny) collapse
    * through the same bounded [[TopK]] merge every other index family
    * uses. 1000-executor shape: each executor builds/searches only its
    * partitions; the only shuffle is the candidate merge.
    *
    * The query side is COLLECTED and broadcast (bounded by
    * `maxQueries`, fail-loud like every driver collect in this repo) —
    * the ANN contract is small-query-set against huge-corpus; for
    * all-to-all graphs use [[knnAllCell]].
    *
    * Exactness note (what the e_knn_hnsw / e_hnsw_recall oracles
    * ride): beam search with `efSearch` ≥ partition population
    * explores each partition's whole connected component, so at
    * verify scale the merged result IS the exact top-k and the oracle
    * can state brute-force truth; at production scale (partitions ≫
    * efSearch) the same code is genuinely approximate and VectorOpsSpec
    * pins its recall ≥ the IVF-multiprobe row at equal candidate
    * budget. */
  /** Persist per-partition HNSW indexes: one parquet row per node —
    * (part, seq, id, vec, links). Build once, serve many: the
    * construction (beam insertions) is the expensive step; the stored
    * adjacency is linear in corpus size (≤ 2M ints per node at level
    * 0, M above). Node LEVELS are not stored — they re-derive from
    * the id hash on load, so stored state cannot drift from the code's
    * level function. `m` must match at load (it parameterizes both the
    * level distribution and Mmax); the caller owns that contract, the
    * file carries it in a sidecar column for the require check. */
  def hnswWriteIndex(corpus: DataFrame, path: String, m: Int = 12,
      efConstruction: Int = 96, numPartitions: Int = 8): Unit = {
    val s = corpus.sparkSession
    import s.implicits._
    corpus.select(col("id"), col("vec"))
      .as[(Long, Array[Float])]
      .repartition(numPartitions, col("id"))
      .mapPartitions { it =>
        val pid = org.apache.spark.TaskContext.getPartitionId()
        val local = it.toArray.sortBy(_._1)
        if (local.isEmpty) Iterator.empty
        else Hnsw.toRows(Hnsw.build(local, m, efConstruction))
          .map(r => (pid, m, numPartitions, r.seq, r.id, r.vec, r.links))
      }
      .toDF("part", "m", "nparts", "seq", "id", "vec", "links")
      .write.mode("overwrite").parquet(path)
  }

  /** INCREMENTAL index maintenance: insert a batch of new vectors into
    * a STORED index ([[hnswWriteIndex]]) without re-inserting the
    * corpus — the same state-in/batch-in discipline as the dedup
    * family's incremental twins. Batch rows route to their partition
    * by the SAME hash `repartition(n, col("id"))` used at build
    * (`pmod(hash(id), nparts)`), each touched partition reconstructs
    * its graph from the stored adjacency and runs the build-time
    * insertion loop for the new nodes only ([[graft.ops.Hnsw.extend]]),
    * and the extended rows are written back atomically to `outPath`
    * (pass the same path to overwrite in place only if the store
    * supports it; parquet overwrite-to-self is NOT safe — write to a
    * fresh generation dir like the streaming state stores do).
    * Untouched partitions are copied through unchanged. */
  def hnswAppendIndex(s: org.apache.spark.sql.SparkSession, path: String,
      batch: DataFrame, outPath: String, efConstruction: Int = 96): Unit = {
    import s.implicits._
    require(path != outPath,
      "hnswAppendIndex: parquet overwrite-to-self is unsafe; write a " +
        "fresh generation directory")
    val stored = s.read.parquet(path)
    val meta = stored.select(col("m"), col("nparts")).limit(1)
      .as[(Int, Int)].collect()
    require(meta.nonEmpty, s"hnswAppendIndex: no stored index at $path")
    val (m, nparts) = meta.head
    val storedK = stored
      .select(col("part"), col("seq"), col("id"), col("vec"), col("links"))
      .as[(Int, Int, Long, Array[Float], Seq[Seq[Int]])]
      .groupByKey(_._1)
    val batchK = batch.select(col("id"), col("vec"))
      .withColumn("part", pmod(hash(col("id")), lit(nparts)))
      .select(col("part"), col("id"), col("vec"))
      .as[(Int, Long, Array[Float])]
      .groupByKey(_._1)
    storedK.cogroup(batchK) { (pid, oldIt, newIt) =>
      val oldRows = oldIt.map(r => Hnsw.NodeRow(r._2, r._3, r._4, r._5)).toSeq
      val newRows = newIt.map(r => (r._2, r._3)).toArray.sortBy(_._1)
      if (oldRows.isEmpty && newRows.isEmpty) Iterator.empty
      else {
        val base =
          if (oldRows.isEmpty) None else Some(Hnsw.fromRows(oldRows, m))
        val idx =
          if (newRows.isEmpty) base.get
          else Hnsw.extend(base, newRows, m, efConstruction)
        Hnsw.toRows(idx).map(r =>
          (pid, m, nparts, r.seq, r.id, r.vec, r.links))
      }
    }
      .toDF("part", "m", "nparts", "seq", "id", "vec", "links")
      .write.mode("overwrite").parquet(outPath)
  }

  /** Serve top-k from a STORED index ([[hnswWriteIndex]]): partitions
    * reconstruct their graphs directly from the adjacency rows — no
    * re-insertion, no beam construction — and answer the broadcast
    * queries; same bounded TopK merge as [[knnHnsw]]. Results are
    * IDENTICAL to a fresh build over the same corpus (the graph is a
    * pure function of the data; VectorOpsSpec pins equality). */
  def knnHnswStored(s: org.apache.spark.sql.SparkSession, path: String,
      queries: DataFrame, k: Int, m: Int = 12, efSearch: Int = 128,
      maxQueries: Int = 100000): DataFrame = {
    import s.implicits._
    val qRows = queries.select(col("id"), col("vec"))
      .as[(Long, Array[Float])]
      .limit(maxQueries + 1).collect()
    require(qRows.length <= maxQueries,
      s"knnHnswStored: query side exceeds maxQueries=$maxQueries")
    val qB = s.sparkContext.broadcast(qRows.sortBy(_._1))
    val stored = s.read.parquet(path)
    val scored = stored
      .select(col("part"), col("m"), col("seq"), col("id"), col("vec"),
        col("links"))
      .as[(Int, Int, Int, Long, Array[Float], Seq[Seq[Int]])]
      .groupByKey(_._1)
      .flatMapGroups { (_, it) =>
        val rows = it.toArray
        require(rows.forall(_._2 == m),
          s"stored index built with m=${rows.head._2}, caller passed $m")
        val idx = Hnsw.fromRows(
          rows.toSeq.map(r => Hnsw.NodeRow(r._3, r._4, r._5, r._6)), m)
        qB.value.iterator.flatMap { case (qid, qv) =>
          idx.search(qv, k + 1, efSearch)
            .filter(_._1 != qid).take(k)
            .map { case (cid, cos) => (qid, cid, cos) }
        }
      }
      .toDF("qid", "cid", "cos_sim")
    topK(scored, k)
  }

  def knnHnsw(queries: DataFrame, corpus: DataFrame, k: Int,
      m: Int = 12, efConstruction: Int = 96, efSearch: Int = 128,
      numPartitions: Int = 8, maxQueries: Int = 100000): DataFrame = {
    val s = corpus.sparkSession
    import s.implicits._
    val qRows = queries.select(col("id"), col("vec"))
      .as[(Long, Array[Float])]
      .limit(maxQueries + 1).collect()
    require(qRows.length <= maxQueries,
      s"knnHnsw: query side exceeds maxQueries=$maxQueries — the " +
        "broadcast-query ANN contract is a small query set; use " +
        "knnAllCell for all-to-all")
    val qB = s.sparkContext.broadcast(qRows.sortBy(_._1))
    val scored = corpus.select(col("id"), col("vec"))
      .as[(Long, Array[Float])]
      .repartition(numPartitions, col("id"))
      .mapPartitions { it =>
        val local = it.toArray.sortBy(_._1)
        if (local.isEmpty) Iterator.empty
        else {
          val idx = Hnsw.build(local, m, efConstruction)
          qB.value.iterator.flatMap { case (qid, qv) =>
            // k+1 then drop self: the query may live in this partition
            idx.search(qv, k + 1, efSearch)
              .filter(_._1 != qid).take(k)
              .map { case (cid, cos) => (qid, cid, cos) }
          }
        }
      }
      .toDF("qid", "cid", "cos_sim")
    topK(scored, k)
  }
}
