package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions.explode

import graft.ops.Vectors

class VectorOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("knnBrute ranks by cosine with deterministic tie-break") {
    val vecs = Seq(
      (0L, Array(1f, 0f, 0f)),
      (1L, Array(0.9f, 0.1f, 0f)),   // closest to 0
      (2L, Array(0f, 1f, 0f)),       // orthogonal
      (3L, Array(-1f, 0f, 0f)),      // opposite
      (4L, Array(0.5f, 0.5f, 0f))
    ).toDF("id", "vec")
    val got = Vectors.knnBrute(vecs.filter($"id" === 0), vecs, 3)
      .select($"rk", $"cid").as[(Long, Long)].collect().toList
    assert(got == List((1L, 1L), (2L, 4L), (3L, 2L)))
  }

  test("knnCell restricts candidates to the query cell") {
    val vecs = Seq(
      (0L, Array(1f, 0f), 0), (1L, Array(0.9f, 0.1f), 0),
      (2L, Array(1f, 0.01f), 1) // nearer, but other cell
    ).toDF("id", "vec", "cell")
    val got = Vectors.knnCell(vecs.filter($"id" === 0), vecs, "cell", 5)
      .select($"cid").as[Long].collect().toList
    assert(got == List(1L))
  }

  test("quantized two-stage ANN recovers brute-force top-k on real embeddings") {
    val emb = spark.read.parquet(s"${TestSpark.Sf}/embeddings.parquet")
      .select($"vec_id".as("id"), $"embedding".as("vec"))
    val queries = emb.filter($"id" < 5)
    val exact = Vectors.knnBrute(queries, emb, 5)
      .select($"qid", $"cid").as[(Long, Long)].collect().toSet
    val approx = Vectors.knnQuantized(queries, emb, 5, rerank = 50)
      .select($"qid", $"cid").as[(Long, Long)].collect().toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall >= 0.9, s"recall $recall")
  }

  test("matryoshka (16-dim prefix) ANN recall vs brute force on real embeddings") {
    val emb = spark.read.parquet(s"${TestSpark.Sf}/embeddings.parquet")
      .select($"vec_id".as("id"), $"embedding".as("vec"))
    val queries = emb.filter($"id" < 5)
    val exact = Vectors.knnBrute(queries, emb, 5)
      .select($"qid", $"cid").as[(Long, Long)].collect().toSet
    def recallAt(rerank: Int): Double = {
      val approx = Vectors.knnMatryoshka(queries, emb, 5, coarseDims = 16,
          rerank = rerank)
        .select($"qid", $"cid").as[(Long, Long)].collect().toSet
      (exact intersect approx).size.toDouble / exact.size
    }
    // these embeddings are NOT matryoshka-trained, so the 16-dim prefix
    // is a deliberately pessimistic coarse scorer (~25% of the signal);
    // the property that matters is the serving knob: rerank depth buys
    // recall monotonically, and a deep shortlist recovers most of it.
    val r50 = recallAt(50)
    val r200 = recallAt(200)
    assert(r50 >= 0.3, s"recall@50 $r50")
    assert(r200 >= r50, s"recall must not degrade with depth: $r50 -> $r200")
    assert(r200 >= 0.7, s"recall@200 $r200")
  }

  test("HNSW: exact and deterministic at verify scale for EVERY query") {
    // the e_knn_hnsw / e_hnsw_recall oracles state brute-force truth;
    // this pin proves the premise for ALL 500 vectors as queries, not
    // just the driver slices: efSearch >= partition population =>
    // the beam explores each partition's whole connected component
    val emb = spark.read.parquet(s"${TestSpark.Sf}/embeddings.parquet")
      .select($"vec_id".as("id"), $"embedding".as("vec"))
    val exact = Vectors.knnBrute(emb, emb, 5)
      .select($"qid", $"rk", $"cid").as[(Long, Long, Long)].collect().toSet
    val h1 = Vectors.knnHnsw(emb, emb, 5)
      .select($"qid", $"rk", $"cid").as[(Long, Long, Long)].collect().toSet
    assert(h1 == exact, "HNSW must equal brute force at verify scale")
    val h2 = Vectors.knnHnsw(emb, emb, 5)
      .select($"qid", $"rk", $"cid").as[(Long, Long, Long)].collect().toSet
    assert(h2 == h1, "two builds must produce identical results (no RNG)")
  }

  test("HNSW graph properties: hash levels reproducible, degree bounded") {
    val rows = (0L until 300L).map { i =>
      (i, Array.tabulate(8)(d => (graft.ops.Hnsw.levelOf(i * 8 + d, 7) % 13
        - 6).toFloat / 7f))
    }.toArray
    val idx = graft.ops.Hnsw.build(rows, m = 6, efConstruction = 32)
    assert(idx.size == 300)
    // levelOf is a pure function of (id, m)
    assert((0L until 100L).forall(i =>
      graft.ops.Hnsw.levelOf(i, 12) == graft.ops.Hnsw.levelOf(i, 12)))
    // geometric-ish: level 0 dominates, tall levels rare
    val levels = (0L until 10000L).map(i => graft.ops.Hnsw.levelOf(i, 12))
    assert(levels.count(_ == 0) > 8500 && levels.forall(_ < 8))
    // search returns k results sorted by cosine desc
    val got = idx.search(rows(17)._2, 10, 64)
    assert(got.size == 10 && got == got.sortBy { case (id, c) => (-c, id) })
  }

  test("HNSW approximate regime: recall >= IVF-multiprobe at equal candidate budget") {
    // sf0.1: 2000 vectors — partitions genuinely exceed efSearch, so
    // the graph search is a real approximation here, not exhaustive.
    val emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    val corpusV = emb.select($"vec_id".as("id"), $"embedding".as("vec"))
    val queries = corpusV.filter($"id" % 40 === 1) // 50 queries
    val exact = Vectors.knnBrute(queries, corpusV, 5)
      .select($"qid", $"cid").as[(Long, Long)].collect().toSet
    // IVF-multiprobe, nprobe 2 of 8 cells: candidate budget ~ 2/8 of
    // the corpus = ~500 scored vectors per query
    val cents = Vectors.kmeansCentroids(emb, k = 8, iters = 2)
    val corpusC = corpusV.withColumn("cell", Vectors.nearestCell($"vec", cents))
    val probes = queries.select($"id", $"vec",
      explode(Vectors.nearestCells($"vec", cents, nprobe = 2)).as("cell"))
    val ivf = Vectors.knnCell(probes, corpusC, "cell", 5)
      .select($"qid", $"cid").as[(Long, Long)].collect().toSet
    val ivfRecall = (exact intersect ivf).size.toDouble / exact.size
    // HNSW at the same budget: 8 partitions x efSearch 62 = ~496
    // beam-explored vectors per query (<= 250 per partition, so the
    // per-partition search cannot be exhaustive-by-ef)
    val hnsw = Vectors.knnHnsw(queries, corpusV, 5,
        m = 8, efConstruction = 48, efSearch = 62, numPartitions = 8)
      .select($"qid", $"cid").as[(Long, Long)].collect().toSet
    val hnswRecall = (exact intersect hnsw).size.toDouble / exact.size
    info(s"recall@5: hnsw=$hnswRecall ivf-multiprobe=$ivfRecall")
    assert(hnswRecall >= ivfRecall,
      s"hnsw $hnswRecall must be >= multiprobe $ivfRecall at equal budget")
    assert(hnswRecall >= 0.9, s"hnsw recall $hnswRecall")
  }

  test("HNSW persistence: stored-and-loaded index answers identically to fresh build") {
    val emb = spark.read.parquet(s"${TestSpark.Sf}/embeddings.parquet")
      .select($"vec_id".as("id"), $"embedding".as("vec"))
    val path = java.nio.file.Files
      .createTempDirectory("graft_hnsw_idx").toString
    Vectors.hnswWriteIndex(emb, path)
    val fresh = Vectors.knnHnsw(emb, emb, 5)
      .select($"qid", $"rk", $"cid", $"cos_sim")
      .as[(Long, Long, Long, Double)].collect().toSet
    val served = Vectors.knnHnswStored(spark, path, emb, 5)
      .select($"qid", $"rk", $"cid", $"cos_sim")
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(served == fresh,
      "stored index must reproduce the fresh build bit-for-bit")
    // level re-derivation contract: m mismatch at load fails loud
    val e = intercept[org.apache.spark.SparkException] {
      Vectors.knnHnswStored(spark, path, emb.limit(1), 3, m = 7).collect()
    }
    assert(e.getMessage.contains("m=") ||
      Option(e.getCause).exists(_.getMessage.contains("m=")))
  }

  test("HNSW incremental append: extended stored index answers exactly over the union") {
    val emb = spark.read.parquet(s"${TestSpark.Sf}/embeddings.parquet")
      .select($"vec_id".as("id"), $"embedding".as("vec"))
    val corpus = emb.filter($"id" % 10 =!= 0)
    val batch = emb.filter($"id" % 10 === 0)
    val gen1 = java.nio.file.Files
      .createTempDirectory("graft_hnsw_g1").toString
    val gen2 = java.nio.file.Files
      .createTempDirectory("graft_hnsw_g2").toString + "/idx"
    Vectors.hnswWriteIndex(corpus, gen1)
    Vectors.hnswAppendIndex(spark, gen1, batch, gen2)
    // exact over the UNION at verify scale (ef >= partition population)
    val served = Vectors.knnHnswStored(spark, gen2, emb.filter($"id" < 12), 5)
      .select($"qid", $"rk", $"cid").as[(Long, Long, Long)].collect().toSet
    val exact = Vectors.knnBrute(emb.filter($"id" < 12), emb, 5)
      .select($"qid", $"rk", $"cid").as[(Long, Long, Long)].collect().toSet
    assert(served == exact,
      "appended index must answer exactly over corpus + batch")
    // every id present exactly once in the extended store
    val storedIds = spark.read.parquet(gen2).select($"id")
      .as[Long].collect().sorted.toSeq
    val allIds = emb.select($"id").as[Long].collect().sorted.toSeq
    assert(storedIds == allIds)
    // overwrite-to-self refused
    val e = intercept[IllegalArgumentException] {
      Vectors.hnswAppendIndex(spark, gen2, batch.limit(1), gen2)
    }
    assert(e.getMessage.contains("generation"))
    // duplicate id against the base fails loud inside the insert
    val dup = intercept[org.apache.spark.SparkException] {
      Vectors.hnswAppendIndex(spark, gen2, emb.limit(1),
        gen2 + "_dup")
    }
    assert(dup.getMessage.contains("duplicate") ||
      Option(dup.getCause).exists(_.getMessage.contains("duplicate")))
  }

  test("knnHnsw guards: query side over maxQueries fails loud") {
    val emb = spark.read.parquet(s"${TestSpark.Sf}/embeddings.parquet")
      .select($"vec_id".as("id"), $"embedding".as("vec"))
    val e = intercept[IllegalArgumentException] {
      Vectors.knnHnsw(emb, emb, 3, maxQueries = 10)
    }
    assert(e.getMessage.contains("maxQueries"))
  }

  test("PQ ANN (8x16 learned codebooks) recall vs brute force on real embeddings") {
    val embRaw = spark.read.parquet(s"${TestSpark.Sf}/embeddings.parquet")
    val emb = embRaw.select($"vec_id".as("id"), $"embedding".as("vec"))
    val books = Vectors.pqCodebooks(embRaw, dim = 64, m = 8, k = 16, iters = 1)
    assert(books.size == 8 && books.forall(b =>
      b.size == 16 && b.forall(_.size == 8)))
    val queries = emb.filter($"id" < 5)
    val exact = Vectors.knnBrute(queries, emb, 5)
      .select($"qid", $"cid").as[(Long, Long)].collect().toSet
    val approx = Vectors.knnPq(queries, emb, books, 5, rerank = 50)
      .select($"qid", $"cid").as[(Long, Long)].collect().toSet
    // 8-byte codes vs 256-byte floats: the 50-deep exact re-rank is
    // what buys the recall back — pin a conservative floor.
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall >= 0.7, s"recall $recall")
  }

  test("IVF-PQ recall vs exact within-cell search") {
    val embRaw = spark.read.parquet(s"${TestSpark.Sf}/embeddings.parquet")
    val cents = Vectors.kmeansCentroids(embRaw, k = 8, iters = 1)
    val assigned = embRaw.select($"vec_id", $"embedding")
      .withColumn("cell", Vectors.nearestCell($"embedding", cents))
      .withColumn("resid", Vectors.residual($"embedding", $"cell", cents))
      .localCheckpoint()
    val books = Vectors.pqCodebooks(
      assigned.select($"vec_id", $"resid".as("embedding")),
      dim = 64, m = 8, k = 16, iters = 1)
    val approx = Vectors.knnIvfPq(assigned, cents, books, $"vec_id" < 5, 5)
      .select($"qid", $"cid").as[(Long, Long)].collect().toSet
    // ground truth: exact cosine within the same learned cells
    val cellFrame = assigned
      .select($"vec_id".as("id"), $"embedding".as("vec"), $"cell")
    val exact = Vectors.knnCell(
        cellFrame.filter($"id" < 5), cellFrame, "cell", 5)
      .select($"qid", $"cid").as[(Long, Long)].collect().toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall >= 0.7, s"recall $recall")
    // structural: every neighbor shares the query's cell
    val cells = assigned.select($"vec_id", $"cell")
      .as[(Long, Long)].collect().toMap
    approx.foreach { case (q, c) => assert(cells(q) == cells(c)) }
  }

  test("neardupLsh: all emitted pairs are true positives; recall pinned vs exact") {
    val emb = spark.read.parquet(s"${TestSpark.Sf}/embeddings.parquet")
    val lsh = Vectors.neardupLsh(emb, threshold = 0.35)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    // exact all-pairs ground truth (no label blocking)
    val e = emb.select($"vec_id".as("id"), $"embedding".as("v"))
      .withColumn("n", Vectors.norm($"v"))
    val exact = e.as("a").join(e.as("b"), $"a.id" < $"b.id")
      .withColumn("cos",
        Vectors.cosine($"a.v", $"b.v", $"a.n", $"b.n"))
      .filter($"cos" >= 0.35)
      .select($"a.id", $"b.id").as[(Long, Long)].collect().toSet
    assert(lsh.subsetOf(exact), "LSH must never emit a false positive")
    val recall = if (exact.isEmpty) 1.0
      else (lsh intersect exact).size.toDouble / exact.size
    // 16-bit/4-band hyperplane LSH at cos≈0.35 (p_bit≈0.61): expected
    // band-collision ≈ 1-(1-0.61^4)^4 ≈ 0.45 — pin a conservative floor.
    assert(recall >= 0.2, s"recall $recall over ${exact.size} exact pairs")
  }

  test("hyperplane bits expression equals the HOF fold form") {
    import org.apache.spark.sql.functions._
    val emb = spark.read.parquet(s"${TestSpark.Sf}/embeddings.parquet")
    val signs = Vectors.hyperplaneSigns(16, 64)
    val signsLit = typedLit(signs)
    val hof = transform(sequence(lit(0), lit(15)), b =>
      when(aggregate(
        zip_with($"embedding", element_at(signsLit, b + 1),
          (x, h) => x.cast("double") * h),
        lit(0.0d), (acc, v) => acc + v) > 0, 1).otherwise(0))
    val diff = emb.select(
        Vectors.hyperplaneSignature($"embedding", 16, 64).as("fast"),
        hof.as("slow"))
      .filter($"fast" =!= $"slow").count()
    assert(diff == 0)
  }

  test("dot/norm fold matches plain math") {
    val df = Seq((Array(1f, 2f, 3f), Array(4f, 5f, 6f))).toDF("a", "b")
    val r = df.select(
      Vectors.dot($"a", $"b").as("d"), Vectors.norm($"a").as("n"))
      .collect()(0)
    assert(r.getAs[Double]("d") == 32.0)
    assert(math.abs(r.getAs[Double]("n") - math.sqrt(14.0)) < 1e-15)
  }

  test("pca projection: top-PC variance dominates every coordinate direction") {
    // λ1 = Var(pc1) must be ≥ the variance of the projection onto ANY
    // axis — i.e. ≥ every per-dimension variance. A non-converged or
    // wrong direction fails this immediately.
    val pc = graft.queries.Similarity.ePcaProjection.fn(spark, TestSpark.Sf)
      .select($"pc1").as[Double].collect()
    val n = pc.length.toDouble
    val mean = pc.sum / n
    val varPc = pc.map(p => (p - mean) * (p - mean)).sum / n
    val dimVars = spark.read.parquet(s"${TestSpark.Sf}/embeddings.parquet")
      .select(org.apache.spark.sql.functions.posexplode($"embedding").as(Seq("i", "v")))
      .groupBy($"i")
      .agg(org.apache.spark.sql.functions.var_pop($"v").as("dv"))
      .select($"dv").as[Double].collect()
    assert(dimVars.nonEmpty && varPc >= dimVars.max * 0.999,
      s"pc1 variance $varPc must dominate max coordinate variance ${dimVars.max}")
  }

  test("pca moments: fast double path matches exact decimal path within rounding tolerance") {
    import graft.ops.PcaMoments
    val emb = spark.read.parquet(s"${TestSpark.Sf}/embeddings.parquet")
      .select($"embedding").as[Array[Float]]
    val exact = emb.select(PcaMoments.aggregator(64).toColumn).head()
    val fast = emb.select(PcaMoments.fastAggregator(64).toColumn).head()
    assert(fast.n == exact.n)
    def relErr(a: Double, b: Double): Double =
      if (a == 0.0 && b == 0.0) 0.0 else math.abs(a - b) / math.max(1.0, math.abs(a))
    val worstS = exact.sums.zip(fast.sums).map((relErr _).tupled).max
    val worstP = exact.prods.zip(fast.prods).map((relErr _).tupled).max
    // exact path rounds each product to 9dp, so agreement is bounded by
    // that rounding (n·5e-10 worst case) plus float noise — both well
    // inside 1e-9 relative at this corpus size per the parity contract
    assert(worstS < 1e-5 && worstP < 1e-5,
      s"fast/exact moments diverged: sums $worstS prods $worstP")
  }

  test("pca 2d: components uncorrelated, variances ordered") {
    val d = graft.queries.Similarity.ePca2d.fn(spark, TestSpark.Sf)
      .select($"pc1", $"pc2").as[(Double, Double)].collect()
    val n = d.length.toDouble
    val (m1, m2) = (d.map(_._1).sum / n, d.map(_._2).sum / n)
    val v1 = d.map(t => (t._1 - m1) * (t._1 - m1)).sum / n
    val v2 = d.map(t => (t._2 - m2) * (t._2 - m2)).sum / n
    val cov = d.map(t => (t._1 - m1) * (t._2 - m2)).sum / n
    val corr = cov / math.sqrt(v1 * v2)
    assert(math.abs(corr) < 0.01, s"pc1 and pc2 must be uncorrelated: $corr")
    assert(v1 >= v2, s"deflated component cannot out-vary the top one: $v1 < $v2")
  }
}
