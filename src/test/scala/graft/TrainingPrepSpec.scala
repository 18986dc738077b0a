package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.ops.{Skew, SubstrDedup, Text}

/** Training-prep operators: the scalable forms must be drop-in
  * equivalent to their naive single-reducer twins, and the span/chunk
  * arithmetic is pinned on hand-built vectors. */
class TrainingPrepSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("prefixSumByKey == per-key window running sum (bit-identical)") {
    val docs = spark.read.parquet(s"${TestSpark.Sf}/documents.parquet")
      .select($"doc_id", $"lang", Text.wordCount($"text").cast("long").as("v"))
    val expected = docs
      .withColumn("cum", sum($"v").over(
        Window.partitionBy($"lang").orderBy($"doc_id")))
      .select($"doc_id", $"cum").as[(Long, Long)].collect().toMap
    val got = Skew.prefixSumByKey(docs, "lang", Seq($"doc_id"), $"v", "cum")
      .select($"doc_id", $"cum").as[(Long, Long)].collect().toMap
    assert(got == expected)
  }

  test("kendall tau-b: contingency-cell identity == brute-force pair count") {
    // the O(c^2) cell form d_kendall_tau rides must equal the textbook
    // O(n^2) pair scan, ties and all, to the exact floor-micro
    val rows = spark.read.parquet(s"${TestSpark.Sf}/documents.parquet")
      .select($"source", $"n_chars".cast("long").as("x"),
        size(split($"text", " ", -1)).cast("long").as("y"))
      .as[(String, Long, Long)].collect().toSeq
    val bySrc = rows.groupBy(_._1)
    val brute = bySrc.flatMap { case (src, rs) =>
      val xs = rs.map(_._2); val ys = rs.map(_._3); val n = rs.size
      var conc = 0L; var disc = 0L; var tx = 0L; var ty = 0L
      for (i <- 0 until n; j <- (i + 1) until n) {
        val (dx, dy) = (xs(i).compare(xs(j)), ys(i).compare(ys(j)))
        if (dx == 0) tx += 1
        if (dy == 0) ty += 1
        if (dx * dy > 0) conc += 1
        if (dx * dy < 0) disc += 1
      }
      val n0 = n.toLong * (n - 1) / 2
      if (n0 - tx <= 0 || n0 - ty <= 0) None
      else {
        val tau = 2.0 * (conc - disc) / math.sqrt(
          (2.0 * (n0 - tx)) * (2.0 * (n0 - ty)))
        Some(src -> (conc, disc, math.floor(tau * 1000000).toLong))
      }
    }
    val got = graft.queries.TrainingPrep.dKendallTau
      .fn(spark, TestSpark.Sf)
      .select($"source", $"concordant", $"discordant", $"tau_micros")
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(got.keySet == brute.keySet)
    for ((src, exp) <- brute) assert(got(src) == exp, s"source $src")
  }

  test("term burstiness: integer dispersion == brute fold with zeros; Poisson ~ 1000") {
    val rows = spark.read.parquet(s"${TestSpark.Sf}/documents.parquet")
      .select($"text").as[String].collect().toSeq
    val n = rows.size.toLong
    val tfs = rows.map(_.split(" ", -1).filter(_.nonEmpty)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap)
    val got = graft.queries.TrainingPrep.dTermBurstiness
      .fn(spark, TestSpark.Sf)
      .select($"term", $"df", $"total_tf", $"dispersion_milli", $"bursty")
      .as[(String, Long, Long, Long, Boolean)].collect()
    assert(got.length == 20)
    for ((term, df, tot, disp, bursty) <- got) {
      val xs = tfs.map(_.getOrElse(term, 0L))
      assert(xs.count(_ > 0).toLong == df && xs.sum == tot, s"term $term")
      val s1 = BigInt(xs.sum)
      val s2 = xs.map(x => BigInt(x) * x).sum
      val vnum = BigInt(n) * s2 - s1 * s1
      assert(BigInt(disp) == vnum * 1000 / (BigInt(n - 1) * s1),
        s"term $term dispersion")
      assert(bursty == (vnum > BigInt(n - 1) * s1), s"term $term flag")
    }
    // planted Poisson-like control: a term appearing exactly once in
    // every doc has variance n(n-1)... no — tf==1 everywhere gives
    // var = (n*n - n*n)... vnum = n*n - n*n = 0 -> D = 0, NOT bursty
    val ones = Seq.fill(10)(1L)
    val v1 = BigInt(10) * ones.map(x => BigInt(x) * x).sum -
      BigInt(ones.sum) * ones.sum
    assert(v1 == 0, "uniform tf must have zero dispersion")
  }

  test("welch t-test: moment-frame pairs == brute per-pair fold; sign tracks means") {
    val rows = spark.read.parquet(s"${TestSpark.Sf}/documents.parquet")
      .select($"source", $"n_chars".cast("long"))
      .as[(String, Long)].collect().toSeq
    val bySrc = rows.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    def moments(xs: Seq[Long]) = {
      val n = xs.size.toLong
      val s = xs.map(BigInt(_)).sum
      val q = xs.map(x => BigInt(x) * x).sum
      (n, s, q)
    }
    val srcs = bySrc.keys.toSeq.sorted
    val brute = (for {
      i <- srcs.indices; j <- (i + 1) until srcs.size
      (na, sa, qa) = moments(bySrc(srcs(i)))
      (nb, sb, qb) = moments(bySrc(srcs(j)))
      if na > 1 && nb > 1
    } yield {
      val ra = (BigInt(na) * qa - sa * sa).toDouble /
        (BigInt(na) * na * (na - 1)).toDouble
      val rb = (BigInt(nb) * qb - sb * sb).toDouble /
        (BigInt(nb) * nb * (nb - 1)).toDouble
      val dm = sa.toDouble / na.toDouble - sb.toDouble / nb.toDouble
      val t = dm / math.sqrt(ra + rb)
      val df = (ra + rb) * (ra + rb) /
        (ra * ra / (na - 1).toDouble + rb * rb / (nb - 1).toDouble)
      (srcs(i), srcs(j)) ->
        (math.floor(t * 1e6).toLong, math.floor(df * 1e6).toLong)
    }).toMap
    val got = graft.queries.TrainingPrep.dWelchTtest.fn(spark, TestSpark.Sf)
      .select($"source_a", $"source_b", $"t_micros", $"df_micros")
      .as[(String, String, Long, Long)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    assert(got == brute)
    // sign sanity: t > 0 iff source_a's mean length exceeds source_b's
    for (((a, b), (tm, _)) <- got if tm != 0 && tm != -1) {
      val ma = bySrc(a).sum.toDouble / bySrc(a).size
      val mb = bySrc(b).sum.toDouble / bySrc(b).size
      assert((tm > 0) == (ma > mb), s"pair ($a,$b)")
    }
  }

  test("chi2 terms: distributed contingency == brute doc-presence fold") {
    val rows = spark.read.parquet(s"${TestSpark.Sf}/documents.parquet")
      .select($"lang", $"text").as[(String, String)].collect().toSeq
    val n = rows.size.toLong
    val nLang = rows.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val presence = rows.flatMap { case (lang, text) =>
      text.split(" ", -1).filter(_.nonEmpty).distinct.map(t => (t, lang))
    }
    val aMap = presence.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val dfMap = presence.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val brute = aMap.collect {
      case ((term, lang), a) if dfMap(term) >= 5 =>
        val b = dfMap(term) - a
        val c = nLang(lang) - a
        val d = n - dfMap(term) - c
        val diff = BigInt(a) * d - BigInt(b) * c
        val den = BigInt(a + b) * (c + d) * (a + c) * (b + d)
        val chi2 = (BigInt(n) * diff * diff).toDouble / den.toDouble
        (lang, term) -> math.floor(chi2 * 1e6).toLong
    }
    val expectedTop = brute.toSeq.groupBy(_._1._1).map { case (lang, xs) =>
      lang -> xs.map { case ((_, t), c) => (t, c) }
        .sortBy { case (t, c) => (-c, t) }.take(5)
    }
    val got = graft.queries.TrainingPrep.dChi2Terms.fn(spark, TestSpark.Sf)
      .select($"lang", $"rank", $"term", $"chi2_micros")
      .as[(String, Long, String, Long)].collect()
      .groupBy(_._1).view.mapValues(
        _.sortBy(_._2).map(r => (r._3, r._4)).toSeq).toMap
    assert(got.keySet == expectedTop.keySet)
    // floor-micro brute vs engine can differ only via double-vs-BigInt
    // numerator paths — require exact agreement on term ranking and
    // near-exact (1 micro) agreement on the statistic
    for ((lang, exp) <- expectedTop) {
      assert(got(lang).map(_._1) == exp.map(_._1), s"lang $lang ranking")
      for (((_, gc), (_, ec)) <- got(lang).zip(exp))
        assert(math.abs(gc - ec) <= 1, s"lang $lang chi2 $gc vs $ec")
    }
  }

  test("neyman allocation: high-variance stratum out-allocates an equal-size uniform one") {
    // two strata of 100 docs each: constant lengths vs spread lengths —
    // Neyman must give (strictly) more budget to the varied stratum,
    // and a constant stratum (S_h = 0) gets weight 0, not a div-by-zero
    val m = Seq(
      ("flat", 100L, 100L * 50, 100L * 50 * 50),          // all x = 50
      ("wild", 100L, 100L * 50, 100L * 50 * 50 + 90000L)) // same mean, var > 0
      .toDF("source", "n", "sx", "sxx")
      .select($"source", $"n".cast("decimal(38,0)").as("n"),
        $"sx".cast("decimal(38,0)").as("sx"),
        $"sxx".cast("decimal(38,0)").as("sxx"))
    val got = graft.queries.TrainingPrep.neymanOverMoments(m)
      .select($"source", $"quota_of_1000").as[(String, Long)]
      .collect().toMap
    assert(got("wild") > got("flat"), s"allocation $got")
    assert(got("flat") == 0L, "zero-variance stratum must get zero weight")
    assert(got("wild") == 1000L)
  }

  test("prefixSumByKey works with a non-string key column") {
    val docs = spark.read.parquet(s"${TestSpark.Sf}/documents.parquet")
      .select($"doc_id", ($"doc_id" % 7).as("k"),
        Text.wordCount($"text").cast("long").as("v"))
    val expected = docs
      .withColumn("cum", sum($"v").over(
        Window.partitionBy($"k").orderBy($"doc_id")))
      .select($"doc_id", $"cum").as[(Long, Long)].collect().toMap
    val got = Skew.prefixSumByKey(docs, "k", Seq($"doc_id"), $"v", "cum")
      .select($"doc_id", $"cum").as[(Long, Long)].collect().toMap
    assert(got == expected)
    assert(got.nonEmpty)
  }

  test("prefixSumsByKey: two columns in one pass == two window running sums") {
    val docs = spark.read.parquet(s"${TestSpark.Sf}/documents.parquet")
      .select($"doc_id", $"lang",
        Text.wordCount($"text").cast("long").as("v1"),
        length($"text").cast("long").as("v2"))
    val w = Window.partitionBy($"lang").orderBy($"doc_id")
    val expected = docs
      .withColumn("c1", sum($"v1").over(w))
      .withColumn("c2", sum($"v2").over(w))
      .select($"doc_id", $"c1", $"c2")
      .as[(Long, Long, Long)].collect().map(t => t._1 -> (t._2, t._3)).toMap
    val got = Skew.prefixSumsByKey(docs, "lang", Seq($"doc_id"),
        Seq($"v1" -> "c1", $"v2" -> "c2"))
      .select($"doc_id", $"c1", $"c2")
      .as[(Long, Long, Long)].collect().map(t => t._1 -> (t._2, t._3)).toMap
    assert(got == expected)
    assert(got.nonEmpty)
  }

  test("profileColumns survives SQL-metacharacter column names") {
    val df = Seq((1, "a"), (2, null), (3, "c"))
      .toDF("id num", "va'l`ue")
    val prof = graft.ops.Profile
      .profileColumns(df, Seq("id num", "va'l`ue"))
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(prof == Map("id num" -> 0L, "va'l`ue" -> 1L))
  }

  test("prefixSumByKey handles a key confined to one partition and empty input") {
    val one = Seq((1L, "a", 5L), (2L, "a", 7L), (3L, "b", 11L))
      .toDF("id", "k", "v")
    val got = Skew.prefixSumByKey(one, "k", Seq($"id"), $"v", "cum")
      .select($"id", $"cum").as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 5L, 2L -> 12L, 3L -> 11L))
    val empty = Seq.empty[(Long, String, Long)].toDF("id", "k", "v")
    assert(Skew.prefixSumByKey(empty, "k", Seq($"id"), $"v", "cum").count() == 0)
  }

  test("tokenBudgetByHash: first doc kept even when it alone exceeds the budget") {
    val df = Seq((1L, "a", 500L), (2L, "a", 500L), (3L, "a", 500L))
      .toDF("id", "k", "tok")
    // hash order of ids within stratum 'a' decides which is "first"
    val first = df
      .withColumn("h", graft.ops.Sampling.hash48($"id"))
      .orderBy($"h", $"id").select($"id").as[Long].head
    val kept = graft.ops.Sampling
      .tokenBudgetByHash(df, "k", "id", "tok", budget = 100)
      .select($"id").as[Long].collect().toSet
    assert(kept == Set(first)) // overshoot rule: starts-under-budget keeps it
  }

  test("TopK stratified sample == window row_number form") {
    val k = 20
    val docs = spark.read.parquet(s"${TestSpark.Sf}/documents.parquet")
      .select($"lang", $"doc_id",
        conv(substring(md5($"doc_id".cast("string")), 1, 12), 16, 10)
          .cast("long").as("h48"))
    val expected = docs
      .withColumn("rk", row_number().over(
        Window.partitionBy($"lang").orderBy($"h48", $"doc_id")))
      .filter($"rk" <= k)
      .select($"lang", $"rk".cast("long"), $"doc_id")
      .as[(String, Long, Long)].collect().toSet
    val got = graft.queries.TrainingPrep.dStratifiedSample
      .fn(spark, TestSpark.Sf)
      .select($"lang", $"sample_rank", $"doc_id")
      .as[(String, Long, Long)].collect().toSet
    assert(got == expected)
  }

  test("dupSpans merges overlapping and adjacent grams, splits on gaps") {
    // tokens 0..29; duplicated 3-grams planted at positions:
    //  doc 1 & 2 share grams at 0,1,2 (overlap-merge → one span [0,5))
    //  doc 1 & 2 share a gram at 8 (adjacent to nothing: 8-2=6 > 3 → new span)
    //  doc 1 & 2 share a gram at 20 (separate island)
    def toks(prefix: String): Seq[String] =
      (0 until 30).map {
        case i if i <= 4  => s"shared$i"   // grams 0,1,2 duplicated
        case i if i >= 8 && i <= 10 => s"mid$i"  // gram 8 duplicated
        case i if i >= 20 && i <= 22 => s"tail$i" // gram 20 duplicated
        case i => s"$prefix$i"
      }
    val df = Seq((1L, toks("a")), (2L, toks("b"))).toDF("id", "l")
    val got = SubstrDedup.dupSpans(df, "id", "l", n = 3, minDocs = 2)
      .as[(Long, Long, Long, Long)].collect().toSet
    val expectedPerDoc = Set(
      (0L, 5L, 3L),   // grams 0,1,2 → span [0, 2+3)
      (8L, 11L, 1L),  // gram 8
      (20L, 23L, 1L)) // gram 20
    assert(got == Set(1L, 2L).flatMap(id =>
      expectedPerDoc.map { case (a, b, n) => (id, a, b, n) }))
  }

  test("removeDupSpans: fully-duplicated doc empties, untouched doc keeps all") {
    val md5Empty = "d41d8cd98f00b204e9800998ecf8427e"
    val shared = (0 until 6).map(i => s"s$i") // 6 tokens, dup as whole doc
    val df = Seq(
      (1L, shared),                           // fully covered → empty
      (2L, shared ++ Seq("x2", "y2", "z2")),  // prefix covered
      (3L, Seq("a", "b", "c", "d", "e", "f")) // untouched
    ).toDF("id", "l")
    val got = graft.ops.SubstrDedup
      .removeDupSpans(df, "id", "l", n = 3, minDocs = 2)
      .as[(Long, String, Long, Long)].collect().sortBy(_._1)
    assert(got(0) == ((1L, md5Empty, 0L, 6L)))
    // doc 2: grams 0..3 duplicated (span [0,6)) — wait, gram at pos 3
    // is (s3 s4 s5) which doc 1 also has → covered [0,6); x2 y2 z2 kept
    val keptMd5 = spark.sql("SELECT md5('x2 y2 z2')").head.getString(0)
    assert(got(1) == ((2L, keptMd5, 3L, 6L)))
    val fullMd5 = spark.sql("SELECT md5('a b c d e f')").head.getString(0)
    assert(got(2) == ((3L, fullMd5, 6L, 0L)))
  }

  test("dupSpans ignores grams below minDocs and within-doc-only repeats") {
    val df = Seq(
      (1L, Seq("x", "y", "z", "q", "x", "y", "z")), // repeats only within doc 1
      (2L, Seq("p", "q", "r", "s", "t"))
    ).toDF("id", "l")
    assert(SubstrDedup.dupSpans(df, "id", "l", n = 3, minDocs = 2).count() == 0)
  }

  test("chunk windows: full coverage, stride overlap, short-doc single chunk") {
    val out = graft.queries.TrainingPrep.dChunkWindows.fn(spark, TestSpark.Sf)
      .select($"doc_id", $"chunk_idx", $"start_tok", $"chunk_len")
      .as[(Long, Long, Long, Long)].collect()
    val byDoc = out.groupBy(_._1)
    val nTok = spark.read.parquet(s"${TestSpark.Sf}/documents.parquet")
      .filter($"doc_id" % 5 === 0)
      .select($"doc_id", Text.wordCount($"text").cast("long"))
      .as[(Long, Long)].collect().toMap
    byDoc.foreach { case (doc, chunks) =>
      val n = nTok(doc)
      val sorted = chunks.sortBy(_._2)
      // starts are 0, 24, 48, ... strictly below n
      assert(sorted.map(_._3).toSeq == (0L until n by 24L).toSeq)
      // every chunk inside the doc; all but possibly the last are full
      sorted.foreach { case (_, _, st, len) =>
        assert(st + len <= n && len == math.min(32L, n - st))
      }
      // windows cover every token (stride < size ⇒ no holes)
      assert(sorted.last._3 + sorted.last._4 == n)
    }
  }

  test("mixture sample: per-lang prefix in hash order, budget boundary rule") {
    val out = graft.queries.TrainingPrep.dMixtureSample.fn(spark, TestSpark.Sf)
      .as[(String, Long, Long, Long)].collect()
    val all = spark.read.parquet(s"${TestSpark.Sf}/documents.parquet")
      .select($"lang",
        conv(substring(md5($"doc_id".cast("string")), 1, 12), 16, 10)
          .cast("long"), $"doc_id",
        Text.wordCount($"text").cast("long"))
      .as[(String, Long, Long, Long)].collect()
    out.groupBy(_._1).foreach { case (lang, kept) =>
      // kept docs form exactly the prefix of the lang's (h48, id) order
      // whose doc START falls under the budget
      val ordered = all.filter(_._1 == lang).sortBy(t => (t._2, t._3))
      val expect = ordered
        .scanLeft(0L)(_ + _._4).zip(ordered)
        .takeWhile { case (before, _) => before < 1500 }
        .map(_._2._3).toSet
      assert(kept.map(_._2).toSet == expect)
      // the sample crosses the budget line unless the stratum ran dry
      val total = ordered.map(_._4).sum
      assert(kept.map(_._3).sum >= math.min(1500L, total))
    }
  }

  test("tfidf top terms: ≤3 per doc, distinct, scores non-increasing") {
    val out = graft.queries.TrainingPrep.dTfidfTopTerms.fn(spark, TestSpark.Sf)
      .select($"doc_id", $"rk", $"term", $"tfidf")
      .as[(Long, Long, String, Double)].collect()
    out.groupBy(_._1).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_._2)
      assert(sorted.length <= 3)
      assert(sorted.map(_._3).distinct.length == sorted.length)
      assert(sorted.map(_._4).sliding(2).forall {
        case Array(a, b) => a >= b
        case _           => true
      })
    }
  }

  test("JSONL shard export: packing → directory-per-shard → lossless read-back") {
    val out = java.nio.file.Files.createTempDirectory("graft_shards").toString
    val packed = graft.queries.TrainingPrep.dShardPacking.fn(spark, TestSpark.Sf)
      .join(spark.read.parquet(s"${TestSpark.Sf}/documents.parquet")
        .select($"doc_id", $"text"), Seq("doc_id"))
      .withColumn("shard",
        concat($"lang", org.apache.spark.sql.functions.lit("-"),
          $"shard_idx".cast("string")))
    graft.sources.DocSources.writeJsonlShards(
      packed.select($"doc_id", $"text", $"n_tok", $"shard"), out, "shard")
    // directory-per-shard layout, gzip jsonl part files inside
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory)
      .map(_.getName).filter(_.startsWith("shard="))
    assert(dirs.nonEmpty)
    assert(dirs.forall(d => new java.io.File(s"$out/$d").listFiles()
      .exists(f => f.getName.endsWith(".json.gz"))))
    // lossless round trip including the partition column
    val back = spark.read.json(out)
    assert(back.count() == packed.count())
    val origIds = packed.select($"doc_id").as[Long].collect().toSet
    assert(back.select($"doc_id").as[Long].collect().toSet == origIds)
    // every shard (except possibly each lang's last) holds one doc
    // crossing the 400-token line, never two budget-fulls
    val perShard = back.groupBy($"shard")
      .agg(sum($"n_tok").as("t")).as[(String, Long)].collect()
    assert(perShard.forall(_._2 < 800 + 99)) // budget + max doc len slack
  }

  test("Misra-Gries summary: recall guarantee and merge validity on skewed streams") {
    import graft.ops.HeavyHitters
    val k = 10
    val rnd = new scala.util.Random(42)
    // skewed stream: token i drawn with weight ~ 1/(i+1)
    val stream = (0 until 20000).map { _ =>
      val r = rnd.nextDouble()
      val i = math.min(49, (math.pow(50.0, r) - 1).toInt) // log-skewed
      s"t$i"
    }
    val exact = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = stream.size.toLong
    // sequential build
    val seq = stream.foldLeft(Map.empty[String, Long])(
      (m, x) => HeavyHitters.mgInsert(m, x, k))
    // split-and-merge build (any partitioning must preserve the invariant)
    val parts = stream.grouped(1700).map(
      _.foldLeft(Map.empty[String, Long])((m, x) => HeavyHitters.mgInsert(m, x, k)))
    val merged = parts.reduce(HeavyHitters.mgMerge(_, _, k))
    for (m <- Seq(seq, merged)) {
      assert(m.size <= k)
      // EVERY item with true frequency > n/k must be present
      exact.filter(_._2 > n / k).keys.foreach(t =>
        assert(m.contains(t), s"missing heavy item $t in ${m.keys}"))
      // MG undercount bound: kept count never exceeds the true count
      m.foreach { case (t, c) => assert(c <= exact(t)) }
    }
    // end-to-end: exactOverThreshold returns exactly GROUP BY/HAVING
    val df = stream.toDF("tok")
    val got = HeavyHitters.exactOverThreshold(df, "tok", k)
      .select($"tok", $"n").as[(String, Long)].collect().toMap
    assert(got == exact.filter { case (_, c) => c * k > n }.toMap)
  }

  test("per-batch MG summary UNION contains every global heavy hitter (streaming guarantee)") {
    // The streaming heavy-hitter design rests on: if Σc_i > Σn_i/k then
    // some batch has c_i > n_i/k (average argument), and the MG
    // invariant keeps that token in that batch's summary — so the
    // UNION of independent per-batch summaries (no merging at all) is
    // a valid candidate set for the exact recount. Pin it on a skewed
    // stream cut into adversarially uneven batches.
    import graft.ops.HeavyHitters
    val k = 10
    val rnd = new scala.util.Random(7)
    val stream = (0 until 30000).map { _ =>
      val r = rnd.nextDouble()
      val i = math.min(79, (math.pow(80.0, r) - 1).toInt)
      s"t$i"
    }
    val exact = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = stream.size.toLong
    val sizes = Seq(101, 5000, 37, 9000, 1500, 30000) // last takes the rest
    val batches = sizes.foldLeft((Seq.empty[Seq[String]], stream: Seq[String])) {
      case ((acc, rest), sz) =>
        val (h, t) = rest.splitAt(sz); (acc :+ h, t)
    }._1.filter(_.nonEmpty)
    assert(batches.map(_.size).sum == n)
    val union = batches.flatMap(
      _.foldLeft(Map.empty[String, Long])(
        (m, x) => HeavyHitters.mgInsert(m, x, k)).keys).toSet
    exact.filter(_._2 > n / k).keys.foreach(t =>
      assert(union.contains(t), s"global heavy item $t absent from union"))
  }

  test("unigram LM score: repeated-token doc scores higher than rare-token doc") {
    val out = graft.queries.TrainingPrep.dUnigramLmScore.fn(spark, TestSpark.Sf)
    // avg_logprob is a real score: finite, negative, and docs made of
    // frequent tokens beat docs of hapaxes — proxy check: correlation
    // sign between score and mean corpus frequency must be positive.
    val rows = out.as[(Long, Long, Double)].collect()
    assert(rows.nonEmpty && rows.forall { case (_, n, s) =>
      n > 0 && s < 0 && !s.isNaN && !s.isInfinite })
  }
}
