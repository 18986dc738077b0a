package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.pipeline.{Pipeline, PipelineConfig}
import graft.sources.DocSources

class PipelineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  test("fused pipeline: clean→stats→flag→dedup over the sf0.001 corpus") {
    val docs = spark.read.parquet(s"${TestSpark.Sf}/documents.parquet")
    val out = new Pipeline(spark, PipelineConfig()).run(docs)
    val n = out.count()
    assert(n > 0 && n < docs.count())
    // stats columns present; no flagged docs survive
    assert(out.columns.contains("word_rep_score"))
    assert(out.filter($"has_less_words" || $"is_nsfw_heavy").count() == 0)
    // fuzzy dedup removed at least one of the planted near-dup pairs
    val survivors = out.select("doc_id").as[Long].collect().toSet
    val pairs = graft.ops.MinHash
      .candidatePairs(docs, "doc_id", "text", threshold = 0.5)
      .select($"id_a", $"id_b").as[(Long, Long)].collect()
    val bothSurvive = pairs.count { case (a, b) =>
      survivors.contains(a) && survivors.contains(b) }
    assert(pairs.nonEmpty && bothSurvive == 0)
  }

  test("redact stage: surviving docs keep text with lexicon hits masked") {
    val docs = spark.read.parquet(s"${TestSpark.Sf}/documents.parquet")
    val cfg = PipelineConfig(redact = true)
    val out = new Pipeline(spark, cfg).run(docs).localCheckpoint()
    assert(out.count() > 0)
    // no configured keyword survives as a standalone token, and every
    // doc that carried one now carries the mask instead
    val kwHits = out.filter(
      graft.functions.GraftFunctions.keywordCount($"text", cfg.keywords) > 0)
    assert(kwHits.count() == 0, "redacted output must carry zero keyword hits")
    val masked = out.filter($"text".contains(cfg.redactMask)).count()
    // the fused-pipeline corpus plants keyword-bearing survivors, so
    // redaction must be observably non-vacuous
    assert(masked > 0, "expected at least one masked survivor")
    // redaction runs LAST: survivor set identical to the unredacted run
    val base = new Pipeline(spark, PipelineConfig()).run(docs)
    assert(out.select("doc_id").as[Long].collect().toSet ==
      base.select("doc_id").as[Long].collect().toSet)
  }

  test("keep_best_in_cluster: fuzzy dedup keeps the highest-quality member, not min id") {
    // near-dup pair {2, 5} where the LONGER doc has the LARGER id, plus
    // an untouched singleton; letter-only words keep every flag green
    val basewords = for { a <- 'a' to 'j'; b <- 'a' to 'g' } yield s"word$a$b"
    val base = basewords.mkString(" ")
    val longer = base + " extraone extratwo extrathree"
    val other = (for { a <- 'k' to 't'; b <- 'a' to 'g' } yield s"term$a$b")
      .mkString(" ")
    val docs = Seq(
      (2L, base, "en", "s", base.length.toLong),
      (5L, longer, "en", "s", longer.length.toLong),
      (9L, other, "en", "s", other.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val keepMin = new Pipeline(spark, PipelineConfig()).run(docs)
      .select("doc_id").as[Long].collect().toSet
    assert(keepMin == Set(2L, 9L))
    val keepBest = new Pipeline(spark, PipelineConfig(keepBestInCluster = true))
      .run(docs).select("doc_id").as[Long].collect().toSet
    assert(keepBest == Set(5L, 9L))
  }

  test("html_input: ExtractStage strips chrome before cleaning (reference stage-1)") {
    val words = (for { a <- 'a' to 'j'; b <- 'a' to 'g' } yield s"word$a$b")
    val body = words.mkString(" ")
    val html = s"<html><head><script>var x = 1;</script></head>" +
      s"<body><p>$body</p><!-- c --></body></html>"
    val docs = Seq((1L, html, "en", "s", html.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = new Pipeline(spark,
      PipelineConfig(htmlInput = true, fuzzyDedup = false)).run(docs)
    assert(out.count() == 1)
    assert(out.select($"text").as[String].head == body)
    // without extraction the same doc dies on the symbol-heavy flags
    val raw = new Pipeline(spark,
      PipelineConfig(fuzzyDedup = false)).run(docs)
    assert(raw.count() == 0)
  }

  test("golden stage schemas: every pipeline stage pins its output shape (SURVEY §5.4)") {
    val docs = spark.read.parquet(s"${TestSpark.Sf}/documents.parquet")
    val p = new Pipeline(spark, PipelineConfig())
    val baseCols = Seq("doc_id", "text", "lang", "source", "n_chars")
    assert(docs.columns.toSeq == baseCols)

    val afterClean = p.CleanStage(docs)
    assert(afterClean.schema == docs.schema, "clean is schema-preserving")

    val statCols = Seq(
      "words_count" -> "bigint", "char_count" -> "bigint",
      "bytes" -> "bigint", "mean_word_len" -> "double",
      "nsfw_ratio" -> "double", "non_li_ratio" -> "double",
      "stopword_ratio" -> "double", "word_rep_score" -> "double")
    val afterStats = p.StatsStage(afterClean)
    assert(afterStats.columns.toSeq == baseCols ++ statCols.map(_._1))
    statCols.foreach { case (c, t) =>
      assert(afterStats.schema(c).dataType.simpleString == t, c) }

    val flagCols = Seq("has_less_words", "is_short_words_heavy",
      "is_nsfw_heavy", "is_non_li_heavy", "has_word_repetition")
    val afterFlags = graft.ops.Flagging.addFlags(afterStats, PipelineConfig().flags)
    assert(afterFlags.columns.toSeq ==
      baseCols ++ statCols.map(_._1) ++ flagCols)
    flagCols.foreach(c =>
      assert(afterFlags.schema(c).dataType.simpleString == "boolean", c))

    // Final output: stats + flags survive (the reference keeps the full
    // doc record through removal); dedup stages add nothing.
    assert(p.run(docs).columns.toSeq ==
      baseCols ++ statCols.map(_._1) ++ flagCols)
  }

  test("pipeline routes trivial_tokenize by lang: Urdu docs use the Urdu marks (F18)") {
    import graft.functions.GraftFunctions
    import graft.ops.Text
    // Urdu full stop ۔ is a pad-split mark only on the Urdu route; the
    // danda route leaves it glued to the preceding word. The 5-gram
    // "الف ب پ ت ث" repeats ONLY once ۔ is split off, so the Urdu route
    // scores > 0 while the danda route scores 0 on this text.
    val txt = "الف ب پ ت ث۔ ک گ ل م ن الف ب پ ت ث"
    val df = Seq((1L, "ur", txt), (2L, "hi", txt)).toDF("doc_id", "lang", "text")
    val p = new Pipeline(spark, PipelineConfig())
    val scores = p.StatsStage(df)
      .select($"lang", $"word_rep_score").as[(String, Double)].collect().toMap
    val Seq(expUr, expHi) = Seq("ur", "hi").map { l =>
      df.limit(1).select(
        GraftFunctions.wordNgramRep(Text.trivialTokenize($"text", l), 5))
        .as[Double].head()
    }
    assert(scores("ur") == expUr)
    assert(scores("hi") == expHi)
    assert(expUr != expHi, "routing must be observable on this vector")
  }

  test("checkpointed mode materializes each stage; partitioned write prunes") {
    val ckpt = tmp("graft-ckpt")
    val outDir = tmp("graft-out") + "/corpus"
    val docs = spark.read.parquet(s"${TestSpark.Sf}/documents.parquet")
    val cfg = PipelineConfig(fuzzyDedup = false, checkpointRoot = Some(ckpt))
    val n = new Pipeline(spark, cfg).runAndWrite(docs, outDir)
    assert(n > 0)
    for (st <- Seq("clean", "stats", "flag_remove", "dedup_exact"))
      assert(new java.io.File(s"$ckpt/$st").exists(), st)
    // hive-partitioned layout, readable with partition pruning
    val langs = new java.io.File(outDir).list().filter(_.startsWith("lang="))
    assert(langs.length >= 4)
    val en = spark.read.parquet(outDir).filter($"lang" === "en")
    assert(en.count() > 0)
    // side channel (S10/S11): removed docs written with their flags
    val removed = spark.read.parquet(outDir + "_removed")
    assert(removed.count() > 0)
    assert(removed.columns.contains("has_less_words"))
    // reference utilities.py:59-72: strip the lang= prefix for
    // consumers that expect bare <value>/ dirs; refuses to clobber
    val nRenamed = DocSources.renamePartitionedDirs(spark, outDir, "lang")
    assert(nRenamed == langs.length, s"$nRenamed of ${langs.length}")
    val bare = new java.io.File(outDir).list()
    assert(!bare.exists(_.startsWith("lang=")) && bare.contains("en"),
      bare.mkString(","))
    // second run is a no-op (nothing left to rename)
    assert(DocSources.renamePartitionedDirs(spark, outDir, "lang") == 0)
  }

  test("CSV source: explicit schema, header, malformed row tolerated") {
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files.createTempDirectory("graft_csv")
    val f = dir.resolve("docs.csv")
    java.nio.file.Files.writeString(f,
      "doc_id,text,lang\n1,hello world,en\n2,bonjour,fr\nnot_a_long,x,y\n")
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType)))
    val got = graft.sources.DocSources
      .readCsv(spark, f.toString, schema)
      .collect().sortBy(r => Option(r.getAs[java.lang.Long]("doc_id"))
        .map(_.longValue).getOrElse(Long.MinValue))
    assert(got.length == 3)
    assert(got(1).getLong(0) == 1L && got(1).getString(1) == "hello world")
    assert(got(0).isNullAt(0)) // malformed doc_id → null, row kept
  }

  test("XML source: rowTag elements with explicit schema (wiki-dump shape)") {
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files.createTempDirectory("graft_xml")
    java.nio.file.Files.writeString(dir.resolve("dump.xml"),
      """<docs>
        |<doc><doc_id>1</doc_id><text>hello world</text><lang>en</lang></doc>
        |<doc><doc_id>2</doc_id><text>bonjour</text><lang>fr</lang></doc>
        |</docs>""".stripMargin)
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType)))
    val got = graft.sources.DocSources
      .readXml(spark, s"$dir/dump.xml", "doc", schema)
      .orderBy($"doc_id")
      .as[(Long, String, String)].collect().toSeq
    assert(got == Seq((1L, "hello world", "en"), (2L, "bonjour", "fr")))
  }

  test("ORC source/sink round trip with predicate pushdown") {
    val dir = java.nio.file.Files.createTempDirectory("graft_orc")
    val docs = spark.read.parquet(s"${TestSpark.Sf}/documents.parquet")
    graft.sources.DocSources.writeOrc(docs, s"$dir/docs.orc")
    val back = graft.sources.DocSources.readOrc(spark, s"$dir/docs.orc")
    assert(back.schema == docs.schema)
    assert(back.count() == docs.count())
    // filter + projection reach the ORC scan (same pushdown contract
    // as the parquet source tests)
    val plan = back.filter($"doc_id" < 10).select($"doc_id", $"lang")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(doc_id), LessThan(doc_id,10)]"),
      s"ORC scan must receive the pushed filter:\n$plan")
    assert(back.filter($"doc_id" < 10).count() ==
      docs.filter($"doc_id" < 10).count())
  }

  test("compaction: many small files rewritten to the size-derived count") {
    val dir = java.nio.file.Files.createTempDirectory("graft_compact")
    val docs = spark.read.parquet(s"${TestSpark.Sf}/documents.parquet")
    // simulate a streaming sink's fragmentation: 64 tiny files
    docs.repartition(64).write.mode("overwrite").parquet(s"$dir/frag")
    def parts(p: String) = new java.io.File(p).listFiles()
      .count(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
    assert(parts(s"$dir/frag") == 64)
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    val bytes = fs.getContentSummary(
      new org.apache.hadoop.fs.Path(s"$dir/frag")).getLength
    // target a quarter of the dataset per file → 4-ish output files
    val target = math.max(1L, bytes / 4)
    val n = DocSources.compactParquet(spark, s"$dir/frag", s"$dir/compact", target)
    assert(parts(s"$dir/compact") == n && n <= 5,
      s"expected ~4 compacted files, got $n")
    // content preserved exactly
    val back = spark.read.parquet(s"$dir/compact")
    assert(back.count() == docs.count())
    assert(back.exceptAll(docs).count() == 0 && docs.exceptAll(back).count() == 0)
    // in-place / nested targets are refused, never silently destructive
    for (bad <- Seq(s"$dir/frag", s"$dir/frag/sub", dir.toString))
      assertThrows[IllegalArgumentException] {
        DocSources.compactParquet(spark, s"$dir/frag", bad, target)
      }
  }

  test("JSON source round trip with explicit schema (S1)") {
    val dir = tmp("graft-json")
    Files.writeString(java.nio.file.Path.of(s"$dir/a.json"),
      """{"doc_id": 1, "text": "hello world", "lang": "en"}
        |{"doc_id": 2, "text": "bonjour le monde", "lang": "fr"}
        |not-json-garbage
        |{"doc_id": 3, "text": "hola mundo", "lang": "es"}""".stripMargin)
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType)))
    val df = DocSources.readJson(spark, s"$dir/a.json", schema)
    assert(df.filter($"doc_id".isNotNull).count() == 3)
  }

  test("config file parsing with overrides and defaults") {
    val p = tmp("graft-cfg") + "/c.json"
    Files.writeString(java.nio.file.Path.of(p),
      """{"min_word_count": 5, "fuzzy_dedup": false,
        |"keywords": ["alpha", "beta gamma"], "minhash_threshold": 0.7,
        |"redact": true, "redact_mask": "###"}""".stripMargin)
    val cfg = PipelineConfig.fromJsonFile(p)
    assert(cfg.flags.minWordCount == 5)
    assert(!cfg.fuzzyDedup)
    assert(cfg.keywords == Seq("alpha", "beta gamma"))
    assert(cfg.minhashThreshold == 0.7)
    assert(cfg.flags.nonLiRatio == 0.05) // default preserved
    assert(cfg.redact && cfg.redactMask == "###")
    assert(!PipelineConfig().redact && PipelineConfig().redactMask == "[*]",
      "redaction must default OFF with the standard mask")
  }

  test("runAndWrite: one input scan, observe-counted write, consistent outputs") {
    val outDir = tmp("graft-single") + "/corpus"
    val docs = spark.read.parquet(s"${TestSpark.Sf}/documents.parquet")
    val cfg = PipelineConfig(fuzzyDedup = false)
    val p = new Pipeline(spark, cfg)
    val n = p.runAndWrite(docs, outDir)
    // observe-counted result equals what actually landed on disk
    assert(n == spark.read.parquet(outDir).count())
    val removed = spark.read.parquet(outDir + "_removed")
    assert(removed.count() > 0 && removed.columns.contains("has_less_words"))
    // removed + survivors (pre-dedup) partition the input exactly
    val flagged = graft.ops.Flagging.addFlags(
      p.StatsStage(p.CleanStage(docs)), cfg.flags)
    assert(removed.count() +
      graft.ops.Flagging.removeFlagged(flagged).count() == docs.count())
    // the materialized-flags pattern runAndWrite uses: downstream plans
    // read the checkpointed frame, never the input files again
    val ckpt = flagged.localCheckpoint()
    val plan = graft.ops.Flagging.removeFlagged(ckpt)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("FileScan parquet"), plan)
  }

  test("per-language lexicons load and thread through shipped configs") {
    import graft.sources.Lexicons
    for (l <- Lexicons.languages) {
      assert(Lexicons.nsfw(l).nonEmpty, s"nsfw $l")
      assert(Lexicons.stopwords(l).nonEmpty, s"stopwords $l")
    }
    // non-Latin lexicons really are non-Latin, in their own scripts
    assert(Lexicons.stopwords("hindi").exists(_.exists(_ >= 0x0900.toChar)))
    assert(Lexicons.nsfw("bengali").exists(_.exists(c => c >= 0x0980.toChar && c <= 0x09FF.toChar)))
    assert(Lexicons.stopwords("punjabi").forall(_.forall(c => c >= 0x0A00.toChar && c <= 0x0A7F.toChar)), "Gurmukhi")
    assert(Lexicons.stopwords("gujarati").forall(_.forall(c => c >= 0x0A80.toChar && c <= 0x0AFF.toChar)), "Gujarati script")
    assert(Lexicons.stopwords("oriya").forall(_.forall(c => c >= 0x0B00.toChar && c <= 0x0B7F.toChar)), "Odia script")
    // Bengali-script languages (assamese, manipuri) and Devanagari ones
    // (nepali, konkani, dogri) share their script blocks
    assert(Lexicons.stopwords("assamese").exists(_.exists(c => c >= 0x0980.toChar && c <= 0x09FF.toChar)))
    assert(Lexicons.stopwords("manipuri").exists(_.exists(c => c >= 0x0980.toChar && c <= 0x09FF.toChar)))
    assert(Lexicons.stopwords("nepali").exists(_.exists(c => c >= 0x0900.toChar && c <= 0x097F.toChar)))
    // union automaton input is deduplicated
    val union = Lexicons.nsfwUnion()
    assert(union.distinct.size == union.size)
    // shipped config resolves its language's lexicons
    val cfg = PipelineConfig.forLanguage("hindi")
    assert(cfg.keywords == Lexicons.nsfw("hindi"))
    assert(cfg.stopwords == Lexicons.stopwords("hindi"))
    val en = PipelineConfig.forLanguage("english")
    assert(en.stopwords.contains("the"))
    // EVERY shipped config (crawl + ocr family) loads and resolves
    // non-empty lexicons through LangData — including the documented
    // script-fallback languages (bodo/maithili/... -> hindi lists)
    val cfgFiles = new java.io.File("configs").listFiles()
      .filter(_.getName.matches("graft_.*_config\\.json")).map(_.getName)
    assert(cfgFiles.length >= 24, s"expected >=24 crawl configs, got ${cfgFiles.length}")
    for (f <- cfgFiles; dir <- Seq("configs", "configs/ocr")) {
      val lang = f.stripPrefix("graft_").stripSuffix("_config.json")
      val c = PipelineConfig.forLanguage(lang, dir)
      assert(c.keywords.nonEmpty && c.stopwords.nonEmpty, s"$dir/$f")
      assert(c.flags.minWordCount > 0, s"$dir/$f")
    }
    // the ocr family's delta: word-repetition flagging disabled
    val ocrHi = PipelineConfig.forLanguage("hindi", "configs/ocr")
    assert(ocrHi.flags.wordRepScore > 1.0, "ocr config must not flag repetition")
    assert(PipelineConfig.forLanguage("hindi").flags.wordRepScore <= 0.5)
  }

  test("language mapping: ISO-coded configs resolve lexicons; F27 column rename") {
    import graft.sources.LangData
    // reference-shaped config keyed by ISO codes, not names
    val dir = java.nio.file.Files.createTempDirectory("graft_cfg")
    val f = dir.resolve("graft_urdu_config.json")
    java.nio.file.Files.writeString(f,
      """{"language": "urd", "nsfw_lexicons": ["urd"],
        | "stopword_lexicons": ["ur"], "min_word_count": 40}""".stripMargin)
    val cfg = PipelineConfig.forLanguage("urd", dir.toString)
    assert(cfg.keywords == graft.sources.Lexicons.nsfw("urdu"))
    assert(cfg.stopwords == graft.sources.Lexicons.stopwords("urdu"))
    assert(cfg.flags.minWordCount == 40)
    // the reference's F27 tuple: (urdu, urd) -> code "ur"; generalized
    // to every shipped language, unknown values pass through
    val df = Seq("urdu", "urd", "ur", "HINDI", "brx", "klingon")
      .toDF("l")
      .select(LangData.nameCol($"l").as("name"), LangData.codeCol($"l").as("code"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(df == Seq(("urdu", "ur"), ("urdu", "ur"), ("urdu", "ur"),
      ("hindi", "hi"), ("bodo", "brx"), ("klingon", "klingon")))
    // mapping invariants: names unique, iso3 unique, thresholds cover
    // the reference's 23-language set
    assert(LangData.all.map(_.language).distinct.size == LangData.all.size)
    assert(LangData.all.map(_.iso3).distinct.size == LangData.all.size)
    assert(LangData.dedupThresholds.size >= 23)
    assert(LangData.dedupThresholds.forall { case (l, m) =>
      LangData.byName.contains(l) && m > 0 })
  }

  test("remote-FS source: file:// reads, unconfigured cloud scheme fails fast (S12)") {
    val n = DocSources.readRemote(spark,
      s"file://${TestSpark.Sf}/documents.parquet").count()
    assert(n == spark.read.parquet(s"${TestSpark.Sf}/documents.parquet").count())
    val e = intercept[IllegalArgumentException] {
      DocSources.readRemote(spark, "gs://bucket/corpus.parquet")
    }
    assert(e.getMessage.contains("connector"))
  }

  test("manifest source unions listed parquet files (S3)") {
    val m = tmp("graft-manifest") + "/m.info"
    Files.writeString(java.nio.file.Path.of(m),
      s"${TestSpark.Sf}/documents.parquet\n\n${TestSpark.Sf}/documents.parquet\n")
    val n = DocSources.readManifest(spark, m).count()
    assert(n == 2 * spark.read.parquet(s"${TestSpark.Sf}/documents.parquet").count())
  }

  test("external LID bridge: deterministic fake scorer drives the ensemble " +
      "with first-priority votes and per-partition lifecycle") {
    import graft.lid._
    import spark.implicits._
    // deterministic fake "model": keyword table + open/close bookkeeping
    // via an accumulator pair (executor-side counters must cross back)
    val opens = spark.sparkContext.longAccumulator("opens")
    val closes = spark.sparkContext.longAccumulator("closes")
    val fake = new ExternalScorerFactory {
      def open(): ExternalScorer = {
        opens.add(1)
        new ExternalScorer {
          def scoreBatch(texts: Seq[String]): Seq[LidResult] = texts.map {
            case t if t.contains("bonjour") => LidResult("fr", 0.99)
            case t if t.contains("नमस्ते")  => LidResult("hi", 0.98)
            case _ => LidResult("und", 0.0)
          }
          def close(): Unit = closes.add(1)
        }
      }
    }
    val df = Seq(
      (1L, "bonjour le monde est grand"),              // fr: ext + ngram/stop agree
      (2L, "नमस्ते यह एक वाक्य है और है की से में"),   // hi: ext + indic/script
      // ext abstains; heuristics own it (the bridge must not mask them)
      (3L, "the quick brown fox jumps over the lazy dog and it was the")
    ).toDF("doc_id", "text").repartition(2)
    val out = ExternalLid.annotate(spark, df, "doc_id", "text", fake)
    val rows = out.collect().map(r =>
      r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("doc_lang"), r.getAs[String]("ext_lang")))).toMap
    assert(rows(1L) == (("fr", "fr")))
    assert(rows(2L) == (("hi", "hi")))
    assert(rows(3L)._1 == "en" && rows(3L)._2 == "und")
    // lifecycle: one scorer per NONEMPTY partition, every open closed
    assert(opens.value > 0 && opens.value <= 2, s"opens=${opens.value}")
    assert(closes.value == opens.value,
      s"leaked scorers: opens=${opens.value} closes=${closes.value}")
    // schema is the Ensemble.annotate contract + the ext head
    assert(out.columns.toSeq == Seq("doc_id", "doc_lang", "ext_lang",
      "ext_conf", "indic_lang", "indic_conf", "ngram_lang", "ngram_conf",
      "stop_lang", "stop_conf", "script_lang", "script_conf"))
  }

  test("external LID bridge: real subprocess speaks the fasttext line protocol") {
    import graft.lid._
    import spark.implicits._
    // a real out-of-process scorer: echoes one fasttext-style line per
    // input line — exercises launch, batch flush, in-order reads, close
    val cmd = SubprocessScorer.factory("/bin/sh", "-c",
      """while IFS= read -r l; do echo "__label__mni 0.9"; done""")
    val df = (0L until 600L).map(i => (i, s"doc $i body")).toDF("doc_id", "text")
      .repartition(3) // 200 rows per partition; batching path still one flush
    val out = ExternalLid.annotate(spark, df, "doc_id", "text", cmd)
      .select($"ext_lang", $"ext_conf").distinct().collect()
    assert(out.length == 1 && out(0).getString(0) == "mni"
      && out(0).getDouble(1) == 0.9)
  }

  test("external LID bridge: protocol parser vectors") {
    import graft.lid.{LidResult, SubprocessScorer => S}
    assert(S.parse("__label__hi 0.97") == LidResult("hi", 0.97))
    assert(S.parse("ta\t0.5") == LidResult("ta", 0.5))
    assert(S.parse("bn 1") == LidResult("bn", 1.0))
    assert(S.parse("en") == LidResult("en", 1.0))
    assert(S.parse("  ") == LidResult("und", 0.0))
    assert(S.parse("__label__ 0.4") == LidResult("und", 0.0))
    assert(S.parse("fr notanumber") == LidResult("fr", 0.0))
  }
}
