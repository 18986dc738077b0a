package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.graft.bridge.{column, expression}
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

/** Column wrappers + SQL registration for the custom expressions, so
  * every operator is reachable from both the DataFrame API and
  * `spark.sql` (oracle tests exercise the SQL path too).
  */
object GraftFunctions {

  def keywordMatches(c: Column, keywords: Seq[String]): Column =
    column(KeywordMatches(expression(c), keywords))

  def keywordCount(c: Column, keywords: Seq[String]): Column =
    column(KeywordCount(expression(c), keywords))

  def keywordSpans(c: Column, keywords: Seq[String]): Column =
    column(KeywordSpans(expression(c), keywords))

  def keywordRedact(c: Column, keywords: Seq[String],
      mask: String = "[*]"): Column =
    column(KeywordRedact(expression(c), keywords, mask))

  def splitKeepDelim(c: Column, pattern: String): Column =
    column(SplitKeepDelimiter(expression(c), pattern))

  def jaroWinkler(a: Column, b: Column): Column =
    column(JaroWinkler(expression(a), expression(b)))

  def normalizeUnicode(c: Column, form: String = "NFKC"): Column =
    column(NormalizeUnicode(expression(c), form))

  /** F11 full: per-language Indic normalization → NFKC (lang per row). */
  def indicNormalize(text: Column, lang: Column): Column =
    column(IndicNormalize(expression(text), expression(lang)))

  /** F20: truncate invalid chunks at their last terminal punctuation. */
  def removeNonTerminalPuncSpan(c: Column, chunkLenThreshold: Double): Column =
    column(NonTerminalPuncSpanRemove(expression(c), chunkLenThreshold))

  def charNgramRep(c: Column, n: Int): Column =
    column(CharNgramRepScore(expression(c), n))

  def wordNgramRep(tokens: Column, n: Int): Column =
    column(WordNgramRepScore(expression(tokens), n))

  def rollingHash(c: Column): Column =
    column(RollingHash(expression(c)))

  /** Nesting-aware HTML block tree ([[graft.ops.HtmlDom]]): array of
    * (pos, depth, path, text, link_chars, chrome) structs. */
  def domBlocks(html: Column): Column =
    column(DomBlocks(expression(html)))

  /** Structure-preserving markdown rendering ([[graft.ops.HtmlDom
    * .markdown]]): headings, nested list markers, pipe tables,
    * blockquotes; chrome subtrees dropped. */
  def domMarkdown(html: Column): Column =
    column(DomMarkdown(expression(html)))

  /** Native Bloom-filter build: Spark's internal BloomFilterAggregate
    * (the expression behind runtime-filter joins — not exposed in the
    * public FunctionRegistry, so it's bridged here). `value` must be a
    * LONG (hash the key with xxhash64 first); the result is one binary
    * per group, mergeable map-side like any TypedImperativeAggregate.
    *
    * CAP AWARENESS: Spark silently clamps `numBits` to
    * `spark.sql.optimizer.runtime.bloomFilter.maxNumBits` (default
    * 67 108 864 = 8 MB), so at the 10-bits/item sizing the callers use,
    * fpp degrades past the documented ~1% beyond ~6.7M items. Bloom
    * filters never produce false negatives, so EXACTNESS is unaffected
    * — only pruning power decays — but that decay should not be silent:
    * this helper warns when the request exceeds the configured cap so a
    * 100 TB operator sees the signal and can raise the conf. */
  def bloomFilterAgg(value: Column, estimatedItems: Long,
      numBits: Long): Column = {
    val maxBits = org.apache.spark.sql.internal.SQLConf.get
      .getConf(org.apache.spark.sql.internal.SQLConf
        .RUNTIME_BLOOM_FILTER_MAX_NUM_BITS)
    if (numBits > maxBits) {
      // scalastyle:off println
      System.err.println(
        s"[graft] bloomFilterAgg: requested $numBits bits exceeds " +
          s"spark.sql.optimizer.runtime.bloomFilter.maxNumBits=$maxBits; " +
          "Spark will clamp and the effective false-positive rate will " +
          "be higher than the ~1% the 10-bits/item sizing targets. " +
          "Raise the conf for full pruning power (exactness unaffected).")
      // scalastyle:on println
    }
    column(new org.apache.spark.sql.catalyst.expressions.aggregate
      .BloomFilterAggregate(expression(value),
        Literal(estimatedItems), Literal(numBits))
      .toAggregateExpression())
  }

  /** Native Bloom membership probe over a DRIVER-HELD filter binary
    * (from [[bloomFilterAgg]]): the bytes ride the plan as a literal —
    * bounded, same footprint as an explicit broadcast value — and the
    * probe codegens; no per-row Scala closure. `value` must be the
    * same xxhash64 hashing used at build. Bloom guarantee: never a
    * false negative, so prefilter-then-exact-join stays exact. */
  def bloomMightContain(filter: Array[Byte], value: Column): Column =
    column(org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
      Literal(filter, org.apache.spark.sql.types.BinaryType),
      expression(value)))

  /** The reference's sentence-delimiter class (setu/filters.py:312):
    * split after `.?!।|॥؟۔` plus any trailing newlines. */
  val SentenceDelimiterPattern = "[.?!।|॥؟۔](\\n+)?"

  private def litString(e: Expression, what: String): String = e match {
    case Literal(s: UTF8String, StringType) => s.toString
    case other => throw new IllegalArgumentException(
      s"$what must be a string literal, got $other")
  }

  private def litInt(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an int literal, got $other")
  }

  /** The complete `graft_*` SQL function surface as (name, builder)
    * pairs — the single source for BOTH session-imperative registration
    * ([[registerSql]]) and config-driven injection
    * ([[graft.GraftExtensions]], `spark.sql.extensions`). Keyword-list
    * arguments arrive as a single comma-separated string literal. */
  lazy val sqlFunctions: Seq[(String, Seq[Expression] => Expression)] = {
    val out = Seq.newBuilder[(String, Seq[Expression] => Expression)]
    def reg(name: String)(builder: Seq[Expression] => Expression): Unit =
      out += (name -> builder)

    reg("graft_keyword_matches") { es =>
      KeywordMatches(es.head, litString(es(1), "keywords").split(",").toSeq)
    }
    reg("graft_keyword_count") { es =>
      KeywordCount(es.head, litString(es(1), "keywords").split(",").toSeq)
    }
    reg("graft_keyword_spans") { es =>
      KeywordSpans(es.head, litString(es(1), "keywords").split(",").toSeq)
    }
    reg("graft_keyword_redact") { es =>
      KeywordRedact(es.head, litString(es(1), "keywords").split(",").toSeq,
        if (es.size > 2) litString(es(2), "mask") else "[*]")
    }
    reg("graft_split_keep_delim") { es =>
      SplitKeepDelimiter(es.head, litString(es(1), "pattern"))
    }
    reg("graft_dom_blocks") { es => DomBlocks(es.head) }
    reg("graft_dom_markdown") { es => DomMarkdown(es.head) }
    reg("graft_normalize") { es =>
      NormalizeUnicode(es.head,
        if (es.size > 1) litString(es(1), "form") else "NFKC")
    }
    reg("graft_char_ngram_rep") { es =>
      CharNgramRepScore(es.head, litInt(es(1), "n"))
    }
    reg("graft_word_ngram_rep") { es =>
      WordNgramRepScore(es.head, litInt(es(1), "n"))
    }
    reg("graft_rolling_hash")(es => RollingHash(es.head))
    reg("graft_word_gram_hashes") { es =>
      WordGramHashes(es.head, litInt(es(1), "n"))
    }
    reg("graft_winnow_fingerprints") { es =>
      WinnowFingerprints(es.head, litInt(es(1), "k"), litInt(es(2), "w"))
    }
    reg("graft_collapse_ws")(es => CollapseWs(es.head))
    reg("graft_jaro_winkler")(es => JaroWinkler(es.head, es(1)))
    reg("graft_trivial_tokenize") { es =>
      TrivialTokenize(es.head,
        graft.ops.Text.trivialMarks(
          if (es.size > 1) litString(es(1), "lang") else "hi"))
    }
    reg("graft_indic_normalize")(es => IndicNormalize(es.head, es(1)))
    reg("graft_remove_non_terminal_punc_span") { es =>
      // SQL parses `2.0` as a Decimal literal, not Double — accept all
      // three numeric literal shapes.
      NonTerminalPuncSpanRemove(es.head, es(1) match {
        case Literal(v: Double, _) => v
        case Literal(v: Int, _) => v.toDouble
        case Literal(v: org.apache.spark.sql.types.Decimal, _) => v.toDouble
        case other => throw new IllegalArgumentException(
          s"chunk_len_threshold must be a numeric literal, got $other")
      })
    }
    // F27 language canonicalization on the SQL surface: the literal
    // CASE chains from the shipped mapping resource (sources.LangData),
    // built as raw Catalyst CaseWhen (the registry path never analyzes
    // Column-DSL nodes).
    def langCase(input: Expression,
        mapping: Seq[(String, String)]): Expression = {
      import org.apache.spark.sql.catalyst.expressions.{CaseWhen, EqualTo, Lower}
      val lc = Lower(input)
      CaseWhen(
        mapping.map { case (from, to) =>
          (EqualTo(lc, Literal(from)): Expression, Literal(to): Expression)
        },
        Some(input))
    }
    reg("graft_lang_name")(es =>
      langCase(es.head, graft.sources.LangData.nameMapping))
    reg("graft_lang_code")(es =>
      langCase(es.head, graft.sources.LangData.codeMapping))
    // Mojibake surface (ops.Text.mojibakeRepair/-Count as raw Catalyst
    // trees — nested StringReplace / one RegExpCount, fully codegen'd).
    reg("graft_mojibake_count") { es =>
      import org.apache.spark.sql.catalyst.expressions.{Cast, RegExpCount}
      Cast(RegExpCount(es.head, Literal(graft.ops.Text.MojibakeRe)),
        org.apache.spark.sql.types.LongType)
    }
    reg("graft_mojibake_repair") { es =>
      import org.apache.spark.sql.catalyst.expressions.StringReplace
      graft.ops.Text.MojibakePairs.foldLeft(es.head) {
        case (acc, (bad, good)) =>
          StringReplace(acc, Literal(bad), Literal(good))
      }
    }
    out.result()
  }

  /** Register every [[sqlFunctions]] entry on an existing session. */
  def registerSql(spark: SparkSession): Unit = {
    val registry = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
    sqlFunctions.foreach { case (name, builder) =>
      registry.createOrReplaceTempFunction(name, builder, "built-in")
    }
  }
}
