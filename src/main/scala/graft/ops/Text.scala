package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-statistics column library (SURVEY §2.8) — pure built-in
  * compositions, so every operator stays inside whole-stage codegen and
  * Catalyst can push filters/pruning straight to the parquet scan.
  *
  * Semantics follow the reference exactly where it has an opinion:
  *  - word count splits on a single space, `"".split(" ")` counts 1
  *    (setu/filters.py:756-758) → `size(split(c, " ", -1))`;
  *  - bytes = UTF-8 length (setu/filters.py:764-766) → `octet_length`;
  *  - char count = codepoints (setu/filters.py:760-762) → `length`
  *    (Spark's UTF8String.numChars counts codepoints, so non-BMP chars
  *    count 1 exactly like Python `len` — verified in TextSemanticsSpec);
  *  - is_number is Unicode-digit aware (setu/filters.py:773-775,
  *    Python str.isdigit) → `\p{Nd}` regex, not `[0-9]`.
  */
object Text {

  /** Reference word tokenization: split on single space, keep empties. */
  def tokens(c: Column): Column = split(c, " ", -1)

  /** IndicNLP `trivial_tokenize` (the tokenizer behind the reference's
    * word n-gram repetition, setu/filters.py:584; the rule itself is the
    * public indic-nlp-library `trivial_tokenize_indic`): tabs → space,
    * every ASCII punctuation char + danda/double-danda padded with
    * spaces, space runs collapsed, space-stripped, split on single
    * space. `lang="ur"` routes to the library's Urdu variant, whose
    * class swaps the dandas for the Urdu-script marks. Two faithful
    * quirks: newlines are NOT split points (the Python rule collapses
    * only spaces), and BACKSLASH never splits — the library embeds
    * `string.punctuation` in a regex class where its `\]` reads as an
    * escaped bracket, consuming the backslash. Parity is pinned in
    * TextSemanticsSpec and oracled in d_ngram_rep_word_tok. */
  def trivialTokenize(c: Column, lang: String = "hi"): Column =
    org.apache.spark.sql.graft.bridge.column(
      graft.functions.TrivialTokenize(
        org.apache.spark.sql.graft.bridge.expression(c), trivialMarks(lang)))

  /** The mark class trivial_tokenize pads: ASCII punctuation minus
    * backslash (the library's regex quirk), plus the language-routed
    * marks (danda family, or the Urdu set for `ur`). */
  def trivialMarks(lang: String): String = {
    val ascii = """!"#$%&'()*+,-./:;<=>?@[]^_`{|}~"""
    if (lang.equalsIgnoreCase("ur")) ascii + "؉؊،؞٪٫٬٭۔"
    else ascii + "।॥"
  }

  /** The 3-regex composition [[trivialTokenize]] fuses — kept ONLY as
    * the property-test reference (PropertiesSpec pins fused == this). */
  private[graft] def trivialTokenizeRegex(c: Column, lang: String = "hi"): Column = {
    val cls = trivialMarks(lang)
      .replace("\\", "\\\\").replace("[", "\\[").replace("]", "\\]")
      .replace("-", "\\-")
    val padded = regexp_replace(regexp_replace(c, "\t", " "),
      "([" + cls + "])", " $1 ")
    split(trim(regexp_replace(padded, " +", " ")), " ", -1)
  }

  /** Column-routed [[trivialTokenize]]: the reference calls
    * trivial_tokenize(text, lang_code) per document (setu/filters.py:584)
    * and the library dispatches `lang == "ur"` to the Urdu variant —
    * same dispatch here, per row, as a single `when` projection. */
  def trivialTokenizeBy(c: Column, lang: Column): Column =
    when(lower(lang) === "ur", trivialTokenize(c, "ur"))
      .otherwise(trivialTokenize(c))

  def wordCount(c: Column): Column = size(tokens(c))

  def charCount(c: Column): Column = length(c)

  def byteCount(c: Column): Column = octet_length(c)

  /** Unicode-digit-only test (Python `str.isdigit` parity incl.
    * Devanagari ०-९). */
  def isNumber(c: Column): Column = c.rlike("^[\\p{Nd}]+$")

  /** Whitespace-collapse + trim + lowercase normalization (the portable
    * core of F11; script-specific normalization is the NFKC expression
    * in graft.functions). Collapse+trim run as one fused byte pass
    * (CollapseWs); lower() stays the built-in. */
  def normalizeWs(c: Column): Column =
    org.apache.spark.sql.graft.bridge.column(
      graft.functions.CollapseWs(
        org.apache.spark.sql.graft.bridge.expression(lower(c))))

  /** The regex composition [[normalizeWs]] fuses — kept ONLY as the
    * property-test reference (PropertiesSpec pins fused == this). */
  private[graft] def normalizeWsRegex(c: Column): Column =
    regexp_replace(trim(lower(c)), "\\s+", " ")

  /** Terminal-punctuation validity (F5): ends with a terminal mark and
    * not with the `...` / `####` exceptions (setu/constants.py:125-134). */
  def isTerminalValid(c: Column): Column =
    c.rlike("[.!?।:,;)\"'؟۔]$|॥$") && !c.endsWith("...") && !c.endsWith("####")

  /** Ratio of characters outside an allowed character class (the shape
    * behind F4/F9/F10 symbol/non-li ratios): chars-not-in-class / chars.
    * `regexp_replace(c, allowed, "")` strips the allowed class, so its
    * length IS the disallowed count. */
  def charClassOutRatio(c: Column, allowedClassRegex: String): Column =
    // Literal-ASCII classes ("[a-z ]", "[^0-9]") fuse to one byte scan —
    // same integers, same division bits as the regex form (pinned in
    // PropertiesSpec); classes with escapes/Unicode (e.g. "[\\p{L}\\s]")
    // keep the regex composition.
    if (graft.functions.AsciiClassOutRatio.parse(allowedClassRegex).isDefined)
      org.apache.spark.sql.graft.bridge.column(
        graft.functions.AsciiClassOutRatio(
          org.apache.spark.sql.graft.bridge.expression(c), allowedClassRegex))
    else charClassOutRatioRegex(c, allowedClassRegex)

  /** The regex composition [[charClassOutRatio]] fuses for ASCII
    * classes — still the live path for Unicode classes, and the
    * property-test reference for the fused one. */
  private[graft] def charClassOutRatioRegex(
      c: Column, allowedClassRegex: String): Column =
    when(length(c) === 0, 0.0d)
      .otherwise(length(regexp_replace(c, allowedClassRegex, ""))
        .cast("double") / length(c))

  /** Count of characters matching a class (F10 non-li count shape). */
  def charClassCount(c: Column, classRegex: String): Column =
    length(c) - length(regexp_replace(c, classRegex, ""))

  /** A4 lines2doc join (setu/utilities.py:116-128 `join_using_symbol`):
    * lines concatenated in (pos) sort order with NO separator — each
    * line carries its own delimiter — and a line whose first two chars
    * are both spaces is dedented by exactly one (`line[1:]`; lines with
    * MORE leading spaces still lose only one). Takes an
    * `array<struct<pos,line>>` so it composes with `collect_list` under
    * a hash aggregate (no window needed). */
  def linesToDoc(lines: Column): Column =
    array_join(
      transform(array_sort(lines), x => {
        val l = x.getField("line")
        when(l.startsWith("  "), l.substr(lit(2), length(l))).otherwise(l)
      }), "")

  /** Word n-grams as strings, empty array when the doc is too short
    * (guard matters: Spark `sequence(0, -1)` would yield a *descending*
    * sequence, not an empty one). */
  def wordNgrams(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      transform(sequence(lit(0), size(toks) - n),
        i => array_join(slice(toks, i + 1, lit(n)), " ")))
      .otherwise(array())

  /** Character n-grams of a string column. */
  def charNgrams(c: Column, n: Int): Column =
    when(length(c) >= n,
      transform(sequence(lit(1), length(c) - (n - 1)),
        i => c.substr(i, lit(n))))
      .otherwise(array())

  /** F4 is_num_or_punc_only: numeric-only, or ≥`thr` of chars outside
    * the allowed (letter/space) class (setu/filters.py:98-188 shape). */
  def isNumOrPuncOnly(c: Column, thr: Double = 0.4): Column =
    isNumber(c) || (charClassOutRatio(c, "[\\p{L} ]") >= thr)

  /** F6/F7/F8 code handling (setu/filters.py:190-235,345-368): the
    * reference regex family for HTML / JS / CSS blocks; removal is the
    * end-to-end semantics (`remove_code`), detection is `hasCode`. */
  val CodePatterns: Seq[String] = Seq(
    "<[^>]+>[\\s\\S]*?</[^>]+>", // HTML element with body
    "function\\s*\\w*\\s*\\([^)]*\\)\\s*\\{[\\s\\S]*?\\}", // JS function block
    "[.#]?[\\w-]+\\s*\\{[^}]*\\}") // CSS rule block

  def hasCode(c: Column): Column =
    CodePatterns.map(p => c.rlike(p)).reduce(_ || _)

  def removeCode(c: Column): Column =
    CodePatterns.foldLeft(c)((col, p) => regexp_replace(col, p, ""))

  /** F21 terminal_punc_filter (setu/filters.py:370-386): drop the
    * `\n`-chunks whose terminal punctuation is invalid; returns the
    * cleaned text. Pair with [[terminalPuncFlagged]] for the count. */
  def terminalPuncClean(c: Column): Column =
    array_join(filter(split(c, "\n", -1), ch => isTerminalValid(ch)), "\n")

  /** F21 companion: number of chunks dropped. */
  def terminalPuncFlagged(c: Column): Column =
    size(split(c, "\n", -1)) -
      size(filter(split(c, "\n", -1), ch => isTerminalValid(ch)))

  /** F22 split_at_terminal_punc (setu/filters.py:295-307, IndicNLP
    * sentence_split): language-routed sentence segmentation — Brahmic
    * scripts split on danda family, Urdu-script languages on Arabic
    * question/full stop, Latin on `.?!`; delimiter kept attached,
    * pieces trimmed, empties dropped. */
  def sentenceSplitPattern(lang: String): String =
    graft.functions.IndicNorm.langScript.get(lang.toLowerCase) match {
      case Some(Some(_)) => "[.?!।॥](\\n+)?" // Brahmic script
      case Some(None)    => "[.?!؟۔](\\n+)?" // Urdu-script langs
      case _             => "[.?!](\\n+)?"   // Latin / unknown
    }

  def sentenceSplit(c: Column, lang: String): Column =
    filter(
      transform(
        org.apache.spark.sql.graft.bridge.column(
          graft.functions.SplitKeepDelimiter(
            org.apache.spark.sql.graft.bridge.expression(c),
            sentenceSplitPattern(lang))),
        s => trim(s)),
      s => s =!= "")

  /** Distinct word-shingle set for similarity/dedup (first-occurrence
    * order; tight-loop expression — see WordShingles). */
  def shingleSet(textCol: Column, n: Int): Column =
    org.apache.spark.sql.graft.bridge.column(
      graft.functions.WordShingles(
        org.apache.spark.sql.graft.bridge.expression(tokens(textCol)), n))

  /** Jaccard similarity of two pre-distinct shingle arrays — fused
    * one-pass expression (see JaccardSim; the HOF form materialized
    * array_intersect twice per candidate pair). */
  def jaccard(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.bridge.column(
      graft.functions.JaccardSim(
        org.apache.spark.sql.graft.bridge.expression(a),
        org.apache.spark.sql.graft.bridge.expression(b)))

  /** HTML → text extraction (the reference's stage-1 role,
    * setu/text_extraction.py: trafilatura.extract): readability-grade
    * main-content extraction is a Python-library affair; the
    * Spark-native operator is a codegen'd regexp chain that covers the
    * structural part — script/style/comment removal, block tags to
    * newlines, tag stripping, basic entity decode, whitespace cleanup.
    * Every pattern carries inline (?is) flags so the IDENTICAL regex
    * runs in the DuckDB oracle (d_html_extract). For
    * readability-parity with trafilatura (boilerplate scoring etc.)
    * plug a library via mapPartitions — the surrounding plumbing
    * (schema, per-partition batching) is what this engine provides. */
  val HtmlDropPatterns: Seq[String] = Seq(
    "(?is)<script[^>]*>.*?</script>",
    "(?is)<style[^>]*>.*?</style>",
    "(?s)<!--.*?-->")
  val HtmlBlockPattern: String =
    "(?i)</?(p|br|div|h[1-6]|li|ul|ol|tr|table|section|article)[^>]*>"
  val HtmlTagPattern: String = "<[^>]+>"

  def extractHtmlText(c: Column): Column = {
    val dropped = HtmlDropPatterns.foldLeft(c)((col, p) => regexp_replace(col, p, ""))
    val blocks = regexp_replace(dropped, HtmlBlockPattern, "\n")
    val untagged = regexp_replace(blocks, HtmlTagPattern, " ")
    val decoded = Seq(
      "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"", "&#39;" -> "'",
      "&nbsp;" -> " ", "&amp;" -> "&") // &amp; LAST so it can't re-form entities
      .foldLeft(untagged) { case (col, (e, ch)) => regexp_replace(col, e, ch) }
    // per-line trim + drop empties, preserve line structure
    array_join(
      filter(transform(split(decoded, "\n", -1),
          l => trim(regexp_replace(l, "[ \\t]+", " "))),
        l => l =!= ""),
      "\n")
  }

  /** PII masking for training-data pipelines: emails, international
    * phone numbers, and 4-4-4 digit id sequences replaced by typed
    * placeholder tokens. RE2-compatible patterns (no lookaround, ASCII
    * digit classes) so the identical regex runs in DuckDB oracles, and
    * the whole chain is codegen'd `regexp_replace` — no UDF. Mask order
    * (email → id → phone) is part of the contract: placeholders contain
    * no digits, so later patterns cannot re-match earlier replacements. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val IdRe = "\\d{4} \\d{4} \\d{4}"
  val PhoneRe = "\\+\\d{1,3} \\d{5} \\d{5}"

  def maskPii(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(c, EmailRe, "<EMAIL>"),
        IdRe, "<ID>"),
      PhoneRe, "<PHONE>")

  /** The built-in composition [[jaccard]] fuses — kept ONLY as the
    * property-test reference (PropertiesSpec pins fused == this). */
  private[graft] def jaccardHof(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val union = size(a) + size(b) - size(array_intersect(a, b))
    when(union === 0, 0.0d).otherwise(inter / union)
  }

  /** Collapse runs of consecutive equal tokens to one ("the the the" →
    * "the"): an indexed HOF filter keeping positions whose token
    * differs from its predecessor. Pure per-row expression — no
    * explode/window — so it stays inside scan codegen. */
  def collapseRuns(toks: Column): Column =
    filter(toks, (x, i) => i === 0 || x =!= element_at(toks, i))

  /** Mojibake signature pairs: UTF-8 bytes decoded as Latin-1/cp1252
    * (é→Ã©, ’→â€™, “→â€œ, ”→â€, NBSP→Â +space). Alternation order
    * puts longer sequences first so the â€œ/â€ prefix overlap resolves
    * identically under Java regex and RE2 (both leftmost-first). */
  val MojibakeRe = "Ã©|â€™|â€œ|â€|Â "

  /** Repair pairs in application order — longer sequences before their
    * shared â€ prefix (replace is order-sensitive). Single source for
    * the Column chain below AND the graft_mojibake_repair SQL builder. */
  val MojibakePairs: Seq[(String, String)] = Seq(
    "Ã©" -> "é", "â€™" -> "’", "â€œ" -> "“", "â€" -> "”", "Â " -> " ")

  def mojibakeCount(c: Column): Column =
    regexp_count(c, lit(MojibakeRe)).cast("long")

  /** Reverse the mojibake pairs, longest-first (same chain order as the
    * oracle — replace is order-sensitive over the shared â€ prefix). */
  def mojibakeRepair(c: Column): Column =
    MojibakePairs.foldLeft(c) { case (acc, (bad, good)) =>
      replace(acc, lit(bad), lit(good))
    }
}
