package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.GraftFunctions
import graft.ops.Text

/** Oracle-backed queries for the text-CLEANING scalar family (SURVEY
  * §2.8 F1/F4/F5/F6-F8/F12) — previously ScalaTest-pinned only.
  *
  * The synthetic `documents` text is pure lowercase words, so each
  * query derives its punctuation / digits / code inputs
  * deterministically from table columns — identical expressions on the
  * Spark and DuckDB sides — and then runs the REAL operator on them.
  * That keeps the oracle comparison meaningful (operators see non-
  * vacuous inputs) while using only driver-provided data.
  */
object CleaningOps {

  private def docs(s: org.apache.spark.sql.SparkSession, dir: String) =
    Tables.load(s, dir, "documents")

  /** F1 split_with_delimiter (setu/filters.py:309-330): sentence split
    * keeping each delimiter run attached to the preceding piece. Input
    * is the doc text re-punctuated into 3 sentences. */
  val dSplitSentences: Spec = Spec(
    "d_split_sentences",
    oracle = Some("""
      WITH r AS (
        SELECT doc_id,
          substr(text,1,50) || '. ' || substr(text,51,40) || '! ' ||
          substr(text,91,30) || '?' AS rich
        FROM documents WHERE doc_id % 10 = 0),
      p AS (SELECT doc_id, rich,
              regexp_extract_all(rich, '[^.!?]*[.!?]+|[^.!?]+') AS l
            FROM r)
      SELECT doc_id, CAST(generate_subscripts(l, 1) - 1 AS BIGINT) AS pos,
        unnest(l) AS piece,
        (array_to_string(l, '') = rich) AS roundtrip_ok
      FROM p ORDER BY doc_id, pos""")) { (s, dir) =>
    import s.implicits._
    val rich = concat(
      substring($"text", 1, 50), lit(". "),
      substring($"text", 51, 40), lit("! "),
      substring($"text", 91, 30), lit("?"))
    docs(s, dir)
      .filter($"doc_id" % 10 === 0)
      .select($"doc_id", rich.as("rich"),
        GraftFunctions.splitKeepDelim(rich, "[.!?]+").as("l"))
      .select($"doc_id", posexplode($"l").as(Seq("pos", "piece")),
        (array_join($"l", "") === $"rich").as("roundtrip_ok"))
      .select($"doc_id", $"pos".cast("long").as("pos"), $"piece", $"roundtrip_ok")
      .orderBy($"doc_id", $"pos")
  }

  /** F4 is_num_or_punc_only (setu/filters.py:98-188 shape): numeric-only
    * chunks, or chunks whose non-(letter/space) ratio ≥ 0.4. Chunk kinds:
    * plain text / decimal id / Devanagari id / symbol-heavy. */
  val dNumPuncChunks: Spec = Spec(
    "d_num_punc_chunks",
    oracle = Some("""
      WITH c AS (
        SELECT doc_id, 1 AS chunk_kind, trim(substr(text,1,30)) AS chunk
          FROM documents WHERE doc_id % 10 = 0
        UNION ALL SELECT doc_id, 2, CAST(doc_id AS VARCHAR)
          FROM documents WHERE doc_id % 10 = 0
        UNION ALL SELECT doc_id, 3,
          translate(CAST(doc_id AS VARCHAR), '0123456789', '०१२३४५६७८९')
          FROM documents WHERE doc_id % 10 = 0
        UNION ALL SELECT doc_id, 4, '#%$' || substr(text,1,3) || '!!'
          FROM documents WHERE doc_id % 10 = 0)
      SELECT doc_id, chunk_kind, chunk,
        (regexp_matches(chunk, '^[\p{Nd}]+$') OR
         CAST(length(regexp_replace(chunk, '[\p{L} ]', '', 'g')) AS DOUBLE)
           / length(chunk) >= 0.4) AS is_num_or_punc
      FROM c ORDER BY doc_id, chunk_kind""")) { (s, dir) =>
    import s.implicits._
    docs(s, dir)
      .filter($"doc_id" % 10 === 0)
      .select($"doc_id", explode(array(
        struct(lit(1).as("chunk_kind"),
          trim(substring($"text", 1, 30)).as("chunk")),
        struct(lit(2).as("chunk_kind"),
          $"doc_id".cast("string").as("chunk")),
        struct(lit(3).as("chunk_kind"),
          translate($"doc_id".cast("string"),
            "0123456789", "०१२३४५६७८९").as("chunk")),
        struct(lit(4).as("chunk_kind"),
          concat(lit("#%$"), substring($"text", 1, 3), lit("!!")).as("chunk"))))
        .as("c"))
      .select($"doc_id", $"c.chunk_kind", $"c.chunk",
        Text.isNumOrPuncOnly($"c.chunk").as("is_num_or_punc"))
      .orderBy($"doc_id", $"chunk_kind")
  }

  /** F5 is_terminal_valid (setu/filters.py:237-248, terminal marks at
    * setu/constants.py:125-134): valid terminal punctuation incl. danda
    * and double danda, minus the `...` ellipsis exception. */
  val dTerminalChunks: Spec = Spec(
    "d_terminal_chunks",
    oracle = Some("""
      WITH c AS (
        SELECT doc_id, 1 AS chunk_kind, substr(text,1,20) || '.' AS chunk
          FROM documents WHERE doc_id % 10 = 0
        UNION ALL SELECT doc_id, 2, substr(text,1,20) || '...'
          FROM documents WHERE doc_id % 10 = 0
        UNION ALL SELECT doc_id, 3, substr(text,1,20)
          FROM documents WHERE doc_id % 10 = 0
        UNION ALL SELECT doc_id, 4, substr(text,1,20) || '।'
          FROM documents WHERE doc_id % 10 = 0
        UNION ALL SELECT doc_id, 5, substr(text,1,20) || '॥'
          FROM documents WHERE doc_id % 10 = 0)
      SELECT doc_id, chunk_kind, chunk,
        (regexp_matches(chunk, '[.!?।:,;)"''؟۔]$|॥$')
         AND NOT chunk LIKE '%...' AND NOT chunk LIKE '%####') AS terminal_valid
      FROM c ORDER BY doc_id, chunk_kind""")) { (s, dir) =>
    import s.implicits._
    val pre = substring($"text", 1, 20)
    docs(s, dir)
      .filter($"doc_id" % 10 === 0)
      .select($"doc_id", explode(array(
        struct(lit(1).as("chunk_kind"), concat(pre, lit(".")).as("chunk")),
        struct(lit(2).as("chunk_kind"), concat(pre, lit("...")).as("chunk")),
        struct(lit(3).as("chunk_kind"), pre.as("chunk")),
        struct(lit(4).as("chunk_kind"), concat(pre, lit("।")).as("chunk")),
        struct(lit(5).as("chunk_kind"), concat(pre, lit("॥")).as("chunk"))))
        .as("c"))
      .select($"doc_id", $"c.chunk_kind", $"c.chunk",
        Text.isTerminalValid($"c.chunk").as("terminal_valid"))
      .orderBy($"doc_id", $"chunk_kind")
  }

  /** F12 is_numbers (setu/filters.py:773-775, Python str.isdigit):
    * Unicode-digit-aware — ASCII and Devanagari digits both count. */
  val dNumberChunks: Spec = Spec(
    "d_number_chunks",
    oracle = Some("""
      WITH c AS (
        SELECT doc_id, 1 AS chunk_kind, CAST(doc_id AS VARCHAR) AS chunk
          FROM documents WHERE doc_id % 10 = 0
        UNION ALL SELECT doc_id, 2,
          translate(CAST(doc_id AS VARCHAR), '0123456789', '०१२३४५६७८९')
          FROM documents WHERE doc_id % 10 = 0
        UNION ALL SELECT doc_id, 3, substr(text,1,10)
          FROM documents WHERE doc_id % 10 = 0
        UNION ALL SELECT doc_id, 4, CAST(doc_id AS VARCHAR) || 'x'
          FROM documents WHERE doc_id % 10 = 0)
      SELECT doc_id, chunk_kind, chunk,
        regexp_matches(chunk, '^[\p{Nd}]+$') AS is_number
      FROM c ORDER BY doc_id, chunk_kind""")) { (s, dir) =>
    import s.implicits._
    docs(s, dir)
      .filter($"doc_id" % 10 === 0)
      .select($"doc_id", explode(array(
        struct(lit(1).as("chunk_kind"), $"doc_id".cast("string").as("chunk")),
        struct(lit(2).as("chunk_kind"),
          translate($"doc_id".cast("string"),
            "0123456789", "०१२३४५६७८९").as("chunk")),
        struct(lit(3).as("chunk_kind"), substring($"text", 1, 10).as("chunk")),
        struct(lit(4).as("chunk_kind"),
          concat($"doc_id".cast("string"), lit("x")).as("chunk"))))
        .as("c"))
      .select($"doc_id", $"c.chunk_kind", $"c.chunk",
        Text.isNumber($"c.chunk").as("is_number"))
      .orderBy($"doc_id", $"chunk_kind")
  }

  // Deterministic code-injected text shared by the F6-F8 queries: HTML
  // for doc_id%3=0, a JS function for doc_id%5=0, a CSS rule for
  // doc_id%7=0 (so some docs carry several kinds and most carry none).
  private def richCode(s: org.apache.spark.sql.SparkSession) = {
    import s.implicits._
    concat($"text",
      when($"doc_id" % 3 === 0,
        concat(lit(" <div class=\""), $"lang", lit("\">"), $"source",
          lit("</div>"))).otherwise(lit("")),
      when($"doc_id" % 5 === 0,
        concat(lit(" function f_"), ($"doc_id" % 7).cast("string"),
          lit("(a) { return a; }"))).otherwise(lit("")),
      when($"doc_id" % 7 === 0,
        concat(lit(" .cls-"), $"lang", lit(" { color: red }")))
        .otherwise(lit("")))
  }

  private val richCodeSql = """
        text ||
        CASE WHEN doc_id % 3 = 0
          THEN ' <div class="' || lang || '">' || source || '</div>'
          ELSE '' END ||
        CASE WHEN doc_id % 5 = 0
          THEN ' function f_' || CAST(doc_id % 7 AS VARCHAR) || '(a) { return a; }'
          ELSE '' END ||
        CASE WHEN doc_id % 7 = 0
          THEN ' .cls-' || lang || ' { color: red }'
          ELSE '' END"""

  private val htmlPat = "<[^>]+>[\\s\\S]*?</[^>]+>"
  private val jsPat = "function\\s*\\w*\\s*\\([^)]*\\)\\s*\\{[\\s\\S]*?\\}"
  private val cssPat = "[.#]?[\\w-]+\\s*\\{[^}]*\\}"

  /** F6 code detection (setu/filters.py:190-235): per-pattern match
    * counts + the fused has_code predicate. */
  val dCodeDetect: Spec = Spec(
    "d_code_detect",
    oracle = Some(s"""
      WITH r AS (SELECT doc_id, $richCodeSql AS rich
                 FROM documents WHERE doc_id % 4 = 0)
      SELECT doc_id,
        CAST(len(regexp_extract_all(rich, '<[^>]+>[\\s\\S]*?</[^>]+>')) AS BIGINT) AS n_html,
        CAST(len(regexp_extract_all(rich, 'function\\s*\\w*\\s*\\([^)]*\\)\\s*\\{[\\s\\S]*?\\}')) AS BIGINT) AS n_js,
        CAST(len(regexp_extract_all(rich, '[.#]?[\\w-]+\\s*\\{[^}]*\\}')) AS BIGINT) AS n_css,
        (regexp_matches(rich, '<[^>]+>[\\s\\S]*?</[^>]+>')
         OR regexp_matches(rich, 'function\\s*\\w*\\s*\\([^)]*\\)\\s*\\{[\\s\\S]*?\\}')
         OR regexp_matches(rich, '[.#]?[\\w-]+\\s*\\{[^}]*\\}')) AS has_code
      FROM r ORDER BY doc_id""")) { (s, dir) =>
    import s.implicits._
    docs(s, dir)
      .filter($"doc_id" % 4 === 0)
      .select($"doc_id", richCode(s).as("rich"))
      .select($"doc_id",
        size(regexp_extract_all($"rich", lit(htmlPat), lit(0))).cast("long").as("n_html"),
        size(regexp_extract_all($"rich", lit(jsPat), lit(0))).cast("long").as("n_js"),
        size(regexp_extract_all($"rich", lit(cssPat), lit(0))).cast("long").as("n_css"),
        Text.hasCode($"rich").as("has_code"))
      .orderBy($"doc_id")
  }

  /** F7/F8 code removal (setu/filters.py:345-368): strip HTML→JS→CSS in
    * order; verified by md5 of the cleaned text + removed-char count. */
  val dCodeRemove: Spec = Spec(
    "d_code_remove",
    oracle = Some(s"""
      WITH r AS (SELECT doc_id, $richCodeSql AS rich
                 FROM documents WHERE doc_id % 4 = 0),
      c AS (SELECT doc_id, rich,
              regexp_replace(regexp_replace(regexp_replace(rich,
                '<[^>]+>[\\s\\S]*?</[^>]+>', '', 'g'),
                'function\\s*\\w*\\s*\\([^)]*\\)\\s*\\{[\\s\\S]*?\\}', '', 'g'),
                '[.#]?[\\w-]+\\s*\\{[^}]*\\}', '', 'g') AS cleaned
            FROM r)
      SELECT doc_id, md5(cleaned) AS cleaned_md5,
        CAST(length(cleaned) AS BIGINT) AS cleaned_chars,
        CAST(length(rich) - length(cleaned) AS BIGINT) AS removed_chars
      FROM c ORDER BY doc_id""")) { (s, dir) =>
    import s.implicits._
    docs(s, dir)
      .filter($"doc_id" % 4 === 0)
      .select($"doc_id", richCode(s).as("rich"))
      .select($"doc_id", $"rich", Text.removeCode($"rich").as("cleaned"))
      .select($"doc_id",
        md5($"cleaned").as("cleaned_md5"),
        length($"cleaned").cast("long").as("cleaned_chars"),
        (length($"rich") - length($"cleaned")).cast("long").as("removed_chars"))
      .orderBy($"doc_id")
  }

  /** F11 full (setu/filters.py:388-446): per-language Indic
    * normalization → NFKC, exercised on text carrying NBSP, ZWJ, curly
    * quotes, ellipsis, em dash, doubled apostrophes, a Devanagari word
    * with `|` and `:`, plus Bengali and Tamil `:` cases. The oracle
    * mirrors the chain per language on the NFKC-stable subset (every
    * injected codepoint is either handled by the chain or NFKC-fixed);
    * the NFKC-only rules (nukta decomposition etc.) are ScalaTest-
    * pinned in IndicNormSpec. */
  val dNormalizeIndic: Spec = Spec(
    "d_normalize_indic",
    oracle = Some("""
      WITH r AS (
        SELECT doc_id,
          CASE doc_id % 4 WHEN 0 THEN 'hindi' WHEN 1 THEN 'bengali'
                          WHEN 2 THEN 'tamil' ELSE 'english' END AS lang_name,
          substr(text,1,15) || chr(160) || '“q”' || chr(8205) || '…' ||
            ' — ' || '''''' || ' नमस्ते| राम: রাম: தமிழ்: end' AS rich
        FROM documents WHERE doc_id % 5 = 0),
      b AS (
        SELECT doc_id, lang_name, rich,
          replace(replace(replace(replace(replace(replace(replace(
            rich, chr(8205), ''), chr(160), ' '),
            '“', '"'), '”', '"'), '—', ' - '), '''''', '"'),
            '…', '...') AS based
        FROM r),
      t AS (
        SELECT doc_id, lang_name,
          CASE lang_name
            WHEN 'hindi' THEN
              regexp_replace(replace(based, '|', '।'),
                '([\x{0900}-\x{097f}]):', '\1ः', 'g')
            WHEN 'bengali' THEN
              regexp_replace(replace(based, '|', '।'),
                '([\x{0980}-\x{09ff}]):', '\1ঃ', 'g')
            WHEN 'tamil' THEN
              regexp_replace(based, '([\x{0b80}-\x{0bff}]):', '\1ஃ', 'g')
            ELSE replace(replace(rich, chr(160), ' '), '…', '...')
          END AS normalized
        FROM b)
      SELECT doc_id, lang_name, normalized, md5(normalized) AS norm_md5
      FROM t ORDER BY doc_id""")) { (s, dir) =>
    import s.implicits._
    val langName = element_at(
      array(lit("hindi"), lit("bengali"), lit("tamil"), lit("english")),
      ($"doc_id" % 4 + 1).cast("int"))
    val rich = concat(substring($"text", 1, 15),
      lit("\u00a0\u201cq\u201d\u200d\u2026 \u2014 ''"),
      lit(" नमस्ते| राम: রাম: தமிழ்: end"))
    docs(s, dir)
      .filter($"doc_id" % 5 === 0)
      .select($"doc_id", langName.as("lang_name"), rich.as("rich"))
      .withColumn("normalized",
        GraftFunctions.indicNormalize($"rich", $"lang_name"))
      .select($"doc_id", $"lang_name", $"normalized",
        md5($"normalized").as("norm_md5"))
      .orderBy($"doc_id")
  }

  /** F21 terminal_punc_filter (setu/filters.py:370-386): drop invalid
    * newline-chunks, keep the cleaned text + flagged count. */
  val dTerminalPuncFilter: Spec = Spec(
    "d_terminal_punc_filter",
    oracle = Some("""
      WITH r AS (
        SELECT doc_id,
          substr(text,1,20) || '.' || chr(10) || substr(text,21,15) || chr(10) ||
          substr(text,41,10) || '!' || chr(10) || substr(text,1,8) || '...' AS rich
        FROM documents WHERE doc_id % 10 = 0),
      f AS (
        SELECT doc_id,
          list_filter(string_split(rich, chr(10)), x ->
            regexp_matches(x, '[.!?।:,;)"''؟۔]$|॥$')
            AND NOT x LIKE '%...' AND NOT x LIKE '%####') AS kept,
          string_split(rich, chr(10)) AS all_chunks
        FROM r)
      SELECT doc_id, array_to_string(kept, chr(10)) AS cleaned,
        CAST(len(all_chunks) - len(kept) AS BIGINT) AS n_flagged
      FROM f ORDER BY doc_id""")) { (s, dir) =>
    import s.implicits._
    val rich = concat(
      substring($"text", 1, 20), lit(".\n"),
      substring($"text", 21, 15), lit("\n"),
      substring($"text", 41, 10), lit("!\n"),
      substring($"text", 1, 8), lit("..."))
    docs(s, dir)
      .filter($"doc_id" % 10 === 0)
      .select($"doc_id", rich.as("rich"))
      .select($"doc_id",
        Text.terminalPuncClean($"rich").as("cleaned"),
        Text.terminalPuncFlagged($"rich").cast("long").as("n_flagged"))
      .orderBy($"doc_id")
  }

  /** F20 remove_non_terminal_punc_span (setu/filters.py:250-281):
    * invalid chunks truncate at their last terminal punctuation and
    * survive only above the word threshold; exception suffixes remove
    * outright. Null results surface as removed=true + empty string so
    * the hash compare never sees engine-specific null encodings. */
  val dNonTermSpanRemove: Spec = Spec(
    "d_nonterm_span_remove",
    oracle = Some("""
      WITH c AS (
        SELECT doc_id, 1 AS chunk_kind, substr(text,1,30) || '.' AS chunk
          FROM documents WHERE doc_id % 10 = 0
        UNION ALL SELECT doc_id, 2, substr(text,1,30) || ' tail words here'
          FROM documents WHERE doc_id % 10 = 0
        UNION ALL SELECT doc_id, 3, substr(text,1,30) || '. extra trailing junk'
          FROM documents WHERE doc_id % 10 = 0
        UNION ALL SELECT doc_id, 4, substr(text,1,5) || '...'
          FROM documents WHERE doc_id % 10 = 0
        UNION ALL SELECT doc_id, 5, substr(text,1,20) || ': xx'
          FROM documents WHERE doc_id % 10 = 0
        UNION ALL SELECT doc_id, 6, substr(text,1,2) || '. xx'
          FROM documents WHERE doc_id % 10 = 0),
      e AS (
        SELECT doc_id, chunk_kind, chunk,
          regexp_replace(chunk, '[^.!?।॥:,;)"''؟۔]*$', '') AS cut
        FROM c),
      o AS (
        SELECT doc_id, chunk_kind,
          CASE
            WHEN regexp_matches(chunk, '[.!?।॥:,;)"''؟۔]$')
                 AND NOT chunk LIKE '%...' AND NOT chunk LIKE '%####'
              THEN chunk
            WHEN chunk LIKE '%...' OR chunk LIKE '%####' THEN NULL
            WHEN len(string_split(cut, ' ')) > 2 THEN cut
            ELSE NULL
          END AS result
        FROM e)
      SELECT doc_id, chunk_kind, COALESCE(result, '') AS result,
        (result IS NULL) AS removed
      FROM o ORDER BY doc_id, chunk_kind""")) { (s, dir) =>
    import s.implicits._
    docs(s, dir)
      .filter($"doc_id" % 10 === 0)
      .select($"doc_id", explode(array(
        struct(lit(1).as("chunk_kind"),
          concat(substring($"text", 1, 30), lit(".")).as("chunk")),
        struct(lit(2).as("chunk_kind"),
          concat(substring($"text", 1, 30), lit(" tail words here")).as("chunk")),
        struct(lit(3).as("chunk_kind"),
          concat(substring($"text", 1, 30), lit(". extra trailing junk")).as("chunk")),
        struct(lit(4).as("chunk_kind"),
          concat(substring($"text", 1, 5), lit("...")).as("chunk")),
        struct(lit(5).as("chunk_kind"),
          concat(substring($"text", 1, 20), lit(": xx")).as("chunk")),
        struct(lit(6).as("chunk_kind"),
          concat(substring($"text", 1, 2), lit(". xx")).as("chunk"))))
        .as("c"))
      .withColumn("result",
        GraftFunctions.removeNonTerminalPuncSpan($"c.chunk", 2.0))
      .select($"doc_id", $"c.chunk_kind",
        coalesce($"result", lit("")).as("result"),
        $"result".isNull.as("removed"))
      .orderBy($"doc_id", $"chunk_kind")
  }

  /** F22 split_at_terminal_punc (setu/filters.py:295-307): language-
    * routed sentence split — Hindi rows segment on the danda family,
    * English rows on `.?!`; pieces trimmed, empties dropped. */
  val dSentenceSplitLang: Spec = Spec(
    "d_sentence_split_lang",
    oracle = Some("""
      WITH r AS (
        SELECT doc_id,
          CASE WHEN doc_id % 2 = 0 THEN 'hindi' ELSE 'english' END AS lang_name,
          CASE WHEN doc_id % 2 = 0 THEN
            substr(text,1,20) || '। ' || substr(text,21,15) || '? ' ||
              substr(text,41,10) || '॥'
          ELSE
            substr(text,1,20) || '. ' || substr(text,21,15) || '! ' ||
              substr(text,41,10)
          END AS rich
        FROM documents WHERE doc_id % 10 = 0),
      p AS (
        SELECT doc_id, lang_name,
          list_filter(list_transform(
            CASE WHEN lang_name = 'hindi'
              THEN regexp_extract_all(rich, '[^.?!।॥]*[.?!।॥]|[^.?!।॥]+')
              ELSE regexp_extract_all(rich, '[^.?!]*[.?!]|[^.?!]+')
            END, x -> trim(x)), x -> x != '') AS sents
        FROM r)
      SELECT doc_id, lang_name,
        CAST(generate_subscripts(sents, 1) - 1 AS BIGINT) AS pos,
        unnest(sents) AS sentence
      FROM p ORDER BY doc_id, pos""")) { (s, dir) =>
    import s.implicits._
    val richHi = concat(
      substring($"text", 1, 20), lit("। "),
      substring($"text", 21, 15), lit("? "),
      substring($"text", 41, 10), lit("॥"))
    val richEn = concat(
      substring($"text", 1, 20), lit(". "),
      substring($"text", 21, 15), lit("! "),
      substring($"text", 41, 10))
    docs(s, dir)
      .filter($"doc_id" % 10 === 0)
      .select($"doc_id",
        when($"doc_id" % 2 === 0, lit("hindi")).otherwise(lit("english"))
          .as("lang_name"),
        when($"doc_id" % 2 === 0, Text.sentenceSplit(richHi, "hindi"))
          .otherwise(Text.sentenceSplit(richEn, "english")).as("sents"))
      .select($"doc_id", $"lang_name",
        posexplode($"sents").as(Seq("pos", "sentence")))
      .select($"doc_id", $"lang_name", $"pos".cast("long").as("pos"), $"sentence")
      .orderBy($"doc_id", $"pos")
  }

  /** PII masking (training-pipeline op): deterministic emails / 4-4-4
    * ids / intl phone numbers injected from table columns, then
    * [[Text.maskPii]] masks them and per-kind counts are taken from the
    * pre-mask text. Same regexes verbatim on the DuckDB side. */
  val dPiiMask: Spec = Spec(
    "d_pii_mask",
    oracle = Some(s"""
      WITH r AS (
        SELECT doc_id,
          substr(text,1,40) || ' mail user' || doc_id || '@example.co.in id 1234 5678 ' ||
          lpad(CAST(doc_id%10000 AS VARCHAR),4,'0') || ' call +91 98765 ' ||
          lpad(CAST(doc_id%100000 AS VARCHAR),5,'0') ||
          CASE WHEN doc_id%20 = 0 THEN ' cc admin@corp.example.org' ELSE '' END ||
          ' ' || substr(text,41,30) AS rich
        FROM documents WHERE doc_id % 10 = 0)
      SELECT doc_id,
        regexp_replace(regexp_replace(regexp_replace(rich,
          '${Text.EmailRe}', '<EMAIL>', 'g'),
          '${Text.IdRe}', '<ID>', 'g'),
          '${Text.PhoneRe}', '<PHONE>', 'g') AS masked,
        CAST(len(regexp_extract_all(rich, '${Text.EmailRe}')) AS BIGINT) AS n_emails,
        CAST(len(regexp_extract_all(rich, '${Text.IdRe}')) AS BIGINT) AS n_ids,
        CAST(len(regexp_extract_all(rich, '${Text.PhoneRe}')) AS BIGINT) AS n_phones
      FROM r ORDER BY doc_id""")) { (s, dir) =>
    import s.implicits._
    val rich = concat(
      substring($"text", 1, 40), lit(" mail user"), $"doc_id".cast("string"),
      lit("@example.co.in id 1234 5678 "),
      lpad(($"doc_id" % 10000).cast("string"), 4, "0"),
      lit(" call +91 98765 "),
      lpad(($"doc_id" % 100000).cast("string"), 5, "0"),
      when($"doc_id" % 20 === 0, lit(" cc admin@corp.example.org")).otherwise(lit("")),
      lit(" "), substring($"text", 41, 30))
    docs(s, dir)
      .filter($"doc_id" % 10 === 0)
      .withColumn("rich", rich)
      .select($"doc_id",
        Text.maskPii($"rich").as("masked"),
        regexp_count($"rich", lit(Text.EmailRe)).cast("long").as("n_emails"),
        regexp_count($"rich", lit(Text.IdRe)).cast("long").as("n_ids"),
        regexp_count($"rich", lit(Text.PhoneRe)).cast("long").as("n_phones"))
      .orderBy($"doc_id")
  }

  /** The FULL production extraction chain: DOM block tree → structural
    * chrome pruning → jusText density classification → context pass →
    * reassembly. [[dHtmlExtractDense]] classifies by CONTENT on flat
    * regex blocks; [[dDomExtract]] prunes by STRUCTURE alone; this
    * composes both the way a real crawl pipeline runs them — chrome
    * ancestry is a hard 'bad' (a stopword-rich paragraph inside
    * <footer> is still boilerplate), link density uses the parser's
    * per-anchor tallies (not a regex re-scan), and the density rules /
    * context pass are the shared jusText thresholds. The oracle
    * replays the classifier over the LITERAL expected block rows (the
    * d_dom_blocks discipline), so the green hash proves the parse, the
    * structural override, the density classes, and the context
    * propagation together. */
  val dDomJustext: Spec = {
    val stops = graft.sources.Lexicons.stopwords("english")
    val stopsSql = stops.map(w => "'" + w.replace("'", "''") + "'").mkString(", ")
    val glue = "and it was the most of all that there had been for this " +
      "to be done so that they were with what it is about when more of " +
      "it can be had by them and for all of us as it must have been"
    Spec(
      "d_dom_justext",
      oracle = Some(s"""
      WITH r AS (
        SELECT doc_id,
          trim(regexp_replace('intro ' || substr(text, 1, 150) || ' $glue',
            '\\s+', ' ', 'g')) AS p1,
          trim(regexp_replace('more ' || substr(text, 151, 150) || ' $glue',
            '\\s+', ' ', 'g')) AS p2,
          trim(regexp_replace(substr(text, 1, 60) || ' for the most part',
            '\\s+', ' ', 'g')) AS p3
        FROM documents WHERE doc_id % 13 = 4),
      b AS (
        SELECT doc_id, unnest([
          {pos: 1, btext: 'home page all products about the team contact us now',
           link_len: 49, chrome: true},
          {pos: 2, btext: 'doc ' || doc_id || ' overview',
           link_len: 0, chrome: false},
          {pos: 3, btext: p1, link_len: 0, chrome: false},
          {pos: 4, btext: 'see also', link_len: 0, chrome: false},
          {pos: 5, btext: p2, link_len: 0, chrome: false},
          {pos: 6, btext: p3, link_len: 0, chrome: false},
          {pos: 7, btext: 'privacy policy | terms of use all rights reserved 2026',
           link_len: 26, chrome: true}
        ]) AS e
        FROM r),
      m AS (
        SELECT doc_id, e.pos AS pos, e.btext AS btext, e.chrome AS chrome,
          CAST(len(e.btext) AS BIGINT) AS blen,
          CAST(e.link_len AS BIGINT) AS link_len,
          CAST(len(string_split(lower(e.btext), ' ')) AS BIGINT) AS n_tok,
          CAST(len(list_filter(string_split(lower(e.btext), ' '),
            t -> list_contains([$stopsSql], t))) AS BIGINT) AS n_stop
        FROM b),
      cf AS (
        SELECT doc_id, pos, btext,
          CASE
            WHEN chrome THEN 'bad'
            WHEN CAST(link_len AS DOUBLE) / blen > 0.2 THEN 'bad'
            WHEN blen < 70 THEN
              CASE WHEN link_len > 0 THEN 'bad' ELSE 'short' END
            WHEN CAST(n_stop AS DOUBLE) / n_tok >= 0.32 THEN
              CASE WHEN blen > 200 THEN 'good' ELSE 'neargood' END
            WHEN CAST(n_stop AS DOUBLE) / n_tok >= 0.30 THEN 'neargood'
            ELSE 'bad' END AS cf
        FROM m),
      ctx AS (
        SELECT doc_id, pos, btext, cf,
          COALESCE(last_value(CASE WHEN cf IN ('good','bad')
              THEN cf = 'good' END IGNORE NULLS)
            OVER (PARTITION BY doc_id ORDER BY pos
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
            false) AS prev_good,
          COALESCE(first_value(CASE WHEN cf IN ('good','bad')
              THEN cf = 'good' END IGNORE NULLS)
            OVER (PARTITION BY doc_id ORDER BY pos
              ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING),
            false) AS next_good
        FROM cf),
      k AS (
        SELECT doc_id, pos, btext,
          CASE cf WHEN 'good' THEN true WHEN 'bad' THEN false
            WHEN 'neargood' THEN prev_good OR next_good
            ELSE prev_good AND next_good END AS keep
        FROM ctx)
      SELECT doc_id,
        COALESCE(string_agg(CASE WHEN keep THEN btext END, chr(10)
          ORDER BY pos), '') AS extracted,
        CAST(COUNT(*) AS BIGINT) AS n_blocks,
        CAST(COUNT(CASE WHEN keep THEN 1 END) AS BIGINT) AS n_kept
      FROM k GROUP BY doc_id ORDER BY doc_id""")) { (s, dir) =>
      import s.implicits._
      val html = concat(
        lit("<html><body><nav><a href=\"/\">home page</a> <a href=\"/p\">all products</a> <a href=\"/a\">about the team</a> <a href=\"/c\">contact us now</a></nav>"),
        lit("<article><h1>doc "), $"doc_id".cast("string"), lit(" overview</h1>"),
        lit("<p>intro "), substring($"text", 1, 150), lit(s" $glue</p>"),
        lit("<p>see also</p>"),
        lit("<p>more "), substring($"text", 151, 150), lit(s" $glue</p>"),
        lit("<div><p>"), substring($"text", 1, 60), lit(" for the most part</p></div>"),
        lit("</article><footer><a href=\"/pr\">privacy policy</a> | <a href=\"/t\">terms of use</a> all rights reserved 2026</footer></body></html>"))
      val stopLit = typedLit(stops.map(_.toLowerCase))
      val blocks = docs(s, dir)
        .filter($"doc_id" % 13 === 4)
        .select($"doc_id", explode(GraftFunctions.domBlocks(html)).as("b"))
        .select($"doc_id", $"b.pos".as("pos"), $"b.text".as("btext"),
          $"b.link_chars".as("link_len"), $"b.chrome".as("chrome"))
      val toks = split(lower($"btext"), " ", -1)
      val scored = blocks
        .withColumn("blen", length($"btext").cast("long"))
        .withColumn("n_tok", size(toks).cast("long"))
        .withColumn("n_stop",
          size(filter(toks, t => array_contains(stopLit, t))).cast("long"))
        .withColumn("cf",
          when($"chrome", "bad")
            .when($"link_len".cast("double") / $"blen" > 0.2, "bad")
            .when($"blen" < 70,
              when($"link_len" > 0, "bad").otherwise("short"))
            .when($"n_stop".cast("double") / $"n_tok" >= 0.32,
              when($"blen" > 200, "good").otherwise("neargood"))
            .when($"n_stop".cast("double") / $"n_tok" >= 0.30, "neargood")
            .otherwise("bad"))
      import org.apache.spark.sql.expressions.Window
      val wPrev = Window.partitionBy($"doc_id").orderBy($"pos")
        .rowsBetween(Window.unboundedPreceding, -1)
      val wNext = Window.partitionBy($"doc_id").orderBy($"pos")
        .rowsBetween(1, Window.unboundedFollowing)
      val decided = when($"cf" === "good" || $"cf" === "bad", $"cf" === "good")
      val ctx = scored
        .withColumn("prev_good",
          coalesce(last(decided, ignoreNulls = true).over(wPrev), lit(false)))
        .withColumn("next_good",
          coalesce(first(decided, ignoreNulls = true).over(wNext), lit(false)))
        .withColumn("keep",
          when($"cf" === "good", true).when($"cf" === "bad", false)
            .when($"cf" === "neargood", $"prev_good" || $"next_good")
            .otherwise($"prev_good" && $"next_good"))
      ctx.groupBy($"doc_id")
        .agg(
          coalesce(
            array_join(
              transform(
                array_sort(collect_list(
                  when($"keep", struct($"pos", $"btext")))),
                x => x.getField("btext")),
              "\n"),
            lit("")).as("extracted"),
          count(lit(1)).as("n_blocks"),
          sum(when($"keep", 1L).otherwise(0L)).as("n_kept"))
        .orderBy($"doc_id")
    }
  }

  /** Luhn checksum validation of card-number candidates — the
    * verification step that turns the PII regex family
    * ([[dPiiMask]]'s 4-4-4 ids) into a low-false-positive detector: a
    * random 16-digit string passes the REGEX 100% of the time but the
    * CHECKSUM only 10%. Construction: a 15-digit base derives from
    * doc_id, both engines compute its Luhn sum with an explicit
    * digit fold (position-odd digits doubled with the >9 fold — exact
    * integers), and the appended check digit is correct for
    * doc_id % 3 ≠ 1 docs, off-by-one otherwise. VALIDATION is then
    * independent per engine: Spark uses its NATIVE `luhn_check`
    * expression, the oracle re-folds the full 16 digits — so the
    * green hash cross-proves Spark's builtin against the from-scratch
    * SQL implementation on both valid and invalid cards. */
  val dLuhnCards: Spec = Spec(
    "d_luhn_cards",
    oracle = Some("""
      WITH b AS (
        SELECT doc_id,
          '4' || lpad(CAST(doc_id * 37 % 99999999999999 AS VARCHAR), 14, '0')
            AS b15
        FROM documents WHERE doc_id % 5 = 2),
      s AS (
        SELECT doc_id, b15,
          CAST(list_sum(list_transform(range(1, 16), p ->
            CASE WHEN p % 2 = 1
              THEN CASE WHEN 2 * CAST(substr(b15, CAST(p AS INT), 1) AS INT) > 9
                   THEN 2 * CAST(substr(b15, CAST(p AS INT), 1) AS INT) - 9
                   ELSE 2 * CAST(substr(b15, CAST(p AS INT), 1) AS INT) END
              ELSE CAST(substr(b15, CAST(p AS INT), 1) AS INT) END))
            AS BIGINT) AS sb
        FROM b),
      c AS (
        SELECT doc_id, b15, sb, (10 - sb % 10) % 10 AS dok,
          b15 || CAST(CASE WHEN doc_id % 3 <> 1 THEN (10 - sb % 10) % 10
            ELSE ((10 - sb % 10) % 10 + 1) % 10 END AS VARCHAR) AS cc
        FROM s)
      SELECT doc_id, cc,
        (sb + CAST(substr(cc, 16, 1) AS INT)) % 10 = 0 AS luhn_ok
      FROM c ORDER BY doc_id""")) { (s, dir) =>
    import s.implicits._
    val b15 = concat(lit("4"),
      lpad(($"doc_id" * 37 % 99999999999999L).cast("string"), 14, "0"))
    val sb = expr("aggregate(sequence(1, 15), 0, (acc, p) -> acc + " +
      "CASE WHEN p % 2 = 1 " +
      "THEN CASE WHEN 2 * CAST(substr(b15, p, 1) AS INT) > 9 " +
      "THEN 2 * CAST(substr(b15, p, 1) AS INT) - 9 " +
      "ELSE 2 * CAST(substr(b15, p, 1) AS INT) END " +
      "ELSE CAST(substr(b15, p, 1) AS INT) END)").cast("long")
    docs(s, dir)
      .filter($"doc_id" % 5 === 2)
      .select($"doc_id", b15.as("b15"))
      .withColumn("sb", sb)
      .withColumn("dok", (lit(10) - $"sb" % 10) % 10)
      .select($"doc_id",
        concat($"b15",
          when($"doc_id" % 3 =!= 1, $"dok")
            .otherwise(($"dok" + 1) % 10).cast("string")).as("cc"))
      // validation is the engine's NATIVE Luhn — independent of the
      // generation fold above, so the oracle compare cross-proves it
      .withColumn("luhn_ok", expr("luhn_check(cc)"))
      .orderBy($"doc_id")
  }

  /** Corpus-level boilerplate removal (C4/RefinedWeb rule): lines
    * occurring in ≥3 distinct docs are template chrome, dropped from
    * every doc. Injection plants a shared newsletter line (docs %3) and
    * a shared footer (docs %4) among per-doc-unique lines; the leading
    * "doc <id>" title line guarantees no document ever empties. */
  val dBoilerplateLines: Spec = Spec(
    "d_boilerplate_lines",
    oracle = Some("""
      WITH r AS (
        SELECT doc_id,
          'doc ' || doc_id || chr(10) ||
          substr(text,1,40) || chr(10) ||
          CASE WHEN doc_id%3 = 0 THEN 'subscribe to our newsletter for updates'
               ELSE 'unique ' || doc_id || ' middle line' END ||
          CASE WHEN doc_id%4 = 0 THEN chr(10) || 'all rights reserved' ELSE '' END ||
          chr(10) || substr(text,41,35) AS rich
        FROM documents WHERE doc_id % 5 = 0),
      lines AS (
        SELECT doc_id, CAST(generate_subscripts(l,1) AS BIGINT) AS pos, unnest(l) AS line
        FROM (SELECT doc_id, string_split(rich, chr(10)) AS l FROM r)),
      boiler AS (
        SELECT line FROM (
          SELECT line, COUNT(DISTINCT doc_id) AS nd FROM lines GROUP BY line)
        WHERE nd >= 3)
      SELECT doc_id,
        string_agg(CASE WHEN line NOT IN (SELECT line FROM boiler)
                        THEN line END, chr(10) ORDER BY pos) AS cleaned,
        CAST(COUNT(CASE WHEN line IN (SELECT line FROM boiler)
                        THEN 1 END) AS BIGINT) AS n_removed
      FROM lines GROUP BY doc_id ORDER BY doc_id""")) { (s, dir) =>
    import s.implicits._
    val rich = concat(
      lit("doc "), $"doc_id".cast("string"), lit("\n"),
      substring($"text", 1, 40), lit("\n"),
      when($"doc_id" % 3 === 0, lit("subscribe to our newsletter for updates"))
        .otherwise(concat(lit("unique "), $"doc_id".cast("string"), lit(" middle line"))),
      when($"doc_id" % 4 === 0, lit("\nall rights reserved")).otherwise(lit("")),
      lit("\n"), substring($"text", 41, 35))
    graft.ops.Boilerplate.removeRepeatedLines(
        docs(s, dir).filter($"doc_id" % 5 === 0).withColumn("rich", rich),
        "doc_id", "rich", minDocs = 3)
      .select($"doc_id", $"cleaned", $"n_removed")
      .orderBy($"doc_id")
  }

  /** HTML → text extraction ([[Text.extractHtmlText]], the reference's
    * stage-1 trafilatura role re-expressed as a codegen'd regexp
    * chain): script/style/comment removal, block tags → newlines, tag
    * strip, entity decode, per-line cleanup. The synthetic HTML wraps
    * table-derived text in head/style/script chrome plus entities and
    * a comment, so every removal path fires. */
  val dHtmlExtract: Spec = Spec(
    "d_html_extract",
    oracle = Some("""
      WITH r AS (
        SELECT doc_id,
          '<html><head><style>p { color: red }</style>' ||
          '<script>var x = 1; if (x < 2) { x = 2; }</script></head><body>' ||
          '<h1 class="t">' || substr(text,1,20) || '</h1>' ||
          '<p>' || substr(text,21,30) || ' &amp; more &lt;tags&gt;</p>' ||
          '<!-- hidden --><div>' || substr(text,51,25) || '</div></body></html>'
          AS html
        FROM documents WHERE doc_id % 5 = 0),
      e AS (
        SELECT doc_id,
          regexp_replace(regexp_replace(regexp_replace(regexp_replace(
            regexp_replace(html,
              '(?is)<script[^>]*>.*?</script>', '', 'g'),
              '(?is)<style[^>]*>.*?</style>', '', 'g'),
              '(?s)<!--.*?-->', '', 'g'),
              '(?i)</?(p|br|div|h[1-6]|li|ul|ol|tr|table|section|article)[^>]*>',
                chr(10), 'g'),
              '<[^>]+>', ' ', 'g') AS untagged
        FROM r),
      d AS (
        SELECT doc_id,
          replace(replace(replace(replace(replace(replace(untagged,
            '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&#39;', ''''),
            '&nbsp;', ' '), '&amp;', '&') AS decoded
        FROM e),
      c AS (
        SELECT doc_id,
          array_to_string(list_filter(list_transform(
            string_split(decoded, chr(10)),
            x -> trim(regexp_replace(x, '[ \t]+', ' ', 'g'))),
            x -> x != ''), chr(10)) AS extracted
        FROM d)
      SELECT doc_id, extracted, md5(extracted) AS extract_md5,
        CAST(len(string_split(extracted, chr(10))) AS BIGINT) AS n_lines
      FROM c ORDER BY doc_id""")) { (s, dir) =>
    import s.implicits._
    val html = concat(
      lit("<html><head><style>p { color: red }</style>"),
      lit("<script>var x = 1; if (x < 2) { x = 2; }</script></head><body>"),
      lit("<h1 class=\"t\">"), substring($"text", 1, 20), lit("</h1>"),
      lit("<p>"), substring($"text", 21, 30), lit(" &amp; more &lt;tags&gt;</p>"),
      lit("<!-- hidden --><div>"), substring($"text", 51, 25),
      lit("</div></body></html>"))
    docs(s, dir)
      .filter($"doc_id" % 5 === 0)
      .select($"doc_id", Text.extractHtmlText(html).as("extracted"))
      .select($"doc_id", $"extracted", md5($"extracted").as("extract_md5"),
        size(split($"extracted", "\n", -1)).cast("long").as("n_lines"))
      .orderBy($"doc_id")
  }

  /** jusText-style density-based main-content extraction
    * ([[graft.ops.Boilerplate.densityExtract]]; the reference's stage-1
    * trafilatura role, setu/text_extraction.py:556, via the PUBLIC
    * boilerplate algorithm trafilatura builds on): per-block link
    * density + stopword density classification with a context pass
    * over a per-doc window. The synthetic page exercises every path:
    * a link-heavy nav and footer (bad), a short headline stranded
    * between bad and good (dropped), two long stopword-rich body
    * paragraphs (good), a short "see also" between goods (kept by
    * context), and a length-threshold-straddling trailer whose class
    * varies with each doc's text length (both branches deterministic
    * and mirrored in the oracle). */
  val dHtmlExtractDense: Spec = {
    val stops = graft.sources.Lexicons.stopwords("english")
    val stopsSql = stops.map(w => "'" + w.replace("'", "''") + "'").mkString(", ")
    val glue = "and it was the most of all that there had been for this " +
      "to be done so that they were with what it is about when more of " +
      "it can be had by them and for all of us as it must have been"
    val cleanSql = (x: String) =>
      s"""trim(regexp_replace(
           replace(replace(replace(replace(replace(replace(
             regexp_replace($x, '<[^>]+>', ' ', 'g'),
             '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&#39;', ''''),
             '&nbsp;', ' '), '&amp;', '&'),
           '\\s+', ' ', 'g'))"""
    Spec(
      "d_html_extract_dense",
      oracle = Some(s"""
      WITH r AS (
        SELECT doc_id,
          '<div id="nav"><a href="/">home page</a> <a href="/p">all products</a> <a href="/a">about the team</a> <a href="/c">contact us now</a></div>' ||
          '<h1>doc ' || doc_id || ' overview</h1>' ||
          '<p>' || substr(text,1,150) || ' $glue</p>' ||
          '<p>see also</p>' ||
          '<p>' || substr(text,151,150) || ' $glue</p>' ||
          '<p>' || substr(text,1,60) || ' for the most part</p>' ||
          '<div id="footer"><a href="/pr">privacy policy</a> | <a href="/t">terms of use</a> all rights reserved 2026</div>'
          AS html
        FROM documents WHERE doc_id % 7 = 0),
      blk AS (
        SELECT doc_id, CAST(generate_subscripts(l,1) AS BIGINT) AS pos,
          unnest(l) AS raw
        FROM (SELECT doc_id, string_split_regex(
            regexp_replace(regexp_replace(regexp_replace(html,
              '(?is)<script[^>]*>.*?</script>', '', 'g'),
              '(?is)<style[^>]*>.*?</style>', '', 'g'),
              '(?s)<!--.*?-->', '', 'g'),
            '(?i)</?(p|br|div|h[1-6]|li|ul|ol|tr|table|section|article)[^>]*>') AS l
          FROM r)),
      b2 AS (
        SELECT doc_id, pos, raw, ${cleanSql("raw")} AS btext FROM blk),
      b3 AS (SELECT * FROM b2 WHERE len(btext) > 0),
      m AS (
        SELECT doc_id, pos, btext,
          CAST(len(btext) AS BIGINT) AS blen,
          CAST(COALESCE(list_sum(list_transform(
            regexp_extract_all(raw, '(?is)<a[^>]*>(.*?)</a>', 1),
            x -> len(${cleanSql("x")}))), 0) AS BIGINT) AS link_len,
          CAST(len(string_split(lower(btext), ' ')) AS BIGINT) AS n_tok,
          CAST(len(list_filter(string_split(lower(btext), ' '),
            t -> list_contains([$stopsSql], t))) AS BIGINT) AS n_stop
        FROM b3),
      cf AS (
        SELECT doc_id, pos, btext,
          CASE
            WHEN CAST(link_len AS DOUBLE) / blen > 0.2 THEN 'bad'
            WHEN blen < 70 THEN
              CASE WHEN link_len > 0 THEN 'bad' ELSE 'short' END
            WHEN CAST(n_stop AS DOUBLE) / n_tok >= 0.32 THEN
              CASE WHEN blen > 200 THEN 'good' ELSE 'neargood' END
            WHEN CAST(n_stop AS DOUBLE) / n_tok >= 0.30 THEN 'neargood'
            ELSE 'bad' END AS cf
        FROM m),
      ctx AS (
        SELECT doc_id, pos, btext, cf,
          COALESCE(last_value(CASE WHEN cf IN ('good','bad')
              THEN cf = 'good' END IGNORE NULLS)
            OVER (PARTITION BY doc_id ORDER BY pos
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
            false) AS prev_good,
          COALESCE(first_value(CASE WHEN cf IN ('good','bad')
              THEN cf = 'good' END IGNORE NULLS)
            OVER (PARTITION BY doc_id ORDER BY pos
              ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING),
            false) AS next_good
        FROM cf),
      k AS (
        SELECT doc_id, pos, btext,
          CASE cf WHEN 'good' THEN true WHEN 'bad' THEN false
            WHEN 'neargood' THEN prev_good OR next_good
            ELSE prev_good AND next_good END AS keep
        FROM ctx)
      SELECT doc_id,
        COALESCE(string_agg(CASE WHEN keep THEN btext END, chr(10)
          ORDER BY pos), '') AS extracted,
        CAST(COUNT(*) AS BIGINT) AS n_blocks,
        CAST(COUNT(CASE WHEN keep THEN 1 END) AS BIGINT) AS n_kept
      FROM k GROUP BY doc_id ORDER BY doc_id""")) { (s, dir) =>
      import s.implicits._
      val html = concat(
        lit("<div id=\"nav\"><a href=\"/\">home page</a> <a href=\"/p\">all products</a> <a href=\"/a\">about the team</a> <a href=\"/c\">contact us now</a></div>"),
        lit("<h1>doc "), $"doc_id".cast("string"), lit(" overview</h1>"),
        lit("<p>"), substring($"text", 1, 150), lit(s" $glue</p>"),
        lit("<p>see also</p>"),
        lit("<p>"), substring($"text", 151, 150), lit(s" $glue</p>"),
        lit("<p>"), substring($"text", 1, 60), lit(" for the most part</p>"),
        lit("<div id=\"footer\"><a href=\"/pr\">privacy policy</a> | <a href=\"/t\">terms of use</a> all rights reserved 2026</div>"))
      graft.ops.Boilerplate.densityExtract(
          docs(s, dir).filter($"doc_id" % 7 === 0).withColumn("html", html),
          "doc_id", "html", stops)
        .select($"doc_id", $"extracted", $"n_blocks", $"n_kept")
        .orderBy($"doc_id")
    }
  }

  /** Nesting-aware DOM block tree ([[graft.ops.HtmlDom]], surfaced as
    * [[graft.functions.DomBlocks]]) — the real-parse complement of the
    * regex splitters above, closing the last documented divergence
    * from the reference's trafilatura stage (a nesting-aware block
    * tree; setu/text_extraction.py:556). The synthetic page plants
    * exactly the structures regex splitting CANNOT recover: a `>`
    * inside a quoted attribute, a `</div><p>` INSIDE a script string
    * (raw-text element — a regex block-split would cut the document
    * there), `<li>` implied closes, a paragraph closed implicitly by
    * `</article>`, inline `<b>` word-joining, entity decode, and
    * chrome ancestry (nav/footer). The oracle does NOT re-parse: it
    * states the expected block rows LITERALLY from the same text
    * pieces, so a green row proves the parser recovered the known
    * tree exactly (pos, depth, path, text, link chars, chrome — all
    * hashed). Pathological tag soup (mis-nesting, CDATA, unclosed
    * everything) is pinned in HtmlDomSpec. */
  val dDomBlocks: Spec = Spec(
    "d_dom_blocks",
    oracle = Some("""
      WITH r AS (
        SELECT doc_id,
          substr(text, 1, 16) AS t1, substr(text, 17, 40) AS t2,
          substr(text, 57, 40) AS t3, substr(text, 97, 20) AS t4,
          substr(text, 117, 20) AS t5, substr(text, 137, 30) AS t6
        FROM documents WHERE doc_id % 9 = 0),
      e AS (
        SELECT doc_id, unnest([
          {pos: 1, depth: 3, path: 'html>body>nav',
           text: 'home about', link_chars: 9, chrome: true},
          {pos: 2, depth: 4, path: 'html>body>article>h1',
           text: trim(regexp_replace('heading ' || t1, '\s+', ' ', 'g')),
           link_chars: 0, chrome: false},
          {pos: 3, depth: 4, path: 'html>body>article>p',
           text: trim(regexp_replace('intro ' || t2 || ' bolded', '\s+', ' ', 'g')),
           link_chars: 0, chrome: false},
          {pos: 4, depth: 5, path: 'html>body>article>div>p',
           text: trim(regexp_replace('nested ' || t3, '\s+', ' ', 'g')),
           link_chars: 0, chrome: false},
          {pos: 5, depth: 6, path: 'html>body>article>div>ul>li',
           text: trim(regexp_replace('item one ' || t4, '\s+', ' ', 'g')),
           link_chars: 0, chrome: false},
          {pos: 6, depth: 6, path: 'html>body>article>div>ul>li',
           text: trim(regexp_replace('item two ' || t5, '\s+', ' ', 'g')),
           link_chars: 0, chrome: false},
          {pos: 7, depth: 4, path: 'html>body>article>p',
           text: trim(regexp_replace('tail ' || t6, '\s+', ' ', 'g')),
           link_chars: 0, chrome: false},
          {pos: 8, depth: 3, path: 'html>body>footer',
           text: 'terms & conditions legal', link_chars: 5, chrome: true}
        ]) AS b
        FROM r)
      SELECT doc_id, CAST(b.pos AS INTEGER) AS pos,
        CAST(b.depth AS INTEGER) AS depth, b.path, b.text,
        CAST(b.link_chars AS BIGINT) AS link_chars, b.chrome
      FROM e ORDER BY doc_id, pos""")) { (s, dir) =>
    import s.implicits._
    docs(s, dir)
      .filter($"doc_id" % 9 === 0)
      .select($"doc_id", GraftFunctions.domBlocks(domTemplate($"text", $"doc_id")).as("bs"))
      .select($"doc_id", explode($"bs").as("b"))
      .select($"doc_id", $"b.pos".as("pos"), $"b.depth".as("depth"),
        $"b.path".as("path"), $"b.text".as("text"),
        $"b.link_chars".as("link_chars"), $"b.chrome".as("chrome"))
      .orderBy($"doc_id", $"pos")
  }

  /** The nested synthetic page shared by [[dDomBlocks]] and
    * [[dDomExtract]]. */
  private def domTemplate(text: org.apache.spark.sql.Column,
      docId: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    concat(
      lit("<html><body><nav><a href=\"/\">home</a> <a href=\"/x\">about</a></nav>"),
      lit("<article><h1>heading "), substring(text, 1, 16), lit("</h1>"),
      lit("<p>intro "), substring(text, 17, 40), lit(" <b>bolded</b></p>"),
      lit("<div title=\"a > b\"><p>nested "), substring(text, 57, 40), lit("</p>"),
      lit("<ul><li>item one "), substring(text, 97, 20),
      lit("<li>item two "), substring(text, 117, 20), lit("</ul></div>"),
      lit("<script>var s = \"</div><p>fake\";</script>"),
      lit("<p>tail "), substring(text, 137, 30), lit("</article>"),
      lit("<footer>terms &amp; conditions <a href=\"/t\">legal</a></footer></body></html>"))

  /** STRUCTURAL main-content extraction over the DOM tree: drop chrome
    * blocks by ANCESTRY (nav/footer/aside/header — the pruning flat
    * density scoring can only approximate), drop link-dense blocks
    * (link_chars/len > 0.2) and headline-bare short blocks (< 25
    * chars), reassemble the rest in document order. Complements
    * [[dHtmlExtractDense]]: density decides by CONTENT, this decides by
    * STRUCTURE; a production chain runs both. Oracle: the same literal
    * expected-block rows as d_dom_blocks, pushed through the identical
    * keep predicate — so the green row proves prune + reassembly, not
    * just the parse. */
  val dDomExtract: Spec = Spec(
    "d_dom_extract",
    oracle = Some("""
      WITH r AS (
        SELECT doc_id,
          substr(text, 17, 40) AS t2, substr(text, 57, 40) AS t3,
          substr(text, 97, 20) AS t4, substr(text, 117, 20) AS t5,
          substr(text, 137, 30) AS t6, substr(text, 1, 16) AS t1
        FROM documents WHERE doc_id % 9 = 0),
      e AS (
        SELECT doc_id, unnest([
          {pos: 1, text: 'home about', link_chars: 9, chrome: true},
          {pos: 2, text: trim(regexp_replace('heading ' || t1, '\s+', ' ', 'g')),
           link_chars: 0, chrome: false},
          {pos: 3, text: trim(regexp_replace('intro ' || t2 || ' bolded', '\s+', ' ', 'g')),
           link_chars: 0, chrome: false},
          {pos: 4, text: trim(regexp_replace('nested ' || t3, '\s+', ' ', 'g')),
           link_chars: 0, chrome: false},
          {pos: 5, text: trim(regexp_replace('item one ' || t4, '\s+', ' ', 'g')),
           link_chars: 0, chrome: false},
          {pos: 6, text: trim(regexp_replace('item two ' || t5, '\s+', ' ', 'g')),
           link_chars: 0, chrome: false},
          {pos: 7, text: trim(regexp_replace('tail ' || t6, '\s+', ' ', 'g')),
           link_chars: 0, chrome: false},
          {pos: 8, text: 'terms & conditions legal', link_chars: 5, chrome: true}
        ]) AS b
        FROM r),
      k AS (
        SELECT doc_id, b.pos AS pos, b.text AS btext,
          NOT b.chrome AND len(b.text) >= 25
            AND CAST(b.link_chars AS DOUBLE) / len(b.text) <= 0.2 AS keep
        FROM e)
      SELECT doc_id,
        COALESCE(string_agg(CASE WHEN keep THEN btext END, chr(10)
          ORDER BY pos), '') AS extracted,
        CAST(COUNT(*) AS BIGINT) AS n_blocks,
        CAST(COUNT(CASE WHEN keep THEN 1 END) AS BIGINT) AS n_kept
      FROM k GROUP BY doc_id ORDER BY doc_id"""),
    bench = true) { (s, dir) =>
    import s.implicits._
    val b = docs(s, dir)
      .filter($"doc_id" % 9 === 0)
      .select($"doc_id", GraftFunctions.domBlocks(domTemplate($"text", $"doc_id")).as("bs"))
      .select($"doc_id", explode($"bs").as("b"))
      .withColumn("keep",
        !$"b.chrome" && length($"b.text") >= 25 &&
          $"b.link_chars".cast("double") / length($"b.text") <= 0.2)
    b.groupBy($"doc_id")
      .agg(
        coalesce(
          array_join(
            transform(
              array_sort(collect_list(
                when($"keep", struct($"b.pos".as("pos"), $"b.text".as("text"))))),
              x => x.getField("text")),
            "\n"),
          lit("")).as("extracted"),
        count(lit(1)).as("n_blocks"),
        sum(when($"keep", 1L).otherwise(0L)).as("n_kept"))
      .orderBy($"doc_id")
  }

  /** DOM → MARKDOWN rendering — the training-data serialization the
    * block tree makes possible (flat splitters lose the element kinds;
    * here each block's path tail picks its markdown form): h1..h6 →
    * '#'-runs, li → '- ', blockquote → '> ', paragraphs bare, chrome
    * ancestry dropped. LLM corpora overwhelmingly prefer markdown over
    * stripped text because structure survives tokenization; this is
    * the structured complement of d_dom_extract's plain reassembly.
    * The oracle states the expected markdown LITERALLY from the
    * template pieces (the d_dom_blocks discipline — no SQL re-parse). */
  val dDomMarkdown: Spec = Spec(
    "d_dom_markdown",
    oracle = Some("""
      WITH r AS (
        SELECT doc_id,
          trim(regexp_replace(substr(text, 1, 24), '\s+', ' ', 'g')) AS t1,
          trim(regexp_replace(substr(text, 25, 60), '\s+', ' ', 'g')) AS t2,
          trim(regexp_replace(substr(text, 85, 24), '\s+', ' ', 'g')) AS t3,
          trim(regexp_replace(substr(text, 109, 40), '\s+', ' ', 'g')) AS t4,
          trim(regexp_replace(substr(text, 149, 20), '\s+', ' ', 'g')) AS t5,
          trim(regexp_replace(substr(text, 169, 20), '\s+', ' ', 'g')) AS t6,
          trim(regexp_replace(substr(text, 189, 40), '\s+', ' ', 'g')) AS t7
        FROM documents WHERE doc_id % 11 = 3)
      SELECT doc_id,
        trim('# title ' || t1) || chr(10) ||
        trim('para ' || t2) || chr(10) ||
        trim('## section ' || t3) || chr(10) ||
        trim('> quote ' || t4) || chr(10) ||
        trim('- first ' || t5) || chr(10) ||
        trim('- second ' || t6) || chr(10) ||
        trim('closing ' || t7) AS markdown,
        CAST(7 AS BIGINT) AS n_blocks
      FROM r ORDER BY doc_id""")) { (s, dir) =>
    import s.implicits._
    val html = concat(
      lit("<html><body><nav><a href=\"/\">skip this chrome</a></nav><article>"),
      lit("<h1>title "), substring($"text", 1, 24), lit("</h1>"),
      lit("<p>para "), substring($"text", 25, 60), lit("</p>"),
      lit("<h2>section "), substring($"text", 85, 24), lit("</h2>"),
      lit("<blockquote>quote "), substring($"text", 109, 40), lit("</blockquote>"),
      lit("<ul><li>first "), substring($"text", 149, 20),
      lit("<li>second "), substring($"text", 169, 20), lit("</ul>"),
      lit("<p>closing "), substring($"text", 189, 40),
      lit("</article></body></html>"))
    val tag = element_at(split($"b.path", ">"), -1)
    val prefix = when(tag.startsWith("h") && tag.rlike("^h[1-6]$"),
        concat(expr("repeat('#', cast(substr(element_at(split(b.path, '>'), -1), 2) as int))"), lit(" ")))
      .when(tag === "li", lit("- "))
      .when(tag === "blockquote", lit("> "))
      .otherwise(lit(""))
    docs(s, dir)
      .filter($"doc_id" % 11 === 3)
      .select($"doc_id", explode(GraftFunctions.domBlocks(html)).as("b"))
      .filter(!$"b.chrome")
      .select($"doc_id", $"b.pos".as("pos"),
        concat(prefix, $"b.text").as("line"))
      .groupBy($"doc_id")
      .agg(
        array_join(transform(
          array_sort(collect_list(struct($"pos", $"line"))),
          x => x.getField("line")), "\n").as("markdown"),
        count(lit(1)).as("n_blocks"))
      .orderBy($"doc_id")
  }

  /** DOM → markdown with TABLES and NESTED LISTS
    * ([[graft.ops.HtmlDom.markdown]] via the graft_dom_markdown
    * expression) — the structures where stripped-text training data
    * loses the most: pipe rows with a '---' separator after the
    * th-header row (row boundaries come from the parser's open/close
    * event stream — consecutive td blocks alone cannot say where one
    * tr ends), '- '/'N. ' markers indented by real list depth, chrome
    * subtrees dropped whole. The oracle states the expected markdown
    * LITERALLY from the planted template pieces (the d_dom_blocks
    * discipline — no SQL re-parse); HtmlDomSpec pins the soup cases
    * (implied closes, pipe escaping, unclosed EOF). */
  val dDomMarkdownTables: Spec = Spec(
    "d_dom_markdown_tables",
    oracle = Some("""
      WITH r AS (
        SELECT doc_id,
          trim(regexp_replace(substr(text, 1, 16), '\s+', ' ', 'g')) AS t1,
          trim(regexp_replace(substr(text, 17, 18), '\s+', ' ', 'g')) AS t2,
          trim(regexp_replace(substr(text, 35, 18), '\s+', ' ', 'g')) AS t3,
          trim(regexp_replace(substr(text, 53, 16), '\s+', ' ', 'g')) AS t4,
          trim(regexp_replace(substr(text, 69, 16), '\s+', ' ', 'g')) AS t5,
          trim(regexp_replace(substr(text, 85, 16), '\s+', ' ', 'g')) AS t6
        FROM documents WHERE doc_id % 13 = 5)
      SELECT doc_id,
        trim('## report ' || t1) || chr(10) ||
        '| metric | value |' || chr(10) ||
        '| --- | --- |' || chr(10) ||
        '| ' || trim('alpha ' || t2) || ' | one |' || chr(10) ||
        '| beta | ' || trim('two ' || t3) || ' |' || chr(10) ||
        trim('- point ' || t4) || chr(10) ||
        '  - ' || trim('detail ' || t5) || chr(10) ||
        '  - detail2' || chr(10) ||
        '- point two' || chr(10) ||
        trim('1. first ' || t6) || chr(10) ||
        '2. second' AS markdown
      FROM r ORDER BY doc_id""")) { (s, dir) =>
    import s.implicits._
    val html = concat(
      lit("<html><body><nav><table><tr><td>navjunk</td></tr></table></nav>"),
      lit("<article><h2>report "), substring($"text", 1, 16), lit("</h2>"),
      lit("<table><tr><th>metric</th><th>value</th></tr>"),
      lit("<tr><td>alpha "), substring($"text", 17, 18),
      lit("</td><td>one</td></tr>"),
      lit("<tr><td>beta</td><td>two "), substring($"text", 35, 18),
      lit("</td></tr></table>"),
      lit("<ul><li>point "), substring($"text", 53, 16),
      lit("<ul><li>detail "), substring($"text", 69, 16),
      lit("<li>detail2</ul></li><li>point two</li></ul>"),
      lit("<ol><li>first "), substring($"text", 85, 16),
      lit("<li>second</ol></article></body></html>"))
    docs(s, dir)
      .filter($"doc_id" % 13 === 5)
      .select($"doc_id",
        GraftFunctions.domMarkdown(html).as("markdown"))
      .orderBy($"doc_id")
  }

  /** MIXED-SCRIPT token detector (spoofing/spam signal, the
    * script-level complement of d_homoglyph_fold's confusable
    * folding): a single token mixing Latin and Cyrillic letters is the
    * classic homograph-attack / SEO-spam shape ("pаypal" with a
    * Cyrillic а) that no single-script validator sees. Pure codegen'd
    * regexp over exploded tokens — Java `\\p{IsLatin}`/`\\p{IsCyrillic}`
    * classes on the Spark side, RE2 `\\p{Latin}`/`\\p{Cyrillic}` in the
    * oracle, same Unicode script property. Fixtures plant a spoofed
    * token, a pure-Cyrillic word (NOT flagged — foreign ≠ spoofed) and
    * clean text. */
  val dMixedScript: Spec = Spec(
    "d_mixed_script",
    oracle = Some("""
      WITH r AS (
        SELECT doc_id, substr(text, 1, 30) || CASE doc_id % 3
          WHEN 0 THEN ' verify pаypal account'
          WHEN 1 THEN ' обычный текст здесь'
          ELSE ' plain latin words' END AS rich
        FROM documents WHERE doc_id % 4 = 2),
      t AS (SELECT doc_id, unnest(string_split(rich, ' ')) AS tok FROM r),
      f AS (SELECT doc_id, tok,
              regexp_matches(tok, '\p{Latin}')
                AND regexp_matches(tok, '\p{Cyrillic}') AS mixed
            FROM t WHERE tok <> '')
      SELECT doc_id,
        CAST(COUNT(*) AS BIGINT) AS n_tokens,
        CAST(COUNT(CASE WHEN mixed THEN 1 END) AS BIGINT) AS n_mixed,
        COALESCE(string_agg(CASE WHEN mixed THEN tok END, ',' ORDER BY tok),
          '') AS mixed_tokens
      FROM f GROUP BY doc_id ORDER BY doc_id""")) { (s, dir) =>
    import s.implicits._
    val rich = concat(substring($"text", 1, 30),
      when($"doc_id" % 3 === 0, lit(" verify pаypal account"))
        .when($"doc_id" % 3 === 1, lit(" обычный текст здесь"))
        .otherwise(lit(" plain latin words")))
    docs(s, dir)
      .filter($"doc_id" % 4 === 2)
      .select($"doc_id", explode(split(rich, " ", -1)).as("tok"))
      .filter($"tok" =!= "")
      .withColumn("mixed",
        $"tok".rlike("\\p{IsLatin}") && $"tok".rlike("\\p{IsCyrillic}"))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        sum(when($"mixed", 1L).otherwise(0L)).as("n_mixed"),
        array_join(array_sort(collect_list(when($"mixed", $"tok"))), ",")
          .as("mixed_tokens"))
      .orderBy($"doc_id")
  }

  /** Junk-line filtering from the SHIPPED junk lexicons (the
    * reference's filter_data/junk surface): `complete` entries remove
    * a line by whole-line match (case-insensitive, trimmed), `partial`
    * by substring. Both the Spark predicates and the oracle SQL derive
    * from the same resource files; per-doc counts keep the oracle
    * tidy. Junk lines are injected doc_id-deterministically (the
    * synthetic corpus contains none). */
  val dJunkLines: Spec = {
    val complete = graft.sources.Lexicons.junkComplete("english")
    val partial = graft.sources.Lexicons.junkPartial("english")
    def q(w: String) = "'" + w.replace("'", "''") + "'"
    val inSql = complete.map(c => q(c.toLowerCase)).mkString(", ")
    val partSql = partial
      .map(p => s"contains(lower(line), ${q(p.toLowerCase)})").mkString(" OR ")
    Spec(
      "d_junk_lines",
      oracle = Some(s"""
      WITH r AS (
        SELECT doc_id, substr(text, 1, 40) || CASE doc_id % 3
          WHEN 0 THEN chr(10) || 'Loading...'
          WHEN 1 THEN chr(10) || 'please subscribe to our newsletter today'
          ELSE chr(10) || 'this line stays' END AS rich
        FROM documents WHERE doc_id % 4 = 1),
      l AS (SELECT doc_id, unnest(string_split(rich, chr(10))) AS line FROM r),
      c AS (SELECT doc_id, line,
              (lower(trim(line)) IN ($inSql)) AS is_c,
              ($partSql) AS is_p
            FROM l)
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_lines,
        CAST(COUNT(CASE WHEN is_c THEN 1 END) AS BIGINT) AS n_junk_complete,
        CAST(COUNT(CASE WHEN is_p AND NOT is_c THEN 1 END) AS BIGINT) AS n_junk_partial,
        CAST(COUNT(CASE WHEN NOT is_c AND NOT is_p THEN 1 END) AS BIGINT) AS n_kept
      FROM c GROUP BY doc_id ORDER BY doc_id""")) { (s, dir) =>
      import s.implicits._
      val rich = concat(substring($"text", 1, 40),
        when($"doc_id" % 3 === 0, lit("\nLoading..."))
          .when($"doc_id" % 3 === 1,
            lit("\nplease subscribe to our newsletter today"))
          .otherwise(lit("\nthis line stays")))
      val lines = docs(s, dir)
        .filter($"doc_id" % 4 === 1)
        .select($"doc_id", explode(split(rich, "\n")).as("line"))
      val isC = lower(trim($"line"))
        .isin(complete.map(_.toLowerCase): _*)
      val isP = partial
        .map(p => lower($"line").contains(p.toLowerCase))
        .reduce(_ || _)
      lines
        .select($"doc_id", isC.as("is_c"), isP.as("is_p"))
        .groupBy($"doc_id")
        .agg(count(lit(1)).as("n_lines"),
          count(when($"is_c", 1)).as("n_junk_complete"),
          count(when($"is_p" && !$"is_c", 1)).as("n_junk_partial"),
          count(when(!$"is_c" && !$"is_p", 1)).as("n_kept"))
        .orderBy($"doc_id")
    }
  }

  /** Script-run segmentation for code-mixed documents (the Indic-web
    * reality setu curates: Hindi/Bengali prose with embedded Latin) —
    * ONE ordered alternation regex extracts the letter runs, so
    * segments come out interleaved in document order; each classifies
    * by its first codepoint. Row-local (no shuffle, no UDF), and the
    * same RE2-safe pattern runs in the oracle, which must reproduce
    * every segment's position, script, length and md5. */
  val dScriptSegments: Spec = Spec(
    "d_script_segments",
    oracle = Some("""
      WITH r AS (
        SELECT doc_id, substr(text, 1, 30) ||
          ' नमस्ते दुनिया hello world আবার দেখা হবে ok' AS rich
        FROM documents WHERE doc_id % 4 = 2),
      seg AS (SELECT doc_id, generate_subscripts(ss, 1) AS seg_idx,
                unnest(ss) AS seg
              FROM (SELECT doc_id, regexp_extract_all(rich,
                '[\x{0900}-\x{097f}]+|[\x{0980}-\x{09ff}]+|[A-Za-z]+') AS ss
                FROM r))
      SELECT doc_id, CAST(seg_idx AS BIGINT) AS seg_idx,
        CASE WHEN regexp_matches(seg, '^[\x{0900}-\x{097f}]') THEN 'devanagari'
             WHEN regexp_matches(seg, '^[\x{0980}-\x{09ff}]') THEN 'bengali'
             ELSE 'latin' END AS script,
        CAST(length(seg) AS BIGINT) AS seg_chars,
        md5(seg) AS seg_md5
      FROM seg ORDER BY doc_id, seg_idx""")) { (s, dir) =>
    import s.implicits._
    val pat = "[\\u0900-\\u097F]+|[\\u0980-\\u09FF]+|[A-Za-z]+"
    docs(s, dir)
      .filter($"doc_id" % 4 === 2)
      .select($"doc_id", concat(substring($"text", 1, 30),
        lit(" नमस्ते दुनिया hello world আবার দেখা হবে ok")).as("rich"))
      .select($"doc_id",
        posexplode(regexp_extract_all($"rich", lit(pat), lit(0)))
          .as(Seq("i", "seg")))
      .select($"doc_id", ($"i" + 1).cast("long").as("seg_idx"),
        when($"seg".rlike("^[\\u0900-\\u097F]"), "devanagari")
          .when($"seg".rlike("^[\\u0980-\\u09FF]"), "bengali")
          .otherwise("latin").as("script"),
        length($"seg").cast("long").as("seg_chars"),
        md5($"seg").as("seg_md5"))
      .orderBy($"doc_id", $"seg_idx")
  }

  /** Consecutive-duplicate-token collapse ("the the the" → "the") — the
    * token-level twin of whitespace normalization, a standard crawl-
    * cleaning pass (stutter artifacts from OCR/ASR and template
    * unrolling). Shuffle-free: the collapse is a single Catalyst
    * expression chain (filter over lagged array positions) evaluated
    * per row inside the scan's codegen stage — no explode, no window,
    * so it runs at scan speed on any corpus size. */
  val dRunCollapse: Spec = Spec(
    "d_run_collapse",
    oracle = Some("""
      WITH t AS (
        SELECT doc_id, string_split(text, ' ') AS l FROM documents
        WHERE doc_id % 7 = 0)
      SELECT doc_id,
        CAST(len(l) AS BIGINT) AS n_tok,
        CAST(len(list_filter(l, (x, i) -> i = 1 OR x <> l[i-1])) AS BIGINT) AS n_tok_collapsed,
        array_to_string(list_filter(l, (x, i) -> i = 1 OR x <> l[i-1]), ' ') AS collapsed
      FROM t ORDER BY doc_id""")) { (s, dir) =>
    import s.implicits._
    docs(s, dir)
      .filter($"doc_id" % 7 === 0)
      .select($"doc_id", Text.tokens($"text").as("l"))
      .select($"doc_id",
        size($"l").cast("long").as("n_tok"),
        size(Text.collapseRuns($"l")).cast("long").as("n_tok_collapsed"),
        array_join(Text.collapseRuns($"l"), " ").as("collapsed"))
      .orderBy($"doc_id")
  }

  /** Encoding-artifact (mojibake) detection + repair: UTF-8 read as
    * Latin-1 leaves signature byte pairs (Ã©, â€™, â€œ, Â ) that a
    * crawl-cleaning pass counts and reverses. The corpus is pure ASCII,
    * so artifacts are injected deterministically into doc_id%11 rows —
    * identical expression both sides (the [[Lexical]] injection
    * pattern) — and the REAL detector/repairer runs on the result.
    * Detection is one regexp count, repair a replace chain: per-row
    * scalar work inside scan codegen, shuffle-free at any scale. */
  val dMojibake: Spec = Spec(
    "d_mojibake",
    oracle = Some(s"""
      WITH r AS (
        SELECT doc_id,
          CASE doc_id % 3
            WHEN 0 THEN substr(text,1,40) || 'cafÃ©' || substr(text,41,40)
            WHEN 1 THEN substr(text,1,30) || 'donâ€™t stop' || substr(text,31,20) || 'â€œquotedâ€'
            ELSE substr(text,1,60) || 'plainÂ space'
          END AS rich
        FROM documents WHERE doc_id % 11 = 0),
      d AS (
        SELECT doc_id, rich,
          CAST(len(regexp_extract_all(rich, 'Ã©|â€™|â€œ|â€|Â ')) AS BIGINT) AS n_artifacts,
          replace(replace(replace(replace(replace(rich,
            'Ã©', 'é'), 'â€™', '’'), 'â€œ', '“'), 'â€', '”'), 'Â ', ' ') AS repaired
        FROM r)
      SELECT doc_id, n_artifacts, n_artifacts > 0 AS is_mojibake,
        md5(repaired) AS repaired_md5
      FROM d ORDER BY doc_id""")) { (s, dir) =>
    import s.implicits._
    val rich = when($"doc_id" % 3 === 0,
        concat(substring($"text", 1, 40), lit("cafÃ©"), substring($"text", 41, 40)))
      .when($"doc_id" % 3 === 1,
        concat(substring($"text", 1, 30), lit("donâ€™t stop"),
          substring($"text", 31, 20), lit("â€œquotedâ€")))
      .otherwise(concat(substring($"text", 1, 60), lit("plainÂ space")))
    docs(s, dir)
      .filter($"doc_id" % 11 === 0)
      .select($"doc_id", rich.as("rich"))
      .select($"doc_id",
        Text.mojibakeCount($"rich").as("n_artifacts"),
        (Text.mojibakeCount($"rich") > 0).as("is_mojibake"),
        md5(Text.mojibakeRepair($"rich")).as("repaired_md5"))
      .orderBy($"doc_id")
  }

  /** Homoglyph folding (the anti-obfuscation cleaning pass): Cyrillic/
    * Greek lookalike characters mapped to their Latin targets with one
    * codegen'd translate() — the spam idiom "frее dоwnlоad" (Cyrillic
    * е/о) folds to plain ASCII so downstream NSFW/keyword filters
    * cannot be dodged by script swapping. The confusables map is an
    * own-compiled 12-entry core (а е о р с у х і ѕ ј ο ν — the
    * highest-frequency spoof set); planted obfuscation on doc_id % 9
    * proves the fold path non-vacuous. n_homoglyphs counts mapped
    * chars via the translate-delete trick (no regex, no explode). */
  val dHomoglyphFold: Spec = Spec(
    "d_homoglyph_fold",
    oracle = Some("""
      WITH r AS (SELECT doc_id,
          text || CASE WHEN doc_id % 9 = 0 THEN ' frее dоwnlоad' ELSE '' END
            AS text
        FROM documents),
      f AS (SELECT doc_id,
          translate(text, 'аеорсухіѕјον', 'aeopcyxisjov') AS folded,
          length(text) - length(translate(text, 'аеорсухіѕјον', ''))
            AS n_homoglyphs
        FROM r)
      SELECT doc_id, md5(folded) AS folded_md5,
        CAST(n_homoglyphs AS BIGINT) AS n_homoglyphs,
        n_homoglyphs > 0 AS is_suspicious
      FROM f ORDER BY doc_id""")) { (s, dir) =>
    import s.implicits._
    val from = "аеорсухіѕјον"
    val to = "aeopcyxisjov"
    val text = concat($"text",
      when($"doc_id" % 9 === 0, lit(" frее dоwnlоad")).otherwise(lit("")))
    docs(s, dir)
      .select($"doc_id",
        md5(translate(text, from, to)).as("folded_md5"),
        (length(text) - length(translate(text, from, "")))
          .cast("long").as("n_homoglyphs"))
      .withColumn("is_suspicious", $"n_homoglyphs" > 0)
      .orderBy($"doc_id")
  }

  /** URL hygiene stage (crawl-corpus preprocessing, [[graft.ops.Url]]):
    * normalization (scheme/host case-fold, default port + www. strip,
    * trailing-slash strip, utm_* tracking-param removal, fragment
    * drop), host + naive registered-domain extraction, path depth, a
    * broadcast host-blocklist flag, and the URL-level duplicate count
    * over the NORMALIZED form — the cheap pre-content dedup key
    * (CCNet/RefinedWeb practice; the reference carries a per-doc `url`
    * field untouched, filters.py:632). Raw URLs derive
    * deterministically from (source, doc_id) with case/port/www/slash/
    * utm/fragment variation, identical expression both engines — the
    * derived-input recipe this module documents at the top.
    *
    * Scale shape: every extraction is a row-local regexp (one codegen'd
    * projection over the scan); the blocklist rides a broadcast; the
    * only shuffle is the normalized-url dup count — the cheapest
    * possible dedup exchange (short string keys, no content). */
  val dUrlOps: Spec = Spec(
    "d_url_ops",
    oracle = Some("""
      WITH u AS (
        SELECT doc_id,
          (CASE WHEN doc_id % 2 = 0 THEN 'HTTPS' ELSE 'https' END) || '://' ||
          (CASE WHEN doc_id % 3 = 0 THEN 'www.' ELSE '' END) ||
          (CASE WHEN doc_id % 2 = 0 THEN upper(source) ELSE source END) ||
          '.example.org' ||
          (CASE WHEN doc_id % 5 = 0 THEN ':443' ELSE '' END) ||
          '/docs/' || CAST(doc_id % 7 AS VARCHAR) ||
          (CASE WHEN doc_id % 4 = 0 THEN '/' ELSE '' END) ||
          '?utm_source=feed&id=' || CAST(doc_id % 5 AS VARCHAR) ||
          (CASE WHEN doc_id % 4 = 0 THEN '#frag' ELSE '' END) AS url
        FROM documents),
      p AS (
        SELECT doc_id, url,
          lower(regexp_extract(url, '^[A-Za-z]+://([^/?#]+)', 1)) AS hostport,
          regexp_extract(url, '^[A-Za-z]+://[^/?#]+([^?#]*)', 1) AS path,
          regexp_extract(url, '\?([^#]*)', 1) AS query
        FROM u),
      n AS (
        SELECT doc_id, url,
          regexp_replace(regexp_replace(hostport, ':443$', ''), '^www\.', '') AS host,
          regexp_replace(path, '/$', '') AS cpath,
          regexp_replace(regexp_replace(query, '(^|&)utm_[^&]*', '', 'g'), '^&', '') AS cq
        FROM p),
      f AS (
        SELECT doc_id, url,
          'https://' || host || cpath ||
            (CASE WHEN cq <> '' THEN '?' || cq ELSE '' END) AS url_norm,
          host,
          regexp_extract(host, '([^.]+\.[^.]+)$', 1) AS domain,
          CAST(length(cpath) - length(replace(cpath, '/', '')) AS BIGINT) AS path_depth
        FROM n),
      d AS (SELECT url_norm, COUNT(*) AS n_dup FROM f GROUP BY 1)
      SELECT f.doc_id, f.url_norm, f.host, f.domain, f.path_depth,
        CAST(f.host IN ('src3.example.org', 'src7.example.org',
          'src11.example.org') AS BOOLEAN) AS is_blocked,
        CAST(d.n_dup AS BIGINT) AS n_dup
      FROM f JOIN d ON d.url_norm = f.url_norm
      ORDER BY f.doc_id""")) { (s, dir) =>
    import s.implicits._
    import graft.ops.Url
    val url = concat(
      when($"doc_id" % 2 === 0, "HTTPS").otherwise("https"), lit("://"),
      when($"doc_id" % 3 === 0, "www.").otherwise(""),
      when($"doc_id" % 2 === 0, upper($"source")).otherwise($"source"),
      lit(".example.org"),
      when($"doc_id" % 5 === 0, ":443").otherwise(""),
      lit("/docs/"), ($"doc_id" % 7).cast("string"),
      when($"doc_id" % 4 === 0, "/").otherwise(""),
      lit("?utm_source=feed&id="), ($"doc_id" % 5).cast("string"),
      when($"doc_id" % 4 === 0, "#frag").otherwise(""))
    val f = Tables.load(s, dir, "documents")
      .select($"doc_id", url.as("url"))
      .select($"doc_id",
        Url.normalize($"url").as("url_norm"),
        Url.host($"url").as("host"),
        Url.registeredDomain($"url").as("domain"),
        Url.pathDepth($"url").as("path_depth"))
    val blocklist = broadcast(Seq("src3.example.org", "src7.example.org",
      "src11.example.org").toDF("host").withColumn("blk", lit(true)))
    val dups = f.groupBy($"url_norm").agg(count(lit(1)).as("n_dup"))
    f.join(blocklist, Seq("host"), "left")
      .join(dups, "url_norm")
      .select($"doc_id", $"url_norm", $"host", $"domain", $"path_depth",
        coalesce($"blk", lit(false)).as("is_blocked"), $"n_dup")
      .orderBy($"doc_id")
  }

  val specs: Seq[Spec] = Seq(
    dSplitSentences, dNumPuncChunks, dTerminalChunks, dNumberChunks,
    dCodeDetect, dCodeRemove, dNormalizeIndic, dTerminalPuncFilter,
    dNonTermSpanRemove, dSentenceSplitLang, dPiiMask, dBoilerplateLines,
    dHtmlExtract, dHtmlExtractDense, dDomBlocks, dDomExtract,
    dDomMarkdown, dDomMarkdownTables, dDomJustext, dLuhnCards, dJunkLines,
    dScriptSegments,
    dRunCollapse, dMojibake, dMixedScript,
    dHomoglyphFold, dUrlOps)
}
