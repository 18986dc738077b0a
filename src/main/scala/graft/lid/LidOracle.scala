package graft.lid

/** DuckDB replay of the FULL 4-detector LID ensemble + majority vote —
  * the oracle for `d_lid_ensemble`. Every detector's arithmetic was
  * made integer-exact ([[TrigramScore]]) precisely so this replay can
  * hash-match:
  *
  *  - trigram heads (ngram + indic roman/native): doc and seed trigram
  *    COUNTS are integers; the SQL rebuilds both from the same seed
  *    sentences (embedded as VALUES) with the same normalization
  *    (`'  ' || lower(strip non-letters) || '  '`, grams over char
  *    positions), then replays the argmax as the pure-integer
  *    comparison dot_m²·n2_g > dot_g²·n2_m and the confidence as
  *    `dot / sqrt(n2doc · n2seed)` — the identical two-op IEEE
  *    sequence on both engines;
  *  - stopword head: the in-JVM lists (inline ∪ shipped lexicons) are
  *    embedded as VALUES, hits/argmax/ratio are integer-exact;
  *  - script head: per-letter Unicode-script histogram replayed via
  *    regex character classes GENERATED from the JVM's own
  *    `Character.isLetter` × `Character.UnicodeScript` tables (BMP
  *    coverage — the corpus is BMP; astral letters would diverge and
  *    are documented out of scope), including the latin→en 0.3 rule
  *    and the smallest-label tie;
  *  - vote: majority of non-abstaining heads, detector priority on
  *    ties, exactly [[Ensemble.vote]].
  *
  * Parity preconditions (hold for the synthetic corpus, asserted by
  * the green row): text within the BMP (JVM substring/take count
  * UTF-16 units vs DuckDB chars) and default-locale lowercasing =
  * Unicode simple lowercasing. */
object LidOracle {

  private def q(s: String): String = "'" + s.replace("'", "''") + "'"

  /** `'  ' || lower(strip) || '  '` — gramCounts' normalization. */
  private def normSql(col: String): String =
    s"'  ' || lower(regexp_replace($col, '[^\\p{L} ]', '', 'g')) || '  '"

  /** Seed sentences for the three trigram spaces as a VALUES list. */
  private def seedValues: String = {
    val rows =
      CharNgramDetector.seeds.toSeq.sortBy(_._1).map { case (l, t) =>
        s"('ngram', ${q(l)}, ${q(t)})"
      } ++ IndicDetector.romanSeeds.toSeq.sortBy(_._1).map { case (l, t) =>
        s"('roman', ${q(l)}, ${q(t)})"
      } ++ IndicDetector.nativeSeeds.toSeq.sortBy(_._1).map { case (l, t) =>
        s"('native', ${q(l)}, ${q(t)})"
      }
    rows.mkString(",\n        ")
  }

  /** Stopword lists as (lang, word) VALUES. */
  private def stopwordValues: String =
    StopwordDetector.lists.toSeq.sortBy(_._1).flatMap { case (l, ws) =>
      ws.toSeq.sorted.map(w => s"(${q(l)}, ${q(w)})")
    }.mkString(",\n        ")

  /** The script label the JVM assigns to a letter codepoint. */
  private def scriptLabel(cp: Int): Option[String] = {
    if (!Character.isLetter(cp)) None
    else {
      val sc = Character.UnicodeScript.of(cp)
      ScriptDetector.scriptLang.get(sc).orElse(
        if (sc == Character.UnicodeScript.LATIN) Some("latin") else Some("und"))
    }
  }

  /** RE2 char class (interior, no brackets) of BMP codepoints matching
    * the predicate, as compressed \x{...} ranges. */
  private def classOf(pred: Int => Boolean): String = {
    val sb = new StringBuilder
    var cp = 0
    while (cp <= 0xFFFF) {
      if (pred(cp)) {
        val lo = cp
        while (cp <= 0xFFFF && pred(cp)) cp += 1
        val hi = cp - 1
        if (lo == hi) sb.append(f"\\x{$lo%04x}")
        else sb.append(f"\\x{$lo%04x}-\\x{$hi%04x}")
      } else cp += 1
    }
    sb.toString
  }

  /** Distinct script labels (excluding latin/und, handled separately). */
  private val scriptLabels: Seq[String] =
    ScriptDetector.scriptLang.values.toSeq.distinct.sorted

  private def countSql(cls: String): String =
    s"length(regexp_replace(text, '[^$cls]', '', 'g'))"

  /** The whole ensemble as one DuckDB query over `documents`
    * (doc_id % 20 = 0), column-compatible with
    * [[Ensemble.annotate]] + the d_lid_ensemble projection. */
  def ensembleSql: String = {
    val labelCols = scriptLabels.map { l =>
      s"${countSql(classOf(cp => scriptLabel(cp).contains(l)))} AS c_$l"
    }
    val latinCol = s"${countSql(classOf(cp => scriptLabel(cp).contains("latin")))} AS c_latin"
    val allCol = s"${countSql(classOf(Character.isLetter))} AS c_all"
    val scUnion = (scriptLabels.map(l => s"SELECT doc_id, ${q(l)} AS lang, c_$l AS c FROM sc") :+
      s"SELECT doc_id, 'latin', c_latin FROM sc" :+
      (s"SELECT doc_id, 'und', c_all - (c_latin" +
        scriptLabels.map(l => s" + c_$l").mkString + ") FROM sc"))
      .mkString("\n        UNION ALL ")

    raw"""
      WITH docs0 AS (SELECT doc_id, text FROM documents WHERE doc_id % 20 = 0),
      -- ===== trigram spaces (doc side truncated to 4000 chars) =====
      dnorm AS (SELECT doc_id, ${normSql("substr(text, 1, 4000)")} AS s FROM docs0),
      dgrams AS (SELECT doc_id, g, COUNT(*)::BIGINT AS c FROM (
          SELECT doc_id, substr(s, i + 1, 3) AS g
          FROM dnorm CROSS JOIN unnest(range(0, length(s) - 2)) AS t(i))
        GROUP BY doc_id, g),
      dn2 AS (SELECT doc_id, SUM(c * c)::BIGINT AS n2 FROM dgrams GROUP BY doc_id),
      seeds(space, lang, seed) AS (VALUES
        $seedValues),
      snorm AS (SELECT space, lang, ${normSql("seed")} AS s FROM seeds),
      sgrams AS (SELECT space, lang, g, COUNT(*)::BIGINT AS c FROM (
          SELECT space, lang, substr(s, i + 1, 3) AS g
          FROM snorm CROSS JOIN unnest(range(0, length(s) - 2)) AS t(i))
        GROUP BY space, lang, g),
      sn2 AS (SELECT space, lang, SUM(c * c)::BIGINT AS n2 FROM sgrams
        GROUP BY space, lang),
      dots AS (SELECT d.doc_id, s.space, s.lang, SUM(d.c * s.c)::BIGINT AS dot
        FROM dgrams d JOIN sgrams s ON d.g = s.g GROUP BY d.doc_id, s.space, s.lang),
      grid AS (SELECT dd.doc_id, sl.space, sl.lang, sl.n2 AS sn2,
          COALESCE(dt.dot, 0)::BIGINT AS dot, dn2.n2 AS dn2
        FROM (SELECT doc_id FROM docs0) dd CROSS JOIN sn2 sl
        JOIN dn2 ON dn2.doc_id = dd.doc_id
        LEFT JOIN dots dt ON dt.doc_id = dd.doc_id AND dt.space = sl.space
          AND dt.lang = sl.lang),
      -- integer-exact argmax: keep g iff no m with cos_m > cos_g
      win AS (SELECT g.doc_id, g.space, MIN(g.lang) AS lang
        FROM grid g
        WHERE g.dot > 0 AND NOT EXISTS (
          SELECT 1 FROM grid m
          WHERE m.doc_id = g.doc_id AND m.space = g.space
            AND m.dot * m.dot * g.sn2 > g.dot * g.dot * m.sn2)
        GROUP BY g.doc_id, g.space),
      wres AS (SELECT w.doc_id, w.space, w.lang, g.dot, g.sn2, g.dn2,
          CAST(g.dot AS DOUBLE) / sqrt(CAST(g.dn2 AS DOUBLE) * CAST(g.sn2 AS DOUBLE)) AS conf
        FROM win w JOIN grid g ON g.doc_id = w.doc_id AND g.space = w.space
          AND g.lang = w.lang),
      ngram_res AS (SELECT d.doc_id, COALESCE(w.lang, 'und') AS lang,
          COALESCE(w.conf, 0.0) AS conf
        FROM docs0 d LEFT JOIN wres w ON w.doc_id = d.doc_id AND w.space = 'ngram'),
      -- ===== script head: JVM-generated letter/script classes =====
      sc AS (SELECT doc_id,
          ${labelCols.mkString(",\n          ")},
          $latinCol,
          $allCol
        FROM docs0),
      scounts AS (
        $scUnion),
      sarg AS (SELECT doc_id, lang, c FROM (
          SELECT doc_id, lang, c,
            row_number() OVER (PARTITION BY doc_id ORDER BY c DESC, lang) AS rk
          FROM scounts WHERE c > 0) WHERE rk = 1),
      script_res AS (SELECT sc.doc_id,
          CASE WHEN sc.c_all = 0 THEN 'und'
               WHEN w.lang = 'latin' THEN 'en' ELSE w.lang END AS lang,
          CASE WHEN sc.c_all = 0 THEN 0.0
               WHEN w.lang = 'latin'
                 THEN 0.3 * (CAST(w.c AS DOUBLE) / sc.c_all)
               ELSE CAST(w.c AS DOUBLE) / sc.c_all END AS conf
        FROM sc LEFT JOIN sarg w ON w.doc_id = sc.doc_id),
      -- ===== indic head: roman-ratio router then roman/native space =====
      rr0 AS (SELECT doc_id,
          length(text) AS input_len,
          length(regexp_replace(text, '[^@_!#$$%^&*()<>?/\\|}{~:]', '', 'g')) AS specials,
          length(regexp_replace(text, '[^ \t\n\x0B\f\r]', '', 'g')) AS spaces,
          length(regexp_replace(text, '[^\n]', '', 'g')) AS newlines,
          length(regexp_replace(text, '[^a-zA-Z0-9]', '', 'g')) AS roman
        FROM docs0),
      rr AS (SELECT doc_id,
          CASE WHEN (input_len - (specials + spaces + newlines)) = 0 THEN FALSE
               ELSE CAST(roman AS DOUBLE)
                 / (input_len - (specials + spaces + newlines)) >= 0.5
          END AS roman_route
        FROM rr0),
      indic_res AS (SELECT d.doc_id,
          CASE WHEN rr.roman_route THEN
            CASE WHEN wr.lang IS NULL OR wr.lang IN ('en', 'und')
                   OR NOT (100 * wr.dot * wr.dot >= 9 * wr.dn2 * wr.sn2)
                 THEN 'und' ELSE wr.lang END
          ELSE
            CASE WHEN wn.lang IS NOT NULL AND wn.lang <> 'und'
                   AND 100 * wn.dot * wn.dot >= 9 * wn.dn2 * wn.sn2
                 THEN wn.lang
                 WHEN sr.lang <> 'en' THEN sr.lang
                 ELSE 'und' END
          END AS lang,
          CASE WHEN rr.roman_route THEN
            CASE WHEN wr.lang IS NULL OR wr.lang IN ('en', 'und')
                   OR NOT (100 * wr.dot * wr.dot >= 9 * wr.dn2 * wr.sn2)
                 THEN 0.0 ELSE wr.conf END
          ELSE
            CASE WHEN wn.lang IS NOT NULL AND wn.lang <> 'und'
                   AND 100 * wn.dot * wn.dot >= 9 * wn.dn2 * wn.sn2
                 THEN wn.conf
                 WHEN sr.lang <> 'en' THEN sr.conf
                 ELSE 0.0 END
          END AS conf
        FROM docs0 d
        JOIN rr ON rr.doc_id = d.doc_id
        JOIN script_res sr ON sr.doc_id = d.doc_id
        LEFT JOIN wres wr ON wr.doc_id = d.doc_id AND wr.space = 'roman'
        LEFT JOIN wres wn ON wn.doc_id = d.doc_id AND wn.space = 'native'),
      -- ===== stopword head =====
      toks AS (SELECT doc_id, t FROM (
          SELECT doc_id,
            UNNEST(string_split_regex(lower(text), '[^\p{L}'']+')) AS t
          FROM docs0) WHERE t <> ''),
      tokn AS (SELECT doc_id, COUNT(*)::BIGINT AS n FROM toks GROUP BY doc_id),
      sw(lang, w) AS (VALUES
        $stopwordValues),
      hits AS (SELECT doc_id, lang, COUNT(*)::BIGINT AS h
        FROM toks JOIN sw ON toks.t = sw.w GROUP BY doc_id, lang),
      harg AS (SELECT doc_id, lang, h FROM (
          SELECT doc_id, lang, h,
            row_number() OVER (PARTITION BY doc_id ORDER BY h DESC, lang) AS rk
          FROM hits) WHERE rk = 1),
      stop_res AS (SELECT d.doc_id, COALESCE(w.lang, 'und') AS lang,
          CASE WHEN w.lang IS NULL THEN 0.0
               ELSE CAST(w.h AS DOUBLE) / tn.n END AS conf
        FROM docs0 d
        LEFT JOIN tokn tn ON tn.doc_id = d.doc_id
        LEFT JOIN harg w ON w.doc_id = d.doc_id),
      -- ===== majority vote, detector priority on ties =====
      joined AS (SELECT i.doc_id,
          i.lang AS l1, i.conf AS c1, n.lang AS l2, n.conf AS c2,
          st.lang AS l3, st.conf AS c3, sc2.lang AS l4, sc2.conf AS c4
        FROM indic_res i
        JOIN ngram_res n ON n.doc_id = i.doc_id
        JOIN stop_res st ON st.doc_id = i.doc_id
        JOIN script_res sc2 ON sc2.doc_id = i.doc_id),
      votes AS (SELECT *,
          CASE WHEN l1 = 'und' THEN -1 ELSE
            (l1 = l1)::INT + (l2 = l1)::INT + (l3 = l1)::INT + (l4 = l1)::INT
          END AS v1,
          CASE WHEN l2 = 'und' THEN -1 ELSE
            (l1 = l2)::INT + (l2 = l2)::INT + (l3 = l2)::INT + (l4 = l2)::INT
          END AS v2,
          CASE WHEN l3 = 'und' THEN -1 ELSE
            (l1 = l3)::INT + (l2 = l3)::INT + (l3 = l3)::INT + (l4 = l3)::INT
          END AS v3,
          CASE WHEN l4 = 'und' THEN -1 ELSE
            (l1 = l4)::INT + (l2 = l4)::INT + (l3 = l4)::INT + (l4 = l4)::INT
          END AS v4
        FROM joined)
      SELECT doc_id,
        CASE WHEN GREATEST(v1, v2, v3, v4) <= 0 THEN 'und'
             WHEN v1 = GREATEST(v1, v2, v3, v4) THEN l1
             WHEN v2 = GREATEST(v1, v2, v3, v4) THEN l2
             WHEN v3 = GREATEST(v1, v2, v3, v4) THEN l3
             ELSE l4 END AS doc_lang,
        l1 AS indic_lang, ROUND(c1, 6) AS indic_conf,
        l2 AS ngram_lang, ROUND(c2, 6) AS ngram_conf,
        l3 AS stop_lang, ROUND(c3, 6) AS stop_conf,
        l4 AS script_lang, ROUND(c4, 6) AS script_conf
      FROM votes ORDER BY doc_id"""
  }
}
