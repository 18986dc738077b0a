package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.{CountMin, Sampling, Skew, Text, TopK}

/** Training-data preparation operators — the corpus-to-training-run
  * steps a 100 TB LLM pipeline needs AFTER cleaning and dedup:
  * stratified sampling, token-budget shard packing, context-window
  * chunking, statistical quality scoring (unigram LM + Gopher rules).
  * Every query is oracled against DuckDB on the same tables.
  */
object TrainingPrep {

  private def docs(s: org.apache.spark.sql.SparkSession, dir: String) =
    Tables.load(s, dir, "documents")

  /** Deterministic stratified sampling: an exact per-language quota of
    * documents, ordered by a 48-bit md5-derived hash of the id (a
    * replayable pseudorandom permutation — the FineWeb/Dolma "sample by
    * hash of id" idiom, and 48 bits so the score is exact in a Double
    * AND a DuckDB BIGINT).
    *
    * Scale shape: per-stratum quota selection is top-k-by-hash, so it
    * runs on the typed [[TopK]] aggregator — map-side partial top-k
    * ships ≤ k rows per partition per language to the shuffle, where
    * the equivalent `row_number() OVER (PARTITION BY lang ORDER BY
    * hash)` would sort EVERY row of a language through one reducer.
    * The oracle states exactly that window form; TopK's (score desc,
    * id asc) tie order matches `ORDER BY h48, doc_id`. */
  val dStratifiedSample: Spec = Spec(
    "d_stratified_sample",
    oracle = Some("""
      WITH h AS (
        SELECT doc_id, lang,
          CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)),1,12) AS BIGINT) AS h48
        FROM documents),
      r AS (
        SELECT lang, doc_id, h48,
          row_number() OVER (PARTITION BY lang ORDER BY h48, doc_id) AS rk
        FROM h)
      SELECT lang, CAST(rk AS BIGINT) AS sample_rank, doc_id, h48
      FROM r WHERE rk <= 20 ORDER BY lang, sample_rank""")) { (s, dir) =>
    import s.implicits._
    graft.ops.Sampling.stratifiedByHash(docs(s, dir), "lang", "doc_id", k = 20)
      .orderBy($"lang", $"sample_rank")
  }

  /** Token-budget shard packing: assign documents to training shards of
    * ~`budget` tokens by a running token total per language (the
    * deterministic "pack in id order" variant of sequence packing —
    * shard boundaries fall wherever the cumulative count crosses a
    * budget multiple, so shard assignment is a pure function of the
    * corpus, reproducible across runs).
    *
    * The running sum is [[Skew.prefixSumByKey]] — range-partitioned
    * partials plus a broadcast offset merge — NOT a single-reducer
    * `SUM() OVER (PARTITION BY lang ...)` window: with a handful of
    * languages over 100 TB, a per-language window funnels billions of
    * rows through one task. The oracle states the window form;
    * TrainingPrepSpec pins the two forms equal. */
  val dShardPacking: Spec = Spec(
    "d_shard_packing",
    oracle = Some("""
      WITH t AS (
        SELECT doc_id, lang,
          CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
        FROM documents),
      c AS (
        SELECT doc_id, lang, n_tok,
          CAST(SUM(n_tok) OVER (PARTITION BY lang ORDER BY doc_id) AS BIGINT)
            AS cum_tokens
        FROM t)
      SELECT doc_id, lang, n_tok, cum_tokens,
        (cum_tokens - n_tok) // 400 AS shard_idx
      FROM c ORDER BY lang, doc_id""")) { (s, dir) =>
    import s.implicits._
    val budget = 400
    val withTok = docs(s, dir)
      .select($"doc_id", $"lang", Text.wordCount($"text").cast("long").as("n_tok"))
    Skew.prefixSumByKey(withTok, "lang", Seq($"doc_id"), $"n_tok", "cum_tokens")
      .withColumn("shard_idx", expr(s"(cum_tokens - n_tok) div $budget"))
      .select($"doc_id", $"lang", $"n_tok", $"cum_tokens", $"shard_idx")
      .orderBy($"lang", $"doc_id")
  }

  /** CURRICULUM packing: [[dShardPacking]] with a difficulty ordering —
    * shards fill in ascending-difficulty order (token count as the
    * standard easy-to-hard proxy, doc_id tiebreak) so early shards are
    * short-easy and late shards long-hard, the curriculum-learning
    * data layout. Same scale shape as dShardPacking (prefix sums ride
    * Skew.prefixSumByKey — range partials + broadcast offsets, no
    * per-language single-reducer window); the per-shard report pins
    * the monotone difficulty envelope (each shard's max_tok ≤ the
    * next's min_tok modulo the boundary doc). */
  val dCurriculumPacking: Spec = Spec(
    "d_curriculum_packing",
    oracle = Some("""
      WITH t AS (
        SELECT doc_id, lang,
          CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
        FROM documents),
      c AS (
        SELECT doc_id, lang, n_tok,
          CAST(SUM(n_tok) OVER (PARTITION BY lang ORDER BY n_tok, doc_id)
            AS BIGINT) AS cum_tokens
        FROM t),
      sh AS (SELECT lang, n_tok, (cum_tokens - n_tok) // 400 AS shard_idx
             FROM c)
      SELECT lang, CAST(shard_idx AS BIGINT) AS shard_idx,
        CAST(COUNT(*) AS BIGINT) AS n_docs,
        CAST(SUM(n_tok) AS BIGINT) AS sum_tok,
        CAST(MIN(n_tok) AS BIGINT) AS min_tok,
        CAST(MAX(n_tok) AS BIGINT) AS max_tok
      FROM sh GROUP BY lang, shard_idx
      ORDER BY lang, shard_idx""")) { (s, dir) =>
    import s.implicits._
    val budget = 400
    val withTok = docs(s, dir)
      .select($"doc_id", $"lang", Text.wordCount($"text").cast("long").as("n_tok"))
    Skew.prefixSumByKey(withTok, "lang", Seq($"n_tok", $"doc_id"),
        $"n_tok", "cum_tokens")
      .withColumn("shard_idx", expr(s"(cum_tokens - n_tok) div $budget"))
      .groupBy($"lang", $"shard_idx")
      .agg(count(lit(1)).as("n_docs"), sum($"n_tok").as("sum_tok"),
        min($"n_tok").as("min_tok"), max($"n_tok").as("max_tok"))
      .orderBy($"lang", $"shard_idx")
  }

  /** K-ANONYMITY audit at CELL granularity (training-data governance):
    * a document whose quasi-identifier combination — here (source,
    * lang, length bucket) — is shared by fewer than k corpus documents
    * is re-identifiable from those attributes alone. This is the
    * per-cell WORK LIST (which exact cells to suppress or generalize)
    * on the documents corpus, complementing q_kanonymity's
    * class-level summary with generalization levels and l-diversity on
    * the relational side. One hash agg over the corpus (map-side
    * combined), no joins. */
  val dKAnonymity: Spec = Spec(
    "d_k_anonymity",
    oracle = Some("""
      WITH q AS (
        SELECT source, lang,
          (len(string_split(text, ' ')) // 20) * 20 AS len_bucket
        FROM documents),
      c AS (SELECT source, lang, len_bucket,
              CAST(COUNT(*) AS BIGINT) AS n FROM q GROUP BY 1, 2, 3)
      SELECT source, lang, CAST(len_bucket AS BIGINT) AS len_bucket, n,
        (n < 5) AS below_k
      FROM c ORDER BY source, lang, len_bucket""")) { (s, dir) =>
    import s.implicits._
    docs(s, dir)
      .select($"source", $"lang",
        expr("(CAST(size(split(text, ' ')) AS BIGINT) div 20) * 20")
          .as("len_bucket"))
      .groupBy($"source", $"lang", $"len_bucket")
      .agg(count(lit(1)).as("n"))
      .select($"source", $"lang", $"len_bucket", $"n", ($"n" < 5).as("below_k"))
      .orderBy($"source", $"lang", $"len_bucket")
  }

  /** Context-window chunking: split each document into token windows of
    * `size` with stride `stride` (overlap = size - stride), the
    * pretraining/embedding-model "sliding context window" transform.
    * Emits one row per window with its token span and an md5 of the
    * window text (spans + hash keep the oracle compare narrow; the
    * text itself is `array_join(slice(...))` — same expression, wider).
    *
    * Pure per-row generate-and-explode: no shuffle at all until the
    * final presentation sort, so it scales embarrassingly. */
  val dChunkWindows: Spec = Spec(
    "d_chunk_windows",
    oracle = Some("""
      WITH t AS (
        SELECT doc_id, string_split(text, ' ') AS l
        FROM documents WHERE doc_id % 5 = 0),
      s AS (
        SELECT doc_id, l, len(l) AS n,
          unnest(range(0, len(l), 24)) AS st
        FROM t)
      SELECT doc_id, CAST(st // 24 AS BIGINT) AS chunk_idx,
        CAST(st AS BIGINT) AS start_tok,
        CAST(least(32, n - st) AS BIGINT) AS chunk_len,
        md5(array_to_string(l[st+1:st+32], ' ')) AS chunk_md5
      FROM s ORDER BY doc_id, chunk_idx""")) { (s, dir) =>
    import s.implicits._
    val (size32, stride) = (32, 24)
    docs(s, dir)
      .filter($"doc_id" % 5 === 0)
      .select($"doc_id", Text.tokens($"text").as("l"))
      .select($"doc_id", $"l", size($"l").as("n"),
        posexplode(sequence(lit(0), size($"l") - 1, lit(stride)))
          .as(Seq("chunk_idx", "st")))
      .select($"doc_id",
        $"chunk_idx".cast("long").as("chunk_idx"),
        $"st".cast("long").as("start_tok"),
        least(lit(size32), $"n" - $"st").cast("long").as("chunk_len"),
        md5(array_join(slice($"l", $"st" + 1, lit(size32)), " ")).as("chunk_md5"))
      .orderBy($"doc_id", $"chunk_idx")
  }

  /** Unigram-LM quality score (the CCNet idea with the corpus itself as
    * the LM): token log-probabilities under corpus unigram frequencies,
    * averaged per document — template/repetitive docs score high,
    * rare-token noise scores low. Per-token log10 is rounded to 6
    * places and summed as DECIMAL so the aggregation is
    * order-independent and hash-stable (Spec determinism rule 1); the
    * only double ops are one log10 and one final division, identical
    * per-value on both engines.
    *
    * Scale shape: vocab is a hash agg on the token; scoring is a hash
    * join on the same key (no broadcast assumption — a 100 TB corpus
    * vocabulary does not fit one executor); the doc roll-up re-shuffles
    * on doc_id. Three exchanges, all keyed, no driver state. */
  val dUnigramLmScore: Spec = Spec(
    "d_unigram_lm_score",
    oracle = Some("""
      WITH tok AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
      vocab AS (
        SELECT w, CAST(COUNT(*) AS BIGINT) AS c FROM tok GROUP BY w),
      tot AS (SELECT CAST(SUM(c) AS BIGINT) AS total FROM vocab),
      scored AS (
        SELECT tok.doc_id,
          CAST(round(log10(CAST(c AS DOUBLE) / CAST(total AS DOUBLE)), 6)
            AS DECIMAL(18,6)) AS lp
        FROM tok JOIN vocab ON tok.w = vocab.w CROSS JOIN tot)
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tok,
        FLOOR(CAST(SUM(lp) AS DOUBLE) / COUNT(*) * 1000000) / 1000000
          AS avg_logprob
      FROM scored GROUP BY doc_id ORDER BY doc_id""")) { (s, dir) =>
    import s.implicits._
    graft.ops.Quality.unigramLmScores(
        docs(s, dir).select($"doc_id", Text.tokens($"text").as("toks")),
        "doc_id", "toks")
      .orderBy($"doc_id")
  }

  /** Gopher-style composite quality rules (Rae et al. 2021 §A1.1, the
    * repetition-free subset): word count in [50, 100000], mean word
    * length in [3, 10], ≤30% of lines ending in an ellipsis, ≤90% of
    * lines starting with a bullet, symbol ratio < 0.4 — one boolean
    * keep decision from five metrics. Bullet / ellipsis lines are
    * injected deterministically so both decision branches occur.
    * All metrics are single divisions rounded to 6 places (no
    * order-dependent double sums). */
  val dGopherRules: Spec = Spec(
    "d_gopher_rules",
    oracle = Some("""
      WITH r AS (
        SELECT doc_id,
          text || chr(10) ||
          CASE WHEN doc_id % 3 = 0 THEN '• ' ELSE '' END ||
            substr(text, 31, 20) || chr(10) ||
          substr(text, 51, 15) ||
            CASE WHEN doc_id % 4 = 0 THEN '...' ELSE '.' END AS rich
        FROM documents),
      m AS (
        SELECT doc_id, rich,
          CAST(len(string_split(replace(rich, chr(10), ' '), ' ')) AS BIGINT)
            AS n_words,
          length(replace(replace(rich, ' ', ''), chr(10), '')) AS n_ch,
          CAST(len(list_filter(string_split(rich, chr(10)),
            x -> x LIKE '•%')) AS BIGINT) AS n_bullet,
          CAST(len(list_filter(string_split(rich, chr(10)),
            x -> x LIKE '%...')) AS BIGINT) AS n_ellip,
          CAST(len(string_split(rich, chr(10))) AS BIGINT) AS n_lines
        FROM r),
      f AS (
        SELECT doc_id, n_words,
          round(CAST(n_ch AS DOUBLE) / n_words, 6) AS mean_word_len,
          round(CAST(n_bullet AS DOUBLE) / n_lines, 6) AS bullet_frac,
          round(CAST(n_ellip AS DOUBLE) / n_lines, 6) AS ellipsis_frac,
          round(CAST(length(regexp_replace(rich, '[\p{L}\s]', '', 'g'))
            AS DOUBLE) / length(rich), 6) AS symbol_ratio
        FROM m)
      SELECT doc_id, n_words, mean_word_len, bullet_frac, ellipsis_frac,
        symbol_ratio,
        (n_words BETWEEN 50 AND 100000
         AND mean_word_len BETWEEN 3 AND 10
         AND ellipsis_frac <= 0.3 AND bullet_frac <= 0.9
         AND symbol_ratio < 0.4) AS gopher_keep
      FROM f ORDER BY doc_id""")) { (s, dir) =>
    import s.implicits._
    val rich = concat(
      $"text", lit("\n"),
      when($"doc_id" % 3 === 0, lit("• ")).otherwise(lit("")),
      substring($"text", 31, 20), lit("\n"),
      substring($"text", 51, 15),
      when($"doc_id" % 4 === 0, lit("...")).otherwise(lit(".")))
    val lines = split($"rich", "\n", -1)
    docs(s, dir)
      .withColumn("rich", rich)
      .select($"doc_id", $"rich",
        Text.wordCount(regexp_replace($"rich", "\n", " ")).cast("long")
          .as("n_words"),
        length(regexp_replace($"rich", "[ \n]", "")).as("n_ch"),
        org.apache.spark.sql.functions.size(
          filter(lines, x => x.startsWith("•"))).cast("long").as("n_bullet"),
        org.apache.spark.sql.functions.size(
          filter(lines, x => x.endsWith("..."))).cast("long").as("n_ellip"),
        org.apache.spark.sql.functions.size(lines).cast("long").as("n_lines"))
      .select($"doc_id", $"n_words",
        round($"n_ch".cast("double") / $"n_words", 6).as("mean_word_len"),
        round($"n_bullet".cast("double") / $"n_lines", 6).as("bullet_frac"),
        round($"n_ellip".cast("double") / $"n_lines", 6).as("ellipsis_frac"),
        round(Text.charClassOutRatio($"rich", "[\\p{L}\\s]"), 6)
          .as("symbol_ratio"),
        ($"n_words".between(50, 100000) &&
          round($"n_ch".cast("double") / $"n_words", 6).between(3, 10) &&
          round($"n_ellip".cast("double") / $"n_lines", 6) <= 0.3 &&
          round($"n_bullet".cast("double") / $"n_lines", 6) <= 0.9 &&
          round(Text.charClassOutRatio($"rich", "[\\p{L}\\s]"), 6) < 0.4)
          .as("gopher_keep"))
      .orderBy($"doc_id")
  }

  /** TF-IDF top terms per document (the classic salient-term extractor
    * for corpus exploration / topic labeling): tf from a per-doc hash
    * agg, df from a token-key hash agg, idf = log10(N/df) rounded to
    * 6dp, and the score kept in DECIMAL (integer tf × 6dp idf) so
    * ranking ties are exact on both engines. Top-3 per doc via a
    * row_number window PARTITIONED BY doc_id — the partition key is
    * the highest-cardinality column there is, so the window scales
    * (unlike a per-corpus rank). Tie order (score desc, term asc) is
    * total. */
  val dTfidfTopTerms: Spec = Spec(
    "d_tfidf_top_terms",
    oracle = Some("""
      WITH tok AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS w
        FROM documents WHERE doc_id % 4 = 0),
      tf AS (
        SELECT doc_id, w, CAST(COUNT(*) AS BIGINT) AS tf
        FROM tok GROUP BY doc_id, w),
      df AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY w),
      n AS (SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS nd FROM tok),
      sc AS (
        SELECT doc_id, w, tf,
          CAST(tf AS DECIMAL(18,6)) *
            CAST(round(log10(CAST(nd AS DOUBLE) / df), 6) AS DECIMAL(18,6))
            AS score
        FROM tf JOIN df USING (w) CROSS JOIN n),
      r AS (
        SELECT doc_id, w, tf, score,
          row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, w) AS rk
        FROM sc)
      SELECT doc_id, CAST(rk AS BIGINT) AS rk, w AS term, tf,
        CAST(score AS DOUBLE) AS tfidf
      FROM r WHERE rk <= 3 ORDER BY doc_id, rk""")) { (s, dir) =>
    import s.implicits._
    val tok = docs(s, dir).filter($"doc_id" % 4 === 0)
      .select($"doc_id", explode(Text.tokens($"text")).as("w"))
    val tf = tok.groupBy($"doc_id", $"w").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy($"w").agg(count(lit(1)).as("df"))
    val nd = tok.agg(countDistinct($"doc_id").as("nd"))
    tf.join(df, "w")
      .crossJoin(broadcast(nd))
      .withColumn("score",
        $"tf".cast("decimal(18,6)") *
          round(log10($"nd".cast("double") / $"df"), 6).cast("decimal(18,6)"))
      .withColumn("rk",
        row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy($"doc_id").orderBy($"score".desc, $"w")))
      .filter($"rk" <= 3)
      .select($"doc_id", $"rk".cast("long").as("rk"), $"w".as("term"),
        $"tf", $"score".cast("double").as("tfidf"))
      .orderBy($"doc_id", $"rk")
  }

  /** Mixture (temperature) sampling: cap each language at a fixed
    * token budget, taking documents in deterministic 48-bit-hash order
    * until the budget is exhausted — the multilingual-training
    * "rebalance the language mixture" step (capping head languages is
    * exactly how temperature-flattened mixtures are materialized). A
    * document is kept if it STARTS before the budget line, so the
    * sample slightly overshoots rather than undershoots — a defined,
    * replayable boundary rule. Running totals come from
    * [[Skew.prefixSumByKey]] (no single-reducer per-language window);
    * the oracle states the window form. */
  val dMixtureSample: Spec = Spec(
    "d_mixture_sample",
    oracle = Some("""
      WITH h AS (
        SELECT doc_id, lang,
          CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
          CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)),1,12) AS BIGINT) AS h48
        FROM documents),
      c AS (
        SELECT doc_id, lang, n_tok, h48,
          CAST(SUM(n_tok) OVER (PARTITION BY lang ORDER BY h48, doc_id)
            AS BIGINT) AS cum_tokens
        FROM h)
      SELECT lang, doc_id, n_tok, cum_tokens
      FROM c WHERE cum_tokens - n_tok < 1500
      ORDER BY lang, cum_tokens""")) { (s, dir) =>
    import s.implicits._
    val withTok = docs(s, dir)
      .select($"doc_id", $"lang", Text.wordCount($"text").cast("long").as("n_tok"))
    graft.ops.Sampling.tokenBudgetByHash(withTok, "lang", "doc_id", "n_tok",
        budget = 1500)
      .select($"lang", $"doc_id", $"n_tok", $"cum_tokens")
      .orderBy($"lang", $"cum_tokens")
  }

  /** TEMPERATURE (τ = 1/2) mixture rates + sample
    * ([[graft.ops.Sampling.temperatureQuotas]]) — the XLM-R/mT5
    * rebalance that [[dMixtureSample]]'s budget capping approximates:
    * quotas ∝ √nᵢ computed in pure integers (√ is IEEE-exact, the one
    * temperature that keeps the whole rate computation float-free),
    * sample = the quota smallest-hash48 ids per source via the bounded
    * TopK aggregator. Source sizes are made non-uniform
    * deterministically (per-source doc_id modulus) so the upsampling
    * is observable; the per-source sample md5 pins membership, not
    * just counts. */
  val dTemperatureMix: Spec = Spec(
    "d_temperature_mix",
    oracle = Some("""
      WITH e2 AS (
        SELECT doc_id, source FROM (
          SELECT doc_id, source,
            CAST(substr(source, 4) AS INT) % 4 AS g
          FROM documents)
        WHERE (doc_id // 20) % (1 + g) = 0),
      c AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
              CAST(round(sqrt(COUNT(*)) * 1000000) AS BIGINT) AS m
            FROM e2 GROUP BY source),
      s AS (SELECT SUM(m) AS m_sum FROM c),
      q AS (SELECT source, n_docs,
              CAST((1000000 * m) // m_sum AS BIGINT) AS weight_micro,
              CAST(LEAST(n_docs, (60 * m) // m_sum) AS BIGINT) AS quota
            FROM c, s),
      h AS (SELECT doc_id, source,
              CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)),1,12) AS BIGINT)
                AS h48
            FROM e2),
      r AS (SELECT source, doc_id, h48,
              row_number() OVER (PARTITION BY source ORDER BY h48, doc_id)
                AS rk
            FROM h),
      k AS (SELECT r.source, r.doc_id, q.n_docs, q.weight_micro, q.quota
            FROM r JOIN q ON q.source = r.source WHERE r.rk <= q.quota)
      SELECT source, n_docs, weight_micro, quota,
        CAST(COUNT(*) AS BIGINT) AS n_sampled,
        md5(string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id))
          AS sample_md5
      FROM k GROUP BY source, n_docs, weight_micro, quota
      ORDER BY source""")) { (s, dir) =>
    import s.implicits._
    val eligible = docs(s, dir)
      .select($"doc_id", $"source",
        (substring($"source", 4, 10).cast("int") % 4).as("g"))
      // within-source index (source = doc_id % 20, so div 20 counts a
      // source's docs 0,1,2,…): every source stays populated, sizes
      // differ by g — non-uniform but never empty
      .filter(expr("(doc_id div 20)") % (lit(1) + $"g") === 0)
      .select($"doc_id", $"source")
    graft.ops.Sampling.temperatureQuotas(eligible, "source", "doc_id",
        budget = 60L)
      .groupBy($"source", $"n_docs", $"weight_micro", $"quota")
      .agg(count(lit(1)).as("n_sampled"),
        md5(array_join(transform(array_sort(collect_list($"doc_id")),
          _.cast("string")), ",")).as("sample_md5"))
      .orderBy($"source")
  }

  /** Adaptive length-outlier trim: flag documents outside the corpus'
    * own [1/16, 15/16] token-length quantiles (data-driven thresholds,
    * the robust alternative to Gopher's fixed word-count band — the
    * RefinedWeb/CCNet practice of trimming per-corpus length tails).
    * Quantiles are DYADIC fractions so Spark `percentile` and DuckDB
    * `quantile_cont` interpolate bit-identically (the
    * q_quantity_percentiles rule); the two-row threshold aggregate is
    * broadcast under a cross join — the corpus side never shuffles. */
  val dLengthOutliers: Spec = Spec(
    "d_length_outliers",
    oracle = Some("""
      WITH t AS (
        SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
        FROM documents),
      p AS (
        SELECT ROUND(quantile_cont(n_tok, 0.0625), 6) AS lo,
               ROUND(quantile_cont(n_tok, 0.9375), 6) AS hi
        FROM t)
      SELECT doc_id, n_tok, lo, hi,
        (n_tok >= lo AND n_tok <= hi) AS within_band
      FROM t CROSS JOIN p ORDER BY doc_id""")) { (s, dir) =>
    import s.implicits._
    val t = docs(s, dir)
      .select($"doc_id", Text.wordCount($"text").cast("long").as("n_tok"))
    val p = t.agg(
      round(percentile($"n_tok", lit(0.0625)), 6).as("lo"),
      round(percentile($"n_tok", lit(0.9375)), 6).as("hi"))
    t.crossJoin(broadcast(p))
      .select($"doc_id", $"n_tok", $"lo", $"hi",
        ($"n_tok" >= $"lo" && $"n_tok" <= $"hi").as("within_band"))
      .orderBy($"doc_id")
  }

  /** Corpus profiling ([[graft.ops.Profile.profileColumns]]): the
    * ANALYZE-style QA report — null/distinct/min/max/mean-length per
    * column in one scan (multi-distinct plans as a single Expand
    * pass). */
  val dProfileColumns: Spec = Spec(
    "d_profile_columns",
    oracle = Some("""
      WITH p AS (
        SELECT 'doc_id' AS column_name, CAST(COUNT(*) AS BIGINT) AS n_rows,
          CAST(COUNT(*) - COUNT(doc_id) AS BIGINT) AS n_nulls,
          CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_distinct,
          CAST(MIN(doc_id) AS VARCHAR) AS min_val,
          CAST(MAX(doc_id) AS VARCHAR) AS max_val,
          round(AVG(length(CAST(doc_id AS VARCHAR))), 6) AS avg_len
        FROM documents
        UNION ALL
        SELECT 'lang', CAST(COUNT(*) AS BIGINT),
          CAST(COUNT(*) - COUNT(lang) AS BIGINT),
          CAST(COUNT(DISTINCT lang) AS BIGINT),
          MIN(lang), MAX(lang), round(AVG(length(lang)), 6)
        FROM documents
        UNION ALL
        SELECT 'source', CAST(COUNT(*) AS BIGINT),
          CAST(COUNT(*) - COUNT(source) AS BIGINT),
          CAST(COUNT(DISTINCT source) AS BIGINT),
          MIN(source), MAX(source), round(AVG(length(source)), 6)
        FROM documents
        UNION ALL
        SELECT 'n_chars', CAST(COUNT(*) AS BIGINT),
          CAST(COUNT(*) - COUNT(n_chars) AS BIGINT),
          CAST(COUNT(DISTINCT n_chars) AS BIGINT),
          CAST(MIN(n_chars) AS VARCHAR), CAST(MAX(n_chars) AS VARCHAR),
          round(AVG(length(CAST(n_chars AS VARCHAR))), 6)
        FROM documents)
      SELECT * FROM p ORDER BY column_name""")) { (s, dir) =>
    import s.implicits._
    graft.ops.Profile.profileColumns(docs(s, dir),
        Seq("doc_id", "lang", "source", "n_chars"))
      .orderBy($"column_name")
  }

  /** Per-language Zipf fit: least-squares slope of log10(freq) over
    * log10(rank) on the token frequency table — the standard
    * distribution-health check for a text corpus (natural language
    * ≈ −1; templated/synthetic corpora drift). Hash-stable least
    * squares: each (x, y) is rounded to 6dp and lifted to DECIMAL, so
    * Σx, Σy, Σxy, Σx² are exact in any aggregation order; the only
    * end-of-plan doubles are the closed-form divisions. The window
    * ranks the DISTINCT-TOKEN table (vocab-sized, orders of magnitude
    * below the corpus), which keeps the per-language sort bounded even
    * at 100 TB corpus scale. */
  val dZipfSlope: Spec = Spec(
    "d_zipf_slope",
    oracle = Some("""
      WITH tok AS (
        SELECT lang, unnest(string_split(text, ' ')) AS w FROM documents),
      freq AS (
        SELECT lang, w, CAST(COUNT(*) AS BIGINT) AS c
        FROM tok GROUP BY lang, w),
      ranked AS (
        SELECT lang, c,
          row_number() OVER (PARTITION BY lang ORDER BY c DESC, w) AS rk
        FROM freq),
      pts AS (
        SELECT lang,
          CAST(round(log10(CAST(rk AS DOUBLE)), 6) AS DECIMAL(18,6)) AS x,
          CAST(round(log10(CAST(c AS DOUBLE)), 6) AS DECIMAL(18,6)) AS y
        FROM ranked),
      s AS (
        SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_types,
          SUM(x) AS sx, SUM(y) AS sy, SUM(x*y) AS sxy, SUM(x*x) AS sxx
        FROM pts GROUP BY lang)
      SELECT lang, n_types,
        round((n_types * CAST(sxy AS DOUBLE) -
               CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
              (n_types * CAST(sxx AS DOUBLE) -
               CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6) AS zipf_slope
      FROM s ORDER BY lang""")) { (s, dir) =>
    import s.implicits._
    val freq = docs(s, dir)
      .select($"lang", explode(Text.tokens($"text")).as("w"))
      .groupBy($"lang", $"w").agg(count(lit(1)).as("c"))
    val ranked = freq.withColumn("rk",
      row_number().over(org.apache.spark.sql.expressions.Window
        .partitionBy($"lang").orderBy($"c".desc, $"w")))
    val pts = ranked.select($"lang",
      round(log10($"rk".cast("double")), 6).cast("decimal(18,6)").as("x"),
      round(log10($"c".cast("double")), 6).cast("decimal(18,6)").as("y"))
    pts.groupBy($"lang")
      .agg(count(lit(1)).as("n_types"),
        sum($"x").as("sx"), sum($"y").as("sy"),
        sum($"x" * $"y").as("sxy"), sum($"x" * $"x").as("sxx"))
      .select($"lang", $"n_types",
        round(($"n_types" * $"sxy".cast("double") -
            $"sx".cast("double") * $"sy".cast("double")) /
          ($"n_types" * $"sxx".cast("double") -
            $"sx".cast("double") * $"sx".cast("double")), 6).as("zipf_slope"))
      .orderBy($"lang")
  }

  /** Distribution-drift monitor (Population Stability Index between
    * two corpus slices over length deciles — the standard "did this
    * batch change shape" check between crawl snapshots). Per-bin
    * shares are single rounded divisions; each PSI term is rounded to
    * 6dp and lifted to DECIMAL before the total, so the sum is
    * aggregation-order-independent. Empty bins take the standard 1e-4
    * floor. The slices here are doc_id parity — the same query runs
    * against any two snapshot frames. */
  val dDriftPsi: Spec = Spec(
    "d_drift_psi",
    oracle = Some("""
      WITH b AS (
        SELECT doc_id % 2 AS slice,
          least(9, greatest(0, (n_chars - 48) // 51)) AS bin
        FROM documents),
      c AS (SELECT slice, bin, CAST(COUNT(*) AS BIGINT) AS n
            FROM b GROUP BY slice, bin),
      t AS (SELECT slice, CAST(SUM(n) AS BIGINT) AS tot FROM c GROUP BY slice),
      p AS (
        SELECT bin,
          COALESCE(MAX(CASE WHEN slice = 0
            THEN round(CAST(n AS DOUBLE) / tot, 6) END), 0.0001) AS p0,
          COALESCE(MAX(CASE WHEN slice = 1
            THEN round(CAST(n AS DOUBLE) / tot, 6) END), 0.0001) AS p1
        FROM c JOIN t USING (slice) GROUP BY bin),
      terms AS (
        SELECT bin, p0, p1,
          CAST(round((p0 - p1) * ln(p0 / p1), 6) AS DECIMAL(18,6)) AS term
        FROM p)
      SELECT CAST(bin AS BIGINT) AS bin, p0, p1,
        CAST(term AS DOUBLE) AS psi_term,
        CAST(SUM(term) OVER () AS DOUBLE) AS psi_total
      FROM terms ORDER BY bin""")) { (s, dir) =>
    import s.implicits._
    val b = docs(s, dir).select(($"doc_id" % 2).as("slice"),
      least(lit(9), greatest(lit(0), expr("(n_chars - 48) div 51"))).as("bin"))
    val c = b.groupBy($"slice", $"bin").agg(count(lit(1)).as("n"))
    val t = c.groupBy($"slice").agg(sum($"n").as("tot"))
    val p = c.join(broadcast(t), "slice")
      .groupBy($"bin")
      .agg(
        coalesce(max(when($"slice" === 0,
          round($"n".cast("double") / $"tot", 6))), lit(0.0001)).as("p0"),
        coalesce(max(when($"slice" === 1,
          round($"n".cast("double") / $"tot", 6))), lit(0.0001)).as("p1"))
    val terms = p.withColumn("term",
      round(($"p0" - $"p1") * log($"p0" / $"p1"), 6).cast("decimal(18,6)"))
    // psi_total via the broadcast-scalar idiom (10-bin frame, but keep
    // WindowExec warnings meaningful repo-wide)
    val tot = broadcast(terms.agg(sum($"term").as("_psi_total")))
    terms.crossJoin(tot)
      .select($"bin".cast("long").as("bin"), $"p0", $"p1",
        $"term".cast("double").as("psi_term"),
        $"_psi_total".cast("double").as("psi_total"))
      .orderBy($"bin")
  }

  /** Pairwise-source Jensen–Shannon divergence over the length-bin
    * distribution — the symmetric, bounded ([0, ln 2]) companion of
    * d_drift_psi's two-slice PSI: one number per SOURCE PAIR saying how
    * differently two sources are shaped, the matrix read before
    * weighting a mixture. Zero bins need no floor: the 0·ln0 = 0
    * convention is exact in both engines via the CASE guard, because
    * JS compares each side against the mixture m = (p+q)/2, which is
    * nonzero wherever either side is.
    *
    * Scale shape: histograms are one (source, bin)-keyed agg; the pair
    * join runs on the DENSE source×10-bin grid (sources × 10 rows —
    * tiny at any corpus size, the corpus scan happens once); per-bin
    * terms round at 6dp and sum as DECIMAL (order-free). */
  val dSourceDivergence: Spec = Spec(
    "d_source_divergence",
    oracle = Some("""
      WITH b AS (
        SELECT source, least(9, greatest(0, (n_chars - 48) // 51)) AS bin
        FROM documents),
      c AS (SELECT source, bin, CAST(COUNT(*) AS BIGINT) AS n
            FROM b GROUP BY source, bin),
      t AS (SELECT source, CAST(SUM(n) AS BIGINT) AS tot FROM c GROUP BY source),
      grid AS (SELECT source, unnest(range(0, 10)) AS bin
        FROM (SELECT DISTINCT source FROM documents)),
      p AS (SELECT grid.source, grid.bin,
          COALESCE(round(CAST(c.n AS DOUBLE) / t.tot, 6), 0.0) AS p
        FROM grid LEFT JOIN c ON c.source = grid.source AND c.bin = grid.bin
        JOIN t ON t.source = grid.source),
      pair AS (SELECT a.source AS source_a, b.source AS source_b,
          a.p AS pa, b.p AS pb, (a.p + b.p) / 2 AS m
        FROM p a JOIN p b ON a.bin = b.bin AND a.source < b.source),
      terms AS (SELECT source_a, source_b,
          CAST(round(0.5 * (CASE WHEN pa > 0 THEN pa * ln(pa / m) ELSE 0 END)
                   + 0.5 * (CASE WHEN pb > 0 THEN pb * ln(pb / m) ELSE 0 END), 6)
            AS DECIMAL(18,6)) AS term
        FROM pair)
      SELECT source_a, source_b, CAST(SUM(term) AS DOUBLE) AS js_divergence
      FROM terms GROUP BY source_a, source_b
      ORDER BY source_a, source_b""")) { (s, dir) =>
    import s.implicits._
    val b = docs(s, dir).select($"source",
      least(lit(9), greatest(lit(0), expr("(n_chars - 48) div 51"))).as("bin"))
    val c = b.groupBy($"source", $"bin").agg(count(lit(1)).as("n"))
    val t = c.groupBy($"source").agg(sum($"n").as("tot"))
    val grid = docs(s, dir).select($"source").distinct()
      .select($"source", explode(sequence(lit(0L), lit(9L))).as("bin"))
    val p = grid
      .join(c, Seq("source", "bin"), "left")
      .join(broadcast(t), Seq("source"))
      .select($"source", $"bin",
        coalesce(round($"n".cast("double") / $"tot", 6), lit(0.0)).as("p"))
    val a = p.select($"source".as("source_a"), $"bin", $"p".as("pa"))
    val bb = p.select($"source".as("source_b"), $"bin", $"p".as("pb"))
    val ta = when($"pa" > 0, $"pa" * log($"pa" / $"m")).otherwise(lit(0.0))
    val tb = when($"pb" > 0, $"pb" * log($"pb" / $"m")).otherwise(lit(0.0))
    a.join(bb, Seq("bin")).filter($"source_a" < $"source_b")
      .withColumn("m", ($"pa" + $"pb") / 2)
      .withColumn("term",
        round(lit(0.5) * ta + lit(0.5) * tb, 6).cast("decimal(18,6)"))
      .groupBy($"source_a", $"source_b")
      .agg(sum($"term").cast("double").as("js_divergence"))
      .orderBy($"source_a", $"source_b")
  }

  /** Distribution-matching resampler (the DoReMi-lite shape step):
    * downsample over-represented length bins toward a UNIFORM target
    * by deterministic hash acceptance — doc accepted iff
    * hash48(doc_id) < floor(min(1, target/actual)·2⁴⁸), so the sample
    * is replayable, per-row decidable (no shuffle beyond the bin
    * histogram), and the acceptance threshold is an exact integer both
    * engines derive from the same 6dp-rounded bin probability. The
    * report gives per-bin doc counts, accepted counts, and the
    * acceptance rate — the knob table for reshaping a corpus before
    * mixing. */
  val dDistributionMatch: Spec = Spec(
    "d_distribution_match",
    oracle = Some("""
      WITH b AS (
        SELECT doc_id, least(9, greatest(0, (n_chars - 48) // 51)) AS bin
        FROM documents),
      c AS (SELECT bin, CAST(COUNT(*) AS BIGINT) AS n FROM b GROUP BY bin),
      nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS total FROM documents),
      a AS (SELECT bin, n,
          least(1.0::DOUBLE, 0.1::DOUBLE / round(CAST(n AS DOUBLE) / total, 6))
            AS acc
        FROM c CROSS JOIN nn),
      thr AS (SELECT bin, n, acc,
          CAST(floor(acc * 281474976710656.0) AS BIGINT) AS t FROM a),
      acc AS (SELECT b.bin, COUNT(*) AS n_accepted
        FROM b JOIN thr ON thr.bin = b.bin
        WHERE CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12) AS BIGINT)
          < thr.t
        GROUP BY b.bin)
      SELECT CAST(thr.bin AS BIGINT) AS bin, thr.n AS n_docs,
        CAST(COALESCE(acc.n_accepted, 0) AS BIGINT) AS n_accepted,
        ROUND(thr.acc, 6) AS acceptance
      FROM thr LEFT JOIN acc ON acc.bin = thr.bin
      ORDER BY bin""")) { (s, dir) =>
    import s.implicits._
    val bin = least(lit(9), greatest(lit(0), expr("(n_chars - 48) div 51")))
    val b = docs(s, dir).select($"doc_id", bin.as("bin"))
    val c = b.groupBy($"bin").agg(count(lit(1)).as("n"))
    val nn = broadcast(docs(s, dir).agg(count(lit(1)).as("total")))
    val thr = c.crossJoin(nn)
      .select($"bin", $"n",
        least(lit(1.0), lit(0.1) /
          round($"n".cast("double") / $"total", 6)).as("acc"))
      .withColumn("t", floor($"acc" * lit(281474976710656.0d)).cast("long"))
    val accepted = b
      .join(broadcast(thr), Seq("bin"))
      .filter(Sampling.hash48($"doc_id") < $"t")
      .groupBy($"bin").agg(count(lit(1)).as("n_accepted"))
    thr.join(accepted, Seq("bin"), "left")
      .select($"bin".cast("long").as("bin"), $"n".as("n_docs"),
        coalesce($"n_accepted", lit(0L)).cast("long").as("n_accepted"),
        round($"acc", 6).as("acceptance"))
      .orderBy($"bin")
  }

  /** Heavy hitters ([[graft.ops.HeavyHitters]]): tokens above 1/20 of
    * the stream via a mergeable Misra–Gries summary + exact recount —
    * the result is EXACT (the MG invariant guarantees recall of every
    * item over threshold; the second pass restores true counts), so
    * the oracle states plain GROUP BY/HAVING semantics while the plan
    * ships ≤ k counters per partition instead of a vocabulary-wide
    * aggregation. A hot token (planted ×8 per doc) sits above the
    * threshold; a warm one (×2) sits below it, pinning the boundary. */
  val dHeavyHitters: Spec = Spec(
    "d_heavy_hitters",
    oracle = Some("""
      WITH tok AS (
        SELECT unnest(string_split(text, ' ')) AS tok FROM documents
        UNION ALL
        SELECT 'hotword' FROM documents CROSS JOIN unnest(range(0, 8))
        UNION ALL
        SELECT 'warmword' FROM documents CROSS JOIN unnest(range(0, 2))),
      t AS (SELECT CAST(COUNT(*) AS BIGINT) AS total FROM tok),
      c AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS n FROM tok GROUP BY tok)
      SELECT tok, n, (SELECT total FROM t) AS total
      FROM c WHERE n * 20 > (SELECT total FROM t) ORDER BY tok""")) { (s, dir) =>
    import s.implicits._
    val d = docs(s, dir)
    val toks = d.select(explode(Text.tokens($"text")).as("tok"))
      .unionAll(d.select(explode(array((0 until 8).map(_ => lit("hotword")): _*))
        .as("tok")))
      .unionAll(d.select(explode(array(lit("warmword"), lit("warmword")))
        .as("tok")))
    graft.ops.HeavyHitters.exactOverThreshold(toks, "tok", k = 20)
      .orderBy($"tok")
  }

  /** Sequence-packing segment manifest: the trainer-consumable form of
    * [[dShardPacking]] — for every packed sequence, each member
    * document's in-sequence token offset (where its attention-mask
    * boundary falls). seg_offset = doc's running-total start minus the
    * sequence's first start; the extra window partitions by
    * (lang, sequence) — cardinality grows with the corpus, so no
    * reducer hot-spots. Pure integer arithmetic end to end. */
  val dSequenceSegments: Spec = Spec(
    "d_sequence_segments",
    oracle = Some("""
      WITH t AS (
        SELECT doc_id, lang,
          CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
        FROM documents),
      c AS (
        SELECT doc_id, lang, n_tok,
          CAST(SUM(n_tok) OVER (PARTITION BY lang ORDER BY doc_id)
            AS BIGINT) AS cum
        FROM t),
      sh AS (
        SELECT doc_id, lang, n_tok, cum - n_tok AS cb,
          (cum - n_tok) // 400 AS seq_idx
        FROM c),
      o AS (
        SELECT lang, seq_idx, doc_id, n_tok,
          cb - MIN(cb) OVER (PARTITION BY lang, seq_idx) AS seg_offset
        FROM sh)
      SELECT lang, CAST(seq_idx AS BIGINT) AS seq_idx, doc_id,
        CAST(seg_offset AS BIGINT) AS seg_offset, n_tok
      FROM o ORDER BY lang, seq_idx, seg_offset""")) { (s, dir) =>
    import s.implicits._
    val budget = 400
    val withTok = docs(s, dir)
      .select($"doc_id", $"lang", Text.wordCount($"text").cast("long").as("n_tok"))
    val packed = Skew
      .prefixSumByKey(withTok, "lang", Seq($"doc_id"), $"n_tok", "cum")
      .withColumn("cb", $"cum" - $"n_tok")
      .withColumn("seq_idx", expr(s"cb div $budget"))
    packed
      .withColumn("seg_offset",
        $"cb" - min($"cb").over(org.apache.spark.sql.expressions.Window
          .partitionBy($"lang", $"seq_idx")))
      .select($"lang", $"seq_idx".cast("long").as("seq_idx"), $"doc_id",
        $"seg_offset".cast("long").as("seg_offset"), $"n_tok")
      .orderBy($"lang", $"seq_idx", $"seg_offset")
  }

  /** KMV (k-minimum-values) distinct-count sketch over the corpus
    * vocabulary — unlike HLL (q_approx_sketches, no-oracle by nature)
    * the KMV estimate is a DETERMINISTIC function of the md5 hash
    * values, so the oracle replays it exactly: estimate =
    * (k−1)·2⁴⁸ / (k-th smallest distinct 48-bit hash). Mergeable by
    * construction (union partial k-min sets, re-take k) — here the
    * shuffle carries only the distinct hash column and the k-min is a
    * TakeOrdered (per-partition top-k + driver merge), never a global
    * sort. Exact distinct shipped alongside so the row also documents
    * the sketch's error at this scale. */
  val dKmvDistinct: Spec = Spec(
    "d_kmv_distinct",
    oracle = Some("""
      WITH tok AS (SELECT DISTINCT unnest(string_split(text, ' ')) AS tok
                   FROM documents),
      h AS (SELECT DISTINCT CAST('0x' || substr(md5(tok), 1, 12) AS BIGINT) AS hv
            FROM tok),
      km AS (SELECT hv FROM h ORDER BY hv LIMIT 64)
      SELECT CAST(64 AS BIGINT) AS k, MAX(hv) AS kth_min,
        ROUND(63 * 281474976710656.0 / MAX(hv), 6) AS est_distinct,
        (SELECT CAST(COUNT(*) AS BIGINT) FROM h) AS exact_distinct
      FROM km""")) { (s, dir) =>
    import s.implicits._
    val hv = docs(s, dir)
      .select(explode(Text.tokens($"text")).as("tok"))
      .select(conv(substring(md5($"tok"), 1, 12), 16, 10)
        .cast("long").as("hv"))
      .distinct()
      .localCheckpoint() // one vocab hash: k-min and exact count share it
    val kmin = hv.orderBy($"hv").limit(64)
    kmin
      .agg(max($"hv").as("kth_min"))
      .select(lit(64L).as("k"), $"kth_min",
        round(lit(63) * lit(281474976710656.0) / $"kth_min", 6)
          .as("est_distinct"))
      .crossJoin(broadcast(hv.agg(count(lit(1)).as("exact_distinct"))))
  }

  /** KMV SET OPERATIONS: size estimates for the union and intersection
    * of two vocabularies (bigram sets of the doc_id-parity halves) from
    * their k-minimum-values sketches — the mergeability story that
    * makes KMV the cross-shard distinct workhorse: union = merge k-min
    * sets and re-take k; intersection = (matching fraction of the
    * union sketch) × union estimate. Like [[dKmvDistinct]], every
    * estimate is a DETERMINISTIC function of md5 hashes, so the oracle
    * replays sketch AND exact values — the output row carries its own
    * error report (~10% at k=64 here).
    *
    * Scale shape: one explode → distinct (grp, hash) — the only
    * corpus-scale agg; each k-min is a TakeOrdered; membership checks
    * are semi-joins over 64-row frames. */
  val dKmvSetops: Spec = Spec(
    "d_kmv_setops",
    oracle = Some("""
      WITH t AS (SELECT doc_id % 2 AS grp, string_split(text,' ') AS l FROM documents),
      g AS (SELECT grp, unnest(list_transform(range(1, greatest(len(l), 1)),
              i -> array_to_string(l[i:i+1], ' '))) AS gram
            FROM t WHERE len(l) >= 2),
      h AS (SELECT DISTINCT grp, CAST('0x' || substr(md5(gram), 1, 12) AS BIGINT) AS hv
            FROM g),
      ka AS (SELECT hv FROM h WHERE grp = 0 ORDER BY hv LIMIT 64),
      kb AS (SELECT hv FROM h WHERE grp = 1 ORDER BY hv LIMIT 64),
      ku AS (SELECT DISTINCT hv FROM (SELECT hv FROM ka UNION ALL SELECT hv FROM kb)
             ORDER BY hv LIMIT 64),
      ii AS (SELECT CAST(COUNT(*) AS BIGINT) AS ni FROM ku
             WHERE hv IN (SELECT hv FROM ka) AND hv IN (SELECT hv FROM kb)),
      ea AS (SELECT COUNT(*) AS xa FROM h WHERE grp = 0),
      eb AS (SELECT COUNT(*) AS xb FROM h WHERE grp = 1),
      eu AS (SELECT COUNT(DISTINCT hv) AS xu FROM h),
      exi AS (SELECT COUNT(*) AS xi FROM
        (SELECT hv FROM h WHERE grp = 0) a
        JOIN (SELECT hv FROM h WHERE grp = 1) b USING (hv)),
      est AS (SELECT
        round(63 * 281474976710656.0 / (SELECT MAX(hv) FROM ka), 6) AS est_a,
        round(63 * 281474976710656.0 / (SELECT MAX(hv) FROM kb), 6) AS est_b,
        round(63 * 281474976710656.0 / (SELECT MAX(hv) FROM ku), 6) AS est_union)
      SELECT est_a, est_b, est_union,
        round(ii.ni / 64.0 * est_union, 6) AS est_intersection,
        CAST(ea.xa AS BIGINT) AS exact_a, CAST(eb.xb AS BIGINT) AS exact_b,
        CAST(eu.xu AS BIGINT) AS exact_union,
        CAST(exi.xi AS BIGINT) AS exact_intersection
      FROM est CROSS JOIN ii CROSS JOIN ea CROSS JOIN eb
      CROSS JOIN eu CROSS JOIN exi""")) { (s, dir) =>
    import s.implicits._
    val t = docs(s, dir)
      .select(($"doc_id" % 2).as("grp"), Text.tokens($"text").as("l"))
    val h = t.filter(size($"l") >= 2)
      .select($"grp", explode(expr(
        "transform(sequence(0, size(l) - 2), i -> concat_ws(' ', slice(l, i + 1, 2)))"))
        .as("gram"))
      .select($"grp",
        conv(substring(md5($"gram"), 1, 12), 16, 10).cast("long").as("hv"))
      .distinct()
      .localCheckpoint() // sketches + exact counts share one vocab hash
    val ka = h.filter($"grp" === 0).select($"hv").orderBy($"hv").limit(64)
      .localCheckpoint()
    val kb = h.filter($"grp" === 1).select($"hv").orderBy($"hv").limit(64)
      .localCheckpoint()
    val ku = ka.union(kb).distinct().orderBy($"hv").limit(64).localCheckpoint()
    val scale = 281474976710656.0 // 2^48
    val est = ka.agg(max($"hv").as("ma")).crossJoin(kb.agg(max($"hv").as("mb")))
      .crossJoin(ku.agg(max($"hv").as("mu")))
      .select(round(lit(63) * scale / $"ma", 6).as("est_a"),
        round(lit(63) * scale / $"mb", 6).as("est_b"),
        round(lit(63) * scale / $"mu", 6).as("est_union"))
    val ni = ku.join(ka, Seq("hv"), "left_semi").join(kb, Seq("hv"), "left_semi")
      .agg(count(lit(1)).as("ni"))
    est.crossJoin(broadcast(ni))
      .crossJoin(broadcast(h.filter($"grp" === 0).agg(count(lit(1)).as("exact_a"))))
      .crossJoin(broadcast(h.filter($"grp" === 1).agg(count(lit(1)).as("exact_b"))))
      .crossJoin(broadcast(h.select($"hv").distinct().agg(count(lit(1)).as("exact_union"))))
      .crossJoin(broadcast(h.filter($"grp" === 0).select($"hv")
        .join(h.filter($"grp" === 1).select($"hv"), "hv")
        .agg(count(lit(1)).as("exact_intersection"))))
      .select($"est_a", $"est_b", $"est_union",
        round($"ni" / 64.0 * $"est_union", 6).as("est_intersection"),
        $"exact_a", $"exact_b", $"exact_union", $"exact_intersection")
  }

  /** Shared by batch d_cms_counts and streaming st_cms_counts — the
    * cell-wise-summed stream sketch equals the one-shot sketch (CMS
    * linearity), so both restate the same SQL. */
  private[graft] val cmsOracleSql: String = """
      WITH tok AS (
        SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
      rows AS (SELECT unnest([0, 1, 2, 3]) AS row),
      counters AS (
        SELECT row,
          CAST('0x' || substr(md5(CAST(row AS VARCHAR) || ':' || tok), 1, 12)
            AS BIGINT) % 128 AS bucket,
          COUNT(*) AS cnt
        FROM tok CROSS JOIN rows GROUP BY 1, 2),
      exact AS (SELECT tok, COUNT(*) AS n FROM tok GROUP BY tok),
      probe AS (SELECT tok, n FROM exact ORDER BY n DESC, tok LIMIT 10),
      pb AS (
        SELECT p.tok, p.n, r.row,
          CAST('0x' || substr(md5(CAST(r.row AS VARCHAR) || ':' || p.tok), 1, 12)
            AS BIGINT) % 128 AS bucket
        FROM probe p CROSS JOIN rows r)
      SELECT pb.tok, CAST(MIN(pb.n) AS BIGINT) AS exact_n,
        CAST(MIN(COALESCE(c.cnt, 0)) AS BIGINT) AS cms_est
      FROM pb LEFT JOIN counters c ON c.row = pb.row AND c.bucket = pb.bucket
      GROUP BY pb.tok
      ORDER BY exact_n DESC, tok"""

  /** Count-min point-frequency estimates for the corpus's 10 most
    * frequent tokens, exact counts alongside — the row documents the
    * sketch's one-sided error (est ≥ exact always) at this d=4, w=128
    * configuration. The sketch is a mergeable grouped count (≤ d·w
    * rows shuffled per partition regardless of corpus size — see
    * [[CountMin]]); the probe set is a distributed top-k
    * (TakeOrderedAndProject), and estimation is a broadcast join
    * against the ≤ 512-row counter table. Deterministic end to end:
    * md5-48 row-salted bucketing, so the oracle replays the exact
    * matrix. Completes the sketch triad: Misra–Gries (which tokens),
    * KMV (how many distinct), CMS (how often each). */
  val dCmsCounts: Spec = Spec(
    "d_cms_counts",
    oracle = Some(cmsOracleSql)) { (s, dir) =>
    import s.implicits._
    val toks = docs(s, dir)
      .select(explode(Text.tokens($"text")).as("tok"))
      .localCheckpoint() // one explode feeds sketch AND exact probe counts
    val counters = CountMin.sketch(toks, "tok", d = 4, w = 128)
    val probes = toks.groupBy($"tok").agg(count(lit(1)).as("exact_n"))
      .orderBy($"exact_n".desc, $"tok").limit(10)
    CountMin.estimate(counters, probes, "tok", d = 4, w = 128)
      .join(probes, "tok")
      .select($"tok", $"exact_n", $"cms_est")
      .orderBy($"exact_n".desc, $"tok")
  }

  /** Weighted sampling WITHOUT replacement (Efraimidis–Spirakis '06
    * A-ES): each doc gets key u^(1/w) for u = hash-uniform(doc_id),
    * w = its weight (n_chars — longer docs proportionally likelier);
    * the top-k keys ARE a weighted sample without replacement. Ranking
    * by log10(u)/w (monotone in u^(1/w); the engine-parity-proven log
    * path of unigramLmScores) keeps the key exactly replayable, and
    * u = (h48 + 0.5)/2^48 makes it a pure function of doc_id — the
    * reproducible-sampling guarantee of [[Sampling]] extended to
    * weighted draws. Top-k is orderBy+limit = TakeOrderedAndProject
    * (per-partition top-k, driver merge), never a global sort; at
    * 100 TB the shuffle is k rows per partition. */
  val dWeightedSample: Spec = Spec(
    "d_weighted_sample",
    oracle = Some("""
      WITH k AS (
        SELECT doc_id, n_chars,
          ROUND(log10(
              (CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12) AS BIGINT)
                + 0.5) / 281474976710656.0) / n_chars, 9) AS skey
        FROM documents),
      r AS (SELECT doc_id, n_chars, skey,
              row_number() OVER (ORDER BY skey DESC, doc_id) AS rk FROM k)
      SELECT CAST(rk AS BIGINT) AS sample_rank, doc_id, n_chars AS weight,
        skey
      FROM r WHERE rk <= 20 ORDER BY rk""")) { (s, dir) =>
    import s.implicits._
    val keyed = docs(s, dir).select($"doc_id", $"n_chars",
      round(log10((Sampling.hash48($"doc_id") + lit(0.5)) /
          lit(281474976710656.0)) / $"n_chars", 9).as("skey"))
      .orderBy($"skey".desc, $"doc_id").limit(20)
    // 20-row frame: rank via the bounded collect+sort+posexplode form
    // (queryFrame pattern — a window here would be unpartitioned)
    keyed
      .agg(sort_array(collect_list(
        struct((-$"skey").as("negskey"), $"doc_id", $"n_chars", $"skey")))
        .as("ts"))
      .select(posexplode($"ts").as(Seq("i", "t")))
      .select(($"i" + 1).cast("long").as("sample_rank"),
        $"t.doc_id".as("doc_id"), $"t.n_chars".as("weight"),
        $"t.skey".as("skey"))
      .orderBy($"sample_rank")
  }

  /** Padding-efficiency report for length-bucketed batching: each doc
    * pads up to the next multiple of 64 tokens (the bucketed-batching
    * granularity trainers use to amortize recompilation), and the
    * report gives per-source token counts, padded counts, and the
    * waste fraction — the number that decides whether a source needs
    * sequence packing (d_shard_packing) before training. Pure
    * scan+agg: one pass, map-side combined, no joins. */
  val dPaddingEfficiency: Spec = Spec(
    "d_padding_efficiency",
    oracle = Some("""
      WITH t AS (
        SELECT source, len(string_split(text, ' ')) AS n_tok FROM documents),
      b AS (SELECT source, n_tok, ((n_tok + 63) // 64) * 64 AS padded FROM t)
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        CAST(SUM(n_tok) AS BIGINT) AS sum_tok,
        CAST(SUM(padded) AS BIGINT) AS sum_padded,
        ROUND(1.0 - CAST(SUM(n_tok) AS DOUBLE) / SUM(padded), 6) AS waste_pct
      FROM b GROUP BY source ORDER BY source""")) { (s, dir) =>
    import s.implicits._
    docs(s, dir)
      .select($"source", size(Text.tokens($"text")).cast("long").as("n_tok"))
      .withColumn("padded", expr("((n_tok + 63) div 64) * 64"))
      .groupBy($"source")
      .agg(count(lit(1)).as("n_docs"), sum($"n_tok").as("sum_tok"),
        sum($"padded").as("sum_padded"),
        round(lit(1.0) - sum($"n_tok").cast("double") / sum($"padded"), 6)
          .as("waste_pct"))
      .orderBy($"source")
  }

  /** Per-document Shannon entropy (bits) of the character and token
    * distributions — the gibberish/compression-quality signal
    * complementing d_token_diversity's transcendental-free indexes.
    * Engine parity for log2 extends the unigram-LM recipe one step:
    * each distinct symbol's term −p·log₂p is rounded at 6dp and SCALED
    * TO A LONG, so the per-document sum is integer arithmetic — exact
    * and aggregation-order-free (Spark's array_distinct and DuckDB's
    * list_distinct may order symbols differently; a double sum would
    * drift, a long sum cannot).
    *
    * Scale shape: entirely row-local — the symbol loop lives inside one
    * codegen'd projection (no explode, no shuffle); the whole query is
    * scan+project+sort, the shape that survives 100 TB untouched. */
  val dEntropyScores: Spec = Spec(
    "d_entropy_scores",
    oracle = Some("""
      WITH t AS (
        SELECT doc_id, text, length(text) AS n,
          string_split(text, ' ') AS toks
        FROM documents),
      c AS (
        SELECT doc_id, n, toks, len(toks) AS m,
          list_transform(range(1, n + 1), i -> text[i:i]) AS chars
        FROM t),
      s AS (
        SELECT doc_id, n, m,
          list_sum(list_transform(list_distinct(chars), ch ->
            CAST(round(-(CAST(len(list_filter(chars, x -> x = ch)) AS DOUBLE) / n)
              * log2(CAST(len(list_filter(chars, x -> x = ch)) AS DOUBLE) / n)
              * 1000000) AS BIGINT))) AS cs,
          list_sum(list_transform(list_distinct(toks), tk ->
            CAST(round(-(CAST(len(list_filter(toks, x -> x = tk)) AS DOUBLE) / m)
              * log2(CAST(len(list_filter(toks, x -> x = tk)) AS DOUBLE) / m)
              * 1000000) AS BIGINT))) AS ts
        FROM c)
      SELECT doc_id, CAST(n AS BIGINT) AS n_chars,
        CAST(cs AS DOUBLE) / 1000000 AS char_entropy,
        CAST(m AS BIGINT) AS n_tok,
        CAST(ts AS DOUBLE) / 1000000 AS token_entropy,
        CAST(cs AS DOUBLE) / 1000000 < 3.0 AS is_low_entropy
      FROM s ORDER BY doc_id""")) { (s, dir) =>
    import s.implicits._
    import org.apache.spark.sql.Column
    def entScaled(arr: Column, n: Column): Column =
      aggregate(
        transform(array_distinct(arr), sym => {
          val p = size(filter(arr, x => x === sym)).cast("double") / n
          round(p * log2(p) * lit(-1000000.0d)).cast("long")
        }),
        lit(0L), (acc, v) => acc + v)
    val n = length($"text")
    val chars = transform(sequence(lit(1), n), i => $"text".substr(i, lit(1)))
    val toks = Text.tokens($"text")
    docs(s, dir)
      .select($"doc_id",
        n.cast("long").as("n_chars"),
        (entScaled(chars, n.cast("double")).cast("double") / 1000000)
          .as("char_entropy"),
        size(toks).cast("long").as("n_tok"),
        (entScaled(toks, size(toks).cast("double")).cast("double") / 1000000)
          .as("token_entropy"))
      .withColumn("is_low_entropy", $"char_entropy" < 3.0)
      .orderBy($"doc_id")
  }

  /** Corpus snapshot diff — the versioned-corpus management op: two
    * snapshots full-outer-join on doc_id, rows classify as
    * added / removed / changed (content md5 differs) with unchanged
    * rows dropped from the detail (they dominate at scale and carry no
    * information). One id-keyed shuffle; the md5 comparison is the only
    * content read. Snapshots here are deterministic slices of the same
    * table (prev: doc_id % 7 ≠ 0; curr: doc_id % 5 ≠ 0, with every
    * doc_id % 3 = 0 text revised) so the oracle can rebuild both. */
  /** Order-independent corpus CHECKSUM per source (+ rollup total) —
    * the O(1)-state screen a 100 TB snapshot comparison runs BEFORE any
    * row-level work ([[dSnapshotDiff]] is the expensive follow-up on
    * mismatch): xor and modular sum of a per-row content hash. Both
    * folds are commutative/associative, so the checksum is independent
    * of row order, partitioning and merge shape — shard checksums
    * combine to the corpus checksum with 16 bytes per shard moved,
    * never a re-scan; carrying BOTH folds closes each one's blind spot
    * (xor misses double-flips, the wrap-sum misses swaps that preserve
    * the sum). The ROLLUP total row IS the merge proof: total xor =
    * xor of per-source xors. */
  /** Shared by batch d_corpus_checksum and streaming st_corpus_checksum
    * (fold commutativity means the streamed per-source partials merge to
    * the same numbers). */
  private[queries] val corpusChecksumOracleSql: String = """
      WITH h AS (SELECT source,
          CAST('0x' || substr(md5(doc_id::VARCHAR || '|' || text), 1, 12)
            AS BIGINT) AS hv
        FROM documents)
      SELECT COALESCE(source, '__total__') AS source,
        CAST(COUNT(*) AS BIGINT) AS n,
        CAST(bit_xor(hv) AS BIGINT) AS xor_sig,
        CAST(SUM(hv::HUGEINT) % 2305843009213693952 AS BIGINT) AS sum_sig
      FROM h GROUP BY ROLLUP(source) ORDER BY 1"""

  val dCorpusChecksum: Spec = Spec(
    "d_corpus_checksum",
    oracle = Some(corpusChecksumOracleSql)) { (s, dir) =>
    import s.implicits._
    docs(s, dir)
      .select($"source",
        conv(substring(md5(concat($"doc_id".cast("string"), lit("|"), $"text")),
          1, 12), 16, 10).cast("long").as("hv"))
      .rollup($"source")
      .agg(count(lit(1)).as("n"),
        expr("bit_xor(hv)").as("xor_sig"),
        (sum($"hv".cast("decimal(38,0)")) % lit(2305843009213693952L))
          .cast("long").as("sum_sig"))
      .select(coalesce($"source", lit("__total__")).as("source"),
        $"n", $"xor_sig", $"sum_sig")
      .orderBy($"source")
  }

  /** NEYMAN-OPTIMAL sample allocation across sources (Neyman '34:
    * n_h ∝ N_h·S_h — strata that are BIG or INTERNALLY VARIED get more
    * of the sample budget) — the variance-optimal answer to "how many
    * documents from each source", next to the proportional and
    * hash-quota allocators ([[dStratifiedSample]],
    * [[dTokenBudget]]). Per-stratum variance rides the exact
    * 128-bit integer moments (A_h = n_h·Σx² − (Σx)², d_h = n_h(n_h−1));
    * each stratum needs exactly ONE √ and the weights are rounded to
    * 6dp and totalled as DECIMAL (aggregation-order-free, the
    * PageRank-contribution discipline) before the one float division
    * per output row. Scale shape: one hash-agg over the corpus to the
    * per-source moment row — strata-bounded from there.
    *
    * The oracle is shared by batch d_neyman_allocation and streaming
    * st_neyman_allocation: the moment folds are plain sums, so the
    * streamed per-source partials equal the batch moments. */
  private[queries] val neymanOracleSql: String = """
      WITH m AS (SELECT source, CAST(COUNT(*) AS HUGEINT) AS n,
          SUM(CAST(len(string_split(text, ' ')) AS HUGEINT)) AS sx,
          SUM(CAST(len(string_split(text, ' ')) AS HUGEINT)
            * len(string_split(text, ' '))) AS sxx
        FROM documents GROUP BY source),
      w AS (SELECT source, n,
          CAST(ROUND(CAST(n AS DOUBLE) *
            sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
               / CAST(n * (n - 1) AS DOUBLE)), 6) AS DECIMAL(28,6)) AS wh
        FROM m WHERE n > 1),
      t AS (SELECT SUM(wh) AS tot FROM w)
      SELECT w.source, CAST(w.n AS BIGINT) AS n_docs,
        CAST(FLOOR(CAST(w.wh AS DOUBLE) / CAST(t.tot AS DOUBLE) * 1000000)
          AS BIGINT) AS share_micros,
        CAST(FLOOR(CAST(w.wh AS DOUBLE) / CAST(t.tot AS DOUBLE) * 1000)
          AS BIGINT) AS quota_of_1000
      FROM w CROSS JOIN t
      ORDER BY w.source"""

  /** The allocation fold over a (source, n, sx, sxx) moment frame —
    * shared by the batch and streaming forms. */
  private[graft] def neymanOverMoments(m: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    import m.sparkSession.implicits._
    val w = m.filter($"n" > 1)
      .select($"source", $"n",
        round($"n".cast("double") *
          sqrt(($"n" * $"sxx" - $"sx" * $"sx").cast("double")
             / ($"n" * ($"n" - 1)).cast("double")), 6)
          .cast("decimal(28,6)").as("wh"))
      .localCheckpoint() // strata-bounded rows feed both total and shares
    val t = w.agg(sum($"wh").as("tot"))
    w.crossJoin(broadcast(t))
      .select($"source", $"n".cast("long").as("n_docs"),
        floor($"wh".cast("double") / $"tot".cast("double") * 1000000)
          .cast("long").as("share_micros"),
        floor($"wh".cast("double") / $"tot".cast("double") * 1000)
          .cast("long").as("quota_of_1000"))
      .orderBy($"source")
  }

  val dNeymanAllocation: Spec = Spec(
    "d_neyman_allocation",
    oracle = Some(neymanOracleSql)) { (s, dir) =>
    import s.implicits._
    neymanOverMoments(docs(s, dir)
      .select($"source",
        size(split($"text", " ", -1)).cast("decimal(38,0)").as("x"))
      .groupBy($"source")
      .agg(count(lit(1)).cast("decimal(38,0)").as("n"),
        sum($"x").as("sx"), sum($"x" * $"x").as("sxx")))
  }

  val dSnapshotDiff: Spec = Spec(
    "d_snapshot_diff",
    oracle = Some("""
      WITH prev AS (
        SELECT doc_id, md5(text) AS h FROM documents WHERE doc_id % 7 <> 0),
      curr AS (
        SELECT doc_id,
          md5(CASE WHEN doc_id % 3 = 0 THEN text || ' v2' ELSE text END) AS h
        FROM documents WHERE doc_id % 5 <> 0),
      d AS (
        SELECT COALESCE(p.doc_id, c.doc_id) AS doc_id,
          CASE WHEN p.doc_id IS NULL THEN 'added'
               WHEN c.doc_id IS NULL THEN 'removed'
               WHEN p.h <> c.h THEN 'changed'
               ELSE 'unchanged' END AS status
        FROM prev p FULL OUTER JOIN curr c ON p.doc_id = c.doc_id)
      SELECT doc_id, status FROM d WHERE status <> 'unchanged'
      ORDER BY doc_id""")) { (s, dir) =>
    import s.implicits._
    val d = docs(s, dir)
    val prev = d.filter($"doc_id" % 7 =!= 0)
      .select($"doc_id", md5($"text").as("h"))
    val curr = d.filter($"doc_id" % 5 =!= 0)
      .select($"doc_id",
        md5(when($"doc_id" % 3 === 0, concat($"text", lit(" v2")))
          .otherwise($"text")).as("h"))
    prev.as("p").join(curr.as("c"),
        $"p.doc_id" === $"c.doc_id", "full_outer")
      .select(coalesce($"p.doc_id", $"c.doc_id").as("doc_id"),
        when($"p.doc_id".isNull, "added")
          .when($"c.doc_id".isNull, "removed")
          .when($"p.h" =!= $"c.h", "changed")
          .otherwise("unchanged").as("status"))
      .filter($"status" =!= "unchanged")
      .orderBy($"doc_id")
  }

  /** Token-budget apportionment across sources (largest-remainder /
    * Hamilton method): each source's share of a fixed training-token
    * budget is proportional to its available tokens, floored, with the
    * leftover tokens going to the largest fractional parts (ties to
    * source asc) — so allocations are integers that sum EXACTLY to the
    * budget. The mix-planning op a curriculum builder runs before
    * sampling; one agg + one broadcast of the per-source table. Quota
    * arithmetic is exact-integer (avail·budget via DECIMAL, floor =
    * integer division) so both engines apportion identically. */
  val dTokenBudget: Spec = Spec(
    "d_token_budget_allocation",
    oracle = Some("""
      WITH avail AS (
        SELECT source, CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tok
        FROM documents GROUP BY source),
      tot AS (SELECT CAST(SUM(n_tok) AS BIGINT) AS total FROM avail),
      q AS (
        SELECT source, n_tok,
          (n_tok * 100000) // (SELECT total FROM tot) AS base,
          (n_tok * 100000) % (SELECT total FROM tot) AS rem
        FROM avail),
      r AS (SELECT source, n_tok, base, rem,
              row_number() OVER (ORDER BY rem DESC, source) AS rk,
              (SELECT 100000 - SUM(base) FROM q) AS leftover
            FROM q)
      SELECT source, n_tok AS available_tokens,
        CAST(base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END AS BIGINT)
          AS allocated_tokens
      FROM r ORDER BY source""")) { (s, dir) =>
    import s.implicits._
    val budget = 100000L
    val avail = docs(s, dir)
      .select($"source", size(Text.tokens($"text")).cast("long").as("t"))
      .groupBy($"source").agg(sum($"t").as("n_tok"))
    val tot = avail.agg(sum($"n_tok").as("total"))
    val q = avail.crossJoin(broadcast(tot))
      .select($"source", $"n_tok",
        // div, not `/`: Spark's / on longs is double division
        expr(s"(n_tok * $budget) div total").as("base"),
        (($"n_tok" * budget) % $"total").as("rem"))
    val left = q.agg((lit(budget) - sum($"base")).as("leftover"))
    q.crossJoin(broadcast(left))
      .withColumn("rk", row_number().over(
        // |sources|-bounded frame; partitioning by the cross-joined
        // leftover attribute (constant-valued but NOT foldable) keeps
        // the bounded rank out of the unpartitioned-window class — a
        // literal key would constant-fold back to the warned shape
        org.apache.spark.sql.expressions.Window
          .partitionBy($"leftover").orderBy($"rem".desc, $"source")))
      .select($"source", $"n_tok".as("available_tokens"),
        ($"base" + when($"rk" <= $"leftover", 1L).otherwise(0L))
          .cast("long").as("allocated_tokens"))
      .orderBy($"source")
  }

  /** Deterministic train/val/test split: bucket = 48-bit id hash mod
    * 100 → train (<90) / val (90-94) / test (≥95). A pure per-row
    * function of doc_id — no shuffle to ASSIGN splits (the groupBy here
    * only summarizes them), replayable across runs, and disjoint by
    * construction (one bucket, one split), which is the property that
    * matters: eval rows can never leak into train between pipeline
    * versions. The same [[graft.ops.Sampling.hash48]] drives sampling
    * and splitting, so "sampled subset of train" stays consistent. */
  val dHashSplit: Spec = Spec(
    "d_hash_split",
    oracle = Some("""
      WITH h AS (
        SELECT doc_id, lang,
          CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
          CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)),1,12) AS BIGINT)
            % 100 AS bucket
        FROM documents),
      s AS (
        SELECT lang, n_tok, doc_id,
          CASE WHEN bucket < 90 THEN 'train'
               WHEN bucket < 95 THEN 'val'
               ELSE 'test' END AS split
        FROM h)
      SELECT lang, split, COUNT(*) AS n_docs,
        CAST(SUM(n_tok) AS BIGINT) AS n_tokens, MIN(doc_id) AS min_doc_id
      FROM s GROUP BY lang, split ORDER BY lang, split""")) { (s, dir) =>
    import s.implicits._
    val bucket = graft.ops.Sampling.hash48($"doc_id") % 100
    docs(s, dir)
      .select($"lang", size(Text.tokens($"text")).cast("long").as("n_tok"),
        $"doc_id",
        when(bucket < 90, "train").when(bucket < 95, "val")
          .otherwise("test").as("split"))
      .groupBy($"lang", $"split")
      .agg(count(lit(1)).as("n_docs"),
        sum($"n_tok").cast("long").as("n_tokens"),
        min($"doc_id").as("min_doc_id"))
      .orderBy($"lang", $"split")
  }

  /** Readability scoring (Flesch reading ease + Flesch-Kincaid grade):
    * syllables from vowel-group runs (`[aeiouy]+` — the standard
    * dictionary-free estimator), sentences from a fixed ~13-word
    * segmentation (the corpus is unpunctuated crawl-style text, the
    * same estimate a chunker would apply; on punctuated text the
    * sentence count would come from [[graft.ops.Text.isTerminalValid]]
    * splits instead and nothing else changes). Entirely per-row scalar
    * arithmetic — runs at scan speed, no shuffle, any corpus size. */
  val dReadability: Spec = Spec(
    "d_readability",
    oracle = Some("""
      WITH m AS (
        SELECT doc_id,
          CAST(len(string_split(text,' ')) AS DOUBLE) AS w,
          CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS DOUBLE) AS sy,
          greatest(1.0, ceil(len(string_split(text,' ')) / 13.0)) AS sent
        FROM documents WHERE doc_id % 4 = 1)
      SELECT doc_id,
        CAST(w AS BIGINT) AS n_words,
        CAST(sy AS BIGINT) AS n_syllables,
        CAST(sent AS BIGINT) AS n_sentences,
        round(206.835 - 1.015 * (w / sent) - 84.6 * (sy / w), 6) AS fre,
        round(0.39 * (w / sent) + 11.8 * (sy / w) - 15.59, 6) AS fk_grade,
        CASE WHEN 206.835 - 1.015 * (w / sent) - 84.6 * (sy / w) >= 60 THEN 'easy'
             WHEN 206.835 - 1.015 * (w / sent) - 84.6 * (sy / w) >= 30 THEN 'medium'
             ELSE 'hard' END AS band
      FROM m ORDER BY doc_id""")) { (s, dir) =>
    import s.implicits._
    val w = size(Text.tokens($"text")).cast("double")
    val sy = regexp_count(lower($"text"), lit("[aeiouy]+")).cast("double")
    val sent = greatest(lit(1.0), ceil(w / 13.0))
    val fre = lit(206.835) - lit(1.015) * (w / sent) - lit(84.6) * (sy / w)
    docs(s, dir)
      .filter($"doc_id" % 4 === 1)
      .select($"doc_id",
        w.cast("long").as("n_words"),
        sy.cast("long").as("n_syllables"),
        sent.cast("long").as("n_sentences"),
        round(fre, 6).as("fre"),
        round(lit(0.39) * (w / sent) + lit(11.8) * (sy / w) - lit(15.59), 6)
          .as("fk_grade"),
        when(fre >= 60, "easy").when(fre >= 30, "medium").otherwise("hard")
          .as("band"))
      .orderBy($"doc_id")
  }

  /** Bigram LM scoring with add-one smoothing — the conditional
    * upgrade of [[dUnigramLmScore]] (KenLM-style corpus perplexity is
    * THE classic quality filter; a bigram model is its smallest honest
    * form): logP(doc) = Σ log10((c(w₁w₂)+1) / (c(w₁)+V)).
    *
    * Scale shape: ONE explode builds the bigram count table (hash agg,
    * map-side combined); context counts c(w₁) derive from it by a
    * second agg over the FIRST token — no re-explode; V is a distinct
    * count of unigrams. Scoring joins doc bigrams against the count
    * table on the gram key — a plain shuffle join whose build side is
    * the model itself, exactly how a distributed LM scorer shards its
    * table; the context counts join stays un-hinted so AQE broadcasts
    * while the vocab fits and degrades when it doesn't. Per-bigram
    * log-probs are 6dp-rounded and summed as DECIMAL (order-free). */
  val dBigramLm: Spec = Spec(
    "d_bigram_lm",
    oracle = Some("""
      WITH toks AS (
        SELECT doc_id, string_split(text,' ') AS l FROM documents),
      bi AS (
        SELECT doc_id, unnest(list_transform(range(1, len(l)),
          i -> array_to_string(l[i:i+1], ' '))) AS g
        FROM toks WHERE len(l) >= 2),
      cb AS (SELECT g, CAST(COUNT(*) AS DOUBLE) AS cb FROM bi GROUP BY g),
      c1 AS (SELECT string_split(g,' ')[1] AS w1, SUM(cb) AS c1
             FROM cb GROUP BY 1),
      v AS (SELECT CAST(COUNT(DISTINCT w) AS DOUBLE) AS v
            FROM (SELECT unnest(l) AS w FROM toks)),
      lp AS (
        SELECT bi.doc_id,
          CAST(round(log10((cb.cb + 1) / (c1.c1 + v.v)), 6)
            AS DECIMAL(18,6)) AS lp
        FROM bi JOIN cb ON bi.g = cb.g
          JOIN c1 ON string_split(bi.g,' ')[1] = c1.w1
          CROSS JOIN v)
      SELECT doc_id, COUNT(*) AS n_bigrams,
        FLOOR(CAST(SUM(lp) AS DOUBLE) / COUNT(*) * 1e6) / 1e6 AS avg_logprob
      FROM lp GROUP BY doc_id ORDER BY doc_id""")) { (s, dir) =>
    import s.implicits._
    val toks = docs(s, dir).select($"doc_id", Text.tokens($"text").as("l"))
    val bi = toks.filter(size($"l") >= 2)
      .select($"doc_id", explode(Text.wordNgrams($"l", 2)).as("g"))
    val cb = bi.groupBy($"g")
      .agg(count(lit(1)).cast("double").as("cb"))
      .localCheckpoint() // the model table: feeds c1 AND scoring
    val c1 = cb.groupBy(split($"g", " ", 2).getItem(0).as("w1"))
      .agg(sum($"cb").as("c1"))
    val v = toks.select(explode($"l").as("w")).agg(
      countDistinct($"w").cast("double").as("v"))
    bi.join(cb, "g")
      .withColumn("w1", split($"g", " ", 2).getItem(0))
      .join(c1, "w1")
      .crossJoin(broadcast(v))
      .withColumn("lp",
        round(log10(($"cb" + 1) / ($"c1" + $"v")), 6).cast("decimal(18,6)"))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        // FLOOR, not ROUND: the exact decimal sum divided by an integer
        // count can land on half-way 6dp boundaries where the engines'
        // rounding modes disagree (the d_ngram_rep_word_tok rule)
        (floor(sum($"lp").cast("double") / count(lit(1)) * 1e6) / 1e6)
          .as("avg_logprob"))
      .orderBy($"doc_id")
  }

  /** Interpolated Kneser-Ney bigram probabilities (Kneser & Ney '95,
    * Chen & Goodman '98) — the smoothing a real corpus LM (the quality-
    * filter perplexity model) uses instead of [[dBigramLm]]'s add-one:
    * P(w2|w1) = max(c12−D,0)/c1 + D·N1+(w1·)/c1 · N1+(·w2)/T with
    * D = 0.75 and T = distinct bigram types. With D = 3/4 the whole
    * formula clears to INTEGER arithmetic — multiply through by 4·c1·T:
    * p_micros = (max(4·c12−3,0)·T + 3·N1+(w1·)·N1+(·w2))·1e6 //
    * (4·c1·T) — so both engines compute the exact same BIGINT, no
    * float smoothing constants to disagree on. Scale shape: every
    * count is a map-side-combined group-by on the bigram/unigram key;
    * scoring is two keyed joins (w1, w2) against count frames that are
    * vocabulary-sized (not corpus-sized), and the top-k emission is a
    * TakeOrdered, never a global sort. */
  val dKneserNey: Spec = Spec(
    "d_kneser_ney",
    oracle = Some("""
      WITH toks AS (SELECT string_split(text, ' ') AS l FROM documents),
      bi AS (SELECT unnest(list_transform(range(1, len(l)),
          i -> array_to_string(l[i:i+1], ' '))) AS g
        FROM toks WHERE len(l) >= 2),
      cb AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS c12 FROM bi GROUP BY g),
      sp AS (SELECT g, c12, string_split(g, ' ')[1] AS w1,
          string_split(g, ' ')[2] AS w2 FROM cb),
      c1 AS (SELECT w1, CAST(SUM(c12) AS BIGINT) AS c1,
          CAST(COUNT(*) AS BIGINT) AS n1f FROM sp GROUP BY w1),
      nb AS (SELECT w2, CAST(COUNT(*) AS BIGINT) AS nb FROM sp GROUP BY w2),
      tt AS (SELECT CAST(COUNT(*) AS BIGINT) AS t FROM cb)
      SELECT g, c12 AS n,
        CAST(((GREATEST(4 * c12 - 3, 0)::HUGEINT * tt.t + 3::HUGEINT * c1.n1f * nb.nb)
          * 1000000) // (4::HUGEINT * c1.c1 * tt.t) AS BIGINT) AS p_kn_micros
      FROM sp JOIN c1 USING (w1) JOIN nb USING (w2) CROSS JOIN tt
      ORDER BY n DESC, g LIMIT 300""")) { (s, dir) =>
    import s.implicits._
    val toks = docs(s, dir).select(Text.tokens($"text").as("l"))
    val bi = toks.filter(size($"l") >= 2)
      .select(explode(Text.wordNgrams($"l", 2)).as("g"))
    val cb = bi.groupBy($"g").agg(count(lit(1)).as("c12"))
      .localCheckpoint() // the model table: feeds c1, nb, T and scoring
    val sp = cb
      .withColumn("w1", split($"g", " ", 2).getItem(0))
      .withColumn("w2", split($"g", " ", 2).getItem(1))
    val c1 = sp.groupBy($"w1")
      .agg(sum($"c12").as("c1"), count(lit(1)).as("n1f"))
    val nb = sp.groupBy($"w2").agg(count(lit(1)).as("nb"))
    val tt = broadcast(cb.agg(count(lit(1)).as("t")))
    sp.join(c1, "w1").join(nb, "w2").crossJoin(tt)
      .select($"g", $"c12".as("n"),
        // DECIMAL(38,0) end to end: the numerator multiplies a bigram
        // count by T (distinct bigram TYPES, corpus-growing), which
        // overflows BIGINT on a large corpus — Spark would wrap
        // silently while the oracle errors. 128-bit on both engines.
        expr("((cast(GREATEST(4 * c12 - 3, 0L) as decimal(38,0)) * t" +
          " + cast(3 * n1f as decimal(38,0)) * nb) * 1000000)" +
          " div (cast(4 * c1 as decimal(38,0)) * t)").as("p_kn_micros"))
      .orderBy($"n".desc, $"g")
      .limit(300)
  }

  /** Mann-Whitney U rank-sum test (Mann & Whitney '47) of each
    * source's length distribution against the rest of the corpus —
    * the nonparametric drift test that works where KS is awkward
    * (heavy ties, ordinal data): does source s produce systematically
    * longer documents? DOUBLED ranks keep tie handling exact-integer:
    * a row of value v has 2·rank = 2·|{x < v}| + |{x = v}| + 1 (twice
    * the average rank of its tie run), so rank sums and 2U = 2R −
    * n(n+1) are BIGINT on both engines; the z denominator applies the
    * standard TIE-CORRECTED variance (the tie-free form overstates σ
    * under the heavy ties this test exists for), and only the final
    * z-score is a fixed-order float, emitted floor-microed. Scale
    * shape: ranks come
    * from VALUE-keyed counts (one group-by on n_chars + one cumulative
    * window over the BOUNDED distinct-length domain), never a global
    * row sort; per-source sums are one keyed agg. */
  val dMannWhitney: Spec = Spec(
    "d_mann_whitney",
    bench = true, // r10-family headline row: prefix-sum scaffold regression guard
    oracle = Some("""
      WITH vc AS (SELECT n_chars AS v, CAST(COUNT(*) AS BIGINT) AS ce
          FROM documents GROUP BY 1),
      cum AS (SELECT v, ce,
          CAST(COALESCE(SUM(ce) OVER (ORDER BY v
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
            AS cl
        FROM vc),
      r2 AS (SELECT d.source, 2 * c.cl + c.ce + 1 AS r2
        FROM documents d JOIN cum c ON c.v = d.n_chars),
      tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS nn FROM documents),
      ties AS (SELECT CAST(SUM(ce::HUGEINT * ce * ce - ce) AS DOUBLE) AS ts
        FROM vc),
      su AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n,
          CAST(SUM(r2) AS BIGINT) AS rank_sum_x2
        FROM r2 GROUP BY source)
      SELECT source, n, rank_sum_x2,
        rank_sum_x2 - n * (n + 1) AS u_x2,
        CAST(FLOOR(((CAST(rank_sum_x2 - n * (n + 1) AS DOUBLE) / 2
            - CAST(n AS DOUBLE) * (nn - n) / 2)
          / sqrt(CAST(n AS DOUBLE) * (nn - n) / 12
            * ((nn + 1) - ts / (CAST(nn AS DOUBLE) * (nn - 1))))) * 1000000)
          AS BIGINT) AS z_micros
      FROM su CROSS JOIN tot CROSS JOIN ties ORDER BY source""")) { (s, dir) =>
    import s.implicits._
    val d = docs(s, dir)
    // cumulative counts live on the DISTINCT-length domain (|lengths|
    // rows, not |documents|), through the range-partitioned prefix-sum
    // scaffold (Skew.prefixSumsByKey) — the same shape the vocab-growth
    // cumulative uses; never a single-reducer window over the corpus
    val vc = d.groupBy($"n_chars".as("v")).agg(count(lit(1)).as("ce"))
      .withColumn("_k", lit("all"))
    val cum = Skew.prefixSumsByKey(vc, "_k", Seq($"v"),
        Seq($"ce" -> "cum_ce"))
      .withColumn("cl", $"cum_ce" - $"ce")
    val r2 = d.join(cum, d("n_chars") === cum("v"))
      .select($"source", (lit(2) * $"cl" + $"ce" + 1).as("r2"))
    val tot = broadcast(d.agg(count(lit(1)).as("nn")))
    // Tie correction (Lehmann): σ² = n·(N−n)/12 · [(N+1) − Σ(tᵢ³−tᵢ)/
    // (N(N−1))] — the doubled-rank scheme makes the MEAN exact under
    // ties, but the tie-free variance overstates σ and attenuates |z|.
    // The per-value counts vc already hold the tie runs; the cubic sum
    // rides DECIMAL(38,0)/HUGEINT so a heavy tie run can't wrap BIGINT.
    val ties = broadcast(vc.agg(
      sum($"ce".cast("decimal(38,0)") * $"ce" * $"ce" - $"ce")
        .cast("double").as("ts")))
    r2.groupBy($"source")
      .agg(count(lit(1)).as("n"), sum($"r2").as("rank_sum_x2"))
      .crossJoin(tot)
      .crossJoin(ties)
      .select($"source", $"n", $"rank_sum_x2",
        ($"rank_sum_x2" - $"n" * ($"n" + 1)).as("u_x2"),
        floor((($"rank_sum_x2" - $"n" * ($"n" + 1)).cast("double") / 2
            - $"n".cast("double") * ($"nn" - $"n") / 2)
          / sqrt($"n".cast("double") * ($"nn" - $"n") / 12
            * (($"nn" + 1) - $"ts" / ($"nn".cast("double") * ($"nn" - 1))))
          * 1e6).cast("long").as("z_micros"))
      .orderBy($"source")
  }

  /** Effect sizes per source vs the rest of the corpus — the
    * magnitude companion of the significance tests ([[dMannWhitney]]
    * says a shift EXISTS; at corpus scale everything is "significant",
    * so the decision-relevant number is HOW BIG): Cliff's δ =
    * 2U/(n₁n₂) − 1, EXACT to the micro from the doubled-rank U
    * (U_x2 = 2U is already integer; the signed floor uses the
    * pmod identity so negative deltas floor identically on both
    * engines), and Cohen's d from exact integer moments with the
    * pooled-variance float assembled once in fixed order. */
  val dEffectSizes: Spec = Spec(
    "d_effect_sizes",
    oracle = Some("""
      WITH vc AS (SELECT n_chars AS v, CAST(COUNT(*) AS BIGINT) AS ce
          FROM documents GROUP BY 1),
      cum AS (SELECT v, ce,
          CAST(COALESCE(SUM(ce) OVER (ORDER BY v
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
            AS cl
        FROM vc),
      r2 AS (SELECT d.source, d.n_chars, 2 * c.cl + c.ce + 1 AS r2
        FROM documents d JOIN cum c ON c.v = d.n_chars),
      tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS nn,
          SUM(n_chars::HUGEINT) AS st, SUM(n_chars::HUGEINT * n_chars) AS qt
        FROM documents),
      su AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n,
          CAST(SUM(r2) AS BIGINT) AS rank_sum_x2,
          SUM(n_chars::HUGEINT) AS s1, SUM(n_chars::HUGEINT * n_chars) AS q1
        FROM r2 GROUP BY source),
      m AS (SELECT source, n, nn - n AS n2,
          rank_sum_x2 - n * (n + 1) AS u_x2,
          s1, q1, st - s1 AS s2, qt - q1 AS q2
        FROM su CROSS JOIN tot),
      e AS (SELECT source, n, n2, u_x2,
          (u_x2 - n * n2)::HUGEINT * 1000000 AS dnum, n * n2 AS dden,
          CAST(q1 * n - s1 * s1 AS DOUBLE) AS a1,
          CAST(q2 * n2 - s2 * s2 AS DOUBLE) AS a2,
          CAST(s1 * n2 - s2 * n AS DOUBLE) AS md
        FROM m WHERE n2 > 0 AND n + n2 > 2)
      SELECT source, n,
        CAST((dnum - ((dnum % dden + dden) % dden)) // dden AS BIGINT)
          AS cliffs_delta_micros,
        CAST(FLOOR(md / (n * n2)
          / sqrt((a1 / n + a2 / n2) / (n + n2 - 2)) * 1000000) AS BIGINT)
          AS cohens_d_micros
      FROM e WHERE a1 / n + a2 / n2 > 0
      ORDER BY source""")) { (s, dir) =>
    import s.implicits._
    val d = docs(s, dir)
    val vc = d.groupBy($"n_chars".as("v")).agg(count(lit(1)).as("ce"))
      .withColumn("_k", lit("all"))
    val cum = Skew.prefixSumsByKey(vc, "_k", Seq($"v"),
        Seq($"ce" -> "cum_ce"))
      .withColumn("cl", $"cum_ce" - $"ce")
    val r2 = d.join(cum, d("n_chars") === cum("v"))
      .select($"source", d("n_chars").as("x"),
        (lit(2) * $"cl" + $"ce" + 1).as("r2"))
    val tot = broadcast(d.agg(count(lit(1)).as("nn"),
      sum($"n_chars".cast("decimal(38,0)")).as("st"),
      sum($"n_chars".cast("decimal(38,0)") * $"n_chars").as("qt")))
    val su = r2.groupBy($"source").agg(
      count(lit(1)).as("n"), sum($"r2").as("rank_sum_x2"),
      sum($"x".cast("decimal(38,0)")).as("s1"),
      sum($"x".cast("decimal(38,0)") * $"x").as("q1"))
    val m = su.crossJoin(tot)
      .select($"source", $"n", ($"nn" - $"n").as("n2"),
        ($"rank_sum_x2" - $"n" * ($"n" + 1)).as("u_x2"),
        $"s1", $"q1", ($"st" - $"s1").as("s2"), ($"qt" - $"q1").as("q2"))
      .filter($"n2" > 0 && $"n" + $"n2" > 2)
    val e = m.select($"source", $"n", $"n2",
      (($"u_x2" - $"n" * $"n2").cast("decimal(38,0)") * 1000000).as("dnum"),
      ($"n" * $"n2").as("dden"),
      ($"q1" * $"n" - $"s1" * $"s1").cast("double").as("a1"),
      ($"q2" * $"n2" - $"s2" * $"s2").cast("double").as("a2"),
      ($"s1" * $"n2" - $"s2" * $"n").cast("double").as("md"))
    e.filter($"a1" / $"n" + $"a2" / $"n2" > 0)
      .select($"source", $"n",
        expr("(dnum - pmod(dnum, dden)) div dden").as("cliffs_delta_micros"),
        floor($"md" / ($"n" * $"n2")
          / sqrt(($"a1" / $"n" + $"a2" / $"n2") / ($"n" + $"n2" - 2)) * 1e6)
          .cast("long").as("cohens_d_micros"))
      .orderBy($"source")
  }

  /** Gini coefficient of document length per source — the corpus-
    * concentration number ("does 1% of documents carry half the
    * characters?") that decides whether token budgets need length caps.
    * Tie-exact via the doubled AVERAGE ranks of the [[dMannWhitney]]
    * scaffold: G = Σ(2rᵢ−n−1)xᵢ / (nΣx) with average ranks is the
    * standard tie correction, and with r2 = 2r the numerator
    * Σ(r2−n−1)x is an exact integer — G emits as exact floored micros
    * through one 128-bit integer division, no float anywhere. */
  val dGiniLengths: Spec = Spec(
    "d_gini_lengths",
    oracle = Some("""
      WITH vc AS (SELECT source, n_chars AS v, CAST(COUNT(*) AS BIGINT) AS ce
          FROM documents GROUP BY 1, 2),
      cum AS (SELECT source, v, ce,
          CAST(COALESCE(SUM(ce) OVER (PARTITION BY source ORDER BY v
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
            AS cl
        FROM vc),
      r2 AS (SELECT d.source, d.n_chars AS x, 2 * c.cl + c.ce + 1 AS r2
        FROM documents d
        JOIN cum c ON c.source = d.source AND c.v = d.n_chars),
      g AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n,
          SUM(x::HUGEINT) AS sx, SUM(r2::HUGEINT * x) AS srx
        FROM r2 GROUP BY source)
      SELECT source, n,
        CAST(((srx - (n + 1) * sx) * 1000000) // (n * sx) AS BIGINT)
          AS gini_micros
      FROM g WHERE sx > 0 ORDER BY source""")) { (s, dir) =>
    import s.implicits._
    val d = docs(s, dir)
    val vc = d.groupBy($"source", $"n_chars".as("v"))
      .agg(count(lit(1)).as("ce"))
    val cum = Skew.prefixSumsByKey(vc, "source", Seq($"v"),
        Seq($"ce" -> "cum_ce"))
      .withColumn("cl", $"cum_ce" - $"ce")
    val r2 = d
      .join(cum.withColumnRenamed("source", "src_")
        .withColumnRenamed("v", "v_"),
        d("source") === col("src_") && d("n_chars") === col("v_"))
      .select($"source", $"n_chars".as("x"),
        (lit(2) * $"cl" + $"ce" + 1).as("r2"))
    r2.groupBy($"source").agg(
        count(lit(1)).as("n"),
        sum($"x".cast("decimal(38,0)")).as("sx"),
        sum($"r2".cast("decimal(38,0)") * $"x").as("srx"))
      .filter($"sx" > 0)
      .select($"source", $"n",
        expr("(((srx - (n + 1) * sx) * 1000000) div (n * sx))")
          .as("gini_micros"))
      .orderBy($"source")
  }

  /** Feature-hashing document embeddings (the hashing trick,
    * Weinberger et al. 2009): each token hashes to one of 16
    * dimensions with a md5-derived sign, per-doc sums give a sparse
    * integer embedding — model-free embedding GENERATION, the
    * bootstrap for the ANN/SemDeDup family when no trained encoder is
    * in the loop (and the standard trick for vocabulary-unbounded
    * features). All-integer outputs, so the oracle restates the exact
    * hash arithmetic.
    *
    * Scale shape: ONE explode + one (doc, dim)-keyed hash agg with
    * map-side partials; no vocabulary table, no join, no driver state
    * — the whole point of hashed features at 100 TB. Emitted flat as
    * (doc_id, dim, val) nonzero entries, the sparse-vector exchange
    * format. */
  /** Kruskal–Wallis H test (Kruskal & Wallis '52) — does ANY source's
    * length distribution differ? The k-sample generalization of
    * [[dMannWhitney]], sharing its doubled-rank machinery: global
    * ranks come from the value-keyed prefix-sum scaffold (never a row
    * sort), per-source rank sums stay exact integers, and the one
    * float expression assembles H with the standard tie correction.
    * Σ Rᵢ²/nᵢ is carried as EXACT integer micros via the split floor
    * identity floor(1e6·a/n) = 1e6·(a div n) + (1e6·(a mod n)) div n
    * — so both engines feed bit-identical integers into the same
    * fixed-order double formula (128-bit intermediates; exact to
    * corpus sizes where N⁴ fits DECIMAL(38), ~3e9 rows — far past any
    * single statistic's usefulness). H = 12/(N(N+1))·ΣRᵢ²/nᵢ − 3(N+1),
    * tie-corrected by 1 − Σ(t³−t)/(N³−N); with doubled ranks
    * ΣRᵢ²/nᵢ = ΣR2ᵢ²/nᵢ / 4, folded into the 3/(N(N+1)) coefficient. */
  val dKruskalWallis: Spec = Spec(
    "d_kruskal_wallis",
    oracle = Some("""
      WITH vc AS (SELECT n_chars AS v, CAST(COUNT(*) AS BIGINT) AS ce
          FROM documents GROUP BY 1),
      cum AS (SELECT v, ce,
          CAST(COALESCE(SUM(ce) OVER (ORDER BY v
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
            AS cl
        FROM vc),
      r2 AS (SELECT d.source, 2 * c.cl + c.ce + 1 AS r2
        FROM documents d JOIN cum c ON c.v = d.n_chars),
      tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS nn FROM documents),
      ties AS (SELECT CAST(SUM(ce::HUGEINT * ce * ce - ce) AS DOUBLE) AS ts
        FROM vc),
      su AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n,
          SUM(r2::HUGEINT) AS r2s
        FROM r2 GROUP BY source),
      sm AS (SELECT CAST(COUNT(*) AS BIGINT) AS k,
          SUM((r2s * r2s // n) * 1000000
            + ((r2s * r2s % n) * 1000000) // n) AS sm
        FROM su)
      SELECT nn, k AS n_groups,
        CAST(FLOOR((3.0 * CAST(sm AS DOUBLE) / 1000000.0 / (nn * (nn + 1.0))
            - 3.0 * (nn + 1))
          / (1.0 - ts / (nn * (nn - 1.0) * (nn + 1))) * 1000000)
          AS BIGINT) AS h_micros
      FROM tot CROSS JOIN ties CROSS JOIN sm""")) { (s, dir) =>
    import s.implicits._
    val d = docs(s, dir)
    val vc = d.groupBy($"n_chars".as("v")).agg(count(lit(1)).as("ce"))
      .withColumn("_k", lit("all"))
    val cum = Skew.prefixSumsByKey(vc, "_k", Seq($"v"),
        Seq($"ce" -> "cum_ce"))
      .withColumn("cl", $"cum_ce" - $"ce")
    val r2 = d.join(cum, d("n_chars") === cum("v"))
      .select($"source", (lit(2) * $"cl" + $"ce" + 1).as("r2"))
    val tot = broadcast(d.agg(count(lit(1)).as("nn")))
    val ties = broadcast(vc.agg(
      sum($"ce".cast("decimal(38,0)") * $"ce" * $"ce" - $"ce")
        .cast("double").as("ts")))
    val su = r2.groupBy($"source")
      .agg(count(lit(1)).as("n"), sum($"r2".cast("decimal(38,0)")).as("r2s"))
    su.agg(count(lit(1)).as("k"),
        sum(expr("cast(r2s * r2s div n as decimal(38,0)) * 1000000" +
          " + ((r2s * r2s) % n) * 1000000 div n")).as("sm"))
      .crossJoin(tot).crossJoin(ties)
      .select($"nn", $"k".as("n_groups"),
        floor((lit(3.0) * $"sm".cast("double") / 1000000.0
            / ($"nn" * ($"nn" + lit(1.0)))
            - lit(3.0) * ($"nn" + 1))
          / (lit(1.0) - $"ts" / ($"nn" * ($"nn" - lit(1.0)) * ($"nn" + 1)))
          * 1e6).cast("long").as("h_micros"))
  }

  /** Spearman rank correlation per source between document length in
    * CHARS and length in TOKENS — the monotone-association statistic a
    * corpus profile wants where Pearson is distorted by heavy tails
    * (length distributions are exactly that). ρ = Pearson over ranks;
    * ranks are the doubled average ranks of the [[dMannWhitney]]
    * scaffold computed WITHIN each source (the prefix-sum runs keyed
    * by source — bounded cardinality, never a row sort), the five
    * moment sums stay exact 128-bit integers (the doubling cancels),
    * and the final ρ is one fixed-order double, floor-microed.
    * Sources where either variable is constant (zero rank variance)
    * drop out on both engines. */
  val dSpearmanLengths: Spec = Spec(
    "d_spearman_lengths",
    oracle = Some("""
      WITH d AS (SELECT source, n_chars AS x,
          CAST(len(string_split(text, ' ')) AS BIGINT) AS y
        FROM documents),
      vcx AS (SELECT source, x AS v, CAST(COUNT(*) AS BIGINT) AS ce
        FROM d GROUP BY 1, 2),
      cumx AS (SELECT source, v, ce,
          CAST(COALESCE(SUM(ce) OVER (PARTITION BY source ORDER BY v
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
            AS cl
        FROM vcx),
      vcy AS (SELECT source, y AS v, CAST(COUNT(*) AS BIGINT) AS ce
        FROM d GROUP BY 1, 2),
      cumy AS (SELECT source, v, ce,
          CAST(COALESCE(SUM(ce) OVER (PARTITION BY source ORDER BY v
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
            AS cl
        FROM vcy),
      r AS (SELECT d.source,
          2 * cx.cl + cx.ce + 1 AS r2x, 2 * cy.cl + cy.ce + 1 AS r2y
        FROM d
        JOIN cumx cx ON cx.source = d.source AND cx.v = d.x
        JOIN cumy cy ON cy.source = d.source AND cy.v = d.y),
      m AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n,
          SUM(r2x::HUGEINT) AS sx, SUM(r2y::HUGEINT) AS sy,
          SUM(r2x::HUGEINT * r2x) AS sxx, SUM(r2y::HUGEINT * r2y) AS syy,
          SUM(r2x::HUGEINT * r2y) AS sxy
        FROM r GROUP BY source)
      SELECT source, n,
        CAST(FLOOR(CAST(n * sxy - sx * sy AS DOUBLE)
          / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
            * CAST(n * syy - sy * sy AS DOUBLE)) * 1000000)
          AS BIGINT) AS rho_micros
      FROM m
      WHERE n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
      ORDER BY source""")) { (s, dir) =>
    import s.implicits._
    val d = docs(s, dir).select($"source", $"n_chars".as("x"),
      size(split($"text", " ", -1)).cast("long").as("y"))
    def ranks(vcol: String, out: String): DataFrame = {
      val vc = d.groupBy($"source", col(vcol).as("v"))
        .agg(count(lit(1)).as("ce"))
      Skew.prefixSumsByKey(vc, "source", Seq($"v"), Seq($"ce" -> "cum_ce"))
        .select($"source", $"v",
          (lit(2) * ($"cum_ce" - $"ce") + $"ce" + 1).as(out))
    }
    val rx = ranks("x", "r2x")
    val ry = ranks("y", "r2y")
    val joined = d
      .join(rx.withColumnRenamed("source", "sx_").withColumnRenamed("v", "vx_"),
        d("source") === col("sx_") && d("x") === col("vx_"))
      .join(ry.withColumnRenamed("source", "sy_").withColumnRenamed("v", "vy_"),
        d("source") === col("sy_") && d("y") === col("vy_"))
      .select(d("source"), $"r2x", $"r2y")
    joined.groupBy($"source")
      .agg(count(lit(1)).as("n"),
        sum($"r2x".cast("decimal(38,0)")).as("sx"),
        sum($"r2y".cast("decimal(38,0)")).as("sy"),
        sum($"r2x".cast("decimal(38,0)") * $"r2x").as("sxx"),
        sum($"r2y".cast("decimal(38,0)") * $"r2y").as("syy"),
        sum($"r2x".cast("decimal(38,0)") * $"r2y").as("sxy"))
      .filter($"n" * $"sxx" - $"sx" * $"sx" > 0 &&
        $"n" * $"syy" - $"sy" * $"sy" > 0)
      .select($"source", $"n",
        floor(($"n" * $"sxy" - $"sx" * $"sy").cast("double")
          / sqrt(($"n" * $"sxx" - $"sx" * $"sx").cast("double")
            * ($"n" * $"syy" - $"sy" * $"sy").cast("double"))
          * 1e6).cast("long").as("rho_micros"))
      .orderBy($"source")
  }

  /** Kendall's τ-b (tie-corrected) between document char length and
    * token count, per source — the third rank-correlation lens next to
    * [[dSpearmanLengths]] (ρ weights by rank distance; τ counts pair
    * inversions, the more robust effect size under heavy ties, Kendall
    * '45 form). Computed via the CONTINGENCY-TABLE identity, never a
    * pair scan over rows: one hash-aggregate collapses the corpus to
    * (source, x, y, count) cells, and concordant/discordant mass is a
    * cell-pair join — O(c²) where c is bounded by the VALUE-DOMAIN
    * product (metric cardinality), not corpus size, which is what makes
    * exact τ feasible at 100 TB where the textbook O(n²) pair count
    * (or even the O(n log n) sort-based inversion count, which needs a
    * global sort per group) is not. All pair masses are exact 128-bit
    * integers; doubled tie identities (n₀₂ = n(n−1), T₂ = Σ nₓ(nₓ−1))
    * avoid halving until the one float division:
    * τ = 2(P−Q)/√((n₀₂−Tx₂)(n₀₂−Ty₂)), floor-microed. The two √ inputs
    * are cast to double SEPARATELY before multiplying (their product
    * overflows 128-bit at n ≈ 10¹²; each factor alone is safe to
    * n ≈ 10¹⁹). Zero-variance sources drop out on both engines. */
  val dKendallTau: Spec = Spec(
    "d_kendall_tau",
    oracle = Some("""
      WITH d AS (SELECT source, n_chars AS x,
          CAST(len(string_split(text, ' ')) AS BIGINT) AS y
        FROM documents),
      cells AS (SELECT source, x, y, CAST(COUNT(*) AS HUGEINT) AS c
        FROM d GROUP BY 1, 2, 3),
      pq AS (SELECT a.source,
          SUM(CASE WHEN a.y < b.y THEN a.c * b.c ELSE 0 END) AS conc,
          SUM(CASE WHEN a.y > b.y THEN a.c * b.c ELSE 0 END) AS disc
        FROM cells a JOIN cells b
          ON a.source = b.source AND a.x < b.x AND a.y <> b.y
        GROUP BY a.source),
      nn AS (SELECT source, CAST(COUNT(*) AS HUGEINT) AS n FROM d
        GROUP BY source),
      tx AS (SELECT source, SUM(nv * (nv - 1)) AS t2 FROM
          (SELECT source, CAST(COUNT(*) AS HUGEINT) AS nv FROM d
           GROUP BY source, x) GROUP BY source),
      ty AS (SELECT source, SUM(nv * (nv - 1)) AS t2 FROM
          (SELECT source, CAST(COUNT(*) AS HUGEINT) AS nv FROM d
           GROUP BY source, y) GROUP BY source),
      cc AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_cells FROM cells
        GROUP BY source)
      SELECT n.source, CAST(n.n AS BIGINT) AS n, cc.n_cells,
        CAST(COALESCE(p.conc, 0) AS BIGINT) AS concordant,
        CAST(COALESCE(p.disc, 0) AS BIGINT) AS discordant,
        CAST(FLOOR(
          CAST(2 * (COALESCE(p.conc, 0) - COALESCE(p.disc, 0)) AS DOUBLE)
          / sqrt(CAST(n.n * (n.n - 1) - t1.t2 AS DOUBLE)
               * CAST(n.n * (n.n - 1) - t2.t2 AS DOUBLE))
          * 1000000) AS BIGINT) AS tau_micros
      FROM nn n JOIN tx t1 USING (source) JOIN ty t2 USING (source)
      JOIN cc USING (source) LEFT JOIN pq p USING (source)
      WHERE n.n * (n.n - 1) - t1.t2 > 0 AND n.n * (n.n - 1) - t2.t2 > 0
      ORDER BY n.source""")) { (s, dir) =>
    import s.implicits._
    val d = docs(s, dir).select($"source", $"n_chars".as("x"),
      size(split($"text", " ", -1)).cast("long").as("y"))
    val cells = d.groupBy($"source", $"x", $"y")
      .agg(count(lit(1)).cast("decimal(38,0)").as("c"))
      .localCheckpoint() // pair join + cell count share one tiny frame
    val pq = cells.select($"source", $"x".as("x1"), $"y".as("y1"), $"c".as("c1"))
      .join(cells.select($"source", $"x".as("x2"), $"y".as("y2"), $"c".as("c2")),
        Seq("source"))
      .filter($"x1" < $"x2" && $"y1" =!= $"y2")
      .groupBy($"source").agg(
        sum(when($"y1" < $"y2", $"c1" * $"c2")
          .otherwise(lit(0).cast("decimal(38,0)"))).as("conc"),
        sum(when($"y1" > $"y2", $"c1" * $"c2")
          .otherwise(lit(0).cast("decimal(38,0)"))).as("disc"))
    // every marginal derives from the checkpointed CELL frame — the
    // corpus is scanned exactly once (the cell build); nn/ties/ncells
    // are aggregates over |cells| rows, not |corpus| rows
    val nn = cells.groupBy($"source").agg(sum($"c").as("n"))
    def ties(vcol: String): DataFrame = cells
      .groupBy($"source", col(vcol))
      .agg(sum($"c").as("nv"))
      .groupBy($"source").agg(sum($"nv" * ($"nv" - 1)).as("t2"))
    val ncells = cells.groupBy($"source").agg(count(lit(1)).as("n_cells"))
    val zeroD = lit(0).cast("decimal(38,0)")
    val joined = nn
      .join(ties("x").withColumnRenamed("t2", "tx2"), "source")
      .join(ties("y").withColumnRenamed("t2", "ty2"), "source")
      .join(ncells, "source")
      .join(pq, Seq("source"), "left")
      .select($"source", $"n", $"n_cells",
        coalesce($"conc", zeroD).as("conc"),
        coalesce($"disc", zeroD).as("disc"), $"tx2", $"ty2")
    joined
      .filter($"n" * ($"n" - 1) - $"tx2" > 0 && $"n" * ($"n" - 1) - $"ty2" > 0)
      .select($"source", $"n".cast("long").as("n"), $"n_cells",
        $"conc".cast("long").as("concordant"),
        $"disc".cast("long").as("discordant"),
        floor((lit(2) * ($"conc" - $"disc")).cast("double")
          / sqrt(($"n" * ($"n" - 1) - $"tx2").cast("double")
               * ($"n" * ($"n" - 1) - $"ty2").cast("double"))
          * 1000000).cast("long").as("tau_micros"))
      .orderBy($"source")
  }

  /** Mutual information between language and source (nats) — the
    * corpus-profile DEPENDENCE number: how much knowing a document's
    * source tells you about its language (0 ⟺ independent mixture;
    * high MI ⟺ sources are language silos, which changes how a
    * per-source sampling budget interacts with language balance). The
    * G-test statistic is 2n·MI, so this row doubles as the
    * log-likelihood-ratio independence test next to the chi-squared
    * family (ev_chi2_weekday). Float discipline: one ln + one multiply
    * per CELL with every factor cast to double SEPARATELY (nᵢ·nⱼ would
    * overflow 64-bit at n ≈ 10¹²), each term rounded to 9dp and summed
    * as DECIMAL — aggregation-order-free, the PageRank-contribution
    * discipline. Scale shape: the corpus collapses to a contingency
    * table bounded by |langs|×|sources|, never re-scanned. */
  val dLangSourceMi: Spec = Spec(
    "d_lang_source_mi",
    oracle = Some("""
      WITH d AS (SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS nij
        FROM documents GROUP BY 1, 2),
      nl AS (SELECT lang, CAST(SUM(nij) AS BIGINT) AS ni FROM d GROUP BY 1),
      ns AS (SELECT source, CAST(SUM(nij) AS BIGINT) AS nj FROM d GROUP BY 1),
      nn AS (SELECT CAST(SUM(nij) AS BIGINT) AS n FROM d),
      t AS (SELECT d.lang, d.source, d.nij,
          CAST(ROUND((CAST(d.nij AS DOUBLE) / CAST(nn.n AS DOUBLE)) *
            ln((CAST(d.nij AS DOUBLE) * CAST(nn.n AS DOUBLE))
              / (CAST(nl.ni AS DOUBLE) * CAST(ns.nj AS DOUBLE))), 9)
            AS DECIMAL(18,9)) AS t
        FROM d JOIN nl USING (lang) JOIN ns USING (source) CROSS JOIN nn),
      tot AS (SELECT SUM(t) AS mi FROM t)
      SELECT t.lang, t.source, t.nij, CAST(t.t AS DOUBLE) AS mi_term,
        CAST(tot.mi AS DOUBLE) AS mi_nats
      FROM t CROSS JOIN tot
      ORDER BY t.lang, t.source""")) { (s, dir) =>
    import s.implicits._
    val d = docs(s, dir).groupBy($"lang", $"source")
      .agg(count(lit(1)).as("nij"))
      .localCheckpoint() // contingency table: marginals + terms share it
    val nl = d.groupBy($"lang").agg(sum($"nij").as("ni"))
    val ns = d.groupBy($"source").agg(sum($"nij").as("nj"))
    val nn = d.agg(sum($"nij").as("n"))
    val terms = d.join(nl, "lang").join(ns, "source")
      .crossJoin(broadcast(nn))
      .select($"lang", $"source", $"nij",
        round(($"nij".cast("double") / $"n".cast("double")) *
          log(($"nij".cast("double") * $"n".cast("double"))
            / ($"ni".cast("double") * $"nj".cast("double"))), 9)
          .cast("decimal(18,9)").as("t"))
      .localCheckpoint() // cell terms feed both the rows and the total
    val tot = terms.agg(sum($"t").as("mi"))
    terms.crossJoin(broadcast(tot))
      .select($"lang", $"source", $"nij", $"t".cast("double").as("mi_term"),
        $"mi".cast("double").as("mi_nats"))
      .orderBy($"lang", $"source")
  }

  /** One-way ANOVA F of document length across sources — the
    * parametric complement of [[dKruskalWallis]] (mean shifts vs rank
    * shifts; a profile reports both). Everything up to the final
    * ratio is EXACT integer arithmetic: per-group (n, Σx, Σx²) and the
    * between-group term Σ sᵢ²/nᵢ carried as exact micros via the split
    * floor identity, so SSB·1e6 and SSW·1e6 are exact 128-bit
    * integers; with the shared 1e6 scale cancelling in
    * F = (SSB/(k−1))/(SSW/(N−k)), the statistic needs exactly ONE
    * float division: F = ((B−T)·(N−k)) / ((Q·1e6−B)·(k−1)) with both
    * products still exact. */
  val dAnovaLengths: Spec = Spec(
    "d_anova_lengths",
    oracle = Some("""
      WITH g AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n,
          SUM(n_chars::HUGEINT) AS s, SUM(n_chars::HUGEINT * n_chars) AS q
        FROM documents GROUP BY source),
      b AS (SELECT CAST(COUNT(*) AS BIGINT) AS k,
          SUM((s * s // n) * 1000000 + ((s * s % n) * 1000000) // n) AS bm,
          SUM(n) AS nn, SUM(s) AS st, SUM(q) AS qt
        FROM g),
      t AS (SELECT k, bm, nn, qt,
          (st * st // nn) * 1000000 + ((st * st % nn) * 1000000) // nn AS tm
        FROM b)
      SELECT CAST(nn AS BIGINT) AS nn, k AS n_groups,
        CAST(FLOOR(CAST((bm - tm) * (nn - k) AS DOUBLE)
          / CAST((qt * 1000000 - bm) * (k - 1) AS DOUBLE) * 1000000)
          AS BIGINT) AS f_micros
      FROM t WHERE qt * 1000000 - bm > 0 AND k > 1""")) { (s, dir) =>
    import s.implicits._
    val g = docs(s, dir).groupBy($"source")
      .agg(count(lit(1)).as("n"),
        sum($"n_chars".cast("decimal(38,0)")).as("s"),
        sum($"n_chars".cast("decimal(38,0)") * $"n_chars").as("q"))
    g.agg(count(lit(1)).as("k"),
        sum(expr("cast(s * s div n as decimal(38,0)) * 1000000" +
          " + ((s * s) % n) * 1000000 div n")).as("bm"),
        sum($"n").as("nn"), sum($"s").as("st"), sum($"q").as("qt"))
      .select($"k", $"bm", $"nn", $"qt",
        expr("cast(st * st div nn as decimal(38,0)) * 1000000" +
          " + ((st * st) % nn) * 1000000 div nn").as("tm"))
      .filter($"qt" * 1000000 - $"bm" > 0 && $"k" > 1)
      .select($"nn".cast("long").as("nn"), $"k".as("n_groups"),
        floor((($"bm" - $"tm") * ($"nn" - $"k")).cast("double")
          / (($"qt" * 1000000 - $"bm") * ($"k" - 1)).cast("double")
          * 1e6).cast("long").as("f_micros"))
  }

  /** TERM BURSTINESS (Church & Gale '95): the dispersion index
    * D = var(tf)/mean(tf) over ALL corpus documents (zeros included)
    * for the 20 highest-df terms — D ≈ 1 is Poisson (function words,
    * safe to model with unigram stats), D ≫ 1 is bursty content
    * vocabulary (a doc that uses the term uses it repeatedly; the
    * signal behind two-Poisson/DFR retrieval models and a boilerplate
    * tell when a "content" word shows D ≈ 1). NO float anywhere: with
    * N docs and per-term (Σtf, Σtf²),
    * D·1000 = (N·Σtf² − (Σtf)²)·1000 ÷ ((N−1)·Σtf) exactly, and the
    * bursty flag is the cross-multiplied D > 1 comparison.
    *
    * Scale shape: one (doc, term) tf hash agg, one per-term moment
    * agg (map-side combined — zeros enter via N, never as rows), a
    * 20-row TakeOrderedAndProject. */
  val dTermBurstiness: Spec = Spec(
    "d_term_burstiness",
    oracle = Some("""
      WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
        FROM documents),
      tf AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
        FROM tok WHERE term <> '' GROUP BY 1, 2),
      nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
      m AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df,
          CAST(SUM(tf) AS BIGINT) AS s1, SUM(tf::HUGEINT * tf) AS s2
        FROM tf GROUP BY term),
      d AS (SELECT m.term, m.df, m.s1, nn.n,
          (nn.n::HUGEINT * m.s2 - m.s1::HUGEINT * m.s1) AS vnum
        FROM m CROSS JOIN nn WHERE m.s1 > 0)
      SELECT term, df, s1 AS total_tf,
        CAST(vnum * 1000 // ((n - 1)::HUGEINT * s1) AS BIGINT)
          AS dispersion_milli,
        vnum > (n - 1)::HUGEINT * s1 AS bursty
      FROM d ORDER BY df DESC, term LIMIT 20""")) { (s, dir) =>
    import s.implicits._
    val tf = docs(s, dir)
      .select($"doc_id", explode(split($"text", " ", -1)).as("term"))
      .filter($"term" =!= "")
      .groupBy($"doc_id", $"term").agg(count(lit(1)).as("tf"))
    val nn = broadcast(docs(s, dir).agg(count(lit(1)).as("n")))
    val m = tf.groupBy($"term")
      .agg(count(lit(1)).as("df"), sum($"tf").cast("long").as("s1"),
        sum($"tf".cast("decimal(38,0)") * $"tf").as("s2"))
    m.crossJoin(nn).filter($"s1" > 0)
      .withColumn("vnum",
        $"n".cast("decimal(38,0)") * $"s2" -
          $"s1".cast("decimal(38,0)") * $"s1")
      .select($"term", $"df", $"s1".as("total_tf"),
        expr("cast(vnum * 1000 div (cast(n - 1 as decimal(38,0)) * s1)" +
          " as bigint)").as("dispersion_milli"),
        ($"vnum" > ($"n" - 1).cast("decimal(38,0)") * $"s1").as("bursty"))
      .orderBy($"df".desc, $"term").limit(20)
  }

  /** CHI-SQUARE FEATURE SELECTION: the top-5 terms most associated
    * with each language by the χ² statistic over the doc-level
    * term×lang presence contingency — the classic supervised
    * feature-selection / per-class keyword surface (Yang & Pedersen
    * '97) a corpus card prints next to the unsupervised
    * [[dTfidfTopTerms]]. Per (term, lang) cell: a = lang docs with the
    * term, b = other-lang docs with it, c = lang docs without, d = the
    * rest; χ² = N(ad−bc)² / ((a+b)(c+d)(a+c)(b+d)).
    *
    * Engine parity: every contingency cell is an exact integer;
    * numerator and denominator are exact 128-bit products
    * (HUGEINT / DECIMAL(38,0) — bounded by N⁴·N < 10^34 at any
    * realistic verify scale) and the statistic is ONE float division,
    * surfaced as floor-micros; the top-5 tie-break (χ² desc, term asc)
    * is total.
    *
    * Scale shape: per-doc term dedup happens MAP-SIDE
    * (array_distinct before the explode — no doc-level distinct
    * shuffle); (term, lang) counts are one hash agg, df folds from
    * them (a doc has exactly one lang, so df = Σ_lang a — no second
    * corpus pass); lang totals broadcast. The ranking window runs on
    * the df≥5-filtered (term, lang) AGGREGATE frame (vocab-bounded,
    * not corpus-bounded); with the WindowTopKToAgg rule installed it
    * collapses further to the bounded map-side TopNRows aggregate. */
  val dChi2Terms: Spec = Spec(
    "d_chi2_terms",
    bench = true, // r12 wave-3 row: corpus explode + contingency ranking
    oracle = Some("""
      WITH tok AS (SELECT doc_id, lang,
          unnest(list_distinct(string_split(text, ' '))) AS term
        FROM documents),
      tc AS (SELECT term, lang, CAST(COUNT(*) AS BIGINT) AS a
        FROM tok WHERE term <> '' GROUP BY 1, 2),
      tdf AS (SELECT term, CAST(SUM(a) AS BIGINT) AS df FROM tc GROUP BY 1),
      nl AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_lang
        FROM documents GROUP BY 1),
      nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
      cells AS (SELECT tc.term, tc.lang, tc.a,
          tdf.df - tc.a AS b, nl.n_lang - tc.a AS c,
          nn.n - tdf.df - (nl.n_lang - tc.a) AS d, nn.n AS n
        FROM tc JOIN tdf USING (term) JOIN nl USING (lang) CROSS JOIN nn
        WHERE tdf.df >= 5),
      chi AS (SELECT term, lang, a,
          CAST(n::HUGEINT
               * (a::HUGEINT * d - b::HUGEINT * c)
               * (a::HUGEINT * d - b::HUGEINT * c) AS DOUBLE)
            / CAST((a::HUGEINT + b) * (c::HUGEINT + d)
                   * (a::HUGEINT + c) * (b::HUGEINT + d) AS DOUBLE) AS chi2
        FROM cells
        WHERE (a::HUGEINT + b) * (c::HUGEINT + d)
              * (a::HUGEINT + c) * (b::HUGEINT + d) > 0),
      rk AS (SELECT lang, term, a, chi2,
          row_number() OVER (PARTITION BY lang ORDER BY chi2 DESC, term)
            AS rank
        FROM chi)
      SELECT lang, CAST(rank AS BIGINT) AS rank, term,
        a AS n_docs_lang_term,
        CAST(FLOOR(chi2 * 1000000) AS BIGINT) AS chi2_micros
      FROM rk WHERE rank <= 5 ORDER BY lang, rank""")) { (s, dir) =>
    import s.implicits._
    val d = docs(s, dir)
    val tok = d.select($"doc_id", $"lang",
        explode(array_distinct(split($"text", " ", -1))).as("term"))
      .filter($"term" =!= "")
    val tc = tok.groupBy($"term", $"lang").agg(count(lit(1)).as("a"))
      .localCheckpoint() // (term, lang) cells feed df AND the chi frame
    val tdf = tc.groupBy($"term").agg(sum($"a").as("df"))
    val nl = broadcast(d.groupBy($"lang").agg(count(lit(1)).as("n_lang")))
    val nn = broadcast(d.agg(count(lit(1)).as("n")))
    val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
    val cells = tc.join(tdf, "term").filter($"df" >= 5)
      .join(nl, "lang").crossJoin(nn)
      .select($"term", $"lang", $"a", ($"df" - $"a").as("b"),
        ($"n_lang" - $"a").as("c"),
        ($"n" - $"df" - ($"n_lang" - $"a")).as("d"), $"n")
    val diff = dec($"a") * dec($"d") - dec($"b") * dec($"c")
    val den = (dec($"a") + dec($"b")) * (dec($"c") + dec($"d")) *
      (dec($"a") + dec($"c")) * (dec($"b") + dec($"d"))
    val chi = cells
      .select($"term", $"lang", $"a",
        ((dec($"n") * diff * diff).cast("double") / den.cast("double"))
          .as("chi2"), den.as("den"))
      .filter($"den" > 0)
    chi.withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy($"lang").orderBy($"chi2".desc, $"term")))
      .filter($"rank" <= 5)
      .select($"lang", $"rank".cast("long").as("rank"), $"term",
        $"a".as("n_docs_lang_term"),
        floor($"chi2" * 1e6).cast("long").as("chi2_micros"))
      .orderBy($"lang", $"rank")
  }

  /** WELCH'S UNEQUAL-VARIANCE t-TEST of mean document length between
    * every source pair — the pairwise drill-down behind
    * [[dAnovaLengths]]'s single omnibus F (ANOVA says "some source
    * differs"; Welch says WHICH pairs, without assuming the pooled
    * variance classic t requires — the right default when sources have
    * different length regimes). Reports t, the Welch–Satterthwaite
    * effective df, and a z-approximation significance flag at 95%
    * (df is in the thousands here, where t and z are
    * indistinguishable; the flag's criterion is documented, not
    * hidden).
    *
    * Engine parity: per-source moments (n, Σx, Σx²) are exact
    * DECIMAL(38,0); the variance-over-n ratio collapses to ONE float
    * division of exact integers, rᵢ = (nᵢΣx² − (Σx)²) / (nᵢ²(nᵢ−1)),
    * and every later op (se² = r_a + r_b with the fixed a-then-b
    * operand order, the subtraction, sqrt, the df ratio) is a
    * correctly-rounded IEEE double op — identical bits on both
    * engines, surfaced as floor-micros.
    *
    * Scale shape: one hash agg to |sources| moment rows; the pair
    * frame is the tiny self-join of that agg (|sources|² rows, never
    * row-level data). */
  val dWelchTtest: Spec = Spec(
    "d_welch_ttest",
    oracle = Some("""
      WITH g AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n,
          SUM(n_chars::HUGEINT) AS s, SUM(n_chars::HUGEINT * n_chars) AS q
        FROM documents GROUP BY source),
      p AS (SELECT a.source AS source_a, b.source AS source_b,
          a.n AS na, b.n AS nb,
          CAST(a.n * a.q - a.s * a.s AS DOUBLE)
            / CAST(a.n::HUGEINT * a.n * (a.n - 1) AS DOUBLE) AS ra,
          CAST(b.n * b.q - b.s * b.s AS DOUBLE)
            / CAST(b.n::HUGEINT * b.n * (b.n - 1) AS DOUBLE) AS rb,
          CAST(a.s AS DOUBLE) / CAST(a.n AS DOUBLE)
            - CAST(b.s AS DOUBLE) / CAST(b.n AS DOUBLE) AS dm
        FROM g a JOIN g b ON a.source < b.source
        WHERE a.n > 1 AND b.n > 1),
      w AS (SELECT source_a, source_b, na, nb,
          dm / sqrt(ra + rb) AS t,
          (ra + rb) * (ra + rb)
            / (ra * ra / CAST(na - 1 AS DOUBLE)
               + rb * rb / CAST(nb - 1 AS DOUBLE)) AS df
        FROM p)
      SELECT source_a, source_b, na AS n_a, nb AS n_b,
        CAST(FLOOR(t * 1000000) AS BIGINT) AS t_micros,
        CAST(FLOOR(df * 1000000) AS BIGINT) AS df_micros,
        abs(t) > 1.96e0 AS significant_95
      FROM w ORDER BY source_a, source_b""")) { (s, dir) =>
    import s.implicits._
    val g = docs(s, dir).groupBy($"source")
      .agg(count(lit(1)).as("n"),
        sum($"n_chars".cast("decimal(38,0)")).as("s"),
        sum($"n_chars".cast("decimal(38,0)") * $"n_chars").as("q"))
      .filter($"n" > 1)
      .localCheckpoint() // tiny moment frame, both sides of the pair join
    def side(tag: String) = g.select(
      $"source".as(s"source_$tag"), $"n".as(s"n$tag"),
      $"s".as(s"s$tag"), $"q".as(s"q$tag"))
    def ratio(tag: String) =
      (col(s"n$tag") * col(s"q$tag") - col(s"s$tag") * col(s"s$tag"))
        .cast("double") /
        // n as decimal(38,0) BEFORE the cubic product: LongType n*n*(n-1)
        // wraps silently past n ≈ 2.1M (n³ > 2⁶³); exact decimal then one
        // rounding to double matches the oracle's HUGEINT-then-DOUBLE.
        (col(s"n$tag").cast("decimal(38,0)") * col(s"n$tag") *
          (col(s"n$tag") - 1)).cast("double")
    val p = side("a").join(side("b"), $"source_a" < $"source_b")
      .select($"source_a", $"source_b", $"na", $"nb",
        ratio("a").as("ra"), ratio("b").as("rb"),
        ($"sa".cast("double") / $"na".cast("double")
          - $"sb".cast("double") / $"nb".cast("double")).as("dm"))
    val t = $"dm" / sqrt($"ra" + $"rb")
    val df = ($"ra" + $"rb") * ($"ra" + $"rb") /
      ($"ra" * $"ra" / ($"na" - 1).cast("double")
        + $"rb" * $"rb" / ($"nb" - 1).cast("double"))
    p.select($"source_a", $"source_b", $"na".as("n_a"), $"nb".as("n_b"),
        floor(t * 1e6).cast("long").as("t_micros"),
        floor(df * 1e6).cast("long").as("df_micros"),
        (abs(t) > 1.96).as("significant_95"))
      .orderBy($"source_a", $"source_b")
  }

  /** DISTRIBUTION-FREE 95% CONFIDENCE INTERVAL for the per-source
    * median length, from exact order statistics (the binomial-rank
    * interval, normal-approximated ranks l = ⌊(n − 1.96√n)/2⌋,
    * u = ⌈1 + (n + 1.96√n)/2⌉ — the textbook nonparametric CI that
    * needs NO distributional assumption, only order statistics): the
    * interval [x₍l₎, x₍u₎] covers the true median with ≥ 95%
    * probability. The point estimate is the same lower median
    * [[dMadLengths]] reports; the CI width is the profile's "how
    * settled is this median" signal.
    *
    * Exact and sort-free: all three ranks are selected from ONE
    * value-keyed rank scaffold (value v holds rank r iff its
    * cumulative run covers r — a bounded-key prefix sum, never a row
    * sort); the only float is the 1.96√n rank arithmetic, identical
    * IEEE on both engines before an integer floor/ceil. */
  val dMedianCi: Spec = Spec(
    "d_median_ci",
    oracle = Some("""
      WITH vc AS (SELECT source, n_chars AS v, CAST(COUNT(*) AS BIGINT) AS ce
          FROM documents GROUP BY 1, 2),
      cum AS (SELECT source, v, ce,
          CAST(COALESCE(SUM(ce) OVER (PARTITION BY source ORDER BY v
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
            AS cl
        FROM vc),
      n AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n
        FROM documents GROUP BY source),
      r AS (SELECT source, n,
          GREATEST(CAST(1 AS BIGINT),
            CAST(FLOOR((n - 1.96e0 * sqrt(n::DOUBLE)) / 2) AS BIGINT)) AS lo,
          (n + 1) // 2 AS md,
          LEAST(n,
            CAST(CEIL(1.0e0 + (n + 1.96e0 * sqrt(n::DOUBLE)) / 2) AS BIGINT))
            AS hi
        FROM n),
      t AS (SELECT source, n, 'lo' AS tag, lo AS rk FROM r
        UNION ALL SELECT source, n, 'md', md FROM r
        UNION ALL SELECT source, n, 'hi', hi FROM r),
      p AS (SELECT t.source, t.n, t.tag, t.rk, c.v
        FROM t JOIN cum c ON c.source = t.source
        WHERE c.cl < t.rk AND t.rk <= c.cl + c.ce)
      SELECT source, n,
        MAX(CASE WHEN tag = 'md' THEN v END) AS median,
        MAX(CASE WHEN tag = 'lo' THEN v END) AS ci_lo,
        MAX(CASE WHEN tag = 'hi' THEN v END) AS ci_hi,
        MAX(CASE WHEN tag = 'lo' THEN rk END) AS lo_rank,
        MAX(CASE WHEN tag = 'hi' THEN rk END) AS hi_rank
      FROM p GROUP BY source, n ORDER BY source""")) { (s, dir) =>
    import s.implicits._
    val d = docs(s, dir).select($"source", $"n_chars".as("v"))
    val vc = d.groupBy($"source", $"v").agg(count(lit(1)).as("ce"))
    val cum = Skew.prefixSumsByKey(vc, "source", Seq($"v"),
        Seq($"ce" -> "cum_ce"))
      .withColumn("cl", $"cum_ce" - $"ce")
    val n = d.groupBy($"source").agg(count(lit(1)).as("n"))
    val half = lit(1.96) * sqrt($"n".cast("double"))
    val r = n.select($"source", $"n",
      greatest(lit(1L),
        floor(($"n".cast("double") - half) / lit(2.0)).cast("long")).as("lo"),
      expr("(n + 1) div 2").as("md"),
      least($"n",
        ceil(lit(1.0) + ($"n".cast("double") + half) / lit(2.0)).cast("long"))
        .as("hi"))
    val t = r.select($"source", $"n", lit("lo").as("tag"), $"lo".as("rk"))
      .unionAll(r.select($"source", $"n", lit("md"), $"md"))
      .unionAll(r.select($"source", $"n", lit("hi"), $"hi"))
    t.join(cum, Seq("source"))
      .filter($"cl" < $"rk" && $"rk" <= $"cl" + $"ce")
      .groupBy($"source", $"n")
      .agg(max(when($"tag" === "md", $"v")).as("median"),
        max(when($"tag" === "lo", $"v")).as("ci_lo"),
        max(when($"tag" === "hi", $"v")).as("ci_hi"),
        max(when($"tag" === "lo", $"rk")).as("lo_rank"),
        max(when($"tag" === "hi", $"rk")).as("hi_rank"))
      .orderBy($"source")
  }

  /** Median absolute deviation of document length per source — THE
    * robust scale estimate (50% breakdown vs stddev's 0%) a corpus
    * profile wants for length outliers. Exact and sort-free twice
    * over: the per-source lower median is selected from the
    * value-keyed rank scaffold (value v is the median iff its
    * cumulative run covers rank (n+1)÷2 — one bounded-key prefix sum,
    * never a row sort), absolute deviations from it re-enter the SAME
    * selection, and every compared value is an exact BIGINT. */
  val dMadLengths: Spec = Spec(
    "d_mad_lengths",
    oracle = Some("""
      WITH vc AS (SELECT source, n_chars AS v, CAST(COUNT(*) AS BIGINT) AS ce
          FROM documents GROUP BY 1, 2),
      cum AS (SELECT source, v, ce,
          CAST(COALESCE(SUM(ce) OVER (PARTITION BY source ORDER BY v
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
            AS cl
        FROM vc),
      n AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n
        FROM documents GROUP BY source),
      med AS (SELECT c.source, n.n, c.v AS median
        FROM cum c JOIN n ON n.source = c.source
        WHERE c.cl < (n.n + 1) // 2 AND (n.n + 1) // 2 <= c.cl + c.ce),
      dev AS (SELECT d.source, abs(d.n_chars - m.median) AS v
        FROM documents d JOIN med m ON m.source = d.source),
      dvc AS (SELECT source, v, CAST(COUNT(*) AS BIGINT) AS ce
        FROM dev GROUP BY 1, 2),
      dcum AS (SELECT source, v, ce,
          CAST(COALESCE(SUM(ce) OVER (PARTITION BY source ORDER BY v
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
            AS cl
        FROM dvc)
      SELECT m.source, m.n, m.median, c.v AS mad
      FROM dcum c JOIN med m ON m.source = c.source
      WHERE c.cl < (m.n + 1) // 2 AND (m.n + 1) // 2 <= c.cl + c.ce
      ORDER BY m.source""")) { (s, dir) =>
    import s.implicits._
    val d = docs(s, dir)
    // value v is the group's lower median iff its cumulative count run
    // covers rank (n+1)÷2 — one scaffold pass, reused for both rounds
    def lowerMedian(vals: DataFrame, out: String): DataFrame = {
      val vc = vals.groupBy($"source", $"v").agg(count(lit(1)).as("ce"))
      val cum = Skew.prefixSumsByKey(vc, "source", Seq($"v"),
          Seq($"ce" -> "cum_ce"))
        .withColumn("cl", $"cum_ce" - $"ce")
      val n = vals.groupBy($"source").agg(count(lit(1)).as("n"))
      cum.join(n, "source")
        .filter($"cl" < expr("(n + 1) div 2") &&
          expr("(n + 1) div 2") <= $"cl" + $"ce")
        .select($"source", $"n", $"v".as(out))
    }
    val med = lowerMedian(d.select($"source", $"n_chars".as("v")), "median")
    val dev = d.join(med.select($"source", $"median"), "source")
      .select($"source", abs($"n_chars" - $"median").as("v"))
    med.join(lowerMedian(dev, "mad").select($"source", $"mad"), "source")
      .select($"source", $"n", $"median", $"mad")
      .orderBy($"source")
  }

  /** Isotonic calibration ([[graft.ops.Isotonic.pavFit]]): per
    * language, the best NON-DECREASING map from a length-bucket score
    * to the rate of 'q'-bearing docs (a label whose raw rate is
    * genuinely non-monotone in the score, so pooling fires) — the
    * standard way any ranking
    * score becomes a probability without a parametric link (Platt's
    * logistic alternative assumes a shape; PAV doesn't). The Spark
    * side runs the exact-integer Pool-Adjacent-Violators stack per key
    * (cross-multiplied mean compares, no float in the fit); the oracle
    * needs no stack because PAV's fitted value equals the minimax
    * max_{j≤i} min_{k≥i} mean(y[j..k]) and floor commutes with min and
    * max — so min/max over FLOORED integer-micros range means (O(n³)
    * pairs over the BUCKETED score domain, fine at oracle scale) lands
    * on the identical integer. A green hash therefore proves the
    * sequential PAV fold against the definitional characterization,
    * not a shared code path. */
  val dIsotonicCalibration: Spec = Spec(
    "d_isotonic_calibration",
    oracle = Some("""
      WITH pts AS (
        SELECT lang AS key, n_chars // 100 AS x,
          CAST(COUNT(*) AS BIGINT) AS w,
          CAST(COUNT(CASE WHEN regexp_matches(text, 'q') THEN 1 END)
            AS BIGINT) AS sy
        FROM documents GROUP BY 1, 2),
      o AS (SELECT key, x, w, sy,
          CAST(row_number() OVER (PARTITION BY key ORDER BY x) AS BIGINT) AS rn,
          CAST(SUM(w) OVER (PARTITION BY key ORDER BY x) AS BIGINT) AS cw,
          CAST(SUM(sy) OVER (PARTITION BY key ORDER BY x) AS BIGINT) AS cy
        FROM pts),
      pairs AS (
        SELECT j.key, j.rn AS j, k.rn AS k,
          (1000000 * (k.cy - (j.cy - j.sy))) // (k.cw - (j.cw - j.w)) AS m
        FROM o j JOIN o k ON k.key = j.key AND k.rn >= j.rn),
      inner_ AS (
        SELECT p.key, p.j, i.rn AS i, MIN(p.m) AS minm
        FROM pairs p JOIN o i ON i.key = p.key AND p.k >= i.rn
        WHERE p.j <= i.rn
        GROUP BY 1, 2, 3),
      fit AS (
        SELECT key, i, MAX(minm) AS fitted_micros
        FROM inner_ GROUP BY key, i)
      SELECT o.key AS lang, o.x, o.w, o.sy AS n_pos, f.fitted_micros
      FROM o JOIN fit f ON f.key = o.key AND f.i = o.rn
      ORDER BY lang, x""")) { (s, dir) =>
    import s.implicits._
    val pts = docs(s, dir)
      .groupBy($"lang".as("key"), expr("n_chars div 100").as("x"))
      .agg(count(lit(1)).as("w"),
        sum(when($"text".rlike("q"), 1L).otherwise(0L)).as("sy"))
    graft.ops.Isotonic.pavFit(pts)
      .select($"key".as("lang"), $"x", $"w", $"sy".as("n_pos"),
        $"fitted_micros")
      .orderBy($"lang", $"x")
  }

  val dHashEmbedding: Spec = Spec(
    "d_hash_embedding",
    oracle = Some("""
      WITH tok AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
      h AS (
        SELECT doc_id,
          ('0x' || substr(md5(w), 1, 12))::BIGINT % 16 AS dim,
          CASE WHEN (('0x' || substr(md5(w), 1, 12))::BIGINT >> 4) % 2 = 0
            THEN 1 ELSE -1 END AS s
        FROM tok)
      SELECT doc_id, CAST(dim AS BIGINT) AS dim,
        CAST(SUM(s) AS BIGINT) AS val
      FROM h GROUP BY doc_id, dim ORDER BY doc_id, dim""")) { (s, dir) =>
    import s.implicits._
    val tok = docs(s, dir)
      .select($"doc_id", explode(Text.tokens($"text")).as("w"))
    val h = conv(substring(md5($"w"), 1, 12), 16, 10).cast("long")
    tok
      .select($"doc_id", (h % 16).as("dim"),
        when(shiftright(h, 4) % 2 === 0, 1L).otherwise(-1L).as("s"))
      .groupBy($"doc_id", $"dim")
      .agg(sum($"s").cast("long").as("val"))
      .orderBy($"doc_id", $"dim")
  }

  /** CCNet perplexity bands (Wenzek et al. 2020, arXiv:1911.00359):
    * rank documents within their language by LM score and cut into
    * head / middle / tail terciles — THE classic corpus-quality
    * partition (CCNet trains on the head, drops or downweights the
    * tail). The LM is the repo's bigram model ([[dBigramLm]], reused
    * verbatim so the score column is oracle-exact); low avg log-prob
    * means high perplexity, so the ascending-rank bottom tercile is
    * the tail.
    *
    * Scale shape: scoring inherits [[dBigramLm]]'s one-explode model
    * build; within-language ranking is [[Skew.prefixSumByKey]]
    * (range-partitioned partials + broadcast offsets), NOT a
    * per-language window funneling each language through one reducer;
    * band cut is integer division on both sides (never ntile). Docs
    * with <2 tokens have no bigrams and drop out on both sides. */
  val dPerplexityBand: Spec = Spec(
    "d_perplexity_band",
    oracle = Some("""
      WITH toks AS (
        SELECT doc_id, string_split(text,' ') AS l FROM documents),
      bi AS (
        SELECT doc_id, unnest(list_transform(range(1, len(l)),
          i -> array_to_string(l[i:i+1], ' '))) AS g
        FROM toks WHERE len(l) >= 2),
      cb AS (SELECT g, CAST(COUNT(*) AS DOUBLE) AS cb FROM bi GROUP BY g),
      c1 AS (SELECT string_split(g,' ')[1] AS w1, SUM(cb) AS c1
             FROM cb GROUP BY 1),
      v AS (SELECT CAST(COUNT(DISTINCT w) AS DOUBLE) AS v
            FROM (SELECT unnest(l) AS w FROM toks)),
      lp AS (
        SELECT bi.doc_id,
          CAST(round(log10((cb.cb + 1) / (c1.c1 + v.v)), 6)
            AS DECIMAL(18,6)) AS lp
        FROM bi JOIN cb ON bi.g = cb.g
          JOIN c1 ON string_split(bi.g,' ')[1] = c1.w1
          CROSS JOIN v),
      doc AS (
        SELECT doc_id,
          FLOOR(CAST(SUM(lp) AS DOUBLE) / COUNT(*) * 1e6) / 1e6 AS avg_logprob
        FROM lp GROUP BY doc_id),
      ranked AS (
        SELECT doc.doc_id, d.lang, doc.avg_logprob,
          row_number() OVER (PARTITION BY d.lang
            ORDER BY doc.avg_logprob, doc.doc_id) AS rn,
          COUNT(*) OVER (PARTITION BY d.lang) AS cnt
        FROM doc JOIN documents d ON doc.doc_id = d.doc_id)
      SELECT doc_id, lang, avg_logprob,
        CASE (rn - 1) * 3 // cnt WHEN 0 THEN 'tail' WHEN 1 THEN 'middle'
          ELSE 'head' END AS band
      FROM ranked ORDER BY doc_id""")) { (s, dir) =>
    import s.implicits._
    val scored = dBigramLm.fn(s, dir).select($"doc_id", $"avg_logprob")
    val withLang = scored.join(
      docs(s, dir).select($"doc_id", $"lang"), "doc_id")
    val ranked = Skew.prefixSumByKey(withLang, "lang",
      Seq($"avg_logprob", $"doc_id"), lit(1L), "rn")
    val counts = ranked.groupBy($"lang").agg(count(lit(1)).as("cnt"))
    ranked.join(broadcast(counts), "lang")
      .withColumn("t", expr("(rn - 1) * 3 div cnt"))
      .select($"doc_id", $"lang", $"avg_logprob",
        when($"t" === 0, "tail").when($"t" === 1, "middle")
          .otherwise("head").as("band"))
      .orderBy($"doc_id")
  }

  /** Per-language quality DECILES of the unigram-LM score — the
    * CCNet head/middle/tail policy generalized to 10 buckets: rank
    * docs within their language by score, bucket by rank decile, and
    * report each bucket's population and score range (the table a
    * curriculum or head-only filter reads its cutoffs from).
    *
    * Scale shape: ranking within language is [[Skew.prefixSumByKey]]
    * over value=1 (range-partitioned partials + broadcast offsets) —
    * NOT `row_number() OVER (PARTITION BY lang ...)`, which funnels
    * every doc of a language through one reducer at corpus scale. The
    * oracle states exactly that window form; TrainingPrepSpec pins the
    * two equal elsewhere. Bucket math is integer div on BOTH sides
    * (never a double ntile — DuckDB's ntile spreads remainders
    * differently). */
  val dScoreDeciles: Spec = Spec(
    "d_score_deciles",
    oracle = Some("""
      WITH tok AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
      vocab AS (
        SELECT w, CAST(COUNT(*) AS BIGINT) AS c FROM tok GROUP BY w),
      tot AS (SELECT CAST(SUM(c) AS BIGINT) AS total FROM vocab),
      scored AS (
        SELECT tok.doc_id,
          CAST(round(log10(CAST(c AS DOUBLE) / CAST(total AS DOUBLE)), 6)
            AS DECIMAL(18,6)) AS lp
        FROM tok JOIN vocab ON tok.w = vocab.w CROSS JOIN tot),
      doc AS (
        SELECT doc_id,
          FLOOR(CAST(SUM(lp) AS DOUBLE) / COUNT(*) * 1000000) / 1000000
            AS score
        FROM scored GROUP BY doc_id),
      ranked AS (
        SELECT d.lang, doc.score,
          row_number() OVER (PARTITION BY d.lang
            ORDER BY doc.score, doc.doc_id) AS rn,
          COUNT(*) OVER (PARTITION BY d.lang) AS cnt
        FROM doc JOIN documents d ON doc.doc_id = d.doc_id)
      SELECT lang, CAST((rn - 1) * 10 // cnt + 1 AS BIGINT) AS decile,
        COUNT(*) AS n_docs,
        MIN(score) AS min_score, MAX(score) AS max_score
      FROM ranked GROUP BY lang, decile ORDER BY lang, decile""")) { (s, dir) =>
    import s.implicits._
    val scores = graft.ops.Quality.unigramLmScores(
        docs(s, dir).select($"doc_id", Text.tokens($"text").as("toks")),
        "doc_id", "toks")
      .select($"doc_id", $"avg_logprob".as("score"))
    val withLang = scores.join(
      docs(s, dir).select($"doc_id", $"lang"), "doc_id")
    val ranked = Skew.prefixSumByKey(withLang, "lang",
      Seq($"score", $"doc_id"), lit(1L), "rn")
    val counts = ranked.groupBy($"lang").agg(count(lit(1)).as("cnt"))
    ranked.join(broadcast(counts), "lang")
      .withColumn("decile", expr("(rn - 1) * 10 div cnt + 1").cast("long"))
      .groupBy($"lang", $"decile")
      .agg(count(lit(1)).as("n_docs"),
        min($"score").as("min_score"), max($"score").as("max_score"))
      .orderBy($"lang", $"decile")
  }

  /** Deterministic source-interleaved training manifest via STRIDE
    * SCHEDULING: doc k of a source with n_s docs sits at stride key
    * (2k−1)/n_s ∈ (0,2), so ordering by the key interleaves sources
    * proportionally to their size (source s appears every ~N/n_s
    * positions) — the "don't feed the trainer a source-sorted corpus"
    * manifest, reproducible because within-source order is the hash48
    * permutation.
    *
    * Scale shape: within-source rank is [[Skew.prefixSumByKey]];
    * the global sequence number is [[Skew.globalRowNumber]]
    * (range-partition + per-partition rank + broadcast offsets) — no
    * single-reducer global window anywhere. The stride key is one IEEE
    * division of small exact integers — bit-identical across engines,
    * and the (stride, source, doc_id) sort key is total. */
  val dSourceInterleave: Spec = Spec(
    "d_source_interleave",
    oracle = Some("""
      WITH h AS (
        SELECT doc_id, source,
          CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)),1,12) AS BIGINT) AS h48
        FROM documents),
      r AS (
        SELECT doc_id, source,
          row_number() OVER (PARTITION BY source ORDER BY h48, doc_id) AS src_rn,
          COUNT(*) OVER (PARTITION BY source) AS n_s
        FROM h)
      SELECT CAST(row_number() OVER (ORDER BY
          (2.0 * src_rn - 1) / n_s, source, doc_id) AS BIGINT) AS seq,
        doc_id, source, CAST(src_rn AS BIGINT) AS src_rn
      FROM r ORDER BY seq""")) { (s, dir) =>
    import s.implicits._
    val d = docs(s, dir)
      .select($"source", $"doc_id", graft.ops.Sampling.hash48($"doc_id").as("h48"))
    val ranked = Skew.prefixSumByKey(d, "source",
        Seq($"h48", $"doc_id"), lit(1L), "src_rn")
    val counts = ranked.groupBy($"source").agg(count(lit(1)).as("n_s"))
    val withStride = ranked.join(broadcast(counts), "source")
      .withColumn("stride", (lit(2.0) * $"src_rn" - 1) / $"n_s")
    Skew.globalRowNumber(withStride, Seq($"stride", $"source", $"doc_id"))
      .select($"rn".cast("long").as("seq"), $"doc_id", $"source",
        $"src_rn".cast("long").as("src_rn"))
      .orderBy($"seq")
  }

  /** Linear quality classifier — the fasttext-style "quality model"
    * step of GPT-3/LLaMA-era curation (score every doc with a tiny
    * supervised model, keep above a threshold), re-expressed as a FIXED
    * deterministic linear model over engineered per-row features so the
    * whole decision is oracle-replayable. The shipped weights are
    * own-compiled stand-ins (length, lexical diversity, symbol/digit
    * load, word-shape); a real deployment drops its trained weights
    * into the same dot product. Parity recipe: every feature is
    * 6dp-rounded, then the ENTIRE dot product runs in DECIMAL (exact —
    * 1dp weights × 6dp features produce exact 7-decimal ties that an
    * IEEE double sum rounds differently per engine; decimal arithmetic
    * has no ties to lose), cast to DOUBLE only at the finished logit;
    * the sigmoid goes through FLOOR(·1e6)/1e6 — floor, not round — to
    * absorb the one-ulp libm-vs-Math.exp divergence.
    *
    * Scale shape: every feature is per-row scalar work on the corpus
    * scan — NO shuffle anywhere but the output sort (PlanSpec-pinned);
    * at 100 TB this is a pure map stage inside whole-stage codegen. */
  val dQualityClassifier: Spec = Spec(
    "d_quality_classifier",
    oracle = Some("""
      WITH f AS (
        SELECT doc_id, lang,
          CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
          round(CAST(length(replace(text, ' ', '')) AS DOUBLE)
            / len(string_split(text, ' ')), 6) AS mean_word_len,
          round(CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
            / len(string_split(text, ' ')), 6) AS unique_frac,
          round(CASE WHEN length(text) = 0 THEN 0.0
            ELSE CAST(length(regexp_replace(text, '[\p{L}\s]', '', 'g'))
              AS DOUBLE) / length(text) END, 6) AS symbol_ratio,
          round(CASE WHEN length(text) = 0 THEN 0.0
            ELSE CAST(length(regexp_replace(text, '[^0-9]', '', 'g'))
              AS DOUBLE) / length(text) END, 6) AS digit_frac
        FROM documents),
      l AS (
        SELECT f.*, CAST(
          -1.2 + 0.9 * CAST(round(log10(CAST(n_words AS DOUBLE)), 6)
              AS DECIMAL(18,6))
            + 3.0 * CAST(unique_frac AS DECIMAL(18,6))
            - 6.0 * CAST(symbol_ratio AS DECIMAL(18,6))
            - 4.0 * CAST(digit_frac AS DECIMAL(18,6))
            - 0.8 * abs(CAST(mean_word_len AS DECIMAL(18,6)) - 5.0)
          AS DOUBLE) AS logit
        FROM f)
      SELECT doc_id, lang, n_words, mean_word_len, unique_frac,
        symbol_ratio, digit_frac, logit,
        FLOOR(1e6 / (1.0 + exp(-logit))) / 1e6 AS quality_score,
        (FLOOR(1e6 / (1.0 + exp(-logit))) / 1e6 >= 0.5) AS keep
      FROM l ORDER BY doc_id""")) { (s, dir) =>
    import s.implicits._
    val nw = size(Text.tokens($"text"))
    docs(s, dir)
      .select($"doc_id", $"lang",
        nw.cast("long").as("n_words"),
        round(length(regexp_replace($"text", " ", "")).cast("double") / nw, 6)
          .as("mean_word_len"),
        round(org.apache.spark.sql.functions.size(
            array_distinct(Text.tokens($"text"))).cast("double") / nw, 6)
          .as("unique_frac"),
        round(Text.charClassOutRatio($"text", "[\\p{L}\\s]"), 6)
          .as("symbol_ratio"),
        round(Text.charClassOutRatio($"text", "[^0-9]"), 6).as("digit_frac"))
      .withColumn("logit", {
        def bd(v: String) = lit(new java.math.BigDecimal(v))
        def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(18,6)")
        (bd("-1.2") + bd("0.9") * dec(round(log10($"n_words".cast("double")), 6))
          + bd("3.0") * dec($"unique_frac") - bd("6.0") * dec($"symbol_ratio")
          - bd("4.0") * dec($"digit_frac")
          - bd("0.8") * abs(dec($"mean_word_len") - bd("5.0"))).cast("double")
      })
      .withColumn("quality_score",
        floor(lit(1e6) / (lit(1.0) + exp(-$"logit"))) / lit(1e6))
      .withColumn("keep", $"quality_score" >= 0.5)
      .orderBy($"doc_id")
  }

  /** DSIR-style importance weights (Xie et al. 2023, "Data Selection
    * via Importance Resampling"): score every raw document by how much
    * more likely its tokens are under a TARGET distribution than under
    * the raw-corpus distribution — log weight = Σ_w log(p_target(w) /
    * p_raw(w)) — then select target-like docs. Target here is the
    * corpus' own `lang = 'en'` slice (a deterministic stand-in for
    * "looks like Wikipedia"); both unigram models share one add-1
    * smoothing over the RAW vocabulary, so every token of every doc
    * has a finite weight. Selection is the fixed threshold logweight >
    * 0 ("more target-like than raw") — scale-free; a top-k budget
    * variant rides the same [[TopK]] aggregator as
    * [[dStratifiedSample]]. Parity: all counts are exact integers in
    * doubles (sums are exact below 2^53, any order), per-token log10
    * is 6dp-rounded and DECIMAL-summed per doc — order-free.
    *
    * Scale shape: the model is a token-keyed hash agg JOINED back on
    * the token (never broadcast — a 100 TB vocabulary outgrows one
    * executor); the target slice derives from the same exploded frame
    * (one explode feeds both models); the 3-scalar totals row is the
    * only broadcast; the doc roll-up re-shuffles on (doc_id, lang).
    * DSIR's hashed-feature variant is the same plan with w := hash
    * bucket — nothing about the shape changes. */
  val dDsirWeights: Spec = Spec(
    "d_dsir_weights",
    oracle = Some("""
      WITH toks AS (
        SELECT doc_id, lang, unnest(string_split(text, ' ')) AS w
        FROM documents),
      raw AS (SELECT w, CAST(COUNT(*) AS DOUBLE) AS cr FROM toks GROUP BY w),
      tgt AS (SELECT w, CAST(COUNT(*) AS DOUBLE) AS ct FROM toks
              WHERE lang = 'en' GROUP BY w),
      model AS (
        SELECT raw.w, cr, COALESCE(ct, 0.0) AS ct
        FROM raw LEFT JOIN tgt ON raw.w = tgt.w),
      tot AS (SELECT SUM(cr) AS tr, SUM(ct) AS tt,
                CAST(COUNT(*) AS DOUBLE) AS v FROM model),
      lp AS (
        SELECT toks.doc_id, toks.lang,
          CAST(round(log10(((ct + 1.0) / (tt + v)) / ((cr + 1.0) / (tr + v))), 6)
            AS DECIMAL(18,6)) AS lp
        FROM toks JOIN model ON toks.w = model.w CROSS JOIN tot)
      SELECT doc_id, lang, CAST(COUNT(*) AS BIGINT) AS n_tok,
        CAST(SUM(lp) AS DOUBLE) AS dsir_logweight,
        (CAST(SUM(lp) AS DOUBLE) > 0.0) AS selected
      FROM lp GROUP BY doc_id, lang ORDER BY doc_id""")) { (s, dir) =>
    import s.implicits._
    val d = docs(s, dir)
      .select($"doc_id", $"lang", explode(Text.tokens($"text")).as("w"))
    val raw = d.groupBy($"w").agg(count(lit(1)).cast("double").as("cr"))
    val tgt = d.filter($"lang" === "en")
      .groupBy($"w").agg(count(lit(1)).cast("double").as("ct"))
    val model = raw.join(tgt, Seq("w"), "left").na.fill(0.0, Seq("ct"))
    val tot = model.agg(sum($"cr").as("tr"), sum($"ct").as("tt"),
      count(lit(1)).cast("double").as("v"))
    d.join(model, "w")
      .crossJoin(broadcast(tot))
      .withColumn("lp",
        round(log10((($"ct" + 1.0) / ($"tt" + $"v")) /
          (($"cr" + 1.0) / ($"tr" + $"v"))), 6).cast("decimal(18,6)"))
      .groupBy($"doc_id", $"lang")
      .agg(count(lit(1)).as("n_tok"),
        sum($"lp").cast("double").as("dsir_logweight"))
      .withColumn("selected", $"dsir_logweight" > 0.0)
      .orderBy($"doc_id")
  }

  /** Quality-filter calibration — how well does the linear classifier
    * ([[dQualityClassifier]]) reproduce the Gopher rule decision
    * ([[dGopherRules]]) when the rules are treated as pseudo-labels?
    * Per language: the confusion counts plus precision / recall / F1
    * of `keep` vs `gopher_keep`. This is the table that says whether a
    * cheap learned filter can replace the rule cascade per language —
    * the standard corpus-curation calibration step. Both decisions are
    * per-row scalar work restated from their proven specs, so the
    * whole thing is ONE corpus scan + a per-lang agg; every metric is
    * a single integer division (F1 via the 2tp/(2tp+fp+fn) identity —
    * no chained rounded-double arithmetic), zero-guarded.
    */
  val dQualityCalibration: Spec = Spec(
    "d_quality_calibration",
    oracle = Some("""
      WITH f AS (
        SELECT doc_id, lang,
          CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
          round(CAST(length(replace(text, ' ', '')) AS DOUBLE)
            / len(string_split(text, ' ')), 6) AS mean_word_len,
          round(CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
            / len(string_split(text, ' ')), 6) AS unique_frac,
          round(CASE WHEN length(text) = 0 THEN 0.0
            ELSE CAST(length(regexp_replace(text, '[\p{L}\s]', '', 'g'))
              AS DOUBLE) / length(text) END, 6) AS symbol_ratio,
          round(CASE WHEN length(text) = 0 THEN 0.0
            ELSE CAST(length(regexp_replace(text, '[^0-9]', '', 'g'))
              AS DOUBLE) / length(text) END, 6) AS digit_frac,
          text || chr(10) ||
          CASE WHEN doc_id % 3 = 0 THEN '• ' ELSE '' END ||
            substr(text, 31, 20) || chr(10) ||
          substr(text, 51, 15) ||
            CASE WHEN doc_id % 4 = 0 THEN '...' ELSE '.' END AS rich
        FROM documents),
      c AS (
        SELECT f.*,
          FLOOR(1e6 / (1.0 + exp(-CAST(
            -1.2 + 0.9 * CAST(round(log10(CAST(n_words AS DOUBLE)), 6)
                AS DECIMAL(18,6))
              + 3.0 * CAST(unique_frac AS DECIMAL(18,6))
              - 6.0 * CAST(symbol_ratio AS DECIMAL(18,6))
              - 4.0 * CAST(digit_frac AS DECIMAL(18,6))
              - 0.8 * abs(CAST(mean_word_len AS DECIMAL(18,6)) - 5.0)
            AS DOUBLE)))) / 1e6 >= 0.5 AS clf_keep
        FROM f),
      g AS (
        SELECT doc_id,
          CAST(len(string_split(replace(rich, chr(10), ' '), ' ')) AS BIGINT)
            AS g_words,
          length(replace(replace(rich, ' ', ''), chr(10), '')) AS g_ch,
          CAST(len(list_filter(string_split(rich, chr(10)),
            x -> x LIKE '•%')) AS BIGINT) AS g_bullet,
          CAST(len(list_filter(string_split(rich, chr(10)),
            x -> x LIKE '%...')) AS BIGINT) AS g_ellip,
          CAST(len(string_split(rich, chr(10))) AS BIGINT) AS g_lines,
          round(CAST(length(regexp_replace(rich, '[\p{L}\s]', '', 'g'))
            AS DOUBLE) / length(rich), 6) AS g_sym
        FROM c),
      j AS (
        SELECT c.lang, c.clf_keep,
          (g_words BETWEEN 50 AND 100000
           AND round(CAST(g_ch AS DOUBLE) / g_words, 6) BETWEEN 3 AND 10
           AND round(CAST(g_ellip AS DOUBLE) / g_lines, 6) <= 0.3
           AND round(CAST(g_bullet AS DOUBLE) / g_lines, 6) <= 0.9
           AND g_sym < 0.4) AS gopher_keep
        FROM c JOIN g ON c.doc_id = g.doc_id),
      m AS (
        SELECT lang, CAST(COUNT(*) AS BIGINT) AS n,
          CAST(SUM(CASE WHEN clf_keep AND gopher_keep THEN 1 ELSE 0 END)
            AS BIGINT) AS tp,
          CAST(SUM(CASE WHEN clf_keep AND NOT gopher_keep THEN 1 ELSE 0 END)
            AS BIGINT) AS fp,
          CAST(SUM(CASE WHEN NOT clf_keep AND gopher_keep THEN 1 ELSE 0 END)
            AS BIGINT) AS fn,
          CAST(SUM(CASE WHEN NOT clf_keep AND NOT gopher_keep THEN 1 ELSE 0 END)
            AS BIGINT) AS tn
        FROM j GROUP BY lang)
      SELECT lang, n, tp, fp, fn, tn,
        CASE WHEN tp + fp = 0 THEN 0.0
          ELSE round(CAST(tp AS DOUBLE) / (tp + fp), 6) END AS precision,
        CASE WHEN tp + fn = 0 THEN 0.0
          ELSE round(CAST(tp AS DOUBLE) / (tp + fn), 6) END AS recall,
        CASE WHEN 2 * tp + fp + fn = 0 THEN 0.0
          ELSE round(2.0 * tp / (2 * tp + fp + fn), 6) END AS f1
      FROM m ORDER BY lang""")) { (s, dir) =>
    import s.implicits._
    val nw = size(Text.tokens($"text"))
    val feats = docs(s, dir)
      .select($"doc_id", $"lang", $"text",
        nw.cast("long").as("n_words"),
        round(length(regexp_replace($"text", " ", "")).cast("double") / nw, 6)
          .as("mean_word_len"),
        round(org.apache.spark.sql.functions.size(
            array_distinct(Text.tokens($"text"))).cast("double") / nw, 6)
          .as("unique_frac"),
        round(Text.charClassOutRatio($"text", "[\\p{L}\\s]"), 6)
          .as("symbol_ratio"),
        round(Text.charClassOutRatio($"text", "[^0-9]"), 6).as("digit_frac"))
    val logit = {
      def bd(v: String) = lit(new java.math.BigDecimal(v))
      def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(18,6)")
      (bd("-1.2") + bd("0.9") * dec(round(log10($"n_words".cast("double")), 6))
        + bd("3.0") * dec($"unique_frac") - bd("6.0") * dec($"symbol_ratio")
        - bd("4.0") * dec($"digit_frac")
        - bd("0.8") * abs(dec($"mean_word_len") - bd("5.0"))).cast("double")
    }
    val rich = concat(
      $"text", lit("\n"),
      when($"doc_id" % 3 === 0, lit("• ")).otherwise(lit("")),
      substring($"text", 31, 20), lit("\n"),
      substring($"text", 51, 15),
      when($"doc_id" % 4 === 0, lit("...")).otherwise(lit(".")))
    val lines = split($"rich", "\n", -1)
    val decided = feats
      .withColumn("clf_keep",
        floor(lit(1e6) / (lit(1.0) + exp(-logit))) / lit(1e6) >= 0.5)
      .withColumn("rich", rich)
      .withColumn("g_words",
        Text.wordCount(regexp_replace($"rich", "\n", " ")).cast("long"))
      .withColumn("g_ch", length(regexp_replace($"rich", "[ \n]", "")))
      .withColumn("g_bullet", org.apache.spark.sql.functions.size(
        org.apache.spark.sql.functions.filter(lines, x => x.startsWith("•")))
        .cast("long"))
      .withColumn("g_ellip", org.apache.spark.sql.functions.size(
        org.apache.spark.sql.functions.filter(lines, x => x.endsWith("...")))
        .cast("long"))
      .withColumn("g_lines",
        org.apache.spark.sql.functions.size(lines).cast("long"))
      .withColumn("gopher_keep",
        $"g_words".between(50, 100000) &&
        round($"g_ch".cast("double") / $"g_words", 6).between(3, 10) &&
        round($"g_ellip".cast("double") / $"g_lines", 6) <= 0.3 &&
        round($"g_bullet".cast("double") / $"g_lines", 6) <= 0.9 &&
        round(Text.charClassOutRatio($"rich", "[\\p{L}\\s]"), 6) < 0.4)
    val m = decided.groupBy($"lang").agg(
      count(lit(1)).as("n"),
      sum(when($"clf_keep" && $"gopher_keep", 1L).otherwise(0L)).as("tp"),
      sum(when($"clf_keep" && !$"gopher_keep", 1L).otherwise(0L)).as("fp"),
      sum(when(!$"clf_keep" && $"gopher_keep", 1L).otherwise(0L)).as("fn"),
      sum(when(!$"clf_keep" && !$"gopher_keep", 1L).otherwise(0L)).as("tn"))
    m.select($"lang", $"n", $"tp", $"fp", $"fn", $"tn",
        when($"tp" + $"fp" === 0, lit(0.0))
          .otherwise(round($"tp".cast("double") / ($"tp" + $"fp"), 6))
          .as("precision"),
        when($"tp" + $"fn" === 0, lit(0.0))
          .otherwise(round($"tp".cast("double") / ($"tp" + $"fn"), 6))
          .as("recall"),
        when(lit(2) * $"tp" + $"fp" + $"fn" === 0, lit(0.0))
          .otherwise(round(lit(2.0) * $"tp" / (lit(2) * $"tp" + $"fp" + $"fn"), 6))
          .as("f1"))
      .orderBy($"lang")
  }

  /** Deterministic POISSON BOOTSTRAP error bars for a corpus statistic
    * (mean doc length per source). The classic n-out-of-n resample
    * doesn't distribute (it needs global coordination per replicate);
    * the Poisson bootstrap (Chamandy '12, the industry-standard
    * map-reduce form) gives each doc an independent multiplicity ~
    * Poisson(1) per replicate — here DERIVED from an md5 hash of
    * (doc_id, replicate) quantized to the Poisson(1) CDF, so both
    * engines materialize the identical resample and the oracle is
    * exact. Replicate means divide exact integer sums (one double
    * division, order-independent); the CI is the min/max envelope of
    * the 20 replicate means, spread as exact decimal subtraction.
    *
    * Scale shape: one corpus scan exploded 20× into a map-side
    * combined hash-agg keyed by (source, replicate) — a bounded
    * (sources × 20)-row table; no shuffle grows with the corpus. */
  val dBootstrapCi: Spec = Spec(
    "d_bootstrap_ci",
    oracle = Some("""
      WITH reps AS (
        SELECT d.source, d.n_chars, t.b,
          CAST('0x' || substr(md5(CAST(d.doc_id AS VARCHAR) || ':' ||
            CAST(t.b AS VARCHAR)), 1, 12) AS BIGINT) % 1000 AS h
        FROM documents d CROSS JOIN unnest(range(0, 20)) AS t(b)),
      m AS (
        SELECT source, b,
          CASE WHEN h < 368 THEN 0 WHEN h < 736 THEN 1
               WHEN h < 920 THEN 2 WHEN h < 981 THEN 3 ELSE 4 END AS mult,
          n_chars
        FROM reps),
      bmeans AS (
        SELECT source, b,
          CAST(round(CAST(SUM(mult * n_chars) AS DOUBLE) / SUM(mult), 6)
            AS DECIMAL(18,6)) AS bmean
        FROM m GROUP BY source, b HAVING SUM(mult) > 0),
      pt AS (
        SELECT source, COUNT(*) AS n_docs,
          round(CAST(SUM(n_chars) AS DOUBLE) / COUNT(*), 6) AS mean_chars
        FROM documents GROUP BY source)
      SELECT pt.source, CAST(pt.n_docs AS BIGINT) AS n_docs, pt.mean_chars,
        CAST(MIN(bmean) AS DOUBLE) AS boot_lo,
        CAST(MAX(bmean) AS DOUBLE) AS boot_hi,
        CAST(MAX(bmean) - MIN(bmean) AS DOUBLE) AS boot_spread
      FROM pt JOIN bmeans ON bmeans.source = pt.source
      GROUP BY pt.source, pt.n_docs, pt.mean_chars
      ORDER BY pt.source""")) { (s, dir) =>
    import s.implicits._
    val d = docs(s, dir)
    val reps = d
      .select($"source", $"n_chars", $"doc_id",
        explode(sequence(lit(0), lit(19))).as("b"))
      .withColumn("h",
        conv(substring(md5(concat($"doc_id".cast("string"), lit(":"),
          $"b".cast("string"))), 1, 12), 16, 10).cast("long") % 1000)
      .withColumn("mult",
        when($"h" < 368, 0).when($"h" < 736, 1)
          .when($"h" < 920, 2).when($"h" < 981, 3).otherwise(4))
    val bmeans = reps.groupBy($"source", $"b")
      .agg(sum($"mult" * $"n_chars").as("num"), sum($"mult").as("den"))
      .filter($"den" > 0)
      .select($"source",
        round($"num".cast("double") / $"den", 6).cast("decimal(18,6)")
          .as("bmean"))
    val pt = d.groupBy($"source")
      .agg(count(lit(1)).as("n_docs"), sum($"n_chars").as("tot"))
      .select($"source", $"n_docs",
        round($"tot".cast("double") / $"n_docs", 6).as("mean_chars"))
    pt.join(bmeans, "source")
      .groupBy($"source", $"n_docs", $"mean_chars")
      .agg(min($"bmean").cast("double").as("boot_lo"),
        max($"bmean").cast("double").as("boot_hi"),
        (max($"bmean") - min($"bmean")).cast("double").as("boot_spread"))
      .orderBy($"source")
  }

  /** ADAPTIVE quality cutoff: instead of a fixed length threshold, each
    * language's cutoff is its own exact 10th percentile of doc length
    * (linear interpolation — Spark `percentile` and DuckDB
    * `quantile_cont` share the p·(n−1) definition), and the filter
    * reports how much of the language it would drop. This is the
    * per-language calibration loop quality pipelines run before fixing
    * thresholds (a fixed global cutoff over-drops terse scripts).
    *
    * Scale shape: exact percentile is one sort-based agg per language
    * (bounded by language cardinality), joined back as a broadcast of
    * the languages×1 cutoff table — the corpus is scanned twice but
    * never shuffled wide. */
  val dAdaptiveCutoff: Spec = Spec(
    "d_adaptive_quality_cutoff",
    oracle = Some("""
      WITH c AS (
        SELECT lang, round(quantile_cont(n_chars, 0.1), 6) AS cutoff
        FROM documents GROUP BY lang)
      SELECT d.lang, c.cutoff,
        COUNT(*) AS n_docs,
        CAST(SUM(CASE WHEN d.n_chars < c.cutoff THEN 1 ELSE 0 END) AS BIGINT)
          AS n_below,
        CAST(SUM(CASE WHEN d.n_chars >= c.cutoff THEN 1 ELSE 0 END) AS BIGINT)
          AS n_kept
      FROM documents d JOIN c ON c.lang = d.lang
      GROUP BY d.lang, c.cutoff ORDER BY d.lang""")) { (s, dir) =>
    import s.implicits._
    val d = docs(s, dir)
    val cutoffs = d.groupBy($"lang")
      .agg(round(expr("percentile(n_chars, 0.1)"), 6).as("cutoff"))
    d.join(broadcast(cutoffs), "lang")
      .groupBy($"lang", $"cutoff")
      .agg(count(lit(1)).as("n_docs"),
        sum(when($"n_chars" < $"cutoff", 1L).otherwise(0L)).as("n_below"),
        sum(when($"n_chars" >= $"cutoff", 1L).otherwise(0L)).as("n_kept"))
      .orderBy($"lang")
  }

  /** CLUSTER-AWARE train/val/test split — the dedup-leakage guard
    * [[dHashSplit]] lacks: near-duplicate documents must land in the
    * SAME split (a train doc whose near-dup sits in test inflates eval
    * silently), so the split bucket hashes the near-dup CLUSTER id
    * (MinHash+CC component; singletons fall back to their own doc_id),
    * and every cluster member inherits it. `n_moved` counts the docs
    * whose assignment differs from the row-level hash split — the
    * leakage exposure the guard just closed.
    *
    * Scale shape: on top of the LSH cluster labelling (capped
    * candidates, pointer-jumping CC — the dd_minhash_clusters
    * machinery), the split is one keyed label-lookup join (size is the
    * clustered-doc count — AQE picks broadcast vs shuffle) + a per-row
    * hash; the summary is a 3-key hash agg. Oracle extends the
    * shared `labels` CTE chain (Dedup.minhashLabelsCte), so cluster
    * semantics cannot drift from dd_minhash_clusters. */
  val dClusterSplit: Spec = Spec(
    "d_cluster_split",
    oracle = Some(s"""
      WITH RECURSIVE ${Dedup.minhashLabelsCte},
      comp AS (
        SELECT d.doc_id, COALESCE(l.component, d.doc_id) AS component
        FROM documents d LEFT JOIN labels l ON l.id = d.doc_id),
      s AS (
        SELECT doc_id, component,
          CAST('0x' || substr(md5(CAST(component AS VARCHAR)),1,12) AS BIGINT)
            % 100 AS cb,
          CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)),1,12) AS BIGINT)
            % 100 AS rb
        FROM comp),
      t AS (
        SELECT doc_id, component,
          CASE WHEN cb < 90 THEN 'train' WHEN cb < 95 THEN 'val'
               ELSE 'test' END AS split,
          CASE WHEN rb < 90 THEN 'train' WHEN rb < 95 THEN 'val'
               ELSE 'test' END AS row_split
        FROM s)
      SELECT split, COUNT(*) AS n_docs,
        CAST(COUNT(DISTINCT component) AS BIGINT) AS n_clusters,
        CAST(SUM(CASE WHEN split <> row_split THEN 1 ELSE 0 END) AS BIGINT)
          AS n_moved,
        MIN(doc_id) AS min_doc_id
      FROM t GROUP BY split ORDER BY split""")) { (s, dir) =>
    import s.implicits._
    import graft.ops.MinHash
    val d = docs(s, dir)
    val labels = MinHash.clusters(MinHash.candidatePairs(
      d, "doc_id", "text", shingleSize = 3, numPerm = 32, bands = 8,
      threshold = 0.5))
    // no pinned broadcast: label-table size is the clustered-doc count,
    // corpus-proportional on dup-heavy crawls — AQE picks the strategy
    val comp = d.select($"doc_id")
      .join(labels.withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left")
      .select($"doc_id", coalesce($"component", $"doc_id").as("component"))
    def splitOf(bucket: org.apache.spark.sql.Column) =
      when(bucket < 90, "train").when(bucket < 95, "val").otherwise("test")
    comp
      .withColumn("split", splitOf(Sampling.hash48($"component") % 100))
      .withColumn("row_split", splitOf(Sampling.hash48($"doc_id") % 100))
      .groupBy($"split")
      .agg(count(lit(1)).as("n_docs"),
        countDistinct($"component").as("n_clusters"),
        sum(when($"split" =!= $"row_split", 1L).otherwise(0L)).as("n_moved"),
        min($"doc_id").as("min_doc_id"))
      .orderBy($"split")
  }

  /** VOCABULARY-GROWTH curve + Heaps'-law exponent (Heaps '78): the
    * cumulative distinct-bigram count vs cumulative tokens in doc_id
    * order, with β from the log-log OLS fit — the corpus-card statistic
    * that tells you whether more data still buys new vocabulary (β→0 =
    * saturated/templated corpus — this synthetic one saturates its 31
    * unigrams instantly, which is WHY the unit is bigrams: 916 of them
    * keep the growth regime visible; on a real crawl you'd parameterize
    * n). Every point is an integer prefix sum; the OLS runs on
    * 6dp-rounded DECIMAL moments (the ev_user_trend recipe) — fully
    * engine-replayable.
    *
    * Scale shape: first-occurrence is one gram-keyed min-agg (the
    * vocabulary shuffle — the op's inherent cost); both cumulative
    * counts ride ONE [[Skew.prefixSumsByKey]] pass (constant key:
    * range-partitioned by doc order, no single-reducer window); the
    * fit moments are one tiny agg broadcast back; output is a 25-row
    * sampled curve. */
  val dVocabGrowth: Spec = Spec(
    "d_vocab_growth",
    oracle = Some("""
      WITH t AS (SELECT doc_id, string_split(text,' ') AS l FROM documents),
      n AS (SELECT doc_id, CAST(len(l) AS BIGINT) AS n_tok FROM t),
      g AS (SELECT doc_id, unnest(list_transform(range(1, greatest(len(l), 1)),
              i -> array_to_string(l[i:i+1], ' '))) AS gram
            FROM t WHERE len(l) >= 2),
      term1 AS (SELECT gram, MIN(doc_id) AS first_doc FROM g GROUP BY gram),
      nv AS (SELECT first_doc AS doc_id, COUNT(*) AS new_grams FROM term1 GROUP BY 1),
      c AS (SELECT n.doc_id, n.n_tok, COALESCE(nv.new_grams, 0) AS new_grams
        FROM n LEFT JOIN nv ON nv.doc_id = n.doc_id),
      cum AS (SELECT doc_id,
          SUM(n_tok) OVER (ORDER BY doc_id) AS cum_tokens,
          SUM(new_grams) OVER (ORDER BY doc_id) AS cum_vocab FROM c),
      pts AS (SELECT doc_id, cum_tokens, cum_vocab,
          CAST(round(log10(CAST(cum_tokens AS DOUBLE)), 6) AS DECIMAL(18,6)) AS x,
          CAST(round(log10(CAST(cum_vocab AS DOUBLE)), 6) AS DECIMAL(18,6)) AS y
        FROM cum WHERE cum_tokens > 0 AND cum_vocab > 0),
      fit AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, SUM(x) AS sx, SUM(y) AS sy,
          SUM(x*y) AS sxy, SUM(x*x) AS sxx FROM pts)
      SELECT p.doc_id, CAST(p.cum_tokens AS BIGINT) AS cum_tokens,
        CAST(p.cum_vocab AS BIGINT) AS cum_vocab,
        round((f.n * CAST(f.sxy AS DOUBLE) - CAST(f.sx AS DOUBLE) * CAST(f.sy AS DOUBLE)) /
              (f.n * CAST(f.sxx AS DOUBLE) - CAST(f.sx AS DOUBLE) * CAST(f.sx AS DOUBLE)), 6)
          AS heaps_beta
      FROM pts p CROSS JOIN fit f WHERE p.doc_id % 20 = 0 ORDER BY p.doc_id""")) { (s, dir) =>
    import s.implicits._
    val t = docs(s, dir).select($"doc_id", Text.tokens($"text").as("l"))
    val n = t.select($"doc_id", size($"l").cast("long").as("n_tok"))
    val grams = t.filter(size($"l") >= 2)
      .select($"doc_id", explode(expr(
        "transform(sequence(0, size(l) - 2), i -> concat_ws(' ', slice(l, i + 1, 2)))"))
        .as("gram"))
    val nv = grams.groupBy($"gram").agg(min($"doc_id").as("doc_id"))
      .groupBy($"doc_id").agg(count(lit(1)).as("new_grams"))
    val c = n.join(nv, Seq("doc_id"), "left")
      .select($"doc_id", $"n_tok", coalesce($"new_grams", lit(0L)).as("new_grams"))
      .withColumn("_k", lit("all"))
    val cum = Skew.prefixSumsByKey(c, "_k", Seq($"doc_id"),
      Seq($"n_tok" -> "cum_tokens", $"new_grams" -> "cum_vocab"))
    // cum_vocab (and, degenerately, cum_tokens) is 0 until the first
    // bigram appears; log10(0) is NULL in Spark but -inf in DuckDB, so
    // zero-prefix points must be excluded on BOTH sides before the fit
    val pts = cum.filter($"cum_tokens" > 0 && $"cum_vocab" > 0)
      .select($"doc_id", $"cum_tokens", $"cum_vocab",
        round(log10($"cum_tokens".cast("double")), 6).cast("decimal(18,6)").as("x"),
        round(log10($"cum_vocab".cast("double")), 6).cast("decimal(18,6)").as("y"))
    val fit = broadcast(pts.agg(count(lit(1)).as("n"),
      sum($"x").as("sx"), sum($"y").as("sy"),
      sum($"x" * $"y").as("sxy"), sum($"x" * $"x").as("sxx")))
    pts.crossJoin(fit)
      .filter($"doc_id" % 20 === 0)
      .select($"doc_id", $"cum_tokens", $"cum_vocab",
        round(($"n" * $"sxy".cast("double") - $"sx".cast("double") * $"sy".cast("double")) /
          ($"n" * $"sxx".cast("double") - $"sx".cast("double") * $"sx".cast("double")), 6)
          .as("heaps_beta"))
      .orderBy($"doc_id")
  }

  val specs: Seq[Spec] = Seq(
    dBootstrapCi, dAdaptiveCutoff, dClusterSplit, dVocabGrowth,
    dQualityCalibration,
    dStratifiedSample, dShardPacking, dChunkWindows, dUnigramLmScore,
    dGopherRules, dTfidfTopTerms, dMixtureSample, dTemperatureMix,
    dCurriculumPacking, dKAnonymity, dLengthOutliers,
    dProfileColumns, dZipfSlope, dDriftPsi, dHeavyHitters,
    dSequenceSegments, dKmvDistinct, dKmvSetops, dSnapshotDiff, dTokenBudget,
    dHashSplit, dReadability, dBigramLm, dPerplexityBand, dHashEmbedding,
    dScoreDeciles, dSourceInterleave,
    dCmsCounts, dWeightedSample, dPaddingEfficiency, dEntropyScores,
    dSourceDivergence, dDistributionMatch, dQualityClassifier, dDsirWeights,
    dKneserNey, dMannWhitney, dKruskalWallis, dSpearmanLengths,
    dAnovaLengths, dMadLengths, dIsotonicCalibration, dEffectSizes,
    dGiniLengths, dKendallTau, dLangSourceMi, dCorpusChecksum,
    dNeymanAllocation, dWelchTtest, dChi2Terms, dMedianCi, dTermBurstiness)
}
