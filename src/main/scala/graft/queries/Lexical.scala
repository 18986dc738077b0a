package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.GraftFunctions
import graft.ops.Text
import graft.sources.Lexicons

/** Multi-language lexicon queries (SURVEY §2.8 F13/F14/F16 with REAL
  * per-language data, reference: setu/data/filter_data + loading at
  * setu/constants.py:179-233): one shared Aho-Corasick automaton over
  * the UNION of the shipped language lexicons — the shape a mixed-
  * language corpus run uses — verified against a token-membership
  * DuckDB oracle generated from the very same lexicon files, so the
  * two sides cannot drift.
  *
  * Inputs: the synthetic corpus has no lexicon terms, so each doc gets
  * two terms of a doc_id-selected language appended deterministically
  * (identical expression on both sides); base-text hits remain fully
  * oracle-checked (membership over the whole union list).
  */
object Lexical {

  private def docs(s: org.apache.spark.sql.SparkSession, dir: String) =
    Tables.load(s, dir, "documents")

  private val langs = Lexicons.languages // english german hindi bengali tamil

  private def sqlQuote(w: String) = "'" + w.replace("'", "''") + "'"

  /** First two single-token terms per language, used as the injected
    * payload (loaded once; shared by Spark plan and oracle SQL). */
  private def injected(kind: String): Seq[(String, String, String)] =
    langs.map { l =>
      val terms = (if (kind == "nsfw") Lexicons.nsfw(l)
                   else Lexicons.stopwords(l)).filter(!_.contains(" "))
      (l, terms(0), terms(1))
    }

  // Language routing uses (doc_id / 4) % n, NOT doc_id % n: the queries
  // filter doc_id % 4 = 0, so a plain modulus would only ever hit the
  // even-indexed languages and half the lexicons would go unexercised.
  private def richSql(inj: Seq[(String, String, String)]): String = {
    val cases = inj.zipWithIndex.map { case ((_, a, b), i) =>
      s"WHEN $i THEN ' ' || ${sqlQuote(a)} || ' ' || ${sqlQuote(b)}"
    }.mkString(" ")
    s"text || CASE (doc_id // 4) % ${inj.size} $cases END"
  }

  private def richCol(s: org.apache.spark.sql.SparkSession,
      inj: Seq[(String, String, String)]) = {
    import s.implicits._
    val route = expr("doc_id div 4") % inj.size
    val branches = inj.zipWithIndex.map { case ((_, a, b), i) =>
      (i, s" $a $b")
    }
    branches.tail.foldLeft(
        when(route === branches.head._1, lit(branches.head._2))) {
      case (acc, (i, payload)) => acc.when(route === i, lit(payload))
    }.otherwise(lit("")) // unreachable; keeps the CASE total
  }

  private def membershipSql(terms: Seq[String]): String =
    s"len(list_filter(string_split(rich, ' '), x -> x IN (${terms.map(sqlQuote).mkString(", ")})))"

  /** F13/F14 with the real multi-language NSFW union lexicon. */
  val dNsfwMultilang: Spec = Spec(
    "d_nsfw_multilang", {
      val inj = injected("nsfw")
      val union = Lexicons.nsfwUnion().filter(!_.contains(" "))
      Some(s"""
      WITH r AS (
        SELECT doc_id, ${richSql(inj)} AS rich
        FROM documents WHERE doc_id % 4 = 0)
      SELECT doc_id,
        CAST(${membershipSql(union)} AS BIGINT) AS n_nsfw,
        ROUND(CAST(${membershipSql(union)} AS DOUBLE)
          / len(string_split(rich, ' ')), 6) AS nsfw_ratio
      FROM r ORDER BY doc_id""")
    }) { (s, dir) =>
    import s.implicits._
    val inj = injected("nsfw")
    val union = Lexicons.nsfwUnion().filter(!_.contains(" "))
    val n = GraftFunctions.keywordCount($"rich", union).cast("long")
    docs(s, dir)
      .filter($"doc_id" % 4 === 0)
      .select($"doc_id", concat($"text", richCol(s, inj)).as("rich"))
      .select($"doc_id", n.as("n_nsfw"),
        round(n.cast("double") / size(Text.tokens($"rich")), 6).as("nsfw_ratio"))
      .orderBy($"doc_id")
  }

  /** NSFW REDACTION (the removal tail of F13-F15): every lexicon hit
    * replaced by the `[*]` mask via the shared Aho-Corasick automaton
    * (KeywordRedact, one linear pass) — the text-preserving
    * alternative to dropping a flagged document. On space-tokenized
    * text boundary-valid hits are exact tokens, so the oracle replays
    * the redaction as per-token membership replacement, and the
    * emitted redacted string must match byte-for-byte. */
  val dNsfwRedact: Spec = Spec(
    "d_nsfw_redact", {
      val inj = injected("nsfw")
      val union = Lexicons.nsfwUnion().filter(!_.contains(" "))
      Some(s"""
      WITH r AS (
        SELECT doc_id, ${richSql(inj)} AS rich
        FROM documents WHERE doc_id % 4 = 0)
      SELECT doc_id,
        array_to_string(list_transform(string_split(rich, ' '),
          x -> CASE WHEN x IN (${union.map(sqlQuote).mkString(", ")})
               THEN '[*]' ELSE x END), ' ') AS redacted,
        CAST(${membershipSql(union)} AS BIGINT) AS n_redacted
      FROM r ORDER BY doc_id""")
    }) { (s, dir) =>
    import s.implicits._
    val inj = injected("nsfw")
    val union = Lexicons.nsfwUnion().filter(!_.contains(" "))
    docs(s, dir)
      .filter($"doc_id" % 4 === 0)
      .select($"doc_id", concat($"text", richCol(s, inj)).as("rich"))
      .select($"doc_id",
        GraftFunctions.keywordRedact($"rich", union).as("redacted"),
        GraftFunctions.keywordCount($"rich", union).cast("long")
          .as("n_redacted"))
      .orderBy($"doc_id")
  }

  /** SOURCE-level NSFW rollup — the crawl-curation report that turns
    * per-doc lexicon hits into per-SOURCE blocklist candidates: a
    * source whose flag rate crosses the threshold is dropped wholesale
    * (the cheap, high-precision first pass before any per-doc model).
    * Emits docs/flagged/flag-rate/hits-per-1k-tokens and the verdict.
    *
    * Scale shape: one projection (automaton count) + ONE hash agg
    * keyed by source — map-side partials shrink the exchange to
    * |sources| rows per partition; no join, no window. */
  /** The rollup SQL, shared verbatim by the batch query and its
    * streaming twin (finite feed ⇒ identical final table). */
  private[queries] val sourceRollupOracle: String = {
    val inj = injected("nsfw")
    val union = Lexicons.nsfwUnion().filter(!_.contains(" "))
    s"""
      WITH r AS (
        SELECT doc_id, source, ${richSql(inj)} AS rich
        FROM documents WHERE doc_id % 4 = 0),
      d AS (SELECT source, ${membershipSql(union)} AS n_nsfw,
              len(string_split(rich, ' ')) AS n_tok
            FROM r)
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        CAST(SUM(CASE WHEN n_nsfw > 0 THEN 1 ELSE 0 END) AS BIGINT)
          AS n_flagged,
        ROUND(CAST(SUM(CASE WHEN n_nsfw > 0 THEN 1 ELSE 0 END) AS DOUBLE)
          / COUNT(*), 6) AS flag_rate,
        ROUND(1000.0 * CAST(SUM(CAST(n_nsfw AS BIGINT)) AS DOUBLE)
          / CAST(SUM(CAST(n_tok AS BIGINT)) AS DOUBLE), 6) AS nsfw_per_1k,
        (CAST(SUM(CASE WHEN n_nsfw > 0 THEN 1 ELSE 0 END) AS DOUBLE)
          / COUNT(*)) > 0.5 AS blocklisted
      FROM d GROUP BY source ORDER BY source"""
  }

  /** The rollup plan over ANY documents frame (batch table or
    * streaming feed) — same columns, same arithmetic; no orderBy so
    * the streaming twin can aggregate in complete mode. */
  private[queries] def sourceRollupFrom(docs0: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val s = docs0.sparkSession
    import s.implicits._
    val inj = injected("nsfw")
    val union = Lexicons.nsfwUnion().filter(!_.contains(" "))
    val n = GraftFunctions.keywordCount($"rich", union).cast("long")
    docs0
      .filter($"doc_id" % 4 === 0)
      .select($"doc_id", $"source", concat($"text", richCol(s, inj)).as("rich"))
      .select($"source", n.as("n_nsfw"),
        size(Text.tokens($"rich")).cast("long").as("n_tok"))
      .groupBy($"source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when($"n_nsfw" > 0, 1L).otherwise(0L)).as("nf"),
        sum($"n_nsfw").as("hits"), sum($"n_tok").as("toks"))
      .select($"source", $"n_docs",
        $"nf".as("n_flagged"),
        round($"nf".cast("double") / $"n_docs", 6).as("flag_rate"),
        round(lit(1000.0) * $"hits".cast("double") / $"toks".cast("double"), 6)
          .as("nsfw_per_1k"),
        ($"nf".cast("double") / $"n_docs" > 0.5).as("blocklisted"))
  }

  val dSourceNsfwRollup: Spec = Spec(
    "d_source_nsfw_rollup",
    oracle = Some(sourceRollupOracle)) { (s, dir) =>
    import s.implicits._
    sourceRollupFrom(docs(s, dir)).orderBy($"source")
  }

  /** F16 with the real multi-language stopword union lexicon. */
  val dStopwordMultilang: Spec = Spec(
    "d_stopword_multilang", {
      val inj = injected("stopwords")
      val union = Lexicons.stopwordUnion().filter(!_.contains(" "))
      Some(s"""
      WITH r AS (
        SELECT doc_id, ${richSql(inj)} AS rich
        FROM documents WHERE doc_id % 4 = 0)
      SELECT doc_id,
        CAST(${membershipSql(union)} AS BIGINT) AS n_stopwords,
        ROUND(CAST(${membershipSql(union)} AS DOUBLE)
          / len(string_split(rich, ' ')), 6) AS stopword_ratio
      FROM r ORDER BY doc_id""")
    }) { (s, dir) =>
    import s.implicits._
    val inj = injected("stopwords")
    val union = Lexicons.stopwordUnion().filter(!_.contains(" "))
    val n = GraftFunctions.keywordCount($"rich", union).cast("long")
    docs(s, dir)
      .filter($"doc_id" % 4 === 0)
      .select($"doc_id", concat($"text", richCol(s, inj)).as("rich"))
      .select($"doc_id", n.as("n_stopwords"),
        round(n.cast("double") / size(Text.tokens($"rich")), 6).as("stopword_ratio"))
      .orderBy($"doc_id")
  }

  /** BPE-style pre-tokenization counting (GPT-2 pretokenizer shape,
    * lookahead-free so both engines' RE2/Java regexes agree): runs of
    * letters / digits / other-symbols each with an optional leading
    * space, plus whitespace runs. Inputs carry injected punctuation and
    * digits so all four branches fire. */
  val dBpeTokenStats: Spec = Spec(
    "d_bpe_token_stats", {
      val pat = """ ?[\p{L}]+| ?[\p{N}]+| ?[^\s\p{L}\p{N}]+|\s+"""
      Some(s"""
      WITH r AS (
        SELECT doc_id,
          substr(text,1,60) || ', ' || CAST(doc_id AS VARCHAR) || ' items! ok' AS rich
        FROM documents WHERE doc_id % 4 = 0),
      t AS (SELECT doc_id, regexp_extract_all(rich, '$pat') AS toks FROM r)
      SELECT doc_id,
        CAST(len(toks) AS BIGINT) AS n_tokens,
        CAST(len(list_distinct(toks)) AS BIGINT) AS n_unique,
        md5(array_to_string(toks, '|')) AS tokens_md5
      FROM t ORDER BY doc_id""")
    }) { (s, dir) =>
    import s.implicits._
    val pat = """ ?[\p{L}]+| ?[\p{N}]+| ?[^\s\p{L}\p{N}]+|\s+"""
    docs(s, dir)
      .filter($"doc_id" % 4 === 0)
      .select($"doc_id", concat(
        substring($"text", 1, 60), lit(", "),
        $"doc_id".cast("string"), lit(" items! ok")).as("rich"))
      .select($"doc_id",
        regexp_extract_all($"rich", lit(pat), lit(0)).as("toks"))
      .select($"doc_id",
        size($"toks").cast("long").as("n_tokens"),
        size(array_distinct($"toks")).cast("long").as("n_unique"),
        md5(array_join($"toks", "|")).as("tokens_md5"))
      .orderBy($"doc_id")
  }

  /** BPE merge-step statistics — the distributed first iteration of
    * tokenizer training (count adjacent symbol pairs weighted by word
    * frequency; the argmax pair is what BPE merges next). Single-node
    * tokenizer trainers do this over a word-frequency dict; at corpus
    * scale the dict itself is distributed, so the pipeline is two hash
    * aggs (word freq → pair counts, both keyed, map-side combined) and
    * the top-k runs over the pair table — alphabet², trivially small.
    * Total order (count desc, pair asc) makes ranks deterministic. */
  val dBpePairCounts: Spec = Spec(
    "d_bpe_pair_counts",
    oracle = Some("""
      WITH w AS (
        SELECT unnest(string_split(text, ' ')) AS w FROM documents),
      wf AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS f FROM w GROUP BY w),
      p AS (
        SELECT substr(w, CAST(i.x AS INT), 2) AS pair, f
        FROM wf CROSS JOIN unnest(range(1, length(w))) i(x)),
      pc AS (SELECT pair, CAST(SUM(f) AS BIGINT) AS n FROM p GROUP BY pair),
      r AS (
        SELECT pair, n,
          row_number() OVER (ORDER BY n DESC, pair) AS rk
        FROM pc)
      SELECT CAST(rk AS BIGINT) AS rk, pair, n
      FROM r WHERE rk <= 20 ORDER BY rk""")) { (s, dir) =>
    import s.implicits._
    val wf = docs(s, dir)
      .select(explode(Text.tokens($"text")).as("w"))
      .groupBy($"w").agg(count(lit(1)).as("f"))
    val pc = wf
      .select(explode(Text.charNgrams($"w", 2)).as("pair"), $"f")
      .groupBy($"pair").agg(sum($"f").as("n"))
    // top-20 via orderBy+limit = TakeOrderedAndProject (per-partition
    // top-k, driver merge — never a single-reducer rank of the full
    // pair table); the 20-row remainder ranks via the bounded
    // collect+sort+posexplode form (the queryFrame pattern — a literal
    // partition key would constant-fold back to the warned shape)
    pc.orderBy($"n".desc, $"pair").limit(20)
      .agg(sort_array(collect_list(
        struct((-$"n").as("negn"), $"pair", $"n"))).as("ts"))
      .select(posexplode($"ts").as(Seq("i", "t")))
      .select(($"i" + 1).cast("long").as("rk"), $"t.pair".as("pair"),
        $"t.n".cast("long").as("n"))
      .orderBy($"rk")
  }

  /** One round of the BPE oracle: count corpus-weighted adjacent symbol
    * pairs from w{t-1}, pick the (count desc, pair asc) winner, apply
    * the merge with one left-to-right replace(). */
  private def bpeStepCte(t: Int): String = s"""
      p$t AS (SELECT l, r, SUM(cnt) AS c FROM (
          SELECT cnt, s[i+1] AS l, s[i+2] AS r FROM (
            SELECT cnt, s, unnest(range(0, len(s)-1)) AS i FROM (
              SELECT cnt, string_split(trim(rep, '|'), '||') AS s
              FROM w${t - 1})))
        GROUP BY l, r),
      b$t AS (SELECT l, r, c FROM p$t ORDER BY c DESC, l, r LIMIT 1),
      w$t AS (SELECT word, cnt,
          replace(rep,
            '|' || (SELECT l FROM b$t) || '||' || (SELECT r FROM b$t) || '|',
            '|' || (SELECT l FROM b$t) || (SELECT r FROM b$t) || '|') AS rep
        FROM w${t - 1})"""

  /** BPE merge TRAINING (Sennrich '16; the HF-tokenizers loop), 3
    * deterministic iterations: words become character symbol
    * sequences, each round counts corpus-weighted adjacent symbol
    * pairs, merges the (count desc, pair asc) winner everywhere, and
    * the merges table — the artifact a tokenizer trainer ships — is
    * the output. d_bpe_pair_counts is round 0's counting; this is the
    * actual training loop on top of it.
    *
    * Symbol sequences are encoded as '|a||b|…' — every symbol carries
    * its OWN delimiters, so applying a merge is one non-overlapping
    * left-to-right replace('|l||r|' → '|lr|') with no boundary
    * sharing between adjacent matches ('a b a b' merges to 'ab ab',
    * not 'ab a b'), and both engines' single-pass replace agree.
    *
    * Scale shape: training runs on the distinct-word frequency table
    * (vocab-scale — the corpus-scale token explode happens once, in
    * the initial word count); each round is one map-side-combined
    * pair-count shuffle plus a ONE-ROW collect (the chosen merge), so
    * the driver holds exactly k rows after k rounds — the same bounded
    * artifact argument as the k-means centroids. */
  /** The shared word-frequency + initial-representation CTEs of the
    * BPE oracle family (words → w0). */
  private val bpeBaseCte: String = """
      words AS (
        SELECT word, CAST(COUNT(*) AS BIGINT) AS cnt FROM (
          SELECT unnest(string_split(text, ' ')) AS word FROM documents)
        WHERE regexp_matches(word, '^[a-z]+$') GROUP BY word),
      w0 AS (SELECT word, cnt,
          array_to_string(list_transform(range(1, length(word)+1),
            i -> '|' || word[i:i] || '|'), '') AS rep
        FROM words)"""

  /** Run the 3-round training loop: returns the merged representation
    * table (word, cnt, rep) and the chosen merges. Each round is one
    * pair-count shuffle plus a ONE-ROW collect. */
  private def bpeTrain(words: org.apache.spark.sql.DataFrame)
      : (org.apache.spark.sql.DataFrame, Seq[(Long, String, String, Long)]) = {
    import org.apache.spark.sql.Column
    var reps = words.withColumn("rep",
      array_join(transform(
        sequence(lit(1), length(col("word"))),
        i => concat(lit("|"), col("word").substr(i, lit(1)), lit("|"))), ""))
      .localCheckpoint() // each round rewrites rep; keep lineage flat
    val merges = (1 to 3).map { t =>
      val syms = split(trim(col("rep"), "|"), "\\|\\|")
      val best = reps
        .filter(size(syms) >= 2)
        .select(col("cnt"), explode(transform(sequence(lit(0), size(syms) - 2),
          i => struct(element_at(syms, i + 1).as("l"),
            element_at(syms, i + 2).as("r")))).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("cnt")).as("c"))
        .orderBy(col("c").desc, col("l"), col("r"))
        .limit(1).collect()(0)
      val (l, r, c) = (best.getString(0), best.getString(1), best.getLong(2))
      reps = reps.withColumn("rep",
          replace(col("rep"), lit(s"|$l||$r|"), lit(s"|$l$r|")))
        .localCheckpoint()
      (t.toLong, l, r, c)
    }
    (reps, merges)
  }

  private def bpeWords(s: org.apache.spark.sql.SparkSession, dir: String) =
    docs(s, dir)
      .select(explode(Text.tokens(col("text"))).as("word"))
      .filter(col("word").rlike("^[a-z]+$"))
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))

  val dBpeMerges: Spec = Spec(
    "d_bpe_merges",
    oracle = Some(s"""
      WITH $bpeBaseCte,
      ${bpeStepCte(1)},
      ${bpeStepCte(2)},
      ${bpeStepCte(3)}
      SELECT * FROM (
        SELECT CAST(1 AS BIGINT) AS step, l AS left_sym, r AS right_sym,
          CAST(c AS BIGINT) AS pair_count FROM b1
        UNION ALL SELECT 2, l, r, CAST(c AS BIGINT) FROM b2
        UNION ALL SELECT 3, l, r, CAST(c AS BIGINT) FROM b3)
      ORDER BY step""")) { (s, dir) =>
    import s.implicits._
    bpeTrain(bpeWords(s, dir))._2
      .toDF("step", "left_sym", "right_sym", "pair_count")
      .orderBy($"step")
  }

  /** BPE ENCODING with the trained merges — the fertility report a
    * tokenizer owner reads before shipping: every [a-z]+ word encodes
    * through the 3-merge representation, and each document reports its
    * encodable word count, total BPE symbols, character mass, and
    * symbols-per-word. d_tokenizer_fertility measures a FIXED
    * tokenizer; this measures the one just trained by d_bpe_merges
    * (shared loop, shared oracle CTEs — they cannot drift).
    *
    * Scale shape: encoding joins the corpus token stream against the
    * vocab-scale representation table (AQE broadcasts it at any
    * realistic vocab size), then one per-doc hash agg. */
  val dBpeEncode: Spec = Spec(
    "d_bpe_encode",
    oracle = Some(s"""
      WITH $bpeBaseCte,
      ${bpeStepCte(1)},
      ${bpeStepCte(2)},
      ${bpeStepCte(3)},
      enc AS (SELECT word,
          len(string_split(trim(rep, '|'), '||')) AS nsym
        FROM w3),
      dt AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word
        FROM documents),
      m AS (SELECT doc_id, dt.word, e.nsym FROM dt JOIN enc e USING (word))
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
        CAST(SUM(nsym) AS BIGINT) AS n_bpe_symbols,
        CAST(SUM(length(word)) AS BIGINT) AS n_chars,
        ROUND(CAST(SUM(nsym) AS DOUBLE) / COUNT(*), 6) AS symbols_per_word
      FROM m GROUP BY doc_id ORDER BY doc_id""")) { (s, dir) =>
    import s.implicits._
    val (reps, _) = bpeTrain(bpeWords(s, dir))
    val enc = reps.select($"word",
      size(split(trim($"rep", "|"), "\\|\\|")).as("nsym"))
    docs(s, dir)
      .select($"doc_id", explode(Text.tokens($"text")).as("word"))
      .join(enc, Seq("word"))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_words"),
        sum($"nsym").cast("long").as("n_bpe_symbols"),
        sum(length($"word")).cast("long").as("n_chars"),
        round(sum($"nsym").cast("double") / count(lit(1)), 6)
          .as("symbols_per_word"))
      .orderBy($"doc_id")
  }

  /** Sparse TF-IDF document-similarity pairs — the embedding-free
    * "similar documents" path (what you run when no encoder exists for
    * the language): documents as sparse tf·idf vectors, cosine via a
    * TERM-KEYED sparse dot product, pairs ≥ 0.2 emitted. Terms with
    * df > 25 are pruned BEFORE pairing — the scale lever: a stopword-
    * grade term contributes ~nothing to cosine but df² candidate rows,
    * so the candidate cost is Σ_{df≤cap} df², never n². Weights are
    * 6dp DECIMAL and products sum as DECIMAL(38,12), so dots and norms
    * are exact and aggregation-order-free; norms are defined over the
    * kept (df ≤ cap) terms, self-consistently on both sides. */
  val dTfidfDocPairs: Spec = Spec(
    "d_tfidf_doc_pairs",
    oracle = Some("""
      WITH tok AS (
        SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf FROM (
          SELECT doc_id, unnest(string_split(text, ' ')) AS term
          FROM documents)
        GROUP BY doc_id, term),
      dfc AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tok
              GROUP BY term),
      nn AS (SELECT COUNT(*) AS n FROM documents),
      w AS (SELECT doc_id, tok.term,
          CAST(tf * CAST(round(log10(nn.n::DOUBLE / df), 6) AS DECIMAL(18,6))
            AS DECIMAL(18,6)) AS w
        FROM tok JOIN dfc ON dfc.term = tok.term CROSS JOIN nn
        WHERE df <= 25),
      nrm AS (SELECT doc_id,
          sqrt(CAST(SUM(CAST(w*w AS DECIMAL(38,12))) AS DOUBLE)) AS nrm
        FROM w GROUP BY doc_id),
      p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
          CAST(SUM(CAST(a.w*b.w AS DECIMAL(38,12))) AS DOUBLE) AS dot
        FROM w a JOIN w b ON a.term = b.term AND a.doc_id < b.doc_id
        GROUP BY 1, 2)
      SELECT id_a, id_b,
        ROUND(dot / (na.nrm * nb.nrm), 6) AS tfidf_cos
      FROM p JOIN nrm na ON na.doc_id = id_a JOIN nrm nb ON nb.doc_id = id_b
      WHERE dot / (na.nrm * nb.nrm) >= 0.2
      ORDER BY id_a, id_b""")) { (s, dir) =>
    import s.implicits._
    val tok = docs(s, dir)
      .select($"doc_id", explode(Text.tokens($"text")).as("term"))
      .groupBy($"doc_id", $"term").agg(count(lit(1)).as("tf"))
    val dfc = tok.groupBy($"term").agg(count(lit(1)).as("df"))
    val nn = broadcast(docs(s, dir).agg(count(lit(1)).as("n")))
    val w = tok
      .join(dfc.filter($"df" <= 25), Seq("term"))
      .crossJoin(nn)
      .select($"doc_id", $"term",
        ($"tf" * round(log10($"n".cast("double") / $"df"), 6)
          .cast("decimal(18,6)")).cast("decimal(18,6)").as("w"))
      .localCheckpoint() // one weighting pass feeds norms AND the join
    val nrm = w.groupBy($"doc_id")
      .agg(sqrt(sum(($"w" * $"w").cast("decimal(38,12)")).cast("double"))
        .as("nrm"))
    val a = w.select($"doc_id".as("id_a"), $"term", $"w".as("wa"))
    val b = w.select($"doc_id".as("id_b"), $"term", $"w".as("wb"))
    val sim = $"dot" / ($"na" * $"nb")
    a.join(b, Seq("term")).filter($"id_a" < $"id_b")
      .groupBy($"id_a", $"id_b")
      .agg(sum(($"wa" * $"wb").cast("decimal(38,12)")).cast("double").as("dot"))
      .join(nrm.select($"doc_id".as("id_a"), $"nrm".as("na")), Seq("id_a"))
      .join(nrm.select($"doc_id".as("id_b"), $"nrm".as("nb")), Seq("id_b"))
      .filter(sim >= 0.2)
      .select($"id_a", $"id_b", round(sim, 6).as("tfidf_cos"))
      .orderBy($"id_a", $"id_b")
  }

  /** Hybrid document similarity via reciprocal-rank fusion (RRF,
    * k=60 — the hybrid-retrieval standard): per query document, the
    * TF-IDF cosine neighbor ranking and the winnow fingerprint-overlap
    * ranking fuse as Σ 1/(60+rank), union semantics (a neighbor found
    * by only one system still scores). Lexical similarity sees shared
    * vocabulary, winnowing sees shared passages — fusion ranks
    * near-dups above topically-similar docs without either system's
    * blind spot. Top-3 fused neighbors per query.
    *
    * Oracle restates BOTH pipelines (the shared winnow CTE + the
    * TF-IDF chain) and the fusion arithmetic; 1/(60+r) is a correctly-
    * rounded double division on exact integer ranks, and the two-term
    * sum has fixed operand order, so scores are bit-identical. */
  val dHybridSimilarity: Spec = Spec(
    "d_hybrid_similarity",
    oracle = Some(s"""
      WITH ${TextOps.winnowSelCte},
      fp AS (SELECT DISTINCT doc_id, h48 FROM sel WHERE rk = 1),
      fsz AS (SELECT doc_id, COUNT(*) AS nfp FROM fp GROUP BY doc_id),
      wp0 AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS ns
        FROM fp a JOIN fp b ON a.h48 = b.h48 AND a.doc_id < b.doc_id
        GROUP BY 1, 2),
      wp AS (SELECT id_a, id_b,
          CAST(ns AS DOUBLE) / least(sa.nfp, sb.nfp) AS ws
        FROM wp0 JOIN fsz sa ON sa.doc_id = id_a
        JOIN fsz sb ON sb.doc_id = id_b
        WHERE CAST(ns AS DOUBLE) / least(sa.nfp, sb.nfp) >= 0.5),
      ttok AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf FROM (
          SELECT doc_id, unnest(string_split(text, ' ')) AS term
          FROM documents) GROUP BY doc_id, term),
      tdf AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM ttok
              GROUP BY term),
      tnn AS (SELECT COUNT(*) AS n FROM documents),
      tw AS (SELECT doc_id, ttok.term,
          CAST(tf * CAST(round(log10(tnn.n::DOUBLE / df), 6) AS DECIMAL(18,6))
            AS DECIMAL(18,6)) AS w
        FROM ttok JOIN tdf ON tdf.term = ttok.term CROSS JOIN tnn
        WHERE df <= 25),
      tnrm AS (SELECT doc_id,
          sqrt(CAST(SUM(CAST(w*w AS DECIMAL(38,12))) AS DOUBLE)) AS nrm
        FROM tw GROUP BY doc_id),
      tp AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
          CAST(SUM(CAST(a.w*b.w AS DECIMAL(38,12))) AS DOUBLE) AS dot
        FROM tw a JOIN tw b ON a.term = b.term AND a.doc_id < b.doc_id
        GROUP BY 1, 2),
      tpair AS (SELECT id_a, id_b, dot / (na.nrm * nb.nrm) AS tc
        FROM tp JOIN tnrm na ON na.doc_id = id_a
        JOIN tnrm nb ON nb.doc_id = id_b
        WHERE dot / (na.nrm * nb.nrm) >= 0.2),
      tdir AS (SELECT id_a AS q, id_b AS nb, tc FROM tpair
        UNION ALL SELECT id_b, id_a, tc FROM tpair),
      trk AS (SELECT q, nb,
          row_number() OVER (PARTITION BY q ORDER BY tc DESC, nb) AS rt
        FROM tdir),
      wdir AS (SELECT id_a AS q, id_b AS nb, ws FROM wp
        UNION ALL SELECT id_b, id_a, ws FROM wp),
      wrk AS (SELECT q, nb,
          row_number() OVER (PARTITION BY q ORDER BY ws DESC, nb) AS rw
        FROM wdir),
      fused AS (SELECT COALESCE(t.q, w.q) AS q, COALESCE(t.nb, w.nb) AS nb,
          COALESCE(1.0::DOUBLE / (60 + t.rt), 0)
            + COALESCE(1.0::DOUBLE / (60 + w.rw), 0) AS sc
        FROM trk t FULL JOIN wrk w ON t.q = w.q AND t.nb = w.nb),
      top AS (SELECT q, nb, sc,
          row_number() OVER (PARTITION BY q ORDER BY sc DESC, nb) AS fr
        FROM fused)
      SELECT q AS query_id, CAST(fr AS BIGINT) AS fused_rank,
        nb AS neighbor_id, ROUND(sc, 6) AS rrf_score
      FROM top WHERE fr <= 3 ORDER BY query_id, fused_rank""")) { (s, dir) =>
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val tfidf = dTfidfDocPairs.fn(s, dir)
      .select($"id_a", $"id_b", $"tfidf_cos".as("sc"))
    val winnow = Dedup.ddWinnowPairs.fn(s, dir)
      .select($"id_a", $"id_b", $"winnow_sim".as("sc"))
    def ranked(pairs: org.apache.spark.sql.DataFrame, out: String) = {
      val dir2 = pairs.select($"id_a".as("q"), $"id_b".as("nb"), $"sc")
        .unionAll(pairs.select($"id_b".as("q"), $"id_a".as("nb"), $"sc"))
      dir2.withColumn(out,
        row_number().over(Window.partitionBy($"q").orderBy($"sc".desc, $"nb")))
        .select($"q", $"nb", col(out))
    }
    val t = ranked(tfidf, "rt")
    val w = ranked(winnow, "rw")
    val fused = t.join(w, Seq("q", "nb"), "full")
      .select($"q", $"nb",
        (coalesce(lit(1.0) / (lit(60) + $"rt"), lit(0.0))
          + coalesce(lit(1.0) / (lit(60) + $"rw"), lit(0.0))).as("sc"))
    fused
      .withColumn("fr",
        row_number().over(Window.partitionBy($"q").orderBy($"sc".desc, $"nb")))
      .filter($"fr" <= 3)
      .select($"q".as("query_id"), $"fr".cast("long").as("fused_rank"),
        $"nb".as("neighbor_id"), round($"sc", 6).as("rrf_score"))
      .orderBy($"query_id", $"fused_rank")
  }

  /** Rank-biased overlap (Webber '10, p=0.9, depth 5) between the
    * TF-IDF and winnow neighbor rankings — the ranking-agreement
    * metric that tells you whether two similarity systems see the same
    * corpus structure (RBO ≈ 1) or complement each other (low RBO →
    * fusion like d_hybrid_similarity actually adds signal). Computed
    * per query over queries BOTH systems rank; depth weights are exact
    * decimal powers of 0.9, overlap counts are integers, and the
    * 5-term sum has fixed operand order, so scores are bit-identical.
    */
  val dRankingAgreement: Spec = Spec(
    "d_ranking_agreement",
    oracle = Some(s"""
      WITH ${TextOps.winnowSelCte},
      fp AS (SELECT DISTINCT doc_id, h48 FROM sel WHERE rk = 1),
      fsz AS (SELECT doc_id, COUNT(*) AS nfp FROM fp GROUP BY doc_id),
      wp0 AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS ns
        FROM fp a JOIN fp b ON a.h48 = b.h48 AND a.doc_id < b.doc_id
        GROUP BY 1, 2),
      wp AS (SELECT id_a, id_b,
          CAST(ns AS DOUBLE) / least(sa.nfp, sb.nfp) AS ws
        FROM wp0 JOIN fsz sa ON sa.doc_id = id_a
        JOIN fsz sb ON sb.doc_id = id_b
        WHERE CAST(ns AS DOUBLE) / least(sa.nfp, sb.nfp) >= 0.5),
      ttok AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf FROM (
          SELECT doc_id, unnest(string_split(text, ' ')) AS term
          FROM documents) GROUP BY doc_id, term),
      tdf AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM ttok
              GROUP BY term),
      tnn AS (SELECT COUNT(*) AS n FROM documents),
      tw AS (SELECT doc_id, ttok.term,
          CAST(tf * CAST(round(log10(tnn.n::DOUBLE / df), 6) AS DECIMAL(18,6))
            AS DECIMAL(18,6)) AS w
        FROM ttok JOIN tdf ON tdf.term = ttok.term CROSS JOIN tnn
        WHERE df <= 25),
      tnrm AS (SELECT doc_id,
          sqrt(CAST(SUM(CAST(w*w AS DECIMAL(38,12))) AS DOUBLE)) AS nrm
        FROM tw GROUP BY doc_id),
      tp AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
          CAST(SUM(CAST(a.w*b.w AS DECIMAL(38,12))) AS DOUBLE) AS dot
        FROM tw a JOIN tw b ON a.term = b.term AND a.doc_id < b.doc_id
        GROUP BY 1, 2),
      tpair AS (SELECT id_a, id_b, dot / (na.nrm * nb.nrm) AS tc
        FROM tp JOIN tnrm na ON na.doc_id = id_a
        JOIN tnrm nb ON nb.doc_id = id_b
        WHERE dot / (na.nrm * nb.nrm) >= 0.2),
      tdir AS (SELECT id_a AS q, id_b AS nb, tc FROM tpair
        UNION ALL SELECT id_b, id_a, tc FROM tpair),
      trk AS (SELECT q, nb,
          row_number() OVER (PARTITION BY q ORDER BY tc DESC, nb) AS rt
        FROM tdir),
      wdir AS (SELECT id_a AS q, id_b AS nb, ws FROM wp
        UNION ALL SELECT id_b, id_a, ws FROM wp),
      wrk AS (SELECT q, nb,
          row_number() OVER (PARTITION BY q ORDER BY ws DESC, nb) AS rw
        FROM wdir),
      qs AS (SELECT DISTINCT q FROM trk INTERSECT SELECT DISTINCT q FROM wrk),
      ov AS (SELECT t.q,
          SUM(CASE WHEN rt <= 1 AND rw <= 1 THEN 1 ELSE 0 END) AS o1,
          SUM(CASE WHEN rt <= 2 AND rw <= 2 THEN 1 ELSE 0 END) AS o2,
          SUM(CASE WHEN rt <= 3 AND rw <= 3 THEN 1 ELSE 0 END) AS o3,
          SUM(CASE WHEN rt <= 4 AND rw <= 4 THEN 1 ELSE 0 END) AS o4,
          SUM(CASE WHEN rt <= 5 AND rw <= 5 THEN 1 ELSE 0 END) AS o5
        FROM trk t JOIN wrk w ON t.q = w.q AND t.nb = w.nb GROUP BY t.q)
      SELECT qs.q AS query_id,
        ROUND(0.1::DOUBLE * (
          1.0::DOUBLE * (CAST(COALESCE(o1, 0) AS DOUBLE) / 1)
          + 0.9::DOUBLE * (CAST(COALESCE(o2, 0) AS DOUBLE) / 2)
          + 0.81::DOUBLE * (CAST(COALESCE(o3, 0) AS DOUBLE) / 3)
          + 0.729::DOUBLE * (CAST(COALESCE(o4, 0) AS DOUBLE) / 4)
          + 0.6561::DOUBLE * (CAST(COALESCE(o5, 0) AS DOUBLE) / 5)), 6)
          AS rbo5
      FROM qs LEFT JOIN ov ON ov.q = qs.q
      ORDER BY query_id""")) { (s, dir) =>
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    def ranked(pairs: org.apache.spark.sql.DataFrame, out: String) = {
      val d2 = pairs.select($"id_a".as("q"), $"id_b".as("nb"), $"sc")
        .unionAll(pairs.select($"id_b".as("q"), $"id_a".as("nb"), $"sc"))
      d2.withColumn(out,
        row_number().over(Window.partitionBy($"q").orderBy($"sc".desc, $"nb")))
        .select($"q", $"nb", col(out))
    }
    val t = ranked(dTfidfDocPairs.fn(s, dir)
      .select($"id_a", $"id_b", $"tfidf_cos".as("sc")), "rt")
    val w = ranked(Dedup.ddWinnowPairs.fn(s, dir)
      .select($"id_a", $"id_b", $"winnow_sim".as("sc")), "rw")
    val qs = t.select($"q").distinct()
      .intersect(w.select($"q").distinct())
    def o(d: Int) =
      sum(when($"rt" <= d && $"rw" <= d, 1).otherwise(0)).as(s"o$d")
    val ov = t.join(w, Seq("q", "nb"))
      .groupBy($"q").agg(o(1), o(2), o(3), o(4), o(5))
    def term(p: Double, c: org.apache.spark.sql.Column, d: Int) =
      lit(p) * (coalesce(c, lit(0)).cast("double") / lit(d))
    qs.join(ov, Seq("q"), "left")
      .select($"q".as("query_id"),
        round(lit(0.1) * (
          term(1.0, $"o1", 1) + term(0.9, $"o2", 2) + term(0.81, $"o3", 3)
            + term(0.729, $"o4", 4) + term(0.6561, $"o5", 5)), 6).as("rbo5"))
      .orderBy($"query_id")
  }

  /** Collocation mining via pointwise mutual information over adjacent
    * token pairs: PMI = log10(p(ab) / (p(a)·p(b))), the classic
    * phrase-detection statistic (Church & Hanks '90) — high-PMI pairs
    * are multiword expressions worth fusing before tokenizer training.
    * Pairs need ≥ 5 occurrences (the standard noise floor). p's are
    * 6dp-rounded before the PMI log (which rounds again at 6dp), so
    * both engines agree bit-for-bit; ranking is (pmi desc, pair asc).
    *
    * Scale shape: one token explode each for unigrams and bigrams, two
    * map-side-combined hash aggs, a vocab-scale join — no corpus-scale
    * shuffle beyond the counts. */
  val dCollocations: Spec = Spec(
    "d_collocations",
    oracle = Some("""
      WITH t AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
      uni AS (SELECT u AS w, CAST(COUNT(*) AS BIGINT) AS c FROM (
          SELECT unnest(l) AS u FROM t) GROUP BY u),
      tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n1,
          CAST(SUM(c) - (SELECT COUNT(*) FROM t) AS BIGINT) AS n2 FROM uni),
      bi AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c FROM (
          SELECT l[i+1] AS w1, l[i+2] AS w2
          FROM (SELECT l, unnest(range(0, len(l)-1)) AS i FROM t))
        GROUP BY w1, w2 HAVING COUNT(*) >= 5),
      pmi AS (SELECT w1, w2, bi.c,
          round(log10(
            round(CAST(bi.c AS DOUBLE) / n2, 6)
            / (round(CAST(ua.c AS DOUBLE) / n1, 6)
               * round(CAST(ub.c AS DOUBLE) / n1, 6))), 6) AS pmi
        FROM bi JOIN uni ua ON ua.w = w1 JOIN uni ub ON ub.w = w2
        CROSS JOIN tot),
      r AS (SELECT w1, w2, c, pmi,
          row_number() OVER (ORDER BY pmi DESC, w1, w2) AS rk FROM pmi)
      SELECT CAST(rk AS BIGINT) AS rk, w1, w2, c AS n_pair, pmi
      FROM r WHERE rk <= 20 ORDER BY rk""")) { (s, dir) =>
    import s.implicits._
    val t = docs(s, dir).select($"doc_id", Text.tokens($"text").as("l"))
      .localCheckpoint() // one tokenize feeds unigrams, bigrams, doc count
    val uni = t.select(explode($"l").as("w"))
      .groupBy($"w").agg(count(lit(1)).as("c"))
    val nDocs = t.count()
    val tot = broadcast(uni.agg(sum($"c").as("n1"),
      (sum($"c") - lit(nDocs)).as("n2")))
    val bi = t
      .filter(size($"l") >= 2) // mirror range(0, len-1): no pairs below 2
      .select(explode(transform(sequence(lit(0), size($"l") - 2),
        i => struct(element_at($"l", i + 1).as("w1"),
          element_at($"l", i + 2).as("w2")))).as("p"))
      .groupBy($"p.w1".as("w1"), $"p.w2".as("w2"))
      .agg(count(lit(1)).as("c"))
      .filter($"c" >= 5)
    val pmi = bi
      .join(uni.select($"w".as("w1"), $"c".as("ca")), Seq("w1"))
      .join(uni.select($"w".as("w2"), $"c".as("cb")), Seq("w2"))
      .crossJoin(tot)
      .select($"w1", $"w2", $"c",
        round(log10(
          round($"c".cast("double") / $"n2", 6)
            / (round($"ca".cast("double") / $"n1", 6)
               * round($"cb".cast("double") / $"n1", 6))), 6).as("pmi"))
    // the bigram table is corpus-scale: top-20 must be
    // orderBy+limit = TakeOrderedAndProject, never a single-reducer
    // global rank; the 20-row remainder ranks via the bounded
    // collect+sort+posexplode form (queryFrame pattern)
    pmi.orderBy($"pmi".desc, $"w1", $"w2").limit(20)
      .agg(sort_array(collect_list(
        struct((-$"pmi").as("negpmi"), $"w1", $"w2", $"c", $"pmi"))).as("ts"))
      .select(posexplode($"ts").as(Seq("i", "t")))
      .select(($"i" + 1).cast("long").as("rk"), $"t.w1".as("w1"),
        $"t.w2".as("w2"), $"t.c".as("n_pair"), $"t.pmi".as("pmi"))
      .orderBy($"rk")
  }

  /** F27 language-code canonicalization as an ORACLED corpus query:
    * the corpus lang codes map through the shipped
    * [[graft.sources.LangData]] resource to canonical name + preferred
    * short code; the oracle CASE is generated from the same resource,
    * so the two sides cannot drift. Unknown codes pass through. */
  val dLangNormalize: Spec = {
    import graft.sources.LangData
    def caseSql(to: LangData.LangInfo => String): String =
      "CASE lower(lang) " + LangData.all.flatMap { l =>
        Seq(l.language, l.iso3).distinct ++ l.iso1
      }.distinct.map { sp =>
        val l = LangData.byName(LangData.canonicalName(sp).get)
        s"WHEN ${sqlQuote(sp)} THEN ${sqlQuote(to(l))}"
      }.mkString(" ") + " ELSE lang END"
    Spec(
      "d_lang_normalize",
      oracle = Some(s"""
      SELECT lang, ${caseSql(_.language)} AS lang_name,
        ${caseSql(l => l.iso1.getOrElse(l.iso3))} AS lang_code,
        COUNT(*) AS n_docs
      FROM documents GROUP BY 1, 2, 3 ORDER BY lang""")) { (s, dir) =>
      import s.implicits._
      docs(s, dir)
        .select($"lang", LangData.nameCol($"lang").as("lang_name"),
          LangData.codeCol($"lang").as("lang_code"))
        .groupBy($"lang", $"lang_name", $"lang_code")
        .agg(count(lit(1)).as("n_docs"))
        .orderBy($"lang")
    }
  }

  /** RAKE keyphrase extraction (Rose et al. 2010): candidate phrases
    * are maximal stopword-free token runs (gaps-and-islands on token
    * position); each word scores deg/freq where deg sums the lengths
    * of every phrase occurrence containing it; a phrase scores the sum
    * of its words' scores. The corpus-level top 25 keyphrases — the
    * lightweight topic inventory of the documents table, complementing
    * [[dCollocations]] (fixed-width bigrams) with variable-length
    * phrases. Stopword set = the corpus's English function words
    * ('the', 'a' — the same pair d_stopword_stats pins).
    *
    * Scale shape: one token explode + per-doc island window (doc-
    * bounded frames), hash aggs for word stats and unique phrases, and
    * the top-25 via orderBy+limit (TakeOrderedAndProject). Parity:
    * word scores are 6dp-rounded ratios of exact integers; phrase
    * scores sum them as DECIMAL (order-free). */
  val dRakeKeyphrases: Spec = Spec(
    "d_rake_keyphrases",
    oracle = Some("""
      WITH t AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
      tok AS (SELECT doc_id, i, l[i+1] AS w
        FROM (SELECT doc_id, l, unnest(range(0, len(l))) AS i FROM t)),
      ns AS (SELECT doc_id, i, w,
          i - row_number() OVER (PARTITION BY doc_id ORDER BY i) AS grp
        FROM tok WHERE w <> 'the' AND w <> 'a' AND w <> ''),
      ph AS (SELECT doc_id, grp, string_agg(w, ' ' ORDER BY i) AS phrase,
          CAST(COUNT(*) AS BIGINT) AS plen
        FROM ns GROUP BY doc_id, grp),
      ws AS (SELECT w,
          round(CAST(SUM(plen) AS DOUBLE) / COUNT(*), 6) AS wscore
        FROM (SELECT n.w, p.plen FROM ns n
          JOIN ph p ON p.doc_id = n.doc_id AND p.grp = n.grp)
        GROUP BY w),
      up AS (SELECT phrase, CAST(COUNT(*) AS BIGINT) AS n_occ,
          CAST(MAX(plen) AS BIGINT) AS n_words
        FROM ph GROUP BY phrase),
      ps AS (SELECT u.phrase, u.n_occ, u.n_words,
          SUM(CAST(ws.wscore AS DECIMAL(18,6))) AS score
        FROM up u, UNNEST(string_split(u.phrase, ' ')) AS s(w)
        JOIN ws ON ws.w = s.w
        GROUP BY u.phrase, u.n_occ, u.n_words)
      SELECT phrase, n_words, n_occ,
        round(CAST(score AS DOUBLE), 6) AS rake_score
      FROM ps ORDER BY rake_score DESC, phrase LIMIT 25""")) { (s, dir) =>
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val tok = docs(s, dir)
      .select($"doc_id", posexplode(Text.tokens($"text")).as(Seq("i", "w")))
    val ns = tok
      .filter($"w" =!= "the" && $"w" =!= "a" && $"w" =!= "")
      .withColumn("grp", $"i" - row_number().over(
        Window.partitionBy($"doc_id").orderBy($"i")))
    val ph = ns.groupBy($"doc_id", $"grp")
      .agg(array_join(transform(array_sort(collect_list(struct($"i", $"w"))),
          x => x("w")), " ").as("phrase"),
        count(lit(1)).as("plen"))
    val ws = ns.join(ph, Seq("doc_id", "grp"))
      .groupBy($"w")
      .agg(round(sum($"plen").cast("double") / count(lit(1)), 6).as("wscore"))
    val up = ph.groupBy($"phrase")
      .agg(count(lit(1)).as("n_occ"), max($"plen").cast("long").as("n_words"))
    up.select($"phrase", $"n_occ", $"n_words",
        explode(Text.tokens($"phrase")).as("w"))
      .join(ws, Seq("w"))
      .groupBy($"phrase", $"n_occ", $"n_words")
      .agg(sum($"wscore".cast("decimal(18,6)")).as("score"))
      .select($"phrase", $"n_words", $"n_occ",
        round($"score".cast("double"), 6).as("rake_score"))
      .orderBy(desc("rake_score"), $"phrase")
      .limit(25)
  }

  /** One weighted-PageRank oracle round over the co-occurrence graph:
    * per-edge contribution pr·w/strength rounded to 9dp, DECIMAL-summed
    * per target (order-free), then the damped update. */
  private def trStepCte(t: Int): String = s"""
      ct$t AS (SELECT e.dst,
          CAST(round(p.pr * e.wt / s.strength, 9) AS DECIMAL(28,12)) AS c
        FROM edges e JOIN pr${t - 1} p ON p.w = e.src
        JOIN str s ON s.src = e.src),
      cs$t AS (SELECT dst, SUM(c) AS sc FROM ct$t GROUP BY dst),
      pr$t AS (SELECT v.w,
          0.15::DOUBLE / nn.n + 0.85::DOUBLE * CAST(COALESCE(s.sc, 0) AS DOUBLE) AS pr
        FROM vocab v CROSS JOIN nn LEFT JOIN cs$t s ON s.dst = v.w)"""

  /** TextRank keyword extraction (Mihalcea & Tarau 2004): weighted
    * PageRank over the word co-occurrence graph. Nodes are the corpus's
    * top-150 non-stopword tokens by frequency; an undirected edge
    * connects two vocabulary words wherever they are ADJACENT in a
    * document's original token sequence, weighted by the corpus-wide
    * adjacency count. Three damped rounds (d=0.85, teleport over the
    * vocabulary) rank words by how central they sit in the
    * co-occurrence topology — the graph-centrality complement of
    * [[dRakeKeyphrases]] (degree/frequency islands) and
    * [[dCollocations]] (pairwise lift). Top 25 keywords.
    *
    * Scale shape: the vocabulary is CAPPED at 150 (TakeOrdered, never
    * an unpartitioned rank window), so the graph and every PR round
    * are corpus-size-independent; the only corpus-scale passes are the
    * token explode + a doc-local lead() window for adjacency and one
    * hash-agg for edge weights. Vocabulary joins broadcast. Engine
    * parity: same contribution rounding/DECIMAL-sum discipline as
    * e_pagerank_centrality, so the oracle replays all three rounds. */
  val dTextrankKeywords: Spec = Spec(
    "d_textrank_keywords",
    oracle = Some(s"""
      WITH t AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
      tok AS (SELECT doc_id, i, l[i+1] AS w
        FROM (SELECT doc_id, l, unnest(range(0, len(l))) AS i FROM t)),
      vocab AS (SELECT w FROM tok
        WHERE w <> 'the' AND w <> 'a' AND w <> ''
        GROUP BY w
        QUALIFY row_number() OVER (ORDER BY COUNT(*) DESC, w) <= 150),
      adj AS (SELECT LEAST(a.w, b.w) AS wa, GREATEST(a.w, b.w) AS wb,
          CAST(COUNT(*) AS BIGINT) AS wt
        FROM tok a JOIN tok b ON b.doc_id = a.doc_id AND b.i = a.i + 1
        JOIN vocab va ON va.w = a.w JOIN vocab vb ON vb.w = b.w
        WHERE a.w <> b.w GROUP BY 1, 2),
      edges AS (SELECT wa AS src, wb AS dst, wt FROM adj
        UNION ALL SELECT wb, wa, wt FROM adj),
      str AS (SELECT src, CAST(SUM(wt) AS DOUBLE) AS strength,
          COUNT(*) AS deg FROM edges GROUP BY src),
      nn AS (SELECT COUNT(*) AS n FROM vocab),
      pr0 AS (SELECT w, 1.0::DOUBLE / nn.n AS pr FROM vocab CROSS JOIN nn),
      ${trStepCte(1)},
      ${trStepCte(2)},
      ${trStepCte(3)}
      SELECT p.w AS tok, CAST(COALESCE(s.deg, 0) AS BIGINT) AS degree,
        ROUND(p.pr, 9) AS textrank
      FROM pr3 p LEFT JOIN str s ON s.src = p.w
      ORDER BY textrank DESC, tok LIMIT 25""")) { (s, dir) =>
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val tok = docs(s, dir)
      .select($"doc_id", posexplode(Text.tokens($"text")).as(Seq("i", "w")))
    val vocab = tok
      .filter($"w" =!= "the" && $"w" =!= "a" && $"w" =!= "")
      .groupBy($"w").agg(count(lit(1)).as("n"))
      .orderBy($"n".desc, $"w").limit(150)
      .select($"w")
      .localCheckpoint() // 150 rows, reused by every round
    // adjacency in the ORIGINAL sequence via a doc-local lead window —
    // no positional self-join, no corpus-scale shuffle beyond the agg
    val seqW = Window.partitionBy($"doc_id").orderBy($"i")
    val adj = tok
      .withColumn("w2", lead($"w", 1).over(seqW))
      .filter($"w2".isNotNull && $"w" =!= $"w2")
      .join(broadcast(vocab.withColumnRenamed("w", "wv")), $"w" === $"wv")
      .join(broadcast(vocab.withColumnRenamed("w", "wv2")), $"w2" === $"wv2")
      .select(least($"w", $"w2").as("wa"), greatest($"w", $"w2").as("wb"))
      .groupBy($"wa", $"wb").agg(count(lit(1)).as("wt"))
    val edges = adj.select($"wa".as("src"), $"wb".as("dst"), $"wt")
      .unionAll(adj.select($"wb", $"wa", $"wt").toDF("src", "dst", "wt"))
      .localCheckpoint() // reused every iteration
    val str = edges.groupBy($"src")
      .agg(sum($"wt").cast("double").as("strength"), count(lit(1)).as("deg"))
    val nn = broadcast(vocab.agg(count(lit(1)).as("n")))
    // checkpoint pr0 so the loop's unpersist(prev) sees a truncated
    // lineage — otherwise round 1 would walk pr0's plan and drop the
    // vocab checkpoint that every later round still reads
    var pr = vocab.crossJoin(nn).select($"w", (lit(1.0) / $"n").as("pr"))
      .localCheckpoint()
    for (_ <- 1 to 3) {
      val contrib = edges
        .join(pr.withColumnRenamed("w", "src"), Seq("src"))
        .join(str.select($"src", $"strength"), Seq("src"))
        .select($"dst",
          round($"pr" * $"wt" / $"strength", 9).cast("decimal(28,12)").as("c"))
      val sums = contrib.groupBy($"dst").agg(sum($"c").as("sc"))
      val prev = pr
      pr = vocab
        .join(sums, vocab("w") === sums("dst"), "left")
        .crossJoin(nn)
        .select($"w",
          (lit(0.15) / $"n" +
            lit(0.85) * coalesce($"sc", lit(0).cast("decimal(38,12)"))
              .cast("double")).as("pr"))
        .localCheckpoint()
      graft.ops.Checkpoints.unpersist(prev)
    }
    pr
      .join(str.select($"src".as("w"), $"deg"), Seq("w"), "left")
      .select($"w".as("tok"), coalesce($"deg", lit(0L)).cast("long").as("degree"),
        round($"pr", 9).as("textrank"))
      .orderBy(desc("textrank"), $"tok")
      .limit(25)
  }

  val specs: Seq[Spec] = Seq(dNsfwMultilang, dStopwordMultilang, dNsfwRedact,
    dSourceNsfwRollup,
    dBpeTokenStats, dBpePairCounts, dBpeMerges, dBpeEncode, dLangNormalize,
    dTfidfDocPairs, dHybridSimilarity, dCollocations, dRankingAgreement,
    dRakeKeyphrases, dTextrankKeywords)
}
