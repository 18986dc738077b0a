package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.{ConnectedComponents, MinHash, SimHash, Skew, Text}

/** Deduplication family (SURVEY §2.11 + training-pipeline additions):
  * exact content-hash, MinHash+LSH with verified Jaccard, LSH clusters
  * via connected components, block-local exact Jaccard, SimHash.
  */
object Dedup {

  /** Planted-corpus headroom guard: the eval rows plant near-dup
    * variants at `doc_id + offset`; if real ids ever reach the offset
    * the planted ids collide with genuine documents and the eval
    * silently skews WHILE staying hash-green (oracle and engine share
    * the collision — the gate cannot catch it). So fail loudly
    * instead: one bounded 1-row max() collect (the repo's standard
    * require-guarded driver-stats idiom) before the eval runs. */
  private[queries] def requirePlantedHeadroom(
      docs: org.apache.spark.sql.DataFrame, idCol: String, offset: Long): Unit = {
    val mx = docs.agg(max(col(idCol))).head.getLong(0)
    require(mx < offset,
      s"planted-id offset $offset collides with real $idCol (max=$mx): " +
        "raise the offset or shrink the corpus — the eval would silently skew")
  }

  /** The minhash recipe mirrored verbatim in SQL: one md5-derived
    * 60-bit integer per shingle, universal-hash permutations
    * (a_p·h + b_p) mod 2^61−1 via HUGEINT, band keys hashed over the
    * concatenated decimal signature slice. Must stay in lockstep with
    * [[graft.ops.MinHash]] / [[graft.functions.MinHashSignature]].
    *
    * NOTE the oracle states NO-CAP all-pairs semantics while the engine
    * star-caps buckets past `maxBucket` (default 1000) — parity holds
    * because no verify-scale bucket comes near the cap. If corpus growth
    * ever trips it, the engine emits a non-zero `capped_buckets` observe
    * metric (graft_buckets_*) rather than failing silently. */
  /** Shared tokenize → shingle → signature → band → CANDIDATE-PAIR
    * chain (through `pairs(ida, idb)`), restated by the pair, cluster
    * and containment oracles so none can drift. */
  private[queries] val minhashCandCte = """
      toks AS (
        SELECT doc_id, string_split(text,' ') AS l FROM documents),
      sh AS (
        SELECT doc_id, list_distinct(list_transform(range(1, greatest(len(l)-1, 1)),
          i -> array_to_string(l[i:i+2], ' '))) AS sh
        FROM toks WHERE len(l) >= 3),
      sig AS (
        SELECT doc_id, list_transform(range(0, 32),
          p -> CAST(list_min(list_transform(sh, s ->
            (CAST(2*p*2654435761 + 1 AS HUGEINT) *
               (('0x' || substr(md5(s), 1, 15))::BIGINT) + (p*40503 + 7))
              % 2305843009213693951)) AS BIGINT)) AS sig
        FROM sh),
      bands AS (
        SELECT doc_id, b,
          md5(b::VARCHAR || '|' || array_to_string(sig[b*4+1:b*4+4], '')) AS key
        FROM sig CROSS JOIN unnest(range(0, 8)) AS t(b)),
      pairs AS (
        SELECT DISTINCT a.doc_id AS ida, b.doc_id AS idb
        FROM bands a JOIN bands b ON a.b = b.b AND a.key = b.key
          AND a.doc_id < b.doc_id)"""

  private[queries] val minhashPairsSql = s"""
      WITH $minhashCandCte,
      j AS (
        SELECT ida, idb,
          CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE) /
            (len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh))) AS jac
        FROM pairs JOIN sh sa ON sa.doc_id = ida JOIN sh sb ON sb.doc_id = idb)
      SELECT ida AS id_a, idb AS id_b, ROUND(jac, 6) AS jaccard
      FROM j WHERE jac >= 0.5 ORDER BY id_a, id_b"""

  /** MinHash+LSH near-duplicate pairs with exact-Jaccard verification. */
  val ddMinhashPairs: Spec = Spec(
    "dd_minhash_pairs",
    oracle = Some(minhashPairsSql),
    bench = true) { (s, dir) =>
    import s.implicits._
    MinHash.candidatePairs(
        Tables.load(s, dir, "documents"), "doc_id", "text",
        shingleSize = 3, numPerm = 32, bands = 8, threshold = 0.5)
      .select($"id_a", $"id_b", round($"jaccard", 6).as("jaccard"))
      .orderBy($"id_a", $"id_b")
  }

  /** Language-BLOCKED MinHash pairs: `lang` joins the LSH bucket key,
    * so candidates only form inside a language — near-dups across
    * languages are out of scope by declaration (the standard corpus-
    * dedup policy), and at 100 TB the extra key component splits viral
    * buckets by language BEFORE the star cap has to act: the cheap
    * skew lever. Bucket-key equality is unchanged otherwise, so the
    * result is EXACTLY the global pair set restricted to same-lang
    * pairs — which is what the oracle states. */
  val ddMinhashBlocked: Spec = Spec(
    "dd_minhash_blocked",
    oracle = Some("""
      WITH toks AS (
        SELECT doc_id, string_split(text,' ') AS l FROM documents),
      sh AS (
        SELECT doc_id, list_distinct(list_transform(range(1, greatest(len(l)-1, 1)),
          i -> array_to_string(l[i:i+2], ' '))) AS sh
        FROM toks WHERE len(l) >= 3),
      sig AS (
        SELECT doc_id, list_transform(range(0, 32),
          p -> CAST(list_min(list_transform(sh, s ->
            (CAST(2*p*2654435761 + 1 AS HUGEINT) *
               (('0x' || substr(md5(s), 1, 15))::BIGINT) + (p*40503 + 7))
              % 2305843009213693951)) AS BIGINT)) AS sig
        FROM sh),
      bands AS (
        SELECT doc_id, b,
          md5(b::VARCHAR || '|' || array_to_string(sig[b*4+1:b*4+4], '')) AS key
        FROM sig CROSS JOIN unnest(range(0, 8)) AS t(b)),
      pairs AS (
        SELECT DISTINCT a.doc_id AS ida, b.doc_id AS idb
        FROM bands a JOIN bands b ON a.b = b.b AND a.key = b.key
          AND a.doc_id < b.doc_id
        JOIN documents da ON da.doc_id = a.doc_id
        JOIN documents db ON db.doc_id = b.doc_id AND da.lang = db.lang),
      j AS (
        SELECT ida, idb,
          CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE) /
            (len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh))) AS jac
        FROM pairs JOIN sh sa ON sa.doc_id = ida JOIN sh sb ON sb.doc_id = idb)
      SELECT ida AS id_a, idb AS id_b, ROUND(jac, 6) AS jaccard
      FROM j WHERE jac >= 0.5 ORDER BY id_a, id_b""")) { (s, dir) =>
    import s.implicits._
    MinHash.candidatePairs(
        Tables.load(s, dir, "documents"), "doc_id", "text",
        shingleSize = 3, numPerm = 32, bands = 8, threshold = 0.5,
        blockCols = Seq("lang"))
      .select($"id_a", $"id_b", round($"jaccard", 6).as("jaccard"))
      .orderBy($"id_a", $"id_b")
  }

  /** Incremental dedup: batch (doc_id % 10 = 0) against a prebuilt
    * corpus LSH state (the rest) — the daily-increment shape at 100 TB:
    * corpus signatures computed once, per-run cost scales with the
    * batch. The oracle is the FULL pair recipe restricted to pairs
    * touching the batch, which the batch-internal + batch↔corpus
    * decomposition must reproduce exactly (caps untripped at verify
    * scale). */
  val ddMinhashIncremental: Spec = Spec(
    "dd_minhash_incremental",
    oracle = Some(minhashPairsSql.replace(
      "FROM j WHERE jac >= 0.5",
      "FROM j WHERE jac >= 0.5 AND (ida % 10 = 0 OR idb % 10 = 0)")),
    bench = true) { (s, dir) =>
    import s.implicits._
    val docs = Tables.load(s, dir, "documents")
    // Materialize the corpus state ONCE (production reads it from a
    // stored state table — that's what makes incremental incremental).
    // Without this, the op's two corpus branches (bands for the
    // touched-bucket semi, sh for the verify lookup) each recompute
    // the shingle expressions from raw text: measured 3.8 s vs the
    // one-shot dd_minhash_pairs' 1.1 s at sf0.1. State-in, not
    // recompute-in, is the op's real contract.
    val corpusState = MinHash.lshState(docs.filter($"doc_id" % 10 =!= 0),
      "doc_id", "text").localCheckpoint()
    val batchState = MinHash.lshState(docs.filter($"doc_id" % 10 === 0), "doc_id", "text")
    MinHash.incrementalCandidatePairs(batchState, corpusState, threshold = 0.5)
      .select($"id_a", $"id_b", round($"jaccard", 6).as("jaccard"))
      .orderBy($"id_a", $"id_b")
  }

  /** Full-corpus cluster oracle: the pair recipe + a recursive
    * reachability walk with min-label (DuckDB recursive CTE) — feasible
    * because UNION dedups (id, comp) pairs, so the walk terminates.
    * Shared by the one-shot clustering (dd_minhash_clusters) and the
    * incremental merge (dd_cc_incremental), whose defining property is
    * exact equality with this full recompute. */
  /** The shared oracle chain through `labels` (doc → component, min-id
    * per LSH-verified near-dup cluster); d_cluster_split
    * (queries/TrainingPrep.scala) extends this same chain, so the two
    * oracles cannot drift. Must follow `WITH RECURSIVE`. */
  private[queries] val minhashLabelsCte = s"""
      $minhashCandCte,
      verified AS (
        SELECT ida, idb FROM pairs
        JOIN sh sa ON sa.doc_id = ida JOIN sh sb ON sb.doc_id = idb
        WHERE CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE) /
          (len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh))) >= 0.5),
      edges AS (
        SELECT ida AS src, idb AS dst FROM verified
        UNION ALL SELECT idb, ida FROM verified),
      walk(id, comp) AS (
        SELECT src, src FROM edges
        UNION
        SELECT e.dst, w.comp FROM walk w JOIN edges e ON e.src = w.id),
      labels AS (SELECT id, MIN(comp) AS component FROM walk GROUP BY id)"""

  private[queries] val minhashClustersSql = s"""
      WITH RECURSIVE $minhashLabelsCte
      SELECT component, COUNT(*) AS cluster_size, MAX(id) AS max_id
      FROM labels GROUP BY component ORDER BY component"""

  /** Duplicate clusters: connected components over the LSH pair graph,
    * keep-min-per-component. */
  val ddMinhashClusters: Spec = Spec(
    "dd_minhash_clusters",
    oracle = Some(minhashClustersSql)) { (s, dir) =>
    import s.implicits._
    val pairs = MinHash.candidatePairs(
      Tables.load(s, dir, "documents"), "doc_id", "text",
      shingleSize = 3, numPerm = 32, bands = 8, threshold = 0.5)
    MinHash.clusters(pairs)
      .groupBy($"component")
      .agg(count(lit(1)).as("cluster_size"), max($"id").as("max_id"))
      .orderBy($"component")
  }

  /** INCREMENTAL connected components: the corpus (doc_id % 10 != 0) is
    * clustered once — that labelling is the persisted state — and the
    * daily batch (doc_id % 10 = 0) arrives as a new edge set from the
    * incremental LSH pair path. [[ConnectedComponents.incremental]]
    * merges the batch edges into the existing labels touching ONLY the
    * affected components: old clusters re-enter the solve as star
    * edges (member → label), which preserve reachability exactly, so
    * the merged labelling provably equals a full recompute — and the
    * oracle states precisely that (the full-corpus cluster recipe).
    *
    * Scale: per-increment cost is batch + affected-component sized.
    * The corpus label state is scanned but never shuffled — the
    * touched-node and affected-component frames are batch-proportional
    * and ride broadcasts into the semi/anti restriction joins. */
  val ddCcIncremental: Spec = Spec(
    "dd_cc_incremental",
    oracle = Some(minhashClustersSql)) { (s, dir) =>
    import s.implicits._
    val docs = Tables.load(s, dir, "documents")
    val corpus = docs.filter($"doc_id" % 10 =!= 0)
    val batch = docs.filter($"doc_id" % 10 === 0)
    val base = MinHash.clusters(MinHash.candidatePairs(
      corpus, "doc_id", "text",
      shingleSize = 3, numPerm = 32, bands = 8, threshold = 0.5))
    val newEdges = MinHash.incrementalCandidatePairs(
        MinHash.lshState(batch, "doc_id", "text"),
        MinHash.lshState(corpus, "doc_id", "text"), threshold = 0.5)
      .select($"id_a".as("src"), $"id_b".as("dst"))
    ConnectedComponents.incremental(base, newEdges)
      .groupBy($"component")
      .agg(count(lit(1)).as("cluster_size"), max($"id").as("max_id"))
      .orderBy($"component")
  }

  /** Near-dup pair EXPLANATION: for every verified LSH pair, the
    * common-prefix / common-suffix decomposition of the two texts —
    * the "what actually changed" report reviewers want next to a
    * dedup decision (changed_a/changed_b = the middle spans left after
    * stripping the shared ends, the single-edit-region diff shape).
    * Both engines compute the first-mismatch position with the same
    * higher-order filter-over-positions form (Spark `filter(sequence)`
    * / DuckDB `list_filter(range)`), and the suffix is clamped so
    * prefix+suffix never overlap.
    *
    * Scale: per-pair cost is O(min doc length) over the VERIFIED pair
    * set only (LSH-bucketed, star-capped) — never a corpus-wide text
    * comparison. */
  val ddPairDiffSpans: Spec = Spec(
    "dd_pair_diff_spans",
    oracle = Some("""
      WITH toks AS (
        SELECT doc_id, string_split(text,' ') AS l FROM documents),
      sh AS (
        SELECT doc_id, list_distinct(list_transform(range(1, greatest(len(l)-1, 1)),
          i -> array_to_string(l[i:i+2], ' '))) AS sh
        FROM toks WHERE len(l) >= 3),
      sig AS (
        SELECT doc_id, list_transform(range(0, 32),
          p -> CAST(list_min(list_transform(sh, s ->
            (CAST(2*p*2654435761 + 1 AS HUGEINT) *
               (('0x' || substr(md5(s), 1, 15))::BIGINT) + (p*40503 + 7))
              % 2305843009213693951)) AS BIGINT)) AS sig
        FROM sh),
      bands AS (
        SELECT doc_id, b,
          md5(b::VARCHAR || '|' || array_to_string(sig[b*4+1:b*4+4], '')) AS key
        FROM sig CROSS JOIN unnest(range(0, 8)) AS t(b)),
      pairs AS (
        SELECT DISTINCT a.doc_id AS ida, b.doc_id AS idb
        FROM bands a JOIN bands b ON a.b = b.b AND a.key = b.key
          AND a.doc_id < b.doc_id),
      verified AS (
        SELECT ida, idb FROM pairs
        JOIN sh sa ON sa.doc_id = ida JOIN sh sb ON sb.doc_id = idb
        WHERE CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE) /
          (len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh))) >= 0.5),
      t AS (
        SELECT ida, idb, da.text AS ta, db.text AS tb,
          len(da.text) AS la, len(db.text) AS lb,
          least(len(da.text), len(db.text)) AS n
        FROM verified
        JOIN documents da ON da.doc_id = ida
        JOIN documents db ON db.doc_id = idb),
      sp AS (
        SELECT ida, idb, la, lb, n,
          CASE WHEN n = 0 THEN 0 ELSE COALESCE(list_min(list_filter(
            range(1, n + 1),
            i -> substr(ta, i, 1) <> substr(tb, i, 1))) - 1, n) END AS lcp,
          CASE WHEN n = 0 THEN 0 ELSE COALESCE(list_min(list_filter(
            range(1, n + 1),
            i -> substr(reverse(ta), i, 1) <> substr(reverse(tb), i, 1))) - 1, n)
          END AS raw_suf
        FROM t)
      SELECT ida AS id_a, idb AS id_b,
        CAST(lcp AS BIGINT) AS common_prefix,
        CAST(least(raw_suf, n - lcp) AS BIGINT) AS common_suffix,
        CAST(la - lcp - least(raw_suf, n - lcp) AS BIGINT) AS changed_a,
        CAST(lb - lcp - least(raw_suf, n - lcp) AS BIGINT) AS changed_b
      FROM sp ORDER BY id_a, id_b""")) { (s, dir) =>
    import s.implicits._
    val d = Tables.load(s, dir, "documents")
    val pairs = MinHash.candidatePairs(
      d, "doc_id", "text",
      shingleSize = 3, numPerm = 32, bands = 8, threshold = 0.5)
    pairs
      .join(d.select($"doc_id".as("id_a"), $"text".as("ta")), "id_a")
      .join(d.select($"doc_id".as("id_b"), $"text".as("tb")), "id_b")
      .withColumn("la", length($"ta")).withColumn("lb", length($"tb"))
      .withColumn("n", least($"la", $"lb"))
      .withColumn("lcp",
        when($"n" === 0, lit(0)).otherwise(coalesce(
          array_min(expr(
            "filter(sequence(1, n), i -> substring(ta, i, 1) != substring(tb, i, 1))")) - 1,
          $"n")))
      .withColumn("raw_suf",
        when($"n" === 0, lit(0)).otherwise(coalesce(
          array_min(expr(
            "filter(sequence(1, n), i -> substring(reverse(ta), i, 1) != substring(reverse(tb), i, 1))")) - 1,
          $"n")))
      .withColumn("suf", least($"raw_suf", $"n" - $"lcp"))
      .select($"id_a", $"id_b",
        $"lcp".cast("long").as("common_prefix"),
        $"suf".cast("long").as("common_suffix"),
        ($"la" - $"lcp" - $"suf").cast("long").as("changed_a"),
        ($"lb" - $"lcp" - $"suf").cast("long").as("changed_b"))
      .orderBy($"id_a", $"id_b")
  }

  /** Exact near-dup within (lang, source) blocks — computed by PREFIX
    * FILTERING (MinHash.jaccardPairsExact), not an all-pairs block
    * join: candidates come from shared prefix shingles, so the cost is
    * Σ bucket² over (block, shingle) buckets instead of Σ block².
    * Output is provably identical to the all-pairs form (the oracle
    * below still states the quadratic semantics) while no prefix-token
    * bucket exceeds the star-cap; a tripped cap is observable via the
    * graft_buckets_* metric (see Buckets.pairs). */
  val ddJaccardBlockPairs: Spec = Spec(
    "dd_jaccard_block_pairs",
    oracle = Some("""
      WITH s AS (
        SELECT doc_id, lang, source,
          list_distinct(list_transform(range(1, greatest(len(string_split(text,' '))-1, 1)),
            i -> array_to_string(string_split(text,' ')[i:i+2], ' '))) AS sh
        FROM documents WHERE len(string_split(text,' ')) >= 3)
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        ROUND(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
          (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))), 6) AS jaccard
      FROM s a JOIN s b ON a.lang = b.lang AND a.source = b.source
        AND a.doc_id < b.doc_id
      WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
          (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= 0.5
      ORDER BY id_a, id_b""")) { (s, dir) =>
    import s.implicits._
    val sets = Tables.load(s, dir, "documents")
      .filter(size(Text.tokens($"text")) >= 3)
      .select($"doc_id", $"lang", $"source",
        Text.shingleSet($"text", 3).as("sh"))
    MinHash.jaccardPairsExact(sets, "doc_id", "sh",
        Seq("lang", "source"), threshold = 0.5)
      .select($"id_a", $"id_b", round($"jaccard", 6).as("jaccard"))
      .orderBy($"id_a", $"id_b")
  }

  /** LSH RECALL EVALUATION: what fraction of the EXACT near-dup pairs
    * (the block-quadratic ground truth [[ddJaccardBlockPairs]]
    * computes) do the minhash band candidates actually surface, per
    * similarity threshold — the e_ivf_recall/e_hnsw_recall
    * measure-don't-guess pattern pointed at the dedup sketch itself
    * (band-collision theory promises P(caught) = 1 − (1 − J^r)^b;
    * this row reports what the corpus actually got). Recall is an
    * exact integer per-mille; the candidate set is the UNVERIFIED band
    * output, so a banding bug (not just a verify bug) goes red.
    *
    * Scale shape: ground truth rides the prefix-filtered blocked join
    * (never corpus-quadratic), candidates the capped band scaffold;
    * the intersection is one pair-keyed join of two bounded pair
    * tables. */
  val ddLshRecall: Spec = Spec(
    "dd_lsh_recall",
    oracle = Some(s"""
      WITH docs2 AS (
        SELECT doc_id, text, lang, source FROM documents
        UNION ALL
        SELECT doc_id + 1000000,
          array_to_string(list_filter(string_split(text, ' '),
            (x, i) -> (i - 1) % 8 <> 0), ' '), lang, source
        FROM documents WHERE doc_id % 20 = 0
        UNION ALL
        SELECT doc_id + 2000000,
          array_to_string(list_filter(string_split(text, ' '),
            (x, i) -> (i - 1) % 20 <> 0), ' '), lang, source
        FROM documents WHERE doc_id % 20 = 10),
      ${minhashCandCte.replace("FROM documents", "FROM docs2")},
      sblk AS (
        SELECT doc_id, lang, source,
          list_distinct(list_transform(range(1, greatest(len(string_split(text,' '))-1, 1)),
            i -> array_to_string(string_split(text,' ')[i:i+2], ' '))) AS sh
        FROM docs2 WHERE len(string_split(text,' ')) >= 3),
      exact AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
          CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
            (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) AS jac
        FROM sblk a JOIN sblk b ON a.lang = b.lang AND a.source = b.source
          AND a.doc_id < b.doc_id
        WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
          (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= 0.5),
      t AS (SELECT * FROM (VALUES (0.5), (0.75), (0.9)) AS t(thr)),
      j AS (SELECT t.thr, e.id_a, e.id_b,
          (p.ida IS NOT NULL) AS caught
        FROM t JOIN exact e ON e.jac >= t.thr
        LEFT JOIN pairs p ON p.ida = e.id_a AND p.idb = e.id_b)
      SELECT thr AS threshold,
        CAST(COUNT(*) AS BIGINT) AS n_exact,
        CAST(SUM(CASE WHEN caught THEN 1 ELSE 0 END) AS BIGINT) AS n_caught,
        CAST(SUM(CASE WHEN caught THEN 1 ELSE 0 END) * 1000 // COUNT(*)
          AS BIGINT) AS recall_milli
      FROM j GROUP BY thr ORDER BY threshold""")) { (s, dir) =>
    import s.implicits._
    val base = Tables.load(s, dir, "documents")
      .select($"doc_id", $"text", $"lang", $"source")
    requirePlantedHeadroom(base, "doc_id", 1000000L)
    def dropped(res: Int, every: Int, off: Long) =
      Tables.load(s, dir, "documents").filter($"doc_id" % 20 === res)
        .select(($"doc_id" + off).as("doc_id"),
          array_join(org.apache.spark.sql.functions.filter(
            Text.tokens($"text"), (x, i) => i % every =!= 0), " ")
            .as("text"),
          $"lang", $"source")
    val docs2 = base.unionByName(dropped(0, 8, 1000000L))
      .unionByName(dropped(10, 20, 2000000L))
      .localCheckpoint() // ground truth AND candidates share the corpus
    val sets = docs2.filter(size(Text.tokens($"text")) >= 3)
      .select($"doc_id", $"lang", $"source",
        Text.shingleSet($"text", 3).as("sh"))
    val exact = MinHash.jaccardPairsExact(sets, "doc_id", "sh",
        Seq("lang", "source"), threshold = 0.5)
      .select($"id_a", $"id_b", $"jaccard")
    val cand = MinHash.candidatePairs(
        docs2.select($"doc_id", $"text"), "doc_id", "text",
        shingleSize = 3, numPerm = 32, bands = 8, threshold = 0.0)
      .select($"id_a", $"id_b", lit(true).as("caught"))
    val thr = Seq(0.5, 0.75, 0.9).toDF("threshold")
    broadcast(thr).join(exact, $"jaccard" >= $"threshold")
      .join(cand, Seq("id_a", "id_b"), "left")
      .groupBy($"threshold")
      .agg(count(lit(1)).as("n_exact"),
        sum(when($"caught", 1L).otherwise(0L)).as("n_caught"),
        expr("sum(case when caught then 1 else 0 end) * 1000" +
          " div count(*)").as("recall_milli"))
      .orderBy($"threshold")
  }

  /** LSH PRECISION EVALUATION — [[ddLshRecall]]'s sibling: of the
    * band-candidate pairs the sketch surfaces, what fraction actually
    * clears each similarity threshold (1 − precision is the exact-
    * verify work the pipeline pays per candidate — the number that
    * decides whether to spend more bands on recall or tighter bands
    * on precision). Candidates and exact Jaccards come from the same
    * planted-near-dup corpus as the recall row, so the two print as
    * one table. Precision is an exact integer per-mille.
    *
    * Scale shape: one capped band-candidate build + the per-candidate
    * exact verify [[ddMinhashPairs]] already pays; one 3-row grid
    * broadcast. */
  val ddLshPrecision: Spec = Spec(
    "dd_lsh_precision",
    oracle = Some(s"""
      WITH docs2 AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 1000000,
          array_to_string(list_filter(string_split(text, ' '),
            (x, i) -> (i - 1) % 8 <> 0), ' ')
        FROM documents WHERE doc_id % 20 = 0
        UNION ALL
        SELECT doc_id + 2000000,
          array_to_string(list_filter(string_split(text, ' '),
            (x, i) -> (i - 1) % 20 <> 0), ' ')
        FROM documents WHERE doc_id % 20 = 10),
      ${minhashCandCte.replace("FROM documents", "FROM docs2")},
      j AS (
        SELECT ida, idb,
          CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE) /
            (len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh)))
            AS jac
        FROM pairs JOIN sh sa ON sa.doc_id = ida
        JOIN sh sb ON sb.doc_id = idb),
      t AS (SELECT * FROM (VALUES (0.5), (0.75), (0.9)) AS t(thr)),
      g AS (SELECT t.thr,
          CAST(COUNT(*) AS BIGINT) AS n_candidates,
          CAST(SUM(CASE WHEN j.jac >= t.thr THEN 1 ELSE 0 END) AS BIGINT)
            AS n_good
        FROM t CROSS JOIN j GROUP BY t.thr)
      SELECT thr AS threshold, n_candidates, n_good,
        CAST(n_good * 1000 // n_candidates AS BIGINT) AS precision_milli
      FROM g WHERE n_candidates > 0 ORDER BY threshold""")) { (s, dir) =>
    import s.implicits._
    val base = Tables.load(s, dir, "documents").select($"doc_id", $"text")
    requirePlantedHeadroom(base, "doc_id", 1000000L)
    def dropped(res: Int, every: Int, off: Long) =
      Tables.load(s, dir, "documents").filter($"doc_id" % 20 === res)
        .select(($"doc_id" + off).as("doc_id"),
          array_join(org.apache.spark.sql.functions.filter(
            Text.tokens($"text"), (x, i) => i % every =!= 0), " ")
            .as("text"))
    val docs2 = base.unionByName(dropped(0, 8, 1000000L))
      .unionByName(dropped(10, 20, 2000000L))
    val cand = MinHash.candidatePairs(docs2, "doc_id", "text",
        shingleSize = 3, numPerm = 32, bands = 8, threshold = 0.0)
      .select($"id_a", $"id_b", $"jaccard")
      .localCheckpoint() // all three grid rows scan the same candidates
    val thr = Seq(0.5, 0.75, 0.9).toDF("threshold")
    broadcast(thr).crossJoin(cand)
      .groupBy($"threshold")
      .agg(count(lit(1)).as("n_candidates"),
        sum(when($"jaccard" >= $"threshold", 1L).otherwise(0L))
          .as("n_good"))
      .filter($"n_candidates" > 0)
      .select($"threshold", $"n_candidates", $"n_good",
        expr("(n_good * 1000) div n_candidates").as("precision_milli"))
      .orderBy($"threshold")
  }

  /** WEIGHTED Jaccard + containment over the verified block-pair set —
    * the multiplicity-aware refinement of [[ddJaccardBlockPairs]]:
    * J_w = Σ_t min(tf_a, tf_b) / Σ_t max(tf_a, tf_b) over shingle
    * MULTISETS. Set Jaccard saturates when two docs share vocabulary
    * but repeat it differently (boilerplate-heavy crawl pages); the
    * weighted form is what near-dup triage actually wants there, and
    * the containments (Σmin/|A|, Σmin/|B|) expose subset relations
    * (quote inclusion, page-of-a-larger-doc) that symmetric scores
    * hide.
    *
    * Engine parity: tf's are exact integers, Σmax = |A| + |B| − Σmin
    * needs only the intersection scan + per-doc totals, and each
    * reported score is ONE float division rounded to 6dp.
    *
    * Scale shape: candidates come from the same prefix-filtered
    * (lang, source)-blocked scaffold (never all-pairs); the per-pair
    * cost is one O(len) tf join exactly like [[ddPairDiffSpans]];
    * tf and total frames are one hash agg each off the shingle
    * explode. */
  val ddWeightedJaccard: Spec = Spec(
    "dd_weighted_jaccard",
    oracle = Some("""
      WITH s AS (
        SELECT doc_id, lang, source,
          list_distinct(list_transform(range(1, greatest(len(string_split(text,' '))-1, 1)),
            i -> array_to_string(string_split(text,' ')[i:i+2], ' '))) AS sh
        FROM documents WHERE len(string_split(text,' ')) >= 3),
      pairs AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b
        FROM s a JOIN s b ON a.lang = b.lang AND a.source = b.source
          AND a.doc_id < b.doc_id
        WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
          (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= 0.5),
      tf AS (
        SELECT doc_id, sh, CAST(COUNT(*) AS BIGINT) AS tf FROM (
          SELECT doc_id,
            unnest(list_transform(range(1, greatest(len(string_split(text,' '))-1, 1)),
              i -> array_to_string(string_split(text,' ')[i:i+2], ' '))) AS sh
          FROM documents WHERE len(string_split(text,' ')) >= 3)
        GROUP BY doc_id, sh),
      tot AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS nt FROM tf
              GROUP BY doc_id),
      inter AS (
        SELECT p.id_a, p.id_b,
          CAST(SUM(LEAST(ta.tf, tb.tf)) AS BIGINT) AS smin
        FROM pairs p
        JOIN tf ta ON ta.doc_id = p.id_a
        JOIN tf tb ON tb.doc_id = p.id_b AND tb.sh = ta.sh
        GROUP BY p.id_a, p.id_b)
      SELECT i.id_a, i.id_b,
        ROUND(CAST(i.smin AS DOUBLE)
          / CAST(na.nt + nb.nt - i.smin AS DOUBLE), 6) AS w_jaccard,
        ROUND(CAST(i.smin AS DOUBLE) / CAST(na.nt AS DOUBLE), 6) AS cont_a,
        ROUND(CAST(i.smin AS DOUBLE) / CAST(nb.nt AS DOUBLE), 6) AS cont_b
      FROM inter i
      JOIN tot na ON na.doc_id = i.id_a
      JOIN tot nb ON nb.doc_id = i.id_b
      ORDER BY id_a, id_b""")) { (s, dir) =>
    import s.implicits._
    val d = Tables.load(s, dir, "documents")
      .filter(size(Text.tokens($"text")) >= 3)
    val sets = d.select($"doc_id", $"lang", $"source",
      Text.shingleSet($"text", 3).as("sh"))
    val pairs = MinHash.jaccardPairsExact(sets, "doc_id", "sh",
        Seq("lang", "source"), threshold = 0.5)
      .select($"id_a", $"id_b")
    val tf = d.select($"doc_id",
        explode(Text.wordNgrams(Text.tokens($"text"), 3)).as("sh"))
      .groupBy($"doc_id", $"sh").agg(count(lit(1)).as("tf"))
      .localCheckpoint() // both pair sides + the totals share it
    val tot = tf.groupBy($"doc_id").agg(sum($"tf").cast("long").as("nt"))
    val inter = pairs
      .join(tf.select($"doc_id".as("id_a"), $"sh", $"tf".as("tfa")),
        Seq("id_a"))
      .join(tf.select($"doc_id".as("id_b"), $"sh", $"tf".as("tfb")),
        Seq("id_b", "sh"))
      .groupBy($"id_a", $"id_b")
      .agg(sum(least($"tfa", $"tfb")).cast("long").as("smin"))
    inter
      .join(tot.select($"doc_id".as("id_a"), $"nt".as("na")), Seq("id_a"))
      .join(tot.select($"doc_id".as("id_b"), $"nt".as("nb")), Seq("id_b"))
      .select($"id_a", $"id_b",
        round($"smin".cast("double") /
          ($"na" + $"nb" - $"smin").cast("double"), 6).as("w_jaccard"),
        round($"smin".cast("double") / $"na".cast("double"), 6).as("cont_a"),
        round($"smin".cast("double") / $"nb".cast("double"), 6).as("cont_b"))
      .orderBy($"id_a", $"id_b")
  }

  /** B-BIT MINHASH compression report (Li & König '10): keep only the
    * LOWEST 2 BITS of each of the 32 minhash slots (16× less sketch
    * memory — the difference between a corpus index that fits in RAM
    * and one that doesn't at 100 TB) and estimate Jaccard through the
    * collision correction Ĵ = (C − 2⁻ᵇ)/(1 − 2⁻ᵇ). For every verified
    * pair: the exact Jaccard, the full-signature estimate, and the
    * 2-bit estimate, plus corpus MAEs for both — the
    * measure-don't-guess table that says whether the 16× compression
    * is worth its accuracy cost HERE (theory: variance inflates by
    * ≈ 1/(1−2⁻ᵇ)² ≈ 1.78× at b=2).
    *
    * Engine parity: both estimators are EXACT INTEGER arithmetic —
    * match counts m over 32 slots give est_full = m·1000 ÷ 32 and
    * est_2bit = max(m−8, 0)·1000 ÷ 24 (the clamp precedes the divide,
    * so floor-vs-truncate division semantics never diverge); MAEs are
    * integer sums with one integer division. No float beyond the
    * 6dp exact-Jaccard reference column.
    *
    * Scale shape: identical to [[ddMinhashEstimate]] — capped-bucket
    * candidates, one signature computation, two keyed joins of the
    * bounded pair table back to signatures, a 1-row MAE broadcast. */
  val ddBbitMinhash: Spec = Spec(
    "dd_bbit_minhash",
    oracle = Some(s"""
      WITH $minhashCandCte,
      j AS (
        SELECT ida, idb,
          CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE) /
            (len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh))) AS jac
        FROM pairs JOIN sh sa ON sa.doc_id = ida JOIN sh sb ON sb.doc_id = idb),
      m AS (
        SELECT j.ida AS id_a, j.idb AS id_b, ROUND(j.jac, 6) AS jaccard,
          CAST(len(list_filter(list_transform(range(1, 33),
            i -> sa.sig[i] = sb.sig[i]), x -> x)) AS BIGINT) AS mf,
          CAST(len(list_filter(list_transform(range(1, 33),
            i -> sa.sig[i] % 4 = sb.sig[i] % 4), x -> x)) AS BIGINT) AS mb,
          CAST(FLOOR(j.jac * 1000) AS BIGINT) AS jm
        FROM j JOIN sig sa ON sa.doc_id = j.ida
        JOIN sig sb ON sb.doc_id = j.idb
        WHERE j.jac >= 0.5),
      e AS (
        SELECT id_a, id_b, jaccard,
          mf * 1000 // 32 AS est_full_milli,
          GREATEST(mb - 8, 0) * 1000 // 24 AS est_2bit_milli, jm
        FROM m),
      mae AS (
        SELECT CAST(SUM(abs(est_full_milli - jm)) // COUNT(*) AS BIGINT)
            AS mae_full_milli,
          CAST(SUM(abs(est_2bit_milli - jm)) // COUNT(*) AS BIGINT)
            AS mae_2bit_milli
        FROM e)
      SELECT e.id_a, e.id_b, e.jaccard,
        CAST(e.est_full_milli AS BIGINT) AS est_full_milli,
        CAST(e.est_2bit_milli AS BIGINT) AS est_2bit_milli,
        mae.mae_full_milli, mae.mae_2bit_milli
      FROM e CROSS JOIN mae ORDER BY id_a, id_b""")) { (s, dir) =>
    import s.implicits._
    val withSets = Tables.load(s, dir, "documents")
      .filter(size(Text.tokens($"text")) >= 3)
      .select($"doc_id", Text.shingleSet($"text", 3).as("sh"))
      .filter(size($"sh") > 0)
    val sig = withSets
      .select($"doc_id", MinHash.signature($"sh", 32).as("sig"))
      .localCheckpoint() // both pair sides reuse one signature pass
    val pairs = MinHash.candidatePairs(
        Tables.load(s, dir, "documents").select($"doc_id", $"text"),
        "doc_id", "text",
        shingleSize = 3, numPerm = 32, bands = 8, threshold = 0.5)
      .select($"id_a", $"id_b", round($"jaccard", 6).as("jaccard"),
        floor($"jaccard" * 1000).cast("long").as("jm"))
    def matches(cond: String) = expr(
      s"cast(size(filter(zip_with(sig_a, sig_b, (x, y) -> $cond), " +
        "b -> b)) as bigint)")
    val e = pairs
      .join(sig.select($"doc_id".as("id_a"), $"sig".as("sig_a")), Seq("id_a"))
      .join(sig.select($"doc_id".as("id_b"), $"sig".as("sig_b")), Seq("id_b"))
      .select($"id_a", $"id_b", $"jaccard", $"jm",
        expr("(cast(size(filter(zip_with(sig_a, sig_b, (x, y) -> x = y)," +
          " b -> b)) as bigint) * 1000) div 32").as("est_full_milli"),
        expr("(greatest(cast(size(filter(zip_with(sig_a, sig_b, " +
          "(x, y) -> x % 4 = y % 4), b -> b)) as bigint) - 8, 0) * 1000)" +
          " div 24").as("est_2bit_milli"))
      .localCheckpoint() // pair rows feed the MAE and the output
    val mae = broadcast(e.agg(
      expr("sum(abs(est_full_milli - jm)) div count(*)")
        .cast("long").as("mae_full_milli"),
      expr("sum(abs(est_2bit_milli - jm)) div count(*)")
        .cast("long").as("mae_2bit_milli")))
    e.crossJoin(mae)
      .select($"id_a", $"id_b", $"jaccard", $"est_full_milli",
        $"est_2bit_milli", $"mae_full_milli", $"mae_2bit_milli")
      .orderBy($"id_a", $"id_b")
  }

  /** ICWS WEIGHTED MINHASH (Ioffe '10 — the consistent-weighted-
    * sampling scheme behind every production weighted-Jaccard sketch):
    * k = 16 samples per document over the tf-weighted shingle
    * multiset; P(sample match) = J_w exactly, so the match fraction
    * estimates the SAME weighted Jaccard [[ddWeightedJaccard]]
    * computes exactly — this row reports both plus the corpus MAE,
    * completing the weighted family (exact + sketch + error report)
    * the way dd_minhash_estimate does for the unweighted one.
    *
    * Determinism across engines, the part that usually makes weighted
    * sketches unverifiable: every Gamma/Uniform draw derives from
    * md5 — u = (v + 0.5)·2⁻⁴⁸ over the 48-bit hash prefix is EXACTLY
    * representable (both the add and the power-of-two divide are
    * exact, u strictly inside (0,1) so no ln(0)/NaN path exists), and
    * the whole per-term score collapses to
    * ln a = (ln c − r·(t − β)) − r with r = −(ln u₁ + ln u₂),
    * c-likewise, t = ⌊ln S/r + β⌋ — fixed-order IEEE ops the engines
    * replay bit-for-bit (the established cross-engine ln discipline).
    * The argmin tie-break is total: terms are distinct per doc, so
    * (ln a, term) lexicographic minimum — Spark's array_min over
    * (lna, term, t) structs picks the identical element.
    *
    * Scale shape: sketches are per-doc array arithmetic (k·|terms| ln
    * ops, embarrassingly parallel — production materializes them
    * corpus-wide next to the unweighted signatures); here both engines
    * compute them only for pair-involved docs, keeping the oracle
    * replay exact and cheap. Candidates ride the same capped band
    * scaffold as every minhash row. */
  val ddIcwsMinhash: Spec = {
    def uSql(j: Int): String =
      s"""((CAST(('0x' || substr(md5(term || '|' || p.p::VARCHAR || '|$j'), 1, 12))
           AS BIGINT) + 0.5e0) / 281474976710656.0e0)"""
    Spec(
      "dd_icws_minhash",
      oracle = Some(s"""
      WITH $minhashCandCte,
      jv AS (
        SELECT ida, idb FROM pairs
        JOIN sh sa ON sa.doc_id = ida JOIN sh sb ON sb.doc_id = idb
        WHERE CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE) /
          (len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh)))
          >= 0.5),
      pd AS (SELECT DISTINCT d FROM (
        SELECT ida AS d FROM jv UNION ALL SELECT idb FROM jv)),
      tf0 AS (
        SELECT doc_id, sh2 AS term, CAST(COUNT(*) AS BIGINT) AS tf FROM (
          SELECT doc_id,
            unnest(list_transform(range(1, greatest(len(l)-1, 1)),
              i -> array_to_string(l[i:i+2], ' '))) AS sh2
          FROM toks WHERE len(l) >= 3) GROUP BY doc_id, sh2),
      tot AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS nt FROM tf0
              GROUP BY doc_id),
      samp0 AS (
        SELECT t0.doc_id, p.p, t0.term, t0.tf,
          -(ln(${uSql(1)}) + ln(${uSql(2)})) AS r,
          -(ln(${uSql(3)}) + ln(${uSql(4)})) AS c,
          ${uSql(5)} AS beta
        FROM tf0 t0 JOIN pd ON pd.d = t0.doc_id
        CROSS JOIN unnest(range(0, 16)) AS p(p)),
      samp1 AS (
        SELECT doc_id, p, term,
          CAST(floor(ln(CAST(tf AS DOUBLE)) / r + beta) AS BIGINT) AS t,
          (ln(c) - r * (floor(ln(CAST(tf AS DOUBLE)) / r + beta) - beta)) - r
            AS lna
        FROM samp0),
      samp AS (
        SELECT doc_id, p, term, t FROM (
          SELECT doc_id, p, term, t,
            row_number() OVER (PARTITION BY doc_id, p ORDER BY lna, term)
              AS rn
          FROM samp1) q WHERE rn = 1),
      est AS (
        SELECT j.ida AS id_a, j.idb AS id_b,
          CAST(SUM(CASE WHEN a.term = b.term AND a.t = b.t
                   THEN 1 ELSE 0 END) AS BIGINT) AS m
        FROM jv j JOIN samp a ON a.doc_id = j.ida
        JOIN samp b ON b.doc_id = j.idb AND b.p = a.p
        GROUP BY 1, 2),
      ex AS (
        SELECT j.ida AS id_a, j.idb AS id_b,
          CAST(SUM(LEAST(ta.tf, tb.tf)) AS BIGINT) AS smin
        FROM jv j JOIN tf0 ta ON ta.doc_id = j.ida
        JOIN tf0 tb ON tb.doc_id = j.idb AND tb.term = ta.term
        GROUP BY 1, 2),
      r AS (
        SELECT e.id_a, e.id_b,
          CAST(FLOOR(CAST(x.smin AS DOUBLE)
            / CAST(na.nt + nb.nt - x.smin AS DOUBLE) * 1000) AS BIGINT)
            AS w_jaccard_milli,
          e.m * 1000 // 16 AS est_icws_milli
        FROM est e JOIN ex x ON x.id_a = e.id_a AND x.id_b = e.id_b
        JOIN tot na ON na.doc_id = e.id_a
        JOIN tot nb ON nb.doc_id = e.id_b),
      mae AS (
        SELECT CAST(SUM(abs(est_icws_milli - w_jaccard_milli)) // COUNT(*)
          AS BIGINT) AS mae_icws_milli FROM r)
      SELECT r.id_a, r.id_b, r.w_jaccard_milli,
        CAST(r.est_icws_milli AS BIGINT) AS est_icws_milli,
        mae.mae_icws_milli
      FROM r CROSS JOIN mae ORDER BY id_a, id_b""")) { (s, dir) =>
      import s.implicits._
      val d = Tables.load(s, dir, "documents")
        .filter(size(Text.tokens($"text")) >= 3)
      val pairs = MinHash.candidatePairs(
          Tables.load(s, dir, "documents").select($"doc_id", $"text"),
          "doc_id", "text",
          shingleSize = 3, numPerm = 32, bands = 8, threshold = 0.5)
        .select($"id_a", $"id_b")
        .localCheckpoint() // pair set feeds pd, est, ex
      val pd = pairs.select($"id_a".as("d"))
        .unionAll(pairs.select($"id_b".as("d"))).distinct()
      val tf0 = d.select($"doc_id",
          explode(Text.wordNgrams(Text.tokens($"text"), 3)).as("term"))
        .groupBy($"doc_id", $"term").agg(count(lit(1)).as("tf"))
        .localCheckpoint() // sampling + exact min-sums + totals share it
      val tot = tf0.groupBy($"doc_id").agg(sum($"tf").cast("long").as("nt"))
      def u(j: Int) = expr(
        s"(cast(conv(substring(md5(concat(term, '|', cast(p as string), " +
          s"'|$j')), 1, 12), 16, 10) as bigint) + 0.5d) / 281474976710656.0d")
      val r = -(log(u(1)) + log(u(2)))
      val c = -(log(u(3)) + log(u(4)))
      val beta = u(5)
      val tExpr = floor(log($"tf".cast("double")) / r + beta)
      val lna = (log(c) - r * (tExpr - beta)) - r
      val samp = tf0.join(pd, $"d" === $"doc_id").drop("d")
        .select($"doc_id", $"term", $"tf",
          explode(sequence(lit(0L), lit(15L))).as("p"))
        .select($"doc_id", $"p",
          struct(lna.as("lna"), $"term", tExpr.cast("long").as("t"))
            .as("cand"))
        .groupBy($"doc_id", $"p")
        .agg(min($"cand").as("sel"))
        .select($"doc_id", $"p", $"sel.term".as("term"), $"sel.t".as("t"))
        .localCheckpoint() // both pair sides read the samples
      val est = pairs
        .join(samp.select($"doc_id".as("id_a"), $"p", $"term".as("ta"),
          $"t".as("tta")), Seq("id_a"))
        .join(samp.select($"doc_id".as("id_b"), $"p", $"term".as("tb"),
          $"t".as("ttb")), Seq("id_b", "p"))
        .groupBy($"id_a", $"id_b")
        .agg(sum(when($"ta" === $"tb" && $"tta" === $"ttb", 1L)
          .otherwise(0L)).as("m"))
      val ex = pairs
        .join(tf0.select($"doc_id".as("id_a"), $"term", $"tf".as("tfa")),
          Seq("id_a"))
        .join(tf0.select($"doc_id".as("id_b"), $"term", $"tf".as("tfb")),
          Seq("id_b", "term"))
        .groupBy($"id_a", $"id_b")
        .agg(sum(least($"tfa", $"tfb")).cast("long").as("smin"))
      val rr = est.join(ex, Seq("id_a", "id_b"))
        .join(tot.select($"doc_id".as("id_a"), $"nt".as("na")), Seq("id_a"))
        .join(tot.select($"doc_id".as("id_b"), $"nt".as("nb")), Seq("id_b"))
        .select($"id_a", $"id_b",
          floor($"smin".cast("double") /
            ($"na" + $"nb" - $"smin").cast("double") * 1000)
            .cast("long").as("w_jaccard_milli"),
          expr("(m * 1000) div 16").as("est_icws_milli"))
        .localCheckpoint() // rows feed the MAE and the output
      val mae = broadcast(rr.agg(
        expr("sum(abs(est_icws_milli - w_jaccard_milli)) div count(*)")
          .cast("long").as("mae_icws_milli")))
      rr.crossJoin(mae)
        .select($"id_a", $"id_b", $"w_jaccard_milli", $"est_icws_milli",
          $"mae_icws_milli")
        .orderBy($"id_a", $"id_b")
    }
  }

  /** Exact dedup by normalized content hash (P3/2.11 exact family). */
  val ddExactHash: Spec = Spec(
    "dd_exact_hash",
    oracle = Some("""
      SELECT lang, COUNT(*) AS n_docs,
        COUNT(DISTINCT md5(regexp_replace(trim(lower(text)), '[\s\x0B]+', ' ', 'g'))) AS n_unique,
        COUNT(*) - COUNT(DISTINCT md5(regexp_replace(trim(lower(text)), '[\s\x0B]+', ' ', 'g'))) AS n_exact_dups
      FROM documents GROUP BY lang ORDER BY lang""")) { (s, dir) =>
    import s.implicits._
    Tables.load(s, dir, "documents")
      .select($"lang", md5(Text.normalizeWs($"text")).as("h"))
      .groupBy($"lang")
      .agg(count(lit(1)).as("n_docs"),
        countDistinct($"h").as("n_unique"),
        (count(lit(1)) - countDistinct($"h")).as("n_exact_dups"))
      .orderBy($"lang")
  }

  /** The star-cap TRIP path, hash-proven end-to-end: a synthetic bucket
    * assignment makes two buckets deliberately oversized (doc_id < 100
    * → bucket doc_id%2, far over maxBucket=10) while the rest stay
    * small (≤10 members → all-pairs). The oracle states the DEGRADED
    * semantics explicitly — min-id star pairs over oversized buckets,
    * all-pairs under the cap — so the 100 TB degradation path is
    * oracle-proven, not just unit-tested (BucketsSpec). Every row also
    * carries n_capped (count of tripped buckets, > 0 by construction);
    * graft.Verify cross-checks the same number against the
    * graft_buckets_* observe metric. */
  val ddCappedStarPairs: Spec = Spec(
    "dd_capped_star_pairs",
    oracle = Some("""
      WITH d AS (
        SELECT doc_id,
          CASE WHEN doc_id < 100 THEN doc_id % 2
               ELSE 100 + doc_id % 50 END AS b
        FROM documents),
      s AS (
        SELECT b, doc_id,
          COUNT(*) OVER (PARTITION BY b) AS n,
          MIN(doc_id) OVER (PARTITION BY b) AS mn
        FROM d),
      pairs AS (
        SELECT mn AS id_a, doc_id AS id_b
        FROM s WHERE n > 10 AND doc_id <> mn
        UNION
        SELECT a.doc_id, c.doc_id
        FROM s a JOIN s c USING (b)
        WHERE a.n <= 10 AND a.n > 1 AND a.doc_id < c.doc_id),
      cap AS (SELECT COUNT(DISTINCT b) AS n_capped FROM s WHERE n > 10)
      SELECT CAST(id_a AS BIGINT) AS id_a, CAST(id_b AS BIGINT) AS id_b,
        CAST(n_capped AS BIGINT) AS n_capped
      FROM pairs, cap ORDER BY id_a, id_b""")) { (s, dir) =>
    import s.implicits._
    val d = Tables.load(s, dir, "documents").select($"doc_id",
      when($"doc_id" < 100, $"doc_id" % 2)
        .otherwise(lit(100) + $"doc_id" % 50).as("b"))
    val pairs = graft.ops.Buckets.pairs(d, Seq("b"), "doc_id", maxBucket = 10)
    val nCapped = d
      .groupBy($"b").agg(count(lit(1)).as("n"))
      .filter($"n" > 10)
      .agg(count(lit(1)).cast("long").as("n_capped"))
    pairs.crossJoin(broadcast(nCapped))
      .select($"id_a", $"id_b", $"n_capped")
      .orderBy($"id_a", $"id_b")
  }

  /** Exact-dedup twin of the incremental story: batch survivors after
    * (a) keep-min within the batch and (b) anti-join against the STORED
    * corpus content-hash set — daily increments never rescan corpus
    * text. At cluster scale the anti join shuffles the hash store once
    * per run (32-byte rows); a bloom/bucketed hash store cuts even
    * that, but the query states the exact semantics. */
  val ddExactIncremental: Spec = Spec(
    "dd_exact_incremental",
    oracle = Some("""
      WITH h AS (SELECT doc_id,
          md5(regexp_replace(trim(lower(text)), '[\s\x0B]+', ' ', 'g')) AS h
        FROM documents),
      corpus AS (SELECT h FROM h WHERE doc_id % 10 <> 0),
      batch AS (SELECT doc_id, h FROM h WHERE doc_id % 10 = 0),
      keep AS (
        SELECT doc_id, h FROM batch
        QUALIFY row_number() OVER (PARTITION BY h ORDER BY doc_id) = 1)
      SELECT k.doc_id FROM keep k ANTI JOIN corpus c ON k.h = c.h
      ORDER BY doc_id""")) { (s, dir) =>
    import s.implicits._
    val hashed = Tables.load(s, dir, "documents")
      .select($"doc_id", md5(Text.normalizeWs($"text")).as("h"))
    val corpusH = hashed.filter($"doc_id" % 10 =!= 0).select($"h")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"h").orderBy($"doc_id")
    hashed.filter($"doc_id" % 10 === 0)
      .withColumn("_rn", row_number().over(w)).filter($"_rn" === 1)
      .join(corpusH, Seq("h"), "left_anti")
      .select($"doc_id")
      .orderBy($"doc_id")
  }

  /** [[ddExactIncremental]] with the bloom prefilter the scale note
    * there promises: a Bloom filter over the BATCH hashes (the small,
    * bounded side — a daily increment) rides a broadcast and prunes the
    * corpus hash store down to possible collisions BEFORE the anti
    * join, so the per-run shuffle is proportional to the candidate set
    * (≈ true dups + fpp·|corpus|), not the whole store. Result is
    * EXACTLY the un-prefiltered anti join — blooms have no false
    * negatives, so every corpus hash equal to some batch hash survives
    * the prefilter — which is why this query shares [[ddExactIncremental]]'s
    * oracle verbatim. The membership probe is NATIVE Catalyst:
    * `bloom_filter_agg(xxhash64(h))` builds the filter as one bounded
    * binary, and `might_contain(<literal filter>, xxhash64(h))` probes
    * it with codegen — no per-row Scala closure, no serialization
    * boundary in the corpus scan. The filter bytes ride the plan as a
    * literal (≈1.2 MB per million batch rows at 1% fpp), exactly the
    * footprint the old driver-broadcast sketch had. */
  val ddBloomIncremental: Spec = Spec(
    "dd_bloom_incremental",
    oracle = Some("""
      WITH h AS (SELECT doc_id,
          md5(regexp_replace(trim(lower(text)), '[\s\x0B]+', ' ', 'g')) AS h
        FROM documents),
      corpus AS (SELECT h FROM h WHERE doc_id % 10 <> 0),
      batch AS (SELECT doc_id, h FROM h WHERE doc_id % 10 = 0),
      keep AS (
        SELECT doc_id, h FROM batch
        QUALIFY row_number() OVER (PARTITION BY h ORDER BY doc_id) = 1)
      SELECT k.doc_id FROM keep k ANTI JOIN corpus c ON k.h = c.h
      ORDER BY doc_id""")) { (s, dir) =>
    import s.implicits._
    val hashed = Tables.load(s, dir, "documents")
      .select($"doc_id", md5(Text.normalizeWs($"text")).as("h"))
    val corpusH = hashed.filter($"doc_id" % 10 =!= 0).select($"h")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"h").orderBy($"doc_id")
    val keep = hashed.filter($"doc_id" % 10 === 0)
      .withColumn("_rn", row_number().over(w)).filter($"_rn" === 1)
      .select($"doc_id", $"h")
    // Size the bloom from the batch itself (one count over the small
    // side). ~10 bits/item ⇒ ~1% fpp, ~1.2 MB per million batch rows.
    val nBatch = math.max(keep.count(), 1000L)
    val bf = keep.agg(graft.functions.GraftFunctions.bloomFilterAgg(
      xxhash64($"h"), nBatch, nBatch * 10)).head
    val candidates =
      if (bf.isNullAt(0)) corpusH.limit(0) // empty batch: nothing collides
      else corpusH.filter(graft.functions.GraftFunctions.bloomMightContain(
        bf.getAs[Array[Byte]](0), xxhash64($"h")))
    keep.join(candidates, Seq("h"), "left_anti")
      .select($"doc_id")
      .orderBy($"doc_id")
  }

  // The xxhash64 SimHash production path (SimHash.simhash64 /
  // neardupPairs) stays a library surface but is NOT a declared query:
  // xxhash64 has no DuckDB twin, so its Spec rows could only ever be
  // permanent no-oracle entries duplicating the md5 twins below.
  // DedupSpec pins the xxhash path (Charikar fold fixtures + banded ==
  // all-pairs equality); the md5 twins carry the hash-proven
  // CORRECTNESS rows for the same fold/banding semantics.

  /** DuckDB twin of [[graft.ops.SimHash.md5TokenHashes]] +
    * [[graft.ops.SimHash.simhashFromHashes]]: 60-bit token hash from the
    * first 15 md5 hex chars, then the Charikar per-bit majority fold. */
  private def simhash60Sql(hsCol: String): String =
    s"""CAST(list_sum(list_transform(range(0, 60), b ->
       CASE WHEN list_sum(list_transform($hsCol,
           h -> CASE WHEN ((h >> CAST(b AS INT)) & 1) = 1 THEN 1 ELSE -1 END)) > 0
       THEN (1::BIGINT << CAST(b AS INT)) ELSE 0 END)) AS BIGINT)"""

  /** 60-bit md5-backed SimHash per document — the ORACLE-PARITY twin of
    * [[ddSimhash]]: same Charikar fold, but the token hash (top 60 bits
    * of md5, = the minhash shingle hash) is rebuildable in DuckDB, so
    * the SimHash semantics themselves get a hash-proven CORRECTNESS row
    * rather than only ScalaTest fixtures. xxhash64 remains the hot path. */
  val ddSimhashMd5: Spec = Spec(
    "dd_simhash_md5",
    oracle = Some(s"""
      WITH hs AS (
        SELECT doc_id, list_transform(string_split(text,' '),
          t -> ('0x' || substr(md5(t), 1, 15))::BIGINT) AS hs
        FROM documents WHERE doc_id % 20 = 0)
      SELECT doc_id, ${simhash60Sql("hs")} AS simhash
      FROM hs ORDER BY doc_id""")) { (s, dir) =>
    import s.implicits._
    Tables.load(s, dir, "documents")
      .filter($"doc_id" % 20 === 0)
      .withColumn("toks", Text.tokens($"text"))
      .withColumn("hs", SimHash.md5TokenHashes("toks"))
      .select($"doc_id", SimHash.simhashFromHashes("hs", 60).as("simhash"))
      .orderBy($"doc_id")
  }

  /** md5-SimHash near-dup pairs: engine runs the SAME pigeonhole
    * banding as [[ddSimhashPairs]] (4 × 15-bit bands, recall 1 for
    * hamming ≤ 3, star-capped); the oracle states the equivalent
    * all-pairs semantics, valid because Verify asserts the cap never
    * tripped. This makes the banding path itself hash-proven, not just
    * equality-pinned in ScalaTest. */
  val ddSimhashMd5Pairs: Spec = Spec(
    "dd_simhash_md5_pairs",
    oracle = Some(s"""
      WITH hs AS (
        SELECT doc_id, list_transform(string_split(text,' '),
          t -> ('0x' || substr(md5(t), 1, 15))::BIGINT) AS hs
        FROM documents),
      sh AS (SELECT doc_id, ${simhash60Sql("hs")} AS sh FROM hs)
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        CAST(bit_count(xor(a.sh, b.sh)) AS INT) AS hamming
      FROM sh a JOIN sh b ON a.doc_id < b.doc_id
      WHERE bit_count(xor(a.sh, b.sh)) <= 3
      ORDER BY id_a, id_b""")) { (s, dir) =>
    import s.implicits._
    val hashed = Tables.load(s, dir, "documents")
      .withColumn("toks", Text.tokens($"text"))
      .withColumn("hs", SimHash.md5TokenHashes("toks"))
      .select($"doc_id".as("id"), SimHash.simhashFromHashes("hs", 60).as("sh"))
    SimHash.neardupPairsBanded(hashed, maxHamming = 3, totalBits = 60,
        maxBucket = 1000)
      .orderBy($"id_a", $"id_b")
  }

  /** Edit-distance VERIFICATION of the simhash candidates — the
    * record-linkage "block, then verify" discipline applied to full
    * text: banded-simhash candidates (pigeonhole recall 1 at hamming
    * ≤ 3, star-capped) re-checked with BOUNDED Levenshtein via Spark's
    * 3-arg levenshtein(l, r, k), which abandons a pair the moment the
    * distance provably exceeds k — O(k·n) band DP per pair instead of
    * the O(n·m) full matrix, the difference between feasible and not
    * when texts are documents rather than names. Only candidate pairs
    * ever reach the verifier (never a quadratic text comparison), so
    * the expensive step rides the capped bucket scaffold. Oracle
    * replays the signatures and states the equivalent full-distance
    * filter. */
  val ddEditVerified: Spec = Spec(
    "dd_edit_verified",
    oracle = Some(s"""
      WITH hs AS (
        SELECT doc_id, list_transform(string_split(text,' '),
          t -> ('0x' || substr(md5(t), 1, 15))::BIGINT) AS hs
        FROM documents),
      sh AS (SELECT doc_id, ${simhash60Sql("hs")} AS sh FROM hs),
      cand AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
          CAST(bit_count(xor(a.sh, b.sh)) AS INT) AS hamming
        FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        WHERE bit_count(xor(a.sh, b.sh)) <= 3)
      SELECT c.id_a, c.id_b, c.hamming,
        CAST(levenshtein(da.text, db.text) AS INT) AS lev
      FROM cand c JOIN documents da ON da.doc_id = c.id_a
        JOIN documents db ON db.doc_id = c.id_b
      WHERE levenshtein(da.text, db.text) <= 6
      ORDER BY id_a, id_b""")) { (s, dir) =>
    import s.implicits._
    val docs = Tables.load(s, dir, "documents")
    val hashed = docs
      .withColumn("toks", Text.tokens($"text"))
      .withColumn("hs", SimHash.md5TokenHashes("toks"))
      .select($"doc_id".as("id"), SimHash.simhashFromHashes("hs", 60).as("sh"))
    SimHash.neardupPairsBanded(hashed, maxHamming = 3, totalBits = 60,
        maxBucket = 1000)
      .join(docs.select($"doc_id".as("id_a"), $"text".as("ta")), Seq("id_a"))
      .join(docs.select($"doc_id".as("id_b"), $"text".as("tb")), Seq("id_b"))
      .withColumn("lev", levenshtein($"ta", $"tb", 6))
      .filter($"lev" >= 0) // 3-arg levenshtein returns -1 past the bound
      .select($"id_a", $"id_b", $"hamming", $"lev".cast("int").as("lev"))
      .orderBy($"id_a", $"id_b")
  }

  /** Benchmark decontamination (standard LLM-training hygiene): flag
    * training docs sharing any 5-gram with a benchmark/eval set. The
    * benchmark here is a deterministic slice of the corpus (doc_id %
    * 97); its DISTINCT shingle set is BROADCAST — eval suites are
    * small by construction, so the firehose side never shuffles. */
  val ddDecontaminate: Spec = Spec(
    "d_decontaminate",
    oracle = Some("""
      WITH r AS (
        SELECT doc_id, text || CASE WHEN doc_id % 97 = 0 OR doc_id % 21 = 0
          THEN ' alpha beta gamma delta epsilon' ELSE '' END AS text
        FROM documents),
      g AS (
        SELECT doc_id, list_distinct(list_transform(
          range(1, greatest(len(string_split(text,' '))-3, 1)),
          i -> array_to_string(string_split(text,' ')[i:i+4], ' '))) AS sh
        FROM r),
      bs AS (SELECT DISTINCT unnest(sh) AS s FROM g WHERE doc_id % 97 = 0),
      ds AS (SELECT doc_id, unnest(sh) AS s FROM g
             WHERE doc_id % 97 <> 0 AND doc_id % 7 = 0),
      ov AS (SELECT doc_id, COUNT(*) AS n FROM ds JOIN bs USING (s)
             GROUP BY doc_id)
      SELECT d.doc_id, CAST(coalesce(ov.n, 0) AS BIGINT) AS n_overlap,
             coalesce(ov.n, 0) > 0 AS contaminated
      FROM (SELECT doc_id FROM documents
            WHERE doc_id % 97 <> 0 AND doc_id % 7 = 0) d
      LEFT JOIN ov USING (doc_id) ORDER BY doc_id""")) { (s, dir) =>
    import s.implicits._
    // planted contamination: benchmark docs and a sample subset share
    // one appended phrase, so the flag path is provably non-vacuous
    val all = Tables.load(s, dir, "documents")
      .withColumn("text", concat($"text",
        when($"doc_id" % 97 === 0 || $"doc_id" % 21 === 0,
          lit(" alpha beta gamma delta epsilon")).otherwise(lit(""))))
    val benchSh = all.filter($"doc_id" % 97 === 0)
      .select(explode(Text.shingleSet($"text", 5)).as("s")).distinct()
    val docSh = all.filter($"doc_id" % 97 =!= 0 && $"doc_id" % 7 === 0)
      .select($"doc_id", explode(Text.shingleSet($"text", 5)).as("s"))
    val overlap = docSh.join(broadcast(benchSh), Seq("s"))
      .groupBy($"doc_id").agg(count(lit(1)).as("n"))
    all.filter($"doc_id" % 97 =!= 0 && $"doc_id" % 7 === 0)
      .select($"doc_id")
      .join(overlap, Seq("doc_id"), "left")
      .select($"doc_id",
        coalesce($"n", lit(0L)).cast("long").as("n_overlap"),
        (coalesce($"n", lit(0L)) > 0).as("contaminated"))
      .orderBy($"doc_id")
  }

  /** Span-level decontamination (the acting upgrade of d_decontaminate's
    * doc-level flag): passages overlapping the benchmark 5-gram set are
    * CUT and survivors reassembled — a 10k-token document citing one
    * benchmark sentence loses the sentence, not the document. Same
    * planted contamination and doc sampling as d_decontaminate; spans
    * come from [[graft.ops.SubstrDedup.contaminationSpans]] (broadcast
    * benchmark gram set, so the corpus side finds its hits without a
    * shuffle), removal reuses the dd_dup_span_removal reassembly. */
  val ddDecontaminateSpans: Spec = Spec(
    "d_decontaminate_spans",
    oracle = Some("""
      WITH r AS (
        SELECT doc_id, text || CASE WHEN doc_id % 97 = 0 OR doc_id % 21 = 0
          THEN ' alpha beta gamma delta epsilon' ELSE '' END AS text
        FROM documents),
      bt AS (SELECT doc_id, string_split(text, ' ') AS l FROM r
             WHERE doc_id % 97 = 0),
      bg AS (SELECT DISTINCT md5(array_to_string(l[pos+1:pos+5], ' ')) AS gh
        FROM (SELECT doc_id, unnest(range(0, greatest(len(l)-4, 0))) AS pos, l
              FROM bt)),
      t AS (SELECT doc_id, string_split(text, ' ') AS l FROM r
            WHERE doc_id % 97 <> 0 AND doc_id % 7 = 0),
      g2 AS (SELECT doc_id, pos, md5(array_to_string(l[pos+1:pos+5], ' ')) AS gh
        FROM (SELECT doc_id, unnest(range(0, greatest(len(l)-4, 0))) AS pos, l
              FROM t)),
      hit AS (SELECT doc_id, pos FROM g2 WHERE gh IN (SELECT gh FROM bg)),
      cov AS (SELECT DISTINCT doc_id, pos + u.i AS tpos
        FROM hit CROSS JOIN (SELECT unnest(range(0, 5)) AS i) u),
      tok AS (SELECT doc_id, unnest(l) AS tk,
          CAST(generate_subscripts(l, 1) - 1 AS BIGINT) AS tpos
        FROM t),
      kept AS (SELECT tok.doc_id, tok.tk, tok.tpos
        FROM tok LEFT JOIN cov
          ON tok.doc_id = cov.doc_id AND tok.tpos = cov.tpos
        WHERE cov.doc_id IS NULL),
      ka AS (SELECT doc_id, md5(string_agg(tk, ' ' ORDER BY tpos)) AS m,
          CAST(COUNT(*) AS BIGINT) AS k
        FROM kept GROUP BY doc_id)
      SELECT t.doc_id, COALESCE(ka.m, md5('')) AS cleaned_md5,
        COALESCE(ka.k, 0) AS kept_tokens,
        CAST(len(t.l) - COALESCE(ka.k, 0) AS BIGINT) AS removed_tokens
      FROM t LEFT JOIN ka ON t.doc_id = ka.doc_id
      ORDER BY t.doc_id""")) { (s, dir) =>
    import s.implicits._
    val all = Tables.load(s, dir, "documents")
      .withColumn("text", concat($"text",
        when($"doc_id" % 97 === 0 || $"doc_id" % 21 === 0,
          lit(" alpha beta gamma delta epsilon")).otherwise(lit(""))))
    val bench = all.filter($"doc_id" % 97 === 0)
      .select(explode(graft.ops.SubstrDedup.gramHashes(
        Text.tokens($"text"), 5)).as("_gh"))
      .distinct()
    val corpus = all.filter($"doc_id" % 97 =!= 0 && $"doc_id" % 7 === 0)
      .select($"doc_id", Text.tokens($"text").as("l"))
    graft.ops.SubstrDedup
      .removeContaminationSpans(corpus, "doc_id", "l", 5, bench)
      .orderBy($"doc_id")
  }

  /** Exact-substring duplicate spans ([[graft.ops.SubstrDedup]], the
    * Lee et al. 2022 ExactSubstr family): maximal token spans covered
    * by word-8-grams recurring across documents. Two passages are
    * planted — a shared header prefix (doc_id % 7) and a shared tail
    * (doc_id % 3) — so multi-island docs exist; the corpus' own
    * accidental 8-gram collisions count too, identically on both
    * engines. */
  val ddDupSpans: Spec = Spec(
    "dd_dup_spans",
    oracle = Some("""
      WITH r AS (
        SELECT doc_id,
          CASE WHEN doc_id % 7 = 0 THEN
            'shared header boilerplate passage repeated across many documents verbatim '
          ELSE '' END || text ||
          CASE WHEN doc_id % 3 = 0 THEN
            ' the quick brown fox jumps over the lazy dog again and again in the end'
          ELSE '' END AS rich
        FROM documents WHERE doc_id % 2 = 0),
      t AS (SELECT doc_id, string_split(rich, ' ') AS l FROM r),
      g AS (
        SELECT doc_id, unnest(range(0, greatest(len(l)-7, 0))) AS pos, l
        FROM t),
      g2 AS (
        SELECT doc_id, pos,
          md5(array_to_string(l[pos+1:pos+8], ' ')) AS gh
        FROM g),
      d AS (
        SELECT gh FROM (
          SELECT gh, COUNT(DISTINCT doc_id) AS nd FROM g2 GROUP BY gh)
        WHERE nd >= 2),
      hit AS (SELECT doc_id, pos FROM g2 WHERE gh IN (SELECT gh FROM d)),
      brk AS (
        SELECT doc_id, pos,
          CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) <= 8
               THEN 0 ELSE 1 END AS b
        FROM hit),
      isl AS (
        SELECT doc_id, pos,
          SUM(b) OVER (PARTITION BY doc_id ORDER BY pos) AS i
        FROM brk)
      SELECT doc_id, CAST(MIN(pos) AS BIGINT) AS span_start,
        CAST(MAX(pos)+8 AS BIGINT) AS span_end,
        CAST(COUNT(*) AS BIGINT) AS n_dup_grams
      FROM isl GROUP BY doc_id, i
      ORDER BY doc_id, span_start"""),
    bench = true) { (s, dir) =>
    import s.implicits._
    val rich = concat(
      when($"doc_id" % 7 === 0,
        lit("shared header boilerplate passage repeated across many documents verbatim "))
        .otherwise(lit("")),
      $"text",
      when($"doc_id" % 3 === 0,
        lit(" the quick brown fox jumps over the lazy dog again and again in the end"))
        .otherwise(lit("")))
    val base = Tables.load(s, dir, "documents")
      .filter($"doc_id" % 2 === 0)
      .select($"doc_id", Text.tokens(rich).as("l"))
    graft.ops.SubstrDedup.dupSpans(base, "doc_id", "l", n = 8, minDocs = 2)
      .orderBy($"doc_id", $"span_start")
  }

  /** ExactSubstr-CUT ([[graft.ops.SubstrDedup.removeDupSpans]]): the
    * acting twin of dd_dup_spans — duplicated spans removed from every
    * doc (everywhere-rule; deviation from keep-one documented at the
    * op), survivors reassembled in position order and verified by md5
    * + kept/removed counts. Same planted passages as dd_dup_spans. */
  val ddDupSpanRemoval: Spec = Spec(
    "dd_dup_span_removal",
    oracle = Some("""
      WITH r AS (
        SELECT doc_id,
          CASE WHEN doc_id % 7 = 0 THEN
            'shared header boilerplate passage repeated across many documents verbatim '
          ELSE '' END || text ||
          CASE WHEN doc_id % 3 = 0 THEN
            ' the quick brown fox jumps over the lazy dog again and again in the end'
          ELSE '' END AS rich
        FROM documents WHERE doc_id % 2 = 0),
      t AS (SELECT doc_id, string_split(rich, ' ') AS l FROM r),
      g AS (
        SELECT doc_id, unnest(range(0, greatest(len(l)-7, 0))) AS pos, l
        FROM t),
      g2 AS (
        SELECT doc_id, pos,
          md5(array_to_string(l[pos+1:pos+8], ' ')) AS gh
        FROM g),
      d AS (
        SELECT gh FROM (
          SELECT gh, MIN(doc_id) AS mn, MAX(doc_id) AS mx FROM g2 GROUP BY gh)
        WHERE mn <> mx),
      hit AS (SELECT doc_id, pos FROM g2 WHERE gh IN (SELECT gh FROM d)),
      cov AS (
        SELECT DISTINCT doc_id, pos + u.i AS tpos
        FROM hit CROSS JOIN (SELECT unnest(range(0, 8)) AS i) u),
      tok AS (
        SELECT doc_id, unnest(l) AS tk,
          CAST(generate_subscripts(l, 1) - 1 AS BIGINT) AS tpos
        FROM t),
      kept AS (
        SELECT tok.doc_id, tok.tk, tok.tpos AS tpos
        FROM tok LEFT JOIN cov
          ON tok.doc_id = cov.doc_id AND tok.tpos = cov.tpos
        WHERE cov.doc_id IS NULL),
      ka AS (
        SELECT doc_id, md5(string_agg(tk, ' ' ORDER BY tpos)) AS m,
          CAST(COUNT(*) AS BIGINT) AS k
        FROM kept GROUP BY doc_id)
      SELECT t.doc_id,
        COALESCE(ka.m, md5('')) AS cleaned_md5,
        COALESCE(ka.k, 0) AS kept_tokens,
        CAST(len(t.l) - COALESCE(ka.k, 0) AS BIGINT) AS removed_tokens
      FROM t LEFT JOIN ka ON t.doc_id = ka.doc_id
      ORDER BY t.doc_id""")) { (s, dir) =>
    import s.implicits._
    val rich = concat(
      when($"doc_id" % 7 === 0,
        lit("shared header boilerplate passage repeated across many documents verbatim "))
        .otherwise(lit("")),
      $"text",
      when($"doc_id" % 3 === 0,
        lit(" the quick brown fox jumps over the lazy dog again and again in the end"))
        .otherwise(lit("")))
    val base = Tables.load(s, dir, "documents")
      .filter($"doc_id" % 2 === 0)
      .select($"doc_id", Text.tokens(rich).as("l"))
    graft.ops.SubstrDedup.removeDupSpans(base, "doc_id", "l", n = 8, minDocs = 2)
      .orderBy($"doc_id")
  }

  /** Canonical-representative selection per near-dup cluster: instead
    * of blind keep-min, each MinHash/CC cluster keeps its BEST member
    * by a quality score (here token count as the pluggable proxy; any
    * scored column — unigram-LM, Gopher — slots into the same argmax).
    * Deterministic total order (quality desc, id asc); the argmax
    * window partitions by component — cluster count grows with the
    * corpus, so state per task stays bounded at 100 TB. Oracle: the
    * dd_minhash_clusters recursive-CTE recipe + the same windowed
    * argmax. */
  val ddClusterRepresentatives: Spec = Spec(
    "dd_cluster_representatives",
    oracle = Some("""
      WITH RECURSIVE toks AS (
        SELECT doc_id, string_split(text,' ') AS l FROM documents),
      sh AS (
        SELECT doc_id, list_distinct(list_transform(range(1, greatest(len(l)-1, 1)),
          i -> array_to_string(l[i:i+2], ' '))) AS sh
        FROM toks WHERE len(l) >= 3),
      sig AS (
        SELECT doc_id, list_transform(range(0, 32),
          p -> CAST(list_min(list_transform(sh, s ->
            (CAST(2*p*2654435761 + 1 AS HUGEINT) *
               (('0x' || substr(md5(s), 1, 15))::BIGINT) + (p*40503 + 7))
              % 2305843009213693951)) AS BIGINT)) AS sig
        FROM sh),
      bands AS (
        SELECT doc_id, b,
          md5(b::VARCHAR || '|' || array_to_string(sig[b*4+1:b*4+4], '')) AS bk
        FROM sig CROSS JOIN unnest(range(0, 8)) AS t(b)),
      pairs AS (
        SELECT DISTINCT a.doc_id AS ida, b.doc_id AS idb
        FROM bands a JOIN bands b ON a.b = b.b AND a.bk = b.bk
          AND a.doc_id < b.doc_id),
      verified AS (
        SELECT ida, idb FROM pairs
        JOIN sh sa ON sa.doc_id = ida JOIN sh sb ON sb.doc_id = idb
        WHERE CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE) /
          (len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh))) >= 0.5),
      edges AS (
        SELECT ida AS src, idb AS dst FROM verified
        UNION ALL SELECT idb, ida FROM verified),
      walk(id, comp) AS (
        SELECT src, src FROM edges
        UNION
        SELECT e.dst, w.comp FROM walk w JOIN edges e ON e.src = w.id),
      labels AS (SELECT id, MIN(comp) AS component FROM walk GROUP BY id),
      q AS (
        SELECT l.id, l.component,
          CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tok
        FROM labels l JOIN documents d ON d.doc_id = l.id),
      r AS (
        SELECT component, id, n_tok,
          row_number() OVER (PARTITION BY component
            ORDER BY n_tok DESC, id) AS rk,
          COUNT(*) OVER (PARTITION BY component) AS n_members
        FROM q)
      SELECT component, id AS rep_id, n_tok AS rep_tokens,
        CAST(n_members AS BIGINT) AS n_members
      FROM r WHERE rk = 1 ORDER BY component""")) { (s, dir) =>
    import s.implicits._
    val docs = Tables.load(s, dir, "documents")
    val pairs = MinHash.candidatePairs(docs, "doc_id", "text",
      shingleSize = 3, numPerm = 32, bands = 8, threshold = 0.5)
    val labeled = MinHash.clusters(pairs)
      .join(docs.select($"doc_id".as("id"),
        Text.wordCount($"text").cast("long").as("n_tok")), Seq("id"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"component").orderBy($"n_tok".desc, $"id")
    labeled
      .withColumn("rk", row_number().over(w))
      .withColumn("n_members", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy($"component")))
      .filter($"rk" === 1)
      .select($"component", $"id".as("rep_id"), $"n_tok".as("rep_tokens"),
        $"n_members")
      .orderBy($"component")
  }

  /** Corpus dedup-health report: per-language exact duplicate rate
    * (the first number any curation run publishes). One hash aggregate
    * per language over content hashes — count-distinct plans the
    * standard two-phase Expand; dup_rate is a single division rounded
    * to 6dp. Duplicates are planted (doc_id%11 docs share a canned
    * text per language) so rates are non-zero. */
  val ddDedupReport: Spec = Spec(
    "dd_dedup_report",
    oracle = Some("""
      WITH r AS (
        SELECT doc_id, lang,
          CASE WHEN doc_id % 11 = 0 THEN 'canned duplicate body for ' || lang
               ELSE text END AS text
        FROM documents)
      SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
        CAST(COUNT(DISTINCT md5(text)) AS BIGINT) AS n_unique,
        round(1.0 - CAST(COUNT(DISTINCT md5(text)) AS DOUBLE) / COUNT(*), 6)
          AS dup_rate
      FROM r GROUP BY lang ORDER BY lang""")) { (s, dir) =>
    import s.implicits._
    Tables.load(s, dir, "documents")
      .withColumn("text",
        when($"doc_id" % 11 === 0,
          concat(lit("canned duplicate body for "), $"lang"))
          .otherwise($"text"))
      .groupBy($"lang")
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(md5($"text")).as("n_unique"),
        round(lit(1.0) - countDistinct(md5($"text")).cast("double") /
          count(lit(1)), 6).as("dup_rate"))
      .orderBy($"lang")
  }

  /** Cross-source contamination matrix: for every source pair, how many
    * distinct 8-token shingles they share, with the shingle-level
    * Jaccard — the provenance/leakage report run before mixing sources
    * into a training corpus (a high overlap means one source republishes
    * another and the mixture double-counts it; the same lens
    * decontamination applies to benchmark sets, d_decontaminate).
    *
    * Scale shape: ONE explode through the fused
    * [[graft.functions.WordGramHashes]] (gram strings never
    * materialize), distinct'd to (source, shingle) — so the self-join
    * on shingle fans out ≤ S rows per shingle (S = #sources, a few
    * hundred at most), never per-occurrence: the join is bounded by
    * S² per shingle regardless of how often a boilerplate shingle
    * repeats inside a source. Output is ≤ S² rows; per-source totals
    * ride a broadcast. */
  val ddCrossSourceOverlap: Spec = Spec(
    "dd_cross_source_overlap",
    oracle = Some("""
      WITH tok AS (
        SELECT source, string_split(text, ' ') AS l FROM documents),
      g AS (
        SELECT source, unnest(range(0, greatest(len(l)-7, 0))) AS pos, l
        FROM tok),
      sh AS (
        SELECT DISTINCT source, md5(array_to_string(l[pos+1:pos+8], ' ')) AS sh
        FROM g),
      tot AS (SELECT source, COUNT(*) AS n FROM sh GROUP BY source),
      j AS (
        SELECT a.source AS source_a, b.source AS source_b,
          COUNT(*) AS shared
        FROM sh a JOIN sh b ON a.sh = b.sh AND a.source < b.source
        GROUP BY 1, 2)
      SELECT source_a, source_b, CAST(shared AS BIGINT) AS shared_shingles,
        ROUND(CAST(shared AS DOUBLE) / (ta.n + tb.n - shared), 6) AS jaccard
      FROM j
        JOIN tot ta ON ta.source = j.source_a
        JOIN tot tb ON tb.source = j.source_b
      ORDER BY source_a, source_b""")) { (s, dir) =>
    import s.implicits._
    val sh = Tables.load(s, dir, "documents")
      .select($"source",
        explode(graft.ops.SubstrDedup.gramHashes(Text.tokens($"text"), 8))
          .as("sh"))
      .distinct()
      .localCheckpoint() // one shingle pass feeds totals AND the join
    val tot = sh.groupBy($"source").agg(count(lit(1)).as("n"))
    val a = sh.select($"source".as("source_a"), $"sh")
    val b = sh.select($"source".as("source_b"), $"sh")
    a.join(b, Seq("sh")).filter($"source_a" < $"source_b")
      .groupBy($"source_a", $"source_b")
      .agg(count(lit(1)).as("shared_shingles"))
      .join(broadcast(tot.select($"source".as("source_a"), $"n".as("na"))), "source_a")
      .join(broadcast(tot.select($"source".as("source_b"), $"n".as("nb"))), "source_b")
      .select($"source_a", $"source_b", $"shared_shingles",
        round($"shared_shingles".cast("double") /
          ($"na" + $"nb" - $"shared_shingles"), 6).as("jaccard"))
      .orderBy($"source_a", $"source_b")
  }

  /** MOSS-style near-duplicate pairs over winnowing fingerprints: two
    * documents are reported when the overlap of their selected
    * fingerprint SETS covers ≥ 50% of the smaller set — the
    * containment-style similarity that catches partial inclusion
    * (doc B embeds half of doc A), which whole-set Jaccard dilutes.
    * Selection shares [[graft.ops.Winnow]]'s k=5/w=4 recipe and the
    * d_winnow_fingerprints oracle CTE verbatim.
    *
    * Scale shape: candidates come from the capped bucket scaffold
    * ([[graft.ops.Buckets.pairs]]) keyed by fingerprint value — a
    * boilerplate fingerprint shared by 10⁶ docs star-connects instead
    * of going quadratic, and the cap is observe-gated in Verify. The
    * shared-count is then an exact distributed recount (pair ⋈ both
    * fingerprint sets), never a per-bucket count — so cross-bucket
    * double-counting is impossible and the similarity is exact for
    * every emitted pair. Per-doc set sizes ride a (doc-count-scale)
    * join; nothing reaches the driver. */
  val ddWinnowPairs: Spec = Spec(
    "dd_winnow_pairs",
    bench = true, // round-7 family headline: fused selection + capped buckets
    oracle = Some(s"""
      WITH ${TextOps.winnowSelCte},
      fp AS (SELECT DISTINCT doc_id, h48 FROM sel WHERE rk = 1),
      sz AS (SELECT doc_id, COUNT(*) AS nfp FROM fp GROUP BY doc_id),
      p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_shared
        FROM fp a JOIN fp b ON a.h48 = b.h48 AND a.doc_id < b.doc_id
        GROUP BY 1, 2)
      SELECT id_a, id_b, n_shared,
        ROUND(CAST(n_shared AS DOUBLE) / least(sa.nfp, sb.nfp), 6) AS winnow_sim
      FROM p JOIN sz sa ON sa.doc_id = id_a JOIN sz sb ON sb.doc_id = id_b
      WHERE CAST(n_shared AS DOUBLE) / least(sa.nfp, sb.nfp) >= 0.5
      ORDER BY id_a, id_b""")) { (s, dir) =>
    import s.implicits._
    val toks = Text.tokens($"text")
    val fp = Tables.load(s, dir, "documents")
      .filter(size(toks) >= 8)
      .select($"doc_id",
        explode(graft.ops.Winnow.selection(toks, 5, 4)).as("fp"))
      .select($"doc_id", $"fp.h".as("h48"))
      .distinct()
      .localCheckpoint() // one selection pass feeds sizes, buckets, recount
    val sz = fp.groupBy($"doc_id").agg(count(lit(1)).as("nfp"))
    val shared = graft.ops.Buckets.pairs(fp, Seq("h48"), "doc_id")
      .join(fp.select($"doc_id".as("id_a"), $"h48"), Seq("id_a"))
      .join(fp.select($"doc_id".as("id_b"), $"h48"), Seq("id_b", "h48"))
      .groupBy($"id_a", $"id_b")
      .agg(count(lit(1)).as("n_shared"))
    val sim = $"n_shared".cast("double") / least($"na", $"nb")
    shared
      .join(sz.select($"doc_id".as("id_a"), $"nfp".as("na")), Seq("id_a"))
      .join(sz.select($"doc_id".as("id_b"), $"nfp".as("nb")), Seq("id_b"))
      .filter(sim >= 0.5)
      .select($"id_a", $"id_b", $"n_shared", round(sim, 6).as("winnow_sim"))
      .orderBy($"id_a", $"id_b")
  }

  /** Duplicate clusters over the WINNOW pair graph — the winnowing
    * family's completion, symmetric with dd_minhash_clusters:
    * connected components ([[graft.ops.ConnectedComponents]] via
    * MinHash.clusters) over dd_winnow_pairs' edges, min-id component
    * labels, per-cluster size. Oracle: the shared winnow CTE + the
    * recursive min-label reachability walk. */
  val ddWinnowClusters: Spec = Spec(
    "dd_winnow_clusters",
    oracle = Some(s"""
      WITH RECURSIVE ${TextOps.winnowSelCte},
      fp AS (SELECT DISTINCT doc_id, h48 FROM sel WHERE rk = 1),
      sz AS (SELECT doc_id, COUNT(*) AS nfp FROM fp GROUP BY doc_id),
      p AS (SELECT a.doc_id AS ida, b.doc_id AS idb, COUNT(*) AS n_shared
        FROM fp a JOIN fp b ON a.h48 = b.h48 AND a.doc_id < b.doc_id
        GROUP BY 1, 2),
      verified AS (SELECT ida, idb FROM p
        JOIN sz sa ON sa.doc_id = ida JOIN sz sb ON sb.doc_id = idb
        WHERE CAST(n_shared AS DOUBLE) / least(sa.nfp, sb.nfp) >= 0.5),
      edges AS (
        SELECT ida AS src, idb AS dst FROM verified
        UNION ALL SELECT idb, ida FROM verified),
      walk(id, comp) AS (
        SELECT src, src FROM edges
        UNION
        SELECT e.dst, w.comp FROM walk w JOIN edges e ON e.src = w.id),
      labels AS (SELECT id, MIN(comp) AS component FROM walk GROUP BY id)
      SELECT component, COUNT(*) AS cluster_size, MAX(id) AS max_id
      FROM labels GROUP BY component ORDER BY component""")) { (s, dir) =>
    import s.implicits._
    val pairs = ddWinnowPairs.fn(s, dir)
      .select($"id_a", $"id_b")
    graft.ops.MinHash.clusters(pairs)
      .groupBy($"component")
      .agg(count(lit(1)).as("cluster_size"), max($"id").as("max_id"))
      .orderBy($"component")
  }

  /** Per-document novelty: the fraction of a doc's distinct 8-gram
    * shingles whose FIRST occurrence (by doc_id — ingestion order in
    * an append-only corpus) is this document. The curation signal
    * behind "how much does each new document actually add": boilerplate
    * re-posts score near 0, fresh content near 1 — the doc-granular
    * view of what dd_cross_source_overlap reports pairwise.
    *
    * Scale shape: ONE gram exchange (min-doc_id per gram — map-side
    * combined), one gram-keyed join back, one per-doc agg. Gram keys
    * ride the fused [[graft.functions.WordGramHashes]]; both
    * high-cardinality sides hash-partition on the gram, no hot keys. */
  /** Shared by d_novelty_scores and the streaming twin st_novelty. */
  private[queries] val noveltySql: String = """
      WITH t AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
      g AS (SELECT DISTINCT doc_id,
          md5(array_to_string(l[pos+1:pos+8], ' ')) AS gh
        FROM (SELECT doc_id, unnest(range(0, greatest(len(l)-7, 0))) AS pos, l
              FROM t)),
      f AS (SELECT gh, MIN(doc_id) AS first_doc FROM g GROUP BY gh),
      n AS (SELECT g.doc_id, COUNT(*) AS n_grams,
          SUM(CASE WHEN f.first_doc = g.doc_id THEN 1 ELSE 0 END) AS n_novel
        FROM g JOIN f USING (gh) GROUP BY g.doc_id)
      SELECT doc_id, CAST(n_grams AS BIGINT) AS n_grams,
        CAST(n_novel AS BIGINT) AS n_novel,
        ROUND(CAST(n_novel AS DOUBLE) / n_grams, 6) AS novelty
      FROM n ORDER BY doc_id"""

  val ddNoveltyScores: Spec = Spec(
    "d_novelty_scores",
    oracle = Some(noveltySql)) { (s, dir) =>
    import s.implicits._
    val g = Tables.load(s, dir, "documents")
      .select($"doc_id",
        explode(graft.ops.SubstrDedup.gramHashes(Text.tokens($"text"), 8))
          .as("gh"))
      .distinct()
      .localCheckpoint() // one gram pass feeds first-seen AND the join
    val f = g.groupBy($"gh").agg(min($"doc_id").as("first_doc"))
    g.join(f, Seq("gh"))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_grams"),
        sum(when($"first_doc" === $"doc_id", 1L).otherwise(0L)).as("n_novel"))
      .select($"doc_id", $"n_grams", $"n_novel",
        round($"n_novel".cast("double") / $"n_grams", 6).as("novelty"))
      .orderBy($"doc_id")
  }

  /** Dedup-system agreement matrix — the dedup twin of
    * `d_ranking_agreement`: for each pair of shipped dedup systems
    * (EXACT content-hash, MINHASH LSH-verified pairs, SIMHASH banded
    * Hamming), how much do their flagged-document sets overlap? A doc
    * is "flagged" by a method when that method finds it at least one
    * duplicate partner (symmetric — no representative election, so the
    * comparison is about detection, not keep policy). Output: per
    * method pair, both set sizes, intersection, union, Jaccard — the
    * table a corpus owner reads to decide whether the cheap exact pass
    * subsumes the fuzzy ones on their data.
    *
    * Scale shape: each flagged set is the method's existing pair
    * pipeline (all capped-bucket scaffolds — nothing all-pairs) reduced
    * to a distinct doc set; the agreement join is keyed on doc_id; the
    * 3-row size table broadcasts. The method grid is STATIC (VALUES /
    * local Seq), so methods that flag nothing — exact, on a corpus
    * with no byte-identical dups — still appear with n = 0 instead of
    * silently vanishing (the dense-grid trick from
    * `d_source_divergence`, plus a guarded 0-division). */
  val ddMethodAgreement: Spec = Spec(
    "dd_method_agreement",
    oracle = Some(s"""
      WITH mhp AS ($minhashPairsSql),
      shs AS (
        SELECT doc_id, ${simhash60Sql(
          "list_transform(string_split(text,' '), t -> ('0x' || substr(md5(t), 1, 15))::BIGINT)")} AS sh
        FROM documents),
      shp AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b
        FROM shs a JOIN shs b ON a.doc_id < b.doc_id
        WHERE bit_count(xor(a.sh, b.sh)) <= 3),
      ex AS (
        SELECT doc_id FROM (
          SELECT doc_id, COUNT(*) OVER (PARTITION BY
            md5(regexp_replace(trim(lower(text)), '[\\s\\x0B]+', ' ', 'g'))) AS n
          FROM documents) WHERE n > 1),
      f AS (
        SELECT 'exact' AS method, doc_id FROM ex
        UNION SELECT 'minhash', id_a FROM mhp
        UNION SELECT 'minhash', id_b FROM mhp
        UNION SELECT 'simhash', id_a FROM shp
        UNION SELECT 'simhash', id_b FROM shp),
      methods AS (
        SELECT * FROM (VALUES ('exact'), ('minhash'), ('simhash')) AS t(method)),
      sizes0 AS (SELECT method, CAST(COUNT(*) AS BIGINT) AS n
                 FROM f GROUP BY method),
      sizes AS (
        SELECT m.method, CAST(COALESCE(s.n, 0) AS BIGINT) AS n
        FROM methods m LEFT JOIN sizes0 s ON m.method = s.method),
      overlap AS (
        SELECT a.method AS method_a, b.method AS method_b,
          CAST(COUNT(*) AS BIGINT) AS n_both
        FROM f a JOIN f b ON a.doc_id = b.doc_id AND a.method < b.method
        GROUP BY 1, 2),
      mp AS (
        SELECT sa.method AS method_a, sb.method AS method_b,
          sa.n AS n_a, sb.n AS n_b
        FROM sizes sa JOIN sizes sb ON sa.method < sb.method)
      SELECT method_a, method_b, n_a, n_b,
        CAST(COALESCE(n_both, 0) AS BIGINT) AS n_both,
        n_a + n_b - CAST(COALESCE(n_both, 0) AS BIGINT) AS n_union,
        CASE WHEN n_a + n_b - COALESCE(n_both, 0) = 0 THEN 0.0
          ELSE round(CAST(COALESCE(n_both, 0) AS DOUBLE) /
            (n_a + n_b - COALESCE(n_both, 0)), 6) END AS jaccard
      FROM mp LEFT JOIN overlap USING (method_a, method_b)
      ORDER BY method_a, method_b""")) { (s, dir) =>
    import s.implicits._
    val docsDf = Tables.load(s, dir, "documents")
    val hashes = docsDf.select($"doc_id", md5(Text.normalizeWs($"text")).as("h"))
    val dupH = hashes.groupBy($"h").agg(count(lit(1)).as("nh")).filter($"nh" > 1)
    val ex = hashes.join(dupH, "h").select($"doc_id")
    val mhp = MinHash.candidatePairs(docsDf, "doc_id", "text",
      shingleSize = 3, numPerm = 32, bands = 8, threshold = 0.5)
    val mh = mhp.select($"id_a".as("doc_id"))
      .union(mhp.select($"id_b".as("doc_id"))).distinct
    val shHashed = docsDf
      .withColumn("toks", Text.tokens($"text"))
      .withColumn("hs", SimHash.md5TokenHashes("toks"))
      .select($"doc_id".as("id"), SimHash.simhashFromHashes("hs", 60).as("sh"))
    val shp = SimHash.neardupPairsBanded(shHashed, maxHamming = 3,
      totalBits = 60, maxBucket = 1000)
    val sh = shp.select($"id_a".as("doc_id"))
      .union(shp.select($"id_b".as("doc_id"))).distinct
    val f = ex.select(lit("exact").as("method"), $"doc_id")
      .union(mh.select(lit("minhash").as("method"), $"doc_id"))
      .union(sh.select(lit("simhash").as("method"), $"doc_id"))
    val methods = Seq("exact", "minhash", "simhash").toDF("method")
    val sizes = methods
      .join(f.groupBy($"method").agg(count(lit(1)).as("n0")), Seq("method"), "left")
      .select($"method", coalesce($"n0", lit(0L)).as("n"))
    val overlap = f.as("a")
      .join(f.as("b"), $"a.doc_id" === $"b.doc_id" && $"a.method" < $"b.method")
      .groupBy($"a.method".as("method_a"), $"b.method".as("method_b"))
      .agg(count(lit(1)).as("n_both"))
    val mp = broadcast(sizes.select($"method".as("method_a"), $"n".as("n_a")))
      .join(broadcast(sizes.select($"method".as("method_b"), $"n".as("n_b"))),
        $"method_a" < $"method_b")
    mp.join(overlap, Seq("method_a", "method_b"), "left")
      .select($"method_a", $"method_b", $"n_a", $"n_b",
        coalesce($"n_both", lit(0L)).as("n_both"),
        ($"n_a" + $"n_b" - coalesce($"n_both", lit(0L))).as("n_union"),
        when($"n_a" + $"n_b" - coalesce($"n_both", lit(0L)) === 0, lit(0.0))
          .otherwise(round(coalesce($"n_both", lit(0L)).cast("double") /
            ($"n_a" + $"n_b" - coalesce($"n_both", lit(0L))), 6)).as("jaccard"))
      .orderBy($"method_a", $"method_b")
  }

  /** Jaccard threshold sensitivity sweep — the dedup TUNING table: from
    * ONE MinHash pair computation (candidates at the loosest threshold,
    * 0.2), how many verified pairs and how many flagged docs survive
    * at each tighter cutoff (0.2 … 0.9)? The corpus's own near-dups
    * are all J ≥ 0.9 (planted exact-ish copies), so two deterministic
    * weak-twin families are injected to populate the mid-curve —
    * every-8th-token dropped (shingle J ≈ 0.5) and every-20th-token
    * dropped (J ≈ 0.77) — the same synthetic-branch trick as
    * [[ddCappedStarPairs]], stated identically in the oracle. This is the table a corpus owner
    * reads before picking the production threshold — recomputing the
    * whole LSH pipeline per candidate threshold is the naive
    * alternative this query exists to avoid.
    *
    * Scale shape: the pair table is already capped-bucket bounded; the
    * 5-row threshold grid broadcasts against it (nested-loop on a
    * 5-row side — the grid trick); thresholds compare against the SAME
    * 6dp-rounded jaccard both engines store, so cutoff membership is
    * exact. LEFT join + count(non-null) keeps zero-pair thresholds. */
  val ddThresholdSweep: Spec = Spec(
    "dd_threshold_sweep",
    oracle = Some(s"""
      WITH docs2 AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 1000000,
          array_to_string(list_filter(string_split(text, ' '),
            (x, i) -> (i - 1) % 8 <> 0), ' ')
        FROM documents WHERE doc_id % 20 = 0
        UNION ALL
        SELECT doc_id + 2000000,
          array_to_string(list_filter(string_split(text, ' '),
            (x, i) -> (i - 1) % 20 <> 0), ' ')
        FROM documents WHERE doc_id % 20 = 10),
      mhp AS (${minhashPairsSql
        .replace("jac >= 0.5", "jac >= 0.2")
        .replace("FROM documents", "FROM docs2")}),
      t AS (SELECT * FROM (VALUES (0.2), (0.35), (0.5), (0.75), (0.9)) AS t(thr)),
      j AS (SELECT thr, id_a, id_b FROM t LEFT JOIN mhp ON jaccard >= thr),
      np AS (SELECT thr, CAST(COUNT(id_a) AS BIGINT) AS n_pairs
             FROM j GROUP BY thr),
      nd AS (
        SELECT thr, CAST(COUNT(DISTINCT d) AS BIGINT) AS n_docs
        FROM (SELECT thr, unnest([id_a, id_b]) AS d FROM j)
        WHERE d IS NOT NULL GROUP BY thr)
      SELECT np.thr AS threshold, n_pairs,
        CAST(COALESCE(n_docs, 0) AS BIGINT) AS n_docs
      FROM np LEFT JOIN nd ON np.thr = nd.thr
      ORDER BY threshold""")) { (s, dir) =>
    import s.implicits._
    val base = Tables.load(s, dir, "documents")
    requirePlantedHeadroom(base, "doc_id", 1000000L)
    def dropped(mod: Int, res: Int, every: Int, off: Long) =
      base.filter($"doc_id" % mod === res)
        .select(($"doc_id" + off).as("doc_id"),
          array_join(org.apache.spark.sql.functions.filter(
            Text.tokens($"text"), (x, i) => i % every =!= 0), " ").as("text"))
    val pairs = MinHash.candidatePairs(
        base.select($"doc_id", $"text")
          .unionByName(dropped(20, 0, 8, 1000000L))
          .unionByName(dropped(20, 10, 20, 2000000L)),
        "doc_id", "text",
        shingleSize = 3, numPerm = 32, bands = 8, threshold = 0.2)
      .select($"id_a", $"id_b", round($"jaccard", 6).as("jaccard"))
    val thr = Seq(0.2, 0.35, 0.5, 0.75, 0.9).toDF("threshold")
    val j = broadcast(thr).join(pairs, $"jaccard" >= $"threshold", "left")
    val np = j.groupBy($"threshold").agg(count($"id_a").as("n_pairs"))
    val nd = j.select($"threshold", explode(array($"id_a", $"id_b")).as("d"))
      .filter($"d".isNotNull)
      .groupBy($"threshold").agg(countDistinct($"d").as("n_docs0"))
    np.join(nd, Seq("threshold"), "left")
      .select($"threshold", $"n_pairs", coalesce($"n_docs0", lit(0L)).as("n_docs"))
      .orderBy($"threshold")
  }

  /** MinHash estimation-error report — "measure, don't guess" for the
    * sketch itself: for every LSH-verified pair, the SIGNATURE-side
    * Jaccard estimate (agreeing slots / 32) next to the exact
    * shingle-set Jaccard, the per-pair absolute error, and the corpus
    * MAE (theory: σ ≈ √(J(1−J)/k) ≈ 0.09 at k=32, J=0.5 — the table
    * that justifies the permutation budget). Estimates are k/32 values
    * (exact binary doubles, no rounding hazard); MAE goes through the
    * DECIMAL-sum rule; the one-row MAE aggregate broadcasts onto the
    * pair table.
    *
    * Scale shape: identical to [[ddMinhashPairs]] (capped buckets, one
    * signature computation) plus two keyed joins of the bounded pair
    * table back to signatures. */
  val ddMinhashEstimate: Spec = Spec(
    "dd_minhash_estimate",
    oracle = Some {
      val pairsWithSig = minhashPairsSql.replace(
        """SELECT ida AS id_a, idb AS id_b, ROUND(jac, 6) AS jaccard
      FROM j WHERE jac >= 0.5 ORDER BY id_a, id_b""",
        """SELECT j.ida AS id_a, j.idb AS id_b, ROUND(j.jac, 6) AS jaccard,
        round(len(list_filter(list_transform(range(1, 33),
          i -> sa.sig[i] = sb.sig[i]), x -> x)) / 32.0, 6) AS estimate
      FROM j JOIN sig sa ON sa.doc_id = j.ida
        JOIN sig sb ON sb.doc_id = j.idb
      WHERE j.jac >= 0.5""")
      s"""
      WITH mhe AS ($pairsWithSig),
      e AS (
        SELECT id_a, id_b, jaccard, estimate,
          round(abs(estimate - jaccard), 6) AS abs_err
        FROM mhe),
      m AS (
        SELECT FLOOR(CAST(SUM(CAST(abs_err AS DECIMAL(18,6))) AS DOUBLE)
          / COUNT(*) * 1000000) / 1000000 AS mae FROM e)
      SELECT e.*, m.mae FROM e, m ORDER BY id_a, id_b"""
    }) { (s, dir) =>
    import s.implicits._
    val base = Tables.load(s, dir, "documents")
    val sigs = base
      .select($"doc_id".as("id"), Text.shingleSet($"text", 3).as("sh"))
      .filter(org.apache.spark.sql.functions.size($"sh") > 0)
      .withColumn("sig", MinHash.signature($"sh", 32))
      .select($"id", $"sig")
    val e = MinHash.candidatePairs(base, "doc_id", "text",
        shingleSize = 3, numPerm = 32, bands = 8, threshold = 0.5)
      .join(sigs.select($"id".as("id_a"), $"sig".as("sig_a")), Seq("id_a"))
      .join(sigs.select($"id".as("id_b"), $"sig".as("sig_b")), Seq("id_b"))
      .select($"id_a", $"id_b", round($"jaccard", 6).as("jaccard"),
        round(org.apache.spark.sql.functions.size(
          org.apache.spark.sql.functions.filter(
            zip_with($"sig_a", $"sig_b", (x, y) => x === y),
            b => b)).cast("double") / 32.0, 6).as("estimate"))
      .withColumn("abs_err", round(abs($"estimate" - $"jaccard"), 6))
    // floor-truncate, not round: the mean of 6dp decimals is an exact
    // rational that can land ON a rounding half-boundary, where engine
    // round() implementations disagree (round-9 gate finding)
    val m = e.agg(
      (floor(sum($"abs_err".cast("decimal(18,6)")).cast("double") /
        count(lit(1)) * 1000000).cast("double") / 1000000).as("mae"))
    e.crossJoin(broadcast(m)).orderBy($"id_a", $"id_b")
  }

  /** Sorted-neighborhood dedup candidates (Hernández & Stolfo '95):
    * sort the corpus by a normalized 24-char prefix key, then pair every
    * record with its w=3 successors in sort order — the classic
    * record-linkage alternative to hash blocking ([[ddJaccardBlockPairs]])
    * and LSH ([[ddMinhashPairs]]): near-identical prefixes land adjacent
    * regardless of which block a hash would have assigned, and the
    * candidate count is EXACTLY w·n by construction — no degenerate-block
    * blowup to cap. Verification is an edit-distance gate on the 64-char
    * normalized prefix (≤ 20), row-local.
    *
    * Scale shape: the global sort rank is the two-phase
    * [[graft.ops.Skew.globalRowNumber]] (range partitions + broadcast
    * offsets — no single-reducer window sort), and neighbors meet
    * through an EQUI-join on the dense rank (3 exploded successors per
    * row), whose key is unique per row — perfectly uniform, one
    * shuffle, AQE-splittable. Nothing in the plan is quadratic in a
    * block size. */
  val ddSnmPairs: Spec = Spec(
    "dd_snm_pairs",
    oracle = Some("""
      WITH n AS (SELECT doc_id,
              regexp_replace(trim(lower(text)), '[\s\x0B]+', ' ', 'g') AS norm
            FROM documents),
      r AS (SELECT doc_id, norm,
              row_number() OVER (ORDER BY substr(norm, 1, 24), doc_id) AS rn
            FROM n),
      p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
              a.norm AS na, b.norm AS nb
            FROM r a JOIN r b ON b.rn - a.rn BETWEEN 1 AND 3)
      SELECT id_a, id_b,
        CAST(levenshtein(substr(na,1,64), substr(nb,1,64)) AS BIGINT) AS prefix_dist
      FROM p WHERE levenshtein(substr(na,1,64), substr(nb,1,64)) <= 20
      ORDER BY id_a, id_b""")) { (s, dir) =>
    import s.implicits._
    val norm = Tables.load(s, dir, "documents")
      .select($"doc_id", Text.normalizeWs($"text").as("norm"))
    snmPass(norm, substring($"norm", 1, 24))
      .filter(levenshtein($"pa", $"pb") <= 20)
      .select($"id_a", $"id_b",
        levenshtein($"pa", $"pb").cast("long").as("prefix_dist"))
      .orderBy($"id_a", $"id_b")
  }

  /** One sorted-neighborhood pass: rank by (sortKey, doc_id) via the
    * two-phase global rank, pair each row with its w=3 successors
    * through the rank equi-join, and carry both 64-char normalized
    * prefixes for the caller's verify gate. */
  private def snmPass(norm: org.apache.spark.sql.DataFrame,
      sortKey: org.apache.spark.sql.Column): org.apache.spark.sql.DataFrame = {
    val ranked = Skew.globalRowNumber(
        norm.withColumn("sk", sortKey), Seq(col("sk"), col("doc_id")))
      .select(col("doc_id"), substring(col("norm"), 1, 64).as("pfx"), col("rn"))
    val left = ranked.select(col("doc_id").as("id_a"), col("pfx").as("pa"),
      col("rn").as("rn_a"))
    val right = ranked.select(col("doc_id").as("id_b"), col("pfx").as("pb"),
      col("rn").as("rn_b"))
    left
      .select(col("id_a"), col("pa"),
        explode(typedlit(Seq(1L, 2L, 3L))).as("j"), col("rn_a"))
      .withColumn("rn_b", col("rn_a") + col("j"))
      .join(right, "rn_b")
      .select(col("id_a"), col("id_b"), col("pa"), col("pb"))
  }

  /** MULTI-PASS sorted neighborhood (the standard recall fix for SNM's
    * one weakness — an edit inside the sort key scatters near-dups
    * across the sort order): a second pass keyed on the REVERSED text
    * prefix catches pairs whose heads differ but whose tails agree;
    * pairs union over passes, canonically oriented (id_a < id_b) and
    * deduplicated, then the same edit-distance gate verifies. On the
    * verify corpus both passes find the same pairs (near-dups share
    * heads); DedupSpec plants a head-divergent/tail-identical pair that
    * ONLY the reversed pass can catch.
    *
    * Scale shape: exactly two [[ddSnmPairs]] pipelines (each w·n
    * candidates, rank equi-joins) + one distinct — cost is passes ×
    * single-pass, never quadratic. */
  val ddSnmMultipass: Spec = Spec(
    "dd_snm_multipass",
    oracle = Some("""
      WITH n AS (SELECT doc_id,
              regexp_replace(trim(lower(text)), '[\s\x0B]+', ' ', 'g') AS norm
            FROM documents),
      r1 AS (SELECT doc_id, norm,
              row_number() OVER (ORDER BY substr(norm, 1, 24), doc_id) AS rn
            FROM n),
      p1 AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
             FROM r1 a JOIN r1 b ON b.rn - a.rn BETWEEN 1 AND 3),
      r2 AS (SELECT doc_id, norm,
              row_number() OVER (ORDER BY substr(reverse(norm), 1, 24), doc_id) AS rn
            FROM n),
      p2 AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
             FROM r2 a JOIN r2 b ON b.rn - a.rn BETWEEN 1 AND 3),
      u AS (SELECT DISTINCT LEAST(id_a, id_b) AS id_a,
              GREATEST(id_a, id_b) AS id_b
            FROM (SELECT * FROM p1 UNION ALL SELECT * FROM p2)),
      v AS (SELECT u.id_a, u.id_b,
              substr(a.norm, 1, 64) AS pa, substr(b.norm, 1, 64) AS pb
            FROM u JOIN n a ON a.doc_id = u.id_a JOIN n b ON b.doc_id = u.id_b)
      SELECT id_a, id_b,
        CAST(levenshtein(pa, pb) AS BIGINT) AS prefix_dist
      FROM v WHERE levenshtein(pa, pb) <= 20
      ORDER BY id_a, id_b""")) { (s, dir) =>
    import s.implicits._
    val norm = Tables.load(s, dir, "documents")
      .select($"doc_id", Text.normalizeWs($"text").as("norm"))
    val p1 = snmPass(norm, substring($"norm", 1, 24))
    val p2 = snmPass(norm, substring(reverse($"norm"), 1, 24))
    val u = p1.unionByName(p2)
      .select(least($"id_a", $"id_b").as("id_a"),
        greatest($"id_a", $"id_b").as("id_b"))
      .distinct()
    val pfx = norm.select($"doc_id", substring($"norm", 1, 64).as("pfx"))
    u.join(pfx.select($"doc_id".as("id_a"), $"pfx".as("pa")), "id_a")
      .join(pfx.select($"doc_id".as("id_b"), $"pfx".as("pb")), "id_b")
      .filter(levenshtein($"pa", $"pb") <= 20)
      .select($"id_a", $"id_b",
        levenshtein($"pa", $"pb").cast("long").as("prefix_dist"))
      .orderBy($"id_a", $"id_b")
  }

  /** Content-defined chunking (the LBFS cut rule — Muthitacharoen et
    * al., SOSP '01): slide an 8-char window over the normalized text
    * and cut wherever the window's 48-bit hash ≡ 0 (mod 32) — expected
    * chunk ≈ 32 chars. Because boundaries depend only on LOCAL content,
    * an insertion early in a document shifts at most one chunk's
    * boundaries, so shared passages between documents hash to the SAME
    * chunks no matter where they sit — the dedup property fixed-size
    * chunking lacks and whole-doc hashing ([[ddExactHash]]) can't see.
    * Output: every chunk content-hash occurring more than once, with
    * its occurrence and document counts. (Plain cut rule: no min/max
    * chunk-size clamps — those add sequential state; the expected size
    * is set by the modulus.) Documents shorter than the window are
    * chunkless by definition.
    *
    * Scale shape: the position explode is doc-length-bounded (the same
    * class as the winnowing gram explode); cuts are ~1/32 of positions;
    * chunk assembly is a doc-local lag window; and the dedup summary is
    * a hash agg keyed by the chunk hash. No join anywhere. */
  val ddCdcChunks: Spec = Spec(
    "dd_cdc_chunks",
    oracle = Some("""
      WITH n AS (SELECT doc_id,
              regexp_replace(trim(lower(text)), '[\s\x0B]+', ' ', 'g') AS norm
            FROM documents),
      g AS (SELECT doc_id, norm, unnest(range(1, len(norm) - 6)) AS i
            FROM n WHERE len(norm) >= 8),
      cut AS (SELECT doc_id, norm, i + 7 AS cut
              FROM g
              WHERE ('0x' || substr(md5(substr(norm, i, 8)), 1, 12))::BIGINT % 32 = 0),
      allcut AS (
        SELECT doc_id, norm, cut FROM cut
        UNION
        SELECT doc_id, norm, len(norm) AS cut FROM n WHERE len(norm) >= 8),
      ch AS (SELECT doc_id,
              COALESCE(lag(cut) OVER (PARTITION BY doc_id ORDER BY cut), 0) + 1 AS cstart,
              cut AS cend, norm
            FROM allcut),
      chunks AS (SELECT doc_id,
              md5(substr(norm, cstart, cend - cstart + 1)) AS chunk_md5,
              cend - cstart + 1 AS clen
            FROM ch)
      SELECT chunk_md5,
        CAST(COUNT(*) AS BIGINT) AS n_occ,
        CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
        CAST(MIN(clen) AS BIGINT) AS chunk_len
      FROM chunks GROUP BY chunk_md5 HAVING COUNT(*) > 1
      ORDER BY chunk_md5""")) { (s, dir) =>
    import s.implicits._
    val n = Tables.load(s, dir, "documents")
      .select($"doc_id", Text.normalizeWs($"text").as("norm"))
      .filter(length($"norm") >= 8)
    val cuts = n
      .select($"doc_id", $"norm",
        explode(sequence(lit(1L), length($"norm").cast("long") - 7)).as("i"))
      .filter(
        conv(substring(md5($"norm".substr($"i", lit(8))), 1, 12), 16, 10)
          .cast("long") % 32 === 0)
      .select($"doc_id", $"norm", ($"i" + 7).as("cut"))
    val allcut = cuts
      .union(n.select($"doc_id", $"norm", length($"norm").cast("long").as("cut")))
      .distinct()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"doc_id").orderBy($"cut")
    allcut
      .withColumn("cstart", coalesce(lag($"cut", 1).over(w), lit(0L)) + 1)
      .select($"doc_id",
        md5(expr("substring(norm, cstart, cut - cstart + 1)")).as("chunk_md5"),
        ($"cut" - $"cstart" + 1).as("clen"))
      .groupBy($"chunk_md5")
      .agg(count(lit(1)).as("n_occ"),
        countDistinct($"doc_id").as("n_docs"),
        min($"clen").as("chunk_len"))
      .filter($"n_occ" > 1)
      .orderBy($"chunk_md5")
  }

  /** LSH PARAMETER PLANNER: the banding S-curve p(s) = 1−(1−s^r)^b for
    * every (bands, rows) factorization of the 32-perm signature, plus
    * each config's threshold estimate (1/b)^(1/r) — the table an
    * operator reads BEFORE picking dd_minhash_pairs' parameters (the
    * shipped 8×4 puts the S-curve knee at ≈0.59; the sweep shows what
    * moving it costs in false positives below / misses above). Pure
    * arithmetic on a 54-row grid — no data touched; the planning
    * companion to [[ddThresholdSweep]]'s measured recall. */
  val ddLshPlanner: Spec = Spec(
    "dd_lsh_planner",
    oracle = Some("""
      WITH cfg AS (SELECT * FROM (VALUES (32,1),(16,2),(8,4),(4,8),(2,16),(1,32))
        AS t(b, r)),
      sg AS (SELECT unnest(range(1, 10)) / 10.0 AS s)
      SELECT CAST(b AS BIGINT) AS bands, CAST(r AS BIGINT) AS rows_per_band,
        round(pow(1.0 / b, 1.0 / r), 6) AS est_threshold,
        round(sg.s, 1) AS jaccard_s,
        round(1 - pow(1 - pow(sg.s, r), b), 6) AS p_collision
      FROM cfg CROSS JOIN sg ORDER BY bands DESC, jaccard_s""")) { (s, dir) =>
    import s.implicits._
    val cfg = Seq((32, 1), (16, 2), (8, 4), (4, 8), (2, 16), (1, 32))
      .toDF("b", "r")
    val sg = cfg.sparkSession.range(1, 10)
      .select(($"id" / 10.0).as("s"))
    cfg.crossJoin(sg)
      .select($"b".cast("long").as("bands"), $"r".cast("long").as("rows_per_band"),
        round(pow(lit(1.0) / $"b", lit(1.0) / $"r"), 6).as("est_threshold"),
        round($"s", 1).as("jaccard_s"),
        round(lit(1) - pow(lit(1) - pow($"s", $"r"), $"b"), 6).as("p_collision"))
      .orderBy($"bands".desc, $"jaccard_s")
  }

  /** Band PLANNER on top of [[ddLshPlanner]]'s curve table
    * ([[MinHash.bandPlan]]): for each target similarity threshold,
    * SELECT the (bands, rows_per_band) split of a 128-perm signature
    * whose S-curve midpoint (1/b)^(1/r) is closest — the decided
    * answer (vs the planner's characterization) a 100 TB dedup run
    * configures from, plus the candidate probability at the target so
    * the chosen split's recall at its own operating point is visible. */
  val ddBandPlan: Spec = Spec(
    "dd_band_plan",
    oracle = Some("""
      WITH b AS (SELECT unnest([1,2,4,8,16,32,64,128]) AS bands),
      c AS (SELECT bands, 128 // bands AS rows_per_band,
              pow(1.0 / bands, 1.0 / (128 // bands)) AS s50_raw FROM b),
      t AS (SELECT unnest([0.5,0.6,0.7,0.8,0.9]) AS threshold),
      r AS (SELECT t.threshold, c.bands, c.rows_per_band, c.s50_raw,
              row_number() OVER (PARTITION BY t.threshold
                ORDER BY abs(c.s50_raw - t.threshold), c.bands) AS rk
            FROM t CROSS JOIN c)
      SELECT threshold, CAST(bands AS BIGINT) AS bands,
        CAST(rows_per_band AS BIGINT) AS rows_per_band,
        floor(s50_raw * 1000000) / 1000000 AS s50,
        floor((1 - pow(1 - pow(threshold, rows_per_band), bands)) * 1000000)
          / 1000000 AS p_at_threshold
      FROM r WHERE rk = 1 ORDER BY threshold""")) { (s, dir) =>
    import s.implicits._
    MinHash.bandPlan(s, 128, Seq(0.5, 0.6, 0.7, 0.8, 0.9))
      .orderBy($"threshold")
  }

  /** DEDUP FUNNEL report: how much each method removes, alone and
    * together — exact whitespace-normalized hash (keep-min), MinHash+CC
    * near-dup clusters (keep-min), their overlap, the union, and the
    * survivor count — the one-row summary a data lead reads before
    * choosing which dedup passes to pay for at 100 TB. Restates the
    * shared `labels` CTE chain (minhash semantics cannot drift) plus
    * the d_fingerprint normalization; set arithmetic is exact integer
    * counts.
    *
    * Scale shape: the exact pass is one hash agg; the near-dup pass is
    * the capped LSH + CC machinery; the overlap/union are semi-join
    * counts on removal-id frames (removed docs, not the corpus). */
  val ddDedupFunnel: Spec = Spec(
    "dd_dedup_funnel",
    oracle = Some(s"""
      WITH RECURSIVE $minhashLabelsCte,
      n AS (SELECT doc_id,
              md5(regexp_replace(trim(lower(text)), '[\\s\\x0B]+', ' ', 'g')) AS h
            FROM documents),
      exr AS (SELECT doc_id FROM n
              WHERE doc_id > (SELECT MIN(n2.doc_id) FROM n n2 WHERE n2.h = n.h)),
      mhr AS (SELECT id AS doc_id FROM labels WHERE id <> component),
      tot AS (SELECT COUNT(*) AS n_docs FROM documents),
      ov AS (SELECT COUNT(*) AS n_both FROM exr JOIN mhr ON mhr.doc_id = exr.doc_id),
      un AS (SELECT COUNT(*) AS n_union FROM
        (SELECT doc_id FROM exr UNION SELECT doc_id FROM mhr))
      SELECT CAST(tot.n_docs AS BIGINT) AS n_docs,
        (SELECT CAST(COUNT(*) AS BIGINT) FROM exr) AS removed_exact,
        (SELECT CAST(COUNT(*) AS BIGINT) FROM mhr) AS removed_neardup,
        CAST(ov.n_both AS BIGINT) AS removed_by_both,
        CAST(un.n_union AS BIGINT) AS removed_union,
        CAST(tot.n_docs - un.n_union AS BIGINT) AS survivors
      FROM tot CROSS JOIN ov CROSS JOIN un""")) { (s, dir) =>
    import s.implicits._
    val d = Tables.load(s, dir, "documents")
    val n = d.select($"doc_id", md5(Text.normalizeWs($"text")).as("h"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy($"h")
    val exr = n.withColumn("mn", min($"doc_id").over(w))
      .filter($"doc_id" > $"mn").select($"doc_id")
      .localCheckpoint()
    val mhr = MinHash.clusters(MinHash.candidatePairs(
        d, "doc_id", "text", shingleSize = 3, numPerm = 32, bands = 8,
        threshold = 0.5))
      .filter($"id" =!= $"component").select($"id".as("doc_id"))
      .localCheckpoint()
    val tot = d.agg(count(lit(1)).as("n_docs"))
    val ex = exr.agg(count(lit(1)).as("removed_exact"))
    val mh = mhr.agg(count(lit(1)).as("removed_neardup"))
    val ov = exr.join(mhr, "doc_id").agg(count(lit(1)).as("removed_by_both"))
    val un = exr.union(mhr).distinct().agg(count(lit(1)).as("n_union"))
    tot.crossJoin(broadcast(ex)).crossJoin(broadcast(mh))
      .crossJoin(broadcast(ov)).crossJoin(broadcast(un))
      .select($"n_docs", $"removed_exact", $"removed_neardup",
        $"removed_by_both", $"n_union".as("removed_union"),
        ($"n_docs" - $"n_union").as("survivors"))
  }

  /** Cluster COHESION report: per near-dup cluster, the exact mean and
    * minimum pairwise Jaccard over member shingle sets — the quality
    * check on the LSH+CC labelling itself: a low-min cluster is a
    * CHAIN (a~b~c where a and c aren't near-dups), the artifact
    * transitive closure always risks, and exactly what an operator
    * inspects before trusting keep-min removal. Pair means are
    * 9dp-rounded DECIMAL sums (order-free); the per-cluster pair count
    * is bounded by cluster size, which the capped candidate path keeps
    * small.
    *
    * Oracle restates the shared labels CTE + list-ops Jaccard, so the
    * cluster semantics cannot drift from dd_minhash_clusters. */
  val ddClusterCohesion: Spec = Spec(
    "dd_cluster_cohesion",
    oracle = Some(s"""
      WITH RECURSIVE $minhashLabelsCte,
      mem AS (SELECT l.component, l.id, s.sh FROM labels l
              JOIN sh s ON s.doc_id = l.id),
      pw AS (SELECT a.component,
          CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
            (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) AS jac
        FROM mem a JOIN mem b ON b.component = a.component AND a.id < b.id)
      SELECT component, CAST(COUNT(*) AS BIGINT) AS n_pairs,
        round(CAST(SUM(CAST(round(jac, 9) AS DECIMAL(28,12))) AS DOUBLE)
          / COUNT(*), 6) AS mean_jaccard,
        round(MIN(jac), 6) AS min_jaccard
      FROM pw GROUP BY component ORDER BY component""")) { (s, dir) =>
    import s.implicits._
    val d = Tables.load(s, dir, "documents")
    val labels = MinHash.clusters(MinHash.candidatePairs(
      d, "doc_id", "text", shingleSize = 3, numPerm = 32, bands = 8,
      threshold = 0.5))
    val mem = labels
      .join(d.select($"doc_id".as("id"), Text.shingleSet($"text", 3).as("sh")),
        "id")
    val a = mem.select($"component", $"id".as("ida"), $"sh".as("sha"))
    val b = mem.select($"component", $"id".as("idb"), $"sh".as("shb"))
    a.join(b, Seq("component"))
      .filter($"ida" < $"idb")
      .select($"component", Text.jaccard($"sha", $"shb").as("jac"))
      .groupBy($"component")
      .agg(count(lit(1)).as("n_pairs"),
        round(sum(round($"jac", 9).cast("decimal(28,12)")).cast("double")
          / count(lit(1)), 6).as("mean_jaccard"),
        round(min($"jac"), 6).as("min_jaccard"))
      .orderBy($"component")
  }

  /** CONTAINMENT pairs (Broder's other coefficient): |A∩B|/|A| and
    * |A∩B|/|B| over the LSH candidate set — the asymmetric measure
    * that catches doc-INSIDE-doc inclusion (a quote page containing a
    * full article scores high containment but low Jaccard, so
    * resemblance dedup never sees it). Pairs where EITHER direction
    * ≥ 0.5, with the Jaccard alongside so inclusion-not-resemblance
    * rows are visible. Restates the shared candidate CTE
    * ([[minhashCandCte]]) + list-ops arithmetic.
    *
    * Scale shape: same capped banded candidate path as
    * dd_minhash_pairs; the verify joins are candidate-sized. */
  val ddContainmentPairs: Spec = Spec(
    "dd_containment_pairs",
    oracle = Some(s"""
      WITH $minhashCandCte,
      c AS (
        SELECT ida, idb,
          CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE) / len(sa.sh) AS cab,
          CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE) / len(sb.sh) AS cba,
          CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE) /
            (len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh))) AS jac
        FROM pairs JOIN sh sa ON sa.doc_id = ida JOIN sh sb ON sb.doc_id = idb)
      SELECT ida AS id_a, idb AS id_b, round(cab, 6) AS containment_ab,
        round(cba, 6) AS containment_ba, round(jac, 6) AS jaccard
      FROM c WHERE cab >= 0.5 OR cba >= 0.5
      ORDER BY id_a, id_b""")) { (s, dir) =>
    import s.implicits._
    val d = Tables.load(s, dir, "documents")
    // threshold 0: keep every banded candidate, containment decides
    val cand = MinHash.candidatePairs(d, "doc_id", "text",
      shingleSize = 3, numPerm = 32, bands = 8, threshold = 0.0)
    val sets = d.select($"doc_id", Text.shingleSet($"text", 3).as("sh"))
    val inter = size(array_intersect($"sha", $"shb")).cast("double")
    cand.select($"id_a", $"id_b", $"jaccard")
      .join(sets.select($"doc_id".as("id_a"), $"sh".as("sha")), "id_a")
      .join(sets.select($"doc_id".as("id_b"), $"sh".as("shb")), "id_b")
      .select($"id_a", $"id_b",
        (inter / size($"sha")).as("cab"),
        (inter / size($"shb")).as("cba"),
        $"jaccard")
      .filter($"cab" >= 0.5 || $"cba" >= 0.5)
      .select($"id_a", $"id_b", round($"cab", 6).as("containment_ab"),
        round($"cba", 6).as("containment_ba"),
        round($"jaccard", 6).as("jaccard"))
      .orderBy($"id_a", $"id_b")
  }

  /** Fielded record linkage (Fellegi–Sunter): match a MASTER table
    * against a dirty feed of the same entities — the entity-resolution
    * sibling of text dedup, where "duplicate" means the same real-world
    * customer despite typos and drifted attributes. The dirty twin is
    * derived deterministically (one name character dropped at a
    * key-selected position, balance shifted +0.07, every 7th segment
    * re-coded) so both engines score the identical feed.
    *
    * Scale shape: candidate pairs come from TWO blocking passes —
    * (nation, balance/100 bucket) and the half-width-shifted bucket, so
    * a perturbation that crosses a bucket boundary is still caught
    * (the multi-pass trick SNM uses with reversed keys). Each pass is a
    * hash equi-join on the block key; nothing is ever all-pairs, and
    * block granularity bounds candidates by construction. Agreement
    * weights are integer-scaled log-likelihood ratios (agree → +w_m,
    * disagree → -w_u per field: name-edit-distance<=2, segment exact,
    * balance within 1.00); classes at the two Fellegi–Sunter
    * thresholds. Only match/possible pairs are emitted (non-matches
    * are the uninteresting bulk, exactly what production linkage
    * discards). */
  val ddRecordLinkage: Spec = Spec(
    "dd_record_linkage",
    oracle = Some("""
      WITH clean AS (
        SELECT c_custkey, c_name, c_nationkey, c_mktsegment,
               CAST(c_acctbal AS DECIMAL(12,2)) AS bal
        FROM customer),
      dirty AS (
        SELECT c_custkey AS d_custkey,
          substr(c_name, 1, CAST(c_custkey % 10 + 2 AS INT))
            || substr(c_name, CAST(c_custkey % 10 + 4 AS INT)) AS d_name,
          c_nationkey AS d_nationkey,
          CASE WHEN c_custkey % 7 = 0 THEN 'MOVED' ELSE c_mktsegment END AS d_seg,
          CAST(c_acctbal AS DECIMAL(12,2)) + CAST(0.07 AS DECIMAL(12,2)) AS d_bal
        FROM customer),
      cand AS (
        SELECT DISTINCT c.c_custkey, d.d_custkey FROM clean c JOIN dirty d
          ON c.c_nationkey = d.d_nationkey
         AND CAST(FLOOR(c.bal / 100) AS BIGINT) = CAST(FLOOR(d.d_bal / 100) AS BIGINT)
        UNION
        SELECT DISTINCT c.c_custkey, d.d_custkey FROM clean c JOIN dirty d
          ON c.c_nationkey = d.d_nationkey
         AND CAST(FLOOR((c.bal + 50) / 100) AS BIGINT) = CAST(FLOOR((d.d_bal + 50) / 100) AS BIGINT)),
      scored AS (
        SELECT c.c_custkey, d.d_custkey,
          levenshtein(c.c_name, d.d_name) <= 2 AS name_agree,
          c.c_mktsegment = d.d_seg AS seg_agree,
          abs(c.bal - d.d_bal) < CAST(1 AS DECIMAL(12,2)) AS bal_agree
        FROM cand x
        JOIN clean c ON c.c_custkey = x.c_custkey
        JOIN dirty d ON d.d_custkey = x.d_custkey)
      SELECT c_custkey, d_custkey, name_agree, seg_agree, bal_agree,
        CAST(CASE WHEN name_agree THEN 24 ELSE -8 END
           + CASE WHEN seg_agree THEN 11 ELSE -3 END
           + CASE WHEN bal_agree THEN 15 ELSE -12 END AS BIGINT) AS score,
        CASE WHEN (CASE WHEN name_agree THEN 24 ELSE -8 END
                 + CASE WHEN seg_agree THEN 11 ELSE -3 END
                 + CASE WHEN bal_agree THEN 15 ELSE -12 END) >= 35 THEN 'match'
             ELSE 'possible' END AS link_class
      FROM scored
      WHERE (CASE WHEN name_agree THEN 24 ELSE -8 END
           + CASE WHEN seg_agree THEN 11 ELSE -3 END
           + CASE WHEN bal_agree THEN 15 ELSE -12 END) >= 10
      ORDER BY c_custkey, d_custkey""")) { (s, dir) =>
    val cust = Tables.load(s, dir, "customer")
    val clean = cust.select(col("c_custkey"), col("c_name"),
      col("c_nationkey"), col("c_mktsegment"),
      col("c_acctbal").cast("decimal(12,2)").as("bal"))
    val dirty = cust.select(
      col("c_custkey").as("d_custkey"),
      expr("substring(c_name, 1, CAST(c_custkey % 10 + 2 AS INT)) || " +
        "substring(c_name, CAST(c_custkey % 10 + 4 AS INT))").as("d_name"),
      col("c_nationkey").as("d_nationkey"),
      when(col("c_custkey") % 7 === 0, lit("MOVED"))
        .otherwise(col("c_mktsegment")).as("d_seg"),
      (col("c_acctbal").cast("decimal(12,2)") +
        lit("0.07").cast("decimal(12,2)")).as("d_bal"))
    def block(shift: Int): DataFrame = {
      val c = clean.withColumn("bk",
        floor((col("bal") + lit(shift)) / 100).cast("long"))
      val d = dirty.withColumn("bk",
        floor((col("d_bal") + lit(shift)) / 100).cast("long"))
      c.join(d, col("c_nationkey") === col("d_nationkey") &&
          c("bk") === d("bk"))
        .select(col("c_custkey"), col("d_custkey"))
    }
    val cand = block(0).unionByName(block(50)).distinct()
    val scored = cand
      .join(clean, Seq("c_custkey"))
      .join(dirty, Seq("d_custkey"))
      .withColumn("name_agree", levenshtein(col("c_name"), col("d_name")) <= 2)
      .withColumn("seg_agree", col("c_mktsegment") === col("d_seg"))
      .withColumn("bal_agree",
        abs(col("bal") - col("d_bal")) < lit("1").cast("decimal(12,2)"))
      .withColumn("score",
        (when(col("name_agree"), 24).otherwise(-8) +
          when(col("seg_agree"), 11).otherwise(-3) +
          when(col("bal_agree"), 15).otherwise(-12)).cast("long"))
    scored.filter(col("score") >= 10)
      .select(col("c_custkey"), col("d_custkey"), col("name_agree"),
        col("seg_agree"), col("bal_agree"), col("score"),
        when(col("score") >= 35, "match").otherwise("possible")
          .as("link_class"))
      .orderBy(col("c_custkey"), col("d_custkey"))
  }

  /** Jaro–Winkler fuzzy-name scoring over the record-linkage blocked
    * candidates (same two-pass shifted-bucket blocking and dirty twin
    * as [[ddRecordLinkage]]): the graded string comparator that
    * replaces that query's binary levenshtein<=2 gate with the
    * similarity record linkage actually ranks on. The scorer is the
    * native codegen'd [[graft.functions.JaroWinkler]] expression; the
    * oracle scores the identical pairs with DuckDB's OWN
    * jaro_winkler_similarity — two independent implementations of the
    * Winkler 1990 definition agreeing to 6dp on every pair is the
    * strongest correctness check a string metric can get. Scale shape:
    * blocking bounds candidates by construction; scoring is a row-local
    * projection inside whole-stage codegen. */
  val ddJaroLinkage: Spec = Spec(
    "dd_jaro_linkage",
    oracle = Some("""
      WITH clean AS (
        SELECT c_custkey, c_name, c_nationkey,
               CAST(c_acctbal AS DECIMAL(12,2)) AS bal
        FROM customer),
      dirty AS (
        SELECT c_custkey AS d_custkey,
          substr(c_name, 1, CAST(c_custkey % 10 + 2 AS INT))
            || substr(c_name, CAST(c_custkey % 10 + 4 AS INT)) AS d_name,
          c_nationkey AS d_nationkey,
          CAST(c_acctbal AS DECIMAL(12,2)) + CAST(0.07 AS DECIMAL(12,2)) AS d_bal
        FROM customer),
      cand AS (
        SELECT DISTINCT c.c_custkey, d.d_custkey FROM clean c JOIN dirty d
          ON c.c_nationkey = d.d_nationkey
         AND CAST(FLOOR(c.bal / 100) AS BIGINT) = CAST(FLOOR(d.d_bal / 100) AS BIGINT)
        UNION
        SELECT DISTINCT c.c_custkey, d.d_custkey FROM clean c JOIN dirty d
          ON c.c_nationkey = d.d_nationkey
         AND CAST(FLOOR((c.bal + 50) / 100) AS BIGINT) = CAST(FLOOR((d.d_bal + 50) / 100) AS BIGINT)),
      scored AS (
        SELECT c.c_custkey, d.d_custkey,
          round(jaro_winkler_similarity(c.c_name, d.d_name), 6) AS jw
        FROM cand x
        JOIN clean c ON c.c_custkey = x.c_custkey
        JOIN dirty d ON d.d_custkey = x.d_custkey)
      SELECT c_custkey, d_custkey, jw,
        CASE WHEN jw >= 0.95 THEN 'exact' ELSE 'strong' END AS link_class
      FROM scored WHERE jw >= 0.85
      ORDER BY c_custkey, d_custkey""")) { (s, dir) =>
    val cust = Tables.load(s, dir, "customer")
    val clean = cust.select(col("c_custkey"), col("c_name"),
      col("c_nationkey"),
      col("c_acctbal").cast("decimal(12,2)").as("bal"))
    val dirty = cust.select(
      col("c_custkey").as("d_custkey"),
      expr("substring(c_name, 1, CAST(c_custkey % 10 + 2 AS INT)) || " +
        "substring(c_name, CAST(c_custkey % 10 + 4 AS INT))").as("d_name"),
      col("c_nationkey").as("d_nationkey"),
      (col("c_acctbal").cast("decimal(12,2)") +
        lit("0.07").cast("decimal(12,2)")).as("d_bal"))
    def block(shift: Int): DataFrame = {
      val c = clean.withColumn("bk",
        floor((col("bal") + lit(shift)) / 100).cast("long"))
      val d = dirty.withColumn("bk",
        floor((col("d_bal") + lit(shift)) / 100).cast("long"))
      c.join(d, col("c_nationkey") === col("d_nationkey") &&
          c("bk") === d("bk"))
        .select(col("c_custkey"), col("d_custkey"))
    }
    val cand = block(0).unionByName(block(50)).distinct()
    cand
      .join(clean.select(col("c_custkey"), col("c_name")), Seq("c_custkey"))
      .join(dirty.select(col("d_custkey"), col("d_name")), Seq("d_custkey"))
      .withColumn("jw", round(
        graft.functions.GraftFunctions.jaroWinkler(col("c_name"), col("d_name")), 6))
      .filter(col("jw") >= 0.85)
      .select(col("c_custkey"), col("d_custkey"), col("jw"),
        when(col("jw") >= 0.95, "exact").otherwise("strong").as("link_class"))
      .orderBy(col("c_custkey"), col("d_custkey"))
  }

  val specs: Seq[Spec] = Seq(
    ddRecordLinkage, ddJaroLinkage,
    ddMethodAgreement, ddThresholdSweep, ddMinhashEstimate, ddLshPlanner,
    ddBandPlan,
    ddMinhashPairs, ddMinhashBlocked, ddMinhashClusters, ddMinhashIncremental,
    ddCcIncremental, ddPairDiffSpans,
    ddJaccardBlockPairs, ddWeightedJaccard, ddBbitMinhash, ddIcwsMinhash,
    ddLshRecall, ddLshPrecision, ddExactHash,
    ddExactIncremental, ddBloomIncremental,
    ddCappedStarPairs,
    ddSimhashMd5, ddSimhashMd5Pairs, ddEditVerified,
    ddDecontaminate, ddDecontaminateSpans,
    ddDupSpans,
    ddDupSpanRemoval, ddClusterRepresentatives, ddDedupReport,
    ddCrossSourceOverlap, ddWinnowPairs, ddWinnowClusters, ddNoveltyScores,
    ddSnmPairs, ddSnmMultipass, ddCdcChunks, ddDedupFunnel, ddClusterCohesion,
    ddContainmentPairs)
}
