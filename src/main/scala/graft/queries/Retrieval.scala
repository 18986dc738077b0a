package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.{Text, TopK}

/** BM25 ranked retrieval over the documents corpus — the lexical half
  * of a retrieval/dedup stack (the dense half is `queries/Similarity`).
  * Okapi BM25 (Robertson & Walker '94; the k1/b form every open
  * implementation uses — Lucene's BM25Similarity, Trino's ML functions):
  *
  *   score(d, q) = Σ_{t∈q} idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl))
  *   idf(t)      = log10((N − df + 0.5)/(df + 0.5) + 1)
  *
  * (log10 rather than ln so the oracle shares the engine-parity-proven
  * log path of [[graft.ops.Quality.unigramLmScores]]; a constant factor
  * never changes ranking.)
  *
  * Scale design (100 TB): ONE explode feeds the tf aggregation
  * (keyed by (doc,term), map-side combined), and every other statistic
  * derives from tf without touching tokens again: dl = Σ tf per doc,
  * df = row count per term (tf is already distinct per (doc,term), so
  * no count-distinct shuffle), N/Σdl one more agg over dl. The corpus
  * is scanned once; the query-term table rides a broadcast so scoring
  * adds no shuffle beyond tf's own; corpus scalars (N, Σdl) are a
  * 1-row broadcast crossJoin. Per-query top-k runs on the typed
  * [[TopK]] aggregator — each partition ships ≤k candidates per query,
  * never a single-partition global window, so a query over a billion
  * scored docs still shuffles only k·partitions rows. Query-term
  * selection (top terms by df) is `orderBy().limit()` =
  * TakeOrderedAndProject, a distributed top-k, not a full vocab sort.
  *
  * Determinism: per-term scores are rounded to 6dp and summed as
  * DECIMAL(18,6) (order-independent), matching the repo-wide rule;
  * tie-break on doc_id makes the ranking total.
  */
object Retrieval {

  private val K1 = 1.2
  private val B = 0.75
  private val TopDocs = 10
  private val QueryTerms = 6 // split into 2 queries of 3 terms

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")

  /** Per-(doc, term) BM25 partial score, 6dp-rounded decimal. The
    * arithmetic mirrors the oracle token for token — every op is a
    * correctly-rounded IEEE double op, so both engines produce the same
    * bits before the round. */
  private def partialScore(tf: Column, df: Column, dl: Column,
      nDocs: Column, sumDl: Column): Column = {
    val avgdl = sumDl / nDocs
    val idf = log10((nDocs - df + lit(0.5)) / (df + lit(0.5)) + lit(1.0))
    val tfn = tf * lit(K1 + 1) / (tf + lit(K1) * (lit(1 - B) + lit(B) * (dl / avgdl)))
    round(idf * tfn, 6).cast("decimal(18,6)")
  }

  /** The oracle's index-and-score pipeline through the per-(query, doc)
    * score aggregation — shared by the top-k, indexed, and
    * hard-negative oracles so the three restate ONE scoring model. */
  private val bmCte = s"""
      WITH tok AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
      tf AS (
        SELECT doc_id, term, CAST(count(*) AS DOUBLE) AS tf
        FROM tok GROUP BY doc_id, term),
      lens AS (
        SELECT doc_id, CAST(count(*) AS DOUBLE) AS dl FROM tok GROUP BY doc_id),
      stats AS (
        SELECT CAST(count(*) AS DOUBLE) AS n_docs, SUM(dl) AS sum_dl FROM lens),
      dfreq AS (
        SELECT term, CAST(count(DISTINCT doc_id) AS DOUBLE) AS df
        FROM tok GROUP BY term),
      qt AS (
        SELECT term, df, row_number() OVER (ORDER BY df DESC, term) AS rk
        FROM dfreq ORDER BY df DESC, term LIMIT $QueryTerms),
      q AS (SELECT CAST((rk - 1) // 3 AS BIGINT) AS query_id, term, df FROM qt),
      scored AS (
        SELECT q.query_id, tf.doc_id,
          CAST(round(
            log10((s.n_docs - q.df + 0.5) / (q.df + 0.5) + 1.0)
              * (tf.tf * ${K1 + 1} / (tf.tf + $K1 * (${1 - B} + $B * (l.dl / (s.sum_dl / s.n_docs))))),
            6) AS DECIMAL(18,6)) AS part
        FROM tf JOIN q ON tf.term = q.term
        JOIN lens l ON tf.doc_id = l.doc_id
        CROSS JOIN stats s),
      agg AS (
        SELECT query_id, doc_id, CAST(SUM(part) AS DOUBLE) AS score
        FROM scored GROUP BY query_id, doc_id)"""

  /** BM25 top-10 docs for 2 corpus-derived 3-term queries (query terms
    * = the 6 highest-df terms, df desc / term asc, routed round-robin
    * free: query_id = (rank−1) div 3). */
  val dBm25TopK: Spec = Spec(
    "d_bm25_topk",
    bench = true,
    oracle = Some(s"""$bmCte
      SELECT query_id,
        CAST(row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id) AS BIGINT) AS rk,
        doc_id, score
      FROM agg
      QUALIFY rk <= $TopDocs
      ORDER BY query_id, rk""")) { (s, dir) =>
    val (tf, lens, dfreq, stats) = inPlanIndex(s, dir)
    scoreIndex(s, tf, lens, dfreq, stats)
  }

  /** The in-plan (non-materialized) index frames behind [[dBm25TopK]]
    * and [[dBm25Negatives]]: one explode feeds tf, which feeds
    * everything else. */
  private def inPlanIndex(s: SparkSession, dir: String)
      : (DataFrame, DataFrame, DataFrame, DataFrame) = {
    import s.implicits._
    val tf = docs(s, dir)
      .select($"doc_id", explode(Text.tokens($"text")).as("term"))
      .groupBy($"doc_id", $"term")
      .agg(count(lit(1)).cast("double").as("tf"))
      .localCheckpoint() // tf feeds lens, dfreq AND scoring: one explode
    val lens = tf.groupBy($"doc_id").agg(sum($"tf").as("dl"))
    val stats = lens.agg(count(lit(1)).cast("double").as("n_docs"),
      sum($"dl").as("sum_dl"))
    val dfreq = tf.groupBy($"term")
      .agg(count(lit(1)).cast("double").as("df"))
    (tf, lens, dfreq, stats)
  }

  /** The query-time half of BM25 over index frames (tf, dl, df, corpus
    * stats) — shared verbatim by [[dBm25TopK]] (index built in-plan)
    * and [[dBm25Indexed]] (index read back from parquet), so the two
    * cannot drift. */
  /** The 2×3-term corpus-derived query frame (query_id, term, df) —
    * shared by the direct/indexed scorers and the RM3 expansion. */
  private def queryFrame(s: SparkSession, dfreq: DataFrame): DataFrame = {
    import s.implicits._
    // TakeOrderedAndProject (distributed top-k), then rank the 6 rows
    // WITHOUT a window: a literal partition key gets constant-folded to
    // an empty partition spec, so WindowExec still warned — instead the
    // bounded frame collapses to one array (collect_list + sort_array on
    // (-df, term) = the row_number order) and posexplode emits the rank.
    val top = dfreq.orderBy($"df".desc, $"term").limit(QueryTerms)
    top
      .agg(sort_array(collect_list(
        struct((-$"df").as("negdf"), $"term", $"df"))).as("ts"))
      .select(posexplode($"ts").as(Seq("i", "t")))
      .select(expr("CAST(i div 3 AS LONG)").as("query_id"),
        $"t.term".as("term"), $"t.df".as("df"))
  }

  private[graft] def scoreIndex(s: SparkSession, tf: DataFrame,
      lens: DataFrame, dfreq: DataFrame, stats: DataFrame,
      topN: Int = TopDocs): DataFrame = {
    import s.implicits._
    val queries = queryFrame(s, dfreq)
    val scored = tf
      .join(broadcast(queries), "term")
      .join(lens, "doc_id")
      .crossJoin(broadcast(stats))
      .select($"query_id", $"doc_id",
        partialScore($"tf", $"df", $"dl", $"n_docs", $"sum_dl").as("part"))
    val agg = scored.groupBy($"query_id", $"doc_id")
      .agg(sum($"part").cast("double").as("score"))
    rankTopK(s, agg, topN)
  }

  /** Distributed per-query top-k ranking of a (query_id, doc_id, score)
    * frame via the typed [[TopK]] aggregator — map-side partials, never
    * a per-query window sort. */
  private def rankTopK(s: SparkSession, agg: DataFrame, topN: Int): DataFrame = {
    import s.implicits._
    agg.select(col("query_id"), col("score"), col("doc_id"))
      .as[(Long, Double, Long)]
      .groupByKey(_._1)
      .mapValues(t => (t._2, t._3))
      .agg(TopK.aggregator(topN).toColumn)
      .flatMap { case (qid, hits) =>
        hits.iterator.zipWithIndex.map { case ((score, did), i) =>
          (qid, (i + 1).toLong, did, score)
        }
      }
      .toDF("query_id", "rk", "doc_id", "score")
      .orderBy(col("query_id"), col("rk"))
  }

  /** Build the BM25 index ON DISK: tf / dl / df / corpus-stats parquet
    * tables under `indexDir`. At 100 TB this runs ONCE (the only pass
    * over raw text); every later query reads the index — the same
    * state-store economics as the incremental-dedup LSH state. */
  def buildIndex(s: SparkSession, dir: String, indexDir: String,
      docsOverride: Option[DataFrame] = None): Unit = {
    import s.implicits._
    val tf = docsOverride.getOrElse(docs(s, dir))
      .select($"doc_id", explode(Text.tokens($"text")).as("term"))
      .groupBy($"doc_id", $"term")
      .agg(count(lit(1)).cast("double").as("tf"))
      .localCheckpoint()
    tf.write.mode("overwrite").parquet(s"$indexDir/tf")
    tf.groupBy($"doc_id").agg(sum($"tf").as("dl"))
      .write.mode("overwrite").parquet(s"$indexDir/dl")
    tf.groupBy($"term").agg(count(lit(1)).cast("double").as("df"))
      .write.mode("overwrite").parquet(s"$indexDir/df")
    s.read.parquet(s"$indexDir/dl")
      .agg(count(lit(1)).cast("double").as("n_docs"), sum($"dl").as("sum_dl"))
      .write.mode("overwrite").parquet(s"$indexDir/stats")
  }

  /** [[dBm25TopK]] answered from the MATERIALIZED index: build the
    * parquet index, then score reading ONLY index tables — the
    * query-time plan never touches `documents` (no tokenize, no
    * explode; asserted in PlanSpec). Shares the oracle verbatim: same
    * statistics, same scoring, same ranking. */
  val dBm25Indexed: Spec = Spec(
    "d_bm25_indexed",
    oracle = dBm25TopK.oracle) { (s, dir) =>
    val indexDir = graft.ops.Scratch.dir("graft_bm25_idx")
    buildIndex(s, dir, indexDir)
    scoreIndex(s,
      s.read.parquet(s"$indexDir/tf"),
      s.read.parquet(s"$indexDir/dl"),
      s.read.parquet(s"$indexDir/df"),
      s.read.parquet(s"$indexDir/stats"))
  }

  /** Hard-negative mining for retrieval training sets (the DPR /
    * sentence-transformers recipe: negatives = a lexical retriever's
    * top candidates minus the labeled positives): BM25 top-20 per
    * query, anti-joined against the positives table, first 5 survivors
    * in rank order become the training negatives. Positives here are a
    * deterministic pseudo-qrels (doc_id mod 2 = query_id) standing in
    * for the labeled pairs a real run supplies — the operator shape
    * (candidate top-k → LEFT ANTI on (query, doc) → re-rank) is the
    * deliverable. Scale: candidates are ≤ k rows per query out of the
    * TopK aggregator, the anti-join keys on (query_id, doc_id), and
    * the re-rank window orders ≤ k rows per query — per-query-bounded
    * everywhere, so a million-query mining run shuffles O(queries·k),
    * never corpus-sized. */
  val dBm25Negatives: Spec = Spec(
    "d_bm25_negatives",
    oracle = Some(s"""$bmCte,
      ranked AS (
        SELECT query_id, doc_id, score,
          row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id) AS rk
        FROM agg),
      cand AS (SELECT * FROM ranked WHERE rk <= 20),
      neg AS (
        SELECT query_id, doc_id, score,
          row_number() OVER (PARTITION BY query_id ORDER BY rk) AS neg_rank
        FROM cand
        WHERE NOT (doc_id % 2 = query_id))
      SELECT query_id, CAST(neg_rank AS BIGINT) AS neg_rank, doc_id, score
      FROM neg WHERE neg_rank <= 5
      ORDER BY query_id, neg_rank""")) { (s, dir) =>
    import s.implicits._
    val (tf, lens, dfreq, stats) = inPlanIndex(s, dir)
    val cand = scoreIndex(s, tf, lens, dfreq, stats, topN = 20)
    val positives = cand // pseudo-qrels; a real run passes its labels
      .filter($"doc_id" % 2 === $"query_id")
      .select($"query_id", $"doc_id")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"query_id").orderBy($"rk")
    cand.join(positives, Seq("query_id", "doc_id"), "left_anti")
      .withColumn("neg_rank", row_number().over(w).cast("long"))
      .filter($"neg_rank" <= 5)
      .select($"query_id", $"neg_rank", $"doc_id", $"score")
      .orderBy($"query_id", $"neg_rank")
  }

  /** Weighted per-(doc, term) BM25 partial: `(idf·tfn)·w` rounded once
    * at 6dp — the expansion-term discount hook for [[dBm25Rm3]]. */
  private def partialScoreW(tf: Column, df: Column, dl: Column,
      nDocs: Column, sumDl: Column, w: Column): Column = {
    val avgdl = sumDl / nDocs
    val idf = log10((nDocs - df + lit(0.5)) / (df + lit(0.5)) + lit(1.0))
    val tfn = tf * lit(K1 + 1) / (tf + lit(K1) * (lit(1 - B) + lit(B) * (dl / avgdl)))
    round(idf * tfn * w, 6).cast("decimal(18,6)")
  }

  /** RM3-style PSEUDO-RELEVANCE FEEDBACK: run the base BM25 queries,
    * take each query's top-10 as assumed-relevant, mine the 3 terms
    * that best characterize them — feedback weight fbw(t) =
    * Σ_d (tf(d,t)/dl(d))·score(d) over the feedback docs, the RM1
    * relevance-model estimate — and re-score with the expanded query
    * (original terms weight 1.0, expansion terms 0.5, the RM3
    * interpolation as a per-term discount). The classic recall fix for
    * vocabulary mismatch: documents using the topic's OTHER words now
    * match. Exactness: fbw sums are 9dp-rounded DECIMAL, weighted
    * partials 6dp-rounded DECIMAL, rank ties on doc_id.
    *
    * Scale shape: the feedback loop touches only the top-10 frame and
    * its 10-doc vocabularies (per-query bounded by construction — the
    * fbr window partitions by query over that bounded set); expansion
    * re-scoring is the SAME broadcast-terms + tf-join plan as the base
    * query, now with 12 terms instead of 6. Two passes over tf, zero
    * extra passes over raw text. */
  val dBm25Rm3: Spec = Spec(
    "d_bm25_rm3",
    oracle = Some(s"""$bmCte,
      r0 AS (
        SELECT query_id, doc_id, score,
          row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id) AS rk
        FROM agg),
      fb AS (SELECT query_id, doc_id, score FROM r0 WHERE rk <= $TopDocs),
      fbw AS (
        SELECT fb.query_id, tf.term,
          CAST(SUM(CAST(round(tf.tf / l.dl * fb.score, 9) AS DECIMAL(28,12)))
            AS DOUBLE) AS w
        FROM fb JOIN tf ON tf.doc_id = fb.doc_id
        JOIN lens l ON l.doc_id = fb.doc_id
        WHERE NOT EXISTS (SELECT 1 FROM q
          WHERE q.query_id = fb.query_id AND q.term = tf.term)
        GROUP BY fb.query_id, tf.term),
      fbr AS (
        SELECT query_id, term, w,
          row_number() OVER (PARTITION BY query_id ORDER BY w DESC, term) AS rk
        FROM fbw),
      expq AS (
        SELECT query_id, term, df, 1.0 AS wq FROM q
        UNION ALL
        SELECT f.query_id, f.term, d.df, 0.5 AS wq
        FROM fbr f JOIN dfreq d ON d.term = f.term WHERE f.rk <= 3),
      scored2 AS (
        SELECT e.query_id, tf.doc_id,
          CAST(round(
            log10((s.n_docs - e.df + 0.5) / (e.df + 0.5) + 1.0)
              * (tf.tf * ${K1 + 1} / (tf.tf + $K1 * (${1 - B} + $B * (l.dl / (s.sum_dl / s.n_docs)))))
              * e.wq,
            6) AS DECIMAL(18,6)) AS part
        FROM tf JOIN expq e ON tf.term = e.term
        JOIN lens l ON tf.doc_id = l.doc_id
        CROSS JOIN stats s),
      agg2 AS (
        SELECT query_id, doc_id, CAST(SUM(part) AS DOUBLE) AS score
        FROM scored2 GROUP BY query_id, doc_id)
      SELECT query_id,
        CAST(row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id) AS BIGINT) AS rk,
        doc_id, score
      FROM agg2
      QUALIFY rk <= $TopDocs
      ORDER BY query_id, rk""")) { (s, dir) =>
    import s.implicits._
    val (tf, lens, dfreq, stats) = inPlanIndex(s, dir)
    val queries = queryFrame(s, dfreq)
    val fb = scoreIndex(s, tf, lens, dfreq, stats)
      .select($"query_id", $"doc_id", $"score")
    val fbw = fb
      .join(tf, "doc_id")
      .join(lens, "doc_id")
      .join(queries.select($"query_id", $"term"), Seq("query_id", "term"),
        "left_anti")
      .groupBy($"query_id", $"term")
      .agg(sum(round($"tf" / $"dl" * $"score", 9).cast("decimal(28,12)"))
        .cast("double").as("w"))
    val wFb = Window.partitionBy($"query_id").orderBy($"w".desc, $"term")
    val fbTerms = fbw
      .withColumn("rk", row_number().over(wFb))
      .filter($"rk" <= 3)
      .join(dfreq, "term")
      .select($"query_id", $"term", $"df", lit(0.5).as("wq"))
    val expq = queries.select($"query_id", $"term", $"df", lit(1.0).as("wq"))
      .unionByName(fbTerms)
    val scored2 = tf
      .join(broadcast(expq), "term")
      .join(lens, "doc_id")
      .crossJoin(broadcast(stats))
      .select($"query_id", $"doc_id",
        partialScoreW($"tf", $"df", $"dl", $"n_docs", $"sum_dl", $"wq")
          .as("part"))
    val agg2 = scored2.groupBy($"query_id", $"doc_id")
      .agg(sum($"part").cast("double").as("score"))
    rankTopK(s, agg2, TopDocs)
  }

  /** Retrieval EVALUATION harness: MRR and nDCG@10 of the BM25 ranking
    * against graded pseudo-qrels derived from the corpus itself —
    * grade(d) = how many of the query's 3 terms d contains, relevant =
    * all three. Every retrieval pipeline needs this loop (swap in real
    * qrels and the metrics are production eval); deriving the labels
    * keeps the whole thing oracle-replayable. DCG terms round to 9dp
    * and sum as DECIMAL; log2 / pow are engine-identical on the small
    * integer inputs; 6dp outputs.
    *
    * Scale trick: IDCG@10 needs only the MULTISET of the ten best
    * grades, which follows arithmetically from the per-grade COUNTS —
    * rank r's ideal grade is a CASE over (n3, n2, n1) prefix sums — so
    * no per-query ranking window ever touches the (corpus-scale)
    * relevant set; grading is one broadcast-terms join + count-distinct
    * on 3 values. */
  val dRetrievalEval: Spec = Spec(
    "d_retrieval_eval",
    oracle = Some(s"""$bmCte,
      grades AS (
        SELECT q.query_id, tf.doc_id,
          CAST(COUNT(DISTINCT tf.term) AS BIGINT) AS grade
        FROM tf JOIN q ON q.term = tf.term GROUP BY 1, 2),
      cnt AS (SELECT query_id,
          SUM(CASE WHEN grade = 3 THEN 1 ELSE 0 END) AS n3,
          SUM(CASE WHEN grade = 2 THEN 1 ELSE 0 END) AS n2,
          SUM(CASE WHEN grade = 1 THEN 1 ELSE 0 END) AS n1
        FROM grades GROUP BY 1),
      r0 AS (
        SELECT query_id, doc_id,
          row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id) AS rk
        FROM agg),
      hits AS (
        SELECT t.query_id, t.rk, COALESCE(g.grade, 0) AS grade
        FROM (SELECT * FROM r0 WHERE rk <= $TopDocs) t
        LEFT JOIN grades g ON g.query_id = t.query_id AND g.doc_id = t.doc_id),
      dcg AS (
        SELECT query_id,
          CAST(SUM(CAST(round((pow(2, grade) - 1) / log2(rk + 1), 9)
            AS DECIMAL(28,12))) AS DOUBLE) AS dcg,
          round(COALESCE(1.0 / MIN(CASE WHEN grade = 3 THEN rk END), 0), 6) AS mrr
        FROM hits GROUP BY 1),
      ranksq AS (SELECT query_id, unnest(range(1, ${TopDocs + 1})) AS r,
          n3, n2, n1 FROM cnt),
      idcg AS (
        SELECT query_id,
          CAST(SUM(CAST(round((pow(2,
              CASE WHEN r <= n3 THEN 3 WHEN r <= n3 + n2 THEN 2
                   WHEN r <= n3 + n2 + n1 THEN 1 ELSE 0 END) - 1) / log2(r + 1), 9)
            AS DECIMAL(28,12))) AS DOUBLE) AS idcg
        FROM ranksq GROUP BY 1)
      SELECT d.query_id, CAST(c.n3 AS BIGINT) AS n_relevant, d.mrr,
        round(d.dcg / i.idcg, 6) AS ndcg10
      FROM dcg d JOIN idcg i ON i.query_id = d.query_id
      JOIN cnt c ON c.query_id = d.query_id
      ORDER BY d.query_id""")) { (s, dir) =>
    import s.implicits._
    val (tf, lens, dfreq, stats) = inPlanIndex(s, dir)
    val queries = queryFrame(s, dfreq)
    val grades = tf.join(broadcast(queries.select($"query_id", $"term")), "term")
      .groupBy($"query_id", $"doc_id")
      .agg(countDistinct($"term").as("grade"))
    val cnt = grades.groupBy($"query_id")
      .agg(sum(when($"grade" === 3, 1L).otherwise(0L)).as("n3"),
        sum(when($"grade" === 2, 1L).otherwise(0L)).as("n2"),
        sum(when($"grade" === 1, 1L).otherwise(0L)).as("n1"))
    val top10 = scoreIndex(s, tf, lens, dfreq, stats)
      .select($"query_id", $"rk", $"doc_id")
    val hits = top10
      .join(grades, Seq("query_id", "doc_id"), "left")
      .select($"query_id", $"rk", coalesce($"grade", lit(0L)).as("grade"))
    val dcg = hits.groupBy($"query_id")
      .agg(
        sum(round((pow(lit(2.0), $"grade") - 1) / log2($"rk" + 1), 9)
          .cast("decimal(28,12)")).cast("double").as("dcg"),
        round(coalesce(lit(1.0) / min(when($"grade" === 3, $"rk")), lit(0.0)), 6)
          .as("mrr"))
    val idealGrade =
      when($"r" <= $"n3", 3).when($"r" <= $"n3" + $"n2", 2)
        .when($"r" <= $"n3" + $"n2" + $"n1", 1).otherwise(0)
    val idcg = cnt
      .select($"query_id", $"n3", $"n2", $"n1",
        explode(sequence(lit(1L), lit(TopDocs.toLong))).as("r"))
      .groupBy($"query_id")
      .agg(sum(round((pow(lit(2.0), idealGrade) - 1) / log2($"r" + 1), 9)
        .cast("decimal(28,12)")).cast("double").as("idcg"))
    dcg.join(idcg, "query_id").join(cnt, "query_id")
      .select($"query_id", $"n3".as("n_relevant"), $"mrr",
        round($"dcg" / $"idcg", 6).as("ndcg10"))
      .orderBy($"query_id")
  }

  val specs: Seq[Spec] = Seq(dBm25TopK, dBm25Indexed, dBm25Negatives, dBm25Rm3,
    dRetrievalEval)
}
