package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact-substring duplicate-SPAN detection (the ExactSubstr family of
  * Lee et al. 2022, "Deduplicating Training Data Makes Language Models
  * Better": a token n-gram that recurs across documents marks a span of
  * memorizable duplicated text; overlapping duplicated n-grams merge
  * into maximal spans that a trainer would cut, rather than dropping
  * whole documents).
  *
  * Spark-first shape (the paper's suffix array is a single-machine
  * structure; the distributed equivalent is n-gram blocking):
  *   1. explode each doc into (doc, pos, md5(gram)) — the md5 keys the
  *      shuffle with fixed-width 32-byte strings instead of raw n-gram
  *      text, so the gram exchange width is bounded no matter how long
  *      tokens are;
  *   2. hash-aggregate DISTINCT doc counts per gram key (map-side
  *      partial agg) and keep grams seen in ≥ minDocs docs;
  *   3. join positions back on the gram key (shuffle hash join on the
  *      same key as step 2 — AQE reuses the exchange);
  *   4. merge overlapping/adjacent positions per doc into maximal spans
  *      with one per-doc window (island numbering: a gap > n tokens
  *      starts a new span). The window partitions by doc id, so no
  *      single reducer ever sees more than one document's hits.
  *
  * Nothing is collected; every stage is a hash exchange on either the
  * gram key or the doc id. Oracled end-to-end in `dd_dup_spans`.
  */
object SubstrDedup {

  /** Fused positional gram-md5 keys (one tight loop, gram strings never
    * materialize as column data — see
    * [[graft.functions.WordGramHashes]]). */
  private[graft] def gramHashes(toks: org.apache.spark.sql.Column, n: Int) =
    org.apache.spark.sql.graft.bridge.column(
      graft.functions.WordGramHashes(
        org.apache.spark.sql.graft.bridge.expression(toks), n))

  /** Maximal duplicated-token spans per document.
    *
    * @param df      input frame
    * @param idCol   long document id column name
    * @param toksCol array<string> token column name
    * @param n       n-gram width in tokens
    * @param minDocs a gram must occur in at least this many DISTINCT
    *                documents to count as duplicated
    * @return (idCol, span_start, span_end, n_dup_grams) — token spans
    *         [span_start, span_end) in 0-based token positions. */
  def dupSpans(df: DataFrame, idCol: String, toksCol: String,
      n: Int, minDocs: Long): DataFrame = {
    val grams = df
      .select(col(idCol),
        posexplode(gramHashes(col(toksCol), n)).as(Seq("pos", "_gh")))
    // minDocs == 2 (the standard cross-doc rule) only needs "more than
    // one distinct doc", which min != max answers in ONE exchange with
    // full map-side partial aggregation — where count(DISTINCT doc)
    // plans a (gram, doc) pre-shuffle plus a second gram exchange,
    // i.e. the whole gram stream shuffled twice. The general path
    // keeps the exact distinct count.
    val dup =
      if (minDocs == 2)
        grams.groupBy(col("_gh"))
          .agg(min(col(idCol)).as("_mn"), max(col(idCol)).as("_mx"))
          .filter(col("_mn") =!= col("_mx"))
          .select(col("_gh"))
      else
        grams.groupBy(col("_gh"))
          .agg(countDistinct(col(idCol)).as("_nd"))
          .filter(col("_nd") >= minDocs)
          .select(col("_gh"))
    islands(grams.join(dup, Seq("_gh")), idCol, n)
  }

  /** Merge gram-hit positions into maximal spans: hits ≤ n apart fuse
    * (their [pos, pos+n) windows overlap or touch), islands become
    * [min, max+n) spans. One window per doc — per-doc hit counts are
    * bounded by doc length, so no reducer hot-spots. */
  private def islands(hits: DataFrame, idCol: String, n: Int): DataFrame = {
    val w = Window.partitionBy(col(idCol)).orderBy(col("pos"))
    hits
      .withColumn("_brk",
        when(col("pos") - lag(col("pos"), 1).over(w) <= n, 0).otherwise(1))
      .withColumn("_isl", sum(col("_brk")).over(w))
      .groupBy(col(idCol), col("_isl"))
      .agg(
        min(col("pos")).cast("long").as("span_start"),
        (max(col("pos")) + n).cast("long").as("span_end"),
        count(lit(1)).as("n_dup_grams"))
      .drop("_isl")
  }

  /** ExactSubstr-CUT: rebuild each document with every duplicated span
    * removed (the acting twin of [[dupSpans]]). Deviation from Lee et
    * al., documented: the reference cut keeps ONE occurrence corpus-
    * wide; span-level ownership is ill-defined once islands differ
    * across docs, so this removes the span from EVERY doc — the same
    * everywhere-rule as [[Boilerplate.removeRepeatedLines]], and the
    * right call for template chrome.
    *
    * Shape: spans (already per-doc, few) anti-join the exploded tokens
    * on (id, pos ∈ [start, end)) — an equi-join on the id with a range
    * residual, never a cartesian — then one per-doc hash agg reassembles
    * survivors in position order. Docs whose every token is covered
    * survive as empty text (md5('')), never dropped rows.
    *
    * @return (idCol, cleaned_md5, kept_tokens, removed_tokens). */
  def removeDupSpans(df: DataFrame, idCol: String, toksCol: String,
      n: Int, minDocs: Long): DataFrame =
    removeSpans(df, idCol, toksCol, dupSpans(df, idCol, toksCol, n, minDocs))

  /** Rebuild each document with the given token spans cut out —
    * [[removeDupSpans]]'s reassembly, reusable for any span source
    * (duplicate spans, contamination spans). */
  def removeSpans(df: DataFrame, idCol: String, toksCol: String,
      spansDf: DataFrame): DataFrame = {
    val spans = spansDf.as("sp")
    val toks = df
      .select(col(idCol), posexplode(col(toksCol)).as(Seq("tpos", "tk")))
      .as("t")
    val keptAgg = toks
      .join(spans,
        col(s"t.$idCol") === col(s"sp.$idCol") &&
          col("t.tpos") >= col("sp.span_start") &&
          col("t.tpos") < col("sp.span_end"),
        "left_anti")
      .groupBy(col(idCol))
      .agg(
        md5(array_join(
          transform(array_sort(collect_list(struct(col("tpos"), col("tk")))),
            x => x.getField("tk")),
          " ")).as("_md5"),
        count(lit(1)).as("_kept"))
    df.select(col(idCol), size(col(toksCol)).cast("long").as("_total"))
      .join(keptAgg, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("_md5"), lit(md5Empty)).as("cleaned_md5"),
        coalesce(col("_kept"), lit(0L)).as("kept_tokens"),
        (col("_total") - coalesce(col("_kept"), lit(0L))).as("removed_tokens"))
  }

  /** md5("") — the cleaned hash of a fully-duplicated document. */
  private val md5Empty = "d41d8cd98f00b204e9800998ecf8427e"

  /** Contamination spans: maximal token spans covered by n-grams
    * present in `benchGrams` (a one-column `_gh` frame of md5 gram
    * keys from an eval/benchmark set). Same island merge as
    * [[dupSpans]], but the hit test is a BROADCAST semi-join — eval
    * suites are small by construction, so the corpus side never
    * shuffles to find its hits (contrast dupSpans, whose duplicate
    * detection inherently needs one gram exchange). */
  def contaminationSpans(df: DataFrame, idCol: String, toksCol: String,
      n: Int, benchGrams: DataFrame): DataFrame = {
    val grams = df
      .select(col(idCol),
        posexplode(gramHashes(col(toksCol), n)).as(Seq("pos", "_gh")))
    islands(grams.join(broadcast(benchGrams), Seq("_gh"), "left_semi"),
      idCol, n)
  }

  /** Decontamination-CUT: surgical span removal of benchmark-
    * overlapping passages (the upgrade of doc-level drop
    * decontamination — a 10k-token document citing one benchmark
    * sentence loses the sentence, not the document). */
  def removeContaminationSpans(df: DataFrame, idCol: String,
      toksCol: String, n: Int, benchGrams: DataFrame): DataFrame =
    removeSpans(df, idCol, toksCol,
      contaminationSpans(df, idCol, toksCol, n, benchGrams))

  /** Intra-document repetition fraction (the Gopher dup-ngram-fraction
    * family, Rae et al. 2021 §A1.1): share of a document's tokens
    * covered by n-grams occurring MORE THAN ONCE within that same
    * document. Repetition is detected with one window over
    * (doc, gram-key) — both high-cardinality, so no reducer hot-spots —
    * and coverage reuses the island merge (union of [pos, pos+n)
    * without exploding n rows per hit).
    *
    * @return (idCol, n_tok, covered_tokens, dup_frac) for every input
    *         row; dup-free docs report 0.0. */
  def intraDupFraction(df: DataFrame, idCol: String, toksCol: String,
      n: Int): DataFrame = {
    val grams = df
      .select(col(idCol),
        posexplode(gramHashes(col(toksCol), n)).as(Seq("pos", "_gh")))
    val wCnt = Window.partitionBy(col(idCol), col("_gh"))
    val wDoc = Window.partitionBy(col(idCol)).orderBy(col("pos"))
    val covered = grams
      .withColumn("_cnt", count(lit(1)).over(wCnt))
      .filter(col("_cnt") > 1)
      .withColumn("_brk",
        when(col("pos") - lag(col("pos"), 1).over(wDoc) <= n, 0).otherwise(1))
      .withColumn("_isl", sum(col("_brk")).over(wDoc))
      .groupBy(col(idCol), col("_isl"))
      .agg((max(col("pos")) + n - min(col("pos"))).as("_len"))
      .groupBy(col(idCol))
      .agg(sum(col("_len")).cast("long").as("covered_tokens"))
    df.select(col(idCol), size(col(toksCol)).cast("long").as("n_tok"))
      .join(covered, Seq(idCol), "left")
      .select(col(idCol), col("n_tok"),
        coalesce(col("covered_tokens"), lit(0L)).as("covered_tokens"),
        round(coalesce(col("covered_tokens"), lit(0L)).cast("double") /
          col("n_tok"), 6).as("dup_frac"))
  }
}
