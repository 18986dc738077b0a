package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-level boilerplate line removal (the C4/RefinedWeb rule family:
  * a line that recurs across many documents — "subscribe to our
  * newsletter", cookie banners, copyright footers — is template chrome,
  * not content, and is removed from EVERY document).
  *
  * Scale design: explode to (doc, pos, line), count DISTINCT docs per
  * line with a hash aggregation keyed by the line (partial aggregation
  * map-side; the only shuffles are the line-key exchange, the anti-join
  * back, and the per-doc reassembly). The boilerplate set is never
  * collected or broadcast by assumption — it is joined, so a corpus
  * where half the lines are template chrome still works.
  */
object Boilerplate {

  /** Remove lines occurring in ≥ `minDocs` DISTINCT documents.
    *
    * @param df      (idCol: long, textCol: string) — text with `sep`
    *                joined lines.
    * @param minDocs lines in at least this many distinct docs are
    *                dropped from all docs.
    * @return (idCol, cleaned: string, n_removed: long) — `cleaned`
    *         keeps original line order; counts are per-document
    *         occurrences of removed lines. */
  def removeRepeatedLines(df: DataFrame, idCol: String, textCol: String,
      minDocs: Long, sep: String = "\n"): DataFrame = {
    val lines = df
      .select(col(idCol), posexplode(split(col(textCol), sep)).as(Seq("pos", "line")))
    val boiler = lines
      .groupBy(col("line"))
      .agg(countDistinct(col(idCol)).as("_nd"))
      .filter(col("_nd") >= minDocs)
      .select(col("line"), lit(1).as("_b"))
    lines
      .join(boiler, Seq("line"), "left")
      .groupBy(col(idCol))
      .agg(
        array_join(
          transform(
            array_sort(collect_list(
              when(col("_b").isNull, struct(col("pos"), col("line"))))),
            x => x.getField("line")),
          sep).as("cleaned"),
        sum(when(col("_b").isNotNull, 1L).otherwise(0L)).as("n_removed"))
  }

  /** Density-based main-content extraction — the jusText algorithm
    * (Pomikálek 2011, the public algorithm behind trafilatura's
    * stage-1 boilerplate scoring; reference role:
    * setu/text_extraction.py:556 trafilatura.extract), re-expressed as
    * one explode + one per-document window + one reassembly agg.
    *
    * Per block (split on block-level tags, script/style/comments
    * dropped first): link density = anchor-text chars / total chars,
    * stopword density = stopword tokens / tokens. Context-free class:
    *  - link_density > maxLinkDensity            → bad
    *  - len < lengthLow  → bad if any link text, else short
    *  - stop_density ≥ stopHigh → good if len > lengthHigh else neargood
    *  - stop_density ≥ stopLow                    → neargood
    *  - otherwise                                 → bad
    * Context pass (documented simplification of jusText's
    * neighborhood rules, edges count as bad): `neargood` becomes good
    * iff EITHER nearest decided (good/bad) neighbor is good; `short`
    * becomes good iff BOTH are. jusText's headline special-case is
    * deliberately out of contract.
    *
    * Scale shape: everything is per-row expressions except one window
    * PARTITIONED BY the document id (a document's block count bounds
    * the partition, never the corpus) and the final per-doc hash agg —
    * no joins, no driver state; stopword membership is a per-token
    * array probe against the broadcast-literal lexicon.
    *
    * @return (idCol, extracted: string — kept blocks joined by \n in
    *         document order, n_blocks: long — nonempty blocks,
    *         n_kept: long) */
  def densityExtract(df: DataFrame, idCol: String, htmlCol: String,
      stopwords: Seq[String], maxLinkDensity: Double = 0.2,
      lengthLow: Int = 70, lengthHigh: Int = 200,
      stopLow: Double = 0.30, stopHigh: Double = 0.32): DataFrame = {
    val stopLit = typedLit(stopwords.map(_.toLowerCase))
    // strip inline tags, decode entities (&amp; last so it can't
    // re-form), collapse whitespace — same chain as Text.extractHtmlText
    def clean(c: Column): Column = {
      val untagged = regexp_replace(c, Text.HtmlTagPattern, " ")
      val decoded = Seq(
        "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"", "&#39;" -> "'",
        "&nbsp;" -> " ", "&amp;" -> "&")
        .foldLeft(untagged) { case (col, (e, ch)) => regexp_replace(col, e, ch) }
      trim(regexp_replace(decoded, "\\s+", " "))
    }
    val dropped = Text.HtmlDropPatterns
      .foldLeft(col(htmlCol))((c, p) => regexp_replace(c, p, ""))
    val blocks = df
      .select(col(idCol),
        posexplode(split(dropped, Text.HtmlBlockPattern, -1)).as(Seq("pos", "raw")))
      .withColumn("btext", clean(col("raw")))
      .filter(length(col("btext")) > 0)
    val linkLen = aggregate(
      transform(
        regexp_extract_all(col("raw"), lit("(?is)<a[^>]*>(.*?)</a>"), lit(1)),
        frag => length(clean(frag)).cast("long")),
      lit(0L), (acc, x) => acc + x)
    val toks = split(lower(col("btext")), " ", -1)
    val scored = blocks
      .withColumn("blen", length(col("btext")).cast("long"))
      .withColumn("link_len", linkLen)
      .withColumn("n_tok", size(toks).cast("long"))
      .withColumn("n_stop",
        size(filter(toks, t => array_contains(stopLit, t))).cast("long"))
      .withColumn("cf",
        when(col("link_len").cast("double") / col("blen") > maxLinkDensity, "bad")
          .when(col("blen") < lengthLow,
            when(col("link_len") > 0, "bad").otherwise("short"))
          .when(col("n_stop").cast("double") / col("n_tok") >= stopHigh,
            when(col("blen") > lengthHigh, "good").otherwise("neargood"))
          .when(col("n_stop").cast("double") / col("n_tok") >= stopLow, "neargood")
          .otherwise("bad"))
    val wPrev = Window.partitionBy(col(idCol)).orderBy(col("pos"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wNext = Window.partitionBy(col(idCol)).orderBy(col("pos"))
      .rowsBetween(1, Window.unboundedFollowing)
    val decidedGood =
      when(col("cf").isin("good", "bad"), col("cf") === "good")
    val resolved = scored
      .withColumn("prev_good", coalesce(last(decidedGood, ignoreNulls = true)
        .over(wPrev), lit(false)))
      .withColumn("next_good", coalesce(first(decidedGood, ignoreNulls = true)
        .over(wNext), lit(false)))
      .withColumn("keep",
        when(col("cf") === "good", true)
          .when(col("cf") === "bad", false)
          .when(col("cf") === "neargood", col("prev_good") || col("next_good"))
          .otherwise(col("prev_good") && col("next_good")))
    resolved
      .groupBy(col(idCol))
      .agg(
        array_join(
          transform(
            array_sort(collect_list(
              when(col("keep"), struct(col("pos"), col("btext"))))),
            x => x.getField("btext")),
          "\n").as("extracted"),
        count(lit(1)).as("n_blocks"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"))
  }
}
