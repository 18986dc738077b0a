package graft.ops

import org.apache.spark.sql.DataFrame
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
}
