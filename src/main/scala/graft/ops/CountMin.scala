package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-min sketch (Cormode & Muthukrishnan '05): a d×w counter matrix
  * where cell (i, h_i(x)) accumulates every occurrence of x, and
  * est(x) = min_i counter(i, h_i(x)) — always ≥ the true count, with
  * overshoot ≤ εN at probability 1−δ for w = ⌈e/ε⌉, d = ⌈ln(1/δ)⌉.
  *
  * Scale design (100 TB): the sketch IS a grouped count —
  * `groupBy(row, bucket).count` — so Spark's map-side partial
  * aggregation is exactly the sketch's merge operation: each task
  * builds its local d×w matrix and the shuffle carries at most d·w
  * rows per partition REGARDLESS of corpus size (d·w = 512 here vs the
  * full vocabulary a naive exact count shuffles). Estimation joins the
  * probe set against the ≤ d·w-row counter table (broadcast), so
  * queries never rescan the corpus. Hashing is the repo-standard
  * replayable md5-48 ([[Sampling.hash48]]), row-salted so the d rows
  * are independent — the whole sketch is a pure function of the token
  * multiset and the SQL oracle replays it bit-for-bit.
  *
  * Unlike [[HeavyHitters]] (Misra–Gries: which tokens are frequent)
  * the CMS answers point frequency queries for ANY token, and unlike
  * [[graft.queries.TrainingPrep]]'s KMV (how many distinct) it bounds
  * per-item counts — the three sketches cover the classic streaming
  * triad with one mergeable-aggregation design.
  */
object CountMin {

  /** Row-salted bucket of `tok` for hash row `row`: md5-48 of
    * "row:tok" mod w. */
  def bucket(row: Column, tok: Column, w: Int): Column =
    Sampling.hash48(concat(row.cast("string"), lit(":"), tok)) % w

  /** The d×w counter matrix of the token column: (row, bucket, cnt),
    * ≤ d·w rows total. One pass; map-side combine is the merge. */
  def sketch(toks: DataFrame, tokCol: String, d: Int, w: Int): DataFrame = {
    val rows = explode(array((0 until d).map(lit(_)): _*)).as("row")
    toks.select(col(tokCol).as("tok"), rows)
      .select(col("row"), bucket(col("row"), col("tok"), w).as("bucket"))
      .groupBy("row", "bucket")
      .agg(count(lit(1)).as("cnt"))
  }

  /** Point-frequency estimates for `probes` (any frame with `tokCol`):
    * min over the d row counters, 0 for a never-seen token (empty
    * bucket). The counter table is broadcast — probing is shuffle-free
    * past the probe set's own ≤ d-fan-out. */
  def estimate(counters: DataFrame, probes: DataFrame, tokCol: String,
      d: Int, w: Int): DataFrame = {
    val rows = explode(array((0 until d).map(lit(_)): _*)).as("row")
    probes.select(col(tokCol).as("tok"), rows)
      .withColumn("bucket", bucket(col("row"), col("tok"), w))
      .join(broadcast(counters), Seq("row", "bucket"), "left")
      .groupBy("tok")
      .agg(min(coalesce(col("cnt"), lit(0L))).as("cms_est"))
  }
}
