package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic corpus sampling — every sample is a pure function of
  * the ids (a replayable 48-bit md5-derived hash order), so reruns,
  * audits, and downstream trainers all see the same subset.
  *
  * 48 bits because the hash must be exact BOTH as a Double (the TopK
  * aggregator's score type) and as a 64-bit integer (the SQL oracle's
  * BIGINT) — 2^48 < 2^53.
  */
object Sampling {

  /** The replayable per-id hash: first 12 hex chars of md5(id). */
  def hash48(idCol: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    conv(substring(md5(idCol.cast("string")), 1, 12), 16, 10).cast("long")

  /** Exact per-stratum quota sample: the k smallest-hash ids per
    * stratum, via the typed [[TopK]] aggregator — map-side partial
    * top-k ships ≤ k rows per partition per stratum to the shuffle,
    * where `row_number() OVER (PARTITION BY stratum ORDER BY hash)`
    * sorts EVERY row of a stratum through one reducer.
    *
    * @param df       input frame
    * @param strataCol string stratum column name (e.g. lang)
    * @param idCol     long id column name
    * @param k         exact quota per stratum
    * @return (strataCol, sample_rank, idCol, h48) — rank 1..k in
    *         (h48, id) order. */
  def stratifiedByHash(df: DataFrame, strataCol: String, idCol: String,
      k: Int): DataFrame = {
    val s = df.sparkSession
    import s.implicits._
    df.select(col(strataCol), hash48(col(idCol)).as("h48"), col(idCol))
      .as[(String, Long, Long)]
      .groupByKey(_._1)
      .mapValues(t => (-t._2.toDouble, t._3)) // smallest hash = best score
      .agg(TopK.aggregator(k).toColumn)
      .flatMap { case (stratum, hits) =>
        hits.iterator.zipWithIndex.map { case ((negH, id), i) =>
          (stratum, (i + 1).toLong, id, (-negH).toLong)
        }
      }
      .toDF(strataCol, "sample_rank", idCol, "h48")
  }

  /** Mixture/temperature sampling: cap each stratum at a token budget,
    * taking rows in hash order until the budget line; a row is kept if
    * it STARTS under the budget (defined overshoot, never undershoot).
    * Running totals via [[Skew.prefixSumByKey]] — no single-reducer
    * per-stratum window.
    *
    * @return input columns + h48 + cum_tokens, budget-filtered. */
  def tokenBudgetByHash(df: DataFrame, strataCol: String, idCol: String,
      tokCol: String, budget: Long): DataFrame = {
    val withHash = df.withColumn("h48", hash48(col(idCol)))
    Skew.prefixSumByKey(withHash, strataCol,
        Seq(col("h48"), col(idCol)), col(tokCol), "cum_tokens")
      .filter(col("cum_tokens") - col(tokCol) < budget)
  }
}
