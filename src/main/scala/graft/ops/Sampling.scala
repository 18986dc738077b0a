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

  /** TEMPERATURE (τ = 0.5) mixture sampling, the XLM-R/mT5 rebalance:
    * stratum i gets quota ∝ nᵢ^τ — low-resource strata upsampled
    * relative to their share, heads flattened. τ is FIXED at 1/2
    * because √n is IEEE-exact (pow(n, τ) for general τ is libm-
    * dependent and would put a last-ulp wobble inside an integer
    * quota); the rates are computed entirely in integers:
    * mᵢ = round(√nᵢ · 10⁶), quotaᵢ = min(nᵢ, (budget · mᵢ) div Σm).
    *
    * The sample itself is the quotaᵢ smallest-hash48 ids per stratum,
    * via the bounded [[TopK]] aggregator with k = budget (every quota
    * ≤ budget by construction) — map-side partial top-k, never a
    * per-stratum window sort; the quota frame is strata-sized and
    * broadcast.
    *
    * @return (strataCol, sample_rank, idCol, h48, n_docs,
    *         weight_micro, quota) — one row per sampled id,
    *         sample_rank 1..quota in (h48, id) order. */
  def temperatureQuotas(df: DataFrame, strataCol: String, idCol: String,
      budget: Long): DataFrame = {
    // per-stratum quota ≤ budget rows flow through the TopK aggregator,
    // whose k is an Int by construction; beyond that a quota sample is
    // the wrong tool anyway (take the whole stratum)
    require(budget > 0 && budget <= Int.MaxValue,
      s"budget=$budget must be in (0, 2^31)")
    val s = df.sparkSession
    import s.implicits._
    val counts = df.groupBy(col(strataCol))
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("m", round(sqrt(col("n_docs")) * 1000000).cast("long"))
    // global Σm via broadcast cross join, not an unpartitioned window.
    // budget·m and 10⁶·m ride DECIMAL(38,0): at n=10¹⁰ docs m≈10¹¹ and
    // a 10⁹ budget puts the product at 10²⁰ — past Long, well inside
    // decimal38 (IntegralDivide on decimals is exact and returns long).
    val quotas = counts
      .crossJoin(broadcast(counts.agg(sum(col("m")).as("m_sum"))))
      .select(col(strataCol), col("n_docs"),
        expr("(CAST(1000000 AS DECIMAL(38,0)) * m) div m_sum")
          .as("weight_micro"),
        least(col("n_docs"),
          expr(s"(CAST($budget AS DECIMAL(38,0)) * m) div m_sum"))
          .as("quota"))
    val ranked = stratifiedByHash(df, strataCol, idCol, budget.toInt)
    ranked.join(broadcast(quotas), Seq(strataCol))
      .filter(col("sample_rank") <= col("quota"))
  }
}
