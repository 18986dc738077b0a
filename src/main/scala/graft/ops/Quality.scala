package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Statistical quality scoring over a token column (the CCNet idea with
  * the corpus itself as the language model). Hash-stable by
  * construction: per-token log10 probabilities are rounded to 6dp and
  * summed as DECIMAL, so the per-doc aggregate is independent of
  * aggregation order — the property that lets a DuckDB oracle hash-match
  * a 32-way parallel Spark run.
  *
  * Scale shape: the vocabulary is a hash aggregation on the token and
  * scoring is a hash join on the same key — the vocab is JOINED, never
  * broadcast (a 100 TB corpus vocabulary does not fit one executor);
  * the doc roll-up re-shuffles on the id. Three exchanges, all keyed,
  * no driver state.
  */
object Quality {

  /** Per-document mean unigram log-probability under the corpus' own
    * unigram distribution. Rare-token noise scores low (more negative),
    * templated/repetitive text scores high.
    *
    * @param df      input frame
    * @param idCol   document id column name
    * @param toksCol array<string> token column name
    * @return (idCol, n_tok, avg_logprob) — avg_logprob FLOOR-truncated
    *         to 6dp: the per-doc average is an exact rational
    *         S/(n·10⁶) that lands EXACTLY on a rounding half-boundary
    *         with probability ~1/n per doc, where engines' round()
    *         implementations disagree (the round-9 sf0.001 gate hit
    *         one). floor over the identical IEEE quotient is
    *         boundary-free and bit-identical across engines — the
    *         eKmeansCentroids precedent. */
  def unigramLmScores(df: DataFrame, idCol: String, toksCol: String): DataFrame = {
    val tok = df.select(col(idCol), explode(col(toksCol)).as("_w"))
    val vocab = tok.groupBy(col("_w")).agg(count(lit(1)).as("_c"))
    val tot = vocab.agg(sum(col("_c")).cast("long").as("_total"))
    tok.join(vocab, "_w")
      .crossJoin(broadcast(tot))
      .withColumn("_lp",
        round(log10(col("_c").cast("double") / col("_total").cast("double")), 6)
          .cast("decimal(18,6)"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tok"),
        (floor(sum(col("_lp")).cast("double") / count(lit(1)) * 1000000)
          .cast("double") / 1000000).as("avg_logprob"))
  }
}
