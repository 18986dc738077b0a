package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Document flagging + removal (SURVEY §2.9 / J6): threshold flags as
  * pure `when` projections over a doc-stats DataFrame, and removal as a
  * conjunctive filter — single pass, no joins of aggregates.
  */
object Flagging {

  /** Flag thresholds (shape of configs/crawls/spark_*_config.json in
    * the reference, re-based for the synthetic corpus). */
  final case class Config(
      minWordCount: Int = 60,
      minMeanWordLen: Double = 3.2,
      nsfwRatio: Double = 0.04,
      nonLiRatio: Double = 0.05,
      wordRepScore: Double = 0.10)

  /** Append boolean flag columns; expects stat columns
    * words_count, mean_word_len, nsfw_ratio, non_li_ratio, word_rep_score. */
  def addFlags(stats: DataFrame, cfg: Config = Config()): DataFrame =
    stats
      .withColumn("has_less_words", col("words_count") <= cfg.minWordCount)
      .withColumn("is_short_words_heavy", col("mean_word_len") <= cfg.minMeanWordLen)
      .withColumn("is_nsfw_heavy", col("nsfw_ratio") >= cfg.nsfwRatio)
      .withColumn("is_non_li_heavy", col("non_li_ratio") >= cfg.nonLiRatio)
      .withColumn("has_word_repetition", col("word_rep_score") >= cfg.wordRepScore)

  /** Disjunction of all flags (the removed-docs predicate). */
  def anyFlag: org.apache.spark.sql.Column =
    col("has_less_words") || col("is_short_words_heavy") ||
      col("is_nsfw_heavy") || col("is_non_li_heavy") ||
      col("has_word_repetition")

  /** Survivors: docs with every flag false (reference's sequential
    * per-flag filters collapse to one conjunction). */
  def removeFlagged(flagged: DataFrame): DataFrame =
    flagged.filter(!anyFlag)
}
