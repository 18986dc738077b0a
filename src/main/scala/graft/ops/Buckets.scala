package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Shared bucket-local candidate-pair generation — the one scaffold
  * behind every LSH/blocking path (MinHash bands, prefix-filter token
  * buckets, SimHash bands, hyperplane bands). Keeping it in one place
  * means the star-pair cap semantics cannot drift between callers.
  */
object Buckets {

  private val allPairs = expr(
    """flatten(transform(ids,
      |  x -> transform(filter(ids, y -> y > x),
      |       y -> named_struct('id_a', x, 'id_b', y))))""".stripMargin)

  private val starPairs = expr(
    """transform(filter(ids, x -> x != array_min(ids)),
      |  x -> named_struct('id_a', array_min(ids), 'id_b', x))""".stripMargin)

  /** Distinct ordered candidate pairs (id_a < id_b) generated INSIDE
    * each bucket (groupBy bucketCols → in-bucket pair expansion) — the
    * only shuffles are the bucket group-by and the pair dedup; nothing
    * recomputes per join side and nothing reaches the driver.
    *
    * @param maxBucket when set, buckets above the cap emit O(n) star
    *   CANDIDATES to the bucket-min id instead of O(n²) pairs. That
    *   keeps recall for members similar to the bucket minimum; cross
    *   pairs below-threshold vs the minimum can be missed after exact
    *   verification — a documented recall/cost trade for degenerate
    *   buckets, strictly better than dropping them outright. */
  def pairs(df: DataFrame, bucketCols: Seq[String], idCol: String,
      maxBucket: Option[Int] = None): DataFrame = {
    val gen = maxBucket match {
      case Some(cap) =>
        when(size(col("ids")) <= cap, allPairs).otherwise(starPairs)
      case None => allPairs
    }
    df.groupBy(bucketCols.map(col): _*)
      .agg(collect_list(col(idCol)).as("ids"))
      .filter(size(col("ids")) > 1)
      .select(explode(gen).as("p"))
      .select(col("p.id_a"), col("p.id_b"))
      .distinct()
  }
}
