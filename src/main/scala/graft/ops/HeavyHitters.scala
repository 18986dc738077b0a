package graft.ops

import org.apache.spark.sql.{DataFrame, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Heavy hitters via a mergeable Misra–Gries summary + exact recount —
  * the textbook two-pass shape for "which tokens exceed 1/k of the
  * corpus" at firehose scale:
  *
  *  1. ONE pass builds a k-counter Misra–Gries summary per partition
  *     (the typed Aggregator below; partial aggregation merges
  *     summaries map-side, so the shuffle carries ≤ k entries per
  *     partition no matter the vocabulary size);
  *  2. the candidate set (≤ k tokens, guaranteed to contain EVERY item
  *     with frequency > n/k — the MG invariant survives merging) is
  *     broadcast back and only candidate occurrences are re-counted
  *     exactly.
  *
  * The output is therefore EXACT — "all tokens with count > n/k, with
  * their true counts" — which is why a plain SQL oracle can state it
  * (d_heavy_hitters), while the plan never materializes a full
  * vocabulary aggregation.
  */
object HeavyHitters {

  /** Misra–Gries reduce: insert with collective decrement when full. */
  private[graft] def mgInsert(m: Map[String, Long], x: String, k: Int)
      : Map[String, Long] =
    if (m.contains(x)) m.updated(x, m(x) + 1L)
    else if (m.size < k) m.updated(x, 1L)
    else {
      // decrement all; drop zeros (the classic k-counter step)
      m.flatMap { case (t, c) => if (c > 1L) Some(t -> (c - 1L)) else None }
    }

  /** Mergeable MG combine (Agarwal et al. 2012): sum counts, then
    * subtract the (k+1)-th largest and drop non-positive — the result
    * is again a valid k-counter summary with additive error bounds. */
  private[graft] def mgMerge(a: Map[String, Long], b: Map[String, Long], k: Int)
      : Map[String, Long] = {
    val sum = (a.keySet ++ b.keySet).iterator
      .map(t => t -> (a.getOrElse(t, 0L) + b.getOrElse(t, 0L))).toMap
    if (sum.size <= k) sum
    else {
      val kth = sum.values.toSeq.sorted(Ordering[Long].reverse)(k)
      sum.flatMap { case (t, c) =>
        if (c - kth > 0L) Some(t -> (c - kth)) else None
      }
    }
  }

  def aggregator(k: Int): Aggregator[String, Map[String, Long], Seq[String]] =
    new Aggregator[String, Map[String, Long], Seq[String]] {
      def zero: Map[String, Long] = Map.empty
      def reduce(m: Map[String, Long], x: String): Map[String, Long] =
        mgInsert(m, x, k)
      def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] =
        mgMerge(a, b, k)
      def finish(m: Map[String, Long]): Seq[String] = m.keys.toSeq.sorted
      def bufferEncoder: Encoder[Map[String, Long]] =
        ExpressionEncoder[Map[String, Long]]()
      def outputEncoder: Encoder[Seq[String]] = ExpressionEncoder[Seq[String]]()
    }

  /** Exact tokens-above-n/k: MG candidates (pass 1) → broadcast
    * semi-join → exact recount (pass 2) → true threshold filter.
    *
    * @param df     frame with a string token column
    * @param tokCol token column name
    * @param k      threshold denominator: report tokens with
    *               count > total/k (candidate summary also uses k
    *               counters, which is what makes the recall guarantee
    *               hold). */
  def exactOverThreshold(df: DataFrame, tokCol: String, k: Int): DataFrame = {
    val s = df.sparkSession
    import s.implicits._
    val toks = df.select(col(tokCol).as("tok")).as[String]
    val candidates = toks
      .groupByKey(_ => 0)
      .agg(aggregator(k).toColumn)
      .flatMap(_._2)
      .toDF("tok")
    val total = df.select(count(lit(1)).as("total"))
    df.select(col(tokCol).as("tok"))
      .join(broadcast(candidates), Seq("tok"), "left_semi")
      .groupBy($"tok")
      .agg(count(lit(1)).as("n"))
      .crossJoin(broadcast(total))
      .filter($"n" * k > $"total")
      .select($"tok", $"n", $"total")
  }
}
