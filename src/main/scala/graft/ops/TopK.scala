package graft.ops

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed top-k aggregator (the UDAF surface, SURVEY §2.13): keeps the k
  * best (score desc, id asc) candidates per group with map-side partial
  * aggregation — each partition contributes at most k entries to the
  * shuffle, vs a window row_number sorting every scored row through one
  * exchange. Tie-break is total (score, then id), so results are
  * deterministic and identical to the windowed form.
  */
object TopK {

  type Entry = (Double, Long) // (score, id)

  /** Insert into a descending-sorted buffer capped at k. */
  private[ops] def insert(buf: List[Entry], e: Entry, k: Int): List[Entry] = {
    def beats(a: Entry, b: Entry): Boolean =
      a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)
    val (before, after) = buf.span(beats(_, e))
    val merged = before ::: e :: after
    if (merged.length > k) merged.take(k) else merged
  }

  def aggregator(k: Int): Aggregator[Entry, List[Entry], Seq[Entry]] =
    new Aggregator[Entry, List[Entry], Seq[Entry]] {
      def zero: List[Entry] = Nil
      def reduce(b: List[Entry], e: Entry): List[Entry] = insert(b, e, k)
      def merge(a: List[Entry], b: List[Entry]): List[Entry] =
        b.foldLeft(a)((acc, e) => insert(acc, e, k))
      def finish(r: List[Entry]): Seq[Entry] = r
      def bufferEncoder: Encoder[List[Entry]] = ExpressionEncoder[List[Entry]]()
      def outputEncoder: Encoder[Seq[Entry]] = ExpressionEncoder[Seq[Entry]]()
    }
}
