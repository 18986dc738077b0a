package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.expr

/** 64-bit SimHash over a token array (Charikar '02), built entirely from
  * codegen'd built-ins: per bit b, fold the tokens adding +1/-1 by bit b
  * of xxhash64(token); bit set iff the score is positive. Token
  * multiplicity weights naturally (the fold visits every token).
  *
  * Near-duplicate detection = small Hamming distance between hashes;
  * pair generation at scale buckets on rotated prefixes rather than
  * all-pairs.
  */
object SimHash {

  /** @param toksCol SQL expression for an array<string> column. */
  def simhash64(toksCol: String): Column = expr(
    s"""aggregate(sequence(0, 63), 0L, (acc, b) ->
       |  acc + if(
       |    aggregate($toksCol, 0L,
       |      (a, t) -> a + if(getbit(xxhash64(t), b) = 1, 1L, -1L)) > 0,
       |    shiftleft(1L, b), 0L))""".stripMargin)

  /** Hamming distance between two simhash longs. */
  def hamming(a: String, b: String): Column =
    expr(s"bit_count($a ^ $b)")
}
