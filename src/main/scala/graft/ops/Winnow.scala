package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Winnowing fingerprint selection (Schleimer, Wilkerson & Aiken '03 —
  * the MOSS local-fingerprinting algorithm; ref analogue: setu's
  * whole-doc content hashes, which winnowing upgrades to substring-
  * robust signatures).
  *
  * From the token k-gram hash sequence, every window of `w` consecutive
  * hashes contributes its MINIMUM, ties to the rightmost position — the
  * self-synchronizing rule that makes selection depend only on local
  * content. Guarantee: two documents sharing ≥ w+k−1 consecutive tokens
  * share a selected fingerprint; expected density is 2/(w+1) of grams.
  *
  * Scale shape: selection is entirely row-local — gram hashing runs
  * through the fused [[graft.functions.WordGramHashes]] (gram strings
  * never materialize) and the window minimum is an array fold inside
  * one codegen'd projection. No shuffle, no state; downstream ops
  * explode only the ~2/(w+1)-density selected set.
  */
object Winnow {

  /** Selected fingerprints as an array of (h, nj) structs: `h` is the
    * 48-bit gram hash (exact in BIGINT and DOUBLE, oracle-parsable from
    * md5 hex), `nj` the NEGATED gram position (callers decode
    * pos = −nj). Fused into one tight-loop expression
    * ([[graft.functions.WinnowFingerprints]]) — gram strings, hash
    * arrays, and per-window struct arrays never materialize as column
    * data; semantics are exactly the HOF composition
    * `array_distinct(transform(sequence, i → array_min(struct(h, −j))))`
    * it replaced (equality pinned in PropertiesSpec). */
  def selection(toks: Column, k: Int, w: Int): Column =
    org.apache.spark.sql.graft.bridge.column(
      graft.functions.WinnowFingerprints(
        org.apache.spark.sql.graft.bridge.expression(toks), k, w))

  /** The pre-fusion HOF composition, kept as the semantic
    * specification that PropertiesSpec pins the fused expression
    * against. */
  private[graft] def selectionHof(toks: Column, k: Int, w: Int): Column = {
    val hashes = transform(SubstrDedup.gramHashes(toks, k),
      g => conv(substring(g, 1, 12), 16, 10).cast("long"))
    val ng = size(hashes)
    array_distinct(transform(sequence(lit(0), ng - w), i =>
      array_min(transform(sequence(i, i + w - 1), j =>
        struct(element_at(hashes, j + 1).as("h"), (-j).as("nj"))))))
  }
}
