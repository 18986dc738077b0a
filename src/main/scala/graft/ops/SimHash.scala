package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
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

  /** 60-bit md5 token hashes (top 60 bits = first 15 hex chars) — the
    * same token-hash recipe as the minhash shingle hash
    * ([[graft.functions.MinHashSignature]]) and rebuildable verbatim in
    * DuckDB as `('0x' || substr(md5(t),1,15))::BIGINT`. xxhash64 stays
    * the hot path (one 64-bit mix vs a full digest); this exists so
    * SimHash semantics are hash-provable against an independent engine. */
  def md5TokenHashes(toksCol: String): Column = expr(
    s"transform($toksCol, t -> CAST(conv(substr(md5(t), 1, 15), 16, 10) AS BIGINT))")

  /** SimHash over precomputed per-token hash longs: per bit b, fold the
    * hashes adding +1/-1 by bit b; bit set iff the score is positive —
    * the same Charikar fold as [[simhash64]], factored so the token
    * hashing is computed ONCE per token, not once per (token, bit). */
  def simhashFromHashes(hsCol: String, bits: Int): Column = expr(
    s"""aggregate(sequence(0, ${bits - 1}), 0L, (acc, b) ->
       |  acc + if(
       |    aggregate($hsCol, 0L, (a, h) -> a + if(getbit(h, b) = 1, 1L, -1L)) > 0,
       |    shiftleft(1L, b), 0L))""".stripMargin)

  /** EXACT SimHash near-duplicate pairs at scale: the 64-bit hash is
    * cut into `maxHamming + 1` bands; by pigeonhole, any pair with
    * hamming ≤ maxHamming agrees on at least one whole band, so
    * bucket-local pair generation per (band, band-bits) loses NOTHING —
    * it is a candidate generator with recall 1, verified by an exact
    * bit_count filter. Cost is Σ bucket² over 16-bit-key buckets,
    * never an all-pairs join.
    *
    * Recall 1 holds while no band bucket exceeds `maxBucket`; past the
    * cap (near-dup-dense corpora put thousands of ids behind one 16-bit
    * band value) the bucket degrades to star candidates (see
    * Buckets.pairs), keeping cost linear in bucket size — the cap
    * triggering is observable via the plan metric.
    *
    * @param df (idCol: long, toksCol: array<string>) */
  def neardupPairs(df: DataFrame, idCol: String, toksCol: String,
      maxHamming: Int = 3, maxBucket: Int = 1000): DataFrame =
    neardupPairsBanded(
      df.select(col(idCol).as("id"), simhash64(toksCol).as("sh")),
      maxHamming, totalBits = 64, maxBucket = maxBucket)

  /** Pigeonhole banding over a pre-hashed (id, sh) frame — the recall-1
    * candidate generator behind [[neardupPairs]], factored out so hash
    * variants of any width (64-bit xxhash, 60-bit md5) share one
    * banding/cap path. `totalBits` must be divisible by
    * `maxHamming + 1` bands. */
  def neardupPairsBanded(hashed: DataFrame, maxHamming: Int,
      totalBits: Int, maxBucket: Int): DataFrame = {
    val bands = maxHamming + 1
    require(totalBits % bands == 0, s"bands=$bands must divide $totalBits")
    val bits = totalBits / bands
    val mask = if (bits == 64) -1L else (1L << bits) - 1
    val banded = hashed.select(col("id"),
      posexplode(expr(
        s"""transform(sequence(0, ${bands - 1}),
           |  b -> shiftrightunsigned(sh, CAST(b * $bits AS INT))
           |       & CAST($mask AS BIGINT))""".stripMargin))
        .as(Seq("band", "key")))
    val pairs = Buckets.pairs(banded, Seq("band", "key"), "id", maxBucket)
    pairs
      .join(hashed.select(col("id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
      .join(hashed.select(col("id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
      .withColumn("hamming", hamming("sh_a", "sh_b").cast("int"))
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }
}
