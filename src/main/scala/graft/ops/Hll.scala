package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HyperLogLog with EXPLICIT registers (Flajolet et al. '07, m = 256 /
  * p = 8). Unlike approx_count_distinct (whose HLL++ sketch bytes are
  * engine-internal, so q_approx_sketches can only band-check it), these
  * registers are a deterministic function of the md5 hash — the same
  * cross-engine hash the minhash/simhash/KMV families ride — so a DuckDB
  * oracle REPLAYS THE ESTIMATE EXACTLY, not just a tolerance band.
  *
  * Determinism argument for the float path (why no fixed-order fold is
  * needed): every register term 2^-rho is an exact power of two with
  * rho <= 41, and there are at most m = 256 terms, so every partial sum
  * needs at most 41+8 < 53 mantissa bits — the harmonic sum Z is EXACT in
  * IEEE double regardless of aggregation order. alpha*m^2 is one shared
  * double literal; the final division is a single IEEE op.
  *
  * Scale shape: the register build is one hash-aggregate whose shuffle
  * carries at most m rows per group regardless of input scale; registers
  * merge across shards / stream batches by elementwise MAX (associative),
  * which is the whole point — constant 256-entry state per group for
  * unbounded inputs.
  */
object Hll {

  val m = 256
  val alphaM2 = 47072.71267120224 // 0.7213 / (1 + 1.079/256) * 256^2

  /** (reg, rho) per value: register = low 8 hash bits, rho = leading-zero
    * count of the remaining 40-bit window + 1 (41 when the window is 0).
    * Bit length via the minimal-width binary string — exact and identical
    * in both engines, no log2 rounding exposure. */
  def regRho(value: Column): Column = {
    val hv = conv(substring(md5(value.cast("string")), 1, 12), 16, 10)
      .cast("long")
    struct(
      hv.bitwiseAND(lit(255L)).as("reg"),
      when(shiftright(hv, 8) === 0, lit(41L))
        .otherwise(lit(41L) - length(bin(shiftright(hv, 8)))).as("rho"))
  }

  /** Max-rho registers per group for a value column: the mergeable
    * sketch frame (groupCols..., reg, mr). */
  def registers(df: DataFrame, groupCols: Seq[String], value: Column): DataFrame =
    df.select(groupCols.map(col) :+ regRho(value).as("rr"): _*)
      .groupBy((groupCols.map(col) :+ col("rr.reg").as("reg")): _*)
      .agg(max(col("rr.rho")).as("mr"))

  /** PRODUCTION-PATH registers: same sketch, xxhash64 instead of md5.
    * The md5 form exists so a DuckDB oracle can replay the estimate;
    * xxhash64 is Spark-native codegen (no string round-trip, ~10× the
    * hash throughput — HllStress) and is what a real 100 TB run should
    * use when cross-engine replay isn't needed. Register/rho layout is
    * identical (low 8 bits index, next 40 bits leading-zero window), so
    * [[estimate]] and max-merge work unchanged; the two hash families
    * just produce different (equally valid) sketches. */
  def registersFast(df: DataFrame, groupCols: Seq[String], value: Column): DataFrame = {
    val hv = xxhash64(value).bitwiseAND(lit((1L << 48) - 1))
    val rr = struct(
      hv.bitwiseAND(lit(255L)).as("reg"),
      when(shiftright(hv, 8) === 0, lit(41L))
        .otherwise(lit(41L) - length(bin(shiftright(hv, 8)))).as("rho"))
    df.select(groupCols.map(col) :+ rr.as("rr"): _*)
      .groupBy((groupCols.map(col) :+ col("rr.reg").as("reg")): _*)
      .agg(max(col("rr.rho")).as("mr"))
  }

  /** est = alpha*m^2 / Z from a (groupCols..., reg, mr) register frame;
    * registers never observed count 2^0 = 1 each in Z. The small-range
    * linear-counting branch (est <= 2.5m with empty registers,
    * m*ln(m/zeros)) is implemented identically on both engines and
    * surfaced as used_linear; SketchesSpec pins it on a tiny corpus —
    * driver-scale data (>= 11k distinct per group) never enters it. */
  def estimate(regs: DataFrame, groupCols: Seq[String]): DataFrame = {
    val z = regs.groupBy(groupCols.map(col): _*)
      .agg(
        count(lit(1)).as("nonzero_regs"),
        sum(expr("1.0 / cast(shiftleft(1L, cast(mr as int)) as double)"))
          .as("zpart"))
      .withColumn("zeros", lit(m.toLong) - col("nonzero_regs"))
      .withColumn("z", col("zpart") + col("zeros").cast("double"))
      .withColumn("est_raw", lit(alphaM2) / col("z"))
      .withColumn("used_linear",
        col("est_raw") <= lit(2.5 * m) && col("zeros") > 0)
      .withColumn("est_distinct",
        round(when(col("used_linear"),
          lit(m.toDouble) * log(lit(m.toDouble) / col("zeros")))
          .otherwise(col("est_raw")), 4))
    z.select((groupCols.map(col) :+ col("nonzero_regs") :+ col("zeros") :+
      col("used_linear") :+ col("est_distinct")): _*)
  }

  /** Oracle CTE body: per-group max-rho registers for a value expr.
    * `grpSel` is the inner select expression (may alias), `grpBy` the
    * resulting column name the outer level groups and selects by. */
  def regSql(grpSel: String, valExpr: String, from: String,
      grpBy: String): String = s"""
      (SELECT $grpBy,
          hv & 255 AS reg,
          MAX(CASE WHEN (hv >> 8) = 0 THEN 41
              ELSE 41 - length(bin(hv >> 8)) END) AS mr
        FROM (SELECT $grpSel,
            CAST('0x' || substr(md5(CAST($valExpr AS VARCHAR)), 1, 12) AS BIGINT) AS hv
          FROM $from)
        GROUP BY $grpBy, reg)"""

  /** Oracle estimate projection over a register relation named `regs`
    * with group column `grpBy`: replays [[estimate]] exactly. */
  def estSql(grpBy: String, regsRel: String = "regs"): String = s"""
      SELECT g.$grpBy,
        CAST(256 - zeros AS BIGINT) AS nonzero_regs, CAST(zeros AS BIGINT) AS zeros,
        (est_raw <= 640.0e0 AND zeros > 0) AS used_linear,
        ROUND(CASE WHEN est_raw <= 640.0e0 AND zeros > 0
          THEN 256.0e0 * ln(256.0e0 / zeros) ELSE est_raw END, 4) AS est_distinct
      FROM (SELECT $grpBy,
          256 - COUNT(*) AS zeros,
          47072.71267120224e0 /
            (SUM(CAST(1 AS DOUBLE) / CAST(CAST(1 AS BIGINT) << CAST(mr AS INT) AS DOUBLE))
             + (256 - COUNT(*))) AS est_raw
        FROM $regsRel GROUP BY $grpBy) g"""
}
