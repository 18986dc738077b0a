package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Jaro–Winkler similarity (Winkler 1990) — the fuzzy-name comparator
  * record linkage runs on pairs that survive blocking
  * ([[graft.queries.Dedup.ddRecordLinkage]]'s family). Spark ships
  * levenshtein but no Jaro–Winkler; this is the standard definition:
  * Jaro matches within a ⌊max(|a|,|b|)/2⌋−1 window, half-counted
  * transpositions, and the Winkler prefix boost ℓ·0.1·(1−jaro) for
  * ℓ = common prefix ≤ 4, applied only when jaro > 0.7. Either input
  * empty scores 0 (the convention DuckDB's jaro_winkler_similarity
  * also uses, which is what lets the oracle cross-validate this
  * implementation against an independent one). Comparison is by
  * Unicode code point.
  *
  * Codegen: plan-reference call into the JIT-compiled [[compute]],
  * keeping the surrounding pair-scoring projection inside whole-stage
  * codegen (same pattern as [[FloatDot]]). */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_jaro_winkler expects two string inputs, got $other")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    compute(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  def compute(ua: UTF8String, ub: UTF8String): Double = {
    val a = ua.toString.codePoints().toArray
    val b = ub.toString.codePoints().toArray
    val la = a.length
    val lb = b.length
    if (la == 0 || lb == 0) return 0.0
    val window = math.max(math.max(la, lb) / 2 - 1, 0)
    val aMatch = new Array[Boolean](la)
    val bMatch = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val lo = math.max(0, i - window)
      val hi = math.min(lb - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!bMatch(j) && a(i) == b(j)) {
          aMatch(i) = true; bMatch(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    // transpositions: matched chars out of relative order, halved with
    // INTEGER truncation — Winkler's original strcmp95 computes
    // `N_trans / 2` in int (an odd mismatch count floors), and DuckDB's
    // independent implementation does the same; the fractional-half
    // variant seen in some write-ups diverges on odd counts
    var t = 0
    var k = 0
    i = 0
    while (i < la) {
      if (aMatch(i)) {
        while (!bMatch(k)) k += 1
        if (a(i) != b(k)) t += 1
        k += 1
      }
      i += 1
    }
    val md = m.toDouble
    val jaro = (md / la + md / lb + (md - t / 2) / md) / 3.0
    if (jaro > 0.7) {
      var l = 0
      while (l < math.min(4, math.min(la, lb)) && a(l) == b(l)) l += 1
      jaro + l * 0.1 * (1.0 - jaro)
    } else jaro
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("jaroWinkler", this,
      classOf[JaroWinkler].getName)
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $ref.compute($a, $b);")
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "graft_jaro_winkler"
}
