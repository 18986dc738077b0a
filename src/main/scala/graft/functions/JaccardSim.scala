package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Jaccard similarity of two pre-distinct string arrays — the dedup
  * verify hot path (every LSH/blocked candidate pair evaluates it).
  * Semantics identical to the HOF form
  * `size(array_intersect(a,b)) / (size(a)+size(b)-size(array_intersect))`
  * with distinct inputs (union from RAW sizes, 0.0 when both empty),
  * but one hash-set pass instead of materializing the intersection
  * array twice. Duplicate b-side elements count once (set.remove), so
  * the distinct-intersection semantics hold even on unnormalized
  * input. The value is an exact integer ratio — same IEEE division as
  * the HOF form and the DuckDB oracles. */
case class JaccardSim(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(
          s"graft_jaccard expects two array<string> inputs, got $other")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val na = x.numElements()
    val nb = y.numElements()
    val set = new java.util.HashSet[org.apache.spark.unsafe.types.UTF8String](
      na * 2, 0.75f)
    var i = 0
    while (i < na) { set.add(x.getUTF8String(i)); i += 1 }
    var inter = 0
    var j = 0
    while (j < nb) {
      if (set.remove(y.getUTF8String(j))) inter += 1
      j += 1
    }
    val union = na + nb - inter
    if (union == 0) 0.0d else inter.toDouble / union.toDouble
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "graft_jaccard"
}
