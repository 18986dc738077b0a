package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Sequential-fold dot product of two float vectors in double
  * precision — the similarity hot path (every candidate pair of every
  * kNN / near-dup query evaluates it). Identical accumulation order to
  * the HOF form `aggregate(zip_with(a, b, *), 0.0, +)` and the
  * oracle's `list_reduce` (0.0 + x == x exactly), so results are
  * bit-identical; evaluation is one Java loop instead of ~2·dim boxed
  * lambda calls per pair. */
case class FloatDot(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(
          s"graft_float_dot expects two array<float> inputs, got $other")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  /** Loop body shared by eval and codegen — the generated code calls
    * this JIT-compiled method through a plan reference, so the hot
    * projection stays INSIDE whole-stage codegen (a CodegenFallback
    * here would break the whole kNN scan stage out of codegen) while
    * the loop itself runs as ordinary JVM code, not Janino-compiled
    * source. */
  def compute(x: ArrayData, y: ArrayData): Double = {
    val n = x.numElements()
    require(n == y.numElements(),
      s"vector dims differ: $n vs ${y.numElements()}")
    var acc = 0.0d
    var i = 0
    while (i < n) {
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("floatDot", this, classOf[FloatDot].getName)
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $ref.compute($a, $b);")
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "graft_float_dot"
}
