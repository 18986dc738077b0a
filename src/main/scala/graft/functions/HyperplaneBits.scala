package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Random-hyperplane signature bits as one tight loop (the LSH hot
  * path for embedding dedup at corpus scale). Bit b = 1 iff the
  * SEQUENTIAL left fold of Σ_d vec[d]·signs(b)(d) is positive —
  * exactly the HOF form `aggregate(zip_with(vec, signs_b, *), 0.0, +)`
  * and the oracle's `list_reduce`, so results are bit-identical while
  * evaluating ~nBits×dim interpreted lambdas per row become one Java
  * loop. Signs are the md5-derived ±1 matrix (Vectors.hyperplaneSigns).
  */
case class HyperplaneBits(child: Expression, signs: Seq[Seq[Double]])
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  // getFloat below reads 4-byte slots: a double array child would yield
  // silent garbage, so reject anything but array<float> up front.
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_hyperplane_bits expects array<float>, got $other")
    }

  @transient private lazy val matrix: Array[Array[Double]] =
    signs.map(_.toArray).toArray

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  /** Shared by eval and codegen (see [[FloatDot.compute]]: a
    * plan-reference call keeps the LSH banding scan inside whole-stage
    * codegen). */
  def compute(vec: ArrayData): ArrayData = {
    val dim = vec.numElements()
    require(matrix.isEmpty || dim == matrix(0).length,
      s"vector dim $dim != hyperplane dim ${matrix(0).length} — " +
        "a truncated signature would be silently wrong")
    val v = new Array[Double](dim)
    var d = 0
    while (d < dim) { v(d) = vec.getFloat(d).toDouble; d += 1 }
    val out = new Array[Any](matrix.length)
    var b = 0
    while (b < matrix.length) {
      val row = matrix(b)
      var acc = 0.0d
      d = 0
      // sequential fold, same order as the HOF/oracle form
      while (d < dim) { acc += v(d) * row(d); d += 1 }
      out(b) = if (acc > 0) 1 else 0
      b += 1
    }
    new GenericArrayData(out)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("hyperplaneBits", this,
      classOf[HyperplaneBits].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "graft_hyperplane_bits"
}
