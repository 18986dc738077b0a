package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** MinHash signature as a single tight-loop expression.
  *
  * Semantics are EXACTLY graft.ops.MinHash.signature's HOF form (and the
  * DuckDB oracle): perm i of shingle s = md5(i || "|" || s) hex,
  * signature element = lexicographic min. The HOF form evaluates ~32×|sh|
  * interpreted lambdas with boxed UTF8Strings per row (~100× slower);
  * here the md5s run in one Java loop over reused byte buffers — this is
  * the expression-beats-HOF case SURVEY §7 anticipated for hot scalars.
  */
case class MinHashSignature(child: Expression, numPerm: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  @transient private lazy val digest =
    java.security.MessageDigest.getInstance("MD5")
  private val hexChars = "0123456789abcdef".getBytes

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    // No shingles → no signature (null), mirroring array_min of an
    // empty array; never an array of nulls under containsNull=false.
    if (n == 0) return null
    val mins = new Array[Array[Byte]](numPerm)
    var p = 0
    while (p < numPerm) {
      val prefix = (p.toString + "|").getBytes
      var best: Array[Byte] = null
      var i = 0
      while (i < n) {
        digest.reset()
        digest.update(prefix)
        digest.update(arr.getUTF8String(i).getBytes)
        val raw = digest.digest()
        val hex = new Array[Byte](32)
        var j = 0
        while (j < 16) {
          hex(2 * j) = hexChars((raw(j) >> 4) & 0xf)
          hex(2 * j + 1) = hexChars(raw(j) & 0xf)
          j += 1
        }
        if (best == null || java.util.Arrays.compare(hex, best) < 0) best = hex
        i += 1
      }
      mins(p) = best
      p += 1
    }
    new GenericArrayData(
      mins.map(b => UTF8String.fromBytes(b): Any))
  }
  override def nullable: Boolean = true // null for empty shingle arrays
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "graft_minhash_signature"
}
