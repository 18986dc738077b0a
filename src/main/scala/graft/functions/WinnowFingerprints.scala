package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Fused winnowing selection (Schleimer '03) over a token array: one
  * tight loop computes the token k-gram 48-bit hashes (md5 first 6
  * bytes — identical to `conv(substr(md5(gram), 1, 12), 16, 10)` over
  * [[WordGramHashes]] output) and walks the w-window minima with the
  * rightmost tie rule, emitting distinct (h, nj = −pos) structs in
  * position order — the exact result of the HOF composition
  * `array_distinct(transform(sequence, i → array_min(...)))` it
  * replaces, at a fraction of the cost (neither gram strings, hash
  * arrays, nor per-window struct arrays ever materialize as column
  * data; a 16× stress run showed the HOF form ~6× slower).
  *
  * Consecutive-window dedup is complete dedup: window i only selects
  * positions ≥ i, so once a (h, pos) stops winning it can never win
  * again — equal selections are always adjacent.
  */
case class WinnowFingerprints(child: Expression, k: Int, w: Int)
    extends UnaryExpression {
  require(k >= 1 && w >= 2, s"need k>=1, w>=2; got k=$k w=$w")

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("h", LongType, nullable = false),
      StructField("nj", IntegerType, nullable = false))),
    containsNull = false)

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  /** Shared by eval and codegen (see [[FloatDot.compute]]: a
    * plan-reference call keeps the fingerprint scan inside whole-stage
    * codegen). */
  def compute(arr: ArrayData): ArrayData = {
    val sz = arr.numElements()
    val ng = sz - k + 1
    if (ng < w) return new GenericArrayData(Array.empty[Any])
    val toks = new Array[Array[Byte]](sz)
    var i = 0
    // null elements hash as empty string, like WordGramHashes
    while (i < sz) {
      val t = arr.getUTF8String(i)
      toks(i) = if (t == null) Array.emptyByteArray else t.getBytes
      i += 1
    }
    val md = java.security.MessageDigest.getInstance("MD5")
    val space = ' '.toByte
    val hashes = new Array[Long](ng)
    i = 0
    while (i < ng) {
      md.reset()
      var j = 0
      while (j < k) {
        if (j > 0) md.update(space)
        md.update(toks(i + j))
        j += 1
      }
      val dig = md.digest()
      // first 6 digest bytes big-endian == conv(first 12 hex chars, 16, 10)
      var h = 0L
      var b = 0
      while (b < 6) { h = (h << 8) | (dig(b) & 0xFFL); b += 1 }
      hashes(i) = h
      i += 1
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var lastPos = -1
    i = 0
    while (i <= ng - w) {
      // rightmost minimum of hashes[i, i+w): scan ascending with <=
      var bestJ = i
      var j = i + 1
      while (j < i + w) {
        if (hashes(j) <= hashes(bestJ)) bestJ = j
        j += 1
      }
      if (bestJ != lastPos) {
        out += InternalRow(hashes(bestJ), -bestJ)
        lastPos = bestJ
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("winnowFingerprints", this,
      classOf[WinnowFingerprints].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override def nullable: Boolean = child.nullable
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  override def prettyName: String = "graft_winnow_fingerprints"
}
