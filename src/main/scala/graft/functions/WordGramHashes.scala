package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Positional word-n-gram md5 keys of a token array: element i is
  * md5(toks[i..i+n) joined by space) as lowercase hex — semantics
  * identical to `transform(wordNgrams(toks, n), g -> md5(g))` but ONE
  * tight loop that never materializes the gram strings as column data.
  * The gram text is ~n× the document per row when materialized (the
  * dup-span explode's memory blow-up); here each gram lives only as a
  * transient digest input. Used by [[graft.ops.SubstrDedup]].
  */
case class WordGramHashes(child: Expression, n: Int)
    extends UnaryExpression {
  require(n >= 1, s"gram width must be >= 1, got $n")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  private val hexDigits = "0123456789abcdef".toCharArray

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  /** Shared by eval and codegen (see [[FloatDot.compute]]: a
    * plan-reference call keeps the gram scan inside whole-stage
    * codegen). */
  def compute(arr: ArrayData): ArrayData = {
    val sz = arr.numElements()
    if (sz < n) return new GenericArrayData(Array.empty[Any])
    val toks = new Array[Array[Byte]](sz)
    var i = 0
    // null elements hash as empty string (defined semantics for the
    // SQL-registered form, whose array<string> may contain nulls)
    while (i < sz) {
      val t = arr.getUTF8String(i)
      toks(i) = if (t == null) Array.emptyByteArray else t.getBytes
      i += 1
    }
    val md = java.security.MessageDigest.getInstance("MD5")
    val total = sz - n + 1
    val out = new Array[Any](total)
    val space = ' '.toByte
    i = 0
    while (i < total) {
      md.reset()
      var j = 0
      while (j < n) {
        if (j > 0) md.update(space)
        md.update(toks(i + j))
        j += 1
      }
      val dig = md.digest()
      val hex = new Array[Char](32)
      var k = 0
      while (k < 16) {
        hex(k * 2) = hexDigits((dig(k) >> 4) & 0xF)
        hex(k * 2 + 1) = hexDigits(dig(k) & 0xF)
        k += 1
      }
      out(i) = UTF8String.fromString(new String(hex))
      i += 1
    }
    new GenericArrayData(out)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("wordGramHashes", this,
      classOf[WordGramHashes].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override def nullable: Boolean = child.nullable
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "graft_word_gram_hashes"
}
