package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Column surface of [[graft.ops.HtmlDom.blocks]]: html string → array
  * of (pos, depth, path, text, link_chars, chrome) block structs in
  * document order. One forward scan per row; stays inside whole-stage
  * codegen via the plan-reference pattern ([[WinnowFingerprints]]). */
case class DomBlocks(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("pos", IntegerType, nullable = false),
      StructField("depth", IntegerType, nullable = false),
      StructField("path", StringType, nullable = false),
      StructField("text", StringType, nullable = false),
      StructField("link_chars", LongType, nullable = false),
      StructField("chrome", BooleanType, nullable = false))),
    containsNull = false)

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  def compute(html: UTF8String): ArrayData = {
    val bs = graft.ops.HtmlDom.blocks(html.toString)
    val rows = new Array[Any](bs.length)
    var i = 0
    while (i < bs.length) {
      val b = bs(i)
      rows(i) = InternalRow(b.pos, b.depth, UTF8String.fromString(b.path),
        UTF8String.fromString(b.text), b.linkChars.toLong, b.chrome)
      i += 1
    }
    new GenericArrayData(rows)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("domBlocks", this, classOf[DomBlocks].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override def nullable: Boolean = child.nullable
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  override def prettyName: String = "graft_dom_blocks"
}

/** Column surface of [[graft.ops.HtmlDom.markdown]]: html string →
  * structure-preserving markdown (headings, nested list markers, pipe
  * tables with th-header separators, blockquote runs, chrome dropped).
  * Same single forward scan as [[DomBlocks]] — the open/close event
  * stream is what carries table-row boundaries that flat block
  * post-processing cannot recover. */
case class DomMarkdown(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  def compute(html: UTF8String): UTF8String =
    UTF8String.fromString(graft.ops.HtmlDom.markdown(html.toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("domMarkdown", this, classOf[DomMarkdown].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override def nullable: Boolean = child.nullable
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  override def prettyName: String = "graft_dom_markdown"
}
