package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BoundReference, Expression, InterpretedOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StructType}

/** Bounded top-n buffer: up to n (orderKeys, rowStruct) pairs kept
  * sorted by the window's SortOrder semantics. Rows are owned copies
  * (UnsafeProjection reuses its output row). */
final class TopNRowsBuffer(
    val entries: java.util.ArrayList[(UnsafeRow, UnsafeRow)])

/** Generic map-side top-n aggregate — the Catalyst-native form of the
  * `row_number over (partition by k order by s) <= n` idiom, emitted by
  * [[graft.plans.WindowTopKToAgg]]: each group folds its rows into a
  * BOUNDED buffer of the n best by the window's own SortOrder (any
  * direction / null ordering — the comparator is InterpretedOrdering
  * over the original sort spec), partials merge associatively, and the
  * result is the sorted array of surviving row structs (index = rank−1).
  * The window form shuffles and SORTS every row of the corpus; this
  * shape shuffles at most n rows per (mapper × key) — the typed TopK
  * Aggregator the e_knn_* queries hand-build (graft.ops.TopK),
  * generalized to arbitrary row structs and sort specs so ordinary
  * window queries get it from the optimizer for free.
  *
  * Tie semantics: ties on the full sort key keep the FIRST-SEEN row
  * (stable insertion) — like the window form's pick under ties, an
  * execution-order refinement of the same nondeterminism (the
  * WindowDedupToAgg contract).
  *
  * @param row   struct of the child's output columns.
  * @param order the window's sort spec over the child's columns.
  * @param n     buffer bound (the filter's rank threshold). */
case class TopNRows(
    row: Expression,
    order: Seq[SortOrder],
    n: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopNRowsBuffer] {

  require(n >= 1, s"top-n bound must be positive, got $n")

  override def children: Seq[Expression] = row +: order

  override def nullable: Boolean = false

  override def dataType: DataType =
    ArrayType(row.dataType, containsNull = false)

  override def prettyName: String = "graft_top_n_rows"

  // Built lazily on the BOUND copy the aggregation iterator creates, so
  // the projections compile against resolved input offsets.
  @transient private lazy val rowProj = UnsafeProjection.create(Seq(row))
  @transient private lazy val ordProj =
    UnsafeProjection.create(order.map(_.child))
  @transient private lazy val ordComparator = {
    val rebased = order.zipWithIndex.map { case (so, i) =>
      SortOrder(BoundReference(i, so.child.dataType, so.child.nullable),
        so.direction, so.nullOrdering, Seq.empty)
    }
    new InterpretedOrdering(rebased)
  }

  override def createAggregationBuffer(): TopNRowsBuffer =
    new TopNRowsBuffer(new java.util.ArrayList[(UnsafeRow, UnsafeRow)](
      math.min(n, 16)))

  /** Insert an OWNED (ord, row) pair, keeping ascending sort-spec order
    * with stable ties and the n bound. */
  private def insertOwned(buf: TopNRowsBuffer, ord: UnsafeRow,
      rw: UnsafeRow): Unit = {
    val es = buf.entries
    val sz = es.size
    // full and the worst kept entry still sorts at-or-before the
    // candidate → candidate can never rank ≤ n; drop without copying
    if (sz == n && ordComparator.compare(es.get(sz - 1)._1, ord) <= 0) return
    var i = 0
    while (i < sz && ordComparator.compare(es.get(i)._1, ord) <= 0) i += 1
    es.add(i, (ord, rw))
    if (es.size > n) es.remove(es.size - 1)
    ()
  }

  override def update(buf: TopNRowsBuffer, input: InternalRow): TopNRowsBuffer = {
    val ord = ordProj(input)
    val es = buf.entries
    val sz = es.size
    if (!(sz == n && ordComparator.compare(es.get(sz - 1)._1, ord) <= 0)) {
      insertOwned(buf, ord.copy(), rowProj(input).copy())
    }
    buf
  }

  override def merge(a: TopNRowsBuffer, b: TopNRowsBuffer): TopNRowsBuffer = {
    val it = b.entries.iterator()
    while (it.hasNext) {
      val e = it.next() // already owned copies — insert without re-copy
      insertOwned(a, e._1, e._2)
    }
    a
  }

  override def eval(buf: TopNRowsBuffer): Any = {
    val arity = row.dataType.asInstanceOf[StructType].length
    val out = new Array[Any](buf.entries.size)
    var i = 0
    while (i < out.length) {
      out(i) = buf.entries.get(i)._2.getStruct(0, arity)
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: TopNRowsBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.entries.size)
    val it = buf.entries.iterator()
    while (it.hasNext) {
      val (o, r) = it.next()
      val ob = o.getBytes; out.writeInt(ob.length); out.write(ob)
      val rb = r.getBytes; out.writeInt(rb.length); out.write(rb)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopNRowsBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val sz = in.readInt()
    val es = new java.util.ArrayList[(UnsafeRow, UnsafeRow)](sz)
    var i = 0
    while (i < sz) {
      val ol = in.readInt(); val ob = new Array[Byte](ol); in.readFully(ob)
      val o = new UnsafeRow(order.length); o.pointTo(ob, ol)
      val rl = in.readInt(); val rb = new Array[Byte](rl); in.readFully(rb)
      val r = new UnsafeRow(1); r.pointTo(rb, rl)
      es.add((o, r))
      i += 1
    }
    new TopNRowsBuffer(es)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopNRows =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): TopNRows =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopNRows =
    copy(row = newChildren.head,
      order = newChildren.tail.map(_.asInstanceOf[SortOrder]).toSeq)
}
