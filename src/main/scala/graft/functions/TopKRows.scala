package graft.functions

import java.io.{ByteArrayOutputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, BoundReference, Descending, Expression, InterpretedOrdering, NullsFirst, NullsLast, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k buffer: at most k self-contained UnsafeRows, a
  * max-heap under `ord` so the worst kept row is evicted first.
  */
final class TopKRowsBuffer(k: Int, ord: Ordering[InternalRow]) {
  val heap = new java.util.PriorityQueue[UnsafeRow](k.max(1), ord.reverse)
  /** Insert an OWNED (self-contained) row, keeping only the k best. */
  def insertOwned(row: UnsafeRow): Unit = {
    if (heap.size < k) heap.add(row)
    else if (ord.lt(row, heap.peek())) { heap.poll(); heap.add(row) }
  }
}

/** The aggregate half of [[graft.plans.RankLimitToTopK]]: collects the
  * k smallest input structs under the ordering encoded by
  * `directions` over the struct's first `numOrderFields` fields and
  * returns them rank-ordered as an array.
  *
  * Why an aggregate and not a window: a window sort materializes and
  * sorts EVERY candidate row per group (O(n log n), spill-prone, and
  * the partial WindowGroupLimit Spark inserts still local-sorts the
  * full input). A TypedImperativeAggregate gets map-side partial
  * aggregation for free: each input partition reduces to one k-row
  * buffer per group before the exchange (O(n log k), bounded memory),
  * and the shuffle carries k rows per (group, partition) instead of
  * every candidate.
  */
case class TopKRows(
    input: Expression,
    directions: Seq[(Boolean, Boolean)], // (ascending, nullsFirst) per order field
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKRowsBuffer] {

  private lazy val structType = input.dataType.asInstanceOf[StructType]

  private lazy val ordering: Ordering[InternalRow] = new InterpretedOrdering(
    directions.zipWithIndex.map { case ((asc, nullsFirst), i) =>
      val f = structType(i)
      SortOrder(BoundReference(i, f.dataType, f.nullable),
        if (asc) Ascending else Descending,
        if (nullsFirst) NullsFirst else NullsLast, Seq.empty)
    })

  private lazy val toUnsafe = UnsafeProjection.create(structType)

  override def createAggregationBuffer(): TopKRowsBuffer =
    new TopKRowsBuffer(k, ordering)

  override def update(buf: TopKRowsBuffer, row: InternalRow): TopKRowsBuffer = {
    val v = input.eval(row)
    if (v != null) {
      // Project to UnsafeRow and copy: input rows (and the strings
      // they carry) live in reused buffers.
      buf.insertOwned(toUnsafe(v.asInstanceOf[InternalRow]).copy())
    }
    buf
  }

  override def merge(buf: TopKRowsBuffer, other: TopKRowsBuffer): TopKRowsBuffer = {
    val it = other.heap.iterator()
    while (it.hasNext) buf.insertOwned(it.next())
    buf
  }

  override def eval(buf: TopKRowsBuffer): Any = {
    val arr = new Array[InternalRow](buf.heap.size)
    var i = arr.length - 1
    // Drain the max-heap worst-first into descending slots → ascending
    // (rank) order without a separate sort.
    while (i >= 0) { arr(i) = buf.heap.poll(); i -= 1 }
    new GenericArrayData(arr.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: TopKRowsBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.heap.size)
    val it = buf.heap.iterator()
    while (it.hasNext) {
      val bytes = it.next().getBytes
      out.writeInt(bytes.length)
      out.write(bytes)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(storage: Array[Byte]): TopKRowsBuffer = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(storage))
    val buf = createAggregationBuffer()
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val bytes = new Array[Byte](len)
      in.readFully(bytes)
      val row = new UnsafeRow(structType.size)
      row.pointTo(bytes, len)
      buf.insertOwned(row)
      i += 1
    }
    buf
  }

  override def dataType: DataType = ArrayType(structType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(input)

  override def withNewMutableAggBufferOffset(offset: Int): TopKRows =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): TopKRows =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKRows =
    copy(input = newChildren.head)
}
