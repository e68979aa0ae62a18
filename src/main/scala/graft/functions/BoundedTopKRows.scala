package graft.functions

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.types._

/** Bounded per-group top-k aggregate over packed struct rows — the
  * native (untyped, optimizer-insertable) sibling of TypedApi.q140's
  * Aggregator, and the execution target of the
  * [[graft.TopKAggregateRewrite]] rule.
  *
  * Semantics: keeps the first `k` input structs under the window order
  * encoded by (sortIdx, sortAsc, sortNullsFirst) — field indices into
  * the struct, per-field direction, per-field null placement — and
  * evals to an array of those structs sorted in that order, i.e.
  * exactly the rows `row_number() OVER (... ) <= k` keeps, in rank
  * order.
  *
  * Why it scales: the aggregation buffer is a k-bounded binary heap, so
  * partial aggregation ships AT MOST k rows per (group × map task) and
  * final merge holds k rows per group — replacing the window's
  * Exchange + full Sort of every group member with an
  * ObjectHashAggregate whose state is O(groups × k). At 100 TB with
  * k=10 that is the difference between sorting the corpus per group
  * and a 10-row combiner.
  *
  * Determinism: identical to row_number's — total orders (every graft
  * query tie-breaks on an id) give identical output; under a non-total
  * order both forms are nondeterministic in the same way (which tied
  * row ranks first is arbitrary either way). */
case class BoundedTopKRows(
    child: Expression,
    k: Int,
    sortIdx: Seq[Int],
    sortAsc: Seq[Boolean],
    sortNullsFirst: Seq[Boolean],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.PriorityQueue[InternalRow]] {

  private def structType: StructType = child.dataType.asInstanceOf[StructType]
  @transient private lazy val fieldTypes: Array[DataType] =
    structType.fields.map(_.dataType)

  override def prettyName: String = "bounded_top_k_rows"
  override def dataType: DataType = ArrayType(child.dataType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StructType if k >= 1 && sortIdx.nonEmpty &&
        sortIdx.forall(i => i >= 0 && i < structType.length) =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"bounded_top_k_rows expects a struct child, k >= 1 and in-range sort fields; " +
        s"got ${child.dataType.simpleString}, k=$k, sortIdx=$sortIdx")
  }

  /** "a before b in window order" ⇒ negative. Null placement follows the
    * SortOrder's nullOrdering (already a FINAL position — not flipped by
    * direction); non-null values compare via the type's interpreted
    * ordering, sign-flipped for descending fields. */
  @transient lazy val rankOrdering: java.util.Comparator[InternalRow] =
    new java.util.Comparator[InternalRow] with Serializable {
      private val ords = sortIdx.map(i =>
        TypeUtils.getInterpretedOrdering(fieldTypes(i))).toArray
      private val idx = sortIdx.toArray
      private val asc = sortAsc.toArray
      private val nf = sortNullsFirst.toArray
      override def compare(a: InternalRow, b: InternalRow): Int = {
        var j = 0
        while (j < idx.length) {
          val i = idx(j)
          val an = a.isNullAt(i)
          val bn = b.isNullAt(i)
          val c =
            if (an && bn) 0
            else if (an) { if (nf(j)) -1 else 1 }
            else if (bn) { if (nf(j)) 1 else -1 }
            else {
              val raw = ords(j).compare(a.get(i, fieldTypes(i)), b.get(i, fieldTypes(i)))
              if (asc(j)) raw else -raw
            }
          if (c != 0) return c
          j += 1
        }
        0
      }
    }

  /** Max-heap on rank order: head is the WORST row currently kept, so a
    * better incoming row evicts in O(log k). */
  override def createAggregationBuffer(): java.util.PriorityQueue[InternalRow] =
    new java.util.PriorityQueue[InternalRow](k, rankOrdering.reversed())

  private def offer(buf: java.util.PriorityQueue[InternalRow], row: InternalRow): Unit =
    if (buf.size < k) buf.add(row)
    else if (rankOrdering.compare(row, buf.peek()) < 0) { buf.poll(); buf.add(row) }

  override def update(
      buf: java.util.PriorityQueue[InternalRow], input: InternalRow): java.util.PriorityQueue[InternalRow] = {
    val v = child.eval(input)
    if (v != null) offer(buf, v.asInstanceOf[InternalRow].copy())
    buf
  }

  override def merge(
      buf: java.util.PriorityQueue[InternalRow],
      other: java.util.PriorityQueue[InternalRow]): java.util.PriorityQueue[InternalRow] = {
    other.forEach(r => offer(buf, r))
    buf
  }

  override def eval(buf: java.util.PriorityQueue[InternalRow]): Any = {
    val arr = new java.util.ArrayList[InternalRow](buf)
    arr.sort(rankOrdering)
    new GenericArrayData(arr.toArray)
  }

  @transient private lazy val toUnsafe = UnsafeProjection.create(fieldTypes)

  override def serialize(buf: java.util.PriorityQueue[InternalRow]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.forEach { r =>
      val u = toUnsafe(r)
      out.writeInt(u.getSizeInBytes)
      u.writeToStream(out, null)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.PriorityQueue[InternalRow] = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val buf = createAggregationBuffer()
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val rowBytes = new Array[Byte](len)
      in.readFully(rowBytes)
      val row = new UnsafeRow(fieldTypes.length)
      row.pointTo(rowBytes, len)
      buf.add(row)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedTopKRows =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedTopKRows =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BoundedTopKRows =
    copy(child = newChildren.head)
}
