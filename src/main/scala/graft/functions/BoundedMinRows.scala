package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, InterpretedOrdering, RowOrdering, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded "k smallest ROWS by sort key" aggregate — the two-phase
  * formulation that retires the per-stratum window-sort from exact-k
  * selection ([[graft.ops.Sampling.capStrataExact]]): each map task's
  * partial aggregation keeps at most `k` (sortKey, payload) pairs per
  * group, so a hot group contributes O(partitions · k) rows to its
  * reducer's merge instead of serializing the ENTIRE group into one task's
  * sort. MULTISET semantics (unlike [[BoundedMinList]]'s distinct set):
  * duplicate sort keys occupy distinct slots, so the result is exactly the
  * first k rows of the group's (sortKey asc) order — the same multiset a
  * `row_number() <= k` window emits, including boundary-tie behavior
  * (equal-key rows are interchangeable; which copy survives is
  * arrival-dependent either way).
  *
  * `sortKey` must be a struct of orderable atomic fields (ordered by
  * Spark's standard struct ordering, fields left-to-right ascending);
  * `payload` is any struct — it is carried, never compared, so map-typed
  * columns ride along fine. Output: array of payload structs, ascending by
  * sort key. State per group: O(k · row size) — the caller's documented
  * memory contract for the exact variant. Null sort keys are skipped
  * (callers build keys from non-null gate/hash columns); a null PAYLOAD
  * keeps its slot (its key exists) and surfaces as a null array element.
  */
case class BoundedMinRows(
    left: Expression, // sort key struct
    right: Expression, // payload struct
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.PriorityQueue[(InternalRow, InternalRow)]]
    with BinaryLike[Expression] {

  require(k > 0, "BoundedMinRows requires k > 0")

  private def keyType: StructType = left.dataType.asInstanceOf[StructType]
  private def payloadType: StructType = right.dataType.asInstanceOf[StructType]

  // containsNull: a row whose PAYLOAD struct evaluates to null still
  // occupies its slot (its sort key exists) and surfaces as a null element
  override def dataType: DataType = ArrayType(payloadType, containsNull = true)
  override def nullable: Boolean = false

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (kt: StructType, _: StructType)
          if kt.fields.forall(f => RowOrdering.isOrderable(f.dataType)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"BoundedMinRows needs (orderable struct, struct), got $other")
    }

  @transient private lazy val keyOrdering: Ordering[InternalRow] =
    InterpretedOrdering.forSchema(keyType.fields.map(_.dataType).toIndexedSeq)
  // max-heap on the key: head = current worst of the kept k
  @transient private lazy val heapOrdering: Ordering[(InternalRow, InternalRow)] =
    Ordering.by[(InternalRow, InternalRow), InternalRow](_._1)(keyOrdering.reverse)

  override def createAggregationBuffer(): java.util.PriorityQueue[(InternalRow, InternalRow)] =
    new java.util.PriorityQueue[(InternalRow, InternalRow)](math.min(k, 16) + 1, heapOrdering)

  override def update(
      buf: java.util.PriorityQueue[(InternalRow, InternalRow)],
      input: InternalRow): java.util.PriorityQueue[(InternalRow, InternalRow)] = {
    val keyV = left.eval(input)
    if (keyV != null) {
      val keyRow = keyV.asInstanceOf[InternalRow]
      // compare BEFORE copying: a full buffer whose worst key is <= this
      // key cannot admit it — the hot-group fast path pays zero allocation
      if (buf.size < k || keyOrdering.compare(keyRow, buf.peek()._1) < 0) {
        // a null payload stays null (serialized as a flag, emitted as a
        // null array element) — substituting an empty row would crash the
        // UnsafeProjection and corrupt the declared element type
        val payloadV = right.eval(input)
        val payloadRow =
          if (payloadV == null) null
          else payloadV.asInstanceOf[InternalRow].copy()
        // COPY rows: eval results point into reused operator buffers
        buf.add((keyRow.copy(), payloadRow))
        if (buf.size > k) buf.poll()
      }
    }
    buf
  }

  override def merge(
      buf: java.util.PriorityQueue[(InternalRow, InternalRow)],
      other: java.util.PriorityQueue[(InternalRow, InternalRow)]): java.util.PriorityQueue[(InternalRow, InternalRow)] = {
    val it = other.iterator()
    while (it.hasNext) {
      val e = it.next()
      if (buf.size < k || keyOrdering.compare(e._1, buf.peek()._1) < 0) {
        buf.add(e) // already copied at update time
        if (buf.size > k) buf.poll()
      }
    }
    buf
  }

  override def eval(buf: java.util.PriorityQueue[(InternalRow, InternalRow)]): Any = {
    val arr = buf.toArray(new Array[(InternalRow, InternalRow)](buf.size))
    java.util.Arrays.sort(arr, Ordering.by[(InternalRow, InternalRow), InternalRow](_._1)(keyOrdering))
    new GenericArrayData(arr.map(_._2.asInstanceOf[Any]))
  }

  @transient private lazy val keyProj =
    UnsafeProjection.create(keyType.fields.map(_.dataType))
  @transient private lazy val payloadProj =
    UnsafeProjection.create(payloadType.fields.map(_.dataType))

  override def serialize(buf: java.util.PriorityQueue[(InternalRow, InternalRow)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) {
      val (kr, pr) = it.next()
      val kb = keyProj.apply(kr).getBytes
      out.writeInt(kb.length); out.write(kb)
      if (pr == null) out.writeInt(-1) // null payload flag
      else {
        val pb = payloadProj.apply(pr).getBytes
        out.writeInt(pb.length); out.write(pb)
      }
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.PriorityQueue[(InternalRow, InternalRow)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) {
      val kb = new Array[Byte](in.readInt()); in.readFully(kb)
      val kr = new UnsafeRow(keyType.size)
      kr.pointTo(kb, kb.length)
      val plen = in.readInt()
      val pr =
        if (plen < 0) null
        else {
          val pb = new Array[Byte](plen); in.readFully(pb)
          val r = new UnsafeRow(payloadType.size)
          r.pointTo(pb, pb.length)
          r
        }
      buf.add((kr, pr))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedMinRows =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedMinRows =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): BoundedMinRows =
    copy(left = l, right = r)
}

object BoundedMinRows {
  import org.apache.spark.sql.GraftShim
  /** Column wrapper: the k payload structs with the smallest sort keys,
    * ascending, duplicates kept. */
  def bounded_min_rows(sortKey: Column, payload: Column, k: Int): Column =
    GraftShim.column(BoundedMinRows(GraftShim.expression(sortKey),
      GraftShim.expression(payload), k).toAggregateExpression())
}
