package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Bounded "k smallest DISTINCT values" aggregate — the scale-safe stand-in
  * for `collect_list` in dedup reporting: per-group (and per-merge) state is
  * capped at `k` elements, so a pathological group (a viral document
  * duplicated 10^8 times) costs O(k) memory on its reducer instead of OOMing
  * it. Output is sorted ascending. Equal values collapse (set semantics) —
  * callers pass unique row ids.
  *
  * Supports Long / Int / String children (the id types in practice).
  */
case class BoundedMinList(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.TreeSet[AnyRef]] with UnaryLike[Expression] {

  require(k > 0, "BoundedMinList requires k > 0")

  override def dataType: DataType = ArrayType(child.dataType, containsNull = false)
  override def nullable: Boolean = false

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case LongType | IntegerType | StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"BoundedMinList supports long/int/string ids, got ${other.simpleString}")
    }

  override def createAggregationBuffer(): java.util.TreeSet[AnyRef] =
    new java.util.TreeSet[AnyRef]() // Long / Integer / UTF8String: all Comparable

  override def update(buf: java.util.TreeSet[AnyRef], input: InternalRow): java.util.TreeSet[AnyRef] = {
    val v0 = child.eval(input)
    if (v0 != null) {
      // hot-path short circuit: a full buffer whose max is <= v cannot admit
      // v — skip the clone + O(log k) insert/evict churn the viral-duplicate
      // case would otherwise pay per copy (compare BEFORE cloning: reading
      // the transient value is safe, only storing it is not)
      val full = buf.size >= k
      if (!full || buf.last().asInstanceOf[Comparable[AnyRef]].compareTo(v0.asInstanceOf[AnyRef]) > 0) {
        // COPY string values: a UTF8String from eval points into the
        // operator's reused row buffer — storing it uncopied means the bytes
        // mutate under us on the next row (Spark's own Collect aggregate
        // calls copyValue for the same reason). Long/Integer are immutable.
        val v = v0 match {
          case s: UTF8String => s.clone()
          case other => other.asInstanceOf[AnyRef]
        }
        buf.add(v)
        if (buf.size > k) buf.pollLast()
      }
    }
    buf
  }

  override def merge(buf: java.util.TreeSet[AnyRef], other: java.util.TreeSet[AnyRef]): java.util.TreeSet[AnyRef] = {
    val it = other.iterator()
    while (it.hasNext) {
      buf.add(it.next())
      if (buf.size > k) buf.pollLast()
    }
    buf
  }

  override def eval(buf: java.util.TreeSet[AnyRef]): Any =
    new GenericArrayData(buf.toArray) // ascending (TreeSet natural order)

  override def serialize(buf: java.util.TreeSet[AnyRef]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    val it = buf.iterator()
    child.dataType match {
      case LongType => while (it.hasNext) out.writeLong(it.next().asInstanceOf[Long])
      case IntegerType => while (it.hasNext) out.writeInt(it.next().asInstanceOf[Int])
      case StringType =>
        while (it.hasNext) {
          val b = it.next().asInstanceOf[UTF8String].getBytes
          out.writeInt(b.length); out.write(b)
        }
      case other => throw new IllegalStateException(s"unsupported id type $other")
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[AnyRef] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    var i = 0
    child.dataType match {
      case LongType => while (i < n) { buf.add(java.lang.Long.valueOf(in.readLong())); i += 1 }
      case IntegerType => while (i < n) { buf.add(java.lang.Integer.valueOf(in.readInt())); i += 1 }
      case StringType =>
        while (i < n) {
          val b = new Array[Byte](in.readInt()); in.readFully(b)
          buf.add(UTF8String.fromBytes(b)); i += 1
        }
      case other => throw new IllegalStateException(s"unsupported id type $other")
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedMinList =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedMinList =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(c: Expression): BoundedMinList = copy(child = c)
}

object BoundedMinList {
  import org.apache.spark.sql.GraftShim
  /** Column wrapper: k smallest distinct non-null values of `c`, ascending. */
  def bounded_min_list(c: Column, k: Int): Column =
    GraftShim.column(BoundedMinList(GraftShim.expression(c), k).toAggregateExpression())
}
