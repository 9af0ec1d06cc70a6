package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.types._

/** `histogram(x)` — exact per-value counts as MAP<K, BIGINT>, mirroring
  * the reference's Histogram aggregate
  * (presto-main/.../aggregation/histogram/Histogram.java:48).
  *
  * Generic over any hashable key type: the buffer is a HashMap of
  * *copied* internal values (UTF8String etc. must not alias scan
  * buffers). Partial/final merge adds counts, so map-side partial
  * aggregation works — the shuffle carries one (key, count) map per
  * group, not raw rows: the property that makes this usable for
  * "count distinct values per group" at 100 TB.
  */
case class HistogramAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.HashMap[Any, Long]]
    with UnaryLike[Expression] {

  override def prettyName: String = "histogram"
  override def dataType: DataType = MapType(child.dataType, LongType, valueContainsNull = false)
  override def nullable: Boolean = true

  override def createAggregationBuffer(): mutable.HashMap[Any, Long] =
    mutable.HashMap.empty[Any, Long]

  override def update(buffer: mutable.HashMap[Any, Long], input: InternalRow): mutable.HashMap[Any, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val key = InternalRow.copyValue(v)
      buffer.update(key, buffer.getOrElse(key, 0L) + 1L)
    }
    buffer
  }

  override def merge(buffer: mutable.HashMap[Any, Long], other: mutable.HashMap[Any, Long]): mutable.HashMap[Any, Long] = {
    other.foreach { case (k, c) => buffer.update(k, buffer.getOrElse(k, 0L) + c) }
    buffer
  }

  override def eval(buffer: mutable.HashMap[Any, Long]): Any = {
    if (buffer.isEmpty) return null
    val entries = buffer.toArray
    new ArrayBasedMapData(
      new GenericArrayData(entries.map(_._1)),
      new GenericArrayData(entries.map(_._2)))
  }

  @transient private lazy val proj = UnsafeProjection.create(Array(child.dataType, LongType))

  override def serialize(buffer: mutable.HashMap[Any, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buffer.size)
    buffer.foreach { case (k, c) =>
      val row = proj(InternalRow(k, c))
      val bytes = row.getBytes
      out.writeInt(bytes.length)
      out.write(bytes)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(storageFormat: Array[Byte]): mutable.HashMap[Any, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(storageFormat))
    val n = in.readInt()
    val buffer = mutable.HashMap.empty[Any, Long]
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val bytes = new Array[Byte](len)
      in.readFully(bytes)
      val row = new UnsafeRow(2)
      row.pointTo(bytes, len)
      val key = InternalRow.copyValue(row.get(0, child.dataType))
      buffer.update(key, row.getLong(1))
      i += 1
    }
    buffer
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HistogramAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HistogramAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): HistogramAgg =
    copy(child = newChild)
}
