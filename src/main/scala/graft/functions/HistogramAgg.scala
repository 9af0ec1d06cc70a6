package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.types._

/** Buffer-key normalization shared by the generic-key aggregates
  * (histogram / map_agg / map_union / multimap_agg). Atomic internal
  * values (UTF8String, Long, Decimal…) are value-equal after
  * `InternalRow.copyValue`; `Array[Byte]` (BinaryType) and `InternalRow`
  * (struct) compare by JVM reference, so using them directly as HashMap
  * keys never merges equal values. Those types are normalized to the
  * bytes of a single-field UnsafeRow wrapped in an `ArraySeq[Byte]`
  * (element-wise equals/hashCode), and decoded back on emit.
  */
private[functions] trait BufferKeyNormalization {
  protected def keyType: DataType

  @transient private lazy val normalizes: Boolean = keyType match {
    case BinaryType | _: StructType | _: ArrayType | _: MapType => true
    case _ => false
  }
  @transient private lazy val keyProj = UnsafeProjection.create(Array(keyType))

  /** Value-equal buffer key for a (non-null) input value. */
  protected final def normKey(v: Any): Any =
    if (!normalizes) InternalRow.copyValue(v)
    else scala.collection.immutable.ArraySeq.unsafeWrapArray(
      keyProj(InternalRow(v)).getBytes.clone())

  /** The original internal value behind a buffer key. */
  protected final def keyValue(k: Any): Any =
    if (!normalizes) k
    else {
      val bytes = k.asInstanceOf[scala.collection.immutable.ArraySeq[Byte]]
        .unsafeArray.asInstanceOf[Array[Byte]]
      val row = new UnsafeRow(1)
      row.pointTo(bytes, bytes.length)
      InternalRow.copyValue(row.get(0, keyType))
    }
}

/** `histogram(x)` — exact per-value counts as MAP<K, BIGINT>, mirroring
  * the reference's Histogram aggregate
  * (presto-main/.../aggregation/histogram/Histogram.java:48).
  *
  * Generic over any hashable key type: the buffer is a HashMap of
  * *copied* internal values (UTF8String etc. must not alias scan
  * buffers; binary/struct keys via BufferKeyNormalization). Partial/final
  * merge adds counts, so map-side partial aggregation works — the shuffle
  * carries one (key, count) map per group, not raw rows: the property
  * that makes this usable for "count distinct values per group" at
  * 100 TB.
  */
case class HistogramAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.HashMap[Any, Long]]
    with UnaryLike[Expression] with BufferKeyNormalization {

  override def prettyName: String = "histogram"
  override def dataType: DataType = MapType(child.dataType, LongType, valueContainsNull = false)
  override def nullable: Boolean = true
  override protected def keyType: DataType = child.dataType

  override def createAggregationBuffer(): mutable.HashMap[Any, Long] =
    mutable.HashMap.empty[Any, Long]

  override def update(buffer: mutable.HashMap[Any, Long], input: InternalRow): mutable.HashMap[Any, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val key = normKey(v)
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
      new GenericArrayData(entries.map(e => keyValue(e._1))),
      new GenericArrayData(entries.map(_._2)))
  }

  @transient private lazy val proj = UnsafeProjection.create(Array(child.dataType, LongType))

  override def serialize(buffer: mutable.HashMap[Any, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buffer.size)
    buffer.foreach { case (k, c) =>
      val row = proj(InternalRow(keyValue(k), c))
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
      val key = normKey(row.get(0, child.dataType))
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
