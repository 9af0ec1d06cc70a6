package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.types._

/** `multimap_agg(k, v)` → MAP<K, ARRAY<V>> — all values per key, in
  * arrival order within each partial (reference
  * MultimapAggregationFunction). Same generic-key machinery as
  * HistogramAgg: copied internal values, UnsafeProjection-based
  * partial serialization, additive merge — safe under map-side partial
  * aggregation and AQE replanning.
  */
case class MultimapAgg(
    left: Expression,
    right: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.LinkedHashMap[Any, mutable.ArrayBuffer[Any]]]
    with BinaryLike[Expression] with BufferKeyNormalization {

  override def prettyName: String = "multimap_agg"
  override def dataType: DataType =
    MapType(left.dataType, ArrayType(right.dataType, containsNull = true), valueContainsNull = false)
  override def nullable: Boolean = true
  override protected def keyType: DataType = left.dataType

  override def createAggregationBuffer(): mutable.LinkedHashMap[Any, mutable.ArrayBuffer[Any]] =
    mutable.LinkedHashMap.empty

  override def update(
      buffer: mutable.LinkedHashMap[Any, mutable.ArrayBuffer[Any]],
      input: InternalRow): mutable.LinkedHashMap[Any, mutable.ArrayBuffer[Any]] = {
    val k = left.eval(input)
    if (k != null) {
      val key = normKey(k)
      val v = InternalRow.copyValue(right.eval(input))
      buffer.getOrElseUpdate(key, mutable.ArrayBuffer.empty) += v
    }
    buffer
  }

  override def merge(
      buffer: mutable.LinkedHashMap[Any, mutable.ArrayBuffer[Any]],
      other: mutable.LinkedHashMap[Any, mutable.ArrayBuffer[Any]]): mutable.LinkedHashMap[Any, mutable.ArrayBuffer[Any]] = {
    other.foreach { case (k, vs) =>
      buffer.getOrElseUpdate(k, mutable.ArrayBuffer.empty) ++= vs
    }
    buffer
  }

  override def eval(buffer: mutable.LinkedHashMap[Any, mutable.ArrayBuffer[Any]]): Any = {
    if (buffer.isEmpty) return null
    val entries = buffer.toArray
    new ArrayBasedMapData(
      new GenericArrayData(entries.map(e => keyValue(e._1))),
      new GenericArrayData(entries.map { case (_, vs) => new GenericArrayData(vs.toArray) }))
  }

  @transient private lazy val proj =
    UnsafeProjection.create(Array(left.dataType, right.dataType))

  override def serialize(buffer: mutable.LinkedHashMap[Any, mutable.ArrayBuffer[Any]]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    val pairs = buffer.iterator.flatMap { case (k, vs) => vs.iterator.map(keyValue(k) -> _) }.toArray
    out.writeInt(pairs.length)
    pairs.foreach { case (k, v) =>
      val row = proj(InternalRow(k, v))
      val bytes = row.getBytes
      out.writeInt(bytes.length)
      out.write(bytes)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(storageFormat: Array[Byte]): mutable.LinkedHashMap[Any, mutable.ArrayBuffer[Any]] = {
    val in = new DataInputStream(new ByteArrayInputStream(storageFormat))
    val n = in.readInt()
    val buffer = mutable.LinkedHashMap.empty[Any, mutable.ArrayBuffer[Any]]
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val bytes = new Array[Byte](len)
      in.readFully(bytes)
      val row = new UnsafeRow(2)
      row.pointTo(bytes, len)
      val k = normKey(row.get(0, left.dataType))
      val v = InternalRow.copyValue(row.get(1, right.dataType))
      buffer.getOrElseUpdate(k, mutable.ArrayBuffer.empty) += v
      i += 1
    }
    buffer
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MultimapAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MultimapAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): MultimapAgg =
    copy(left = l, right = r)
}
