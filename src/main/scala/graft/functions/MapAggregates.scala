package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.{BinaryLike, UnaryLike}
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData, MapData}
import org.apache.spark.sql.types._

/** Shared machinery for the first-wins map-building aggregates
  * (`map_agg`, `map_union`). Presto's MapAggregationFunction
  * (KeyValuePairs.add) silently SKIPS null keys and keeps one arbitrary
  * value per duplicate key — it never errors. Building these on
  * MapFromEntries would instead throw under the session's
  * mapKeyDedupPolicy=EXCEPTION, so they are genuine imperative
  * aggregates: the buffer is key→value with first-wins insertion
  * ("first" in partial-arrival order, which matches the reference's
  * "arbitrary" contract — cross-partition merge order is not
  * deterministic and neither engine promises it). Keys go through
  * BufferKeyNormalization so binary/struct keys dedupe by value.
  *
  * Scale: partial maps merge associatively, so map-side partial
  * aggregation holds and the shuffle carries one map per group.
  */
private[functions] trait FirstWinsMapBuffer extends BufferKeyNormalization {
  protected def mapKeyType: DataType
  protected def mapValueType: DataType
  override protected final def keyType: DataType = mapKeyType

  protected final def mapDataType: DataType =
    MapType(mapKeyType, mapValueType, valueContainsNull = true)

  protected final def put(buffer: mutable.LinkedHashMap[Any, Any], k: Any, v: Any): Unit =
    if (k != null) {
      val key = normKey(k)
      if (!buffer.contains(key)) buffer.update(key, InternalRow.copyValue(v))
    }

  protected final def mergeBuffers(
      buffer: mutable.LinkedHashMap[Any, Any],
      other: mutable.LinkedHashMap[Any, Any]): mutable.LinkedHashMap[Any, Any] = {
    other.foreach { case (k, v) => if (!buffer.contains(k)) buffer.update(k, v) }
    buffer
  }

  protected final def evalBuffer(buffer: mutable.LinkedHashMap[Any, Any]): Any = {
    if (buffer.isEmpty) return null
    val entries = buffer.toArray
    new ArrayBasedMapData(
      new GenericArrayData(entries.map(e => keyValue(e._1))),
      new GenericArrayData(entries.map(_._2)))
  }

  @transient private lazy val proj =
    UnsafeProjection.create(Array(mapKeyType, mapValueType))

  protected final def serializeBuffer(buffer: mutable.LinkedHashMap[Any, Any]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buffer.size)
    buffer.foreach { case (k, v) =>
      val row = proj(InternalRow(keyValue(k), v))
      val bytes = row.getBytes
      out.writeInt(bytes.length)
      out.write(bytes)
    }
    out.flush()
    bos.toByteArray
  }

  protected final def deserializeBuffer(storageFormat: Array[Byte]): mutable.LinkedHashMap[Any, Any] = {
    val in = new DataInputStream(new ByteArrayInputStream(storageFormat))
    val n = in.readInt()
    val buffer = mutable.LinkedHashMap.empty[Any, Any]
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val bytes = new Array[Byte](len)
      in.readFully(bytes)
      val row = new UnsafeRow(2)
      row.pointTo(bytes, len)
      buffer.update(normKey(row.get(0, mapKeyType)),
        InternalRow.copyValue(row.get(1, mapValueType)))
      i += 1
    }
    buffer
  }
}

/** `map_agg(k, v)` → MAP<K, V> — reference MapAggregationFunction.java:48:
  * null keys skipped, one (first-arrival) value kept per duplicate key.
  */
case class MapAggAgg(
    left: Expression,
    right: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.LinkedHashMap[Any, Any]]
    with BinaryLike[Expression] with FirstWinsMapBuffer {

  override def prettyName: String = "map_agg"
  override protected def mapKeyType: DataType = left.dataType
  override protected def mapValueType: DataType = right.dataType
  override def dataType: DataType = mapDataType
  override def nullable: Boolean = true

  override def createAggregationBuffer(): mutable.LinkedHashMap[Any, Any] =
    mutable.LinkedHashMap.empty

  override def update(buffer: mutable.LinkedHashMap[Any, Any], input: InternalRow): mutable.LinkedHashMap[Any, Any] = {
    put(buffer, left.eval(input), right.eval(input))
    buffer
  }

  override def merge(buffer: mutable.LinkedHashMap[Any, Any], other: mutable.LinkedHashMap[Any, Any]): mutable.LinkedHashMap[Any, Any] =
    mergeBuffers(buffer, other)

  override def eval(buffer: mutable.LinkedHashMap[Any, Any]): Any = evalBuffer(buffer)
  override def serialize(buffer: mutable.LinkedHashMap[Any, Any]): Array[Byte] = serializeBuffer(buffer)
  override def deserialize(storageFormat: Array[Byte]): mutable.LinkedHashMap[Any, Any] = deserializeBuffer(storageFormat)

  override def withNewMutableAggBufferOffset(newOffset: Int): MapAggAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MapAggAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): MapAggAgg =
    copy(left = l, right = r)
}

/** `map_union(m)` → MAP<K, V> — reference MapUnionAggregation.java: union
  * of all input maps, one (first-arrival) value kept per duplicate key.
  */
case class MapUnionAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.LinkedHashMap[Any, Any]]
    with UnaryLike[Expression] with FirstWinsMapBuffer {

  private lazy val mapType = child.dataType.asInstanceOf[MapType]

  override def prettyName: String = "map_union"
  override protected def mapKeyType: DataType = mapType.keyType
  override protected def mapValueType: DataType = mapType.valueType
  override def dataType: DataType = mapDataType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case _: MapType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"map_union expects a MAP argument, got ${other.catalogString}")
    }

  override def createAggregationBuffer(): mutable.LinkedHashMap[Any, Any] =
    mutable.LinkedHashMap.empty

  override def update(buffer: mutable.LinkedHashMap[Any, Any], input: InternalRow): mutable.LinkedHashMap[Any, Any] = {
    child.eval(input) match {
      case m: MapData =>
        val keys = m.keyArray()
        val values = m.valueArray()
        var i = 0
        while (i < m.numElements()) {
          put(buffer, keys.get(i, mapKeyType),
            if (values.isNullAt(i)) null else values.get(i, mapValueType))
          i += 1
        }
      case _ => // null map contributes nothing
    }
    buffer
  }

  override def merge(buffer: mutable.LinkedHashMap[Any, Any], other: mutable.LinkedHashMap[Any, Any]): mutable.LinkedHashMap[Any, Any] =
    mergeBuffers(buffer, other)

  override def eval(buffer: mutable.LinkedHashMap[Any, Any]): Any = evalBuffer(buffer)
  override def serialize(buffer: mutable.LinkedHashMap[Any, Any]): Array[Byte] = serializeBuffer(buffer)
  override def deserialize(storageFormat: Array[Byte]): mutable.LinkedHashMap[Any, Any] = deserializeBuffer(storageFormat)

  override def withNewMutableAggBufferOffset(newOffset: Int): MapUnionAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MapUnionAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MapUnionAgg =
    copy(child = newChild)
}
