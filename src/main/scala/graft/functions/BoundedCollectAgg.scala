package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** `collect_list` with a hard element cap: the buffer NEVER holds more
  * than `max` values, in update or merge. The skew-safety primitive for
  * LSH bucket expansion (TextOps.minhashPairs): a duplicate-saturated
  * band bucket at 100 TB would otherwise materialize an unbounded
  * per-group array in the aggregation buffer before any downstream cap
  * could apply. Which `max` elements survive is partition-arrival
  * dependent (like Presto's arbitrary()); callers that need determinism
  * sort upstream or accept any representative subset — candidate
  * generation does (a doc dropped from one saturated band re-pairs
  * through its 15 other bands).
  */
case class BoundedCollectListAgg(
    child: Expression,
    max: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.ArrayBuffer[Any]]
    with UnaryLike[Expression] {

  require(max > 0, "bounded_collect_list: max must be positive")

  override def prettyName: String = "bounded_collect_list"
  override def dataType: DataType = ArrayType(child.dataType, containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): mutable.ArrayBuffer[Any] =
    mutable.ArrayBuffer.empty

  override def update(buffer: mutable.ArrayBuffer[Any], input: InternalRow): mutable.ArrayBuffer[Any] = {
    if (buffer.length < max) {
      val v = child.eval(input)
      if (v != null) buffer += InternalRow.copyValue(v)
    }
    buffer
  }

  override def merge(buffer: mutable.ArrayBuffer[Any], other: mutable.ArrayBuffer[Any]): mutable.ArrayBuffer[Any] = {
    val room = max - buffer.length
    if (room > 0) buffer ++= other.take(room)
    buffer
  }

  override def eval(buffer: mutable.ArrayBuffer[Any]): Any =
    new GenericArrayData(buffer.toArray)

  @transient private lazy val proj = UnsafeProjection.create(Array(child.dataType))

  override def serialize(buffer: mutable.ArrayBuffer[Any]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buffer.length)
    buffer.foreach { v =>
      val bytes = proj(InternalRow(v)).getBytes
      out.writeInt(bytes.length)
      out.write(bytes)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(storageFormat: Array[Byte]): mutable.ArrayBuffer[Any] = {
    val in = new DataInputStream(new ByteArrayInputStream(storageFormat))
    val n = in.readInt()
    val buffer = mutable.ArrayBuffer.empty[Any]
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val bytes = new Array[Byte](len)
      in.readFully(bytes)
      val row = new UnsafeRow(1)
      row.pointTo(bytes, len)
      buffer += InternalRow.copyValue(row.get(0, child.dataType))
      i += 1
    }
    buffer
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedCollectListAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedCollectListAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BoundedCollectListAgg =
    copy(child = newChild)
}
