package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.TernaryLike
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.types._

/** Presto's bounded top-n aggregate family
  * (reference: presto-main/.../aggregation/MaxNAggregationFunction.java,
  * minmaxby/AbstractMinMaxByNAggregationFunction.java, both backed by the
  * bounded TypedHeap of TypedHeap.java):
  *
  *   max(x, n) / min(x, n)        → array of the n largest/smallest x
  *   max_by(x, y, n)/min_by(x,y,n)→ array of x for the n largest/smallest y
  *
  * Spark has no bounded top-n aggregate (collect_list + sort + slice
  * would buffer the whole group), so this is the same design as the
  * reference: a size-n heap in the aggregation buffer — update is
  * O(log n), merge O(m log n), and the buffer can never exceed n
  * entries regardless of group size, which is what makes a top-n over a
  * 100 TB group safe. Rows with a NULL ordering key are skipped
  * (Presto min/max semantics); the result is ordered by the key
  * (descending for max, ascending for min). Ties are kept
  * arbitrarily, as in the reference.
  */
case class MinMaxByNAgg(
    value: Expression,
    key: Expression,
    nExpr: Expression,
    isMax: Boolean,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.PriorityQueue[(Any, Any)]]
    with TernaryLike[Expression] {

  private lazy val n: Int = nExpr.eval() match {
    case i: Int => i
    case l: Long => l.toInt
    case other =>
      throw new IllegalArgumentException(
        s"$prettyName: n must be an integer literal, got $other")
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (!nExpr.foldable) {
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure(s"$prettyName: n must be a constant")
    } else if (n <= 0 || n > 10000) {
      // the reference caps n at 10k (MaxNAggregationFunction checks it)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure(s"$prettyName: n must be in [1, 10000], got $n")
    } else TypeUtils.checkForOrderingExpr(key.dataType, prettyName)
  }

  override def prettyName: String = if (isMax) "max_by_n" else "min_by_n"
  override def dataType: DataType = ArrayType(value.dataType, containsNull = true)
  override def nullable: Boolean = true

  override def first: Expression = value
  override def second: Expression = key
  override def third: Expression = nExpr

  @transient private lazy val keyOrdering: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(key.dataType)

  /** Heap root = the entry to EVICT first: the smallest key for max
    * (min-heap), the largest for min.
    */
  @transient private lazy val heapOrdering: Ordering[(Any, Any)] = {
    val byKey = Ordering.by[(Any, Any), Any](_._2)(keyOrdering)
    if (isMax) byKey.reverse else byKey
  }

  override def createAggregationBuffer(): mutable.PriorityQueue[(Any, Any)] =
    mutable.PriorityQueue.empty[(Any, Any)](heapOrdering)

  private def offer(heap: mutable.PriorityQueue[(Any, Any)], v: Any, k: Any): Unit = {
    if (heap.size < n) {
      heap.enqueue((v, k))
    } else {
      // replace the root iff the new key beats it
      val rootKey = heap.head._2
      val beats =
        if (isMax) keyOrdering.compare(k, rootKey) > 0
        else keyOrdering.compare(k, rootKey) < 0
      if (beats) { heap.dequeue(); heap.enqueue((v, k)) }
    }
  }

  override def update(heap: mutable.PriorityQueue[(Any, Any)], input: InternalRow): mutable.PriorityQueue[(Any, Any)] = {
    val k = key.eval(input)
    if (k != null) {
      val v = value.eval(input)
      offer(heap, if (v == null) null else InternalRow.copyValue(v),
        InternalRow.copyValue(k))
    }
    heap
  }

  override def merge(heap: mutable.PriorityQueue[(Any, Any)], other: mutable.PriorityQueue[(Any, Any)]): mutable.PriorityQueue[(Any, Any)] = {
    other.foreach { case (v, k) => offer(heap, v, k) }
    heap
  }

  override def eval(heap: mutable.PriorityQueue[(Any, Any)]): Any = {
    if (heap.isEmpty) return null
    // ordered by key: descending for max, ascending for min
    val sorted = heap.toArray.sortBy(_._2)(
      if (isMax) keyOrdering.reverse else keyOrdering)
    new GenericArrayData(sorted.map(_._1))
  }

  @transient private lazy val pairProj =
    UnsafeProjection.create(Array(value.dataType, key.dataType))

  override def serialize(heap: mutable.PriorityQueue[(Any, Any)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(heap.size)
    heap.foreach { case (v, k) =>
      val bytes = pairProj(InternalRow(v, k)).getBytes
      out.writeInt(bytes.length)
      out.write(bytes)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(storageFormat: Array[Byte]): mutable.PriorityQueue[(Any, Any)] = {
    val in = new DataInputStream(new ByteArrayInputStream(storageFormat))
    val m = in.readInt()
    val heap = createAggregationBuffer()
    var i = 0
    while (i < m) {
      val len = in.readInt()
      val bytes = new Array[Byte](len)
      in.readFully(bytes)
      val row = new UnsafeRow(2)
      row.pointTo(bytes, len)
      val v = InternalRow.copyValue(row.get(0, value.dataType))
      val k = InternalRow.copyValue(row.get(1, key.dataType))
      heap.enqueue((v, k))
      i += 1
    }
    heap
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinMaxByNAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinMaxByNAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): MinMaxByNAgg =
    copy(value = newFirst, key = newSecond, nExpr = newThird)
}
