package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.types._

/** `numeric_histogram(buckets, value)` → MAP<DOUBLE, DOUBLE> — the
  * reference's streaming approximate histogram
  * (DoubleHistogramAggregation.java, which wraps the same public
  * Ben-Haim & Yom-Tov 2010 streaming-histogram algorithm implemented
  * here from the paper): keep at most `buckets` (centroid, count) bins;
  * inserting a value adds a unit bin then merges the two closest
  * centroids weighted by count. Partials merge by concatenation +
  * re-compression — commutative enough for partition-order-stable
  * estimates within the algorithm's error (exact equality is not part of
  * the contract, same as the reference).
  */
case class NumericHistogramAgg(
    bucketsExpr: Expression,
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[ArrayBuffer[(Double, Double)]] {

  override def prettyName: String = "numeric_histogram"
  override def dataType: DataType = MapType(DoubleType, DoubleType, valueContainsNull = false)
  override def nullable: Boolean = true
  override def children: Seq[Expression] = Seq(bucketsExpr, child)

  private lazy val buckets: Int = bucketsExpr.eval(InternalRow.empty) match {
    case i: Int => i
    case l: Long => l.toInt
    case other => throw new IllegalArgumentException(s"numeric_histogram buckets: $other")
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (!bucketsExpr.foldable)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        "numeric_histogram: bucket count must be a constant")
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess

  override def createAggregationBuffer(): ArrayBuffer[(Double, Double)] = ArrayBuffer.empty

  /** Insert (value, weight) keeping the buffer sorted by centroid. */
  private def insert(bins: ArrayBuffer[(Double, Double)], v: Double, w: Double): Unit = {
    var lo = 0
    var hi = bins.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (bins(mid)._1 < v) lo = mid + 1 else hi = mid
    }
    if (lo < bins.length && bins(lo)._1 == v) bins(lo) = (v, bins(lo)._2 + w)
    else bins.insert(lo, (v, w))
  }

  /** Merge closest adjacent centroids until within the bucket budget. */
  private def compress(bins: ArrayBuffer[(Double, Double)]): Unit = {
    while (bins.length > buckets) {
      var bestI = 0
      var bestGap = Double.MaxValue
      var i = 0
      while (i < bins.length - 1) {
        val gap = bins(i + 1)._1 - bins(i)._1
        if (gap < bestGap) { bestGap = gap; bestI = i }
        i += 1
      }
      val (c1, n1) = bins(bestI)
      val (c2, n2) = bins(bestI + 1)
      bins(bestI) = ((c1 * n1 + c2 * n2) / (n1 + n2), n1 + n2)
      bins.remove(bestI + 1)
    }
  }

  override def update(bins: ArrayBuffer[(Double, Double)], input: InternalRow): ArrayBuffer[(Double, Double)] = {
    val v = child.eval(input)
    if (v != null) {
      val d = v match {
        case d: Double => d
        case f: Float => f.toDouble
        case l: Long => l.toDouble
        case i: Int => i.toDouble
        case s: Short => s.toDouble
        case b: Byte => b.toDouble
        case dec: Decimal => dec.toDouble
        case other => throw new IllegalArgumentException(s"numeric_histogram: $other")
      }
      insert(bins, d, 1.0)
      compress(bins)
    }
    bins
  }

  override def merge(bins: ArrayBuffer[(Double, Double)], other: ArrayBuffer[(Double, Double)]): ArrayBuffer[(Double, Double)] = {
    other.foreach { case (c, n) => insert(bins, c, n) }
    compress(bins)
    bins
  }

  override def eval(bins: ArrayBuffer[(Double, Double)]): Any = {
    if (bins.isEmpty) return null
    new ArrayBasedMapData(
      new GenericArrayData(bins.map(_._1).toArray),
      new GenericArrayData(bins.map(_._2).toArray))
  }

  override def serialize(bins: ArrayBuffer[(Double, Double)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(bins.length)
    bins.foreach { case (c, n) => out.writeDouble(c); out.writeDouble(n) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(storageFormat: Array[Byte]): ArrayBuffer[(Double, Double)] = {
    val in = new DataInputStream(new ByteArrayInputStream(storageFormat))
    val n = in.readInt()
    val bins = ArrayBuffer.empty[(Double, Double)]
    var i = 0
    while (i < n) { bins += ((in.readDouble(), in.readDouble())); i += 1 }
    bins
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): NumericHistogramAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): NumericHistogramAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): NumericHistogramAgg =
    copy(bucketsExpr = newChildren(0), child = newChildren(1))
}
