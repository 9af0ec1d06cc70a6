package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{GenericArrayData, QuantileSummaries}
import org.apache.spark.sql.types._

/** Re-aggregatable quantile sketch: the reference's qdigest/tdigest
  * surface (`qdigest_agg` / `merge` / `value_at_quantile`,
  * QuantileDigestAggregationFunction.java:32, TDigestAggregationFunction
  * .java:29, scalar/QuantileDigestFunctions.java) built on the
  * Greenwald-Khanna summary (public algorithm; Spark ships an
  * implementation as catalyst's QuantileSummaries).
  *
  * Value-compatible, not byte-compatible (SURVEY.md §7.3): quantile
  * estimates agree within the sketch's error bound ε; the serialized
  * layout (magic ‖ ε ‖ count ‖ sampled triples) is our own.
  *
  * The 100 TB story is the same as HLL's: per-partition sketches of
  * bounded size (O(1/ε · log εN) samples) shuffle instead of raw rows,
  * and stored sketches re-merge across days/partitions without touching
  * the source data.
  */
object QSketch {
  val DefaultEps: Double = 0.01
  private val Magic: Byte = 0x51 // 'Q'

  def serialize(qs: QuantileSummaries): Array[Byte] = {
    val flat = qs.compress()
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeByte(Magic)
    out.writeDouble(flat.relativeError)
    out.writeLong(flat.count)
    out.writeInt(flat.sampled.length)
    flat.sampled.foreach { s =>
      out.writeDouble(s.value); out.writeLong(s.g); out.writeLong(s.delta)
    }
    out.flush()
    bos.toByteArray
  }

  def deserialize(bytes: Array[Byte]): QuantileSummaries = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    require(in.readByte() == Magic, "not a qsketch")
    val eps = in.readDouble()
    val count = in.readLong()
    val n = in.readInt()
    val sampled = Array.fill(n) {
      QuantileSummaries.Stats(in.readDouble(), in.readLong(), in.readLong())
    }
    new QuantileSummaries(
      QuantileSummaries.defaultCompressThreshold, eps, sampled, count, true)
  }

  def quantile(bytes: Array[Byte], q: Double): Option[Double] =
    deserialize(bytes).query(q)
}

/** The engine's two quantile-sketch encodings (GK summary 0x51, t-digest
  * 0x54) share BinaryType, so the decode scalars (`value_at_quantile`
  * et al. — Presto overloads them per sketch type) dispatch on the
  * leading magic byte.
  */
object SketchDispatch {

  /** scale_qdigest / scale_tdigest (QuantileDigestFunctions.java
    * scaleQDigest, TDigestFunctions.java scaleTDigest): multiply the
    * sketch's weights by a positive factor — the tool for weighting
    * sketches before a merge. GK scales (g, delta, count); t-digest
    * re-adds its centroids at scaled weight.
    */
  def scale(bytes: Array[Byte], factor: Double): Array[Byte] = {
    require(factor > 0, "scale factor should be positive")
    if (TDigestCodec.isTDigest(bytes)) {
      val td = TDigestCodec.deserialize(bytes)
      val (means, weights, n) = td.centroids
      val out = new TDigest(td.compression)
      var i = 0
      while (i < n) { out.add(means(i), weights(i) * factor); i += 1 }
      TDigestCodec.serialize(out)
    } else {
      val qs = QSketch.deserialize(bytes)
      val scaled = qs.sampled.map(s => QuantileSummaries.Stats(s.value,
        math.max(1L, math.round(s.g * factor)), math.round(s.delta * factor)))
      QSketch.serialize(new QuantileSummaries(
        QuantileSummaries.defaultCompressThreshold, qs.relativeError,
        scaled, math.round(qs.count * factor), true))
    }
  }

  def quantile(bytes: Array[Byte], q: Double): Option[Double] =
    if (TDigestCodec.isTDigest(bytes)) {
      val v = TDigestCodec.deserialize(bytes).quantile(q)
      if (v.isNaN) None else Some(v)
    } else QSketch.quantile(bytes, q)

  def rank(bytes: Array[Byte], x: Double): Option[Double] =
    if (TDigestCodec.isTDigest(bytes)) {
      val v = TDigestCodec.deserialize(bytes).cdf(x)
      if (v.isNaN) None else Some(v)
    } else {
      val summary = QSketch.deserialize(bytes)
      var lo = 0.0
      var hi = 1.0
      var i = 0
      while (i < 20) {
        val mid = (lo + hi) / 2
        summary.query(mid) match {
          case Some(q) => if (q < x) lo = mid else hi = mid
          case None => return None
        }
        i += 1
      }
      Some((lo + hi) / 2)
    }
}

/** `qdigest_agg(x[, eps])` → VARBINARY quantile sketch. */
case class QDigestAgg(
    child: Expression,
    eps: Double = QSketch.DefaultEps,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[QuantileSummaries] with UnaryLike[Expression] {

  override def prettyName: String = "qdigest_agg"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true

  override def createAggregationBuffer(): QuantileSummaries =
    new QuantileSummaries(QuantileSummaries.defaultCompressThreshold, eps)

  override def update(buffer: QuantileSummaries, input: InternalRow): QuantileSummaries = {
    val v = child.eval(input)
    if (v != null) buffer.insert(v match {
      case d: Double => d
      case f: Float => f.toDouble
      case l: Long => l.toDouble
      case i: Int => i.toDouble
      case s: Short => s.toDouble
      case b: Byte => b.toDouble
      case d: Decimal => d.toDouble
      case other => throw new IllegalArgumentException(s"qdigest_agg: non-numeric $other")
    })
    else buffer
  }

  override def merge(buffer: QuantileSummaries, other: QuantileSummaries): QuantileSummaries =
    buffer.compress().merge(other.compress())

  override def eval(buffer: QuantileSummaries): Any = QSketch.serialize(buffer)
  override def serialize(buffer: QuantileSummaries): Array[Byte] = QSketch.serialize(buffer)
  override def deserialize(storageFormat: Array[Byte]): QuantileSummaries =
    QSketch.deserialize(storageFormat)

  override def withNewMutableAggBufferOffset(newOffset: Int): QDigestAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): QDigestAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): QDigestAgg =
    copy(child = newChild)
}

/** `merge_qdigest(sketch)` — union of quantile sketches. */
case class MergeQDigestAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Option[QuantileSummaries]] with UnaryLike[Expression] {

  override def prettyName: String = "merge_qdigest"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true

  override def createAggregationBuffer(): Option[QuantileSummaries] = None

  override def update(buffer: Option[QuantileSummaries], input: InternalRow): Option[QuantileSummaries] = {
    val v = child.eval(input)
    if (v == null) buffer
    else {
      val incoming = QSketch.deserialize(v.asInstanceOf[Array[Byte]])
      buffer match {
        case None => Some(incoming)
        case Some(qs) => Some(qs.compress().merge(incoming.compress()))
      }
    }
  }

  override def merge(buffer: Option[QuantileSummaries], other: Option[QuantileSummaries]): Option[QuantileSummaries] =
    (buffer, other) match {
      case (Some(a), Some(b)) => Some(a.compress().merge(b.compress()))
      case (a, None) => a
      case (None, b) => b
    }

  override def eval(buffer: Option[QuantileSummaries]): Any =
    buffer.map(QSketch.serialize).orNull
  override def serialize(buffer: Option[QuantileSummaries]): Array[Byte] =
    buffer.map(QSketch.serialize).getOrElse(Array.emptyByteArray)
  override def deserialize(storageFormat: Array[Byte]): Option[QuantileSummaries] =
    if (storageFormat.isEmpty) None else Some(QSketch.deserialize(storageFormat))

  override def withNewMutableAggBufferOffset(newOffset: Int): MergeQDigestAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MergeQDigestAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MergeQDigestAgg =
    copy(child = newChild)
}

/** `value_at_quantile(sketch, q)` → DOUBLE (QuantileDigestFunctions.java). */
case class ValueAtQuantile(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def prettyName: String = "value_at_quantile"
  override def dataType: DataType = DoubleType

  override protected def nullSafeEval(sketch: Any, q: Any): Any =
    SketchDispatch.quantile(sketch.asInstanceOf[Array[Byte]], q.asInstanceOf[Double]).orNull

  override protected def withNewChildrenInternal(l: Expression, r: Expression): ValueAtQuantile =
    copy(left = l, right = r)
}

/** `quantile_at_value(sketch, x)` → DOUBLE rank of x in [0,1]
  * (QuantileDigestFunctions.java quantile_at_value) — inverse quantile by
  * bisection over the summary (20 steps ≈ 1e-6 rank precision, well
  * inside the sketch's own ε).
  */
case class QuantileAtValue(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def prettyName: String = "quantile_at_value"
  override def dataType: DataType = DoubleType

  override protected def nullSafeEval(sketch: Any, v: Any): Any =
    SketchDispatch.rank(sketch.asInstanceOf[Array[Byte]], v.asInstanceOf[Double]).orNull

  override protected def withNewChildrenInternal(l: Expression, r: Expression): QuantileAtValue =
    copy(left = l, right = r)
}

/** `quantiles_at_values(sketch, array(x...))` → ARRAY<DOUBLE> of ranks
  * (QuantileDigestFunctions.java quantiles_at_values — the plural
  * inverse-quantile).
  */
case class QuantilesAtValues(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def prettyName: String = "quantiles_at_values"
  override def dataType: DataType = ArrayType(DoubleType)

  override protected def nullSafeEval(sketch: Any, vs: Any): Any = {
    val bytes = sketch.asInstanceOf[Array[Byte]]
    val arr = vs.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    new GenericArrayData(
      arr.toDoubleArray().map(v => SketchDispatch.rank(bytes, v).map(Double.box).orNull))
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): QuantilesAtValues =
    copy(left = l, right = r)
}

/** `values_at_quantiles(sketch, array(q...))` → ARRAY<DOUBLE>. */
case class ValuesAtQuantiles(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def prettyName: String = "values_at_quantiles"
  override def dataType: DataType = ArrayType(DoubleType)

  override protected def nullSafeEval(sketch: Any, qs: Any): Any = {
    val bytes = sketch.asInstanceOf[Array[Byte]]
    val arr = qs.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    new GenericArrayData(
      arr.toDoubleArray().map(q => SketchDispatch.quantile(bytes, q).map(Double.box).orNull))
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): ValuesAtQuantiles =
    copy(left = l, right = r)
}
