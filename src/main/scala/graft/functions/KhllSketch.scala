package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.{BinaryLike, UnaryLike}
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.types._

/** KHyperLogLog: bottom-k minhash over a key column where every retained
  * hash carries an HLL of the values seen with that key (reference
  * presto-main/.../type/khyperloglog/KHyperLogLog.java:55 — the
  * uniqueness/reidentification sketch: "how many users does each value
  * of this column identify?"). Exact while fewer than maxSize (4096)
  * distinct keys; beyond that, cardinality extrapolates from the
  * bottom-k hash density (Beyer et al., "On Synopses for Distinct-Value
  * Estimation Under Multiset Operations") and the distribution functions
  * operate on the retained uniform sample of keys.
  *
  * Fixed-size mergeable state (≤ 4096 × ~2 KB HLLs) — per-partition
  * partials shuffle as sketches; the privacy-style scan over a 100 TB
  * table never materializes per-key groups.
  */
final class KhllSketch(val maxSize: Int) extends Serializable {
  // key hash → HLL sketch of paired values, k smallest key hashes kept
  val minhash = new java.util.TreeMap[java.lang.Long, Array[Byte]]()

  def isExact: Boolean = minhash.size < maxSize

  def add(keyHash: Long, valueHash: Long): Unit = {
    val existing = minhash.get(keyHash)
    if (existing != null) {
      Hll.add(existing, valueHash)
    } else if (isExact || keyHash < minhash.lastKey()) {
      val h = Hll.emptySketch()
      Hll.add(h, valueHash)
      minhash.put(keyHash, h)
      while (minhash.size > maxSize) minhash.pollLastEntry()
    }
  }

  def mergeIn(other: KhllSketch): Unit = {
    other.minhash.forEach { (k, hll) =>
      val existing = minhash.get(k)
      if (existing != null) Hll.mergeInto(existing, hll)
      else minhash.put(k, hll.clone())
    }
    while (minhash.size > maxSize) minhash.pollLastEntry()
  }

  /** Distinct keys: exact below the cap, density-extrapolated beyond
    * (KHyperLogLog.cardinality:259).
    */
  def cardinality(): Long = {
    if (isExact) return minhash.size.toLong
    val hashesRange = minhash.lastKey() - Long.MinValue
    val halfDensity = java.lang.Long.divideUnsigned(hashesRange, minhash.size - 1) / 2.0
    (Long.MaxValue / halfDensity).toLong
  }

  /** Fraction of keys mapping to ≤ threshold distinct values. */
  def reidentificationPotential(threshold: Long): Double = {
    if (minhash.isEmpty) return 0.0
    var unique = 0L
    minhash.forEach((_, hll) => if (Hll.cardinality(hll) <= threshold) unique += 1)
    unique.toDouble / minhash.size
  }

  /** Histogram over 1..histogramSize of per-key value-cardinalities, as
    * fractions of the retained keys (KHyperLogLog.uniquenessDistribution:312).
    */
  def uniquenessDistribution(histogramSize: Long): java.util.TreeMap[Long, Double] = {
    val out = new java.util.TreeMap[Long, Double]()
    var b = 1L
    while (b <= histogramSize) { out.put(b, 0.0); b += 1 }
    val size = minhash.size
    if (size == 0) return out
    minhash.forEach { (_, hll) =>
      val bucket = math.min(Hll.cardinality(hll), histogramSize)
      out.put(bucket, out.get(bucket) + 1.0 / size)
    }
    out
  }
}

object KhllCodec {
  val DefaultMaxSize: Int = 4096
  val DefaultHistogramSize: Long = 256L
  private val Magic: Byte = 0x4B // 'K'

  def isKhll(bytes: Array[Byte]): Boolean = bytes.nonEmpty && bytes(0) == Magic

  def serialize(k: KhllSketch): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeByte(Magic)
    out.writeInt(k.maxSize)
    out.writeInt(k.minhash.size)
    k.minhash.forEach { (h, hll) =>
      out.writeLong(h)
      out.writeInt(hll.length)
      out.write(hll)
    }
    out.flush()
    bos.toByteArray
  }

  def deserialize(bytes: Array[Byte]): KhllSketch = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    require(in.readByte() == Magic, "not a khyperloglog")
    val k = new KhllSketch(in.readInt())
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val h = in.readLong()
      val len = in.readInt()
      val hll = new Array[Byte](len)
      in.readFully(hll)
      k.minhash.put(h, hll)
      i += 1
    }
    k
  }

  /** Bottom-k overlap estimates over the shared minhash space
    * (KHyperLogLogFunctions.java:47,:70 — same shape as SetDigest's).
    */
  def jaccard(a: KhllSketch, b: KhllSketch): Double = {
    val k = math.min(a.minhash.size, b.minhash.size)
    if (k == 0) return 0.0
    val union = new java.util.TreeSet[java.lang.Long](a.minhash.keySet())
    union.addAll(b.minhash.keySet())
    var inter = 0
    var i = 0
    val it = union.iterator()
    while (it.hasNext && i < k) {
      val h = it.next()
      if (a.minhash.containsKey(h) && b.minhash.containsKey(h)) inter += 1
      i += 1
    }
    inter.toDouble / k
  }

  def intersectionCardinality(a: KhllSketch, b: KhllSketch): Long = {
    if (a.isExact && b.isExact) {
      var n = 0L
      a.minhash.keySet().forEach(h => if (b.minhash.containsKey(h)) n += 1)
      n
    } else {
      val c1 = a.cardinality()
      val c2 = b.cardinality()
      val j = jaccard(a, b)
      val merged = new KhllSketch(math.min(a.maxSize, b.maxSize))
      merged.mergeIn(a)
      merged.mergeIn(b)
      math.min(math.round(j * merged.cardinality()), math.min(c1, c2))
    }
  }
}

/** `khyperloglog_agg(x, uii)` (KHyperLogLogAggregationFunction.java). */
case class KhllAgg(
    left: Expression,
    right: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KhllSketch] with BinaryLike[Expression] {

  override def prettyName: String = "khyperloglog_agg"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true

  override def createAggregationBuffer(): KhllSketch =
    new KhllSketch(KhllCodec.DefaultMaxSize)

  override def update(buffer: KhllSketch, input: InternalRow): KhllSketch = {
    val k = left.eval(input)
    val v = right.eval(input)
    if (k != null && v != null)
      buffer.add(Hll.hashValue(k, left.dataType), Hll.hashValue(v, right.dataType))
    buffer
  }

  override def merge(buffer: KhllSketch, other: KhllSketch): KhllSketch = {
    buffer.mergeIn(other)
    buffer
  }

  // empty group -> NULL, the reference's aggregation null-state contract
  // (matches TDigestAgg here; KHyperLogLogAggregationFunction)
  override def eval(buffer: KhllSketch): Any =
    if (buffer.minhash.isEmpty) null else KhllCodec.serialize(buffer)
  override def serialize(buffer: KhllSketch): Array[Byte] = KhllCodec.serialize(buffer)
  override def deserialize(storageFormat: Array[Byte]): KhllSketch =
    KhllCodec.deserialize(storageFormat)

  override def withNewMutableAggBufferOffset(newOffset: Int): KhllAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KhllAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): KhllAgg =
    copy(left = l, right = r)
}

/** `merge_khll(sketch)` (MergeKHyperLogLogAggregationFunction.java). */
case class MergeKhllAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Option[KhllSketch]] with UnaryLike[Expression] {

  override def prettyName: String = "merge_khll"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true

  override def createAggregationBuffer(): Option[KhllSketch] = None

  override def update(buffer: Option[KhllSketch], input: InternalRow): Option[KhllSketch] = {
    val v = child.eval(input)
    if (v == null) buffer
    else {
      val incoming = KhllCodec.deserialize(v.asInstanceOf[Array[Byte]])
      buffer match {
        case None => Some(incoming)
        case Some(k) => k.mergeIn(incoming); buffer
      }
    }
  }

  override def merge(buffer: Option[KhllSketch], other: Option[KhllSketch]): Option[KhllSketch] =
    (buffer, other) match {
      case (Some(a), Some(b)) => a.mergeIn(b); buffer
      case (a, None) => a
      case (None, b) => b
    }

  override def eval(buffer: Option[KhllSketch]): Any =
    buffer.map(KhllCodec.serialize).orNull
  override def serialize(buffer: Option[KhllSketch]): Array[Byte] =
    buffer.map(KhllCodec.serialize).getOrElse(Array.emptyByteArray)
  override def deserialize(storageFormat: Array[Byte]): Option[KhllSketch] =
    if (storageFormat.isEmpty) None else Some(KhllCodec.deserialize(storageFormat))

  override def withNewMutableAggBufferOffset(newOffset: Int): MergeKhllAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MergeKhllAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MergeKhllAgg =
    copy(child = newChild)
}

/** `uniqueness_distribution(khll[, histogramSize])` → MAP<BIGINT, DOUBLE>. */
case class UniquenessDistribution(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def prettyName: String = "uniqueness_distribution"
  override def dataType: DataType = MapType(LongType, DoubleType, valueContainsNull = false)
  override protected def nullSafeEval(sketch: Any, size: Any): Any = {
    val dist = KhllCodec.deserialize(sketch.asInstanceOf[Array[Byte]])
      .uniquenessDistribution(size.asInstanceOf[Long])
    val ks = new Array[Any](dist.size)
    val vs = new Array[Any](dist.size)
    var i = 0
    dist.forEach { (k, v) => ks(i) = k; vs(i) = v; i += 1 }
    new ArrayBasedMapData(new GenericArrayData(ks), new GenericArrayData(vs))
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): UniquenessDistribution =
    copy(left = l, right = r)
}

/** `reidentification_potential(khll, threshold)` → DOUBLE. */
case class ReidentificationPotential(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def prettyName: String = "reidentification_potential"
  override def dataType: DataType = DoubleType
  override protected def nullSafeEval(sketch: Any, threshold: Any): Any =
    KhllCodec.deserialize(sketch.asInstanceOf[Array[Byte]])
      .reidentificationPotential(threshold.asInstanceOf[Long])
  override protected def withNewChildrenInternal(l: Expression, r: Expression): ReidentificationPotential =
    copy(left = l, right = r)
}
