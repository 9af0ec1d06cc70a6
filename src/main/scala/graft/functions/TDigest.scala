package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.{BinaryLike, UnaryLike}
import org.apache.spark.sql.types._

/** Merging t-digest (Dunning & Ertl, "Computing Extremely Accurate
  * Quantiles Using t-Digests" — public algorithm; the reference wraps
  * its own implementation in TDigestAggregationFunction.java:29 /
  * scalar/TDigestFunctions.java). Centroid sizes are bounded by the k1
  * scale function k(q) = δ/2π·asin(2q−1), which concentrates resolution
  * at the tails — the property that distinguishes a t-digest from the
  * uniform-error GK summary (QuantileSketch.scala) and makes p99.9
  * latency-style quantiles accurate.
  *
  * Weighted inserts (tdigest_agg(x, w)) and digest-to-digest merge are
  * both the same buffered merge-compress; merge is associative and
  * order-insensitive within the sketch's error bound, so partial
  * aggregation and AQE replanning are safe. Size is O(δ) centroids
  * (δ = 100 default ⇒ ~1 KB serialized) regardless of input count —
  * the shuffle carries sketches, never rows.
  */
final class TDigest(val compression: Double) extends Serializable {
  private var means = new Array[Double](16)
  private var weightsArr = new Array[Double](16)
  private var n = 0 // merged centroid count
  var totalWeight: Double = 0.0
  var min: Double = Double.PositiveInfinity
  var max: Double = Double.NegativeInfinity

  // unmerged insert buffer: amortizes the sort-merge to O(log) per insert
  private val bufCap = math.max(64, (4 * compression).toInt)
  private var bufMeans = new Array[Double](bufCap)
  private var bufWeights = new Array[Double](bufCap)
  private var bufN = 0

  def add(x: Double, w: Double = 1.0): Unit = {
    require(!x.isNaN, "t-digest: NaN value")
    if (bufN == bufCap) compress()
    bufMeans(bufN) = x
    bufWeights(bufN) = w
    bufN += 1
    if (x < min) min = x
    if (x > max) max = x
  }

  def mergeIn(other: TDigest): Unit = {
    other.compress()
    var i = 0
    while (i < other.n) {
      if (bufN == bufCap) compress()
      bufMeans(bufN) = other.means(i)
      bufWeights(bufN) = other.weightsArr(i)
      bufN += 1
      i += 1
    }
    if (other.min < min) min = other.min
    if (other.max > max) max = other.max
  }

  private def kOfQ(q: Double): Double =
    compression / (2 * math.Pi) * math.asin(2 * math.min(math.max(q, 0.0), 1.0) - 1)
  private def qOfK(k: Double): Double = {
    val x = 2 * math.Pi * k / compression
    if (x <= -math.Pi / 2) 0.0
    else if (x >= math.Pi / 2) 1.0
    else (math.sin(x) + 1) / 2
  }

  /** Fold the insert buffer into the centroid list (the merging step). */
  def compress(): Unit = {
    if (bufN == 0) return
    // gather all (merged + buffered) centroids, sort by mean
    val total = n + bufN
    val ms = new Array[Double](total)
    val ws = new Array[Double](total)
    System.arraycopy(means, 0, ms, 0, n)
    System.arraycopy(weightsArr, 0, ws, 0, n)
    System.arraycopy(bufMeans, 0, ms, n, bufN)
    System.arraycopy(bufWeights, 0, ws, n, bufN)
    val order = (0 until total).sortBy(i => ms(i))
    val w = ws.sum

    val outM = new Array[Double](total)
    val outW = new Array[Double](total)
    var outN = 0
    var wSoFar = 0.0
    var qLimit = qOfK(kOfQ(0.0) + 1.0)
    var curM = ms(order.head)
    var curW = ws(order.head)
    var i = 1
    while (i < total) {
      val idx = order(i)
      val cm = ms(idx)
      val cw = ws(idx)
      if ((wSoFar + curW + cw) / w <= qLimit) {
        // merge into the current centroid (weighted mean)
        curM = curM + (cm - curM) * cw / (curW + cw)
        curW += cw
      } else {
        outM(outN) = curM; outW(outN) = curW; outN += 1
        wSoFar += curW
        qLimit = qOfK(kOfQ(wSoFar / w) + 1.0)
        curM = cm; curW = cw
      }
      i += 1
    }
    outM(outN) = curM; outW(outN) = curW; outN += 1

    means = outM
    weightsArr = outW
    n = outN
    totalWeight = w
    bufN = 0
  }

  def centroidCount: Int = { compress(); n }

  /** Quantile estimate: piecewise-linear interpolation between centroid
    * midpoints, anchored at the exact min/max.
    */
  def quantile(q: Double): Double = {
    compress()
    require(q >= 0 && q <= 1, s"quantile must be in [0,1]: $q")
    if (n == 0) return Double.NaN
    if (n == 1) return means(0)
    val target = q * totalWeight
    if (target <= weightsArr(0) / 2) {
      // below the first centroid's midpoint: interpolate from min
      val first = weightsArr(0) / 2
      return min + (means(0) - min) * (if (first <= 0) 1.0 else target / first)
    }
    var cum = 0.0
    var i = 0
    while (i < n - 1) {
      val mid = cum + weightsArr(i) / 2
      val nextMid = cum + weightsArr(i) + weightsArr(i + 1) / 2
      if (target <= nextMid) {
        if (target <= mid) return means(i)
        val frac = (target - mid) / (nextMid - mid)
        return means(i) + (means(i + 1) - means(i)) * frac
      }
      cum += weightsArr(i)
      i += 1
    }
    // above the last centroid's midpoint: interpolate toward max
    val lastMid = cum + weightsArr(n - 1) / 2
    val span = totalWeight - lastMid
    if (span <= 0) max
    else math.min(max, means(n - 1) + (max - means(n - 1)) * ((target - lastMid) / span))
  }

  /** Rank of x in [0,1] (cdf) — inverse of quantile, same interpolation. */
  def cdf(x: Double): Double = {
    compress()
    if (n == 0) return Double.NaN
    if (x <= min) return 0.0
    if (x >= max) return 1.0
    if (n == 1) return if (x < means(0)) 0.0 else 1.0
    if (x < means(0)) {
      val first = weightsArr(0) / 2
      return (x - min) / (means(0) - min) * first / totalWeight
    }
    var cum = 0.0
    var i = 0
    while (i < n - 1) {
      val mid = cum + weightsArr(i) / 2
      val nextMid = cum + weightsArr(i) + weightsArr(i + 1) / 2
      if (x < means(i + 1)) {
        val frac =
          if (means(i + 1) == means(i)) 0.0
          else (x - means(i)) / (means(i + 1) - means(i))
        return math.min(1.0, (mid + (nextMid - mid) * math.max(frac, 0.0)) / totalWeight)
      }
      cum += weightsArr(i)
      i += 1
    }
    val lastMid = cum + weightsArr(n - 1) / 2
    val frac = (x - means(n - 1)) / (max - means(n - 1))
    math.min(1.0, (lastMid + (totalWeight - lastMid) * frac) / totalWeight)
  }

  private[functions] def centroids: (Array[Double], Array[Double], Int) = {
    compress()
    (means, weightsArr, n)
  }
}

object TDigestCodec {
  val DefaultCompression: Double = 100.0
  private val Magic: Byte = 0x54 // 'T' — distinguishes from QSketch's 0x51

  def isTDigest(bytes: Array[Byte]): Boolean =
    bytes.nonEmpty && bytes(0) == Magic

  def serialize(td: TDigest): Array[Byte] = {
    val (ms, ws, n) = td.centroids
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeByte(Magic)
    out.writeDouble(td.compression)
    out.writeDouble(td.min)
    out.writeDouble(td.max)
    out.writeInt(n)
    var i = 0
    while (i < n) { out.writeDouble(ms(i)); out.writeDouble(ws(i)); i += 1 }
    out.flush()
    bos.toByteArray
  }

  def deserialize(bytes: Array[Byte]): TDigest = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    require(in.readByte() == Magic, "not a t-digest")
    val td = new TDigest(in.readDouble())
    val mn = in.readDouble()
    val mx = in.readDouble()
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val m = in.readDouble()
      val w = in.readDouble()
      td.add(m, w)
      i += 1
    }
    // restore true extrema (add() clamped them to centroid means)
    td.min = mn
    td.max = mx
    td
  }
}

/** `tdigest_agg(x[, w])` → VARBINARY t-digest
  * (TDigestAggregationFunction.java:29; weight arity included).
  */
case class TDigestAgg(
    left: Expression,
    right: Expression,
    compression: Double = TDigestCodec.DefaultCompression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TDigest] with BinaryLike[Expression] {

  override def prettyName: String = "tdigest_agg"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true

  override def createAggregationBuffer(): TDigest = new TDigest(compression)

  private def toDouble(v: Any): Double = v match {
    case d: Double => d
    case f: Float => f.toDouble
    case l: Long => l.toDouble
    case i: Int => i.toDouble
    case s: Short => s.toDouble
    case b: Byte => b.toDouble
    case d: Decimal => d.toDouble
    case other => throw new IllegalArgumentException(s"tdigest_agg: non-numeric $other")
  }

  override def update(buffer: TDigest, input: InternalRow): TDigest = {
    val v = left.eval(input)
    if (v != null) {
      val w = right.eval(input)
      if (w != null) buffer.add(toDouble(v), toDouble(w))
    }
    buffer
  }

  override def merge(buffer: TDigest, other: TDigest): TDigest = {
    buffer.mergeIn(other)
    buffer
  }

  override def eval(buffer: TDigest): Any =
    if (buffer.totalWeight == 0 && buffer.centroidCount == 0) null
    else TDigestCodec.serialize(buffer)
  override def serialize(buffer: TDigest): Array[Byte] = TDigestCodec.serialize(buffer)
  override def deserialize(storageFormat: Array[Byte]): TDigest =
    TDigestCodec.deserialize(storageFormat)

  override def withNewMutableAggBufferOffset(newOffset: Int): TDigestAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TDigestAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): TDigestAgg =
    copy(left = l, right = r)
}

/** `merge_tdigest(sketch)` — union of t-digests. */
case class MergeTDigestAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Option[TDigest]] with UnaryLike[Expression] {

  override def prettyName: String = "merge_tdigest"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true

  override def createAggregationBuffer(): Option[TDigest] = None

  override def update(buffer: Option[TDigest], input: InternalRow): Option[TDigest] = {
    val v = child.eval(input)
    if (v == null) buffer
    else {
      val incoming = TDigestCodec.deserialize(v.asInstanceOf[Array[Byte]])
      buffer match {
        case None => Some(incoming)
        case Some(td) => td.mergeIn(incoming); buffer
      }
    }
  }

  override def merge(buffer: Option[TDigest], other: Option[TDigest]): Option[TDigest] =
    (buffer, other) match {
      case (Some(a), Some(b)) => a.mergeIn(b); buffer
      case (a, None) => a
      case (None, b) => b
    }

  override def eval(buffer: Option[TDigest]): Any =
    buffer.map(TDigestCodec.serialize).orNull
  override def serialize(buffer: Option[TDigest]): Array[Byte] =
    buffer.map(TDigestCodec.serialize).getOrElse(Array.emptyByteArray)
  override def deserialize(storageFormat: Array[Byte]): Option[TDigest] =
    if (storageFormat.isEmpty) None else Some(TDigestCodec.deserialize(storageFormat))

  override def withNewMutableAggBufferOffset(newOffset: Int): MergeTDigestAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MergeTDigestAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MergeTDigestAgg =
    copy(child = newChild)
}
