package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.types._

/** SetDigest: HLL (cardinality) + bottom-k minhash with counts
  * (similarity), mirroring the reference's setdigest type
  * (presto-main/.../type/setdigest/SetDigest.java:50 — HLL +
  * Long2ShortRBTreeMap capped at 8192 hashes). The minhash half makes
  * two digests COMPARABLE: jaccard_index estimates set overlap from the
  * k smallest hashes, and intersection_cardinality is exact while both
  * digests hold fewer than k distinct hashes, degrading to
  * jaccard·|union| beyond (SetDigestFunctions.java:54).
  *
  * Scale story: like every sketch here, fixed-size state (~2 KB HLL +
  * ≤8192×10 B minhash) per group, associative merge — partial
  * aggregation and cross-partition re-merge carry digests, not sets.
  * This is the mergeable primitive behind "how similar are yesterday's
  * and today's crawl shards" at 100 TB.
  */
final class SetDigestSketch(val maxHashes: Int) extends Serializable {
  val hll: Array[Byte] = Hll.emptySketch()
  // hash → saturating count, smallest-k retained (TreeMap gives cheap
  // largest-entry eviction)
  val minhash = new java.util.TreeMap[java.lang.Long, java.lang.Short]()

  def add(hash: Long): Unit = {
    Hll.add(hll, hash)
    val cur = minhash.get(hash)
    if (cur != null) {
      if (cur < Short.MaxValue) minhash.put(hash, (cur + 1).toShort)
    } else if (minhash.size < maxHashes || hash < minhash.lastKey()) {
      minhash.put(hash, 1.toShort)
      if (minhash.size > maxHashes) minhash.pollLastEntry()
    }
  }

  def mergeIn(other: SetDigestSketch): Unit = {
    Hll.mergeInto(hll, other.hll)
    other.minhash.forEach { (h, c) =>
      val cur = minhash.get(h)
      if (cur != null) {
        val sum = cur.toInt + c.toInt
        minhash.put(h, math.min(sum, Short.MaxValue).toShort)
      } else minhash.put(h, c)
    }
    while (minhash.size > maxHashes) minhash.pollLastEntry()
  }

  /** Exact while every distinct hash is still retained. */
  def isExact: Boolean = minhash.size < maxHashes

  def cardinality(): Long = Hll.cardinality(hll)
}

object SetDigestCodec {
  val DefaultMaxHashes: Int = 8192
  private val Magic: Byte = 0x44 // 'D' — HLL is 0x48, GK 0x51, t-digest 0x54

  def isSetDigest(bytes: Array[Byte]): Boolean =
    bytes.nonEmpty && bytes(0) == Magic

  def serialize(sd: SetDigestSketch): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeByte(Magic)
    out.writeInt(sd.maxHashes)
    out.writeInt(sd.hll.length)
    out.write(sd.hll)
    out.writeInt(sd.minhash.size)
    sd.minhash.forEach { (h, c) => out.writeLong(h); out.writeShort(c.toInt) }
    out.flush()
    bos.toByteArray
  }

  def deserialize(bytes: Array[Byte]): SetDigestSketch = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    require(in.readByte() == Magic, "not a set digest")
    val sd = new SetDigestSketch(in.readInt())
    val hllLen = in.readInt()
    val hllBytes = new Array[Byte](hllLen)
    in.readFully(hllBytes)
    Hll.mergeInto(sd.hll, hllBytes)
    val n = in.readInt()
    var i = 0
    while (i < n) {
      sd.minhash.put(in.readLong(), in.readShort())
      i += 1
    }
    sd
  }

  /** Bottom-k Jaccard estimate (SetDigest.jaccardIndex:166): over the k
    * smallest hashes of the union, the fraction present in both — k
    * capped at the smaller digest's retained size.
    */
  def jaccard(a: SetDigestSketch, b: SetDigestSketch): Double = {
    val k = math.min(a.minhash.size, b.minhash.size)
    if (k == 0) return 0.0
    val union = new java.util.TreeSet[java.lang.Long](a.minhash.keySet())
    union.addAll(b.minhash.keySet())
    var intersection = 0
    var i = 0
    val it = union.iterator()
    while (it.hasNext && i < k) {
      val h = it.next()
      if (a.minhash.containsKey(h) && b.minhash.containsKey(h)) intersection += 1
      i += 1
    }
    intersection.toDouble / k
  }

  /** SetDigestFunctions.java:54 intersection_cardinality. */
  def intersectionCardinality(a: SetDigestSketch, b: SetDigestSketch): Long = {
    if (a.isExact && b.isExact) {
      var n = 0L
      a.minhash.keySet().forEach(h => if (b.minhash.containsKey(h)) n += 1)
      n
    } else {
      val c1 = a.cardinality()
      val c2 = b.cardinality()
      val j = jaccard(a, b)
      val merged = new SetDigestSketch(a.maxHashes)
      merged.mergeIn(a)
      merged.mergeIn(b)
      // jaccard·|union|, clamped by the smaller set (near-subset case)
      math.min(math.round(j * merged.cardinality()), math.min(c1, c2))
    }
  }
}

/** `make_set_digest(x)` (BuildSetDigestAggregation.java). */
case class MakeSetDigestAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[SetDigestSketch] with UnaryLike[Expression] {

  override def prettyName: String = "make_set_digest"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true

  override def createAggregationBuffer(): SetDigestSketch =
    new SetDigestSketch(SetDigestCodec.DefaultMaxHashes)

  override def update(buffer: SetDigestSketch, input: InternalRow): SetDigestSketch = {
    val v = child.eval(input)
    if (v != null) buffer.add(Hll.hashValue(v, child.dataType))
    buffer
  }

  override def merge(buffer: SetDigestSketch, other: SetDigestSketch): SetDigestSketch = {
    buffer.mergeIn(other)
    buffer
  }

  // empty group -> NULL, the reference's aggregation null-state contract
  // (matches TDigestAgg/KhllAgg; SetDigestStateSerializer)
  override def eval(buffer: SetDigestSketch): Any =
    if (buffer.minhash.isEmpty && buffer.cardinality() == 0L) null
    else SetDigestCodec.serialize(buffer)
  override def serialize(buffer: SetDigestSketch): Array[Byte] = SetDigestCodec.serialize(buffer)
  override def deserialize(storageFormat: Array[Byte]): SetDigestSketch =
    SetDigestCodec.deserialize(storageFormat)

  override def withNewMutableAggBufferOffset(newOffset: Int): MakeSetDigestAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MakeSetDigestAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MakeSetDigestAgg =
    copy(child = newChild)
}

/** `merge_set_digest(digest)` (MergeSetDigestAggregation.java). */
case class MergeSetDigestAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Option[SetDigestSketch]] with UnaryLike[Expression] {

  override def prettyName: String = "merge_set_digest"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true

  override def createAggregationBuffer(): Option[SetDigestSketch] = None

  override def update(buffer: Option[SetDigestSketch], input: InternalRow): Option[SetDigestSketch] = {
    val v = child.eval(input)
    if (v == null) buffer
    else {
      val incoming = SetDigestCodec.deserialize(v.asInstanceOf[Array[Byte]])
      buffer match {
        case None => Some(incoming)
        case Some(sd) => sd.mergeIn(incoming); buffer
      }
    }
  }

  override def merge(buffer: Option[SetDigestSketch], other: Option[SetDigestSketch]): Option[SetDigestSketch] =
    (buffer, other) match {
      case (Some(a), Some(b)) => a.mergeIn(b); buffer
      case (a, None) => a
      case (None, b) => b
    }

  override def eval(buffer: Option[SetDigestSketch]): Any =
    buffer.map(SetDigestCodec.serialize).orNull
  override def serialize(buffer: Option[SetDigestSketch]): Array[Byte] =
    buffer.map(SetDigestCodec.serialize).getOrElse(Array.emptyByteArray)
  override def deserialize(storageFormat: Array[Byte]): Option[SetDigestSketch] =
    if (storageFormat.isEmpty) None else Some(SetDigestCodec.deserialize(storageFormat))

  override def withNewMutableAggBufferOffset(newOffset: Int): MergeSetDigestAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MergeSetDigestAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MergeSetDigestAgg =
    copy(child = newChild)
}

/** `intersection_cardinality(d1, d2)` → BIGINT — setdigest or
  * khyperloglog by magic byte (SetDigestFunctions.java:54,
  * KHyperLogLogFunctions.java:47: Presto overloads by sketch type).
  */
case class IntersectionCardinality(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def prettyName: String = "intersection_cardinality"
  override def dataType: DataType = LongType
  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val ba = a.asInstanceOf[Array[Byte]]
    val bb = b.asInstanceOf[Array[Byte]]
    if (KhllCodec.isKhll(ba))
      KhllCodec.intersectionCardinality(KhllCodec.deserialize(ba), KhllCodec.deserialize(bb))
    else
      SetDigestCodec.intersectionCardinality(
        SetDigestCodec.deserialize(ba), SetDigestCodec.deserialize(bb))
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): IntersectionCardinality =
    copy(left = l, right = r)
}

/** `jaccard_index(d1, d2)` → DOUBLE (SetDigestFunctions.java:77,
  * KHyperLogLogFunctions.java:70) — dispatched like intersection.
  */
case class JaccardIndex(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def prettyName: String = "jaccard_index"
  override def dataType: DataType = DoubleType
  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val ba = a.asInstanceOf[Array[Byte]]
    val bb = b.asInstanceOf[Array[Byte]]
    if (KhllCodec.isKhll(ba))
      KhllCodec.jaccard(KhllCodec.deserialize(ba), KhllCodec.deserialize(bb))
    else
      SetDigestCodec.jaccard(
        SetDigestCodec.deserialize(ba), SetDigestCodec.deserialize(bb))
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): JaccardIndex =
    copy(left = l, right = r)
}

/** `hash_counts(digest)` → MAP<BIGINT, INT> (SetDigestFunctions.java). */
case class HashCounts(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def prettyName: String = "hash_counts"
  override def dataType: DataType = MapType(LongType, IntegerType, valueContainsNull = false)
  override protected def nullSafeEval(input: Any): Any = {
    val sd = SetDigestCodec.deserialize(input.asInstanceOf[Array[Byte]])
    val ks = new Array[Any](sd.minhash.size)
    val vs = new Array[Any](sd.minhash.size)
    var i = 0
    sd.minhash.forEach { (h, c) => ks(i) = h.longValue(); vs(i) = c.intValue(); i += 1 }
    new ArrayBasedMapData(new GenericArrayData(ks), new GenericArrayData(vs))
  }
  override protected def withNewChildInternal(newChild: Expression): HashCounts =
    copy(child = newChild)
}
