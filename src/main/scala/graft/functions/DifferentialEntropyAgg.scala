package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import java.util.concurrent.ThreadLocalRandom

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/** Differential-entropy state — one of the reference's four strategies
  * (differentialentropy/DifferentialEntropyStateStrategy.java):
  * reservoir-sampled Vasicek estimation (unweighted algorithm-R /
  * weighted A-Res) or fixed-histogram estimation (MLE / jackknife).
  */
sealed trait DeState
final class DeReservoir(val maxSamples: Int, val weighted: Boolean) extends DeState {
  var seenCount: Long = 0L                        // unweighted algorithm R
  var count: Int = 0
  val samples = new Array[Double](maxSamples)
  val priorities = new Array[Double](maxSamples)  // weighted A-Res min-heap keys
  var totalWeight: Double = 0.0
}
final class DeHist(val buckets: Int, val min: Double, val max: Double) extends DeState {
  val weights = new Array[Double](buckets)        // MLE: weight per bucket
}
final class DeBreakdown(val buckets: Int, val min: Double, val max: Double) extends DeState {
  // jackknife: per bucket, weight → multiplicity (FixedDoubleBreakdownHistogram)
  val perBucket: Array[mutable.Map[Double, Long]] =
    Array.fill(buckets)(mutable.Map.empty[Double, Long])
}
final class DeEmpty extends DeState               // no inputs yet

/** Presto's `differential_entropy` aggregate
  * (DifferentialEntropyAggregation.java), all three public arities:
  *
  *   differential_entropy(size, sample)                     — reservoir + Vasicek
  *   differential_entropy(size, sample, weight)             — weighted reservoir + Vasicek
  *   differential_entropy(size, sample, weight, method, min, max)
  *       method 'fixed_histogram_mle' | 'fixed_histogram_jacknife'
  *
  * The reservoir paths replicate the reference's algorithms (algorithm R
  * / A-Res with ThreadLocalRandom) and are therefore nondeterministic
  * once a group exceeds `size` samples — exactly as in the reference;
  * with size ≥ group cardinality they are deterministic (the reservoir
  * keeps everything) and that is the regime the specs and oracle pin.
  * Entropy from samples uses the Vasicek spacing estimator with the
  * reference's exact edge handling (EntropyCalculations.java:28); the
  * histogram estimators reproduce FixedHistogramMle/-JacknifeStateStrategy
  * including the max(·, 0) clamp and NaN-on-empty.
  */
case class DifferentialEntropyAgg(
    size: Expression,
    sample: Expression,
    weight: Expression,
    method: Option[String],
    minExpr: Expression,
    maxExpr: Expression,
    weightedArity: Boolean,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[DeState] {

  override def prettyName: String = "differential_entropy"
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = false

  override def children: Seq[Expression] = Seq(size, sample, weight, minExpr, maxExpr)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): DifferentialEntropyAgg =
    copy(size = newChildren(0), sample = newChildren(1), weight = newChildren(2),
      minExpr = newChildren(3), maxExpr = newChildren(4))

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = (size.dataType == IntegerType || size.dataType == LongType) &&
      sample.dataType == DoubleType && weight.dataType == DoubleType &&
      minExpr.dataType == DoubleType && maxExpr.dataType == DoubleType
    if (!ok) return TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (integral, double, double[, varchar, double, double])")
    method match {
      case Some(m) if m != "fixed_histogram_mle" && m != "fixed_histogram_jacknife" =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName: unknown method '$m' (expected fixed_histogram_mle or fixed_histogram_jacknife)")
      case _ => TypeCheckResult.TypeCheckSuccess
    }
  }

  override def createAggregationBuffer(): DeState = new DeEmpty

  private def err(msg: String): Nothing =
    throw new IllegalArgumentException(s"In differential_entropy UDF, $msg")

  private def histIndex(buckets: Int, min: Double, max: Double, v: Double): Int = {
    if (v < min || v >= max) err(s"sample must be within [min, max): $v [$min, $max)")
    math.min((buckets * (v - min) / (max - min)).toInt, buckets - 1)
  }

  override def update(state: DeState, input: InternalRow): DeState = {
    val sAny = size.eval(input)
    val vAny = sample.eval(input)
    val wAny = weight.eval(input)
    if (sAny == null || vAny == null || wAny == null) return state
    val n = sAny match { case i: Int => i.toLong; case l: Long => l }
    val v = vAny.asInstanceOf[Double]
    val w = wAny.asInstanceOf[Double]
    if (w < 0.0) err(s"weight must be non-negative: $w")
    val st = state match {
      case _: DeEmpty =>
        method match {
          case None =>
            if (n <= 0) err(s"max samples must be positive: $n")
            if (n >= 1000000) err(s"max samples must be capped: max_samples=$n, cap=1000000")
            new DeReservoir(n.toInt, weighted = weightedArity)
          case Some("fixed_histogram_mle") =>
            val (mn, mx) = evalRange(input)
            // FixedHistogramStateStrategyUtils.validateParameters: a
            // non-positive bucket count must be a clean dialect error, not
            // a NegativeArraySizeException / useless 0-bucket state
            if (n <= 0) err(s"bucket count must be positive: $n")
            new DeHist(n.toInt, mn, mx)
          case Some(_) =>
            val (mn, mx) = evalRange(input)
            if (n <= 0) err(s"bucket count must be positive: $n")
            new DeBreakdown(n.toInt, mn, mx)
        }
      case other => other
    }
    // the fixed-histogram arities carry min/max on EVERY row — re-evaluate
    // and reject drift like the reference ("inconsistent min/max"), rather
    // than silently bucketing against the first row's range
    def checkRange(mn0: Double, mx0: Double): Unit = {
      val (mn, mx) = evalRange(input)
      if (mn != mn0) err(s"inconsistent min: prev=$mn0, current=$mn")
      if (mx != mx0) err(s"inconsistent max: prev=$mx0, current=$mx")
    }
    st match {
      case r: DeReservoir =>
        if (n.toInt != r.maxSamples) err(s"inconsistent maxSamples: $n, ${r.maxSamples}")
        if (!r.weighted && w != 1.0) err(s"weight must be 1.0: $w")
        if (r.weighted) addWeighted(r, v, w) else addUnweighted(r, v)
      case h: DeHist =>
        if (n.toInt != h.buckets) err(s"inconsistent bucket count: $n, ${h.buckets}")
        checkRange(h.min, h.max)
        h.weights(histIndex(h.buckets, h.min, h.max, v)) += w
      case b: DeBreakdown =>
        if (n.toInt != b.buckets) err(s"inconsistent bucket count: $n, ${b.buckets}")
        checkRange(b.min, b.max)
        val m = b.perBucket(histIndex(b.buckets, b.min, b.max, v))
        m.update(w, m.getOrElse(w, 0L) + 1L)
      case _: DeEmpty => // unreachable
    }
    st
  }

  private def evalRange(input: InternalRow): (Double, Double) = {
    val mn = minExpr.eval(input).asInstanceOf[Double]
    val mx = maxExpr.eval(input).asInstanceOf[Double]
    if (mn >= mx) err(s"min must be larger than max: min=$mn, max=$mx")
    (mn, mx)
  }

  /** Algorithm R (UnweightedDoubleReservoirSample.add). */
  private def addUnweighted(r: DeReservoir, v: Double): Unit = {
    r.seenCount += 1
    if (r.seenCount <= r.maxSamples) {
      r.samples(r.seenCount.toInt - 1) = v
      r.count = r.seenCount.toInt
    } else {
      val idx = ThreadLocalRandom.current().nextLong(0, r.seenCount)
      if (idx < r.maxSamples) r.samples(idx.toInt) = v
    }
  }

  /** A-Res with a min-heap of priorities (WeightedDoubleReservoirSample). */
  private def addWeighted(r: DeReservoir, v: Double, w: Double): Unit = {
    r.totalWeight += w
    val priority = math.pow(ThreadLocalRandom.current().nextDouble(), 1.0 / w)
    addWithPriority(r, v, priority)
  }

  private def addWithPriority(r: DeReservoir, v: Double, priority: Double): Unit = {
    if (r.count < r.maxSamples) {
      r.samples(r.count) = v
      r.priorities(r.count) = priority
      r.count += 1
      var i = r.count - 1   // bubble up
      while (i > 0 && r.priorities((i - 1) / 2) > r.priorities(i)) {
        swap(r, i, (i - 1) / 2); i = (i - 1) / 2
      }
    } else if (priority > r.priorities(0)) {
      r.samples(0) = v
      r.priorities(0) = priority
      var i = 0             // bubble down
      var done = false
      while (!done) {
        val l = 2 * i + 1; val rr = 2 * i + 2
        var s = i
        if (l < r.count && r.priorities(l) < r.priorities(s)) s = l
        if (rr < r.count && r.priorities(rr) < r.priorities(s)) s = rr
        if (s == i) done = true else { swap(r, i, s); i = s }
      }
    }
  }

  private def swap(r: DeReservoir, i: Int, j: Int): Unit = {
    val ts = r.samples(i); r.samples(i) = r.samples(j); r.samples(j) = ts
    val tp = r.priorities(i); r.priorities(i) = r.priorities(j); r.priorities(j) = tp
  }

  override def merge(state: DeState, other: DeState): DeState = (state, other) match {
    case (s, _: DeEmpty) => s
    case (_: DeEmpty, o) => o
    case (a: DeReservoir, b: DeReservoir) =>
      if (a.maxSamples != b.maxSamples) err("inconsistent maxSamples across partials")
      if (a.weighted) {
        a.totalWeight += b.totalWeight
        var i = 0
        while (i < b.count) { addWithPriority(a, b.samples(i), b.priorities(i)); i += 1 }
        a
      } else mergeUnweighted(a, b)
    case (a: DeHist, b: DeHist) =>
      var i = 0
      while (i < a.buckets) { a.weights(i) += b.weights(i); i += 1 }
      a
    case (a: DeBreakdown, b: DeBreakdown) =>
      var i = 0
      while (i < a.buckets) {
        b.perBucket(i).foreach { case (w, c) =>
          a.perBucket(i).update(w, a.perBucket(i).getOrElse(w, 0L) + c)
        }
        i += 1
      }
      a
    case _ => err("inconsistent strategies across partials")
  }

  /** UnweightedDoubleReservoirSample.mergeWith. */
  private def mergeUnweighted(a: DeReservoir, b: DeReservoir): DeReservoir = {
    if (b.seenCount < b.maxSamples) {
      var i = 0
      while (i < b.seenCount) { addUnweighted(a, b.samples(i)); i += 1 }
      a
    } else if (a.seenCount < a.maxSamples) {
      val n = a.seenCount.toInt
      var i = 0
      while (i < n) { addUnweighted(b, a.samples(i)); i += 1 }
      b
    } else {
      // both at capacity (reference UnweightedDoubleReservoirSample.mergeWith):
      // shuffle both reservoirs, then fill each slot from a side chosen
      // proportionally to its seen count
      shuffle(a.samples, a.maxSamples)
      shuffle(b.samples, b.maxSamples)
      val merged = new Array[Double](a.maxSamples)
      var ai = 0; var bi = 0; var i = 0
      while (i < a.maxSamples) {
        if (ThreadLocalRandom.current().nextLong(0, a.seenCount + b.seenCount) < a.seenCount) {
          merged(i) = a.samples(ai); ai += 1
        } else {
          merged(i) = b.samples(bi); bi += 1
        }
        i += 1
      }
      System.arraycopy(merged, 0, a.samples, 0, a.maxSamples)
      a.seenCount += b.seenCount
      a
    }
  }

  private def shuffle(arr: Array[Double], n: Int): Unit = {
    var i = n - 1
    while (i > 0) {
      val j = ThreadLocalRandom.current().nextInt(i + 1)
      val t = arr(i); arr(i) = arr(j); arr(j) = t
      i -= 1
    }
  }

  /** Vasicek spacing estimator, reference edge handling intact
    * (EntropyCalculations.calculateFromSamplesUsingVasicek).
    */
  private def vasicek(samplesIn: Array[Double]): Double = {
    if (samplesIn.isEmpty) return Double.NaN
    val s = samplesIn.clone()
    java.util.Arrays.sort(s)
    val n = s.length
    val m = math.max(math.round(math.sqrt(n.toDouble)), 2L).toInt
    var h = 0.0
    var i = 0
    while (i < n) {
      val up = if (i + m < n) s(i + m) else s(n - 1)
      val dn = if (i - m > 0) s(i - m) else s(0)
      val a = if (i + m < n && i - m > 0) 2.0 else 1.0
      h += math.log(n / (a * m) * (up - dn))
      i += 1
    }
    h / n / math.log(2.0)
  }

  private def mleFromAggregates(width: Double, sumW: Double, sumWLogW: Double): Double =
    math.max((math.log(width * sumW) - sumWLogW / sumW) / math.log(2.0), 0.0)

  private def xLogX(x: Double): Double = if (x == 0.0) 0.0 else x * math.log(x)

  override def eval(state: DeState): Any = state match {
    case _: DeEmpty => Double.NaN
    case r: DeReservoir => vasicek(r.samples.take(r.count))
    case h: DeHist =>
      val sumW = h.weights.sum
      if (sumW == 0.0) Double.NaN
      else {
        val width = (h.max - h.min) / h.buckets
        mleFromAggregates(width, sumW, h.weights.map(xLogX).sum)
      }
    case b: DeBreakdown =>
      val bucketW = b.perBucket.map(_.map { case (w, c) => c * w }.sum)
      val sumW = bucketW.sum
      if (sumW == 0.0) Double.NaN
      else {
        val width = (b.max - b.min) / b.buckets
        val n = b.perBucket.map(_.values.sum).sum
        val sumWLogW = bucketW.map(xLogX).sum
        var entropy = n * mleFromAggregates(width, sumW, sumWLogW)
        var i = 0
        while (i < b.buckets) {
          val bw = bucketW(i)
          if (bw > 0.0) {
            b.perBucket(i).foreach { case (entryW, mult) =>
              val holdBw = math.max(bw - entryW, 0.0)
              val holdSum = sumW - bw + holdBw
              val holdWLogW = sumWLogW - xLogX(bw) + xLogX(holdBw)
              entropy -= mult * (n - 1) *
                mleFromAggregates(width, holdSum, holdWLogW) / n
            }
          }
          i += 1
        }
        entropy
      }
  }

  override def serialize(state: DeState): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val o = new DataOutputStream(bos)
    state match {
      case _: DeEmpty => o.writeByte(0)
      case r: DeReservoir =>
        o.writeByte(if (r.weighted) 2 else 1)
        o.writeInt(r.maxSamples); o.writeLong(r.seenCount); o.writeInt(r.count)
        o.writeDouble(r.totalWeight)
        var i = 0
        while (i < r.count) { o.writeDouble(r.samples(i)); o.writeDouble(r.priorities(i)); i += 1 }
      case h: DeHist =>
        o.writeByte(3)
        o.writeInt(h.buckets); o.writeDouble(h.min); o.writeDouble(h.max)
        h.weights.foreach(o.writeDouble)
      case b: DeBreakdown =>
        o.writeByte(4)
        o.writeInt(b.buckets); o.writeDouble(b.min); o.writeDouble(b.max)
        b.perBucket.foreach { m =>
          o.writeInt(m.size)
          m.foreach { case (w, c) => o.writeDouble(w); o.writeLong(c) }
        }
    }
    o.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): DeState = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    in.readByte() match {
      case 0 => new DeEmpty
      case tag @ (1 | 2) =>
        val max = in.readInt()
        val r = new DeReservoir(max, weighted = tag == 2)
        r.seenCount = in.readLong(); r.count = in.readInt()
        r.totalWeight = in.readDouble()
        var i = 0
        while (i < r.count) { r.samples(i) = in.readDouble(); r.priorities(i) = in.readDouble(); i += 1 }
        r
      case 3 =>
        val h = new DeHist(in.readInt(), in.readDouble(), in.readDouble())
        var i = 0
        while (i < h.buckets) { h.weights(i) = in.readDouble(); i += 1 }
        h
      case 4 =>
        val b = new DeBreakdown(in.readInt(), in.readDouble(), in.readDouble())
        var i = 0
        while (i < b.buckets) {
          val sz = in.readInt()
          var j = 0
          while (j < sz) { b.perBucket(i).update(in.readDouble(), in.readLong()); j += 1 }
          i += 1
        }
        b
    }
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): DifferentialEntropyAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): DifferentialEntropyAgg =
    copy(inputAggBufferOffset = newOffset)
}
