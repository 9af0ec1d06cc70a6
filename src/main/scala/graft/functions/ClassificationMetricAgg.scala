package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Mutable precision-recall curve state: two fixed equal-width weight
  * histograms over pred ∈ [0,1) (reference FixedDoubleHistogram.java) —
  * O(buckets) memory regardless of group size.
  */
final class PrCurveState(
    var buckets: Int,                 // -1 until the first input arrives
    var trueW: Array[Double],
    var falseW: Array[Double])

/** The reference's classification-metric aggregate family
  * (presto-main/.../aggregation/PrecisionRecallAggregation.java +
  * ClassificationPrecision/Recall/MissRate/FallOut/Thresholds):
  * `classification_<metric>(buckets, outcome, pred[, weight])` → array
  * of the metric at thresholds i/buckets, stopping after the bucket that
  * exhausts the true-outcome weight (the reference iterator's hasNext).
  *
  * Formulas are matched to the REFERENCE'S OWN TESTS
  * (TestClassificationMissRateAggregation.java pins
  * missRate = remainingFalseWeight/totalTrueWeight), which in 0.235
  * swap FN/FP relative to the textbook definitions for miss_rate and
  * fall_out (BucketResult assigns falsePositive = true-weight-below-
  * threshold). precision/recall/thresholds agree with the textbook;
  * the two quirks are reproduced bug-for-bug and documented here:
  *   thresholds_i = i/B
  *   precision_i  = TP / (TP + FP)                  (textbook)
  *   recall_i     = TP / totalTrue                  (textbook)
  *   miss_rate_i  = FP / totalTrue                  (0.235 quirk; textbook: FN/totalTrue)
  *   fall_out_i   = FN / totalFalse                 (0.235 quirk; textbook: FP/totalFalse)
  * with TP = true weight ≥ t, FN = true weight < t, FP = false weight ≥ t.
  */
case class ClassificationMetricAgg(
    bucketCount: Expression,
    outcome: Expression,
    pred: Expression,
    weight: Expression,
    metric: String,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[PrCurveState] {

  // effective max pred so the bin for exactly 1.0 stays in range
  // (reference MAX_PREDICTION_VALUE_FOR_HISTOGRAM)
  private val MaxPredForHistogram = 0.99999999999

  override def prettyName: String = s"classification_$metric"
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = false

  override def children: Seq[Expression] = Seq(bucketCount, outcome, pred, weight)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ClassificationMetricAgg =
    copy(bucketCount = newChildren(0), outcome = newChildren(1),
      pred = newChildren(2), weight = newChildren(3))

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = (bucketCount.dataType == IntegerType || bucketCount.dataType == LongType) &&
      outcome.dataType == BooleanType &&
      pred.dataType == DoubleType && weight.dataType == DoubleType
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (integral, boolean, double[, double]), got " +
        children.map(_.dataType.simpleString).mkString(", "))
  }

  override def createAggregationBuffer(): PrCurveState =
    new PrCurveState(-1, null, null)

  override def update(state: PrCurveState, input: InternalRow): PrCurveState = {
    val bAny = bucketCount.eval(input)
    val oAny = outcome.eval(input)
    val pAny = pred.eval(input)
    val wAny = weight.eval(input)
    if (bAny == null || oAny == null || pAny == null || wAny == null) return state
    val b = bAny match { case i: Int => i; case l: Long => l.toInt }
    val p = pAny.asInstanceOf[Double]
    val w = wAny.asInstanceOf[Double]
    if (p < 0.0 || p > 1.0)
      throw new IllegalArgumentException(
        s"$prettyName: prediction value must be between 0 and 1, got $p")
    if (w < 0)
      throw new IllegalArgumentException(s"$prettyName: weights must be non-negative")
    if (state.buckets == -1) {
      if (b < 2)
        throw new IllegalArgumentException(s"$prettyName: bucket count must be at least 2")
      state.buckets = b
      state.trueW = new Array[Double](b)
      state.falseW = new Array[Double](b)
    } else if (b != state.buckets) {
      throw new IllegalArgumentException(s"$prettyName: bucket count must be constant")
    }
    val idx = (math.min(p, MaxPredForHistogram) * state.buckets).toInt
    if (oAny.asInstanceOf[Boolean]) state.trueW(idx) += w else state.falseW(idx) += w
    state
  }

  override def merge(state: PrCurveState, other: PrCurveState): PrCurveState = {
    if (other.buckets == -1) return state
    if (state.buckets == -1) {
      state.buckets = other.buckets
      state.trueW = other.trueW.clone()
      state.falseW = other.falseW.clone()
      return state
    }
    if (state.buckets != other.buckets)
      throw new IllegalArgumentException(s"$prettyName: bucket count must be constant")
    var i = 0
    while (i < state.buckets) {
      state.trueW(i) += other.trueW(i)
      state.falseW(i) += other.falseW(i)
      i += 1
    }
    state
  }

  override def eval(state: PrCurveState): Any = {
    if (state.buckets == -1) return new GenericArrayData(Array.empty[Any])
    val b = state.buckets
    val totalTrue = state.trueW.sum
    val totalFalse = state.falseW.sum
    val out = Array.newBuilder[Any]
    var runningTrue = 0.0
    var runningFalse = 0.0
    var i = 0
    // emit bucket i while true weight BELOW its threshold hasn't yet
    // exhausted the total (reference iterator hasNext)
    while (i < b && totalTrue > runningTrue) {
      val tp = totalTrue - runningTrue       // true weight ≥ t
      val fn = runningTrue                   // true weight < t
      val fp = totalFalse - runningFalse     // false weight ≥ t
      val v = metric match {
        case "thresholds" => i.toDouble / b
        case "precision" => tp / (tp + fp)
        case "recall" => tp / totalTrue
        case "miss_rate" => fp / totalTrue   // 0.235 quirk (see scaladoc)
        case "fall_out" => fn / totalFalse   // 0.235 quirk (see scaladoc)
      }
      out += v
      runningTrue += state.trueW(i)
      runningFalse += state.falseW(i)
      i += 1
    }
    new GenericArrayData(out.result())
  }

  override def serialize(state: PrCurveState): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val o = new DataOutputStream(bos)
    o.writeInt(state.buckets)
    if (state.buckets != -1) {
      var i = 0
      while (i < state.buckets) {
        o.writeDouble(state.trueW(i)); o.writeDouble(state.falseW(i)); i += 1
      }
    }
    o.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): PrCurveState = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val b = in.readInt()
    if (b == -1) return new PrCurveState(-1, null, null)
    val t = new Array[Double](b)
    val f = new Array[Double](b)
    var i = 0
    while (i < b) { t(i) = in.readDouble(); f(i) = in.readDouble(); i += 1 }
    new PrCurveState(b, t, f)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ClassificationMetricAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ClassificationMetricAgg =
    copy(inputAggBufferOffset = newOffset)
}
