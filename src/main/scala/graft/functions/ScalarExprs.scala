package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `strpos(string, substring, instance)` — position of the instance-th
  * occurrence (1-based), 0 when absent; reference StringFunctions.java
  * `stringPositionFromStart`, which REJECTS instance <= 0 — searching
  * from the end is the separate `strrpos` spelling
  * (`stringPositionFromEnd`), here the same expression with
  * fromEnd = true. Long-tail (never a scan hot path) so CodegenFallback
  * is the right cost.
  */
case class StrPosInstance(first: Expression, second: Expression,
    third: Expression, fromEnd: Boolean = false)
    extends TernaryExpression with CodegenFallback {

  override def prettyName: String = if (fromEnd) "strrpos" else "strpos"
  override def dataType: DataType = LongType
  override def nullable: Boolean = children.exists(_.nullable)

  override def nullSafeEval(str: Any, sub: Any, inst: Any): Any = {
    val s = str.asInstanceOf[UTF8String].toString
    val p = sub.asInstanceOf[UTF8String].toString
    val n0 = inst.asInstanceOf[Long]
    require(n0 > 0, "'instance' must be a positive number")
    if (p.isEmpty) return 1L
    if (fromEnd) {
      // the fork's stringPositionFromEnd (StringFunctions.java:254-278)
      // steps back through JAVA-CHAR indexes but feeds the found index
      // into a BYTE-offset code-point count — its own tests pin the
      // confusion (STRRPOS over CJK text returns 2 where the code-point
      // position is 4), so the KAT value gate reproduces it bug-for-bug;
      // single-byte inputs are unaffected (char index == byte offset).
      var found = 0L
      var index = str.asInstanceOf[UTF8String].numBytes
      while (found < n0) {
        index = s.lastIndexOf(p, index - 1)
        if (index < 0) return 0L
        found += 1
      }
      val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val upto = math.min(index, bytes.length)
      var i = 0; var cp = 0L
      while (i < upto) { if ((bytes(i) & 0xC0) != 0x80) cp += 1; i += 1 }
      return cp + 1
    }
    // collect codepoint-based positions of all occurrences
    val positions = scala.collection.mutable.ArrayBuffer.empty[Long]
    var idx = s.indexOf(p)
    while (idx >= 0) {
      positions += (s.codePointCount(0, idx) + 1).toLong
      idx = s.indexOf(p, idx + 1)
    }
    val i = n0 - 1
    if (i < 0 || i >= positions.length) 0L else positions(i.toInt)
  }

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): StrPosInstance =
    copy(first = f, second = s, third = t)
}

/** `CAST(x AS JSON)` (Presto JsonOperators / reference
  * operator/scalar/JsonOperators.java): produce the JSON *value* of x —
  * a varchar becomes a JSON string ("abc" → "\"abc\""), numerics and
  * booleans their JSON literal, complex types their JSON structure.
  * The engine models the JSON type as its canonical VARCHAR rendering
  * (SURVEY.md §1.2), so this is a dispatch on the child's resolved type;
  * RuntimeReplaceable keeps it a pure rewrite (the replacement is
  * codegen'd, nothing interpreted survives in the plan).
  */
case class CastToJson(child: Expression)
    extends Expression with RuntimeReplaceable with UnaryLike[Expression] {

  override def prettyName: String = "cast_to_json"

  override lazy val replacement: Expression = child.dataType match {
    case _: StringType =>
      StaticInvokeJsonQuote(child)
    case _: ArrayType | _: MapType | _: StructType =>
      // round 12 (dialect tranche 4): the reference renders complex
      // values with its own writers, NOT Spark's to_json shapes — rows
      // become JSON ARRAYS (field names discarded) and map keys are
      // stringified then sorted as strings (JsonUtil.java
      // RowJsonGeneratorWriter writeStartArray, MapJsonGeneratorWriter
      // TreeMap). StructsToJson would emit objects for rows and
      // map-order keys — a probed, real porting divergence. JSON-typed
      // members detected from the expression shape embed RAW (r15).
      PrestoJsonRender(child, PrestoJsonRender.shapeOf(child))
    case BooleanType =>
      Cast(child, StringType)
    case DoubleType | FloatType =>
      // non-finite values QUOTE in the reference's JSON rendering
      // ("NaN"/"Infinity" — Jackson writeNumber can't emit them bare;
      // KAT value gate cast(nan() AS JSON)). PrestoJsonRender carries
      // exactly that convention for scalars too.
      PrestoJsonRender(child)
    case _: NumericType =>
      Cast(child, StringType)
    case DateType | TimestampType | TimestampNTZType =>
      // TimestampJsonGeneratorWriter/DateGeneratorWriter (JsonUtil.java:
      // 490-510): quoted, millisecond rendering. PrestoJsonRender already
      // implements exactly that format, and — unlike a bare
      // Cast(child, StringType) — needs no session zone, so the
      // replacement cannot materialize unresolved after ResolveTimeZone
      // has run (KAT replay wave 9: CAST(TIMESTAMP .. AS JSON) was an
      // INTERNAL_ERROR for that reason).
      PrestoJsonRender(child)
    case NullType => Literal(UTF8String.fromString("null"), StringType)
    case other =>
      throw new IllegalArgumentException(
        s"CAST(... AS JSON): unsupported source type ${other.catalogString}")
  }

  override protected def withNewChildInternal(newChild: Expression): CastToJson =
    copy(child = newChild)
}

/** Reference-faithful JSON rendering of complex values (JsonUtil.java
  * JsonGeneratorWriter family, used by ArrayToJsonCast / MapToJsonCast /
  * RowToJsonCast): rows are JSON ARRAYS (`RowJsonGeneratorWriter`
  * writes start/end-array — field names are DISCARDED, unlike Spark's
  * to_json objects); map keys are stringified per `ObjectKeyProvider`
  * and emitted in SORTED STRING order (the TreeMap in
  * `MapJsonGeneratorWriter` — map(10→a, 2→b) renders {"10":…,"2":…});
  * nested NULLs render as JSON null while a top-level NULL is SQL NULL
  * (RETURN_NULL_ON_NULL); timestamps/dates render quoted in the
  * reference's millisecond format; non-finite doubles quote like
  * Jackson's default ("NaN"). Long-tail cast, never a scan hot path —
  * CodegenFallback is the right cost.
  */
object PrestoJsonRender {
  /** Which positions carry JSON-TYPED values (modeled as VARCHAR —
    * their text embeds RAW instead of re-quoting; r15 value gate:
    * CAST(ARRAY[JSON '1'] AS JSON) is [1], not ["1"]). Built from the
    * EXPRESSION shape at analysis (CreateArray/CreateMap/
    * CreateNamedStruct positions are static); container columns stay
    * Plain — the erased type cannot be recovered, a documented delta.
    */
  sealed trait Shape
  case object Plain extends Shape
  case object Raw extends Shape
  final case class PerPos(positions: Seq[Shape]) extends Shape

  private def isJsonProducer(e: Expression): Boolean = e match {
    case a: Alias => isJsonProducer(a.child)
    case _: CastToJson | _: PrestoJsonRender => true
    // the UDF null-probe wrapper (round 14): If(x IS NULL, NULL, udf(x))
    case If(IsNull(_), Literal(null, _), inner) => isJsonProducer(inner)
    case u: org.apache.spark.sql.catalyst.expressions.ScalaUDF =>
      u.udfName.exists(n => n == "json_parse" || n == "json_extract")
    case _ => false
  }

  def shapeOf(e: Expression): Shape = e match {
    case a: Alias => shapeOf(a.child)
    case x if isJsonProducer(x) => Raw
    case CreateArray(elems, _) => PerPos(elems.map(shapeOf))
    case CreateMap(kvs, _) =>
      PerPos(kvs.grouped(2).map(kv => shapeOf(kv(1))).toSeq)
    case s: CreateNamedStruct => PerPos(s.valExprs.map(shapeOf))
    // the dialect's MAP(keys, values) ctor: value positions follow the
    // value-array literal (MapCtorDispatch → map_from_arrays)
    case m: MapFromArrays => m.right match {
      case CreateArray(vals, _) => PerPos(vals.map(shapeOf))
      case _ => Plain
    }
    case m: MapCtorDispatch => m.right match {
      case CreateArray(vals, _) => PerPos(vals.map(shapeOf))
      case _ => Plain
    }
    case _ => Plain
  }

  def hasRaw(sh: Shape): Boolean = sh match {
    case Raw => true
    case PerPos(ps) => ps.exists(hasRaw)
    case Plain => false
  }
}

case class PrestoJsonRender(child: Expression,
    shape: PrestoJsonRender.Shape = PrestoJsonRender.Plain)
    extends UnaryExpression with CodegenFallback {

  override def prettyName: String = "presto_json_render"
  override def dataType: DataType = StringType

  // not serializable — rebuild on the executor after task deserialization
  @transient private lazy val tsFmt =
    java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss.SSS")

  private def renderString(s: String): String =
    GraftFnUtils.jsonQuote(UTF8String.fromString(s)).toString

  private def renderDouble(d: Double): String =
    if (d.isNaN || d.isInfinite) "\"" + d.toString + "\"" else d.toString

  private def mapKey(dt: DataType, v: Any): String = dt match {
    case BooleanType => if (v.asInstanceOf[Boolean]) "true" else "false"
    case ByteType | ShortType | IntegerType | LongType => v.toString
    case FloatType => java.lang.Float.toString(v.asInstanceOf[Float])
    case DoubleType => java.lang.Double.toString(v.asInstanceOf[Double])
    case _: DecimalType =>
      v.asInstanceOf[org.apache.spark.sql.types.Decimal]
        .toJavaBigDecimal.toPlainString
    case _: StringType => v.asInstanceOf[UTF8String].toString
    case other => throw new IllegalArgumentException(
      s"CAST(... AS JSON): unsupported map key type ${other.catalogString}")
  }

  private def render(dt: DataType, v: Any, sb: java.lang.StringBuilder,
      sh: PrestoJsonRender.Shape = PrestoJsonRender.Plain): Unit = {
    if (v == null) { sb.append("null"); return }
    if (sh == PrestoJsonRender.Raw) dt match {
      // a JSON-typed value: its canonical text embeds as a raw subtree
      case _: StringType =>
        sb.append(v.asInstanceOf[UTF8String].toString); return
      case _ => // non-string JSON-typed shapes don't arise
    }
    def posShape(i: Int): PrestoJsonRender.Shape = sh match {
      case PrestoJsonRender.PerPos(ps) if i < ps.length => ps(i)
      case _ => PrestoJsonRender.Plain
    }
    dt match {
      case BooleanType => sb.append(if (v.asInstanceOf[Boolean]) "true" else "false")
      case ByteType | ShortType | IntegerType | LongType => sb.append(v.toString)
      case FloatType =>
        // Jackson writeNumber(float) prints the FLOAT's own toString
        val f = v.asInstanceOf[Float]
        sb.append(if (f.isNaN || f.isInfinite) "\"" + f.toString + "\"" else f.toString)
      case DoubleType => sb.append(renderDouble(v.asInstanceOf[Double]))
      case _: DecimalType =>
        sb.append(v.asInstanceOf[org.apache.spark.sql.types.Decimal]
          .toJavaBigDecimal.toString)
      case _: StringType => sb.append(renderString(v.asInstanceOf[UTF8String].toString))
      case DateType =>
        sb.append('"')
          .append(java.time.LocalDate.ofEpochDay(v.asInstanceOf[Int].toLong))
          .append('"')
      case TimestampType | TimestampNTZType =>
        // reference printTimestampWithoutTimeZone: millis precision,
        // session zone (pinned UTC here); micros truncate toward -inf
        val micros = v.asInstanceOf[Long]
        val ldt = java.time.LocalDateTime.ofEpochSecond(
          Math.floorDiv(micros, 1000000L),
          (Math.floorMod(micros, 1000000L) / 1000L).toInt * 1000000,
          java.time.ZoneOffset.UTC)
        sb.append('"').append(tsFmt.format(ldt)).append('"')
      case ArrayType(et, _) =>
        val a = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        sb.append('[')
        var i = 0
        while (i < a.numElements()) {
          if (i > 0) sb.append(',')
          render(et, if (a.isNullAt(i)) null else a.get(i, et), sb, posShape(i))
          i += 1
        }
        sb.append(']')
      case MapType(kt, vt, _) =>
        val m = v.asInstanceOf[org.apache.spark.sql.catalyst.util.MapData]
        val ks = m.keyArray(); val vs = m.valueArray()
        val sorted = new java.util.TreeMap[String, Int]()
        var i = 0
        while (i < m.numElements()) {
          sorted.put(mapKey(kt, ks.get(i, kt)), i)
          i += 1
        }
        sb.append('{')
        var first = true
        sorted.forEach { (k, idx) =>
          if (!first) sb.append(',')
          first = false
          sb.append(renderString(k)).append(':')
          render(vt, if (vs.isNullAt(idx)) null else vs.get(idx, vt), sb,
            posShape(idx))
        }
        sb.append('}')
      case st: StructType =>
        val r = v.asInstanceOf[org.apache.spark.sql.catalyst.InternalRow]
        sb.append('[')
        var i = 0
        while (i < st.length) {
          if (i > 0) sb.append(',')
          val fdt = st(i).dataType
          render(fdt, if (r.isNullAt(i)) null else r.get(i, fdt), sb, posShape(i))
          i += 1
        }
        sb.append(']')
      case other => throw new IllegalArgumentException(
        s"CAST(... AS JSON): unsupported source type ${other.catalogString}")
    }
  }

  override def nullSafeEval(v: Any): Any = {
    val sb = new java.lang.StringBuilder(40)
    render(child.dataType, v, sb, shape)
    UTF8String.fromString(sb.toString)
  }

  override protected def withNewChildInternal(newChild: Expression): PrestoJsonRender =
    copy(child = newChild)
}

/** Presto `contains(array, elem)` — but Spark SQL also has a string
  * `contains(str, substr)` users expect to keep working, so dispatch on
  * the resolved first-argument type.
  */
case class ContainsDispatch(left: Expression, right: Expression)
    extends Expression with RuntimeReplaceable
    with org.apache.spark.sql.catalyst.trees.BinaryLike[Expression] {

  override def prettyName: String = "contains"

  override lazy val replacement: Expression = left.dataType match {
    case _: ArrayType => ArrayContains(left, right)
    case _ => Contains(left, right)
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): ContainsDispatch =
    copy(left = l, right = r)
}

/** Two-argument `MAP(a, b)` from SQL text (the parser veneer routes every
  * two-arg spelling here): the reference's only two-arg constructor is
  * MapConstructor.java — key ARRAY + value ARRAY — so an array pair
  * builds map_from_arrays; any other operand pair keeps Spark's own
  * two-arg `map(k, v)` single-entry meaning. Dispatch must be on the
  * RESOLVED types (a textual `array(`-prefix check misses
  * CAST(.. AS ARRAY(..)) and plain array-typed columns — silently
  * building a one-entry map of arrays).
  */
/** `round(x, s)` under the dialect — the dispatch matches on the OPERAND
  * TYPE only, so EVERY two-arg double/float round goes through
  * prestoRoundDouble, literal scale or not (r13 triage was misled by a
  * prior claim that literal scales stayed on Spark's builtin — they do
  * not, and must not: the reference's signed-zero behavior,
  * round(-0.0, s) = +0.0, is pinned by FuzzParitySpec and differs from
  * a sign-preserving engine). Reference semantics
  * (MathFunctions.java:725-762): the scale is any integer expression
  * (Spark's Round demands a foldable literal); integral x is returned
  * unchanged for any scale (the 0.235 `decimals < 0` TODO); double x
  * rounds half-away-from-zero at pow(10, s) with NaN/Infinity passing
  * through; a NULL operand is NULL. Only DECIMAL shapes keep Spark's
  * builtin Round.
  */
case class RoundDispatch(left: Expression, right: Expression)
    extends Expression with RuntimeReplaceable
    with org.apache.spark.sql.catalyst.trees.BinaryLike[Expression] {

  override def prettyName: String = "round"

  override lazy val replacement: Expression = left.dataType match {
    case DoubleType | FloatType =>
      val out = org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke(
        GraftFnUtils.getClass, DoubleType, "prestoRoundDouble",
        Seq(Cast(left, DoubleType), Cast(right, IntegerType)),
        inputTypes = Seq(DoubleType, IntegerType), propagateNull = true)
      if (left.dataType == FloatType) Cast(out, FloatType) else out
    case ByteType | ShortType | IntegerType | LongType =>
      // num unchanged, but the scale's NULL still propagates
      If(IsNull(right), Literal.create(null, left.dataType), left)
    // a NULL scale is RETURN_NULL_ON_NULL for decimals too (KAT value
    // gate — Spark's Round would stay forever-unresolved on it);
    // structural check: the scale may sit under casts or the dialect's
    // own integral-cast wrapper, where eval() would throw
    case _ if RoundDispatch.isNullLiteral(right) =>
      Literal.create(null, left.dataType)
    case dt: DecimalType =>
      // decimal(p,s) rounds half-away-from-zero at scale n but KEEPS
      // scale s in the result type — decimal(min(38,p+1), s)
      // (MathFunctions.java:838-865 roundN; KAT value gate r15: Spark's
      // Round re-scales to n, so round(3.449, 1) read 3.4 not 3.400)
      RoundDecimalN(left, Cast(right, IntegerType), dt.precision, dt.scale)
    case _ =>
      Round(left, Cast(right, IntegerType))
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): RoundDispatch =
    copy(left = l, right = r)
}

/** `truncate(x[, n])` under the dialect — type-dispatched like round
  * (KAT value gate r15: the old double-only builder lost DECIMAL
  * results entirely and its Spark `Floor` is LONG-typed, overflowing
  * past 2^63). Reference semantics (MathFunctions.java:898-936
  * Truncate / 938-1004 TruncateN):
  *  - truncate(decimal(p,s)) → decimal(max(1,p-s),0), digits after the
  *    point dropped toward zero;
  *  - truncate(decimal(p,s), n) → decimal(p,s), digits below scale n
  *    zeroed toward zero (n ≥ s unchanged; p-s+n ≤ 0 → 0);
  *  - truncate(double/real) = signum*floor(abs) in DOUBLE space;
  *    2-arg double keeps the same shape at pow(10,n).
  * Long-tail scalar — CodegenFallback.
  */
/** `sign(x)` with the reference's operand-typed results
  * (MathFunctions.java sign overloads: integral → same integral type,
  * real → real, decimal(p,s) → decimal(1,0), double → double) where
  * Spark's signum is always DOUBLE. Values are identical (−1/0/1, NaN
  * passes through the double arm); only the result type sharpens.
  */
case class SignDispatch(child: Expression)
    extends Expression with RuntimeReplaceable with UnaryLike[Expression] {

  override def prettyName: String = "sign"

  override lazy val replacement: Expression = {
    val sg = Signum(Cast(child, DoubleType))
    child.dataType match {
      case _: DecimalType => Cast(sg, DecimalType(1, 0))
      case ByteType | ShortType | IntegerType | LongType => Cast(sg, child.dataType)
      case FloatType => Cast(sg, FloatType)
      case _ => sg
    }
  }

  override protected def withNewChildInternal(c: Expression): SignDispatch =
    copy(child = c)
}

case class TruncateOneDispatch(child: Expression)
    extends Expression with RuntimeReplaceable with UnaryLike[Expression] {

  override def prettyName: String = "truncate"

  override lazy val replacement: Expression = child.dataType match {
    case dt: DecimalType =>
      TruncateDecimal(child, Literal(0), dt.precision, dt.scale, oneArg = true)
    case _ =>
      val out = org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke(
        GraftFnUtils.getClass, DoubleType, "truncDouble",
        Seq(Cast(child, DoubleType)),
        inputTypes = Seq(DoubleType), propagateNull = true)
      if (child.dataType == FloatType) Cast(out, FloatType) else out
  }

  override protected def withNewChildInternal(c: Expression): TruncateOneDispatch =
    copy(child = c)
}

case class TruncateDispatch(left: Expression, right: Expression)
    extends Expression with RuntimeReplaceable
    with org.apache.spark.sql.catalyst.trees.BinaryLike[Expression] {

  override def prettyName: String = "truncate"

  override lazy val replacement: Expression = left.dataType match {
    case dt: DecimalType =>
      TruncateDecimal(left, Cast(right, IntegerType), dt.precision, dt.scale)
    case _ =>
      val xd = Cast(left, DoubleType)
      val out = org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke(
        GraftFnUtils.getClass, DoubleType, "truncDoubleN",
        Seq(xd, Cast(right, IntegerType)),
        inputTypes = Seq(DoubleType, IntegerType), propagateNull = true)
      if (left.dataType == FloatType) Cast(out, FloatType) else out
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): TruncateDispatch =
    copy(left = l, right = r)
}

/** Decimal round-at-scale-n kernel: half away from zero at scale n,
  * result scale stays s (decimal(min(38,p+1), s) — see RoundDispatch's
  * decimal arm). Long-tail scalar — CodegenFallback.
  */
case class RoundDecimalN(first: Expression, second: Expression,
    p: Int, s: Int)
    extends BinaryExpression with CodegenFallback {

  override def left: Expression = first
  override def right: Expression = second
  override def prettyName: String = "round"
  override def dataType: DataType = DecimalType(math.min(38, p + 1), s)

  override def nullSafeEval(x: Any, n: Any): Any = {
    val bd = x.asInstanceOf[org.apache.spark.sql.types.Decimal].toJavaBigDecimal
    val scale = n.asInstanceOf[Number].intValue
    val out = bd.setScale(math.min(scale, s), java.math.RoundingMode.HALF_UP)
      .setScale(s, java.math.RoundingMode.UNNECESSARY)
    org.apache.spark.sql.types.Decimal(out,
      dataType.asInstanceOf[DecimalType].precision, s)
  }

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): RoundDecimalN =
    copy(first = l, second = r)
}

/** Decimal truncate kernel: `n >= s` unchanged, otherwise digits below
  * scale n zeroed toward zero; `oneArg` drops the scale entirely
  * (result decimal(max(1,p-s),0)). See TruncateDispatch.
  */
case class TruncateDecimal(first: Expression, second: Expression,
    p: Int, s: Int, oneArg: Boolean = false)
    extends BinaryExpression with CodegenFallback {

  override def left: Expression = first
  override def right: Expression = second
  override def prettyName: String = "truncate"
  override def dataType: DataType =
    if (oneArg) DecimalType(math.max(1, p - s), 0) else DecimalType(p, s)

  override def nullSafeEval(x: Any, n: Any): Any = {
    val bd = x.asInstanceOf[org.apache.spark.sql.types.Decimal].toJavaBigDecimal
    val scale = n.asInstanceOf[Number].intValue
    val out =
      if (oneArg)
        bd.setScale(0, java.math.RoundingMode.DOWN)
      else
        bd.setScale(math.min(scale, s), java.math.RoundingMode.DOWN)
          .setScale(s, java.math.RoundingMode.UNNECESSARY)
    org.apache.spark.sql.types.Decimal(out,
      dataType.asInstanceOf[DecimalType].precision,
      dataType.asInstanceOf[DecimalType].scale)
  }

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): TruncateDecimal =
    copy(first = l, second = r)
}

/** json_array_contains(json, value): the probe's resolved SQL type
  * decides which JSON token class can match (JsonFunctions.java — a
  * VARCHAR probe only matches string tokens, so '"8"' never equals 8;
  * KAT value gate). Late-binding like the other dispatches.
  */
case class JsonArrayContainsDispatch(left: Expression, right: Expression)
    extends Expression with RuntimeReplaceable
    with org.apache.spark.sql.catalyst.trees.BinaryLike[Expression] {

  override def prettyName: String = "json_array_contains"

  override lazy val replacement: Expression = {
    val kind = right.dataType match {
      case BooleanType => 1
      case ByteType | ShortType | IntegerType | LongType => 2
      case FloatType | DoubleType | _: DecimalType => 3
      case _ => 0
    }
    org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke(
      GraftFnUtils.getClass, BooleanType, "jsonArrayContainsTyped",
      Seq(Cast(left, StringType), Cast(right, StringType), Literal(kind)),
      inputTypes = Seq(StringType, StringType, IntegerType),
      propagateNull = true, returnNullable = true)
  }

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): JsonArrayContainsDispatch =
    copy(left = l, right = r)
}

object RoundDispatch {
  /** Is this expression a NULL literal, possibly under casts or the
    * dialect's integral-cast wrapper?
    */
  def isNullLiteral(e: Expression): Boolean = e match {
    case Literal(null, _) => true
    case c: Cast => isNullLiteral(c.child)
    case p: PrestoCastToIntegral => isNullLiteral(p.child)
    case _ => false
  }
}

case class MapCtorDispatch(left: Expression, right: Expression)
    extends Expression with RuntimeReplaceable
    with org.apache.spark.sql.catalyst.trees.BinaryLike[Expression] {

  override def prettyName: String = "map"

  override lazy val replacement: Expression = (left.dataType, right.dataType) match {
    case (ArrayType(_: MapType, _), _: ArrayType) =>
      // the reference allows ANY comparable key type incl. maps
      // (MapType.java:39); Spark hard-rejects map-typed keys — keep
      // the delta LOUD with a named error instead of the unresolved-
      // replacement INTERNAL_ERROR (r15, pinned in PrestoOperatorsSpec)
      throw new IllegalArgumentException(
        "map type cannot be used as a MAP key in this engine " +
          "(the reference allows any comparable key type — documented delta)")
    case (_: ArrayType, _: ArrayType) => MapFromArrays(left, right)
    // the two-array constructor is RETURN_NULL_ON_NULL in the reference
    // (MapConstructor — TestMapOperators.java:934-936: MAP(null,
    // ARRAY[..]) is NULL of map(unknown, elem)); Spark's map_from_arrays
    // would raise NULL_MAP_KEY instead. Scalar pairs with a null VALUE
    // (map(1, NULL)) keep Spark's single-entry map below.
    case (NullType, ArrayType(et, _)) =>
      Literal.create(null, MapType(NullType, et))
    case (ArrayType(et, _), NullType) =>
      Literal.create(null, MapType(et, NullType))
    case (NullType, NullType) =>
      Literal.create(null, MapType(NullType, NullType))
    case _ => CreateMap(Seq(left, right))
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): MapCtorDispatch =
    copy(left = l, right = r)
}

/** map_from_entries / multimap_from_entries over a bare NULL or an
  * untyped empty array — the reference returns NULL :: map(unknown, …)
  * and {} respectively (TestMapOperators.java:848-849/894-895,
  * RETURN_NULL_ON_NULL + MapFromEntriesFunction), where Spark's builtins
  * reject the NullType operand at analysis. A non-empty array<unknown>
  * (ARRAY[null]) still errors like the reference ("map entry cannot be
  * null"). Typed inputs delegate to the stock implementations.
  */
case class EntriesCtorDispatch(child: Expression, multi: Boolean)
    extends Expression with RuntimeReplaceable with UnaryLike[Expression] {

  override def prettyName: String =
    if (multi) "multimap_from_entries" else "map_from_entries"

  private def vt(base: DataType): DataType =
    if (multi) ArrayType(base) else base

  override lazy val replacement: Expression = child.dataType match {
    case NullType =>
      Literal.create(null, MapType(NullType, vt(NullType)))
    case ArrayType(NullType, _) =>
      val mt = MapType(NullType, vt(NullType))
      If(EqualTo(Size(child), Literal(0)),
        Literal.create(Map.empty[Any, Any], mt),
        Cast(RaiseError(Literal("map entry cannot be null")), mt))
    case ArrayType(st: StructType, _)
        if st.length == 2 && st.head.dataType.isInstanceOf[MapType] =>
      throw new IllegalArgumentException(
        "map type cannot be used as a MAP key in this engine " +
          "(the reference allows any comparable key type — documented delta)")
    case _ => if (multi) MultimapFromEntries(child) else MapFromEntries(child)
  }

  override protected def withNewChildInternal(newChild: Expression): EntriesCtorDispatch =
    copy(child = newChild)
}

/** `ngrams(array(T), n)` — ArrayNgramsFunction.java, generic over the
  * element type (the old Seq[String] UDF silently STRINGIFIED non-string
  * arrays through implicit coercion and returned [] where the reference
  * returns the whole array when n > length — KAT replay r14). Exact
  * semantics: n > 0 required; windows of min(n, length) consecutive
  * elements, so length < n yields ONE ngram = the whole array (and an
  * empty array yields one empty ngram).
  */
case class ArrayNgramsExpr(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def prettyName: String = "ngrams"
  override def dataType: DataType = ArrayType(left.dataType, containsNull = false)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType.isInstanceOf[ArrayType] &&
        Seq(IntegerType, LongType, ShortType, ByteType).contains(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"ngrams expects (array, integer), got (${left.dataType.catalogString}, ${right.dataType.catalogString})")

  override def nullSafeEval(a: Any, nAny: Any): Any = {
    val arr = a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val n = nAny match { case l: java.lang.Long => l.toInt; case i: java.lang.Integer => i.toInt; case s: java.lang.Short => s.toInt; case b: java.lang.Byte => b.toInt }
    require(n > 0, "N must be positive")
    val et = left.dataType.asInstanceOf[ArrayType].elementType
    val elems = arr.toObjectArray(et)
    val epr = math.min(elems.length, n)
    val total = elems.length - epr + 1
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      (0 until total).map(r =>
        new org.apache.spark.sql.catalyst.util.GenericArrayData(
          java.util.Arrays.copyOfRange(elems.asInstanceOf[Array[AnyRef]], r, r + epr))).toArray[Any])
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): ArrayNgramsExpr =
    copy(left = l, right = r)
}

/** `combinations(array(T), n)` — ArrayCombinationsFunction.java, generic
  * over the element type: positional n-subsets in the REFERENCE's
  * enumeration order (nextCombination:114-129 increments the leftmost
  * index with headroom and resets the prefix — [0,1],[0,2],[1,2],[0,3]…
  * — NOT lexicographic; KAT value gate r15), duplicate values yield
  * duplicate subsets, 0 ≤ n ≤ 5, result elements capped at 100,000.
  */
case class ArrayCombinationsExpr(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def prettyName: String = "combinations"
  override def dataType: DataType = ArrayType(left.dataType, containsNull = false)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType.isInstanceOf[ArrayType] &&
        Seq(IntegerType, LongType, ShortType, ByteType).contains(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"combinations expects (array, integer), got (${left.dataType.catalogString}, ${right.dataType.catalogString})")

  override def nullSafeEval(a: Any, nAny: Any): Any = {
    val arr = a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val n = nAny match { case l: java.lang.Long => l.toInt; case i: java.lang.Integer => i.toInt; case s: java.lang.Short => s.toInt; case b: java.lang.Byte => b.toInt }
    require(n >= 0, s"combination size must not be negative: $n")
    require(n <= 5, s"combination size must not exceed 5: $n")
    val et = left.dataType.asInstanceOf[ArrayType].elementType
    val elems = arr.toObjectArray(et).asInstanceOf[Array[AnyRef]]
    val len = elems.length
    val combos = scala.collection.mutable.ArrayBuffer.empty[Array[Int]]
    if (n <= len) {
      val c = Array.tabulate(n)(identity)
      var more = true
      while (more) {
        combos += c.clone()
        // reference nextCombination: leftmost index with headroom steps,
        // prefix resets to 0..i-1
        var i = 0
        var stepped = false
        while (!stepped && i < n - 1) {
          if (c(i) + 1 < c(i + 1)) {
            c(i) += 1
            var j = 0
            while (j < i) { c(j) = j; j += 1 }
            stepped = true
          }
          i += 1
        }
        if (!stepped) {
          if (n > 0 && c(n - 1) + 1 < len) {
            c(n - 1) += 1
            var j = 0
            while (j < n - 1) { c(j) = j; j += 1 }
          } else more = false
        }
      }
    }
    require(combos.length.toLong * n <= 100000L, "combinations exceed max size")
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      combos.toArray.map(c =>
        new org.apache.spark.sql.catalyst.util.GenericArrayData(
          c.map(elems).toArray[AnyRef]): Any))
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): ArrayCombinationsExpr =
    copy(left = l, right = r)
}

object StaticInvokeJsonQuote {
  def apply(child: Expression): Expression =
    org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke(
      GraftFnUtils.getClass,
      StringType,
      "jsonQuote",
      Seq(child),
      inputTypes = Seq(StringType),
      propagateNull = true)
}

/** `multimap_from_entries(array(row(K, V)))` → map(K, array(V))
  * (reference MultimapFromEntriesFunction.java): values grouped per key,
  * keys in first-occurrence order, null entries/keys rejected. Field
  * access is by ORDINAL, so any row(K, V) shape works (map_entries
  * output, ARRAY[ROW(...)], zipped structs).
  */
case class MultimapFromEntries(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def prettyName: String = "multimap_from_entries"

  private lazy val entryType: StructType =
    child.dataType.asInstanceOf[ArrayType].elementType.asInstanceOf[StructType]

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(s: StructType, _) if s.length == 2 =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects array(row(K, V)), got ${child.dataType.catalogString}")
    }

  override def dataType: DataType =
    MapType(entryType(0).dataType, ArrayType(entryType(1).dataType,
      containsNull = entryType(1).nullable))

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val keyType = entryType(0).dataType
    val valType = entryType(1).dataType
    val order = scala.collection.mutable.ArrayBuffer.empty[Any]
    val groups = scala.collection.mutable.LinkedHashMap.empty[Any, scala.collection.mutable.ArrayBuffer[Any]]
    var i = 0
    while (i < arr.numElements()) {
      require(!arr.isNullAt(i), "map entry cannot be null")
      val row = arr.getStruct(i, 2)
      require(!row.isNullAt(0), "map key cannot be null")
      val k = row.get(0, keyType)
      val v = if (row.isNullAt(1)) null else row.get(1, valType)
      groups.getOrElseUpdate(k, { order += k; scala.collection.mutable.ArrayBuffer.empty })
        .append(v)
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.ArrayBasedMapData(
      new org.apache.spark.sql.catalyst.util.GenericArrayData(order.toArray),
      new org.apache.spark.sql.catalyst.util.GenericArrayData(
        order.map(k => new org.apache.spark.sql.catalyst.util.GenericArrayData(groups(k).toArray)).toArray))
  }

  override protected def withNewChildInternal(newChild: Expression): MultimapFromEntries =
    copy(child = newChild)
}

/** JSON-typed leaves inside a complex cast target (`CAST(json AS
  * ARRAY(JSON))` etc.). The parser's translateType passes the JSON
  * token through into the DDL (`ARRAY<JSON>`), which Spark's
  * DataType.fromDDL cannot parse — until round 14 that was the
  * documented-by-error residual. Here the JSON-ness is split off: a
  * structural MASK marks which leaves were spelled JSON, and the DDL
  * handed to Spark erases them to STRING. At a JSON leaf the reference
  * keeps the element's SUBTREE TEXT (JsonUtil.java:892-896 — the JSON
  * BlockBuilderAppender serializes `parser.readValueAsTree()` compactly,
  * key order preserved, a JSON null element becoming the text "null",
  * NOT SQL NULL), which is what [[PrestoJsonDecode]] now implements.
  */
private[functions] object JsonTargets {
  sealed trait Mask
  case object Json extends Mask
  case object Prim extends Mask
  final case class Arr(e: Mask) extends Mask
  final case class MapM(k: Mask, v: Mask) extends Mask
  final case class Row(fs: Seq[Mask]) extends Mask

  /** The DDL with JSON leaves erased to STRING (a field NAMED json —
    * `STRUCT<json: INT>` — is left alone via the `:` lookahead).
    */
  def erase(ddl: String): String =
    "(?i)\\bJSON\\b(?!\\s*:)".r.replaceAllIn(ddl, "STRING")

  def parse(t0: String): Mask = {
    val t = t0.trim
    val up = t.toUpperCase(java.util.Locale.ENGLISH)
    if (up == "JSON") Json
    else if (up.startsWith("ARRAY<") && t.endsWith(">"))
      Arr(parse(t.substring(6, t.length - 1)))
    else if (up.startsWith("MAP<") && t.endsWith(">")) {
      val kv = splitTop(t.substring(4, t.length - 1))
      if (kv.length == 2) MapM(parse(kv.head), parse(kv(1))) else Prim
    } else if (up.startsWith("STRUCT<") && t.endsWith(">")) {
      Row(splitTop(t.substring(7, t.length - 1)).map { f =>
        val c = topLevelColon(f)
        parse(if (c < 0) f else f.substring(c + 1))
      })
    } else Prim
  }

  def hasJson(m: Mask): Boolean = m match {
    case Json => true
    case Prim => false
    case Arr(e) => hasJson(e)
    case MapM(k, v) => hasJson(k) || hasJson(v)
    case Row(fs) => fs.exists(hasJson)
  }

  /** Is this string-typed expression a JSON VALUE by construction? The
    * engine models the JSON type as VARCHAR, so a `CAST(json AS
    * <scalar>)` reaches the analyzer as a plain string cast — this is
    * the static-type recovery for the producers the parser/registry
    * emit for JSON-typed reference functions: `JSON 'x'` → json_parse,
    * `CAST(x AS JSON)` → CastToJson/PrestoJsonRender, json_extract /
    * json_array_get (both return JSON in the reference). Aliases are
    * looked through; anything else is an ordinary VARCHAR.
    */
  def isJsonExpr(e: Expression): Boolean = e match {
    case a: Alias => isJsonExpr(a.child)
    // the registry's RETURN_NULL_ON_NULL seam wraps every Scala UDF in
    // If(anyNull, NULL, udf) — optionally under a With binding for
    // non-deterministic args — so the producer sits one or two nodes in
    case If(_, Literal(null, _), inner) => isJsonExpr(inner)
    case w: With => isJsonExpr(w.child)
    case _: CastToJson | _: PrestoJsonRender => true
    case _: JsonExtractPresto => true
    case u: ScalaUDF =>
      u.udfName.exists(n => n == "json_parse" || n == "json_array_get")
    case _ => false
  }

  /** Commas at `<`/`(` depth 0 — DDL type text, so angles always nest. */
  private def splitTop(s: String): Seq[String] = {
    val parts = scala.collection.mutable.ArrayBuffer.empty[String]
    var depth = 0
    var start = 0
    for (i <- 0 until s.length) s.charAt(i) match {
      case '<' | '(' => depth += 1
      case '>' | ')' => depth -= 1
      case ',' if depth == 0 => parts += s.substring(start, i); start = i + 1
      case _ =>
    }
    parts += s.substring(start)
    parts.toSeq.map(_.trim).filter(_.nonEmpty)
  }

  private def topLevelColon(s: String): Int = {
    var depth = 0
    for (i <- 0 until s.length) s.charAt(i) match {
      case '<' | '(' => depth += 1
      case '>' | ')' => depth -= 1
      case ':' if depth == 0 => return i
      case _ =>
    }
    -1
  }
}

/** `CAST(x AS ROW(...)/ARRAY(...)/MAP(...))` — Presto's complex-target
  * casts. The parser rewrite can't see the SOURCE type, which decides
  * the semantics: a VARCHAR source is the JSON-to-complex cast family
  * (JsonToArrayCast.java et al. → from_json), while a complex source is
  * a structural cast (RowToRowCast.java — field-positional coercion +
  * rename, which Spark's own Cast performs). Late-binding dispatch like
  * [[ContainsDispatch]]: resolve the child, then pick.
  */
case class ComplexCastDispatch(child: Expression, ddl: String)
    extends Expression with RuntimeReplaceable with UnaryLike[Expression] {

  override def prettyName: String = "complex_cast"

  private lazy val targetType: DataType = DataType.fromDDL(JsonTargets.erase(ddl))

  override lazy val replacement: Expression = child.dataType match {
    case _: StringType =>
      // round 12: JsonToStructs (from_json) only accepts the OBJECT form
      // for struct targets and silently nulls mismatches; the reference
      // (JsonUtil.java BlockBuilderAppender family) accepts JSON ARRAYS
      // positionally for rows, coerces across token types, and ERRORS on
      // malformed input — PrestoJsonDecode implements that contract
      PrestoJsonDecode(child, ddl)
    case _ =>
      // JSON-element targets are only defined from a JSON/VARCHAR source
      // (JsonToArrayCast et al.); a structural cast would silently
      // produce non-JSON text for the "JSON" leaves — stay loud instead
      if (JsonTargets.hasJson(JsonTargets.parse(ddl)))
        throw new IllegalArgumentException(
          s"CAST to $ddl: JSON-typed elements are supported from a " +
            "JSON/VARCHAR source only")
      // the replacement materializes AFTER ResolveTimeZone has run, so a
      // zone-needing leg (timestamp→varchar inside the target) must carry
      // the session zone itself or stay forever unresolved
      val zone = Some(org.apache.spark.sql.internal.SQLConf.get.sessionLocalTimeZone)
      val direct = Cast(child, targetType, zone)
      (child.dataType, targetType) match {
        // ROW source with JSON-typed (= VARCHAR-modeled) fields whose
        // target field is complex — `cast(row(json '[1,2]', ..) as
        // row(e ARRAY(BIGINT), ..))` (TestRowOperators, KAT replay r14):
        // Spark's structural Cast cannot cast a string field to an
        // array/map/row field, so those fields route through the same
        // JSON decode the top-level VARCHAR source uses (the JSON-as-
        // VARCHAR model cannot tell a JSON field from a plain VARCHAR
        // one, so this is the model's uniform string→complex policy).
        // Fields the structural cast CAN convert keep the plain Cast.
        case (st: StructType, tt: StructType)
            if st.length == tt.length &&
              direct.checkInputDataTypes().isFailure =>
          val parts = tt.fields.zipWithIndex.flatMap { case (tf, i) =>
            val f = GetStructField(child, i, Some(st(i).name))
            // once this mode engages, EVERY string field is read as JSON
            // (so `json '"abc"'` → VARCHAR unquotes like the reference's
            // JSON→VARCHAR cast, not an identity copy of the quoted
            // text); non-string fields keep the structural Cast. A
            // JSON-typed TARGET field cannot occur here — the hasJson
            // guard above already rejected it loudly.
            val conv =
              if (st(i).dataType.isInstanceOf[StringType])
                PrestoJsonDecode(f, tf.dataType.sql)
              else Cast(f, tf.dataType, zone)
            Seq(Literal(tf.name), conv)
          }
          If(IsNull(child), Literal.create(null, tt),
            CreateNamedStruct(parts.toIndexedSeq))
        case _ => direct
      }
  }

  override protected def withNewChildInternal(newChild: Expression): ComplexCastDispatch =
    copy(child = newChild)
}

/** `CAST(json AS ROW/ARRAY/MAP(...))` — reference JsonUtil.java
  * BlockBuilderAppender semantics (JsonToRowCast / JsonToArrayCast /
  * JsonToMapCast):
  *  - a ROW target accepts a JSON ARRAY positionally (arity must match)
  *    OR a JSON OBJECT by lower-cased field name (unknown names skipped,
  *    duplicate names error, missing fields null);
  *  - a MAP target takes a JSON object, keys parsed from the field-name
  *    TEXT into the key type;
  *  - primitives coerce across token classes like the
  *    `currentTokenAs*` helpers: numbers↔strings parse, booleans map to
  *    1/0 / "true"/"false", double→integral rounds HALF_UP
  *    (DoubleOperators.castToLong → DoubleMath HALF_UP), decimals
  *    rescale HALF_UP;
  *  - malformed input ERRORS (JsonCastException ≙ INVALID_CAST_ARGUMENT)
  *    instead of from_json's silent nulls.
  * Long-tail cast — CodegenFallback.
  */
case class PrestoJsonDecode(child: Expression, ddl: String)
    extends UnaryExpression with CodegenFallback {

  import com.fasterxml.jackson.databind.JsonNode

  override def prettyName: String = "presto_json_decode"
  override lazy val dataType: DataType = DataType.fromDDL(JsonTargets.erase(ddl))

  /** Which leaves keep SUBTREE TEXT (spelled JSON in the cast target). */
  @transient private lazy val mask: JsonTargets.Mask = JsonTargets.parse(ddl)

  @transient private lazy val mapper = {
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    // big/precise number tokens must reach the DECIMAL arm as
    // BigDecimal — the default DoubleNode loses digits past 2^53
    // (KAT value gate r15: DECIMAL '…30 digits…' JSON round-trip)
    m.configure(com.fasterxml.jackson.databind.DeserializationFeature
      .USE_BIG_DECIMAL_FOR_FLOATS, true)
    m
  }

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(s"Cannot cast to JSON target: $msg")

  private def asLong(n: JsonNode, what: String): Any =
    if (n.isNull) null
    else if (n.isIntegralNumber) n.asLong()
    else if (n.isFloatingPointNumber)
      com.google.common.math.DoubleMath.roundToLong(
        n.asDouble(), java.math.RoundingMode.HALF_UP)
    else if (n.isTextual) java.lang.Long.parseLong(n.asText().trim)
    else if (n.isBoolean) (if (n.asBoolean()) 1L else 0L)
    else fail(s"unexpected token for $what: $n")

  private def decode(n: JsonNode, dt: DataType,
      m: JsonTargets.Mask = JsonTargets.Prim): Any = {
    if (n == null) return null
    // a JSON leaf keeps the element's subtree TEXT (JsonUtil.java:
    // 892-896): compact serialization, input key order preserved, and a
    // JSON null element becomes the text "null" — NOT SQL NULL (the
    // reference's JSON appender has no null check; readValueAsTree's
    // NullNode serializes to "null")
    if (m eq JsonTargets.Json)
      return UTF8String.fromString(mapper.writeValueAsString(n))
    if (n.isNull) return null
    def elemMask = m match { case JsonTargets.Arr(e) => e; case _ => JsonTargets.Prim }
    def keyMask = m match { case JsonTargets.MapM(k, _) => k; case _ => JsonTargets.Prim }
    def valMask = m match { case JsonTargets.MapM(_, v) => v; case _ => JsonTargets.Prim }
    def fieldMask(i: Int) = m match {
      case JsonTargets.Row(fs) if i < fs.length => fs(i)
      case _ => JsonTargets.Prim
    }
    dt match {
      case LongType => asLong(n, "BIGINT")
      case IntegerType => Math.toIntExact(asLong(n, "INTEGER").asInstanceOf[Long])
      case ShortType => asLong(n, "SMALLINT").asInstanceOf[Long].toShort
      case ByteType => asLong(n, "TINYINT").asInstanceOf[Long].toByte
      case DoubleType =>
        if (n.isNumber) n.asDouble()
        else if (n.isTextual) java.lang.Double.parseDouble(n.asText().trim)
        else if (n.isBoolean) (if (n.asBoolean()) 1.0 else 0.0)
        else fail(s"unexpected token for DOUBLE: $n")
      case FloatType =>
        decode(n, DoubleType).asInstanceOf[Double].toFloat
      case t: DecimalType =>
        val bd =
          if (n.isNumber) n.decimalValue()
          else if (n.isTextual) new java.math.BigDecimal(n.asText().trim)
          else if (n.isBoolean) java.math.BigDecimal.valueOf(if (n.asBoolean()) 1 else 0)
          else fail(s"unexpected token for DECIMAL: $n")
        org.apache.spark.sql.types.Decimal(
          bd.setScale(t.scale, java.math.RoundingMode.HALF_UP), t.precision, t.scale)
      case BooleanType =>
        if (n.isBoolean) n.asBoolean()
        else if (n.isTextual) n.asText().trim.toLowerCase match {
          case "true" | "t" | "1" => true
          case "false" | "f" | "0" => false
          case other => fail(s"invalid boolean text '$other'")
        }
        else if (n.isIntegralNumber) n.asLong() != 0L
        // currentTokenAsBoolean VALUE_NUMBER_FLOAT →
        // DoubleOperators.castToBoolean: value != 0 (KAT replay r14)
        else if (n.isFloatingPointNumber) n.asDouble() != 0.0
        else fail(s"unexpected token for BOOLEAN: $n")
      case _: StringType =>
        // currentTokenAsVarchar: strings as-is, INT tokens keep their
        // literal text (the reference avoids the long round-trip so huge
        // integers can't overflow), FLOAT tokens render the PARSED double
        // (DoubleOperators.castToVarchar — `1e-324` reads as "0.0"),
        // booleans "true"/"false"; containers are NOT castable to
        // VARCHAR (JsonCastException — json_format is the rendering path)
        if (n.isTextual) UTF8String.fromString(n.asText())
        else if (n.isFloatingPointNumber)
          UTF8String.fromString(String.valueOf(n.asDouble()))
        else if (n.isNumber || n.isBoolean) UTF8String.fromString(n.asText())
        else fail(s"unexpected token for VARCHAR: $n")
      case ArrayType(et, _) =>
        if (!n.isArray) fail(s"expected a json array, got $n")
        val out = new Array[Any](n.size())
        var i = 0
        while (i < n.size()) { out(i) = decode(n.get(i), et, elemMask); i += 1 }
        new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
      case MapType(kt, vt, _) =>
        if (!n.isObject) fail(s"expected a json object, got $n")
        // canCastFromJson (JsonUtil.java): map KEYS must be a primitive
        // type — a JSON-typed key is not castable in the reference either
        if (keyMask eq JsonTargets.Json) fail("JSON map keys are not castable")
        val ks = scala.collection.mutable.ArrayBuffer.empty[Any]
        val vs = scala.collection.mutable.ArrayBuffer.empty[Any]
        val it = n.fields()
        while (it.hasNext) {
          val e = it.next()
          ks += decode(mapper.getNodeFactory.textNode(e.getKey), kt)
          vs += decode(e.getValue, vt, valMask)
        }
        org.apache.spark.sql.catalyst.util.ArrayBasedMapData(ks.toArray, vs.toArray)
      case st: StructType =>
        val out = new Array[Any](st.length)
        if (n.isArray) {
          if (n.size() != st.length)
            fail(s"json array of ${n.size()} elements for ROW of ${st.length} fields")
          var i = 0
          while (i < st.length) { out(i) = decode(n.get(i), st(i).dataType, fieldMask(i)); i += 1 }
        } else if (n.isObject) {
          val idx = st.fieldNames.map(_.toLowerCase(java.util.Locale.ENGLISH))
            .zipWithIndex.toMap
          val seen = new Array[Boolean](st.length)
          val it = n.fields()
          while (it.hasNext) {
            val e = it.next()
            idx.get(e.getKey.toLowerCase(java.util.Locale.ENGLISH)).foreach { i =>
              if (seen(i)) fail(s"duplicate field: ${e.getKey}")
              seen(i) = true
              out(i) = decode(e.getValue, st(i).dataType, fieldMask(i))
            }
          }
        } else fail(s"expected a json array or object, but got $n")
        org.apache.spark.sql.catalyst.InternalRow.fromSeq(out.toIndexedSeq)
      case other => fail(s"unsupported target type ${other.catalogString}")
    }
  }

  override def nullSafeEval(v: Any): Any =
    decode(mapper.readTree(v.asInstanceOf[UTF8String].toString), dataType, mask)

  override protected def withNewChildInternal(newChild: Expression): PrestoJsonDecode =
    copy(child = newChild)
}

/** `xxhash64(varbinary)` → VARBINARY — the reference's standard XXH64
  * (seed 0) digest emitted as 8 big-endian bytes
  * (VarbinaryFunctions.java:292-300: `Long.reverseBytes(XxHash64
  * .hash(slice))` into a little-endian slot ≡ big-endian byte order).
  * NOT Spark's builtin `xxhash64`, which is a seed-42 hash of the
  * SQL-typed value returning BIGINT — same name, entirely different
  * function; the session registration shadows it. The digest itself is
  * Spark's own `XXH64.hashUnsafeBytes` (a standard-vector-verified
  * xxHash64), so no hash code is re-implemented here; reference test
  * vectors are pinned in the `fn_extra_scalars` oracle row and FnSpec.
  * Long-tail scalar — CodegenFallback per house style.
  */
case class XxHash64Varbinary(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def prettyName: String = "xxhash64"
  override def dataType: DataType = BinaryType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"xxhash64 expects VARBINARY, got ${child.dataType.catalogString}")

  override def nullSafeEval(v: Any): Any = {
    val b = v.asInstanceOf[Array[Byte]]
    val h = XXH64.hashUnsafeBytes(
      b, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, b.length, 0L)
    java.nio.ByteBuffer.allocate(8).putLong(h).array()
  }

  override protected def withNewChildInternal(newChild: Expression): XxHash64Varbinary =
    copy(child = newChild)
}

/** Type-dispatching md5/sha1/xxhash64 (round 12). The reference defines
  * these ONLY over VARBINARY, returning VARBINARY digests
  * (VarbinaryFunctions.java:246-300) — but Spark 4's `functions.md5`/
  * `functions.xxhash64` route through the session registry BY NAME
  * (Column.fn), so a blanket name override would silently rewire the
  * engine's own internal Scala pipelines (minhash signatures, bloom
  * digest indexes) that rely on the Spark builtins' string-hex / seed-42
  * BIGINT behavior. Dispatch on the RESOLVED input type instead: a
  * VARBINARY operand — the only shape a Presto query can produce — gets
  * the reference digest; every other type keeps the Spark builtin
  * bit-for-bit.
  */
case class DigestDispatch(child: Expression, algo: String)
    extends Expression with RuntimeReplaceable
    with org.apache.spark.sql.catalyst.trees.UnaryLike[Expression] {

  override def prettyName: String = algo

  // the replacement must resolve AS BUILT (no implicit-cast pass runs
  // inside a RuntimeReplaceable), so the builtin arms cast explicitly —
  // the same string→utf8-bytes cast the analyzer would have inserted
  override lazy val replacement: Expression = (algo, child.dataType) match {
    case ("md5", BinaryType) => Unhex(Md5(child))
    case ("md5", _) => Md5(Cast(child, BinaryType))
    case ("sha1", BinaryType) => Unhex(Sha1(child))
    case ("sha1", _) => Sha1(Cast(child, BinaryType))
    case ("xxhash64", BinaryType) => XxHash64Varbinary(child)
    case ("xxhash64", _) => new XxHash64(Seq(child))
    case (other, _) => throw new IllegalArgumentException(s"DigestDispatch: $other")
  }

  override protected def withNewChildInternal(c: Expression): DigestDispatch =
    copy(child = c)
}

/** `regexp_extract(source, pattern[, group])` with the reference's
  * contract (JoniRegexpFunctions.java:245-276): the default group is 0
  * (the WHOLE match — Spark's builtin defaults to group 1), no match
  * returns NULL (Spark returns ''), and a group that did not
  * participate in the match returns NULL; a group index past
  * groupCount errors. Patterns are the Java∩RE2 common subset the
  * regex sweep pins (the reference runs Joni). Long-tail scalar —
  * CodegenFallback; the compiled pattern is memoized per instance
  * (patterns are literals in every realistic call).
  */
case class RegexpExtractPresto(first: Expression, second: Expression,
    third: Expression)
    extends TernaryExpression with CodegenFallback {

  override def prettyName: String = "regexp_extract"
  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  @transient private var lastPattern: String = _
  @transient private var compiled: java.util.regex.Pattern = _

  override def nullSafeEval(src: Any, pat: Any, grp: Any): Any = {
    val p = pat.asInstanceOf[UTF8String].toString
    if (compiled == null || lastPattern != p) {
      compiled = java.util.regex.Pattern.compile(p)
      lastPattern = p
    }
    val g = grp.asInstanceOf[Number].intValue
    val m = compiled.matcher(src.asInstanceOf[UTF8String].toString)
    require(g >= 0 && g <= m.groupCount(),
      s"Pattern has ${m.groupCount()} groups. Cannot access group $g")
    if (!m.find()) null
    else {
      val v = m.group(g)
      if (v == null) null else UTF8String.fromString(v)
    }
  }

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): RegexpExtractPresto =
    copy(first = f, second = s, third = t)
}

/** `split_part(string, delimiter, index)` with the reference's contract
  * (StringFunctions.java:449-492): the delimiter is a LITERAL string
  * (not a regex), index must be positive (errors otherwise), an index
  * past the number of fields returns NULL (Spark's builtin returns ''),
  * and an EMPTY delimiter splits per codepoint. Long-tail scalar —
  * CodegenFallback.
  */
case class SplitPartPresto(first: Expression, second: Expression,
    third: Expression)
    extends TernaryExpression with CodegenFallback {

  override def prettyName: String = "split_part"
  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override def nullSafeEval(str: Any, del: Any, idx: Any): Any = {
    val s = str.asInstanceOf[UTF8String].toString
    val d = del.asInstanceOf[UTF8String].toString
    val i = idx.asInstanceOf[Number].longValue
    // index <= 0 errors (StringFunctions.splitPart:453 raises
    // INVALID_FUNCTION_ARGUMENT). testSplitPartInvalid:600 carries an
    // assertFunction literal but is @Test(expectedExceptions=...) — the
    // literal never validates; the exception IS the contract.
    require(i > 0, "Index must be greater than zero")
    if (d.isEmpty) {
      // per-codepoint fields; index past the end -> NULL
      val n = s.codePointCount(0, s.length)
      if (i > n) null
      else {
        val start = s.offsetByCodePoints(0, (i - 1).toInt)
        val cp = s.codePointAt(start)
        UTF8String.fromString(new String(Character.toChars(cp)))
      }
    } else {
      var fieldStart = 0
      var remaining = i
      while (true) {
        val hit = s.indexOf(d, fieldStart)
        remaining -= 1
        if (remaining == 0) {
          val end = if (hit < 0) s.length else hit
          return UTF8String.fromString(s.substring(fieldStart, end))
        }
        if (hit < 0) return null // index past the last field
        fieldStart = hit + d.length
      }
      null // unreachable
    }
  }

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): SplitPartPresto =
    copy(first = f, second = s, third = t)
}

/** `random(n)` / `rand(n)` — a pseudo-random INTEGER in [0, n) of the
  * bound's own type in the reference (MathFunctions.java:574-610,
  * `ThreadLocalRandom.nextLong(bound)`; bound must be positive), where
  * Spark's same-named builtin treats the argument as a SEED for a
  * DOUBLE in [0, 1) — silent type-and-semantics divergence. Parser-seam
  * only (PrestoCallConventions): functions.rand(seed) keeps Spark
  * semantics for DataFrame code.
  */
case class RandomBound(child: Expression)
    extends UnaryExpression with Nondeterministic with CodegenFallback {

  override def prettyName: String = "random"
  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable

  override protected def initializeInternal(partitionIndex: Int): Unit = ()

  override protected def evalInternal(
      input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val b = child.eval(input)
    if (b == null) null
    else {
      val n = b.asInstanceOf[Number].longValue
      require(n > 0, "bound must be positive")
      val v = java.util.concurrent.ThreadLocalRandom.current().nextLong(n)
      child.dataType match {
        case LongType => v
        case IntegerType => v.toInt
        case ShortType => v.toShort
        case ByteType => v.toByte
        case other => throw new IllegalArgumentException(
          s"random(n): integral bound required, got ${other.catalogString}")
      }
    }
  }

  override protected def withNewChildInternal(newChild: Expression): RandomBound =
    copy(child = newChild)
}

/** `typeof(x)` rendering the reference's type display names
  * (TypeOfFunction.java:39 `type.getDisplayName()`): integer/bigint/
  * varchar/varbinary/row(...)/etc., where Spark's builtin prints its own
  * catalog names (int/string/binary/struct<...>). Pure type dispatch —
  * folds to a literal once the child resolves. VARCHAR renders without a
  * length (Spark's string type carries none); the zoned struct twins
  * render as their zone-carrying SQL types.
  */
case class PrestoTypeOf(child: Expression)
    extends Expression with RuntimeReplaceable
    with org.apache.spark.sql.catalyst.trees.UnaryLike[Expression] {

  override def prettyName: String = "typeof"

  private def render(dt: DataType): String = dt match {
    case _ if ZonedTimestamps.isZonedTime(dt) => "time with time zone"
    case _ if ZonedTimestamps.isZoned(dt) => "timestamp with time zone"
    case ByteType => "tinyint"
    case ShortType => "smallint"
    case IntegerType => "integer"
    case LongType => "bigint"
    case FloatType => "real"
    case DoubleType => "double"
    case BooleanType => "boolean"
    case _: StringType => "varchar"
    case BinaryType => "varbinary"
    case DateType => "date"
    case TimestampType | TimestampNTZType => "timestamp"
    case _: org.apache.spark.sql.types.TimeType => "time"
    case d: DecimalType => s"decimal(${d.precision},${d.scale})"
    case _: DayTimeIntervalType => "interval day to second"
    case _: YearMonthIntervalType => "interval year to month"
    case ArrayType(e, _) => s"array(${render(e)})"
    case MapType(k, v, _) => s"map(${render(k)}, ${render(v)})"
    case st: StructType =>
      st.fields.map(f => s"${f.name} ${render(f.dataType)}")
        .mkString("row(", ", ", ")")
    case NullType => "unknown"
    case other => other.catalogString
  }

  override lazy val replacement: Expression =
    Literal(UTF8String.fromString(render(child.dataType)), StringType)

  override protected def withNewChildInternal(newChild: Expression): PrestoTypeOf =
    copy(child = newChild)
}

/** `regexp_extract_all(source, pattern[, group])` with the reference's
  * contract (JoniRegexpFunctions.java:196-240): default group 0 (Spark
  * defaults 1), and a group that did not participate in a match
  * contributes a NULL element (Spark appends ''). Zero-length matches
  * advance by one codepoint like the reference's getEnd == getBegin
  * branch. Long-tail scalar — CodegenFallback.
  */
case class RegexpExtractAllPresto(first: Expression, second: Expression,
    third: Expression)
    extends TernaryExpression with CodegenFallback {

  override def prettyName: String = "regexp_extract_all"
  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def nullable: Boolean = children.exists(_.nullable)

  @transient private var lastPattern: String = _
  @transient private var compiled: java.util.regex.Pattern = _

  override def nullSafeEval(src: Any, pat: Any, grp: Any): Any = {
    val p = pat.asInstanceOf[UTF8String].toString
    if (compiled == null || lastPattern != p) {
      compiled = java.util.regex.Pattern.compile(p)
      lastPattern = p
    }
    val g = grp.asInstanceOf[Number].intValue
    val s = src.asInstanceOf[UTF8String].toString
    val m = compiled.matcher(s)
    require(g >= 0 && g <= m.groupCount(),
      s"Pattern has ${m.groupCount()} groups. Cannot access group $g")
    val out = scala.collection.mutable.ArrayBuffer.empty[UTF8String]
    var next = 0
    while (next <= s.length && m.find(next)) {
      val v = m.group(g)
      out += (if (v == null) null else UTF8String.fromString(v))
      // zero-length match: advance one CODEPOINT (not one UTF-16 char —
      // m.end + 1 could resume mid-surrogate-pair on non-BMP input;
      // round-13 ADVICE fix). The reference (Joni) advances one UTF-8
      // byte, which for valid input lands on the same next codepoint.
      next =
        if (m.end == m.start)
          (if (m.end < s.length) s.offsetByCodePoints(m.end, 1) else m.end + 1)
        else m.end
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out.toArray)
  }

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): RegexpExtractAllPresto =
    copy(first = f, second = s, third = t)
}

/** `json_extract(json, path)` / `get_json_object(json, path)` with the
  * reference's contract (JsonFunctions.java:443-467, JsonExtract
  * ObjectExtractor): returns the selected SUBTREE AS JSON TEXT — a
  * string scalar keeps its quotes (`"x"`), objects/arrays re-emit
  * compact — where Spark's GetJsonObject unquotes string scalars.
  * Missing path or malformed input → NULL; an explicit JSON null
  * renders as the text `null` (the ObjectExtractor writes the token).
  * Path subset the reference's JsonPath grammar accepts: `$`,
  * `.field`, `['field']`/`["field"]`, `[index]`. Long-tail scalar —
  * CodegenFallback; path parse memoized.
  */
case class JsonExtractPresto(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def prettyName: String = "json_extract"
  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  @transient private lazy val mapper =
    new com.fasterxml.jackson.databind.ObjectMapper()

  @transient private var lastPath: String = _
  @transient private var steps: Array[Either[String, Int]] = _

  private def parsePath(p: String): Array[Either[String, Int]] = {
    // NB scala.Left/Right, not catalyst's string expressions of the
    // same names (wildcard-imported above)
    require(p.startsWith("$"), s"Invalid JSON path: '$p'")
    val out = scala.collection.mutable.ArrayBuffer.empty[Either[String, Int]]
    var i = 1
    while (i < p.length) {
      p.charAt(i) match {
        case '.' =>
          val start = i + 1
          var j = start
          while (j < p.length && p.charAt(j) != '.' && p.charAt(j) != '[') j += 1
          require(j > start, s"Invalid JSON path: '$p'")
          out += scala.Left(p.substring(start, j))
          i = j
        case '[' =>
          val end = p.indexOf(']', i)
          require(end > i + 1, s"Invalid JSON path: '$p'")
          val inner = p.substring(i + 1, end).trim
          if ((inner.startsWith("'") && inner.endsWith("'")) ||
              (inner.startsWith("\"") && inner.endsWith("\"")))
            out += scala.Left(inner.substring(1, inner.length - 1))
          else out += scala.Right(inner.toInt)
          i = end + 1
        case other => throw new IllegalArgumentException(s"Invalid JSON path: '$p'")
      }
    }
    out.toArray
  }

  override def nullSafeEval(json: Any, path: Any): Any = {
    val p = path.asInstanceOf[UTF8String].toString
    if (steps == null || lastPath != p) {
      steps = parsePath(p)
      lastPath = p
    }
    val root =
      try mapper.readTree(json.asInstanceOf[UTF8String].toString)
      catch { case _: Exception => return null }
    var node: com.fasterxml.jackson.databind.JsonNode = root
    var i = 0
    while (i < steps.length) {
      if (node == null) return null
      node = steps(i) match {
        case scala.Left(f) => if (node.isObject) node.get(f) else null
        case scala.Right(ix) => if (node.isArray) node.get(ix) else null
      }
      i += 1
    }
    if (node == null) null
    else UTF8String.fromString(mapper.writeValueAsString(node))
  }

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): JsonExtractPresto =
    copy(left = l, right = r)
}

/** `map_concat(m1, m2, ...)` with the reference's contract
  * (MapConcatFunction.java:127-185): duplicate keys are allowed and the
  * LAST map's value wins — Spark's builtin honors the session
  * mapKeyDedupPolicy, which the engine pins to EXCEPTION for Presto's
  * erroring map CONSTRUCTOR, so stock map_concat wrongly errors on
  * overlap. Key order follows the reference's merge loop: the last
  * map's entries first (in their order), then each earlier map's
  * not-yet-seen entries, iterating maps backward. Keys dedupe by VALUE
  * through BufferKeyNormalization (binary/struct/array keys included).
  * NULL input map → NULL. Long-tail scalar — CodegenFallback.
  */
case class MapConcatPresto(children: Seq[Expression])
    extends Expression with CodegenFallback with BufferKeyNormalization {

  override def prettyName: String = "map_concat"

  @transient private lazy val mapType: MapType =
    children.head.dataType.asInstanceOf[MapType]
  override protected def keyType: DataType = mapType.keyType
  override def dataType: DataType = mapType
  override def nullable: Boolean = children.exists(_.nullable)
  override def foldable: Boolean = children.forall(_.foldable)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    if (children.isEmpty)
      TypeCheckResult.TypeCheckFailure("map_concat needs at least one map")
    else if (!children.forall(_.dataType.isInstanceOf[MapType]))
      TypeCheckResult.TypeCheckFailure(
        s"map_concat expects maps, got ${children.map(_.dataType.catalogString).mkString(", ")}")
    else if (children.map(_.dataType).distinct.size != 1)
      TypeCheckResult.TypeCheckFailure(
        s"map_concat arguments must share one map type, got ${children.map(_.dataType.catalogString).mkString(", ")}")
    else TypeCheckResult.TypeCheckSuccess
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val maps = children.map(_.eval(input))
    if (maps.contains(null)) return null
    val seen = scala.collection.mutable.HashSet.empty[Any]
    val keys = scala.collection.mutable.ArrayBuffer.empty[Any]
    val vals = scala.collection.mutable.ArrayBuffer.empty[Any]
    maps.reverseIterator.foreach { m =>
      val md = m.asInstanceOf[org.apache.spark.sql.catalyst.util.MapData]
      val ks = md.keyArray()
      val vs = md.valueArray()
      var i = 0
      while (i < md.numElements()) {
        val k = ks.get(i, mapType.keyType)
        if (seen.add(normKey(k))) {
          keys += org.apache.spark.sql.catalyst.InternalRow.copyValue(k)
          vals += org.apache.spark.sql.catalyst.InternalRow.copyValue(
            if (vs.isNullAt(i)) null else vs.get(i, mapType.valueType))
        }
        i += 1
      }
    }
    new org.apache.spark.sql.catalyst.util.ArrayBasedMapData(
      new org.apache.spark.sql.catalyst.util.GenericArrayData(keys.toArray),
      new org.apache.spark.sql.catalyst.util.GenericArrayData(vals.toArray))
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MapConcatPresto =
    copy(children = newChildren)
}

/** `from_utf8(binary[, replacement])` — type-dispatching 2-arg form
  * (StringFunctions.java:854-894): a VARCHAR replacement (≤ 1
  * codepoint, empty strips) or a BIGINT codepoint; both route to
  * GraftFnUtils.fromUtf8Fix via codegen-friendly StaticInvoke.
  */
case class FromUtf8Repl(left: Expression, right: Expression)
    extends Expression with RuntimeReplaceable
    with org.apache.spark.sql.catalyst.trees.BinaryLike[Expression] {

  override def prettyName: String = "from_utf8"

  override lazy val replacement: Expression = right.dataType match {
    case _: StringType =>
      org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke(
        GraftFnUtils.getClass, StringType, "fromUtf8Fix",
        Seq(Cast(left, BinaryType), right),
        inputTypes = Seq(BinaryType, StringType), propagateNull = true)
    case ByteType | ShortType | IntegerType | LongType =>
      org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke(
        GraftFnUtils.getClass, StringType, "fromUtf8FixCp",
        Seq(Cast(left, BinaryType), Cast(right, LongType)),
        inputTypes = Seq(BinaryType, LongType), propagateNull = true)
    case other => throw new IllegalArgumentException(
      s"from_utf8 replacement must be a string or a codepoint, got ${other.catalogString}")
  }

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): FromUtf8Repl =
    copy(left = l, right = r)
}
