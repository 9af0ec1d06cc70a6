package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.{ArrayData, MapData, TypeUtils}
import org.apache.spark.sql.types._

/** Reference comparison semantics under the operator dialect
  * (`spark.graft.prestoOperators`, see [[PrestoOperators]]) for the two
  * places Spark's comparisons legitimately differ:
  *
  *  - **Floating NaN**: the reference's scalar comparison operators are
  *    raw Java (DoubleOperators.java:139-176 `left == right` /
  *    `left > right`), so `NaN = NaN` is FALSE, `NaN > x` is FALSE and
  *    `NaN <> NaN` is TRUE; Spark's ordering-based comparisons treat NaN
  *    as equal-to-itself and larger-than-everything (`NaN = NaN` → true,
  *    `NaN > 5` → true). Grouping/DISTINCT/ORDER BY agree between the
  *    engines (both key NaN as one group and sort it last) and stay
  *    stock; `IS [NOT] DISTINCT FROM` agrees too (DoubleOperators
  *    distinctFrom special-cases NaN≡NaN exactly like Spark's `<=>`)
  *    and stays stock.
  *
  *  - **Structural equality is three-valued**: `ARRAY[1,NULL] =
  *    ARRAY[1,NULL]` is NULL in the reference (ArrayEqualOperator.java:
  *    any NULL element or indeterminate element-compare makes the result
  *    indeterminate unless some pair is definitely unequal — then FALSE;
  *    RowEqualOperator.java and MapEqualOperator.java/
  *    MapGenericEquality.java recurse the same way, with map size or a
  *    missing key deciding FALSE outright), where Spark's structural
  *    equality treats nested NULLs as equal (→ true). Spark also rejects
  *    `=` on maps entirely (INVALID_ORDERING_TYPE) which the reference
  *    supports. Array/row ORDERING comparisons in the reference ERROR on
  *    NULL elements (ArrayLessThanOperator/RowComparisonOperator
  *    checkElementNotNull) and compare elements with pairwise raw
  *    less-than (a NaN element is neither less nor greater — it reads as
  *    equal and the scan moves on), where Spark sorts NULL first and NaN
  *    last. `<=>` on arrays/rows agrees between engines (nested NULLs
  *    equal, NaN equal) and stays stock; on maps Spark errors, so the
  *    dialect supplies the reference's MapDistinctFromOperator contract.
  *
  * All rewrites fire only under the conf, only on resolved operands of
  * the affected types, and produce node types this rule never matches —
  * the resolution fixed point can't loop. IN lists over these types
  * follow by OR-composition (the reference's IN is defined over EQUAL:
  * TRUE if any member equals, NULL if none do but some compare
  * indeterminate — exactly `Or`'s three-valued fold). Everything else
  * (ints, decimals, strings, dates) is value-identical between the
  * engines and never rewritten; the DataFrame API keeps pure Spark
  * semantics like every other dialect seam.
  */
object PrestoComparisons {
  /** CHAR(n) length of an expression's resolved type (the session
    * preserves CharType — GraftSession preserveCharVarcharTypeInfo). */
  private[functions] def charLen(e: Expression): Option[Int] =
    e.dataType match {
      case c: CharType => Some(c.length)
      case _ => None
    }

  /** charLen looking through exactly ONE analyzer-inserted string cast
    * (char -> string); a second wrapping cast therefore never matches —
    * the refire guard for the unicodeTrim re-pad arm. */
  private[functions] def charLenThroughCast(e: Expression): Option[Int] =
    charLen(e).orElse(e match {
      case c: Cast if c.child.resolved => charLen(c.child)
      case _ => None
    })

  private[functions] def repadChar(inner: Expression, n: Int): Expression =
    StringRPad(inner, Literal(n), Literal(" "))

  /** Refire guard for the flatten null-skip arm: an ArrayFilter whose
    * lambda is exactly `x -> x IS NOT NULL`. */
  private[functions] def isNotNullFilter(e: Expression): Boolean = e match {
    case ArrayFilter(_, LambdaFunction(IsNotNull(v1: NamedLambdaVariable),
        Seq(v2: NamedLambdaVariable), _)) => v1.exprId == v2.exprId
    case _ => false
  }


  /** Scalar float/double comparisons keep their STOCK node and gain a
    * conjoined NaN guard: `cmp AND (CASE WHEN l IS NULL OR r IS NULL
    * THEN NULL ELSE NOT (isnan(l) OR isnan(r)) END)`. The conjunction is
    * exact for all five operators — whenever either operand is NaN (and
    * none is NULL) the reference's raw-Java result is false for
    * `= < <= > >=` (and Not() then yields true for `<>`), and Spark's
    * NaN-as-largest answer is overridden by the false guard; NULL
    * operands keep NULL because the guard itself goes NULL with them
    * (a bare `NOT isnan(..)` guard would evaluate AND(NULL, false) =
    * false for a NULL-vs-NaN pair, where the reference's
    * RETURN_NULL_ON_NULL convention says NULL — caught by the sweep's
    * dn2-NULL rows). Keeping the
    * stock node — rather than a custom raw-compare expression — is what
    * preserves the two scale paths: parquet filter pushdown translates
    * the And's comparison conjunct (PushedFilters survive the dialect),
    * and ExtractEquiJoinKeys still finds the EqualTo inside the And, so
    * float-keyed joins stay hash joins (with the guard as a post-join
    * condition) instead of degrading to nested loops.
    *
    * The tag stops the analyzer's next fixed-point pass from re-wrapping
    * the comparison we just guarded (tags survive withNewChildren; a
    * rule that rebuilds the node from scratch would merely cause one
    * redundant — still correct — extra guard).
    */
  private val NanGuardedTag =
    org.apache.spark.sql.catalyst.trees.TreeNodeTag[Unit]("graft.presto.nanGuarded")

  private[functions] def nanGuarded(cmp: BinaryComparison): Expression =
    if (cmp.left.deterministic && cmp.right.deterministic) {
      cmp.setTagValue(NanGuardedTag, ())
      val guard = If(
        Or(IsNull(cmp.left), IsNull(cmp.right)),
        Literal(null, BooleanType),
        Not(Or(IsNaN(cmp.left), IsNaN(cmp.right))))
      And(cmp, guard)
    } else {
      // a non-deterministic operand must evaluate ONCE (the reference
      // evaluates comparison operands once per row; re-evaluating e.g. a
      // NaN-producing expression over rand() in the guard would let the
      // comparison and the guard see different draws) — bind through
      // With. Pushdown doesn't apply to non-deterministic filters, so
      // nothing is lost by the opaque shape.
      With(cmp.left, cmp.right) { case Seq(l, r) =>
        val bound = cmp.withNewChildren(Seq(l, r)).asInstanceOf[BinaryComparison]
        bound.setTagValue(NanGuardedTag, ())
        And(bound, If(
          Or(IsNull(l), IsNull(r)),
          Literal(null, BooleanType),
          Not(Or(IsNaN(l), IsNaN(r)))))
      }
    }

  private[functions] def notYetGuarded(cmp: BinaryComparison): Boolean =
    cmp.getTagValue(NanGuardedTag).isEmpty

  private[functions] def isFloat(dt: DataType): Boolean =
    dt == DoubleType || dt == FloatType

  /** Shared recursion for the structural expressions below. */
  private object Structural {

    /** Three-valued equality (null = indeterminate), reference EQUAL
      * operator semantics at every level.
      */
    def eq(dt: DataType, a: Any, b: Any): java.lang.Boolean = dt match {
      case DoubleType =>
        java.lang.Boolean.valueOf(a.asInstanceOf[Double] == b.asInstanceOf[Double])
      case FloatType =>
        java.lang.Boolean.valueOf(a.asInstanceOf[Float] == b.asInstanceOf[Float])
      case ArrayType(et, _) =>
        val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
        if (x.numElements != y.numElements) return java.lang.Boolean.FALSE
        var indeterminate = false
        var i = 0
        while (i < x.numElements) {
          if (x.isNullAt(i) || y.isNullAt(i)) indeterminate = true
          else {
            val r = eq(et, x.get(i, et), y.get(i, et))
            if (r == null) indeterminate = true
            else if (!r) return java.lang.Boolean.FALSE
          }
          i += 1
        }
        if (indeterminate) null else java.lang.Boolean.TRUE
      case st: StructType =>
        val (x, y) = (a.asInstanceOf[org.apache.spark.sql.catalyst.InternalRow],
          b.asInstanceOf[org.apache.spark.sql.catalyst.InternalRow])
        var indeterminate = false
        var i = 0
        while (i < st.fields.length) {
          val ft = st.fields(i).dataType
          if (x.isNullAt(i) || y.isNullAt(i)) indeterminate = true
          else {
            val r = eq(ft, x.get(i, ft), y.get(i, ft))
            if (r == null) indeterminate = true
            else if (!r) return java.lang.Boolean.FALSE
          }
          i += 1
        }
        if (indeterminate) null else java.lang.Boolean.TRUE
      case MapType(kt, vt, _) =>
        val (x, y) = (a.asInstanceOf[MapData], b.asInstanceOf[MapData])
        if (x.numElements != y.numElements) return java.lang.Boolean.FALSE
        val (xk, xv, yk, yv) = (x.keyArray, x.valueArray, y.keyArray, y.valueArray)
        var indeterminate = false
        var i = 0
        while (i < xk.numElements) {
          // seekKey: a key matches only on DEFINITE equality (the
          // reference seeks with the key's EQUAL+hash — a NaN key never
          // finds itself); a missing key decides FALSE outright
          val j = findKey(kt, xk.get(i, kt), yk)
          if (j < 0) return java.lang.Boolean.FALSE
          if (xv.isNullAt(i) || yv.isNullAt(j)) indeterminate = true
          else {
            val r = eq(vt, xv.get(i, vt), yv.get(j, vt))
            if (r == null) indeterminate = true
            else if (!r) return java.lang.Boolean.FALSE
          }
          i += 1
        }
        if (indeterminate) null else java.lang.Boolean.TRUE
      case other =>
        java.lang.Boolean.valueOf(
          TypeUtils.getInterpretedOrdering(other).equiv(a, b))
    }

    def findKey(kt: DataType, key: Any, keys: ArrayData): Int = {
      var j = 0
      while (j < keys.numElements) {
        // map keys are non-null in both engines
        if (eq(kt, key, keys.get(j, kt)) == java.lang.Boolean.TRUE) return j
        j += 1
      }
      -1
    }

    /** Two-valued equality for the map `<=>` path (reference
      * IS_DISTINCT_FROM recursion: nested NULLs equal, NaN equal —
      * MapDistinctFromOperator / the per-type distinctFrom operators).
      */
    def nullSafeEq(dt: DataType, a: Any, b: Any): Boolean = dt match {
      case ArrayType(et, _) =>
        val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
        if (x.numElements != y.numElements) return false
        var i = 0
        while (i < x.numElements) {
          val (ln, rn) = (x.isNullAt(i), y.isNullAt(i))
          if (ln != rn) return false
          if (!ln && !nullSafeEq(et, x.get(i, et), y.get(i, et))) return false
          i += 1
        }
        true
      case st: StructType =>
        val (x, y) = (a.asInstanceOf[org.apache.spark.sql.catalyst.InternalRow],
          b.asInstanceOf[org.apache.spark.sql.catalyst.InternalRow])
        var i = 0
        while (i < st.fields.length) {
          val ft = st.fields(i).dataType
          val (ln, rn) = (x.isNullAt(i), y.isNullAt(i))
          if (ln != rn) return false
          if (!ln && !nullSafeEq(ft, x.get(i, ft), y.get(i, ft))) return false
          i += 1
        }
        true
      case MapType(kt, vt, _) =>
        val (x, y) = (a.asInstanceOf[MapData], b.asInstanceOf[MapData])
        if (x.numElements != y.numElements) return false
        val (xk, xv, yk, yv) = (x.keyArray, x.valueArray, y.keyArray, y.valueArray)
        var i = 0
        while (i < xk.numElements) {
          val j = findKey(kt, xk.get(i, kt), yk)
          if (j < 0) return false
          val (ln, rn) = (xv.isNullAt(i), yv.isNullAt(j))
          if (ln != rn) return false
          if (!ln && !nullSafeEq(vt, xv.get(i, vt), yv.get(j, vt))) return false
          i += 1
        }
        true
      case other =>
        // distinctFrom ≡ Spark's null-safe equality at the scalar level
        // (incl. NaN≡NaN — doubles use doubleToLongBits-style identity)
        TypeUtils.getInterpretedOrdering(other).equiv(a, b)
    }

    /** Pairwise-less lexicographic compare, reference LESS_THAN loop
      * (ArrayLessThanOperator / RowComparisonOperator): a NULL element
      * ERRORS, a NaN element is neither less nor greater (reads equal).
      * Returns <0 / 0 / >0; length breaks the tie for arrays.
      */
    def cmp(dt: DataType, a: Any, b: Any): Int = dt match {
      case DoubleType =>
        val (x, y) = (a.asInstanceOf[Double], b.asInstanceOf[Double])
        if (x < y) -1 else if (y < x) 1 else 0
      case FloatType =>
        val (x, y) = (a.asInstanceOf[Float], b.asInstanceOf[Float])
        if (x < y) -1 else if (y < x) 1 else 0
      case ArrayType(et, _) =>
        val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
        val len = math.min(x.numElements, y.numElements)
        var i = 0
        while (i < len) {
          if (x.isNullAt(i) || y.isNullAt(i)) throw new RuntimeException(
            "ARRAY comparison not supported for arrays with null elements")
          val c = cmp(et, x.get(i, et), y.get(i, et))
          if (c != 0) return c
          i += 1
        }
        Integer.compare(x.numElements, y.numElements)
      case st: StructType =>
        val (x, y) = (a.asInstanceOf[org.apache.spark.sql.catalyst.InternalRow],
          b.asInstanceOf[org.apache.spark.sql.catalyst.InternalRow])
        var i = 0
        while (i < st.fields.length) {
          if (x.isNullAt(i) || y.isNullAt(i)) throw new RuntimeException(
            s"ROW comparison not supported for fields with null elements")
          val ft = st.fields(i).dataType
          val c = cmp(ft, x.get(i, ft), y.get(i, ft))
          if (c != 0) return c
          i += 1
        }
        0
      case other =>
        TypeUtils.getInterpretedOrdering(other).compare(a, b)
    }
  }

  /** Three-valued structural `=` (reference ArrayEqualOperator /
    * RowEqualOperator / MapEqualOperator). Long-tail comparison, never a
    * scan hot path — CodegenFallback per house style.
    */
  case class StructuralEqual(left: Expression, right: Expression)
      extends BinaryExpression with Predicate with CodegenFallback {

    override def prettyName: String = "presto_structural_eq"
    override def nullable: Boolean = true
    override def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)

    override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
      val a = left.eval(input)
      if (a == null) return null
      val b = right.eval(input)
      if (b == null) return null
      val r = Structural.eq(left.dataType, a, b)
      if (r == null) null else r.booleanValue
    }
  }

  /** Structural ordering comparison (reference Array/Row LessThan and
    * friends): lexicographic pairwise-less, error on NULL elements.
    */
  case class StructuralCompare(symbol: String, left: Expression, right: Expression)
      extends BinaryExpression with Predicate with CodegenFallback {

    override def prettyName: String = "presto_structural_cmp"
    override def nullable: Boolean = left.nullable || right.nullable
    override def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)

    override protected def nullSafeEval(a: Any, b: Any): Any = {
      val c = Structural.cmp(left.dataType, a, b)
      symbol match {
        case "<"  => c < 0
        case "<=" => c <= 0
        case ">"  => c > 0
        case ">=" => c >= 0
      }
    }
  }

  /** Member search (`contains` / `array_position` / `array_remove`) with
    * the reference's EQUAL operator (ArrayContains.java,
    * ArrayPositionFunction.java, ArrayRemoveFunction.java): a NaN value
    * is never found (raw-Java element equality), and an INDETERMINATE
    * element comparison (structural elements containing NULLs) ERRORS
    * with the reference's NOT_SUPPORTED message — where Spark finds NaN
    * and treats nested NULLs as equal. Constructed only for float/
    * structural element types; every other element type keeps Spark's
    * codegen'd builtins (value-identical). Top-level NULL elements keep
    * the builtin contracts the engines share: contains → NULL when
    * nothing matched, position skips them, remove keeps them.
    */
  case class MemberSearch(kind: String, left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback {

    override def prettyName: String = s"presto_$kind"
    override def nullable: Boolean = true
    override def dataType: DataType = kind match {
      case "contains" => BooleanType
      case "position" => LongType
      case "remove" => left.dataType
    }
    override def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)

    private def et: DataType =
      left.dataType.asInstanceOf[ArrayType].elementType

    private def indeterminate(): Nothing = throw new RuntimeException(
      s"${if (kind == "contains") "contains" else s"array_$kind"} does not " +
        "support arrays with elements that are null or contain null")

    override protected def nullSafeEval(a: Any, b: Any): Any = {
      val arr = a.asInstanceOf[ArrayData]
      kind match {
        case "contains" =>
          var foundNull = false
          var i = 0
          while (i < arr.numElements) {
            if (arr.isNullAt(i)) foundNull = true
            else Structural.eq(et, arr.get(i, et), b) match {
              case null => indeterminate()
              case r => if (r) return true
            }
            i += 1
          }
          if (foundNull) null else false
        case "position" =>
          var i = 0
          while (i < arr.numElements) {
            if (!arr.isNullAt(i)) Structural.eq(et, arr.get(i, et), b) match {
              case null => indeterminate()
              case r => if (r) return (i + 1).toLong
            }
            i += 1
          }
          0L
        case "remove" =>
          val kept = scala.collection.mutable.ArrayBuffer.empty[Any]
          var i = 0
          while (i < arr.numElements) {
            if (arr.isNullAt(i)) kept += null
            else Structural.eq(et, arr.get(i, et), b) match {
              case null => indeterminate()
              case r => if (!r) kept += arr.get(i, et)
            }
            i += 1
          }
          new org.apache.spark.sql.catalyst.util.GenericArrayData(kept.toArray)
      }
    }
  }

  /** `<=>` on any map-containing type (Spark rejects the ordering; the
    * reference's MapDistinctFromOperator / recursing Array- and
    * RowDistinctFromOperator semantics, negated). nullSafeEq dispatches
    * on the full type, so top-level maps and maps nested in arrays/rows
    * share this node.
    */
  case class MapNotDistinct(left: Expression, right: Expression)
      extends BinaryExpression with Predicate with CodegenFallback {

    override def prettyName: String = "presto_map_not_distinct"
    override def nullable: Boolean = false
    override def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)

    override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
      val a = left.eval(input)
      val b = right.eval(input)
      if (a == null || b == null) a == null && b == null
      else Structural.nullSafeEq(left.dataType, a, b)
    }
  }

  /** The zoned-temporal carrier structs are VALUES of scalar types, not
    * rows — their comparisons belong to the zoned rewrites
    * ([[ZonedTimestamps]] instant comparison, ResolveZonedTimeCompare),
    * which fire in the same fixed-point batch; never treat them as
    * structural here.
    */
  private[functions] def structural(dt: DataType): Boolean = dt match {
    case _ if ZonedTimestamps.isZoned(dt) || ZonedTimestamps.isZonedTime(dt) => false
    case _: ArrayType | _: StructType | _: MapType => true
    case _ => false
  }

  /** Array/row ordering is defined in the reference only when the
    * element chain is orderable (maps never are — Spark rejects those
    * shapes too, and so does the reference's orderableWithVariadicBound).
    */
  private[functions] def orderable(dt: DataType): Boolean = dt match {
    case ArrayType(et, _) => orderable(et)
    case st: StructType => st.fields.forall(f => orderable(f.dataType))
    case _: MapType => false
    case _ => true
  }

  private[functions] def mkEqual(l: Expression, r: Expression): Expression =
    if (isFloat(l.dataType)) nanGuarded(EqualTo(l, r))
    else StructuralEqual(l, r)

  /** Scalar targets the JSON cast family defines (JsonOperators.java) —
    * integral targets route through PrestoCastToIntegral instead.
    */
  private[functions] def jsonScalarTarget(t: DataType): Boolean = t match {
    case DoubleType | FloatType | BooleanType => true
    case _: DecimalType => true
    case _: StringType => true
    case _ => false
  }

  /** sameType (nullability-insensitive): array/struct operands routinely
    * differ only in containsNull between a column and a literal.
    */
  private[functions] def ready(es: Expression*): Boolean =
    es.forall(_.resolved) && es.tail.forall(e =>
      org.apache.spark.sql.graft.ColumnBridge.sameType(
        e.dataType, es.head.dataType))
}

/** The dialect-gated resolution rule. Fires after type coercion has
  * settled operand types (same fixed-point batch as the other injected
  * rules); every produced node is a type the matcher ignores, so the
  * rewrite is single-shot.
  */
object PrestoComparisonRule extends Rule[LogicalPlan] {
  import PrestoComparisons._

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!PrestoOperators.enabled) plan
    else plan.resolveExpressions {
      // structural operands whose nested NUMERIC WIDTHS differ (array of
      // decimal(22,10) vs array of decimal(20,10), map value widths, …):
      // the reference's implicit coercions widen them, Spark's
      // DecimalPrecision only handles TOP-LEVEL decimals and rejects the
      // nested mismatch (KAT replay r14, TestArrayOperators/
      // TestMapOperators comparison vectors). Cast both sides to the
      // wider common type; the produced comparison has equal types, so
      // this arm cannot refire.
      case cmp: BinaryComparison
          if cmp.left.resolved && cmp.right.resolved &&
            structural(cmp.left.dataType) && structural(cmp.right.dataType) &&
            !org.apache.spark.sql.graft.ColumnBridge.sameType(
              cmp.left.dataType, cmp.right.dataType) &&
            org.apache.spark.sql.graft.ColumnBridge.widerCommonType(
              Seq(cmp.left.dataType, cmp.right.dataType)).isDefined =>
        val w = org.apache.spark.sql.graft.ColumnBridge.widerCommonType(
          Seq(cmp.left.dataType, cmp.right.dataType)).get
        cmp.withNewChildren(Seq(
          if (cmp.left.dataType == w) cmp.left else Cast(cmp.left, w),
          if (cmp.right.dataType == w) cmp.right else Cast(cmp.right, w)))

      case cmp: BinaryComparison
          if !cmp.isInstanceOf[EqualNullSafe] && notYetGuarded(cmp) &&
            ready(cmp.left, cmp.right) && isFloat(cmp.left.dataType) =>
        nanGuarded(cmp)

      // JSON → scalar casts (JsonOperators.java castToBigint/…/castToVarchar
      // via JsonUtil currentTokenAs*): the engine models JSON as VARCHAR,
      // so `cast(JSON '128.9' AS DOUBLE)` reaches the analyzer as a plain
      // string cast — which parses by Java rules instead of by JSON token
      // class (`'true'` → error, `'"128"'` keeps quotes, `cast(JSON 'null'
      // AS x)` errors instead of SQL NULL). Recover the JSON-ness from the
      // producer expression and route through the same token-coercing
      // decoder the complex JSON casts use. Integral targets are handled
      // inside PrestoCastToIntegral (the parser rewrites those casts before
      // analysis); TRY casts keep Spark's null-on-error node untouched.
      case c: Cast
          if c.child.resolved && c.child.dataType.isInstanceOf[StringType] &&
            c.evalMode != EvalMode.TRY && jsonScalarTarget(c.dataType) &&
            JsonTargets.isJsonExpr(c.child) =>
        PrestoJsonDecode(c.child, c.dataType.sql)

      // Floating `%` is raw IEEE in the reference (DoubleOperators.java:
      // 122-130 / RealOperators.java:124-127 — plain Java `left % right`,
      // `x % 0.0` → NaN, never an error), where Spark's ANSI Remainder
      // raises REMAINDER_BY_ZERO (KAT wave 9, TestRealOperators
      // `REAL'-0.0' % REAL'0.0'`). Rewritten POST-coercion — both
      // operands already share the float/double type, so no re-stated
      // coercion (the pre-analysis RuntimeReplaceable attempt broke
      // mixed-width integral `%` for exactly that reason). Integral and
      // decimal `%` keep Spark's node: both engines error on zero there.
      case r: Remainder
          if ready(r.left, r.right) &&
            (r.left.dataType == FloatType || r.left.dataType == DoubleType) =>
        val mod = org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke(
          GraftFnUtils.getClass, DoubleType, "ieeeModDouble",
          Seq(Cast(r.left, DoubleType), Cast(r.right, DoubleType)),
          inputTypes = Seq(DoubleType, DoubleType), propagateNull = true)
        if (r.left.dataType == FloatType) Cast(mod, FloatType) else mod

      // (CHAR comparison stays a DOCUMENTED divergence: the fork's own
      // char ordering is internally buggy — its tests pin
      // `cast(' ' as char(1)) < cast(' ' as char(1))` = TRUE — so there
      // is no coherent semantics to reproduce; the engine keeps padded
      // string comparison per its §1.2 CHAR model.)

      // LIKE has NO default escape character in the reference (backslash
      // is a literal unless an ESCAPE clause names one — its own vectors
      // pin '_monkey_' LIKE '\_monkey\_' = false), where Spark defaults
      // to backslash. NUL can't appear in pattern text, so it acts as
      // "no escape". Explicit ESCAPE clauses set a different char and
      // never match this arm; the produced node can't refire.
      case l: Like if l.escapeChar == '\u0001' =>
        // an EXPLICIT `ESCAPE '\'` clause (legal in the reference; same
        // semantics as Spark's default LIKE) parses identically to the
        // default-escape node, so the parser rewrites the clause to the
        // '\u0001' sentinel (rewriteExplicitBsEscape) and it lands here
        // instead of being stripped by the arm below. LikeBackslash is
        // not a Like, so neither arm can refire on the output.
        org.apache.spark.sql.graft.LikeBackslash(l.left, l.right)
      case l: Like if l.escapeChar == '\\' =>
        Like(l.left, l.right, '\u0000')

      // TRIM-family and SUBSTR over CHAR(x) return char(x) in the
      // reference — the result re-pads to the declared length
      // (TestStringFunctions CHAR vectors: LTRIM(CAST('  hello  ' AS
      // CHAR(9))) = 'hello    '; KAT value gate r15). The inner source
      // recasts to STRING so the arm cannot refire.
      case t: StringTrim
          if t.srcStr.resolved && PrestoComparisons.charLen(t.srcStr).isDefined &&
            t.trimStr.isEmpty =>
        PrestoComparisons.repadChar(
          StringTrim(Cast(t.srcStr, StringType), None),
          PrestoComparisons.charLen(t.srcStr).get)
      case t: StringTrimLeft
          if t.srcStr.resolved && PrestoComparisons.charLen(t.srcStr).isDefined &&
            t.trimStr.isEmpty =>
        PrestoComparisons.repadChar(
          StringTrimLeft(Cast(t.srcStr, StringType), None),
          PrestoComparisons.charLen(t.srcStr).get)
      case t: StringTrimRight
          if t.srcStr.resolved && PrestoComparisons.charLen(t.srcStr).isDefined &&
            t.trimStr.isEmpty =>
        PrestoComparisons.repadChar(
          StringTrimRight(Cast(t.srcStr, StringType), None),
          PrestoComparisons.charLen(t.srcStr).get)
      // the dialect's 1-arg trim family resolves to the unicodeTrim
      // StaticInvoke before this rule sees it — same re-pad contract.
      // The analyzer's implicit input cast (char -> string) hides the
      // CharType one level down, so look through ONE cast; the rewrite
      // adds a second string cast, which blocks the refire.
      case si: org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
          if si.functionName == "unicodeTrim" && si.arguments.nonEmpty &&
            si.arguments.head.resolved &&
            PrestoComparisons.charLenThroughCast(si.arguments.head).isDefined =>
        val n = PrestoComparisons.charLenThroughCast(si.arguments.head).get
        PrestoComparisons.repadChar(
          si.copy(arguments =
            Cast(si.arguments.head, StringType) +: si.arguments.tail), n)

      // (substr over CHAR stays in the documented CHAR-model class:
      // the dialect's guarded-If substr shape coerces its branches
      // before this rule can see the char-typed source — 9 KAT vectors,
      // named with the comparison class)

      // flatten SKIPS null sub-arrays in the reference
      // (ArrayFlattenFunction.flatten:97-98 writes only non-null
      // positions) where Spark's builtin nulls the whole result on any
      // null element (KAT value gate r15). The IsNotNull-filter shape is
      // the refire guard.
      case f: Flatten
          if f.child.resolved && f.child.dataType.isInstanceOf[ArrayType] &&
            !PrestoComparisons.isNotNullFilter(f.child) =>
        val at = f.child.dataType.asInstanceOf[ArrayType]
        val v = NamedLambdaVariable("graft_fl", at.elementType, at.containsNull)
        Flatten(ArrayFilter(f.child, LambdaFunction(IsNotNull(v), Seq(v))))

      // CAST(interval AS VARCHAR) renders the BARE value in the
      // reference ('12 10:45:32.123' / '126-6' — SqlIntervalDayTime/
      // SqlIntervalYearMonth toString), not Spark's INTERVAL '…' form
      case c: Cast
          if c.dataType.isInstanceOf[StringType] && c.child.resolved &&
            c.child.dataType.isInstanceOf[DayTimeIntervalType] =>
        org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke(
          GraftFnUtils.getClass, StringType, "renderDayTimeInterval",
          Seq(c.child), inputTypes = Seq(c.child.dataType), propagateNull = true)
      case c: Cast
          if c.dataType.isInstanceOf[StringType] && c.child.resolved &&
            c.child.dataType.isInstanceOf[YearMonthIntervalType] =>
        org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke(
          GraftFnUtils.getClass, StringType, "renderYearMonthInterval",
          Seq(c.child), inputTypes = Seq(c.child.dataType), propagateNull = true)

      // CAST(TIME/TIMESTAMP AS VARCHAR) renders with MILLISECONDS always
      // (SqlTime/SqlTimestamp.toString — '03:04:05.000'; KAT value gate
      // r15), where Spark's cast drops a zero fraction
      case c: Cast
          if c.dataType.isInstanceOf[StringType] && c.child.resolved &&
            c.child.dataType.isInstanceOf[org.apache.spark.sql.types.TimeType] =>
        org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke(
          GraftFnUtils.getClass, StringType, "renderTimeVarchar",
          Seq(c.child), inputTypes = Seq(c.child.dataType), propagateNull = true)
      case c: Cast
          if c.dataType.isInstanceOf[StringType] && c.child.resolved &&
            (c.child.dataType == TimestampType ||
              c.child.dataType == TimestampNTZType) =>
        org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke(
          GraftFnUtils.getClass, StringType, "renderTimestampVarchar",
          Seq(c.child), inputTypes = Seq(c.child.dataType), propagateNull = true)

      // IPADDRESS/IPPREFIX ordering comparisons use the reference's
      // fixed-width binary key — 16 bytes per address, network+length
      // for prefixes (IpAddressOperators/IpPrefixOperators compare the
      // stored slice) — because canonical-TEXT order diverges for
      // mixed-family or multi-digit operands ('::1' < '1.2.3.5' holds
      // in bytes, not in text). Equality/IS DISTINCT FROM stay textual
      // (the canonical form is injective). The produced children are
      // BinaryType, so the arm cannot refire.
      case cmp @ (_: LessThan | _: LessThanOrEqual | _: GreaterThan |
          _: GreaterThanOrEqual)
          if ready(cmp.asInstanceOf[BinaryComparison].left,
              cmp.asInstanceOf[BinaryComparison].right) &&
            cmp.asInstanceOf[BinaryComparison].left.dataType
              .isInstanceOf[StringType] &&
            (IpOps.isIpExpr(cmp.asInstanceOf[BinaryComparison].left) ||
              IpOps.isIpExpr(cmp.asInstanceOf[BinaryComparison].right)) =>
        val b = cmp.asInstanceOf[BinaryComparison]
        b.withNewChildren(Seq(IpOps.orderKey(b.left), IpOps.orderKey(b.right)))

      // CAST(ipaddress AS VARBINARY): the 16-byte form, not the utf8
      // bytes of the text (IpAddressOperators.java:187-190)
      case c: Cast
          if c.dataType == BinaryType && c.child.resolved &&
            c.child.dataType.isInstanceOf[StringType] &&
            c.evalMode != EvalMode.TRY && IpOps.isIpAddressExpr(c.child) =>
        org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke(
          ExtraFns.getClass, BinaryType, "ipToVarbinaryU",
          Seq(c.child), inputTypes = Seq(StringType), propagateNull = true)

      case EqualTo(l, r) if ready(l, r) && structural(l.dataType) =>
        StructuralEqual(l, r)
      case LessThan(l, r)
          if ready(l, r) && structural(l.dataType) && orderable(l.dataType) =>
        StructuralCompare("<", l, r)
      case LessThanOrEqual(l, r)
          if ready(l, r) && structural(l.dataType) && orderable(l.dataType) =>
        StructuralCompare("<=", l, r)
      case GreaterThan(l, r)
          if ready(l, r) && structural(l.dataType) && orderable(l.dataType) =>
        StructuralCompare(">", l, r)
      case GreaterThanOrEqual(l, r)
          if ready(l, r) && structural(l.dataType) && orderable(l.dataType) =>
        StructuralCompare(">=", l, r)

      // `<=>` (IS NOT DISTINCT FROM) anywhere a MAP appears in the type:
      // Spark rejects the ordering, the reference recurses distinctFrom
      // (MapDistinctFromOperator; Array/RowDistinctFromOperator recurse
      // into map-typed elements). Map-free arrays/structs stay on
      // Spark's builtin — it already matches the reference.
      case EqualNullSafe(l, r)
          if ready(l, r) && containsMap(l.dataType) =>
        MapNotDistinct(l, r)

      // member-function argument shapes Spark's analysis rejects but the
      // reference accepts (TestArrayOperators vectors, round 13):
      // a NULL-typed probe is RETURN_NULL_ON_NULL (constant NULL of the
      // result type), an untyped-empty/all-NULL array adopts the probe's
      // element type, and mixed-width numeric probe/element pairs widen
      // to the common type (the reference's implicit numeric coercions).
      case MemberFn(fn, arr, v, _) if v.dataType == NullType =>
        Literal(null, fn match {
          case "remove" => arr.dataType
          case "position" => LongType
          case _ => BooleanType
        })
      case MemberFn(fn, arr, v, rebuild)
          if arr.dataType.asInstanceOf[ArrayType].elementType == NullType &&
            v.dataType != NullType =>
        rebuild(Cast(arr, ArrayType(v.dataType)), v)
      case MemberFn(fn, arr, v, rebuild)
          if numericish(arr.dataType.asInstanceOf[ArrayType].elementType) &&
            numericish(v.dataType) &&
            arr.dataType.asInstanceOf[ArrayType].elementType != v.dataType &&
            widenPair(arr, v).isDefined =>
        val (a2, v2) = widenPair(arr, v).get
        rebuild(a2, v2)

      // map_concat over heterogeneous-but-coercible argument types
      // (MapConcatFunction accepts empty maps, bare NULLs, and maps whose
      // key/value widths differ — TestMapOperators MAP_CONCAT vectors):
      // compute the wider common map type across the arguments and cast
      // every argument to it; fires only when the types actually differ,
      // so it cannot loop
      case mc: MapConcatPresto
          if mc.children.forall(_.resolved) &&
            mc.children.map(_.dataType).distinct.size > 1 &&
            commonMapType(mc.children).isDefined =>
        val target = commonMapType(mc.children).get
        MapConcatPresto(mc.children.map { c =>
          if (c.dataType == NullType) Literal.create(null, target)
          else if (c.dataType == target) c
          else Cast(c, target)
        })

      // reduce/aggregate with a NARROWER initial state than the merge
      // lambda's result — `reduce(bigint_array, 0, (s, x) -> s + x, ..)`
      // — unifies the state type in the reference's signature resolution
      // (S is bound once across initialState and the lambdas) where
      // Spark demands zero.dataType == merge result and rejects the
      // int-literal zero (KAT replay r14, TestArrayReduceFunction).
      // Widen: cast the zero and RE-TYPE each lambda's accumulator
      // variable (body references replaced by exprId — the old variable
      // object would otherwise keep receiving the evaluated state).
      case aa: ArrayAggregate
          if aa.childrenResolved && aa.merge.resolved && aa.finish.resolved &&
            numericish(aa.zero.dataType) &&
            aa.merge.asInstanceOf[LambdaFunction].function.dataType != aa.zero.dataType &&
            numericish(aa.merge.asInstanceOf[LambdaFunction].function.dataType) &&
            org.apache.spark.sql.graft.ColumnBridge.widerCommonType(Seq(
              aa.zero.dataType,
              aa.merge.asInstanceOf[LambdaFunction].function.dataType))
              .contains(aa.merge.asInstanceOf[LambdaFunction].function.dataType) =>
        val target = aa.merge.asInstanceOf[LambdaFunction].function.dataType
        def retypeAcc(e: Expression): LambdaFunction = {
          val lf = e.asInstanceOf[LambdaFunction]
          val acc = lf.arguments.head.asInstanceOf[NamedLambdaVariable]
          val acc2 = acc.copy(dataType = target)
          val body2 = lf.function.transform {
            case v: NamedLambdaVariable if v.exprId == acc.exprId => acc2
          }
          LambdaFunction(body2, acc2 +: lf.arguments.tail, lf.hidden)
        }
        ArrayAggregate(aa.argument, Cast(aa.zero, target),
          retypeAcc(aa.merge), retypeAcc(aa.finish))

      // binary array set operations with a bare-NULL argument:
      // RETURN_NULL_ON_NULL in the reference (array_except(NULL, NULL)
      // → NULL :: array(unknown), TestArrayExcept/IntersectFunction
      // vectors — KAT replay r14) where Spark rejects the NullType
      // operand at analysis
      case ArrayIntersect(l, r) if nullSetOpArg(l, r) =>
        Literal.create(null, setOpType(l, r))
      case ArrayExcept(l, r) if nullSetOpArg(l, r) =>
        Literal.create(null, setOpType(l, r))
      case ArrayUnion(l, r) if nullSetOpArg(l, r) =>
        Literal.create(null, setOpType(l, r))
      case ArraysOverlap(l, r) if nullSetOpArg(l, r) =>
        Literal.create(null, BooleanType)

      // binary array set operations over MIXED-width numeric element
      // types (the reference's implicit coercions accept
      // array_intersect(ARRAY[2, 3], ARRAY[2.0, 3.0]); Spark demands
      // identical element types) — widen both sides
      case ai @ ArrayIntersect(l, r) if widenArrays(l, r).isDefined =>
        val (l2, r2) = widenArrays(l, r).get; ArrayIntersect(l2, r2)

      // array_intersect emits the LONGER operand's first-occurrence
      // order (ArrayIntersectFunction.java:38-42 swaps so the shorter
      // side becomes the membership set; KAT value gate r15) — Spark's
      // builtin always iterates the left. CommonExpressionRef children
      // mark the already-rewritten inner nodes.
      case ArrayIntersect(l, r)
          if l.resolved && r.resolved &&
            !l.isInstanceOf[CommonExpressionRef] &&
            widenArrays(l, r).isEmpty && !nullSetOpArg(l, r) =>
        With(l, r) { case Seq(a, b) =>
          If(LessThan(Size(a), Size(b)),
            ArrayIntersect(b, a), ArrayIntersect(a, b))
        }
      case ae @ ArrayExcept(l, r) if widenArrays(l, r).isDefined =>
        val (l2, r2) = widenArrays(l, r).get; ArrayExcept(l2, r2)
      case au @ ArrayUnion(l, r) if widenArrays(l, r).isDefined =>
        val (l2, r2) = widenArrays(l, r).get; ArrayUnion(l2, r2)
      case ao @ ArraysOverlap(l, r) if widenArrays(l, r).isDefined =>
        val (l2, r2) = widenArrays(l, r).get; ArraysOverlap(l2, r2)

      // member search over float/structural elements follows the
      // reference EQUAL operator (NaN never found; indeterminate errors).
      // `contains` arrives as the graft ContainsDispatch (matched here
      // during analysis — its own replacement is picked at optimizer
      // time, after a `withPresto` scope has already closed);
      // array_position/array_remove arrive as Spark's builtins.
      case cd: ContainsDispatch
          if cd.left.resolved && cd.right.resolved && memberSearched(cd.left) =>
        MemberSearch("contains", cd.left, cd.right)
      case ArrayContains(arr, v)
          if arr.resolved && v.resolved && memberSearched(arr) =>
        MemberSearch("contains", arr, v)
      case ArrayPosition(arr, v)
          if arr.resolved && v.resolved && memberSearched(arr) =>
        MemberSearch("position", arr, v)
      case ArrayRemove(left, right)
          if left.resolved && right.resolved && memberSearched(left) =>
        MemberSearch("remove", left, right)

      // IN over these types: the reference defines IN by EQUAL, which is
      // exactly Or's three-valued fold over the member equalities. The
      // fold deliberately forgoes Spark's InSet fast path: a v-side-only
      // guard cannot reproduce the reference's NULL verdict for
      // `NaN IN (NULL)` (member-side indeterminacy), and float literal
      // IN-lists long enough for InSet to matter are not a realistic
      // shape (ID lists are integral and stay stock).
      case In(v, list)
          if list.nonEmpty && !list.exists(_.isInstanceOf[ListQuery]) &&
            ready(v +: list: _*) &&
            (isFloat(v.dataType) || structural(v.dataType)) =>
        if ((v +: list).forall(_.deterministic))
          list.map(e => mkEqual(v, e)).reduceLeft[Expression](Or(_, _))
        else
          // IN evaluates the probe and each member once per row in the
          // reference — bind every operand before the Or-fold repeats
          // the probe across member equalities
          With(v +: list: _*) { refs =>
            refs.tail.map(e => mkEqual(refs.head, e))
              .reduceLeft[Expression](Or(_, _))
          }
    }

  /** Member-search rewrites apply when element equality diverges: float
    * (NaN) or structural (indeterminate) element types.
    */
  private def memberSearched(arr: Expression): Boolean = arr.dataType match {
    case ArrayType(et, _) => isFloat(et) || structural(et)
    case _ => false
  }

  private def containsMap(dt: DataType): Boolean = dt match {
    case _: MapType => true
    case ArrayType(et, _) => containsMap(et)
    case st: StructType => st.fields.exists(f => containsMap(f.dataType))
    case _ => false
  }

  /** Extractor unifying the four member-function shapes into
    * (name, array, value, rebuild) for the argument-coercion cases.
    * Matches only RESOLVED array-typed forms.
    */
  private object MemberFn {
    def unapply(e: Expression)
        : Option[(String, Expression, Expression, (Expression, Expression) => Expression)] = e match {
      case cd: ContainsDispatch
          if cd.left.resolved && cd.right.resolved &&
            cd.left.dataType.isInstanceOf[ArrayType] =>
        Some(("contains", cd.left, cd.right, (a, v) => ContainsDispatch(a, v)))
      // every arm requires an ARRAY-typed first argument (not just
      // ContainsDispatch): array_position(5, NULL) must NOT rewrite to a
      // typed NULL (both engines raise an analysis error there), and
      // array_position(5, 3) must fall through to Spark's normal
      // type-check error rather than a ClassCastException in the
      // coercion guards' ArrayType casts
      case ArrayContains(a, v)
          if a.resolved && v.resolved && a.dataType.isInstanceOf[ArrayType] =>
        Some(("contains", a, v, (a2, v2) => ArrayContains(a2, v2)))
      case ArrayPosition(a, v)
          if a.resolved && v.resolved && a.dataType.isInstanceOf[ArrayType] =>
        Some(("position", a, v, (a2, v2) => ArrayPosition(a2, v2)))
      case ArrayRemove(a, v)
          if a.resolved && v.resolved && a.dataType.isInstanceOf[ArrayType] =>
        Some(("remove", a, v, (a2, v2) => ArrayRemove(a2, v2)))
      case _ => None
    }
  }

  private def numericish(dt: DataType): Boolean =
    dt.isInstanceOf[NumericType]

  /** A bare-NULL operand to a binary array set op (both sides resolved,
    * at least one NullType, the other NULL or an array).
    */
  private def nullSetOpArg(l: Expression, r: Expression): Boolean =
    l.resolved && r.resolved &&
      (l.dataType == NullType || r.dataType == NullType) &&
      Seq(l, r).forall(e =>
        e.dataType == NullType || e.dataType.isInstanceOf[ArrayType])

  /** Result type for the NULL-argument set-op rewrite: the non-null
    * side's array type, else array(unknown).
    */
  private def setOpType(l: Expression, r: Expression): DataType =
    Seq(l, r).map(_.dataType).collectFirst { case a: ArrayType => a }
      .getOrElse(ArrayType(NullType))

  /** Wider common MAP type across map_concat arguments: bare NULLs and
    * VOID-typed empty maps adopt the others' type; numeric widths widen
    * through findWiderCommonType. None when any argument is neither a
    * map nor NULL, or no common type exists.
    */
  private def commonMapType(args: Seq[Expression]): Option[MapType] = {
    val mapTypes = args.map(_.dataType).collect { case m: MapType => m }
    if (mapTypes.isEmpty ||
        !args.forall(a => a.dataType.isInstanceOf[MapType] || a.dataType == NullType))
      return None
    val wider = org.apache.spark.sql.graft.ColumnBridge.widerCommonType _
    for {
      k <- wider(mapTypes.map(_.keyType))
      v <- wider(mapTypes.map(_.valueType))
    } yield MapType(k, v, mapTypes.exists(_.valueContainsNull))
  }

  /** Both-arrays widening for the set operations: fires only when the
    * element types are numeric AND differ (same-type pairs resolve on
    * Spark's own path, so this cannot loop).
    */
  private def widenArrays(l: Expression, r: Expression)
      : Option[(Expression, Expression)] = (l, r) match {
    case _ if !l.resolved || !r.resolved => None
    case _ => (l.dataType, r.dataType) match {
      case (ArrayType(le, ln), ArrayType(re, rn))
          if le != re && numericish(le) && numericish(re) =>
        org.apache.spark.sql.graft.ColumnBridge
          .widerCommonType(Seq(le, re)).map { w =>
            (if (le == w) l else Cast(l, ArrayType(w, ln)),
             if (re == w) r else Cast(r, ArrayType(w, rn)))
          }
      case _ => None
    }
  }

  private def widenPair(arr: Expression, v: Expression)
      : Option[(Expression, Expression)] = {
    val at = arr.dataType.asInstanceOf[ArrayType]
    org.apache.spark.sql.graft.ColumnBridge
      .widerCommonType(Seq(at.elementType, v.dataType)).map { w =>
        val a2 =
          if (at.elementType == w) arr else Cast(arr, ArrayType(w, at.containsNull))
        val v2 = if (v.dataType == w) v else Cast(v, w)
        (a2, v2)
      }
  }
}
