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
    val n = if (fromEnd) -n0 else n0
    if (p.isEmpty) return 1L
    // collect codepoint-based positions of all occurrences
    val positions = scala.collection.mutable.ArrayBuffer.empty[Long]
    var idx = s.indexOf(p)
    while (idx >= 0) {
      positions += (s.codePointCount(0, idx) + 1).toLong
      idx = s.indexOf(p, idx + 1)
    }
    val i = if (n > 0) n - 1 else positions.length + n
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
      // the replacement is not a child, so ResolveTimeZone never visits
      // it — pin the session zone here or the expression stays unresolved
      StructsToJson(Map.empty, child,
        Some(org.apache.spark.sql.internal.SQLConf.get.sessionLocalTimeZone))
    case BooleanType | _: NumericType =>
      Cast(child, StringType)
    case DateType | TimestampType | TimestampNTZType =>
      StaticInvokeJsonQuote(Cast(child, StringType))
    case NullType => Literal(UTF8String.fromString("null"), StringType)
    case other =>
      throw new IllegalArgumentException(
        s"CAST(... AS JSON): unsupported source type ${other.catalogString}")
  }

  override protected def withNewChildInternal(newChild: Expression): CastToJson =
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
