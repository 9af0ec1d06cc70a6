package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Struct-point ↔ WKT interop dispatches (KAT wave 9). The engine keeps
  * TWO point representations on purpose: `ST_Point(x, y)` builds a
  * codegen'd `struct<x, y>` — the distance-join hot path — while the
  * general geometry layer is canonical WKT text. The reference's test
  * corpus freely composes the two (`ST_AsText(ST_Point(1, 4))`,
  * `ST_LineString(array[ST_Point(..), ..])`), so the functions that can
  * receive either late-bind on the resolved child type.
  */

/** `ST_AsText(g)` / `to_geometry`-style canonicalization: a struct point
  * renders `POINT (x y)`; WKT text parse-and-prints through the full
  * canonicalizer (GeoFunctions.java:255 — the serialized form IS the
  * canonical text here).
  */
case class GeoAsTextExpr(child: Expression)
    extends Expression with RuntimeReplaceable with UnaryLike[Expression] {

  override def prettyName: String = "st_astext"

  override lazy val replacement: Expression = child.dataType match {
    case st: StructType =>
      StaticInvoke(GeometryFns.getClass, StringType, "pointWktU",
        Seq(Cast(GetStructField(child, st.fieldIndex("x"), Some("x")), DoubleType),
          Cast(GetStructField(child, st.fieldIndex("y"), Some("y")), DoubleType)),
        inputTypes = Seq(DoubleType, DoubleType), propagateNull = true)
    case _ =>
      StaticInvoke(GeometryExtras.getClass, StringType, "canonicalWktU",
        Seq(child), inputTypes = Seq(StringType), propagateNull = true)
  }

  override protected def withNewChildInternal(c: Expression): GeoAsTextExpr =
    copy(child = c)
}

/** `ST_X` / `ST_Y`: struct points read their field; WKT text validates
  * POINT and returns NULL for POINT EMPTY (GeoFunctions.java:834-858).
  */
case class GeoCoordExpr(child: Expression, isX: Boolean)
    extends Expression with RuntimeReplaceable with UnaryLike[Expression] {

  override def prettyName: String = if (isX) "st_x" else "st_y"

  override lazy val replacement: Expression = child.dataType match {
    case st: StructType =>
      val n = if (isX) "x" else "y"
      GetStructField(child, st.fieldIndex(n), Some(n))
    case _ =>
      StaticInvoke(GeometryExtras.getClass, DoubleType, "pointCoordWktU",
        Seq(child, Literal(isX)), inputTypes = Seq(StringType, BooleanType),
        propagateNull = true)
  }

  override protected def withNewChildInternal(c: Expression): GeoCoordExpr =
    copy(child = c)
}

/** `ST_MultiPoint(array[..])` / `ST_LineString(array[..])` over either
  * representation — elements may be struct points or WKT point text.
  * Reference readPointCoordinates semantics live in
  * GeometryExtras.stMultiPoint/stLineStringFromPoints (indexed errors
  * for null/non-point elements, LINESTRING duplicate rejection, empty
  * array → NULL / LINESTRING EMPTY). Per-row ctor over small arrays —
  * CodegenFallback is the house cost.
  */
case class GeoPointsCtor(child: Expression, line: Boolean)
    extends UnaryExpression with CodegenFallback {

  override def prettyName: String = if (line) "st_linestring" else "st_multipoint"
  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(_: StructType | _: StringType | NullType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects an array of points, got ${other.catalogString}")
    }

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val et = child.dataType.asInstanceOf[ArrayType].elementType
    val wkts = new Array[String](arr.numElements())
    var i = 0
    while (i < arr.numElements()) {
      wkts(i) =
        if (arr.isNullAt(i)) null
        else et match {
          case st: StructType =>
            val row = arr.getStruct(i, st.length)
            val xi = st.fieldIndex("x"); val yi = st.fieldIndex("y")
            GeometryFns.pointWkt(row.getDouble(xi), row.getDouble(yi))
          case _ => arr.getUTF8String(i).toString
        }
      i += 1
    }
    val out =
      if (line) GeometryExtras.stLineStringFromPoints(wkts)
      else GeometryExtras.stMultiPoint(wkts)
    if (out == null) null else UTF8String.fromString(out)
  }

  override protected def withNewChildInternal(c: Expression): GeoPointsCtor =
    copy(child = c)
}
