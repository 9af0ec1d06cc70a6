// Bridge-package rule: matching ScalaUDF.inputTypes exposes the
// private[sql] AbstractDataType (see RegexpLambda's note).
package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** Struct points flow into WKT-typed geometry functions (KAT wave 9):
  * `ST_Point(x, y)` is a codegen'd `struct<x, y>` (the distance-join
  * hot path), but the general geometry layer takes canonical WKT text —
  * the reference's test corpus composes them freely
  * (`ST_Buffer(ST_Point(0, 0), 0.5)`,
  * `line_locate_point(.., ST_Point(..))`,
  * `ST_GeometryType(ST_Point(1, 4))`). This rule adapts any struct
  * point argument of a string-expecting `st_*`/geometry Scala UDF into
  * its `POINT (x y)` rendering, so every WKT function accepts both
  * representations without per-function dispatch code.
  */
object GeoUdfArgsRule extends Rule[LogicalPlan] {

  private val extraGeoFns = Set(
    "expand_envelope", "simplify_geometry", "line_locate_point",
    "line_interpolate_point", "geometry_to_bing_tiles",
    "to_spherical_geography", "geometry_invalid_reason")

  private def isGeoFn(name: String): Boolean =
    name.startsWith("st_") || extraGeoFns.contains(name)

  private def isPointStruct(t: DataType): Boolean = t match {
    case st: StructType =>
      st.length == 2 && st.fieldNames.contains("x") && st.fieldNames.contains("y")
    case _ => false
  }

  private def toWkt(e: Expression): Expression = {
    val st = e.dataType.asInstanceOf[StructType]
    StaticInvoke(
      graft.functions.GeometryFns.getClass, StringType, "pointWktU",
      Seq(Cast(GetStructField(e, st.fieldIndex("x"), Some("x")), DoubleType),
        Cast(GetStructField(e, st.fieldIndex("y"), Some("y")), DoubleType)),
      inputTypes = Seq(DoubleType, DoubleType), propagateNull = true)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveExpressions {
    case u: ScalaUDF
        if u.udfName.exists(isGeoFn) &&
          u.children.zipWithIndex.exists { case (c, i) =>
            c.resolved && isPointStruct(c.dataType) &&
              u.inputTypes.lift(i).contains(StringType)
          } =>
      u.copy(children = u.children.zipWithIndex.map { case (c, i) =>
        if (c.resolved && isPointStruct(c.dataType) &&
            u.inputTypes.lift(i).contains(StringType)) toWkt(c)
        else c
      })
  }
}
