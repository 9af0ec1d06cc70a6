package graft.functions

import graft.functions.GeometryFns.{GPoint, Polygon}

/** The remainder of the reference's geospatial scalar registry
  * (presto-geospatial GeoFunctions.java) over the WKT-string geometry
  * representation: accessors (rings, points, sub-geometries), type
  * metadata, validity, constructors (multipoint, linestring from points,
  * convex hull), DE-9IM-style predicates on the declared subset, general
  * geometry-to-geometry distance, envelope utilities, linear
  * referencing (line_interpolate_point / line_locate_point), n-ary
  * geometry_union, and WKB encode/decode (ST_AsBinary /
  * ST_GeomFromBinary). Everything is per-row pure arithmetic — the scale
  * story stays the bucketed spatial joins, these are the scalar kernels.
  */
object GeometryExtras {

  // ── parsed-geometry sum type over the full OGC WKT surface ──────────
  sealed trait Geo
  final case class PGeo(p: GPoint) extends Geo
  final case class MPGeo(pts: Seq[GPoint]) extends Geo
  final case class LGeo(pts: Array[GPoint]) extends Geo
  final case class MLGeo(lines: Seq[Array[GPoint]]) extends Geo
  /** comps empty = POLYGON EMPTY; 1 = POLYGON; >1 = MULTIPOLYGON. */
  final case class PolyGeo(comps: Seq[Polygon]) extends Geo
  /** The EMPTY spelling of any type (kind = the WKT type word) — every
    * EMPTY form is its own value in the reference (ST_GeometryType
    * keeps the type, ST_Dimension keeps the type's dimension); POLYGON/
    * MULTIPOLYGON EMPTY keep PolyGeo(Seq.empty) where the overlay
    * machinery already produces and consumes it (KAT wave 9).
    */
  final case class EmptyGeo(kind: String) extends Geo
  /** GEOMETRYCOLLECTION — heterogeneous members, possibly nested. */
  final case class CGeo(geoms: Seq[Geo]) extends Geo

  private def fail(msg: String): Nothing = throw new IllegalArgumentException(msg)

  def parseGeo(wkt: String): Geo = {
    val up = wkt.trim.toUpperCase
    if (up == "POLYGON EMPTY" || up == "MULTIPOLYGON EMPTY") PolyGeo(Seq.empty)
    else if (up.endsWith("EMPTY") &&
        Set("POINT", "LINESTRING", "MULTIPOINT", "MULTILINESTRING",
          "GEOMETRYCOLLECTION").contains(up.dropRight(5).trim))
      EmptyGeo(up.dropRight(5).trim)
    else if (up.startsWith("GEOMETRYCOLLECTION")) CGeo(parseCollection(wkt))
    else if (up.startsWith("MULTIPOLYGON"))
      PolyGeo(GeometryFns.multiPolygonParts(wkt).map(GeometryFns.parsePolygon))
    else if (up.startsWith("POLYGON")) PolyGeo(Seq(GeometryFns.parsePolygon(wkt)))
    else if (up.startsWith("MULTIPOINT")) MPGeo(parseMultiPoint(wkt))
    else if (up.startsWith("MULTILINESTRING")) MLGeo(parseMultiLine(wkt))
    else if (up.startsWith("LINESTRING")) LGeo(GeometryFns.parseLineString(wkt))
    else if (up.startsWith("POINT")) PGeo(GeometryFns.parsePoint(wkt))
    else fail(s"Unsupported WKT geometry: $wkt")
  }

  /** GEOMETRYCOLLECTION (g1, g2, …) — members split at depth-0 commas
    * and parsed recursively.
    */
  private def parseCollection(wkt: String): Seq[Geo] = {
    val body = wkt.trim.drop("GEOMETRYCOLLECTION".length).trim
    if (!body.startsWith("(") || !body.endsWith(")"))
      fail(s"Invalid GEOMETRYCOLLECTION: $wkt")
    val inner = body.drop(1).dropRight(1)
    val parts = scala.collection.mutable.ArrayBuffer.empty[String]
    var depth = 0; var start = 0; var k = 0
    while (k < inner.length) {
      inner(k) match {
        case '(' => depth += 1
        case ')' => depth -= 1
        case ',' if depth == 0 => parts += inner.substring(start, k); start = k + 1
        case _ =>
      }
      k += 1
    }
    parts += inner.substring(start)
    val members = parts.toSeq.map(_.trim).filter(_.nonEmpty)
    if (members.isEmpty) fail(s"Invalid GEOMETRYCOLLECTION: $wkt")
    members.map(parseGeo)
  }

  private def parseMultiLine(wkt: String): Seq[Array[GPoint]] = {
    val body = wkt.trim.drop("MULTILINESTRING".length).trim
    if (!body.startsWith("(") || !body.endsWith(")")) fail(s"Invalid MULTILINESTRING: $wkt")
    val inner = body.drop(1).dropRight(1)
    val parts = scala.collection.mutable.ArrayBuffer.empty[String]
    var depth = 0; var start = -1; var k = 0
    while (k < inner.length) {
      inner(k) match {
        case '(' => if (depth == 0) start = k; depth += 1
        case ')' =>
          depth -= 1
          if (depth == 0) { parts += inner.substring(start, k + 1); start = -1 }
        case _ =>
      }
      k += 1
    }
    if (parts.isEmpty) fail(s"Invalid MULTILINESTRING: $wkt")
    parts.toSeq.map(p => GeometryFns.parseLineString("LINESTRING " + p))
  }

  /** Accepts both MULTIPOINT (1 2, 3 4) and MULTIPOINT ((1 2), (3 4)). */
  private def parseMultiPoint(wkt: String): Seq[GPoint] = {
    val body = wkt.trim.drop("MULTIPOINT".length).trim
    if (!body.startsWith("(") || !body.endsWith(")")) fail(s"Invalid MULTIPOINT: $wkt")
    val inner = body.drop(1).dropRight(1).trim
    if (inner.isEmpty) fail(s"Invalid MULTIPOINT: $wkt")
    inner.split(",").toSeq.map { part =>
      val nums = part.trim.stripPrefix("(").stripSuffix(")").trim.split("\\s+")
      if (nums.length != 2) fail(s"Invalid MULTIPOINT coordinate: '$part'")
      try GPoint(nums(0).toDouble, nums(1).toDouble)
      catch { case _: NumberFormatException => fail(s"Invalid MULTIPOINT coordinate: '$part'") }
    }
  }

  private def fmt(d: Double): String =
    if (d == d.floor && !d.isInfinite && math.abs(d) < 1e15) d.toLong.toString
    else d.toString

  /** Reference canonical form parenthesizes each member point
    * (TestGeoFunctions testSTGeometries: `MULTIPOINT ((0 0), (1 1))`).
    */
  def multiPointWkt(pts: Seq[GPoint]): String =
    "MULTIPOINT (" + pts.map(p => s"(${fmt(p.x)} ${fmt(p.y)})").mkString(", ") + ")"

  def multiLineWkt(lines: Seq[Array[GPoint]]): String =
    "MULTILINESTRING (" + lines.map(l =>
      "(" + l.map(p => s"${fmt(p.x)} ${fmt(p.y)}").mkString(", ") + ")")
      .mkString(", ") + ")"

  def formatGeo(g: Geo): String = g match {
    case PGeo(p)        => GeometryFns.pointWkt(p.x, p.y)
    case MPGeo(pts)     => if (pts.isEmpty) "MULTIPOINT EMPTY" else multiPointWkt(pts)
    case LGeo(pts)      =>
      if (pts.isEmpty) "LINESTRING EMPTY" else GeometryFns.lineStringWkt(pts)
    case MLGeo(lines)   =>
      if (lines.isEmpty) "MULTILINESTRING EMPTY" else multiLineWkt(lines)
    case PolyGeo(cs)    =>
      if (cs.isEmpty) "POLYGON EMPTY"
      else if (cs.length == 1) GeometryFns.polygonWkt(cs.head)
      else GeometryFns.multiPolygonWkt(cs)
    case EmptyGeo(kind) => s"$kind EMPTY"
    case CGeo(gs)       =>
      if (gs.isEmpty) "GEOMETRYCOLLECTION EMPTY"
      else "GEOMETRYCOLLECTION (" + gs.map(formatGeo).mkString(", ") + ")"
  }

  /** Canonicalizing parse-and-print over the full WKT surface — the
    * front door for ST_GeometryFromText / ST_AsText / to_geometry.
    */
  def canonicalWkt(wkt: String): String = {
    val g = parseGeo(wkt)
    g match {
      // parseGeo folds both empty areal spellings into PolyGeo(∅) for
      // the set-op arms; the TEXT surface keeps the input's kind
      // (testSTIntersection:800 pins 'MULTIPOLYGON EMPTY'; KAT r15)
      case PolyGeo(cs)
          if cs.isEmpty && wkt.trim.toUpperCase.startsWith("MULTIPOLYGON") =>
        "MULTIPOLYGON EMPTY"
      case _ => formatGeo(g)
    }
  }

  // ── type metadata ───────────────────────────────────────────────────

  def stGeometryType(wkt: String): String = parseGeo(wkt) match {
    case _: PGeo                       => "ST_Point"
    case _: MPGeo                      => "ST_MultiPoint"
    case _: LGeo                       => "ST_LineString"
    case _: MLGeo                      => "ST_MultiLineString"
    case PolyGeo(cs) if cs.length <= 1 => "ST_Polygon"
    case _: PolyGeo                    => "ST_MultiPolygon"
    case _: CGeo                       => "ST_GeomCollection"
    case EmptyGeo(kind) => kind match {
      case "POINT"              => "ST_Point"
      case "LINESTRING"         => "ST_LineString"
      case "MULTIPOINT"         => "ST_MultiPoint"
      case "MULTILINESTRING"    => "ST_MultiLineString"
      case _                    => "ST_GeomCollection"
    }
  }

  def stDimension(wkt: String): Int = dimOf(parseGeo(wkt))

  /** All supported geometries are planar xy. */
  def stCoordDim(wkt: String): Int = { parseGeo(wkt); 2 }

  def stIsEmpty(wkt: String): Boolean = isEmptyGeo(parseGeo(wkt))

  private def isEmptyGeo(g: Geo): Boolean = g match {
    case PolyGeo(cs) => cs.isEmpty
    case _: EmptyGeo => true
    case MPGeo(ps)   => ps.isEmpty
    case LGeo(pts)   => pts.isEmpty
    case MLGeo(ls)   => ls.isEmpty
    case CGeo(gs)    => gs.forall(isEmptyGeo)
    case _           => false
  }

  def stIsClosed(wkt: String): Boolean = parseGeo(wkt) match {
    case LGeo(pts)   => pts.head == pts.last
    case MLGeo(lines) => lines.forall(l => l.head == l.last)
    case EmptyGeo("LINESTRING") | EmptyGeo("MULTILINESTRING") => false
    case _ => fail("ST_IsClosed supports LINESTRING geometries")
  }

  def stIsRing(wkt: String): Boolean = parseGeo(wkt) match {
    case LGeo(pts) => pts.head == pts.last && lineIsSimple(pts)
    case EmptyGeo("LINESTRING") => false
    case _ => fail("ST_IsRing supports LINESTRING geometries")
  }

  private def segProperCross(a: GPoint, b: GPoint, c: GPoint, d: GPoint): Boolean = {
    def orient(p: GPoint, q: GPoint, r: GPoint) =
      (q.x - p.x) * (r.y - p.y) - (q.y - p.y) * (r.x - p.x)
    val d1 = orient(c, d, a); val d2 = orient(c, d, b)
    val d3 = orient(a, b, c); val d4 = orient(a, b, d)
    (d1 > 0) != (d2 > 0) && (d3 > 0) != (d4 > 0) &&
      d1 != 0 && d2 != 0 && d3 != 0 && d4 != 0
  }

  /** No two non-adjacent segments intersect; adjacent ones only share
    * their common vertex (a closed first==last pair is adjacent).
    */
  private def lineIsSimple(pts: Array[GPoint]): Boolean = {
    val n = pts.length - 1 // segments
    val closed = pts.head == pts.last
    (0 until n).forall { i =>
      (i + 1 until n).forall { j =>
        val adjacent = j == i + 1 || (closed && i == 0 && j == n - 1)
        if (adjacent) !segProperCross(pts(i), pts(i + 1), pts(j), pts(j + 1))
        else !GeometryFns.segIntersects(pts(i), pts(i + 1), pts(j), pts(j + 1))
      }
    }
  }

  def stIsSimple(wkt: String): Boolean = parseGeo(wkt) match {
    case _: PGeo    => true
    case MPGeo(ps)  => ps.distinct.length == ps.length
    case LGeo(pts)  => lineIsSimple(pts)
    case MLGeo(ls)  => ls.forall(lineIsSimple)
    case _: PolyGeo => geometryInvalidReason(wkt) == null
    case _: EmptyGeo => true // an empty geometry has no anomalous points
    case CGeo(gs)   => gs.forall(g => stIsSimple(formatGeo(g)))
  }

  /** null when valid; otherwise a human-readable reason (reference
    * geometry_invalid_reason). Checks: simple rings, holes inside the
    * shell, rings not crossing each other.
    */
  def geometryInvalidReason(wkt: String): String = parseGeo(wkt) match {
    case PolyGeo(cs) =>
      cs.iterator.flatMap { poly =>
        val shell = poly.rings.head
        val ringIssue = poly.rings.iterator.zipWithIndex.collectFirst {
          case (r, i) if !lineIsSimple(r) =>
            if (i == 0) "shell ring is self-intersecting"
            else s"interior ring $i is self-intersecting"
        }
        val holeIssue = poly.rings.tail.iterator.zipWithIndex.collectFirst {
          case (h, i) if !h.dropRight(1).forall(p =>
              GeometryFns.containsPoint(Polygon(Seq(shell)), p.x, p.y) ||
                onRing(shell, p)) =>
            s"interior ring ${i + 1} lies outside the shell"
        }
        val crossIssue = poly.rings.indices.iterator.flatMap { i =>
          (i + 1 until poly.rings.length).iterator.collect {
            case j if ringsProperlyCross(poly.rings(i), poly.rings(j)) =>
              s"rings $i and $j cross"
          }
        }.toSeq.headOption
        ringIssue.orElse(holeIssue).orElse(crossIssue)
      }.toSeq.headOption.orNull
    case CGeo(gs) =>
      gs.iterator.map(g => geometryInvalidReason(formatGeo(g)))
        .find(_ != null).orNull
    case _ => null // points/multipoints/linestrings/empties are valid
  }

  def stIsValid(wkt: String): Boolean = geometryInvalidReason(wkt) == null

  private def onRing(ring: Array[GPoint], p: GPoint): Boolean =
    (0 until ring.length - 1).exists { i =>
      val a = ring(i); val b = ring(i + 1)
      math.abs((b.x - a.x) * (p.y - a.y) - (b.y - a.y) * (p.x - a.x)) < 1e-12 &&
        p.x >= math.min(a.x, b.x) - 1e-12 && p.x <= math.max(a.x, b.x) + 1e-12 &&
        p.y >= math.min(a.y, b.y) - 1e-12 && p.y <= math.max(a.y, b.y) + 1e-12
    }

  private def ringsProperlyCross(a: Array[GPoint], b: Array[GPoint]): Boolean =
    (0 until a.length - 1).exists(i =>
      (0 until b.length - 1).exists(j =>
        segProperCross(a(i), a(i + 1), b(j), b(j + 1))))

  // ── linestring / ring accessors ─────────────────────────────────────

  private def asLine(wkt: String, op: String): Array[GPoint] = parseGeo(wkt) match {
    case LGeo(pts) => pts
    case EmptyGeo("LINESTRING") => Array.empty
    case _ => fail(s"$op supports LINESTRING geometries")
  }

  def stStartPoint(wkt: String): String = {
    val pts = asLine(wkt, "ST_StartPoint")
    if (pts.isEmpty) null // reference: empty line → NULL (GeoFunctions.java:753)
    else GeometryFns.pointWkt(pts.head.x, pts.head.y)
  }

  def stEndPoint(wkt: String): String = {
    val pts = asLine(wkt, "ST_EndPoint")
    if (pts.isEmpty) null
    else GeometryFns.pointWkt(pts.last.x, pts.last.y)
  }

  /** 1-based; null out of range (reference semantics). */
  def stPointN(wkt: String, n: Int): String = {
    val pts = asLine(wkt, "ST_PointN")
    if (n < 1 || n > pts.length) null
    else GeometryFns.pointWkt(pts(n - 1).x, pts(n - 1).y)
  }

  /** Vertices as POINT array: line vertices in order; multipoint members;
    * polygon ring vertices (closing duplicate omitted).
    */
  def stPoints(wkt: String): Array[String] = {
    val g = parseGeo(wkt)
    if (isEmptyGeo(g)) null // reference: empty → NULL (GeoFunctions.java:795)
    else allVertices(g).map(p => GeometryFns.pointWkt(p.x, p.y)).toArray
  }

  /** None = POLYGON EMPTY (accessors return NULL — the reference's
    * @SqlNullable empty-input contract, GeoFunctions.java:538/947).
    */
  private def asSinglePolygon(wkt: String, op: String): Option[Polygon] =
    parseGeo(wkt) match {
      case PolyGeo(Seq(p)) => Some(p)
      case PolyGeo(Seq()) => None
      case _ => fail(s"$op supports POLYGON geometries")
    }

  def stExteriorRing(wkt: String): String =
    asSinglePolygon(wkt, "ST_ExteriorRing")
      .map(p => GeometryFns.lineStringWkt(p.rings.head)).orNull

  def stNumInteriorRing(wkt: String): java.lang.Integer =
    asSinglePolygon(wkt, "ST_NumInteriorRing")
      .map(p => java.lang.Integer.valueOf(p.rings.length - 1)).orNull

  /** 1-based; null out of range. */
  def stInteriorRingN(wkt: String, n: Int): String =
    asSinglePolygon(wkt, "ST_InteriorRingN").map(_.rings.tail) match {
      case None => null
      case Some(holes) =>
        if (n < 1 || n > holes.length) null
        else GeometryFns.lineStringWkt(holes(n - 1))
    }

  def stInteriorRings(wkt: String): Array[String] =
    asSinglePolygon(wkt, "ST_InteriorRings")
      .map(_.rings.tail.map(GeometryFns.lineStringWkt).toArray).orNull

  // ── sub-geometry accessors ──────────────────────────────────────────

  def stNumGeometries(wkt: String): Int = parseGeo(wkt) match {
    case PolyGeo(cs) => cs.length
    case MPGeo(ps)   => ps.length
    case MLGeo(ls)   => ls.length
    case CGeo(gs)    => gs.length
    case _: EmptyGeo => 0 // reference: empty → 0 (GeoFunctions.java:574)
    case _           => 1
  }

  /** 1-based; null out of range. Single geometries are their own only
    * component.
    */
  def stGeometryN(wkt: String, n: Int): String = parseGeo(wkt) match {
    case g if isEmptyGeo(g) => null // reference: empty → NULL for any index
    case PolyGeo(cs) =>
      if (n < 1 || n > cs.length) null else GeometryFns.polygonWkt(cs(n - 1))
    case MPGeo(ps) =>
      if (n < 1 || n > ps.length) null
      else GeometryFns.pointWkt(ps(n - 1).x, ps(n - 1).y)
    case MLGeo(ls) =>
      if (n < 1 || n > ls.length) null else GeometryFns.lineStringWkt(ls(n - 1))
    case CGeo(gs) =>
      if (n < 1 || n > gs.length) null else formatGeo(gs(n - 1))
    case g => if (n == 1) formatGeo(g) else null
  }

  def stGeometries(wkt: String): Array[String] = parseGeo(wkt) match {
    case g if isEmptyGeo(g) => null // reference: null for empty input
    case PolyGeo(cs) => cs.map(GeometryFns.polygonWkt).toArray
    case MPGeo(ps)   => ps.map(p => GeometryFns.pointWkt(p.x, p.y)).toArray
    case MLGeo(ls)   => ls.map(GeometryFns.lineStringWkt).toArray
    case CGeo(gs)    => gs.map(formatGeo).toArray
    case g           => Array(formatGeo(g))
  }

  // ── constructors ────────────────────────────────────────────────────

  /** Reference readPointCoordinates contract (GeoFunctions.java:182-218):
    * null elements and non-point elements error with the indexed
    * message; ST_LineString additionally rejects consecutive duplicates
    * and collapses < 2 points to LINESTRING EMPTY; ST_MultiPoint of an
    * empty array is NULL.
    */
  private def readPoints(points: Array[String], fn: String,
      forbidDuplicates: Boolean): Seq[GPoint] = {
    var last: GPoint = null
    points.toSeq.zipWithIndex.map { case (w, i) =>
      if (w == null)
        fail(s"Invalid input to $fn: null at index ${i + 1}")
      val g = try parseGeo(w) catch {
        case _: IllegalArgumentException =>
          fail(s"Invalid input to $fn: geometry is not a point at index ${i + 1}")
      }
      val p = g match {
        case PGeo(p) => p
        case EmptyGeo("POINT") =>
          fail(s"Invalid input to $fn: empty point at index ${i + 1}")
        case other =>
          fail(s"Invalid input to $fn: geometry is not a point: " +
            s"${stGeometryType(formatGeo(other)).stripPrefix("ST_").toUpperCase} " +
            s"at index ${i + 1}")
      }
      if (forbidDuplicates && p == last)
        fail(s"Invalid input to $fn: consecutive duplicate points at index ${i + 1}")
      last = p
      p
    }
  }

  def stMultiPoint(points: Array[String]): String = {
    if (points == null) return null
    val pts = readPoints(points, "ST_MultiPoint", forbidDuplicates = false)
    if (pts.isEmpty) null else multiPointWkt(pts)
  }

  def stLineStringFromPoints(points: Array[String]): String = {
    if (points == null) return null
    val pts = readPoints(points, "ST_LineString", forbidDuplicates = true)
    if (pts.length < 2) "LINESTRING EMPTY"
    else GeometryFns.lineStringWkt(pts.toArray)
  }

  def canonicalWktU(w: org.apache.spark.unsafe.types.UTF8String)
      : org.apache.spark.unsafe.types.UTF8String =
    org.apache.spark.unsafe.types.UTF8String.fromString(canonicalWkt(w.toString))

  /** ST_Length: LINESTRING/MULTILINESTRING only, empties → 0
    * (GeoFunctions.java:428-436).
    */
  def stLength(wkt: String): Double = {
    def one(pts: Array[GPoint]): Double = {
      var s = 0.0
      var i = 0
      while (i < pts.length - 1) {
        s += math.hypot(pts(i + 1).x - pts(i).x, pts(i + 1).y - pts(i).y)
        i += 1
      }
      s
    }
    parseGeo(wkt) match {
      case LGeo(pts) => one(pts)
      case MLGeo(ls) => ls.map(one).sum
      case EmptyGeo("LINESTRING") | EmptyGeo("MULTILINESTRING") => 0.0
      case _ => fail("ST_Length supports LINESTRING geometries")
    }
  }

  /** ST_X / ST_Y over WKT: POINT only, empty point → NULL
    * (GeoFunctions.java:834-858).
    */
  def pointCoordWkt(wkt: String, isX: Boolean): java.lang.Double =
    parseGeo(wkt) match {
      case PGeo(p) => java.lang.Double.valueOf(if (isX) p.x else p.y)
      case EmptyGeo("POINT") => null
      case _ => fail(s"${if (isX) "ST_X" else "ST_Y"} supports POINT geometries")
    }

  def pointCoordWktU(w: org.apache.spark.unsafe.types.UTF8String,
      isX: Boolean): java.lang.Double = pointCoordWkt(w.toString, isX)

  /** ST_LineFromText / ST_Polygon: parse + validate the declared type
    * (GeoFunctions.java:139/221 validateType) — EMPTY spellings pass.
    */
  def lineFromText(wkt: String): String = parseGeo(wkt) match {
    case g @ (_: LGeo | EmptyGeo("LINESTRING")) => formatGeo(g)
    case g => fail("ST_LineFromText only applies to LINE_STRING. " +
      s"Input type is: ${stGeometryType(formatGeo(g)).stripPrefix("ST_")}")
  }

  def polygonFromText(wkt: String): String = parseGeo(wkt) match {
    case g @ PolyGeo(cs) if cs.length <= 1 => formatGeo(g)
    case g => fail("ST_Polygon only applies to POLYGON. " +
      s"Input type is: ${stGeometryType(formatGeo(g)).stripPrefix("ST_")}")
  }

  /** Andrew's monotone-chain convex hull over every vertex of the input;
    * degenerate hulls collapse honestly (1 point → POINT, collinear →
    * LINESTRING of the two extremes).
    */
  def convexHullOf(pts: Seq[GPoint]): String = {
    val s = pts.distinct.sortBy(p => (p.x, p.y))
    if (s.isEmpty) fail("convex hull of an empty geometry")
    if (s.length == 1) return GeometryFns.pointWkt(s.head.x, s.head.y)
    def cross(o: GPoint, a: GPoint, b: GPoint) =
      (a.x - o.x) * (b.y - o.y) - (a.y - o.y) * (b.x - o.x)
    def half(in: Seq[GPoint]): List[GPoint] =
      in.foldLeft(List.empty[GPoint]) { (acc, p) =>
        var h = acc
        while (h.length >= 2 && cross(h.tail.head, h.head, p) <= 0) h = h.tail
        p :: h
      }
    val lower = half(s).reverse
    val upper = half(s.reverse).reverse
    val hull = (lower.dropRight(1) ++ upper.dropRight(1)).toArray
    if (hull.length == 2)
      GeometryFns.lineStringWkt(hull)
    else
      GeometryFns.polygonWkt(Polygon(Seq(hull :+ hull.head)))
  }

  def stConvexHull(wkt: String): String = {
    val g = parseGeo(wkt)
    // reference: an empty input is returned unchanged (testSTConvexHull:
    // "MULTIPOINT EMPTY" → "MULTIPOINT EMPTY"); empty members of a
    // collection contribute no vertices
    if (isEmptyGeo(g)) return formatGeo(g)
    convexHullOf(allVertices(g))
  }

  private def allVertices(g: Geo): Seq[GPoint] = g match {
    case PGeo(p)     => Seq(p)
    case MPGeo(ps)   => ps
    case LGeo(pts)   => pts.toSeq
    case MLGeo(ls)   => ls.flatMap(_.toSeq)
    case PolyGeo(cs) => cs.flatMap(_.rings.flatMap(_.dropRight(1)))
    case _: EmptyGeo => Seq.empty
    case CGeo(gs)    => gs.flatMap(allVertices)
  }

  // ── predicates on the declared subset ───────────────────────────────

  private val ArealTol = 1e-9

  private def arealPair(wkt: String): Option[Seq[Polygon]] = parseGeo(wkt) match {
    case PolyGeo(cs) => Some(cs)
    case _           => None
  }

  /** Geometric equality: areal inputs compare by empty symmetric
    * difference; points by coordinates; multipoints by member sets;
    * lines by the vertex sequence forward or reversed (a documented
    * approximation — equal-as-point-sets lines with different vertex
    * decompositions compare false).
    */
  def stEquals(wktA: String, wktB: String): Boolean =
    (parseGeo(wktA), parseGeo(wktB)) match {
      case (PGeo(a), PGeo(b))     => a == b
      case (MPGeo(a), MPGeo(b))   => a.toSet == b.toSet
      case (LGeo(a), LGeo(b))     => a.sameElements(b) || a.reverse.sameElements(b)
      case (PolyGeo(a), PolyGeo(b)) =>
        if (a.isEmpty || b.isEmpty) a.isEmpty && b.isEmpty
        else
          PolygonOverlay.totalArea(
            PolygonOverlay.overlay(a, b, PolygonOverlay.OpDifference)).abs < ArealTol &&
          PolygonOverlay.totalArea(
            PolygonOverlay.overlay(b, a, PolygonOverlay.OpDifference)).abs < ArealTol
      case _ => false
    }

  def stDisjoint(wktA: String, wktB: String): Boolean =
    !GeometryFns.stIntersects(wktA, wktB)

  /** Touches on the declared subset: areal↔areal (boundary contact with
    * no interior overlap) and point↔areal (point on the boundary).
    */
  def stTouches(wktA: String, wktB: String): Boolean = {
    def pointVsAreal(p: GPoint, polyWkt: String): Boolean = {
      val cs = arealPair(polyWkt).get
      cs.exists(_.rings.exists(onRing(_, p)))
    }
    (parseGeo(wktA), parseGeo(wktB)) match {
      case (PGeo(p), _: PolyGeo) => pointVsAreal(p, wktB)
      case (_: PolyGeo, PGeo(p)) => pointVsAreal(p, wktA)
      case (PolyGeo(a), PolyGeo(b)) =>
        a.nonEmpty && b.nonEmpty &&
          GeometryFns.stIntersects(wktA, wktB) &&
          PolygonOverlay.totalArea(
            PolygonOverlay.overlay(a, b, PolygonOverlay.OpIntersection)) < ArealTol
      case _ => fail("ST_Touches supports point↔polygon and polygon↔polygon " +
        "(declared subset)")
    }
  }

  /** Crosses on the declared subset: line↔line (a proper interior
    * crossing) and line↔areal (the line has vertices strictly inside and
    * strictly outside). Areal↔areal and point inputs are false by
    * DE-9IM definition.
    */
  def stCrosses(wktA: String, wktB: String): Boolean = {
    def lineVsAreal(pts: Array[GPoint], cs: Seq[Polygon]): Boolean = {
      def inside(p: GPoint) =
        cs.count(c => GeometryFns.containsPoint(c, p.x, p.y)) % 2 == 1 &&
          !cs.exists(_.rings.exists(onRing(_, p)))
      def outside(p: GPoint) =
        cs.count(c => GeometryFns.containsPoint(c, p.x, p.y)) % 2 == 0 &&
          !cs.exists(_.rings.exists(onRing(_, p)))
      // split every line segment at its boundary intersections, then
      // classify SUB-segment midpoints — each sub-segment is entirely
      // inside, outside, or on the boundary, so the sample is exact
      val edges = cs.flatMap(_.rings.flatMap(r =>
        (0 until r.length - 1).map(i => (r(i), r(i + 1)))))
      def orient(p: GPoint, q: GPoint, r: GPoint) =
        (q.x - p.x) * (r.y - p.y) - (q.y - p.y) * (r.x - p.x)
      val sample = pts.toSeq.zip(pts.tail.toSeq).flatMap { case (a, b) =>
        val dx = b.x - a.x; val dy = b.y - a.y
        val len2 = dx * dx + dy * dy
        if (len2 == 0) Seq.empty
        else {
          val ts = scala.collection.mutable.ArrayBuffer(0.0, 1.0)
          edges.foreach { case (q1, q2) =>
            if (GeometryFns.segIntersects(a, b, q1, q2)) {
              val collinear = orient(a, b, q1) == 0 && orient(a, b, q2) == 0
              if (collinear) {
                ts += ((q1.x - a.x) * dx + (q1.y - a.y) * dy) / len2
                ts += ((q2.x - a.x) * dx + (q2.y - a.y) * dy) / len2
              } else {
                val den = dx * (q2.y - q1.y) - dy * (q2.x - q1.x)
                if (den != 0)
                  ts += ((q1.x - a.x) * (q2.y - q1.y) - (q1.y - a.y) * (q2.x - q1.x)) / den
              }
            }
          }
          val cuts = ts.filter(t => t >= 0 && t <= 1).sorted.distinct
          cuts.zip(cuts.tail).collect { case (t0, t1) if t1 - t0 > 1e-12 =>
            GPoint(a.x + (t0 + t1) / 2 * dx, a.y + (t0 + t1) / 2 * dy)
          }
        }
      }
      sample.exists(inside) && sample.exists(outside)
    }
    (parseGeo(wktA), parseGeo(wktB)) match {
      case (LGeo(a), LGeo(b)) =>
        (0 until a.length - 1).exists(i =>
          (0 until b.length - 1).exists(j =>
            segProperCross(a(i), a(i + 1), b(j), b(j + 1))))
      case (LGeo(l), PolyGeo(cs)) => lineVsAreal(l, cs)
      case (PolyGeo(cs), LGeo(l)) => lineVsAreal(l, cs)
      case (_: PolyGeo, _: PolyGeo) => false
      case (_: PGeo, _) | (_, _: PGeo) => false
      case _ => fail("ST_Crosses supports line↔line and line↔polygon " +
        "(declared subset)")
    }
  }

  /** Overlaps: same-dimension interiors intersect without either
    * containing the other. Areal↔areal computed exactly via the overlay;
    * different dimensions are false by definition; multipoint↔multipoint
    * by member sets.
    */
  def stOverlaps(wktA: String, wktB: String): Boolean =
    (parseGeo(wktA), parseGeo(wktB)) match {
      case (PolyGeo(a), PolyGeo(b)) =>
        a.nonEmpty && b.nonEmpty && {
          val inter = PolygonOverlay.totalArea(
            PolygonOverlay.overlay(a, b, PolygonOverlay.OpIntersection))
          val dAB = PolygonOverlay.totalArea(
            PolygonOverlay.overlay(a, b, PolygonOverlay.OpDifference))
          val dBA = PolygonOverlay.totalArea(
            PolygonOverlay.overlay(b, a, PolygonOverlay.OpDifference))
          inter > ArealTol && dAB > ArealTol && dBA > ArealTol
        }
      case (MPGeo(a), MPGeo(b)) =>
        val (sa, sb) = (a.toSet, b.toSet)
        (sa intersect sb).nonEmpty && (sa diff sb).nonEmpty && (sb diff sa).nonEmpty
      case (ga, gb) if dimOf(ga) != dimOf(gb) => false
      case (_: PGeo, _: PGeo) => false
      case _ => fail("ST_Overlaps supports polygon↔polygon and " +
        "multipoint↔multipoint (declared subset)")
    }

  private def dimOf(g: Geo): Int = g match {
    case _: PGeo | _: MPGeo => 0
    case _: LGeo | _: MLGeo => 1
    case _: PolyGeo         => 2
    // empties keep their type's inherent dimension (testSTDimension:
    // POLYGON EMPTY → 2, LINESTRING EMPTY → 1)
    case EmptyGeo(kind) => kind match {
      case "LINESTRING" | "MULTILINESTRING" => 1
      case "POINT" | "MULTIPOINT" | "GEOMETRYCOLLECTION" => 0
      case _ => 2
    }
    case CGeo(gs) => if (gs.isEmpty) 0 else gs.map(dimOf).max
  }

  /** DE-9IM intersection matrix (reference ST_Relate over the Esri
    * engine) for the declared subset: areal↔areal and point↔areal.
    * Row-major [II, IB, IE, BI, BB, BE, EI, EB, EE] with values
    * F/0/1/2. Areal entries derive exactly from the overlay: interiors
    * intersect iff |A∩B| > 0; a boundary meets the other's interior iff
    * its inside-classified fragment length is positive; boundaries meet
    * in dimension 1 iff they share collinear length, else in dimension 0
    * iff they intersect at all.
    */
  def de9im(wktA: String, wktB: String): String =
    (parseGeo(wktA), parseGeo(wktB)) match {
      case (PGeo(p), _: PolyGeo) =>
        val cs = arealPair(wktB).get
        val onB = cs.exists(_.rings.exists(onRing(_, p)))
        val inB = !onB && containsAny(cs, p)
        val ii = if (inB) "0" else "F"
        val ib = if (onB) "0" else "F"
        val ie = if (!inB && !onB) "0" else "F"
        s"$ii$ib${ie}FFF212"
      case (_: PolyGeo, PGeo(_)) => transposeDe9im(de9im(wktB, wktA))
      case (PolyGeo(a), PolyGeo(b)) =>
        if (a.isEmpty || b.isEmpty)
          fail("ST_Relate requires non-empty geometries")
        val inter = PolygonOverlay.totalArea(
          PolygonOverlay.overlay(a, b, PolygonOverlay.OpIntersection))
        val dAB = PolygonOverlay.totalArea(
          PolygonOverlay.overlay(a, b, PolygonOverlay.OpDifference))
        val dBA = PolygonOverlay.totalArea(
          PolygonOverlay.overlay(b, a, PolygonOverlay.OpDifference))
        val ((aIn, aOn, aOut), (bIn, bOn, bOut)) =
          PolygonOverlay.boundaryClassification(a, b)
        val lenTol = ArealTol
        val bb =
          if (aOn > lenTol || bOn > lenTol) "1"
          else if (boundaryPointContact(a, b)) "0"
          else "F"
        Seq(
          if (inter > ArealTol) "2" else "F",
          if (bIn > lenTol) "1" else "F", // A-interior ∩ B-boundary (B's boundary inside A)
          if (dAB > ArealTol) "2" else "F",
          if (aIn > lenTol) "1" else "F",
          bb,
          if (aOut > lenTol) "1" else "F",
          if (dBA > ArealTol) "2" else "F",
          if (bOut > lenTol) "1" else "F",
          "2").mkString
      // ── non-areal rows (round 15, VERDICT ask #4): point↔point,
      // point↔line, line↔line over the r14 noded-arrangement machinery.
      // Line interiors follow the OGC mod-2 boundary rule (odd-degree
      // path endpoints are the boundary). line↔areal stays a loud error
      // (no declared surface needs the mixed-dimension rows).
      case (PGeo(p), PGeo(q)) =>
        if (samePt(p, q)) "0FFFFFFF2" else "FF0FFF0F2"
      case (PGeo(p), l @ (_: LGeo | _: MLGeo)) =>
        val bnd = lineBoundary(l)
        val onB = onLine(l, p)
        val isBnd = bnd.exists(samePt(_, p))
        val ii = if (onB && !isBnd) "0" else "F"
        val ib = if (isBnd) "0" else "F"
        val ie = if (!onB) "0" else "F"
        val eb = if (bnd.exists(q => !samePt(q, p))) "0" else "F"
        s"$ii$ib${ie}FFF1${eb}2"
      case (_: LGeo | _: MLGeo, PGeo(_)) => transposeDe9im(de9im(wktB, wktA))
      case (a @ (_: LGeo | _: MLGeo), b @ (_: LGeo | _: MLGeo)) =>
        val (aPieces, bPieces) = nodedArrangement(a, b)
        val bndA = lineBoundary(a)
        val bndB = lineBoundary(b)
        val sharedLen = aPieces.collect { case (s, true) => segLen(s) }.sum
        // 0-dim interior contact: a noded endpoint on both operands that
        // is neither operand's boundary
        val contactPts = aPieces.flatMap { case ((p1, p2), _) => Seq(p1, p2) }
          .filter(p => onLine(b, p))
        def interiorContact = contactPts.exists(p =>
          !bndA.exists(samePt(_, p)) && !bndB.exists(samePt(_, p)))
        val ii =
          if (sharedLen > ArealTol) "1"
          else if (interiorContact) "0"
          else "F"
        val ib = if (bndB.exists(q => onLine(a, q) && !bndA.exists(samePt(_, q)))) "0" else "F"
        val ie = if (aPieces.exists(!_._2)) "1" else "F"
        val bi = if (bndA.exists(p => onLine(b, p) && !bndB.exists(samePt(_, p)))) "0" else "F"
        val bb = if (bndA.exists(p => bndB.exists(samePt(_, p)))) "0" else "F"
        val be = if (bndA.exists(p => !onLine(b, p))) "0" else "F"
        val ei = if (bPieces.exists(!_._2)) "1" else "F"
        val eb = if (bndB.exists(q => !onLine(a, q))) "0" else "F"
        s"$ii$ib$ie$bi$bb$be$ei${eb}2"
      case _ => fail("ST_Relate supports point/line/polygon pairs of " +
        "matching or point-vs-higher dimension (declared subset); " +
        "line↔polygon masks are not implemented")
    }

  private def samePt(a: GPoint, b: GPoint): Boolean =
    math.abs(a.x - b.x) < 1e-9 && math.abs(a.y - b.y) < 1e-9

  /** OGC mod-2 boundary of a line/multiline: path endpoints that appear
    * an odd number of times (a closed ring has an empty boundary).
    */
  private def lineBoundary(g: Geo): Seq[GPoint] = {
    val ends = linePaths(g).filter(_.length >= 2).flatMap(p => Seq(p.head, p.last))
    ends.foldLeft(Vector.empty[GPoint]) { (acc, p) =>
      acc.indexWhere(samePt(_, p)) match {
        case -1 => acc :+ p
        case i => acc.patch(i, Nil, 1) // even count cancels out
      }
    }
  }

  private def onLine(g: Geo, p: GPoint): Boolean =
    linePaths(g).exists(path =>
      (0 until path.length - 1).exists(i => onSeg(path(i), path(i + 1), p)))

  private def segLen(s: (GPoint, GPoint)): Double =
    math.hypot(s._2.x - s._1.x, s._2.y - s._1.y)

  private def containsAny(cs: Seq[Polygon], p: GPoint): Boolean =
    cs.count(c => GeometryFns.containsPoint(c, p.x, p.y)) % 2 == 1

  private def transposeDe9im(m: String): String =
    Seq(0, 3, 6, 1, 4, 7, 2, 5, 8).map(m.charAt).mkString

  /** Do the two boundaries intersect at all (point contact included)? */
  private def boundaryPointContact(a: Seq[Polygon], b: Seq[Polygon]): Boolean = {
    val segsA = a.flatMap(_.rings.flatMap(r =>
      (0 until r.length - 1).map(i => (r(i), r(i + 1)))))
    val segsB = b.flatMap(_.rings.flatMap(r =>
      (0 until r.length - 1).map(i => (r(i), r(i + 1)))))
    segsA.exists { case (p1, p2) =>
      segsB.exists { case (q1, q2) => GeometryFns.segIntersects(p1, p2, q1, q2) }
    }
  }

  /** Reference ST_Relate(geomA, geomB, pattern): does the DE-9IM matrix
    * match the 9-char pattern (T = any non-F, * = anything, F/0/1/2
    * exact)?
    */
  def stRelate(wktA: String, wktB: String, pattern: String): Boolean = {
    if (pattern == null || pattern.length != 9)
      fail("ST_Relate pattern must be 9 characters of T, F, 0, 1, 2, *")
    val m = de9im(wktA, wktB)
    m.zip(pattern.toUpperCase).forall {
      case (_, '*') => true
      case (c, 'T') => c != 'F'
      case (c, p)   => c == p
    }
  }

  // ── general geometry distance ───────────────────────────────────────

  private def segPointDist(a: GPoint, b: GPoint, p: GPoint): Double = {
    val dx = b.x - a.x; val dy = b.y - a.y
    val len2 = dx * dx + dy * dy
    val t =
      if (len2 == 0) 0.0
      else math.max(0.0, math.min(1.0, ((p.x - a.x) * dx + (p.y - a.y) * dy) / len2))
    math.hypot(p.x - (a.x + t * dx), p.y - (a.y + t * dy))
  }

  private def segments(g: Geo): Seq[(GPoint, GPoint)] = g match {
    case PGeo(_) | MPGeo(_) | _: EmptyGeo => Seq.empty
    case MLGeo(ls) => ls.flatMap(l => l.toSeq.zip(l.tail.toSeq))
    case LGeo(pts) => pts.toSeq.zip(pts.tail.toSeq)
    case PolyGeo(cs) =>
      cs.flatMap(_.rings.flatMap(r => (0 until r.length - 1).map(i => (r(i), r(i + 1)))))
    case CGeo(gs) => gs.flatMap(segments)
  }

  /** Planar distance between any two supported geometries: 0 when they
    * intersect (boundary-inclusive, interiors included for areal
    * operands), otherwise the minimum vertex↔segment distance — exact
    * for non-intersecting polylines since the closest approach of two
    * disjoint segments is at an endpoint.
    */
  def distanceWkt(wktA: String, wktB: String): java.lang.Double = {
    val ga = parseGeo(wktA); val gb = parseGeo(wktB)
    // reference: a distance against any EMPTY geometry is NULL
    // (GeoFunctions.java:935 @SqlNullable; testSTDistance POINT EMPTY)
    if (isEmptyGeo(ga) || isEmptyGeo(gb)) return null
    // interior containment / crossing → 0 (component-wise: collections
    // and multis reduce to their parts)
    val arealA = arealParts(ga); val arealB = arealParts(gb)
    val zero =
      arealB.exists(p => allVertices(ga).exists(v => GeometryFns.containsPoint(p, v.x, v.y))) ||
      arealA.exists(p => allVertices(gb).exists(v => GeometryFns.containsPoint(p, v.x, v.y))) || {
        val sa = segments(ga); val sb = segments(gb)
        sa.exists { case (p1, p2) =>
          sb.exists { case (q1, q2) => GeometryFns.segIntersects(p1, p2, q1, q2) }
        }
      } || {
        val va = allVertices(ga).toSet; val vb = allVertices(gb).toSet
        (va intersect vb).nonEmpty
      }
    if (zero) return java.lang.Double.valueOf(0.0)
    val (ptsA, ptsB) = (allVertices(ga), allVertices(gb))
    val (segA, segB) = (segments(ga), segments(gb))
    val viaA = for (p <- ptsA.iterator; s <- segB.iterator)
      yield segPointDist(s._1, s._2, p)
    val viaB = for (p <- ptsB.iterator; s <- segA.iterator)
      yield segPointDist(s._1, s._2, p)
    val pp = for (p <- ptsA.iterator; q <- ptsB.iterator)
      yield math.hypot(p.x - q.x, p.y - q.y)
    java.lang.Double.valueOf((viaA ++ viaB ++ pp).min)
  }

  private[functions] def arealParts(g: Geo): Seq[Polygon] = g match {
    case PolyGeo(cs) => cs
    case CGeo(gs)    => gs.flatMap(arealParts)
    case _           => Seq.empty
  }

  def distanceWktU(a: org.apache.spark.unsafe.types.UTF8String,
      b: org.apache.spark.unsafe.types.UTF8String): java.lang.Double =
    distanceWkt(a.toString, b.toString)

  // ── envelope utilities ──────────────────────────────────────────────

  private def envelopeOf(wkt: String): Option[(GPoint, GPoint)] = {
    val vs = allVertices(parseGeo(wkt))
    if (vs.isEmpty) None
    else Some((GPoint(vs.map(_.x).min, vs.map(_.y).min),
      GPoint(vs.map(_.x).max, vs.map(_.y).max)))
  }

  def expandEnvelope(wkt: String, d: Double): String = {
    if (d.isNaN) fail("expand_envelope: distance is NaN")
    if (d < 0) fail(s"expand_envelope: distance $d is negative")
    // an infinite envelope collapses to POLYGON EMPTY in the reference
    // (TestGeoFunctions:748 — "a tricky concept", kept as-is)
    if (d.isInfinity) return "POLYGON EMPTY"
    envelopeOf(wkt) match {
      case None => "POLYGON EMPTY" // reference: GeoFunctions.java:916
      case Some((lo, hi)) =>
        // Esri envelope ring order: SW, NW, NE, SE (KAT value gate r15
        // — same convention as bing_tile_polygon)
        GeometryFns.polygonWkt(Polygon(Seq(Array(
          GPoint(lo.x - d, lo.y - d), GPoint(lo.x - d, hi.y + d),
          GPoint(hi.x + d, hi.y + d), GPoint(hi.x + d, lo.y - d),
          GPoint(lo.x - d, lo.y - d)))))
    }
  }

  /** Reference ST_EnvelopeAsPts: the two corner points; empty → NULL. */
  def stEnvelopeAsPts(wkt: String): Array[String] = envelopeOf(wkt) match {
    case None => null
    case Some((lo, hi)) =>
      Array(GeometryFns.pointWkt(lo.x, lo.y), GeometryFns.pointWkt(hi.x, hi.y))
  }

  /** ST_Envelope over any geometry; empty → POLYGON EMPTY
    * (GeoFunctions.java:869).
    */
  def stEnvelope(wkt: String): String = envelopeOf(wkt) match {
    case None => "POLYGON EMPTY"
    case Some((lo, hi)) =>
      GeometryFns.polygonWkt(Polygon(Seq(Array(
        lo, GPoint(lo.x, hi.y), hi, GPoint(hi.x, lo.y), lo))))
  }

  /** ST_XMin/YMin/XMax/YMax over any geometry; empty → NULL
    * (GeoFunctions.java:486-534).
    */
  def envelopeCoord(wkt: String, which: String): java.lang.Double = {
    // hot path: the spatial joins call this FOUR times per row over the
    // same WKT — the cached single-geometry parse (GeometryFns.bounds)
    // covers everything non-empty; empties keep the generic NULL arm
    // (round-15 polygon-join A/B: the generic parse here was ~0.9 s of
    // the bench query)
    val t = wkt.trim
    if (!(t.endsWith("EMPTY") || t.endsWith("empty")) &&
        !t.startsWith("GEOMETRYCOLLECTION") && !t.startsWith("geometrycollection")) {
      try {
        val (xmin, ymin, xmax, ymax) = GeometryFns.bounds(wkt)
        return java.lang.Double.valueOf(which match {
          case "xmin" => xmin
          case "ymin" => ymin
          case "xmax" => xmax
          case "ymax" => ymax
        })
      } catch { case _: IllegalArgumentException => /* generic arm */ }
    }
    envelopeOf(wkt) match {
      case None => null
      case Some((lo, hi)) => java.lang.Double.valueOf(which match {
        case "xmin" => lo.x
        case "ymin" => lo.y
        case "xmax" => hi.x
        case "ymax" => hi.y
      })
    }
  }

  // ── point-set operations (0-dimensional operand pairs — the areal
  //    overlay lives in GeometryFns/PolygonOverlay; these carry the
  //    POINT/MULTIPOINT pairs the reference corpus exercises,
  //    GeoFunctions stIntersection/stDifference/stSymmetricDifference) ──

  def isPointy(g: Geo): Boolean = g match {
    case _: PGeo | _: MPGeo => true
    case EmptyGeo("POINT") | EmptyGeo("MULTIPOINT") => true
    case CGeo(gs) => gs.nonEmpty && gs.forall(isPointy)
    case _ => false
  }

  private def ptsOf(g: Geo): Seq[GPoint] = g match {
    case PGeo(p)   => Seq(p)
    case MPGeo(ps) => ps
    case CGeo(gs)  => gs.flatMap(ptsOf)
    case _         => Seq.empty
  }

  /** Point-set results keep first-operand order; an empty result is the
    * reference's "MULTIPOLYGON EMPTY" quirk (testSTIntersection:800 —
    * Esri's empty intersection serializes as an empty multipolygon).
    */
  private def renderPointSet(pts: Seq[GPoint]): String = {
    val d = pts.distinct
    if (d.isEmpty) "MULTIPOLYGON EMPTY"
    else if (d.size == 1) GeometryFns.pointWkt(d.head.x, d.head.y)
    else multiPointWkt(d)
  }

  def pointIntersection(a: Geo, b: Geo): String = {
    val bs = ptsOf(b).toSet
    renderPointSet(ptsOf(a).filter(bs))
  }
  def pointDifference(a: Geo, b: Geo): String = {
    val bs = ptsOf(b).toSet
    renderPointSet(ptsOf(a).filterNot(bs))
  }
  def pointSymDifference(a: Geo, b: Geo): String = {
    val as = ptsOf(a).toSet; val bs = ptsOf(b).toSet
    renderPointSet(ptsOf(a).filterNot(bs) ++ ptsOf(b).filterNot(as))
  }
  def pointUnion(a: Geo, b: Geo): String =
    renderPointSet(ptsOf(a) ++ ptsOf(b))

  // ── line-arrangement set operations (1-dimensional operand pairs —
  //    TestGeoFunctions ST_Intersection/Difference/SymDifference over
  //    (MULTI)LINESTRINGs). The reference's Esri engine nodes BOTH
  //    operands' segments at every intersection event (inter- AND
  //    intra-operand — its symdifference splits a path where the other
  //    path of the SAME operand touches it) and emits the sub-segments
  //    sorted by start point (y, then x); shared collinear pieces decide
  //    membership. This reproduces that arrangement exactly on the test
  //    corpus (vectors 759-831 pinned in GeometryExtrasSpec). ─────────

  def isLiney(g: Geo): Boolean = g match {
    case _: LGeo | _: MLGeo => true
    case EmptyGeo("LINESTRING") | EmptyGeo("MULTILINESTRING") => true
    case _ => false
  }

  private def linePaths(g: Geo): Seq[Array[GPoint]] = g match {
    case LGeo(pts) => Seq(pts)
    case MLGeo(ls) => ls
    case _ => Seq.empty
  }

  /** Split one segment at the given parameters, dropping zero-length
    * pieces.
    */
  private def splitSeg(a: GPoint, b: GPoint, ts0: Seq[Double]): Seq[(GPoint, GPoint)] = {
    val ts = (0.0 +: 1.0 +: ts0.filter(t => t > 0 && t < 1)).distinct.sorted
    def at(t: Double) =
      if (t == 0.0) a else if (t == 1.0) b
      else GPoint(a.x + t * (b.x - a.x), a.y + t * (b.y - a.y))
    ts.zip(ts.tail).collect { case (t0, t1) if t1 - t0 > 1e-12 => (at(t0), at(t1)) }
  }

  /** Intersection parameters of segment (a,b) against (c,d): a crossing
    * contributes one t, collinear overlap its two projection ts.
    */
  private def segEventTs(a: GPoint, b: GPoint, c: GPoint, d: GPoint): Seq[Double] = {
    if (!GeometryFns.segIntersects(a, b, c, d)) return Seq.empty
    val dx = b.x - a.x; val dy = b.y - a.y
    val len2 = dx * dx + dy * dy
    if (len2 == 0) return Seq.empty
    def orient(p: GPoint, q: GPoint, r: GPoint) =
      (q.x - p.x) * (r.y - p.y) - (q.y - p.y) * (r.x - p.x)
    val collinear = orient(a, b, c) == 0 && orient(a, b, d) == 0
    if (collinear)
      Seq(((c.x - a.x) * dx + (c.y - a.y) * dy) / len2,
        ((d.x - a.x) * dx + (d.y - a.y) * dy) / len2)
    else {
      val den = dx * (d.y - c.y) - dy * (d.x - c.x)
      if (den == 0) Seq.empty
      else Seq(((c.x - a.x) * (d.y - c.y) - (c.y - a.y) * (d.x - c.x)) / den)
    }
  }

  /** Is point p strictly on segment (a,b) (inclusive of endpoints)? */
  private def onSeg(a: GPoint, b: GPoint, p: GPoint): Boolean = {
    val cross = (b.x - a.x) * (p.y - a.y) - (b.y - a.y) * (p.x - a.x)
    math.abs(cross) < 1e-9 &&
      p.x >= math.min(a.x, b.x) - 1e-12 && p.x <= math.max(a.x, b.x) + 1e-12 &&
      p.y >= math.min(a.y, b.y) - 1e-12 && p.y <= math.max(a.y, b.y) + 1e-12
  }

  private def mid(s: (GPoint, GPoint)): GPoint =
    GPoint((s._1.x + s._2.x) / 2, (s._1.y + s._2.y) / 2)

  /** Node every segment of both operands at every intersection event and
    * return (aPieces, bPieces, sharedFlagA, sharedFlagB): per-operand
    * sub-segments in path order, with a flag for "collinear-shared with
    * the other operand".
    */
  private def nodedArrangement(a: Geo, b: Geo)
      : (Seq[((GPoint, GPoint), Boolean)], Seq[((GPoint, GPoint), Boolean)]) = {
    val segsA = linePaths(a).flatMap(p => p.toSeq.zip(p.tail.toSeq))
    val segsB = linePaths(b).flatMap(p => p.toSeq.zip(p.tail.toSeq))
    val all = segsA ++ segsB
    def pieces(segs: Seq[(GPoint, GPoint)], other: Seq[(GPoint, GPoint)])
        : Seq[((GPoint, GPoint), Boolean)] =
      segs.flatMap { case (p, q) =>
        val ts = all.filter(s => s != ((p, q))).flatMap { case (c, d) =>
          segEventTs(p, q, c, d)
        }
        splitSeg(p, q, ts).map { piece =>
          val m = mid(piece)
          (piece, other.exists { case (c, d) => onSeg(c, d, m) })
        }
      }
    (pieces(segsA, segsB), pieces(segsB, segsA))
  }

  private def sortPieces(ps: Seq[(GPoint, GPoint)]): Seq[(GPoint, GPoint)] =
    ps.sortBy(s => (s._1.y, s._1.x, s._2.y, s._2.x))

  private def renderLinePieces(ps0: Seq[(GPoint, GPoint)], emptyAs: String): String = {
    val ps = sortPieces(ps0)
    if (ps.isEmpty) emptyAs
    else if (ps.length == 1) GeometryFns.lineStringWkt(Array(ps.head._1, ps.head._2))
    else multiLineWkt(ps.map(s => Array(s._1, s._2)))
  }

  def lineDifference(a: Geo, b: Geo): String = {
    val (pa, _) = nodedArrangement(a, b)
    renderLinePieces(pa.collect { case (s, false) => s }, "MULTILINESTRING EMPTY")
  }

  def lineSymDifference(a: Geo, b: Geo): String = {
    val (pa, pb) = nodedArrangement(a, b)
    renderLinePieces(
      pa.collect { case (s, false) => s } ++ pb.collect { case (s, false) => s },
      "MULTILINESTRING EMPTY")
  }

  def lineIntersection(a: Geo, b: Geo): String = {
    val (pa, _) = nodedArrangement(a, b)
    val shared = sortPieces(pa.collect { case (s, true) => s })
    // isolated crossing points: inter-operand intersection events not
    // covered by a shared piece (testSTIntersection:802/803)
    val segsA = linePaths(a).flatMap(p => p.toSeq.zip(p.tail.toSeq))
    val segsB = linePaths(b).flatMap(p => p.toSeq.zip(p.tail.toSeq))
    val crossPts = (for {
      (p, q) <- segsA
      (c, d) <- segsB
      t <- segEventTs(p, q, c, d)
      if t >= -1e-12 && t <= 1 + 1e-12
    } yield GPoint(p.x + t * (q.x - p.x), p.y + t * (q.y - p.y)))
      .filterNot(pt => shared.exists { case (s1, s2) => onSeg(s1, s2, pt) })
      .distinct.sortBy(p => (p.y, p.x))
    renderMixed(crossPts, shared)
  }

  /** Points-then-lines collection render; an empty result keeps the
    * reference's MULTIPOLYGON EMPTY quirk.
    */
  private def renderMixed(pts: Seq[GPoint], lines: Seq[(GPoint, GPoint)]): String = {
    val lineArrays = lines.map(s => Array(s._1, s._2))
    (pts.isEmpty, lineArrays.isEmpty) match {
      case (true, true)  => "MULTIPOLYGON EMPTY"
      case (false, true) =>
        if (pts.length == 1) GeometryFns.pointWkt(pts.head.x, pts.head.y)
        else multiPointWkt(pts)
      case (true, false) =>
        if (lineArrays.length == 1) GeometryFns.lineStringWkt(lineArrays.head)
        else multiLineWkt(lineArrays)
      case (false, false) =>
        val ptTexts = pts.map(p =>
          if (pts.length == 1) GeometryFns.pointWkt(p.x, p.y)
          else GeometryFns.pointWkt(p.x, p.y))
        val lineText =
          if (lineArrays.length == 1) GeometryFns.lineStringWkt(lineArrays.head)
          else multiLineWkt(lineArrays)
        "GEOMETRYCOLLECTION (" + (ptTexts :+ lineText).mkString(", ") + ")"
    }
  }

  /** Areal ∩ line: clip the line to the polygon's closed region (kept
    * sub-segments have their midpoint inside or on the boundary;
    * boundary-touch points with no kept piece surface as POINTs —
    * testSTIntersection:806/807). Contiguous kept pieces merge along
    * the path.
    */
  def polyLineIntersection(polys: Seq[Polygon], line: Geo): String = {
    val boundary = polys.flatMap(_.rings.flatMap(r =>
      (0 until r.length - 1).map(i => (r(i), r(i + 1)))))
    def insideOrOn(p: GPoint): Boolean =
      boundary.exists { case (a, b) => onSeg(a, b, p) } ||
        polys.count(c => GeometryFns.containsPoint(c, p.x, p.y)) % 2 == 1
    val kept = scala.collection.mutable.ArrayBuffer.empty[Array[GPoint]]
    val touchPts = scala.collection.mutable.ArrayBuffer.empty[GPoint]
    linePaths(line).foreach { path =>
      var current = scala.collection.mutable.ArrayBuffer.empty[GPoint]
      def flush(): Unit = {
        if (current.length >= 2) kept += current.toArray
        current = scala.collection.mutable.ArrayBuffer.empty[GPoint]
      }
      path.toSeq.zip(path.tail.toSeq).foreach { case (p, q) =>
        val ts = boundary.flatMap { case (c, d) => segEventTs(p, q, c, d) }
        splitSeg(p, q, ts).foreach { piece =>
          if (insideOrOn(mid(piece))) {
            if (current.isEmpty) current ++= Seq(piece._1, piece._2)
            else if (current.last == piece._1) current += piece._2
            else { flush(); current ++= Seq(piece._1, piece._2) }
          } else flush()
        }
        // boundary-touch candidates at the raw intersection events
        ts.filter(t => t >= -1e-12 && t <= 1 + 1e-12).foreach { t =>
          touchPts += GPoint(p.x + t * (q.x - p.x), p.y + t * (q.y - p.y))
        }
      }
      flush()
    }
    val keptArrays = kept.toSeq
    val isolated = touchPts.toSeq
      .filterNot(pt => keptArrays.exists(arr =>
        arr.toSeq.zip(arr.tail.toSeq).exists { case (a, b) => onSeg(a, b, pt) }))
      .distinct.sortBy(p => (p.y, p.x))
    // render with full paths (not 2-point segments)
    val lineText = keptArrays match {
      case Seq() => null
      case Seq(one) => GeometryFns.lineStringWkt(one)
      case many => multiLineWkt(many)
    }
    (isolated.isEmpty, lineText == null) match {
      case (true, true) => "MULTIPOLYGON EMPTY"
      case (true, false) => lineText
      case (false, true) =>
        if (isolated.length == 1) GeometryFns.pointWkt(isolated.head.x, isolated.head.y)
        else multiPointWkt(isolated)
      case (false, false) =>
        "GEOMETRYCOLLECTION (" +
          (isolated.map(p => GeometryFns.pointWkt(p.x, p.y)) :+ lineText)
            .mkString(", ") + ")"
    }
  }

  // ── linear referencing ──────────────────────────────────────────────

  def lineInterpolatePoint(wkt: String, fraction: Double): String = {
    if (fraction.isNaN || fraction < 0 || fraction > 1)
      fail("line_interpolate_point fraction must be in [0, 1]")
    val pts = asLine(wkt, "line_interpolate_point")
    val lens = pts.toSeq.zip(pts.tail.toSeq)
      .map { case (a, b) => math.hypot(b.x - a.x, b.y - a.y) }
    val total = lens.sum
    if (total == 0) return GeometryFns.pointWkt(pts.head.x, pts.head.y)
    var remain = fraction * total
    var i = 0
    while (i < lens.length && remain > lens(i)) { remain -= lens(i); i += 1 }
    if (i >= lens.length) GeometryFns.pointWkt(pts.last.x, pts.last.y)
    else {
      val (a, b) = (pts(i), pts(i + 1))
      val t = if (lens(i) == 0) 0.0 else remain / lens(i)
      GeometryFns.pointWkt(a.x + t * (b.x - a.x), a.y + t * (b.y - a.y))
    }
  }

  /** Fraction of the line's length at the closest approach to the point. */
  def lineLocatePoint(wkt: String, pointWkt: String): java.lang.Double = {
    // reference (GeoFunctions.java:439-461): empty inputs → NULL; the
    // line may be a LINESTRING or MULTILINESTRING (index over the
    // concatenated paths / total length)
    val lineGeo = parseGeo(wkt)
    val pointGeo = parseGeo(pointWkt)
    if (isEmptyGeo(lineGeo) || isEmptyGeo(pointGeo)) return null
    val paths: Seq[Array[GPoint]] = lineGeo match {
      case LGeo(ps) => Seq(ps)
      // per-path walk: flattening would insert a phantom connector
      // segment between path ends that both accrues length and can
      // win the closest-approach (KAT value gate r15 — the reference
      // indexes over the CONCATENATED path lengths only)
      case MLGeo(ls) => ls
      case g => fail("First argument to line_locate_point must be a LineString " +
        s"or a MultiLineString. Got: ${stGeometryType(formatGeo(g)).stripPrefix("ST_")}")
    }
    val p = pointGeo match {
      case PGeo(q) => q
      case g => fail("Second argument to line_locate_point must be a Point. " +
        s"Got: ${stGeometryType(formatGeo(g)).stripPrefix("ST_")}")
    }
    var best = Double.MaxValue
    var bestAt = 0.0
    var walked = 0.0
    for (pts <- paths) {
      var i = 0
      while (i < pts.length - 1) {
        val a = pts(i); val b = pts(i + 1)
        val segLen = math.hypot(b.x - a.x, b.y - a.y)
        val len2 = segLen * segLen
        val t =
          if (len2 == 0) 0.0
          else math.max(0.0, math.min(1.0,
            ((p.x - a.x) * (b.x - a.x) + (p.y - a.y) * (b.y - a.y)) / len2))
        val d = math.hypot(p.x - (a.x + t * (b.x - a.x)), p.y - (a.y + t * (b.y - a.y)))
        if (d < best) { best = d; bestAt = walked + t * segLen }
        walked += segLen
        i += 1
      }
    }
    java.lang.Double.valueOf(if (walked == 0) 0.0 else bestAt / walked)
  }

  // ── boundary ────────────────────────────────────────────────────────

  /** OGC boundary: points have none (empty), a linestring's boundary is
    * its endpoints under the mod-2 rule (closed → empty), a polygon's is
    * its rings as (MULTI)LINESTRING.
    */
  def stBoundary(wkt: String): String = parseGeo(wkt) match {
    // reference/Esri conventions (TestGeoFunctions.testSTBoundary):
    // 0-dim → GEOMETRYCOLLECTION EMPTY, closed/empty lines →
    // MULTIPOINT EMPTY, line endpoints SORTED by (x, y), polygon shells
    // emitted CLOCKWISE keeping the first vertex
    case _: PGeo | _: MPGeo | EmptyGeo("POINT") | EmptyGeo("MULTIPOINT") =>
      "GEOMETRYCOLLECTION EMPTY"
    case EmptyGeo("LINESTRING") | EmptyGeo("MULTILINESTRING") =>
      "MULTIPOINT EMPTY"
    case LGeo(pts) =>
      // a SINGLE path keeps (start, end) order — only the multiline
      // boundary sorts (TestGeoFunctions:697 vs :699; KAT value r15)
      if (pts.head == pts.last) "MULTIPOINT EMPTY"
      else multiPointWkt(Seq(pts.head, pts.last))
    case MLGeo(ls) =>
      val ends = ls.filter(l => l.head != l.last).flatMap(l => Seq(l.head, l.last))
      val odd = ends.groupBy(identity).collect { case (p, os) if os.size % 2 == 1 => p }
      if (odd.isEmpty) "MULTIPOINT EMPTY"
      else multiPointWkt(odd.toSeq.sortBy(p => (p.x, p.y)))
    case PolyGeo(cs) =>
      val rings = cs.flatMap(p => p.rings.zipWithIndex.map { case (r, i) =>
        orientRing(r, clockwise = i == 0)
      })
      if (rings.isEmpty) "MULTILINESTRING EMPTY"
      else if (rings.length == 1) GeometryFns.lineStringWkt(rings.head)
      else multiLineWkt(rings)
    case _: CGeo | _: EmptyGeo =>
      fail("ST_Boundary: GEOMETRYCOLLECTION is not supported")
  }

  /** Signed shoelace area: > 0 for counter-clockwise rings. */
  private def ringSigned(ring: Array[GPoint]): Double = {
    var s = 0.0
    var i = 0
    while (i < ring.length - 1) {
      s += ring(i).x * ring(i + 1).y - ring(i + 1).x * ring(i).y
      i += 1
    }
    s / 2.0
  }

  /** The reference's serializer orients shells clockwise and holes
    * counter-clockwise, keeping the ring's first vertex (testSTBoundary:
    * `(1 1, 4 1, 1 4, 1 1)` → `(1 1, 1 4, 4 1, 1 1)`).
    */
  private def orientRing(ring: Array[GPoint], clockwise: Boolean): Array[GPoint] = {
    val cw = ringSigned(ring) < 0
    if (cw == clockwise) ring
    // closed ring [A, B, …, A]: keep the first vertex, reverse the walk
    // → [A, …, B, A] (the naive tail.reverse duplicates A and drops the
    // closure)
    else (ring.head +: ring.tail.reverse.tail) :+ ring.head
  }

  // ── aggregates (reference ConvexHullAggregation.java /
  //    GeometryUnionAgg.java): state is the RUNNING hull / union WKT —
  //    bounded by result complexity, never by input row count, so the
  //    partial/final merge tree scales like any algebraic aggregate ─────

  object GeometryUnionAggregator
      extends org.apache.spark.sql.expressions.Aggregator[String, String, String] {
    private def canon(w: String): String = parseGeo(w) match {
      case p: PolyGeo => formatGeo(p)
      case _ => fail("geometry_union_agg supports areal geometries (declared subset)")
    }
    def zero: String = null
    def reduce(b: String, a: String): String =
      if (a == null) b else if (b == null) canon(a)
      else geometryUnion(Array(b, a))
    def merge(x: String, y: String): String =
      if (x == null) y else if (y == null) x else geometryUnion(Array(x, y))
    def finish(b: String): String = b
    def bufferEncoder: org.apache.spark.sql.Encoder[String] =
      org.apache.spark.sql.Encoders.STRING
    def outputEncoder: org.apache.spark.sql.Encoder[String] =
      org.apache.spark.sql.Encoders.STRING
  }

  object ConvexHullAggregator
      extends org.apache.spark.sql.expressions.Aggregator[String, String, String] {
    def zero: String = null
    def reduce(b: String, a: String): String =
      if (a == null) b
      else if (b == null) convexHullOf(allVertices(parseGeo(a)))
      else convexHullOf(allVertices(parseGeo(b)) ++ allVertices(parseGeo(a)))
    def merge(x: String, y: String): String =
      if (x == null) y else if (y == null) x
      else convexHullOf(allVertices(parseGeo(x)) ++ allVertices(parseGeo(y)))
    def finish(b: String): String = b
    def bufferEncoder: org.apache.spark.sql.Encoder[String] =
      org.apache.spark.sql.Encoders.STRING
    def outputEncoder: org.apache.spark.sql.Encoder[String] =
      org.apache.spark.sql.Encoders.STRING
  }

  // ── n-ary union ─────────────────────────────────────────────────────

  /** Reference geometry_union(array(Geometry)) — areal subset; nulls in
    * the array are skipped, an all-null/empty array yields POLYGON EMPTY.
    */
  def geometryUnion(wkts: Array[String]): String = {
    val comps = Option(wkts).toSeq.flatten.filter(_ != null).flatMap { w =>
      parseGeo(w) match {
        case PolyGeo(cs) => cs
        case _ => fail("geometry_union supports areal geometries (declared subset)")
      }
    }
    if (comps.isEmpty) "POLYGON EMPTY"
    else comps.tail.foldLeft(Seq(comps.head)) { (acc, p) =>
      PolygonOverlay.overlay(acc, Seq(p), PolygonOverlay.OpUnion)
    } match {
      case out if out.isEmpty => "POLYGON EMPTY"
      case out if out.length == 1 => GeometryFns.polygonWkt(out.head)
      case out => GeometryFns.multiPolygonWkt(out)
    }
  }

  // ── WKB (ST_AsBinary / ST_GeomFromBinary) ───────────────────────────
  // Standard little-endian WKB: type 1 point, 2 linestring, 3 polygon,
  // 4 multipoint, 6 multipolygon; multi-geometries nest full WKB
  // children per the spec.

  def stAsBinary(wkt: String): Array[Byte] = {
    val bb = new java.io.ByteArrayOutputStream()
    writeWkb(bb, parseGeo(wkt))
    bb.toByteArray
  }

  private def le(v: Int): Array[Byte] =
    java.nio.ByteBuffer.allocate(4).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(v).array()
  private def le(v: Double): Array[Byte] =
    java.nio.ByteBuffer.allocate(8).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putDouble(v).array()

  private def writeWkb(out: java.io.ByteArrayOutputStream, g: Geo): Unit = {
    def pt(p: GPoint): Unit = { out.write(le(p.x)); out.write(le(p.y)) }
    g match {
      case PGeo(p) =>
        out.write(1); out.write(le(1)); pt(p)
      case LGeo(pts) =>
        out.write(1); out.write(le(2)); out.write(le(pts.length)); pts.foreach(pt)
      case PolyGeo(Seq(poly)) =>
        out.write(1); out.write(le(3)); out.write(le(poly.rings.length))
        poly.rings.foreach { r => out.write(le(r.length)); r.foreach(pt) }
      case MPGeo(ps) =>
        out.write(1); out.write(le(4)); out.write(le(ps.length))
        ps.foreach(p => writeWkb(out, PGeo(p)))
      case MLGeo(ls) =>
        out.write(1); out.write(le(5)); out.write(le(ls.length))
        ls.foreach(l => writeWkb(out, LGeo(l)))
      case PolyGeo(cs) =>
        out.write(1); out.write(le(6)); out.write(le(cs.length))
        cs.foreach(c => writeWkb(out, PolyGeo(Seq(c))))
    }
  }

  def stGeomFromBinary(bytes: Array[Byte]): String = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    formatGeo(readWkb(bb))
  }

  private def readWkb(bb: java.nio.ByteBuffer): Geo = {
    val order = bb.get()
    bb.order(if (order == 1) java.nio.ByteOrder.LITTLE_ENDIAN
      else java.nio.ByteOrder.BIG_ENDIAN)
    def pt(): GPoint = GPoint(bb.getDouble(), bb.getDouble())
    bb.getInt() match {
      case 1 => PGeo(pt())
      case 2 => LGeo(Array.fill(bb.getInt())(pt()))
      case 3 =>
        val rings = Seq.fill(bb.getInt())(Array.fill(bb.getInt())(pt()))
        PolyGeo(Seq(Polygon(rings)))
      case 4 =>
        MPGeo(Seq.fill(bb.getInt()) {
          readWkb(bb) match {
            case PGeo(p) => p
            case _ => fail("WKB multipoint member is not a point")
          }
        })
      case 5 =>
        MLGeo(Seq.fill(bb.getInt()) {
          readWkb(bb) match {
            case LGeo(l) => l
            case _ => fail("WKB multilinestring member is not a linestring")
          }
        })
      case 6 =>
        PolyGeo(Seq.fill(bb.getInt()) {
          readWkb(bb) match {
            case PolyGeo(Seq(p)) => p
            case _ => fail("WKB multipolygon member is not a polygon")
          }
        })
      case t => fail(s"Unsupported WKB geometry type $t")
    }
  }
}
