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

  // ── parsed-geometry sum type over the supported WKT subset ──────────
  sealed trait Geo
  final case class PGeo(p: GPoint) extends Geo
  final case class MPGeo(pts: Seq[GPoint]) extends Geo
  final case class LGeo(pts: Array[GPoint]) extends Geo
  final case class MLGeo(lines: Seq[Array[GPoint]]) extends Geo
  /** comps empty = POLYGON EMPTY; 1 = POLYGON; >1 = MULTIPOLYGON. */
  final case class PolyGeo(comps: Seq[Polygon]) extends Geo

  private def fail(msg: String): Nothing = throw new IllegalArgumentException(msg)

  def parseGeo(wkt: String): Geo = {
    val up = wkt.trim.toUpperCase
    if (up == "POLYGON EMPTY" || up == "MULTIPOLYGON EMPTY") PolyGeo(Seq.empty)
    else if (up.startsWith("MULTIPOLYGON"))
      PolyGeo(GeometryFns.multiPolygonParts(wkt).map(GeometryFns.parsePolygon))
    else if (up.startsWith("POLYGON")) PolyGeo(Seq(GeometryFns.parsePolygon(wkt)))
    else if (up.startsWith("MULTIPOINT")) MPGeo(parseMultiPoint(wkt))
    else if (up.startsWith("MULTILINESTRING")) MLGeo(parseMultiLine(wkt))
    else if (up.startsWith("LINESTRING")) LGeo(GeometryFns.parseLineString(wkt))
    else if (up.startsWith("POINT")) PGeo(GeometryFns.parsePoint(wkt))
    else fail(s"Unsupported WKT geometry: $wkt")
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

  def multiPointWkt(pts: Seq[GPoint]): String =
    "MULTIPOINT (" + pts.map(p => s"${fmt(p.x)} ${fmt(p.y)}").mkString(", ") + ")"

  def multiLineWkt(lines: Seq[Array[GPoint]]): String =
    "MULTILINESTRING (" + lines.map(l =>
      "(" + l.map(p => s"${fmt(p.x)} ${fmt(p.y)}").mkString(", ") + ")")
      .mkString(", ") + ")"

  def formatGeo(g: Geo): String = g match {
    case PGeo(p)        => GeometryFns.pointWkt(p.x, p.y)
    case MPGeo(pts)     => multiPointWkt(pts)
    case LGeo(pts)      => GeometryFns.lineStringWkt(pts)
    case MLGeo(lines)   => multiLineWkt(lines)
    case PolyGeo(cs)    =>
      if (cs.isEmpty) "POLYGON EMPTY"
      else if (cs.length == 1) GeometryFns.polygonWkt(cs.head)
      else GeometryFns.multiPolygonWkt(cs)
  }

  // ── type metadata ───────────────────────────────────────────────────

  def stGeometryType(wkt: String): String = parseGeo(wkt) match {
    case _: PGeo                       => "ST_Point"
    case _: MPGeo                      => "ST_MultiPoint"
    case _: LGeo                       => "ST_LineString"
    case _: MLGeo                      => "ST_MultiLineString"
    case PolyGeo(cs) if cs.length <= 1 => "ST_Polygon"
    case _: PolyGeo                    => "ST_MultiPolygon"
  }

  def stDimension(wkt: String): Int = parseGeo(wkt) match {
    case _: PGeo | _: MPGeo => 0
    case _: LGeo | _: MLGeo => 1
    case _: PolyGeo         => 2
  }

  /** All supported geometries are planar xy. */
  def stCoordDim(wkt: String): Int = { parseGeo(wkt); 2 }

  def stIsEmpty(wkt: String): Boolean = parseGeo(wkt) match {
    case PolyGeo(cs) => cs.isEmpty
    case _           => false
  }

  def stIsClosed(wkt: String): Boolean = parseGeo(wkt) match {
    case LGeo(pts)   => pts.head == pts.last
    case MLGeo(lines) => lines.forall(l => l.head == l.last)
    case _ => fail("ST_IsClosed supports LINESTRING geometries")
  }

  def stIsRing(wkt: String): Boolean = parseGeo(wkt) match {
    case LGeo(pts) => pts.head == pts.last && lineIsSimple(pts)
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
    case _ => null // points/multipoints/linestrings in the subset are valid
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
    case _ => fail(s"$op supports LINESTRING geometries")
  }

  def stStartPoint(wkt: String): String = {
    val p = asLine(wkt, "ST_StartPoint").head
    GeometryFns.pointWkt(p.x, p.y)
  }

  def stEndPoint(wkt: String): String = {
    val p = asLine(wkt, "ST_EndPoint").last
    GeometryFns.pointWkt(p.x, p.y)
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
  def stPoints(wkt: String): Array[String] = parseGeo(wkt) match {
    case PGeo(p)    => Array(GeometryFns.pointWkt(p.x, p.y))
    case MPGeo(ps)  => ps.map(p => GeometryFns.pointWkt(p.x, p.y)).toArray
    case LGeo(pts)  => pts.map(p => GeometryFns.pointWkt(p.x, p.y))
    case MLGeo(ls)  => ls.flatten.map(p => GeometryFns.pointWkt(p.x, p.y)).toArray
    case PolyGeo(cs) =>
      cs.flatMap(_.rings.flatMap(_.dropRight(1)))
        .map(p => GeometryFns.pointWkt(p.x, p.y)).toArray
  }

  private def asSinglePolygon(wkt: String, op: String): Polygon = parseGeo(wkt) match {
    case PolyGeo(Seq(p)) => p
    case _ => fail(s"$op supports POLYGON geometries")
  }

  def stExteriorRing(wkt: String): String =
    GeometryFns.lineStringWkt(asSinglePolygon(wkt, "ST_ExteriorRing").rings.head)

  def stNumInteriorRing(wkt: String): Int =
    asSinglePolygon(wkt, "ST_NumInteriorRing").rings.length - 1

  /** 1-based; null out of range. */
  def stInteriorRingN(wkt: String, n: Int): String = {
    val holes = asSinglePolygon(wkt, "ST_InteriorRingN").rings.tail
    if (n < 1 || n > holes.length) null
    else GeometryFns.lineStringWkt(holes(n - 1))
  }

  def stInteriorRings(wkt: String): Array[String] =
    asSinglePolygon(wkt, "ST_InteriorRings").rings.tail
      .map(GeometryFns.lineStringWkt).toArray

  // ── sub-geometry accessors ──────────────────────────────────────────

  def stNumGeometries(wkt: String): Int = parseGeo(wkt) match {
    case PolyGeo(cs) => cs.length
    case MPGeo(ps)   => ps.length
    case MLGeo(ls)   => ls.length
    case _           => 1
  }

  /** 1-based; null out of range. Single geometries are their own only
    * component.
    */
  def stGeometryN(wkt: String, n: Int): String = parseGeo(wkt) match {
    case PolyGeo(cs) =>
      if (n < 1 || n > cs.length) null else GeometryFns.polygonWkt(cs(n - 1))
    case MPGeo(ps) =>
      if (n < 1 || n > ps.length) null
      else GeometryFns.pointWkt(ps(n - 1).x, ps(n - 1).y)
    case MLGeo(ls) =>
      if (n < 1 || n > ls.length) null else GeometryFns.lineStringWkt(ls(n - 1))
    case g => if (n == 1) formatGeo(g) else null
  }

  def stGeometries(wkt: String): Array[String] = parseGeo(wkt) match {
    case PolyGeo(cs) if cs.isEmpty => null // reference: null for empty input
    case PolyGeo(cs) => cs.map(GeometryFns.polygonWkt).toArray
    case MPGeo(ps)   => ps.map(p => GeometryFns.pointWkt(p.x, p.y)).toArray
    case MLGeo(ls)   => ls.map(GeometryFns.lineStringWkt).toArray
    case g           => Array(formatGeo(g))
  }

  // ── constructors ────────────────────────────────────────────────────

  def stMultiPoint(points: Array[String]): String = {
    if (points == null || points.isEmpty) fail("ST_MultiPoint requires at least one point")
    multiPointWkt(points.toSeq.map(GeometryFns.parsePoint))
  }

  def stLineStringFromPoints(points: Array[String]): String = {
    if (points == null || points.length < 2)
      fail("ST_LineString requires at least two points")
    GeometryFns.lineStringWkt(points.map(GeometryFns.parsePoint))
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
    if (g.isInstanceOf[PolyGeo] && g.asInstanceOf[PolyGeo].comps.isEmpty)
      return "POLYGON EMPTY"
    convexHullOf(allVertices(g))
  }

  private def allVertices(g: Geo): Seq[GPoint] = g match {
    case PGeo(p)     => Seq(p)
    case MPGeo(ps)   => ps
    case LGeo(pts)   => pts.toSeq
    case MLGeo(ls)   => ls.flatMap(_.toSeq)
    case PolyGeo(cs) => cs.flatMap(_.rings.flatMap(_.dropRight(1)))
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
      case _ => fail("ST_Relate supports point↔polygon and polygon↔polygon " +
        "(declared subset)")
    }

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
    case PGeo(_) | MPGeo(_) => Seq.empty
    case MLGeo(ls) => ls.flatMap(l => l.toSeq.zip(l.tail.toSeq))
    case LGeo(pts) => pts.toSeq.zip(pts.tail.toSeq)
    case PolyGeo(cs) =>
      cs.flatMap(_.rings.flatMap(r => (0 until r.length - 1).map(i => (r(i), r(i + 1)))))
  }

  /** Planar distance between any two supported geometries: 0 when they
    * intersect (boundary-inclusive, interiors included for areal
    * operands), otherwise the minimum vertex↔segment distance — exact
    * for non-intersecting polylines since the closest approach of two
    * disjoint segments is at an endpoint.
    */
  def distanceWkt(wktA: String, wktB: String): Double = {
    if (GeometryFns.stIntersects(wktA, wktB)) return 0.0
    val ga = parseGeo(wktA); val gb = parseGeo(wktB)
    val (ptsA, ptsB) = (allVertices(ga), allVertices(gb))
    val (segA, segB) = (segments(ga), segments(gb))
    val viaA = for (p <- ptsA.iterator; s <- segB.iterator)
      yield segPointDist(s._1, s._2, p)
    val viaB = for (p <- ptsB.iterator; s <- segA.iterator)
      yield segPointDist(s._1, s._2, p)
    val pp = for (p <- ptsA.iterator; q <- ptsB.iterator)
      yield math.hypot(p.x - q.x, p.y - q.y)
    (viaA ++ viaB ++ pp).min
  }

  def distanceWktU(a: org.apache.spark.unsafe.types.UTF8String,
      b: org.apache.spark.unsafe.types.UTF8String): Double =
    distanceWkt(a.toString, b.toString)

  // ── envelope utilities ──────────────────────────────────────────────

  private def envelopeOf(wkt: String): (GPoint, GPoint) = {
    val vs = allVertices(parseGeo(wkt))
    if (vs.isEmpty) fail("envelope of an empty geometry")
    (GPoint(vs.map(_.x).min, vs.map(_.y).min), GPoint(vs.map(_.x).max, vs.map(_.y).max))
  }

  def expandEnvelope(wkt: String, d: Double): String = {
    if (d.isNaN || d < 0) fail("expand_envelope distance must be >= 0")
    val (lo, hi) = envelopeOf(wkt)
    GeometryFns.polygonWkt(Polygon(Seq(Array(
      GPoint(lo.x - d, lo.y - d), GPoint(hi.x + d, lo.y - d),
      GPoint(hi.x + d, hi.y + d), GPoint(lo.x - d, hi.y + d),
      GPoint(lo.x - d, lo.y - d)))))
  }

  /** Reference ST_EnvelopeAsPts: the two corner points. */
  def stEnvelopeAsPts(wkt: String): Array[String] = {
    val (lo, hi) = envelopeOf(wkt)
    Array(GeometryFns.pointWkt(lo.x, lo.y), GeometryFns.pointWkt(hi.x, hi.y))
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
  def lineLocatePoint(wkt: String, pointWkt: String): Double = {
    val pts = asLine(wkt, "line_locate_point")
    val p = GeometryFns.parsePoint(pointWkt)
    var best = Double.MaxValue
    var bestAt = 0.0
    var walked = 0.0
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
    if (walked == 0) 0.0 else bestAt / walked
  }

  // ── boundary ────────────────────────────────────────────────────────

  /** OGC boundary: points have none (empty), a linestring's boundary is
    * its endpoints under the mod-2 rule (closed → empty), a polygon's is
    * its rings as (MULTI)LINESTRING.
    */
  def stBoundary(wkt: String): String = parseGeo(wkt) match {
    case _: PGeo | _: MPGeo => "POLYGON EMPTY"
    case LGeo(pts) =>
      if (pts.head == pts.last) "POLYGON EMPTY"
      else multiPointWkt(Seq(pts.head, pts.last))
    case MLGeo(ls) =>
      val ends = ls.filter(l => l.head != l.last).flatMap(l => Seq(l.head, l.last))
      val odd = ends.groupBy(identity).collect { case (p, os) if os.size % 2 == 1 => p }
      if (odd.isEmpty) "POLYGON EMPTY" else multiPointWkt(odd.toSeq)
    case PolyGeo(cs) =>
      val rings = cs.flatMap(_.rings)
      if (rings.isEmpty) "POLYGON EMPTY"
      else if (rings.length == 1) GeometryFns.lineStringWkt(rings.head)
      else multiLineWkt(rings)
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
