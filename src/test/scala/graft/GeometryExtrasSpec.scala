package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.GeometryExtras._
import graft.functions.GeometryFns

/** The geospatial registry remainder (GeometryExtras): accessors, type
  * metadata, validity, constructors, predicates, general distance,
  * linear referencing, n-ary union, WKB, boundary, and the two
  * aggregates — pinned against hand-computable fixtures.
  */
class GeometryExtrasSpec extends AnyFunSuite {

  private val sq = "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))"
  private val donut =
    "POLYGON ((0 0, 8 0, 8 8, 0 8, 0 0), (3 3, 5 3, 5 5, 3 5, 3 3))"
  private val mp = "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 1, 0 0)), ((5 5, 7 5, 7 7, 5 7, 5 5)))"
  private val line = "LINESTRING (0 0, 3 0, 3 4)"
  private val eps = 1e-9

  test("type metadata: geometry type, dimension, coord dim, emptiness") {
    assert(stGeometryType("POINT (1 2)") == "ST_Point")
    assert(stGeometryType("MULTIPOINT (1 2, 3 4)") == "ST_MultiPoint")
    assert(stGeometryType(line) == "ST_LineString")
    assert(stGeometryType("MULTILINESTRING ((0 0, 1 1), (2 2, 3 3))") == "ST_MultiLineString")
    assert(stGeometryType(sq) == "ST_Polygon")
    assert(stGeometryType(mp) == "ST_MultiPolygon")
    assert(stDimension("POINT (1 2)") == 0 && stDimension(line) == 1 &&
      stDimension(sq) == 2)
    assert(stCoordDim(sq) == 2)
    assert(stIsEmpty("POLYGON EMPTY") && !stIsEmpty(sq))
  }

  test("closed / ring / simple / valid with reasons") {
    assert(!stIsClosed(line))
    assert(stIsClosed("LINESTRING (0 0, 1 0, 1 1, 0 0)"))
    assert(stIsRing("LINESTRING (0 0, 1 0, 1 1, 0 0)"))
    assert(!stIsRing("LINESTRING (0 0, 2 2, 2 0, 0 2, 0 0)")) // bowtie closes but crosses
    assert(stIsSimple(line))
    assert(!stIsSimple("LINESTRING (0 0, 2 2, 2 0, 0 2)")) // X crossing
    assert(stIsValid(donut) && geometryInvalidReason(donut) == null)
    val bowtie = "POLYGON ((0 0, 2 2, 2 0, 0 2, 0 0))"
    assert(!stIsValid(bowtie))
    assert(geometryInvalidReason(bowtie).contains("self-intersecting"))
    val strayHole = "POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0), (5 5, 6 5, 6 6, 5 6, 5 5))"
    assert(geometryInvalidReason(strayHole).contains("outside the shell"))
  }

  test("linestring and ring accessors") {
    assert(stStartPoint(line) == "POINT (0 0)")
    assert(stEndPoint(line) == "POINT (3 4)")
    assert(stPointN(line, 2) == "POINT (3 0)")
    assert(stPointN(line, 9) == null && stPointN(line, 0) == null)
    assert(stPoints(line).toSeq == Seq("POINT (0 0)", "POINT (3 0)", "POINT (3 4)"))
    assert(stExteriorRing(sq) == "LINESTRING (0 0, 4 0, 4 4, 0 4, 0 0)")
    assert(stNumInteriorRing(donut) == 1 && stNumInteriorRing(sq) == 0)
    assert(stInteriorRingN(donut, 1) == "LINESTRING (3 3, 5 3, 5 5, 3 5, 3 3)")
    assert(stInteriorRingN(donut, 2) == null)
    assert(stInteriorRings(donut).length == 1 && stInteriorRings(sq).isEmpty)
  }

  test("sub-geometry accessors across single and multi inputs") {
    assert(stNumGeometries(mp) == 2 && stNumGeometries(sq) == 1 &&
      stNumGeometries("MULTIPOINT (1 2, 3 4, 5 6)") == 3 &&
      stNumGeometries("POLYGON EMPTY") == 0)
    assert(GeometryFns.area(stGeometryN(mp, 2)) == 4.0)
    assert(stGeometryN(mp, 3) == null)
    assert(stGeometryN(sq, 1) == GeometryFns.polygonWkt(GeometryFns.parsePolygon(sq)))
    assert(stGeometries(mp).length == 2)
    assert(stGeometries("POLYGON EMPTY") == null)
  }

  test("constructors: multipoint, linestring-from-points, convex hull") {
    // reference canonical form parenthesizes each member (wave 9;
    // TestGeoFunctions testSTGeometries: `MULTIPOINT ((0 0), (1 1))`)
    assert(stMultiPoint(Array("POINT (1 2)", "POINT (3 4)")) == "MULTIPOINT ((1 2), (3 4))")
    assert(stLineStringFromPoints(Array("POINT (0 0)", "POINT (1 1)")) ==
      "LINESTRING (0 0, 1 1)")
    // hull of a plus-sign point cloud is the bounding diamond corners
    val hull = stConvexHull("MULTIPOINT (0 2, 2 0, 4 2, 2 4, 2 2, 1 2, 2 3)")
    assert(math.abs(GeometryFns.area(hull) - 8.0) < eps, hull)
    // hull of a concave L equals the hull of its vertices
    val lHull = stConvexHull("POLYGON ((0 0, 4 0, 4 1, 1 1, 1 4, 0 4, 0 0))")
    assert(math.abs(GeometryFns.area(lHull) - (16.0 - 4.5)) < eps, lHull)
    assert(stConvexHull("MULTIPOINT (0 0, 1 1, 2 2)") == "LINESTRING (0 0, 2 2)")
    assert(stConvexHull("POINT (5 5)") == "POINT (5 5)")
  }

  test("predicates: equals, disjoint, touches, crosses, overlaps") {
    val shifted = "POLYGON ((4 0, 8 0, 8 4, 4 4, 4 0))" // shares edge x=4 with sq
    val overlap = "POLYGON ((2 2, 6 2, 6 6, 2 6, 2 2))"
    assert(stEquals(sq, "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))"))
    // same region, different vertex decomposition: still equal (areal)
    assert(stEquals(sq, "POLYGON ((0 0, 2 0, 4 0, 4 4, 0 4, 0 0))"))
    assert(!stEquals(sq, shifted))
    assert(stDisjoint(sq, "POLYGON ((9 9, 10 9, 10 10, 9 10, 9 9))"))
    assert(!stDisjoint(sq, shifted)) // boundary contact intersects
    assert(stTouches(sq, shifted))
    assert(!stTouches(sq, overlap))
    assert(stTouches("POINT (4 2)", sq) && !stTouches("POINT (2 2)", sq))
    assert(stOverlaps(sq, overlap))
    assert(!stOverlaps(sq, shifted))
    assert(!stOverlaps(sq, "POLYGON ((1 1, 2 1, 2 2, 1 2, 1 1))")) // contained
    assert(stCrosses("LINESTRING (0 0, 4 4)", "LINESTRING (0 4, 4 0)"))
    assert(!stCrosses("LINESTRING (0 0, 1 1)", "LINESTRING (5 5, 6 6)"))
    assert(stCrosses("LINESTRING (-2 2, 9 2)", sq)) // enters and exits
    assert(!stCrosses("LINESTRING (1 1, 2 2)", sq)) // fully inside
  }

  test("ST_Relate: DE-9IM matrices match the canonical relation patterns") {
    val shifted = "POLYGON ((4 0, 8 0, 8 4, 4 4, 4 0))"
    val overlap = "POLYGON ((2 2, 6 2, 6 6, 2 6, 2 2))"
    val inside = "POLYGON ((1 1, 2 1, 2 2, 1 2, 1 1))"
    val far = "POLYGON ((9 9, 11 9, 11 11, 9 11, 9 9))"
    val corner = "POLYGON ((4 4, 6 4, 6 6, 4 6, 4 4))"
    assert(de9im(sq, sq) == "2FFF1FFF2") // equals
    assert(de9im(sq, far) == "FF2FF1212") // disjoint
    assert(de9im(sq, shifted) == "FF2F11212") // touches along an edge
    assert(de9im(sq, corner) == "FF2F01212") // touches at a corner point
    assert(de9im(sq, overlap) == "212101212") // overlaps
    assert(de9im(sq, inside) == "212FF1FF2") // contains (proper)
    assert(de9im("POINT (2 2)", sq) == "0FFFFF212") // point in interior
    assert(de9im("POINT (4 2)", sq) == "F0FFFF212") // point on boundary
    assert(de9im("POINT (9 9)", sq) == "FF0FFF212") // point outside
    assert(de9im(sq, "POINT (2 2)") == "0F2FF1FF2") // transpose
    // the 3-arg reference surface: named relations as patterns
    assert(stRelate(sq, sq, "T*F**FFF*"))          // equals
    assert(stRelate(sq, far, "FF*FF****"))          // disjoint
    // touches is the disjunction of three patterns; edge contact hits BB
    assert(stRelate(sq, shifted, "F***T****") ||
      stRelate(sq, shifted, "FT*******") || stRelate(sq, shifted, "F**T*****"))
    assert(stRelate(sq, corner, "F***T****")) // point contact also via BB
    assert(stRelate(sq, overlap, "T*T***T**"))      // overlaps (areal)
    assert(stRelate(sq, inside, "T*****FF*"))       // contains
    assert(!stRelate(sq, overlap, "FF*FF****"))
    // ── round 15: non-areal rows (closes the last ST_Relate KAT
    // residual — TestGeoRelations.java:202, boundary-boundary of two
    // lines meeting at one line's endpoint is F)
    assert(!stRelate("LINESTRING (0 0, 3 3)", "LINESTRING (1 1, 4 1)",
      "****T****"))
    assert(de9im("LINESTRING (0 0, 3 3)", "LINESTRING (1 1, 4 1)")
      == "F01FF0102") // B's endpoint touches A's interior
    assert(de9im("LINESTRING (0 0, 2 2)", "LINESTRING (0 2, 2 0)")
      == "0F1FF0102") // proper crossing: interiors meet at a point
    assert(de9im("LINESTRING (0 0, 2 0)", "LINESTRING (1 0, 3 0)")
      == "1010F0102") // collinear overlap of positive length
    assert(de9im("LINESTRING (0 0, 1 1)", "LINESTRING (0 0, 1 1)")
      == "1FFF0FFF2") // equal lines
    assert(de9im("POINT (1 1)", "LINESTRING (0 0, 2 2)") == "0FFFFF102")
    assert(de9im("POINT (0 0)", "LINESTRING (0 0, 2 2)") == "F0FFFF102")
    assert(de9im("POINT (5 5)", "LINESTRING (0 0, 2 2)") == "FF0FFF102")
    assert(de9im("POINT (1 1)", "POINT (1 1)") == "0FFFFFFF2")
    assert(de9im("POINT (1 1)", "POINT (2 2)") == "FF0FFF0F2")
    // mixed line↔polygon masks stay a LOUD documented delta
    val e = intercept[Exception] {
      stRelate("LINESTRING (0 0, 1 1)", sq, "*********")
    }
    assert(e.getMessage.contains("line↔polygon masks are not implemented"))
  }

  test("general geometry distance: exact for disjoint shapes, 0 on contact") {
    assert(GeometryExtrasTestAccess.dist(sq, "POLYGON ((7 0, 9 0, 9 2, 7 2, 7 0))") == 3.0)
    assert(GeometryExtrasTestAccess.dist(sq, "POINT (4 7)") == 3.0)
    assert(GeometryExtrasTestAccess.dist("POINT (0 3)", "LINESTRING (3 0, 3 10)") == 3.0)
    assert(GeometryExtrasTestAccess.dist(sq, "POLYGON ((2 2, 6 2, 6 6, 2 6, 2 2))") == 0.0)
    // diagonal offset: corner-to-corner
    assert(math.abs(GeometryExtrasTestAccess.dist(sq,
      "POLYGON ((7 7, 9 7, 9 9, 7 9, 7 7))") - 3 * math.sqrt(2)) < eps)
  }

  test("envelope utilities and linear referencing") {
    // Esri envelope ring order (SW, NW, NE, SE — r15)
    assert(expandEnvelope(line, 1.0) == "POLYGON ((-1 -1, -1 5, 4 5, 4 -1, -1 -1))")
    assert(stEnvelopeAsPts(donut).toSeq == Seq("POINT (0 0)", "POINT (8 8)"))
    // line has length 7: fraction 3/7 is the corner
    assert(lineInterpolatePoint(line, 3.0 / 7) == "POINT (3 0)")
    assert(lineInterpolatePoint(line, 0.0) == "POINT (0 0)")
    assert(lineInterpolatePoint(line, 1.0) == "POINT (3 4)")
    assert(math.abs(lineLocatePoint(line, "POINT (3 0)") - 3.0 / 7) < eps)
    assert(math.abs(lineLocatePoint(line, "POINT (4 2)") - 5.0 / 7) < eps)
    val fr = 0.37
    assert(math.abs(lineLocatePoint(line, lineInterpolatePoint(line, fr)) - fr) < eps)
  }

  test("n-ary geometry_union and the union/hull aggregates") {
    val row = (0 until 3).map(i =>
      s"POLYGON (($i 0, ${i + 1} 0, ${i + 1} 1, $i 1, $i 0))")
    val u = geometryUnion(row.toArray)
    assert(math.abs(GeometryFns.area(u) - 3.0) < eps && !u.startsWith("MULTI"), u)
    assert(geometryUnion(Array()) == "POLYGON EMPTY")
    assert(GeometryFns.area(geometryUnion(Array(null, sq, null))) == 16.0)
    // aggregator laws: reduce/merge associativity over a disjoint set
    val agg = GeometryUnionAggregator
    val left = agg.merge(agg.reduce(agg.reduce(agg.zero, row(0)), row(1)),
      agg.reduce(agg.zero, row(2)))
    val right = agg.reduce(agg.reduce(agg.reduce(agg.zero, row(2)), row(1)), row(0))
    assert(math.abs(GeometryFns.area(agg.finish(left)) - 3.0) < eps)
    assert(math.abs(GeometryFns.area(agg.finish(right)) - 3.0) < eps)
    val h = ConvexHullAggregator
    val hull = h.finish(h.merge(
      h.reduce(h.zero, "POINT (0 0)"),
      h.reduce(h.reduce(h.zero, "POINT (4 0)"), "MULTIPOINT (0 4, 4 4, 2 2)")))
    assert(math.abs(GeometryFns.area(hull) - 16.0) < eps, hull)
  }

  test("WKB round-trips every supported geometry type") {
    val inputs = Seq(
      "POINT (1.5 -2.25)", "MULTIPOINT (1 2, 3 4)", line,
      "MULTILINESTRING ((0 0, 1 1), (2 2, 3 3, 4 2))", sq, donut, mp)
    inputs.foreach { w =>
      val canonical = formatGeo(parseGeo(w))
      assert(stGeomFromBinary(stAsBinary(w)) == canonical, s"WKB roundtrip of $w")
    }
    // WKB bytes are the standard encoding: a point is 21 bytes LE
    val b = stAsBinary("POINT (1 2)")
    assert(b.length == 21 && b(0) == 1 && b(1) == 1)
  }

  test("boundary: rings, endpoints, mod-2 rule, empties") {
    // wave-9 reference conventions (TestGeoFunctions.testSTBoundary):
    // shells render CLOCKWISE keeping the first vertex, endpoints sort
    // by (x, y), 0-dim → GEOMETRYCOLLECTION EMPTY, closed lines →
    // MULTIPOINT EMPTY, members parenthesized
    assert(stBoundary(sq) == "LINESTRING (0 0, 0 4, 4 4, 4 0, 0 0)")
    assert(stBoundary(donut).startsWith("MULTILINESTRING"))
    assert(stBoundary(line) == "MULTIPOINT ((0 0), (3 4))")
    assert(stBoundary("LINESTRING (0 0, 1 0, 1 1, 0 0)") == "MULTIPOINT EMPTY")
    assert(stBoundary("POINT (1 1)") == "GEOMETRYCOLLECTION EMPTY")
    // two open lines sharing one endpoint: the shared point cancels (mod 2)
    val shared = stBoundary("MULTILINESTRING ((0 0, 1 1), (1 1, 2 0))")
    assert(shared == "MULTIPOINT ((0 0), (2 0))", shared)
  }

  test("SQL surface: registration incl. reference spellings and st_distance dispatch") {
    val spark = TestSession.spark
    Tables.register(spark, TestSession.sf)
    val r = spark.sql(
      """SELECT
        |  st_geometry_type('POINT (1 2)') AS t,
        |  ST_GeometryType('LINESTRING (0 0, 1 1)') AS t2,
        |  st_distance(st_point(0, 0), st_point(3, 4)) AS d_struct,
        |  st_distance('POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))',
        |              'POLYGON ((7 0, 9 0, 9 2, 7 2, 7 0))') AS d_wkt,
        |  ST_ConvexHull('MULTIPOINT (0 0, 4 0, 0 4, 4 4, 2 2)') AS hull,
        |  st_is_valid('POLYGON ((0 0, 2 2, 2 0, 0 2, 0 0))') AS v,
        |  ST_Touches('POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))',
        |             'POLYGON ((1 0, 2 0, 2 1, 1 1, 1 0))') AS touches
        |""".stripMargin).collect().head
    assert(r.getString(0) == "ST_Point" && r.getString(1) == "ST_LineString")
    assert(r.getDouble(2) == 5.0)
    assert(r.getDouble(3) == 3.0)
    assert(GeometryFns.area(r.getString(4)) == 16.0)
    assert(!r.getBoolean(5) && r.getBoolean(6))
  }

  test("geometry_to_bing_tiles: every returned tile intersects; centroid tile included") {
    import graft.functions.GeometryFns
    val poly = "POLYGON ((-0.5 -0.5, 0.5 -0.5, 0.5 0.5, -0.5 0.5, -0.5 -0.5))"
    val zoom = 10
    val tiles = GeometryFns.geometryToBingTiles(poly, zoom)
    // (0,0) sits on a 4-tile corner: the cover must span multiple tiles
    assert(tiles.length >= 4, s"expected a multi-tile cover, got ${tiles.length}")
    assert(tiles.distinct.length == tiles.length)
    for (t <- tiles) {
      assert(GeometryFns.tileZoom(t) == zoom)
      assert(GeometryFns.stIntersects(GeometryFns.tilePolygon(t), poly),
        s"tile ${GeometryFns.quadKey(t)} does not intersect")
    }
    assert(tiles.contains(GeometryFns.bingTileAt(0.01, 0.01, zoom)),
      "tile containing an interior point must be in the cover")
    // a point maps to exactly its own tile
    val pt = GeometryFns.geometryToBingTiles("POINT (10 20)", 12)
    assert(pt.length == 1 && pt.head == GeometryFns.bingTileAt(20, 10, 12))
  }

  test("wave 9: full WKT surface — reference test vectors verbatim") {
    import graft.functions.{GeometryExtras => GE, GeometryFns => GF}
    // parse/render all seven types + EMPTY forms (TestGeoFunctions)
    assert(GE.canonicalWkt("MULTIPOINT (1 2, 3 4)") == "MULTIPOINT ((1 2), (3 4))")
    assert(GE.canonicalWkt("GEOMETRYCOLLECTION(MULTIPOINT(0 0, 1 1))") ==
      "GEOMETRYCOLLECTION (MULTIPOINT ((0 0), (1 1)))")
    assert(GE.canonicalWkt("POINT EMPTY") == "POINT EMPTY")
    // accessors over multis/collections/empties (reference expectations)
    assert(GF.numPoints(
      "GEOMETRYCOLLECTION (POINT (1 2), LINESTRING (8 4, 5 7), POLYGON EMPTY)") == 3L)
    assert(GF.numPoints(
      "MULTIPOLYGON (((1 1, 1 3, 3 3, 3 1, 1 1)), ((2 4, 2 6, 6 6, 6 4, 2 4)))") == 8L)
    assert(GE.stGeometryN("MULTIPOINT EMPTY", 1) == null)
    assert(GE.stGeometries("GEOMETRYCOLLECTION (POINT (2 3), LINESTRING (2 3, 3 4))")
      .toSeq == Seq("POINT (2 3)", "LINESTRING (2 3, 3 4)"))
    assert(GE.stEnvelope("MULTIPOINT (1 2, 2 4, 3 6, 4 8)") ==
      "POLYGON ((1 2, 1 8, 4 8, 4 2, 1 2))")
    assert(GE.envelopeCoord("POLYGON EMPTY", "xmax") == null)
    assert(GE.stLength("MULTILINESTRING ((1 1, 5 1), (2 4, 4 4))") == 6.0)
    // point-set and line-arrangement set operations (testSTIntersection/
    // Difference/SymDifference — exact reference values)
    assert(GE.pointDifference(GE.parseGeo("MULTIPOINT (50 100, 50 200)"),
      GE.parseGeo("POINT (50 100)")) == "POINT (50 200)")
    assert(GE.lineIntersection(GE.parseGeo("MULTILINESTRING ((1 1, 5 1), (2 4, 4 4))"),
      GE.parseGeo("MULTILINESTRING ((3 4, 6 4), (5 0, 5 4))")) ==
      "GEOMETRYCOLLECTION (POINT (5 1), LINESTRING (3 4, 4 4))")
    assert(GE.lineDifference(GE.parseGeo("MULTILINESTRING ((1 1, 5 1), (2 4, 4 4))"),
      GE.parseGeo("MULTILINESTRING ((2 1, 4 1), (3 3, 7 3))")) ==
      "MULTILINESTRING ((1 1, 2 1), (4 1, 5 1), (2 4, 4 4))")
    assert(GE.lineSymDifference(GE.parseGeo("LINESTRING (50 100, 50 200)"),
      GE.parseGeo("LINESTRING (50 50, 50 150)")) ==
      "MULTILINESTRING ((50 50, 50 100), (50 150, 50 200))")
    assert(GE.polyLineIntersection(
      Seq(GF.parsePolygon("POLYGON ((0 0, 0 1, 1 1, 1 0, 0 0))")),
      GE.parseGeo("LINESTRING (0 0, 1 -1, 1 2)")) ==
      "GEOMETRYCOLLECTION (POINT (0 0), LINESTRING (1 0, 1 1))")
    // distance over multis; NULL against empties
    assert(math.abs(GE.distanceWkt("MULTILINESTRING ((1 1, 5 1), (2 4, 4 4))",
      "LINESTRING (10 20, 20 50)") - 17.08800749063506) < 1e-12)
    assert(GE.distanceWkt("POINT EMPTY", "POINT (150 150)") == null)
    // buffer edges: EMPTY → NULL, +Infinity → POLYGON EMPTY
    assert(GF.stBuffer("POINT EMPTY", 1.0) == null)
    assert(GF.stBuffer("POINT (0 0)", Double.PositiveInfinity) == "POLYGON EMPTY")
  }

  test("to_spherical_geography validates lon/lat; to_geometry round-trips") {
    import graft.functions.GeometryFns
    val w = "POLYGON ((10 10, 20 10, 20 20, 10 20, 10 10))"
    assert(GeometryFns.toSphericalGeography(w) == GeometryFns.geometryFromText(w))
    intercept[IllegalArgumentException] {
      GeometryFns.toSphericalGeography("POINT (200 0)")
    }
    intercept[IllegalArgumentException] {
      GeometryFns.toSphericalGeography("POINT (0 91)")
    }
  }
}

/** Exposes the package-private general distance for the spec. */
object GeometryExtrasTestAccess {
  def dist(a: String, b: String): Double =
    graft.functions.GeometryExtras.distanceWkt(a, b)
}
