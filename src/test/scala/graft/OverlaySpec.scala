package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.GeometryFns
import graft.functions.PolygonOverlay

/** PolygonOverlay (round 8): the robust split–classify–connect overlay
  * behind st_difference / st_symdifference and the degenerate-contact
  * fallback of st_intersection / st_union. Every case here is one the
  * transversal walk rejects by design: shared edges, shared vertices,
  * vertex-on-edge touches, partial collinear overlap, identical inputs,
  * holes. Checks are closed-form areas (interval arithmetic for
  * rectangles) plus structural assertions on the WKT shape.
  */
class OverlaySpec extends AnyFunSuite {

  private def sq(x1: Double, y1: Double, x2: Double, y2: Double): String =
    s"POLYGON (($x1 $y1, $x2 $y1, $x2 $y2, $x1 $y2, $x1 $y1))"

  private def a(wkt: String): Double = GeometryFns.area(wkt)
  private val eps = 1e-6

  // ── shared full edge ─────────────────────────────────────────────────

  test("side-by-side squares sharing a full edge: union merges, intersection empty") {
    val A = sq(0, 0, 1, 1); val B = sq(1, 0, 2, 1)
    val u = GeometryFns.stUnion(A, B)
    assert(u.startsWith("POLYGON"), s"shared-edge union must be one polygon: $u")
    assert(math.abs(a(u) - 2.0) < eps)
    assert(GeometryFns.stIntersection(A, B) == "POLYGON EMPTY",
      "areal intersection of edge-adjacent squares is empty")
    assert(math.abs(a(GeometryFns.stDifference(A, B)) - 1.0) < eps)
    assert(math.abs(a(GeometryFns.stSymDifference(A, B)) - 2.0) < eps)
  }

  test("partial collinear overlap: offset squares sharing half an edge") {
    val A = sq(0, 0, 1, 1); val B = sq(1, 0.5, 2, 1.5)
    val u = GeometryFns.stUnion(A, B)
    assert(u.startsWith("POLYGON") && !u.startsWith("MULTIPOLYGON"),
      s"half-shared-edge union is connected: $u")
    assert(math.abs(a(u) - 2.0) < eps)
    assert(GeometryFns.stIntersection(A, B) == "POLYGON EMPTY")
    assert(math.abs(a(GeometryFns.stDifference(A, B)) - 1.0) < eps)
  }

  // ── shared vertex / vertex-on-edge ───────────────────────────────────

  test("corner-touching squares: union is a two-part MULTIPOLYGON") {
    val A = sq(0, 0, 1, 1); val B = sq(1, 1, 2, 2)
    val u = GeometryFns.stUnion(A, B)
    assert(u.startsWith("MULTIPOLYGON"),
      s"corner touch must not pinch one ring through the node: $u")
    assert(math.abs(a(u) - 2.0) < eps)
    assert(GeometryFns.stIntersection(A, B) == "POLYGON EMPTY")
    assert(math.abs(a(GeometryFns.stDifference(A, B)) - 1.0) < eps)
  }

  test("triangle apex touching a square edge from outside") {
    val A = sq(0, 0, 4, 4)
    val B = "POLYGON ((2 4, 3 6, 1 6, 2 4))" // apex ON A's top edge
    val u = GeometryFns.stUnion(A, B)
    assert(u.startsWith("MULTIPOLYGON"), s"point contact stays two parts: $u")
    assert(math.abs(a(u) - 18.0) < eps) // 16 + 2
    assert(GeometryFns.stIntersection(A, B) == "POLYGON EMPTY")
  }

  // ── identical and nested-with-shared-boundary inputs ─────────────────

  test("identical polygons: union = intersection = input, differences empty") {
    val A = "POLYGON ((0 0, 4 0, 4 3, 1 2, 0 3, 0 0))"
    assert(math.abs(a(GeometryFns.stUnion(A, A)) - a(A)) < eps)
    assert(math.abs(a(GeometryFns.stIntersection(A, A)) - a(A)) < eps)
    assert(GeometryFns.stDifference(A, A) == "POLYGON EMPTY")
    assert(GeometryFns.stSymDifference(A, A) == "POLYGON EMPTY")
  }

  test("notch glued inside an edge: containment with shared boundary") {
    val A = sq(0, 0, 4, 4)
    val B = sq(0, 1, 1, 3) // inside A, sharing part of A's left edge
    assert(math.abs(a(GeometryFns.stUnion(A, B)) - 16.0) < eps)
    assert(math.abs(a(GeometryFns.stIntersection(A, B)) - 2.0) < eps)
    val d = GeometryFns.stDifference(A, B)
    assert(d.startsWith("POLYGON") && math.abs(a(d) - 14.0) < eps,
      s"A minus an edge-glued notch keeps one simple ring: $d")
    assert(math.abs(a(GeometryFns.stSymDifference(A, B)) - 14.0) < eps)
  }

  test("difference cutting an interior hole") {
    val A = sq(0, 0, 4, 4); val B = sq(1, 1, 3, 3)
    val d = GeometryFns.stDifference(A, B)
    assert(math.abs(a(d) - 12.0) < eps)
    // strictly interior subtrahend => result is an annulus with a hole
    assert(d.startsWith("POLYGON") && d.count(_ == '(') == 3,
      s"interior difference must carry a hole ring: $d")
    assert(!GeometryFns.stContains(d, "POINT (2 2)"))
    assert(GeometryFns.stContains(d, "POINT (0.5 2)"))
  }

  // ── holes in the inputs ──────────────────────────────────────────────

  test("polygon with a hole vs the exact hole filler") {
    val A = "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), (1 1, 3 1, 3 3, 1 3, 1 1))"
    val B = sq(1, 1, 3, 3)
    val u = GeometryFns.stUnion(A, B)
    assert(math.abs(a(u) - 16.0) < eps, s"filler plugs the hole exactly: $u")
    assert(u.count(_ == '(') == 2, s"hole must vanish from the union: $u")
    assert(GeometryFns.stIntersection(A, B) == "POLYGON EMPTY")
    assert(math.abs(a(GeometryFns.stDifference(A, B)) - 12.0) < eps)
  }

  test("polygon with a hole vs a square overlapping hole and solid") {
    val A = "POLYGON ((0 0, 6 0, 6 6, 0 6, 0 0), (2 2, 4 2, 4 4, 2 4, 2 2))"
    val B = sq(3, 3, 5, 5) // one quadrant in the hole, rest on solid
    assert(math.abs(a(GeometryFns.stUnion(A, B)) - (32.0 + 1.0)) < eps)
    assert(math.abs(a(GeometryFns.stIntersection(A, B)) - 3.0) < eps)
    assert(math.abs(a(GeometryFns.stDifference(A, B)) - 29.0) < eps)
    assert(math.abs(a(GeometryFns.stDifference(B, A)) - 1.0) < eps)
  }

  test("disjoint component nested inside the other operand's hole") {
    val A = "POLYGON ((0 0, 6 0, 6 6, 0 6, 0 0), (1 1, 5 1, 5 5, 1 5, 1 1))"
    val B = sq(2, 2, 3, 3) // strictly inside A's hole
    val u = GeometryFns.stUnion(A, B)
    assert(u.startsWith("MULTIPOLYGON"), s"island in a hole stays separate: $u")
    assert(math.abs(a(u) - (20.0 + 1.0)) < eps)
    assert(GeometryFns.stIntersection(A, B) == "POLYGON EMPTY")
    assert(math.abs(a(GeometryFns.stDifference(A, B)) - 20.0) < eps)
  }

  // ── parity with the transversal fast paths ───────────────────────────

  test("overlay agrees with the transversal walk on the concave corpus pairs") {
    val la = "POLYGON ((0 0, 6 0, 6 2, 2 2, 2 6, 0 6, 0 0))"
    val lb = "POLYGON ((1 1, 7 1, 7 5, 5 5, 5 3, 1 3, 1 1))"
    val ua = "POLYGON ((0 0, 9 0, 9 6, 6 6, 6 2, 3 2, 3 6, 0 6, 0 0))"
    val ub = "POLYGON ((0.5 3, 8.5 3, 8.5 9, 5.5 9, 5.5 5, 3.5 5, 3.5 9, 0.5 9, 0.5 3))"
    for ((x, y) <- Seq((la, lb), (ua, ub))) {
      val fast = a(GeometryFns.stIntersection(x, y))
      val robust = PolygonOverlay.totalArea(PolygonOverlay.overlay(
        Seq(GeometryFns.parsePolygon(x)), Seq(GeometryFns.parsePolygon(y)),
        PolygonOverlay.OpIntersection))
      assert(math.abs(fast - robust) < eps, s"intersection parity: $fast vs $robust")
      val uFast = a(GeometryFns.stUnion(x, y))
      val uRobust = PolygonOverlay.totalArea(PolygonOverlay.overlay(
        Seq(GeometryFns.parsePolygon(x)), Seq(GeometryFns.parsePolygon(y)),
        PolygonOverlay.OpUnion))
      assert(math.abs(uFast - uRobust) < eps, s"union parity: $uFast vs $uRobust")
      // inclusion–exclusion across the four operations
      val dAB = a(GeometryFns.stDifference(x, y))
      val dBA = a(GeometryFns.stDifference(y, x))
      assert(math.abs(dAB + dBA + fast - uFast) < eps,
        "|A-B| + |B-A| + |A∩B| must equal |A∪B|")
    }
  }

  // ── randomized closed-form sweep: integer rectangles ─────────────────

  test("200 random integer rectangle pairs match interval arithmetic") {
    val rnd = new scala.util.Random(42)
    def rect(): (Int, Int, Int, Int) = {
      val x1 = rnd.nextInt(5); val y1 = rnd.nextInt(5)
      (x1, y1, x1 + 1 + rnd.nextInt(4), y1 + 1 + rnd.nextInt(4))
    }
    var multis = 0; var degenerate = 0
    (1 to 200).foreach { k =>
      val (ax1, ay1, ax2, ay2) = rect(); val (bx1, by1, bx2, by2) = rect()
      val A = sq(ax1, ay1, ax2, ay2); val B = sq(bx1, by1, bx2, by2)
      val iw = math.max(0, math.min(ax2, bx2) - math.max(ax1, bx1))
      val ih = math.max(0, math.min(ay2, by2) - math.max(ay1, by1))
      val aA = (ax2 - ax1).toDouble * (ay2 - ay1)
      val aB = (bx2 - bx1).toDouble * (by2 - by1)
      val aI = iw.toDouble * ih
      if (iw == 0 || ih == 0) degenerate += 1
      val u = GeometryFns.stUnion(A, B)
      if (u.startsWith("MULTIPOLYGON")) multis += 1
      assert(math.abs(a(u) - (aA + aB - aI)) < eps, s"case $k union: $A $B")
      assert(math.abs(a(GeometryFns.stIntersection(A, B)) - aI) < eps,
        s"case $k intersection: $A $B")
      assert(math.abs(a(GeometryFns.stDifference(A, B)) - (aA - aI)) < eps,
        s"case $k difference: $A $B")
      assert(math.abs(a(GeometryFns.stSymDifference(A, B)) - (aA + aB - 2 * aI)) < eps,
        s"case $k symdifference: $A $B")
    }
    // integer grids must exercise the degenerate paths, not dodge them
    assert(degenerate > 10, s"expected edge/corner contacts, got $degenerate")
    assert(multis > 10, s"expected disjoint/touching MULTIPOLYGON unions, got $multis")
  }

  // ── ST_Buffer beyond points ──────────────────────────────────────────

  private def gonArea(r: Double): Double =
    0.5 * GeometryFns.BufferSegments * r * r *
      math.sin(2 * math.Pi / GeometryFns.BufferSegments)

  test("straight linestring buffer has the closed form 2rL + gonArea") {
    for ((l, r) <- Seq((6.0, 1.0), (3.0, 0.5), (10.0, 2.0))) {
      val b = GeometryFns.stBuffer(s"LINESTRING (0 0, $l 0)", r)
      assert(math.abs(a(b) - (2 * r * l + gonArea(r))) < eps,
        s"straight buffer L=$l r=$r: ${a(b)}")
    }
  }

  test("right-angle linestring buffer: 2r(L1+L2) - r^2 + 1.25·gonArea") {
    val (l1, l2, r) = (5.0, 3.0, 1.0)
    val b = GeometryFns.stBuffer(s"LINESTRING (0 0, $l1 0, $l1 $l2)", r)
    val expect = 2 * r * (l1 + l2) - r * r + 1.25 * gonArea(r)
    assert(math.abs(a(b) - expect) < eps, s"elbow buffer: ${a(b)} vs $expect")
  }

  test("square buffer: s^2 + 4sr + gonArea; probes land inside/outside") {
    val (s, r) = (10.0, 1.5)
    val b = GeometryFns.stBuffer(sq(0, 0, s, s), r)
    assert(math.abs(a(b) - (s * s + 4 * s * r + gonArea(r))) < eps)
    assert(GeometryFns.stContains(b, "POINT (5 -1.4)"))   // inside the rim
    assert(!GeometryFns.stContains(b, "POINT (-1.2 -1.2)")) // beyond the corner arc
    assert(GeometryFns.stContains(b, "POINT (5 5)"))
  }

  test("buffering a holed polygon erodes the hole to the closed form") {
    val A = "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (3 3, 7 3, 7 7, 3 7, 3 3))"
    val r = 1.0
    val b = GeometryFns.stBuffer(A, r)
    // outward shell: 100 + 40r + gon; hole erodes to (4-2r)^2 with sharp
    // corners (the corner discs never reach the eroded square)
    val expect = 100.0 + 40 * r + gonArea(r) - (4 - 2 * r) * (4 - 2 * r)
    assert(math.abs(a(b) - expect) < eps, s"holed buffer: ${a(b)} vs $expect")
    assert(b.count(_ == '(') == 3, s"eroded hole must survive: ${b.take(60)}…")
    assert(!GeometryFns.stContains(b, "POINT (5 5)")) // still in the hole
    assert(GeometryFns.stContains(b, "POINT (3.5 3.5)")) // rim coverage
  }

  test("negative buffer erodes: square corners stay sharp, holes grow rounded") {
    val (s, r) = (10.0, 1.5)
    val e = GeometryFns.stBuffer(sq(0, 0, s, s), -r)
    assert(math.abs(a(e) - (s - 2 * r) * (s - 2 * r)) < eps,
      s"square erosion is the exact inner square: ${a(e)}")
    // holed polygon: outer shrinks sharp, hole grows by r with gon-rounded
    // corners => (s-2r)^2 - h^2 - 4hr - gonArea(r)
    val A = "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (3 3, 7 3, 7 7, 3 7, 3 3))"
    val eh = GeometryFns.stBuffer(A, -1.0)
    val expect = 8.0 * 8.0 - 16.0 - 16.0 - gonArea(1.0)
    assert(math.abs(a(eh) - expect) < eps, s"holed erosion: ${a(eh)} vs $expect")
    assert(eh.count(_ == '(') == 3, "the hole survives erosion")
    // erosion past the in-radius vanishes
    assert(GeometryFns.stBuffer(sq(0, 0, 2, 2), -1.0) == "POLYGON EMPTY")
    // zero-area geometries erode to empty
    assert(GeometryFns.stBuffer("LINESTRING (0 0, 5 0)", -0.5) == "POLYGON EMPTY")
    assert(GeometryFns.stBuffer("POINT (1 1)", -0.5) == "POLYGON EMPTY")
    // round trip: dilate then erode a convex polygon returns ~the original
    val rt = GeometryFns.stBuffer(GeometryFns.stBuffer(sq(0, 0, 8, 8), 2.0), -2.0)
    assert(math.abs(a(rt) - 64.0) < 0.7,
      s"open-then-close round trip stays near the original: ${a(rt)}")
  }

  test("buffer swallows a hole smaller than the distance") {
    val A = "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (4 4, 6 4, 6 6, 4 6, 4 4))"
    val b = GeometryFns.stBuffer(A, 1.5)
    assert(b.count(_ == '(') == 2, s"hole of in-radius 1 vanishes at r=1.5: ${b.take(60)}…")
    assert(GeometryFns.stContains(b, "POINT (5 5)"))
  }
}
