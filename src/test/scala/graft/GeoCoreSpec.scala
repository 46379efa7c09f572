package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.geo._

class GeoCoreSpec extends AnyFunSuite {

  // --- WKB ---
  test("WKB point roundtrip") {
    val (x, y) = Wkb.readPoint(Wkb.writePoint(7.42, 43.73))
    assert(x == 7.42 && y == 43.73)
  }

  test("WKB polygon containsPoint: unit square") {
    val sq = Wkb.box(0, 0, 1, 1)
    assert(Wkb.containsPoint(sq, 0.5, 0.5))
    assert(!Wkb.containsPoint(sq, 1.5, 0.5))
    assert(!Wkb.containsPoint(sq, -0.1, 0.5))
  }

  test("WKB polygon with hole") {
    val rings = Array(
      Array[Double](0, 0, 10, 0, 10, 10, 0, 10, 0, 0),
      Array[Double](4, 4, 6, 4, 6, 6, 4, 6, 4, 4))
    val p = Wkb.writePolygon(rings)
    assert(Wkb.containsPoint(p, 2, 2))
    assert(!Wkb.containsPoint(p, 5, 5)) // in the hole
    assert(Wkb.containsPoint(p, 7, 7))
  }

  test("WKB multipolygon") {
    val mp = Wkb.writeMultiPolygon(Array(
      Array(Array[Double](0, 0, 1, 0, 1, 1, 0, 1, 0, 0)),
      Array(Array[Double](5, 5, 6, 5, 6, 6, 5, 6, 5, 5))))
    assert(Wkb.containsPoint(mp, 0.5, 0.5))
    assert(Wkb.containsPoint(mp, 5.5, 5.5))
    assert(!Wkb.containsPoint(mp, 3, 3))
    assert(Wkb.envelope(mp) == ((0.0, 0.0, 6.0, 6.0)))
  }

  test("EWKB SRID flag: payload skipped; ISO/EWKB Z rejected with a clear error") {
    import java.nio.{ByteBuffer, ByteOrder}
    // EWKB polygon, SRID flag set (0x20000003), SRID 4326, unit square
    val plain = Wkb.box(0, 0, 1, 1)
    val ewkb = ByteBuffer.allocate(plain.length + 4).order(ByteOrder.LITTLE_ENDIAN)
    ewkb.put(1.toByte).putInt(0x20000003).putInt(4326)
      .put(java.util.Arrays.copyOfRange(plain, 5, plain.length))
    val bytes = ewkb.array()
    assert(Wkb.geomType(bytes) == Wkb.Polygon)
    assert(Wkb.containsPoint(bytes, 0.5, 0.5) && !Wkb.containsPoint(bytes, 1.5, 0.5))
    assert(Wkb.envelope(bytes) == ((0.0, 0.0, 1.0, 1.0)))
    // ISO PolygonZ (1003): base type still resolves, strict readers refuse
    val isoZ = ByteBuffer.allocate(plain.length).order(ByteOrder.LITTLE_ENDIAN)
    isoZ.put(1.toByte).putInt(1003)
      .put(java.util.Arrays.copyOfRange(plain, 5, plain.length))
    assert(Wkb.geomType(isoZ.array()) == Wkb.Polygon)
    val e = intercept[IllegalArgumentException] {
      Wkb.containsPoint(isoZ.array(), 0.5, 0.5)
    }
    assert(e.getMessage.contains("Z/M"))
  }

  test("WKT parse/emit roundtrip") {
    val wkb = Wkt.parse("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), (1 1, 2 1, 2 2, 1 2, 1 1))")
    val polys = Wkb.readPolygons(wkb)
    assert(polys.length == 1 && polys(0).length == 2)
    assert(Wkb.containsPoint(wkb, 3, 3))
    assert(!Wkb.containsPoint(wkb, 1.5, 1.5))
    val mp = Wkt.parse("MULTIPOLYGON (((0 0, 1 0, 1 1, 0 0)), ((9 9, 10 9, 10 10, 9 9)))")
    assert(Wkb.readPolygons(mp).length == 2)
    val pt = Wkt.parse("POINT (7.42 43.73)")
    assert(Wkb.readPoint(pt) == ((7.42, 43.73)))
  }

  // --- bbox predicate (strict inequalities, P1 parity) ---
  test("bbox strict-overlap excludes touching boxes") {
    // touching at x=1 → NOT overlapping under strict semantics
    assert(!Geo.bboxOverlapsStrict(0, 0, 1, 1, 1, 0, 2, 1))
    assert(Geo.bboxOverlapsStrict(0, 0, 1.001, 1, 1, 0, 2, 1))
  }

  // --- Cell index ---
  test("cell prefix rule: parent(encode(p,r2),r1) == encode(p,r1)") {
    val pts = Seq((43.7312, 7.4165), (-33.86, 151.2), (0.0, 0.0), (89.9, -179.9), (-89.9, 179.9))
    for ((lat, lng) <- pts; r2 <- Seq(8, 12, 20, 29); r1 <- Seq(0, 3, 5, 8) if r1 <= r2) {
      assert(Cell.parent(Cell.encode(lat, lng, r2), r1) == Cell.encode(lat, lng, r1),
        s"prefix rule failed at ($lat,$lng) r1=$r1 r2=$r2")
    }
  }

  test("cell xy roundtrip and bounds contain the point") {
    val pts = Seq((43.7312, 7.4165), (-33.86, 151.2), (51.5, -0.1))
    for ((lat, lng) <- pts; r <- Seq(4, 10, 16)) {
      val c = Cell.encode(lat, lng, r)
      assert(Cell.resolution(c) == r)
      val (xmin, ymin, xmax, ymax) = Cell.boundsOf(c)
      assert(lng >= xmin && lng < xmax, s"lng $lng not in [$xmin,$xmax)")
      assert(lat >= ymin && lat < ymax)
      // re-encoding the center lands on the same cell
      assert(Cell.encode((ymin + ymax) / 2, (xmin + xmax) / 2, r) == c)
    }
  }

  test("kRing sizes and ring decomposition") {
    val c = Cell.encode(43.73, 7.42, 10)
    assert(Cell.kRing(c, 0).toSeq == Seq(c))
    assert(Cell.kRing(c, 1).length == 9)
    assert(Cell.kRing(c, 2).length == 25)
    assert(Cell.ring(c, 1).length == 8)
    assert(Cell.ring(c, 2).length == 16)
    // polar clamp: fewer cells near the pole
    val polar = Cell.encode(89.99, 0.0, 10)
    assert(Cell.kRing(polar, 1).length == 6) // top row clipped
  }

  test("coverBBox covers exactly the encoded cells of interior points") {
    val cells = Cell.coverBBox(7.41, 43.73, 7.43, 43.74, 12).toSet
    assert(cells.contains(Cell.encode(43.735, 7.42, 12)))
    // a point well outside is not covered
    assert(!cells.contains(Cell.encode(44.5, 7.42, 12)))
    // every cover cell's bounds overlap the bbox
    cells.foreach { c =>
      val (xmin, ymin, xmax, ymax) = Cell.boundsOf(c)
      assert(xmin < 7.43 && xmax > 7.41 && ymin < 43.74 && ymax > 43.73)
    }
  }

  test("coverGeometry is conservative: contains every cell holding an inside point") {
    // triangle
    val tri = Wkt.parse("POLYGON ((0 0, 10 0, 5 8, 0 0))")
    val res = 12
    val cover = Cell.coverGeometry(tri, res).toSet
    val rnd = new scala.util.Random(7)
    (1 to 500).foreach { _ =>
      val x = rnd.nextDouble() * 10; val y = rnd.nextDouble() * 8
      if (Wkb.containsPoint(tri, x, y))
        assert(cover.contains(Cell.encode(y, x, res)), s"cover misses cell of inside point ($x,$y)")
    }
    // cover is smaller than the full bbox cover (it prunes corners)
    val bboxCover = Cell.coverBBox(0, 0, 10, 8, res)
    assert(cover.size < bboxCover.length)
  }

  // --- Hilbert ---
  test("hilbert curve is a bijection on a small grid and locality-preserving") {
    val order = 4
    val n = 1 << order
    val ds = for (x <- 0 until n; y <- 0 until n) yield Hilbert.xy2d(order, x, y)
    assert(ds.toSet.size == n * n)
    assert(ds.min == 0 && ds.max == n * n - 1)
    // adjacent curve positions are adjacent cells (property of Hilbert curves)
    val pos = (for (x <- 0 until n; y <- 0 until n) yield (Hilbert.xy2d(order, x, y), (x, y))).toMap
    (0 until n * n - 1).foreach { d =>
      val (x1, y1) = pos(d); val (x2, y2) = pos(d + 1)
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1, s"jump at d=$d")
    }
  }

  // --- Tile math ---
  test("tile xy matches known slippy-map anchors") {
    // lng 0, lat 0 at zoom 1 → tile (1, 1) boundary; zoom 0 → (0,0)
    assert(Tile.tileX(0.0, 0) == 0 && Tile.tileY(0.0, 0) == 0)
    assert(Tile.tileX(0.0, 1) == 1 && Tile.tileY(0.0, 1) == 1)
    // London ~ (-0.1, 51.5) at z=10 → x=511, y=340 (known value)
    assert(Tile.tileX(-0.1, 10) == 511)
    assert(Tile.tileY(51.5, 10) == 340)
    // roundtrip: point inside its tile's bbox
    val (lngMin, latMin, lngMax, latMax) = Tile.tileBBox(511, 340, 10)
    assert(-0.1 >= lngMin && -0.1 < lngMax && 51.5 > latMin && 51.5 <= latMax)
  }

  // --- Geohash ---
  test("geohash decode matches known cells; encode/decode agree") {
    // "u" covers lng [0,45], lat [45,90]; standard base32
    val (lngMin, latMin, lngMax, latMax) = Geohash.decodeBBox("u")
    assert(lngMin == 0.0 && lngMax == 45.0 && latMin == 45.0 && latMax == 90.0)
    // ezs42 is the canonical example cell containing (42.605, -5.603)
    val (a, b, c, d) = Geohash.decodeBBox("ezs42")
    assert(-5.603 >= a && -5.603 <= c && 42.605 >= b && 42.605 <= d)
    val gh = Geohash.encode(42.605, -5.603, 5)
    assert(gh == "ezs42")
  }

  // --- haversine ---
  test("haversine known distances") {
    assert(Geo.haversineM(0, 0, 0, 0) == 0.0)
    // 1 degree of longitude at the equator ≈ 111.19 km
    val d = Geo.haversineM(0, 0, 0, 1)
    assert(math.abs(d - 111195.0) < 200.0, s"got $d")
    // symmetric
    assert(Geo.haversineM(51.5, -0.1, 48.85, 2.35) == Geo.haversineM(48.85, 2.35, 51.5, -0.1))
  }
}
