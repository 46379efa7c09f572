package graft.geo

import java.security.MessageDigest

/** F6 parity: canonical geometry form + hash for cache keys.
  *
  * Exact mirror of the reference's `_get_oriented_geometry_filter` +
  * `_generate_geometry_hash` (overturemaestro/data_downloader.py:967-1023):
  *  - EVERY ring (exterior AND holes) oriented CCW (`is_ccw` ⇔ signed
  *    area > 0; reversed otherwise);
  *  - each ring rotated to start at its lexicographically smallest (x, y)
  *    vertex — chosen on the RAW coordinates, matching the reference's
  *    `min(perimeter)` before rounding;
  *  - coordinates rounded to 7 decimals (round-half-even, same as Python
  *    `round`) when the canonical ring is emitted;
  *  - interior rings sorted by the (rounded) ring's LINE centroid
  *    (length-weighted — shapely `LinearRing.centroid`), x then y;
  *  - multipolygon parts sorted by the (rounded) polygon's AREA centroid
  *    (holes subtracted — shapely `Polygon.centroid`), x then y;
  *  - WKT emitted in shapely `wkt.dumps` format (fixed 16 decimal places)
  *    and sha256-hashed; callers take the first 8 hex chars.
  *
  * Byte-for-byte parity with the reference's pinned cache-path hashes is
  * asserted in CanonicalParitySpec (tests/base/test_cli.py fixtures).
  */
object Canonical {

  def sha256Hex(s: String): String =
    MessageDigest.getInstance("SHA-256").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  private def round7(d: Double): Double =
    // EXACT-binary rounding (Python round()'s semantics): scala
    // BigDecimal(d) goes through the shortest decimal repr, which turns
    // e.g. 1.4999…e-7 (the binary value of the literal 1.5e-7) into the
    // string "1.5E-7" and then HALF_EVENs the WRONG tie — diverging from
    // the reference's rounding and breaking F6 hash parity
    new java.math.BigDecimal(d)
      .setScale(7, java.math.RoundingMode.HALF_EVEN).doubleValue()

  /** Signed area (shoelace); > 0 ⇔ CCW. Ring is closed (first == last). */
  private def signedArea(r: Array[Double]): Double = {
    var a = 0.0
    val n = r.length / 2 - 1
    var i = 0
    while (i < n) {
      a += r(2 * i) * r(2 * i + 3) - r(2 * i + 2) * r(2 * i + 1)
      i += 1
    }
    a / 2
  }

  private def reverse(r: Array[Double]): Array[Double] = {
    val n = r.length / 2
    val out = new Array[Double](r.length)
    for (i <- 0 until n) {
      out(2 * i) = r(2 * (n - 1 - i))
      out(2 * i + 1) = r(2 * (n - 1 - i) + 1)
    }
    out
  }

  /** Rotate a closed ring so it starts at its minimum (x, y) vertex. */
  private def rotateToMin(r: Array[Double]): Array[Double] = {
    val n = r.length / 2 - 1 // drop duplicate closing vertex while rotating
    var best = 0
    for (i <- 1 until n) {
      val cmp = java.lang.Double.compare(r(2 * i), r(2 * best)) match {
        case 0 => java.lang.Double.compare(r(2 * i + 1), r(2 * best + 1))
        case c => c
      }
      if (cmp < 0) best = i
    }
    val out = new Array[Double]((n + 1) * 2)
    for (i <- 0 to n) {
      val src = (best + i) % n
      out(2 * i) = r(2 * src)
      out(2 * i + 1) = r(2 * src + 1)
    }
    out
  }

  /** Reference ring canonicalization: orient CCW (raw), rotate to the raw
    * min vertex, round to 7 decimals at emit. */
  private def canonicalRing(r: Array[Double]): Array[Double] = {
    val oriented = if (signedArea(r) > 0) r else reverse(r)
    rotateToMin(oriented).map(round7)
  }

  /** Length-weighted centroid of a closed ring's boundary line —
    * shapely `LinearRing.centroid` (the reference's interior-ring sort key). */
  private[geo] def lineCentroid(r: Array[Double]): (Double, Double) = {
    val n = r.length / 2 - 1
    var len = 0.0; var sx = 0.0; var sy = 0.0
    var i = 0
    while (i < n) {
      val x1 = r(2 * i); val y1 = r(2 * i + 1)
      val x2 = r(2 * i + 2); val y2 = r(2 * i + 3)
      val l = math.hypot(x2 - x1, y2 - y1)
      len += l
      sx += (x1 + x2) / 2 * l
      sy += (y1 + y2) / 2 * l
      i += 1
    }
    if (len == 0) (r(0), r(1)) else (sx / len, sy / len)
  }

  /** Area centroid of a polygon with holes — shapely `Polygon.centroid`
    * (the reference's multipolygon part sort key). Orientation-invariant:
    * moments are normalized by each ring's signed area's sign; holes
    * subtract. */
  private[geo] def areaCentroid(rings: Array[Array[Double]]): (Double, Double) = {
    var aNet = 0.0; var mx = 0.0; var my = 0.0
    rings.zipWithIndex.foreach { case (r, idx) =>
      val n = r.length / 2 - 1
      var a = 0.0; var cx = 0.0; var cy = 0.0
      var i = 0
      while (i < n) {
        val x1 = r(2 * i); val y1 = r(2 * i + 1)
        val x2 = r(2 * i + 2); val y2 = r(2 * i + 3)
        val cross = x1 * y2 - x2 * y1
        a += cross
        cx += (x1 + x2) * cross
        cy += (y1 + y2) * cross
        i += 1
      }
      val sign = if (a < 0) -1.0 else 1.0
      val w = if (idx == 0) 1.0 else -1.0 // exterior adds, holes subtract
      aNet += w * sign * a / 2
      mx += w * sign * cx / 6
      my += w * sign * cy / 6
    }
    if (aNet == 0) lineCentroid(rings(0)) else (mx / aNet, my / aNet)
  }

  private def canonicalPolygon(rings: Array[Array[Double]]): Array[Array[Double]] = {
    val exterior = canonicalRing(rings(0))
    val interiors = rings.drop(1).map(canonicalRing)
      .sortBy(r => lineCentroid(r))
    exterior +: interiors
  }

  /** Canonical form of an areal (or point) WKB geometry, as the reference's
    * shapely `wkt.dumps` string (fixed 16 decimal places). */
  def canonicalWkt(wkb: Array[Byte]): String = {
    if (Wkb.geomType(wkb) == Wkb.Point) {
      val (x, y) = Wkb.readPoint(wkb)
      return s"POINT (${fmt16(round7(x))} ${fmt16(round7(y))})"
    }
    val polys = Wkb.readPolygons(wkb).map(canonicalPolygon)
    val sorted = polys.sortBy(areaCentroid)
    if (sorted.length == 1) emitPolygon(sorted(0))
    else emitMultiPolygon(sorted)
  }

  // ---- shapely wkt.dumps formatting (trim=False → C printf %.16f) ----

  /** C-printf `%.16f` of the EXACT binary double (what GEOS emits), e.g.
    * 51.498164 → "51.4981640000000027". NOT Java's String.format("%.16f"),
    * which zero-pads the shortest decimal repr instead of expanding the
    * binary value — that mismatch breaks hash parity. */
  private[geo] def fmt16(d: Double): String =
    new java.math.BigDecimal(d)
      .setScale(16, java.math.RoundingMode.HALF_EVEN).toPlainString

  private def ringStr(r: Array[Double]): String = {
    val sb = new StringBuilder("(")
    var i = 0
    while (i < r.length) {
      if (i > 0) sb.append(", ")
      sb.append(fmt16(r(i))).append(' ').append(fmt16(r(i + 1)))
      i += 2
    }
    sb.append(')').toString
  }

  private def emitPolygon(rings: Array[Array[Double]]): String =
    rings.map(ringStr).mkString("POLYGON (", ", ", ")")

  private def emitMultiPolygon(polys: Array[Array[Array[Double]]]): String =
    polys.map(p => p.map(ringStr).mkString("(", ", ", ")"))
      .mkString("MULTIPOLYGON (", ", ", ")")

  /** The cache-key geometry hash (full sha256 hex; callers truncate to 8). */
  def geometryHash(wkb: Array[Byte]): String = sha256Hex(canonicalWkt(wkb))
}
