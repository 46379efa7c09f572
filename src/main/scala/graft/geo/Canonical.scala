package graft.geo

import java.security.MessageDigest

/** F6 parity: canonical geometry form + hash for cache keys.
  *
  * Reference algorithm (overturemaestro/data_downloader.py:967-1023):
  *  - orient every ring CCW (holes too, after orient the polygon is
  *    normalized with exterior CCW / interiors CW via shapely's
  *    `orient(polygon)` — we reproduce exterior CCW, holes CW);
  *  - rotate each ring's start point to the lexicographically smallest
  *    (x, y) coordinate;
  *  - round coordinates to 7 decimals;
  *  - sort multipolygon parts by centroid;
  *  - sha256 of the resulting WKT.
  */
object Canonical {

  def sha256Hex(s: String): String =
    MessageDigest.getInstance("SHA-256").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  private def round7(d: Double): Double =
    BigDecimal(d).setScale(7, BigDecimal.RoundingMode.HALF_EVEN).toDouble

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

  private def canonicalRing(r: Array[Double], ccw: Boolean): Array[Double] = {
    val rounded = r.map(round7)
    val oriented =
      if (signedArea(rounded) > 0 == ccw) rounded else reverse(rounded)
    rotateToMin(oriented)
  }

  private def centroid(rings: Array[Array[Double]]): (Double, Double) = {
    // vertex centroid of the outer ring (stable, cheap; used only as a sort key)
    val r = rings(0)
    val n = r.length / 2 - 1
    var sx = 0.0; var sy = 0.0
    for (i <- 0 until n) { sx += r(2 * i); sy += r(2 * i + 1) }
    (sx / n, sy / n)
  }

  /** Canonical WKT of an areal (or point) WKB geometry. */
  def canonicalWkt(wkb: Array[Byte]): String = {
    if (Wkb.geomType(wkb) == Wkb.Point) {
      val (x, y) = Wkb.readPoint(wkb)
      return Wkt.emitPoint(round7(x), round7(y))
    }
    val polys = Wkb.readPolygons(wkb).map { rings =>
      rings.zipWithIndex.map { case (r, i) =>
        canonicalRing(r, ccw = i == 0) // exterior CCW, holes CW
      }
    }
    val sorted = polys.sortBy { rings => centroid(rings) }
    if (sorted.length == 1) Wkt.emitPolygon(sorted(0))
    else Wkt.emitMultiPolygon(sorted)
  }

  /** The cache-key geometry hash (full sha256 hex; callers truncate). */
  def geometryHash(wkb: Array[Byte]): String = sha256Hex(canonicalWkt(wkb))
}
