package graft.geo

/** Pure-scalar geodesy + planar predicates used by the Catalyst expressions.
  *
  * Semantics mirror the reference engine's predicates (see SURVEY.md §2.2):
  *  - bbox overlap uses STRICT inequalities
  *    (reference: overturemaestro/data_downloader.py:831-837)
  *  - exact refinement is an `intersects`-style test; for points vs polygons
  *    we implement exact ray casting (reference uses GEOS STRtree intersects,
  *    overturemaestro/data_downloader.py:1026-1041).
  *
  * Everything here is allocation-free per call so it can run inside
  * whole-stage codegen via static method calls.
  */
object Geo {
  final val EarthRadiusM = 6371008.8

  /** Great-circle distance in meters (haversine). */
  def haversineM(lat1: Double, lng1: Double, lat2: Double, lng2: Double): Double = {
    val p1 = math.toRadians(lat1)
    val p2 = math.toRadians(lat2)
    val dp = math.toRadians(lat2 - lat1)
    val dl = math.toRadians(lng2 - lng1)
    val a = math.sin(dp / 2) * math.sin(dp / 2) +
      math.cos(p1) * math.cos(p2) * math.sin(dl / 2) * math.sin(dl / 2)
    2.0 * EarthRadiusM * math.asin(math.min(1.0, math.sqrt(a)))
  }

  /** Strict-inequality bbox overlap — parity-critical semantics:
    * reference overturemaestro/data_downloader.py:831-837 builds
    * (xmin < qxmax) & (xmax > qxmin) & (ymin < qymax) & (ymax > qymin). */
  def bboxOverlapsStrict(xmin: Double, ymin: Double, xmax: Double, ymax: Double,
                         qxmin: Double, qymin: Double, qxmax: Double, qymax: Double): Boolean =
    xmin < qxmax && xmax > qxmin && ymin < qymax && ymax > qymin

  /** Ray-casting point-in-polygon over a flat (x0,y0,x1,y1,…) ring array.
    * Boundary points follow the even-odd crossing rule of the classic
    * algorithm (points exactly on a horizontal edge may count either way —
    * test fixtures avoid on-edge points, matching the reference's reliance
    * on GEOS `intersects` only for generic-position data). */
  def rayCastRing(coords: Array[Double], n: Int, px: Double, py: Double): Boolean = {
    var inside = false
    var i = 0
    var j = n - 1
    while (i < n) {
      val xi = coords(2 * i); val yi = coords(2 * i + 1)
      val xj = coords(2 * j); val yj = coords(2 * j + 1)
      if ((yi > py) != (yj > py)) {
        val xCross = (xj - xi) * (py - yi) / (yj - yi) + xi
        if (px < xCross) inside = !inside
      }
      j = i
      i += 1
    }
    inside
  }
}
