package graft.geo

/** S2-style cube-face Hilbert cells — the engine's decoder for S2-type cell
  * tokens used as geometry-filter inputs (reference accepts S2 cell tokens
  * and converts them to polygons, overturemaestro/cli.py:247-280).
  *
  * Implements the public S2 cell-id layout (3 face bits + 2 bits/level
  * Hilbert position + sentinel bit, quadratic ST→UV projection) from the
  * published s2geometry documentation. Self-consistent encode/decode is
  * unit-tested; fidelity target is the documented bit layout.
  */
object S2Like {
  final val MaxLevel = 30
  private final val SwapMask = 1
  private final val InvertMask = 2
  // public S2 Hilbert tables
  private val PosToIJ = Array(
    Array(0, 1, 3, 2), Array(0, 2, 3, 1), Array(3, 2, 0, 1), Array(3, 1, 0, 2))
  private val PosToOrientation = Array(SwapMask, 0, 0, InvertMask + SwapMask)
  private val IJToPos = {
    val t = Array.ofDim[Int](4, 4)
    for (o <- 0 until 4; p <- 0 until 4) t(o)(PosToIJ(o)(p)) = p
    t
  }

  /** token = hex of the 64-bit id with trailing zeros stripped. */
  def tokenToId(token: String): Long = {
    require(token.nonEmpty && token.length <= 16, s"bad token '$token'")
    java.lang.Long.parseUnsignedLong(token.padTo(16, '0'), 16)
  }

  def idToToken(id: Long): String = {
    val hex = f"$id%016x"
    hex.reverse.dropWhile(_ == '0').reverse match { case "" => "0"; case s => s }
  }

  def level(id: Long): Int = MaxLevel - java.lang.Long.numberOfTrailingZeros(id) / 2

  /** quadratic ST→UV (the S2 default projection). */
  private def stToUV(s: Double): Double =
    if (s >= 0.5) (1.0 / 3.0) * (4 * s * s - 1) else (1.0 / 3.0) * (1 - 4 * (1 - s) * (1 - s))
  private def uvToST(u: Double): Double =
    if (u >= 0) 0.5 * math.sqrt(1 + 3 * u) else 1 - 0.5 * math.sqrt(1 - 3 * u)

  /** face (u,v) → unit xyz (S2 face axes). */
  private def faceUVToXYZ(face: Int, u: Double, v: Double): (Double, Double, Double) =
    face match {
      case 0 => (1, u, v)
      case 1 => (-u, 1, v)
      case 2 => (-u, -v, 1)
      case 3 => (-1, -v, -u)
      case 4 => (v, -1, -u)
      case 5 => (v, u, -1)
    }

  private def xyzToLatLng(x: Double, y: Double, z: Double): (Double, Double) = {
    val lat = math.toDegrees(math.atan2(z, math.sqrt(x * x + y * y)))
    val lng = math.toDegrees(math.atan2(y, x))
    (lat, lng)
  }

  private def xyzToFaceUV(x: Double, y: Double, z: Double): (Int, Double, Double) = {
    val ax = math.abs(x); val ay = math.abs(y); val az = math.abs(z)
    val face =
      if (ax >= ay && ax >= az) { if (x >= 0) 0 else 3 }
      else if (ay >= az) { if (y >= 0) 1 else 4 }
      else { if (z >= 0) 2 else 5 }
    face match {
      case 0 => (0, y / x, z / x)
      case 1 => (1, -x / y, z / y)
      case 2 => (2, -x / z, -y / z)
      case 3 => (3, z / x, y / x)
      case 4 => (4, z / y, -x / y)
      case 5 => (5, -y / z, -x / z)
    }
  }

  /** id → (face, i, j, orientation) at MaxLevel granularity. */
  def idToFaceIJ(id: Long): (Int, Int, Int) = {
    val face = (id >>> 61).toInt
    var i = 0; var j = 0
    var bits = face & SwapMask
    var k = MaxLevel - 1
    while (k >= 0) {
      val pos = ((id >>> (2 * k + 1)) & 3).toInt
      val ij = PosToIJ(bits)(pos)
      i = (i << 1) | (ij >> 1)
      j = (j << 1) | (ij & 1)
      bits ^= PosToOrientation(pos)
      k -= 1
    }
    (face, i, j)
  }

  def faceIJToId(face: Int, iIn: Int, jIn: Int, lvl: Int): Long = {
    var id = face.toLong << 61
    var bits = face & SwapMask
    var k = MaxLevel - 1
    var pos = 0L
    val i = iIn << (MaxLevel - lvl)
    val j = jIn << (MaxLevel - lvl)
    var acc = 0L
    while (k >= 0) {
      val ij = (((i >> k) & 1) << 1) | ((j >> k) & 1)
      val p = IJToPos(bits)(ij)
      acc = (acc << 2) | p
      bits ^= PosToOrientation(p)
      k -= 1
    }
    id |= acc << 1
    // truncate to level: set the sentinel bit
    val lsb = 1L << (2 * (MaxLevel - lvl))
    (id & -lsb) | lsb
  }

  def latLngToId(lat: Double, lng: Double, lvl: Int): Long = {
    val phi = math.toRadians(lat); val theta = math.toRadians(lng)
    val cos = math.cos(phi)
    val (x, y, z) = (cos * math.cos(theta), cos * math.sin(theta), math.sin(phi))
    val (face, u, v) = xyzToFaceUV(x, y, z)
    val s = uvToST(u); val t = uvToST(v)
    val n = 1 << MaxLevel
    def clamp(d: Double) = math.min(n - 1, math.max(0, math.floor(d * n).toInt))
    faceIJToId(face, clamp(s) >> (MaxLevel - lvl), clamp(t) >> (MaxLevel - lvl), lvl)
  }

  /** Cell corner vertices (lat, lng) — CCW quadrilateral. */
  def cellVertices(id: Long): Array[(Double, Double)] = {
    val lvl = level(id)
    val (face, i30, j30) = idToFaceIJ(id)
    val size = 1 << (MaxLevel - lvl)
    val iLo = (i30 >> (MaxLevel - lvl)) << (MaxLevel - lvl)
    val jLo = (j30 >> (MaxLevel - lvl)) << (MaxLevel - lvl)
    val n = (1 << MaxLevel).toDouble
    val corners = Array((iLo, jLo), (iLo + size, jLo), (iLo + size, jLo + size), (iLo, jLo + size))
    corners.map { case (ii, jj) =>
      val u = stToUV(ii / n); val v = stToUV(jj / n)
      val (x, y, z) = faceUVToXYZ(face, u, v)
      xyzToLatLng(x, y, z)
    }
  }

  /** Token → boundary polygon WKB (the filter-input decode, F9).
    *
    * A cell whose corners straddle lng ±180 (face 3's center region) is
    * emitted as a MultiPolygon split at the antimeridian — the raw atan2
    * longitudes would otherwise describe the COMPLEMENT band (a ring from
    * +179.98 "west" to −180, covering the whole planet except the cell).
    * Limitation: a cell CONTAINING a pole (faces 2/5 centers) cannot be
    * represented by its 4-corner lat/lng quad; callers filtering at the
    * poles should use a bbox/geohash filter instead. */
  def tokenToPolygonWkb(token: String): Array[Byte] = {
    val vs = cellVertices(tokenToId(token))
    val lngs = vs.map(_._2)
    if (lngs.max - lngs.min <= 180.0) {
      val flat = (vs :+ vs.head).flatMap { case (lat, lng) => Seq(lng, lat) }.toArray
      Wkb.writePolygon(Array(flat))
    } else {
      // shift negatives +360 (ring now spans ~[170, 190]), clip the convex
      // quad at lng=180, shift the east half back into [-180, ...]
      val shifted = vs.map { case (lat, lng) =>
        (if (lng < 0) lng + 360 else lng, lat)
      }
      val west = clipAt180(shifted, keepLeq = true)
      val east = clipAt180(shifted, keepLeq = false).map { case (x, y) => (x - 360, y) }
      val parts = Seq(west, east).filter(_.length >= 3).map { ring =>
        Array((ring :+ ring.head).flatMap { case (x, y) => Seq(x, y) }.toArray)
      }
      if (parts.length == 1) Wkb.writePolygon(parts.head)
      else Wkb.writeMultiPolygon(parts.toArray)
    }
  }

  /** Sutherland–Hodgman clip of a convex ring (open, (x=lng, y=lat))
    * against the vertical line x = 180, keeping x ≤ 180 or x ≥ 180. */
  private def clipAt180(ring: Array[(Double, Double)],
                        keepLeq: Boolean): Array[(Double, Double)] = {
    val B = 180.0
    def in(p: (Double, Double)) = if (keepLeq) p._1 <= B else p._1 >= B
    def cross(a: (Double, Double), b: (Double, Double)) = {
      val t = (B - a._1) / (b._1 - a._1)
      (B, a._2 + t * (b._2 - a._2))
    }
    val out = scala.collection.mutable.ArrayBuffer[(Double, Double)]()
    var i = 0
    while (i < ring.length) {
      val a = ring(i)
      val b = ring((i + 1) % ring.length)
      if (in(a)) {
        out += a
        if (!in(b)) out += cross(a, b)
      } else if (in(b)) out += cross(a, b)
      i += 1
    }
    out.toArray
  }
}
