package graft.geo

/** F7–F10 parity: the geometry-filter input surface — every format the
  * reference CLI accepts (overturemaestro/cli.py:86-280) parsed to WKB:
  * bbox string, WKT, GeoJSON, geohash, native cell token, S2-style token.
  * (Geocoding is network-bound and out of scope.) */
object FilterInputs {

  /** "xmin,ymin,xmax,ymax" → box polygon. */
  def fromBboxString(s: String): Array[Byte] = {
    val parts = s.split(",").map(_.trim.toDouble)
    require(parts.length == 4, s"bbox needs 4 numbers, got ${parts.length}")
    Wkb.box(parts(0), parts(1), parts(2), parts(3))
  }

  def fromWkt(wkt: String): Array[Byte] = Wkt.parse(wkt)

  /** Geohash → its bbox polygon (reference _geohash_parser.py:28-58). */
  def fromGeohash(gh: String): Array[Byte] = {
    val (lngMin, latMin, lngMax, latMax) = Geohash.decodeBBox(gh)
    Wkb.box(lngMin, latMin, lngMax, latMax)
  }

  /** Native cell id (hex) → cell bounds polygon (H3-filter analog, F8). */
  def fromCellToken(hex: String): Array[Byte] =
    Cell.boundaryWkb(java.lang.Long.parseUnsignedLong(hex, 16))

  /** S2-style token → cell quadrilateral (F9). */
  def fromS2Token(token: String): Array[Byte] = S2Like.tokenToPolygonWkb(token)

  /** Filter-semantics union of several areal WKBs as one MultiPolygon.
    * `Wkb.containsPoint` is OR-over-polygons for MultiPolygon, so pooling
    * member polygons IS the union for every way the engine consumes a
    * filter geometry (bbox overlap, containment, cell cover) — no
    * geometric overlay needed, overlapping members included.
    *
    * Known parity gap (documented, accepted): the reference dissolves
    * multi-feature files with geopandas `union_all()` (cli.py:140-162),
    * producing overlay-merged boundary rings; the F12 cache-path geometry
    * hash is computed from the filter WKB, so for multi-feature or
    * overlapping inputs our pooled-MultiPolygon hash (and hence the cache
    * FILENAME — never the result rows) differs from the reference's.
    * A geometric overlay engine exists only for this filename cosmetic,
    * so we keep the pooled form; see COVERAGE.md. */
  def unionWkb(wkbs: Seq[Array[Byte]]): Array[Byte] = {
    require(wkbs.nonEmpty, "no geometries to union")
    if (wkbs.length == 1) wkbs.head
    else Wkb.writeMultiPolygon(wkbs.flatMap(Wkb.readPolygons).toArray)
  }

  /** `--geom-filter-file` (reference cli.py:140-162: geopandas read_file +
    * union_all): read the filter geometry from a file. Supported offline
    * formats: GeoJSON (bare geometry, Feature, or FeatureCollection —
    * all features unioned) and WKT text (one geometry per non-empty
    * line, unioned). Dispatched on the leading character. */
  def fromFile(path: String): Array[Byte] = {
    val text = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)),
      java.nio.charset.StandardCharsets.UTF_8).trim
    require(text.nonEmpty, s"geo filter file $path is empty")
    try {
      if (text.startsWith("{")) fromGeoJsonAny(text)
      else unionWkb(text.linesIterator.map(_.trim).filter(_.nonEmpty).map(fromWkt).toSeq)
    } catch {
      case e: Exception =>
        throw new IllegalArgumentException(s"Cannot parse provided geo file: $path", e)
    }
  }

  /** GeoJSON of any shape: a doc with `"geometry"` members (Feature /
    * FeatureCollection) unions every non-null member geometry; otherwise
    * the doc itself must be a Polygon/MultiPolygon geometry.
    *
    * Key detection is a real single-pass scan (string-literal state +
    * brace depth), not a substring search: a property VALUE equal to
    * "geometry", or a `properties`-nested key named geometry, must not be
    * mistaken for a Feature's geometry member. Feature-level keys sit at
    * depth 2 in a FeatureCollection (root → features[] → feature) and at
    * depth 1 in a bare Feature. */
  private def fromGeoJsonAny(json: String): Array[Byte] = {
    val keys = scanKeys(json)
    val featureDepth = if (keys.exists(k => k.name == "features" && k.depth == 1)) 2 else 1
    val geomKeys = keys.filter(k => k.name == "geometry" && k.depth == featureDepth)
    val members = geomKeys.flatMap { k =>
      // first non-space char after the colon decides: '{' = geometry
      // object, anything else (e.g. null) = feature without geometry
      var i = k.afterColon
      while (i < json.length && json.charAt(i).isWhitespace) i += 1
      if (i < json.length && json.charAt(i) == '{')
        Some(json.substring(i, endOfObject(json, i)))
      else None
    }
    if (geomKeys.isEmpty) fromGeoJson(json)
    else {
      require(members.nonEmpty, "GeoJSON has no non-null feature geometries")
      unionWkb(members.map(fromGeoJson))
    }
  }

  private case class JsonKey(name: String, depth: Int, afterColon: Int)

  /** All object keys in `json` (a string literal directly followed, after
    * whitespace, by a colon), with their object-brace depth and the index
    * just past the colon. String escapes are honored, so quoted content
    * can never desynchronize the scan. */
  private def scanKeys(json: String): Seq[JsonKey] = {
    val keys = scala.collection.mutable.ArrayBuffer[JsonKey]()
    var depth = 0
    var i = 0
    while (i < json.length) {
      json.charAt(i) match {
        case '{' => depth += 1; i += 1
        case '}' => depth -= 1; i += 1
        case '"' =>
          val start = i + 1
          var j = start
          while (j < json.length && json.charAt(j) != '"') {
            if (json.charAt(j) == '\\') j += 1
            j += 1
          }
          val name = json.substring(start, math.min(j, json.length))
          var k = j + 1
          while (k < json.length && json.charAt(k).isWhitespace) k += 1
          if (k < json.length && json.charAt(k) == ':')
            keys += JsonKey(name, depth, k + 1)
          i = j + 1
        case _ => i += 1
      }
    }
    keys.toSeq
  }

  private def endOfObject(s: String, from: Int): Int = {
    var depth = 0
    var i = from
    while (i < s.length) {
      s.charAt(i) match {
        case '{' => depth += 1
        case '}' => depth -= 1; if (depth == 0) return i + 1
        case _ =>
      }
      i += 1
    }
    throw new IllegalArgumentException("unbalanced braces in GeoJSON")
  }

  /** Minimal GeoJSON Polygon / MultiPolygon parser (no JSON lib offline —
    * a tolerant recursive bracket parser over the coordinates member). */
  def fromGeoJson(json: String): Array[Byte] = {
    val typeRe = """"type"\s*:\s*"(\w+)"""".r
    val geomType = typeRe.findFirstMatchIn(json)
      .map(_.group(1)).filter(t => t == "Polygon" || t == "MultiPolygon")
      .orElse(typeRe.findAllMatchIn(json).map(_.group(1))
        .find(t => t == "Polygon" || t == "MultiPolygon"))
      .getOrElse(throw new IllegalArgumentException("GeoJSON must contain a Polygon/MultiPolygon"))
    val ci = json.indexOf("\"coordinates\"")
    require(ci >= 0, "missing coordinates")
    val start = json.indexOf('[', ci)
    val coords = parseNested(json, start)._1
    geomType match {
      case "Polygon" =>
        Wkb.writePolygon(ringsOf(coords))
      case "MultiPolygon" =>
        Wkb.writeMultiPolygon(coords.asInstanceOf[Seq[Any]].map(p => ringsOf(p)).toArray)
    }
  }

  private def ringsOf(poly: Any): Array[Array[Double]] =
    poly.asInstanceOf[Seq[Any]].map { ring =>
      ring.asInstanceOf[Seq[Any]].flatMap { pt =>
        val xy = pt.asInstanceOf[Seq[Any]].map(_.asInstanceOf[Double])
        Seq(xy(0), xy(1))
      }.toArray
    }.toArray

  /** Parses a nested JSON array of numbers starting at `[`; returns the
    * structure (Seq of Seq/Double) and the index after the closing `]`. */
  private def parseNested(s: String, from: Int): (Any, Int) = {
    require(s.charAt(from) == '[')
    var i = from + 1
    val items = scala.collection.mutable.ArrayBuffer[Any]()
    while (s.charAt(i) != ']') {
      s.charAt(i) match {
        case '[' =>
          val (v, next) = parseNested(s, i)
          items += v
          i = next
        case c if c.isWhitespace || c == ',' => i += 1
        case _ =>
          val end = s.indexWhere(ch => ch == ',' || ch == ']' || ch.isWhitespace, i)
          items += s.substring(i, end).toDouble
          i = end
      }
    }
    (items.toSeq, i + 1)
  }
}
