package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.geo.{Canonical, Wkb, Wkt}
import graft.operators.CachePaths

/** F6/F12 byte-for-byte parity with the reference's pinned cache hashes.
  *
  * The expected values are LITERAL strings from the reference test suite /
  * docstrings (computed by shapely+GEOS and hashlib there):
  *  - 09c3fc04: tests/base/test_cli.py:338 — Monaco box after a
  *    to_wkt(rounding_precision=6) roundtrip;
  *  - 82c0fdfa: tests/base/test_cli.py:350 — Monaco box after a GeoJSON
  *    roundtrip (full precision preserved; orient step rounds to 7);
  *  - 7ed11f0d: functions.py:179 docstring — London box, no roundtrip;
  *  - b22759b5: tests/base/test_cli.py:326 — sha256 of the pyarrow filter
  *    string form `(subtype == "residential")`.
  */
class CanonicalParitySpec extends AnyFunSuite {

  // Monaco bbox fixture (reference tests/conftest.py:58-60)
  private val monacoFull = (7.416486207767861, 43.7310867041912, 7.421931388477276, 43.73370705597216)
  private def r6(d: Double) = BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_EVEN).toDouble

  test("geometry hash parity: Monaco box via 6-decimal WKT roundtrip = 09c3fc04") {
    val (x0, y0, x1, y1) = monacoFull
    val wkb = Wkb.box(r6(x0), r6(y0), r6(x1), r6(y1))
    assert(Canonical.geometryHash(wkb).take(8) == "09c3fc04")
  }

  test("geometry hash parity: Monaco box at full precision = 82c0fdfa") {
    val (x0, y0, x1, y1) = monacoFull
    assert(Canonical.geometryHash(Wkb.box(x0, y0, x1, y1)).take(8) == "82c0fdfa")
  }

  test("geometry hash parity: London box (functions.py docstring) = 7ed11f0d") {
    val wkb = Wkb.box(-0.120077, 51.498164, -0.090809, 51.508849)
    assert(Canonical.geometryHash(wkb).take(8) == "7ed11f0d")
  }

  test("geometry hash is rotation/orientation invariant (canonical form)") {
    // same rectangle entered as CW WKT starting from a different vertex
    val cw = Wkt.parse(
      "POLYGON ((-0.090809 51.508849, -0.090809 51.498164, -0.120077 51.498164, -0.120077 51.508849, -0.090809 51.508849))")
    assert(Canonical.geometryHash(cw).take(8) == "7ed11f0d")
  }

  test("pyarrow filter string hash parity = b22759b5") {
    assert(Canonical.sha256Hex("(subtype == \"residential\")").take(8) == "b22759b5")
  }

  test("result cache path matches the reference's pinned filename scheme") {
    val (x0, y0, x1, y1) = monacoFull
    val geom = Wkb.box(r6(x0), r6(y0), r6(x1), r6(y1))
    val p1 = CachePaths.resultPath("files", "2024-08-20.0", "buildings", "building",
      geom, filterRepr = None, columns = None, sorted = true)
    assert(p1 == "files/2024-08-20.0/theme=buildings/type=building/09c3fc04_nofilter_sorted.parquet")
    val p2 = CachePaths.resultPath("files", "2024-08-20.0", "buildings", "building",
      geom, filterRepr = Some("(subtype == \"residential\")"), columns = None, sorted = true)
    assert(p2 == "files/2024-08-20.0/theme=buildings/type=building/09c3fc04_b22759b5_sorted.parquet")
    val p3 = CachePaths.resultPath("files", "2024-08-20.0", "buildings", "building",
      geom, filterRepr = None, columns = None, sorted = false)
    assert(p3 == "files/2024-08-20.0/theme=buildings/type=building/09c3fc04_nofilter.parquet")
  }
}
