package graft.operators

import graft.geo.Canonical

/** F12 parity: deterministic result-cache paths.
  *
  * Reference scheme (overturemaestro/data_downloader.py:908-963; wide form
  * overturemaestro/advanced_functions/wide_form.py:1192-1253):
  *  - 8-char sha256 prefixes for the geometry hash, the stringified filter,
  *    and the sorted column list;
  *  - `_sorted` / `_compact` suffix by sink mode;
  *  - multi-(theme,type) requests hash the SORTED pair list — order
  *    independence is a tested semantic
  *    (tests/base/advanced/test_wide_form.py:392-424).
  */
object CachePaths {

  private def h8(s: String): String = Canonical.sha256Hex(s).take(8)

  /** Exact reference layout (`_generate_result_file_path`,
    * data_downloader.py:925-963):
    * `{release}/theme={theme}/type={type}/
    *  {geomhash8}_{filterhash8|nofilter}{_colshash8}{_sorted}.parquet`.
    * `filterRepr` must be the pyarrow-Expression string form, e.g.
    * `(subtype == "residential")` — hash pinned in CanonicalParitySpec.
    * The columns hash covers Python's `str(sorted(columns))` repr. */
  def resultPath(baseDir: String, release: String, theme: String, tpe: String,
                 geometryWkb: Array[Byte],
                 filterRepr: Option[String],
                 columns: Option[Seq[String]],
                 sorted: Boolean): String = {
    val geomH = Canonical.geometryHash(geometryWkb).take(8)
    val filterPart = filterRepr.map(h8).getOrElse("nofilter")
    val colsPart = columns.map(cs => s"_${h8(pyListRepr(cs.sorted))}").getOrElse("")
    val sortPart = if (sorted) "_sorted" else ""
    s"$baseDir/$release/theme=$theme/type=$tpe/${geomH}_$filterPart$colsPart$sortPart.parquet"
  }

  /** Python `str(list_of_str)` repr — what the reference feeds the columns
    * hash: `['a', 'b']`. */
  private[operators] def pyListRepr(xs: Seq[String]): String =
    xs.map(x => s"'$x'").mkString("[", ", ", "]")

  /** pyarrow Expression repr of an AND-folded `(col, op, value)` triple
    * list — the string form the reference hashes into the filename
    * (single-predicate form pinned at b22759b5 in CanonicalParitySpec;
    * conjunctions fold left-associatively as pyarrow's `&` repr does).
    * Strings are double-quoted with `\\` and `\"` escaped (Python repr of
    * the embedded string), booleans render as Python's `True`/`False`,
    * numbers bare. None when no filters. */
  def pyarrowFilterRepr(filters: Seq[(String, String, Any)]): Option[String] =
    if (filters.isEmpty) None
    else Some(filters.map { case (c, op, v) =>
      val vr = v match {
        case s: String =>
          "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
        case b: Boolean => if (b) "True" else "False"
        case b: java.lang.Boolean => if (b) "True" else "False"
        case other => other.toString
      }
      s"($c $op $vr)"
    }.reduce((l, r) => s"($l and $r)"))

  /** Order-independent hash over (theme, type) pairs (+ their per-pair
    * params): pairs are sorted before hashing. */
  def multiPairHash(pairs: Seq[(String, String)], perPairParams: Seq[String] = Nil): String = {
    require(perPairParams.isEmpty || perPairParams.length == pairs.length,
      s"per-pair params (${perPairParams.length}) must match pairs (${pairs.length})" +
        " — zip would silently drop pairs and alias distinct requests to one cache key")
    val paired =
      if (perPairParams.isEmpty) pairs.map(p => s"${p._1}|${p._2}")
      else pairs.zip(perPairParams).map { case ((t, ty), p) => s"$t|$ty|$p" }
    h8(paired.sorted.mkString(";"))
  }
}
