package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The per-(theme, type) wide-form extension point — Scala-trait form of
  * the reference's `WideFormDefinition` dataclass of callables
  * (overturemaestro/advanced_functions/wide_form.py:567-600, with
  * release-versioned overrides at 603-616).
  *
  * Each instance knows: which columns to read, an optional extra download
  * predicate, and how to pivot a downloaded frame into `keyCols + boolean
  * columns` named `theme|type|…`. */
trait WideFormDefinition {
  def theme: String
  def tpe: String
  /** hierarchy columns, coarse → fine */
  def hierarchyColumns: Seq[String]
  /** columns required from the scan (P4 auto-adds id + geometry). */
  def downloadColumns: Seq[String] = hierarchyColumns
  /** extra pushdown predicate ANDed into the scan (P6 for places). */
  def downloadPredicate: Option[Column] = None
  /** the pivot: frame → keyCols + boolean wide columns. */
  def pivot(df: DataFrame, keyCols: Seq[String], depth: Option[Int]): DataFrame
}

/** Hierarchy-value pivot (buildings/base/divisions style —
  * wide_form.py:85-167). */
case class HierarchyWideForm(theme: String, tpe: String,
                             override val hierarchyColumns: Seq[String])
    extends WideFormDefinition {
  override def pivot(df: DataFrame, keyCols: Seq[String], depth: Option[Int]): DataFrame = {
    val d = WideForm.checkDepth(theme, tpe, hierarchyColumns, depth)
    val cols = hierarchyColumns.take(d)
    if (cols.isEmpty)
      // depth-0: the single always-true presence column — the empty combo
      // drives pivotHierarchy's levels.isEmpty branch (same semantics the
      // vocab path uses; one implementation, not two)
      WideForm.pivotHierarchy(df, keyCols, Seq(theme, tpe), Nil, Some(Seq(Nil)))
    else
      WideForm.pivotHierarchy(df, keyCols, Seq(theme, tpe), cols)
  }
}

/** POI category pivot (places — wide_form.py:170-335): one boolean column
  * per HIERARCHY PREFIX (truncated at `depth`), true when the primary
  * category matches any member category of that prefix or (unless
  * primaryOnly) the alternate list contains one; rows pre-filtered by the
  * quality predicate.
  *
  * Release parity:
  *  - `release` < 2024-07-22.0 reads the primary category from
  *    `categories.main` instead of `categories.primary`
  *    (wide_form.py:248-252; alternate is unversioned) — resolved through
  *    [[WideFormRegistry.forRelease]], which stamps the release in;
  *  - `hierarchy` maps a category to its classification levels, coarse →
  *    fine (the Overture places category CSV the reference fetches at
  *    wide_form.py:412-436; a network asset, so supplied as a local table
  *    here). A category absent from the hierarchy is its own level-1
  *    entry (wide_form.py:433-435); the places max depth is 6
  *    (wide_form.py:592-599). Categories sharing a truncated prefix merge
  *    into ONE column by OR-ing their member conditions
  *    (wide_form.py:297-311). */
case class PoiWideForm(theme: String = "places", tpe: String = "place",
                       categories: Seq[String] = Nil,
                       primaryOnly: Boolean = false,
                       minimalConfidence: Double = WideForm.DefaultMinimalConfidence,
                       release: String = "2024-07-22.0",
                       hierarchy: Map[String, Seq[String]] = Map.empty)
    extends WideFormDefinition {
  override def hierarchyColumns: Seq[String] = (1 to 6).map(_.toString)
  override def downloadColumns: Seq[String] = Seq("categories", "confidence")
  override def downloadPredicate: Option[Column] =
    Some(WideForm.poiQualityPredicate(minimalConfidence))

  /** The struct field carrying the primary category in this release. */
  def primaryField: String = if (release < "2024-07-22.0") "main" else "primary"

  override def pivot(df: DataFrame, keyCols: Seq[String], depth: Option[Int]): DataFrame = {
    val d = WideForm.checkDepth(theme, tpe, hierarchyColumns, depth)
    val primCol = col(s"categories.$primaryField")
    val altCol = col("categories.alternate")
    // quality-filter FIRST: the reference derives the observed category
    // vocabulary from the pre-filtered rows (wide_form.py:170-335) — a
    // category appearing only on low-confidence rows must not become an
    // all-false output column (it would break region-stable schemas)
    val filtered = df.where(downloadPredicate.get)
    val vocab =
      if (categories.nonEmpty) categories
      else filtered.select(primCol.as("c"))
        .union(filtered.select(explode_outer(altCol).as("c")))
        .where(col("c").isNotNull)
        .distinct().orderBy(col("c")).collect().map(_.getString(0)).toSeq
    // wide-column definitions (wide_form.py:474-499): column name =
    // theme|type|<levels up to depth>; members grouped per name, emitted
    // sorted by name (the reference's pandas groupby order)
    val defs: Seq[(String, Seq[String])] = vocab
      .map(c => ((Seq(theme, tpe) ++ hierarchy.getOrElse(c, Seq(c)).take(d)).mkString("|"), c))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toSeq
      .sortBy(_._1)
    val pivots = defs.map { case (name, members) =>
      WideForm.categoryGroupPivotCol(members, name, primaryOnly, primCol, altCol)
    }
    filtered.select(keyCols.map(col) ++ pivots: _*)
  }
}

/** Release-versioned (theme, type) → [[WideFormDefinition]] registry —
  * the reference's `THEME_TYPE_CLASSIFICATION` +
  * `get_theme_type_classification(release)` pair
  * (overturemaestro/advanced_functions/wide_form.py:583-616).
  *
  * The schema of a wide-form output depends on the RELEASE being
  * converted, not just the (theme, type): older releases carried fewer
  * hierarchy levels (transportation gained `subclass` in 2024-08-20.0,
  * buildings gained `subtype` and base gained `land_cover` in
  * 2024-05-16-beta.0). Resolving the definition through the registry —
  * instead of hard-coding hierarchy columns at the call site — is what
  * keeps a re-conversion of an old release schema-faithful. Release
  * ordering is lexicographic on the release string, exactly as the
  * reference compares them. */
object WideFormRegistry {

  /** Current-release classification (wide_form.py:583-600). */
  val current: Map[(String, String), WideFormDefinition] = Map(
    ("base", "infrastructure") -> HierarchyWideForm("base", "infrastructure", Seq("subtype", "class")),
    ("base", "land") -> HierarchyWideForm("base", "land", Seq("subtype", "class")),
    ("base", "land_cover") -> HierarchyWideForm("base", "land_cover", Seq("subtype")),
    ("base", "land_use") -> HierarchyWideForm("base", "land_use", Seq("subtype", "class")),
    ("base", "water") -> HierarchyWideForm("base", "water", Seq("subtype", "class")),
    ("transportation", "segment") -> HierarchyWideForm("transportation", "segment", Seq("subtype", "class", "subclass")),
    ("places", "place") -> PoiWideForm(),
    ("buildings", "building") -> HierarchyWideForm("buildings", "building", Seq("subtype", "class")))

  /** The classification as of `release` — newest first, overrides walk
    * backwards (wide_form.py:603-616). Releases below the reference's
    * minimal supported version are rejected up front
    * (release_index.py:581-586). */
  def forRelease(release: String): Map[(String, String), WideFormDefinition] = {
    graft.sources.Releases.checkReleaseVersion(release)
    var c = current
    // places reads `categories.main` below 2024-07-22.0 — the release is
    // stamped into the definition so the pivot resolves the right field
    // (wide_form.py:248-252)
    c = c.updated(("places", "place"), PoiWideForm(release = release))
    if (release < "2024-08-20.0")
      c = c.updated(("transportation", "segment"),
        HierarchyWideForm("transportation", "segment", Seq("subtype", "class")))
    if (release < "2024-05-16-beta.0") {
      c = c.updated(("buildings", "building"),
        HierarchyWideForm("buildings", "building", Seq("class")))
      c = c.removed(("base", "land_cover"))
    }
    c
  }

  /** Resolve one pair; fails loudly on a pair the release doesn't have
    * (e.g. base/land_cover before 2024-05-16-beta.0). */
  def definition(theme: String, tpe: String, release: String): WideFormDefinition =
    forRelease(release).getOrElse((theme, tpe),
      throw new NoSuchElementException(
        s"($theme, $tpe) is not available in release $release"))
}
