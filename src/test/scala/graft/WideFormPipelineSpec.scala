package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.operators.{Pipeline, WideForm}
import graft.geo.{Wkb, Wkt}

/** Reference-parity semantics: wide-form pivot (wide_form.py), projection /
  * predicate / bbox composition (data_downloader.py). */
class WideFormPipelineSpec extends SparkTestBase {
  import spark.implicits._

  test("F1 null-stop concat: stops at first NULL (unlike concat_ws which skips)") {
    val df = Seq(
      (Some("base"), Some("water"), Some("river")),
      (Some("base"), None, Some("river")), // null in the middle → stop after base
      (None, Some("water"), Some("river")),
      (Some("base"), Some("water"), None)
    ).toDF("a", "b", "c")
    val got = df.select(WideForm.nullStopConcat("|", Seq($"a", $"b", $"c")).as("n"))
      .as[String].collect().toSeq
    assert(got == Seq("base|water|river", "base", "", "base|water"))
  }

  test("F2 hierarchy pivot: NULL levels compared with IS NULL; output all-boolean") {
    val df = Seq(
      ("1", "water", "river"), ("2", "water", null), ("3", "land", "forest"))
      .toDF("id", "subtype", "class")
    val out = WideForm.pivotHierarchy(df, Seq("id"), Seq("base", "type"),
      Seq("subtype", "class"),
      vocabulary = Some(Seq(
        Seq(Some("water"), Some("river")),
        Seq(Some("water"), None),
        Seq(Some("land"), Some("forest")))))
    // all feature columns boolean
    out.schema.fields.filter(_.name != "id").foreach(f => assert(f.dataType == BooleanType))
    // names prefixed and null-stop truncated
    assert(out.columns.toSet == Set("id", "base|type|water|river", "base|type|water", "base|type|land|forest"))
    val rows = out.orderBy($"id").collect()
    assert(rows(0).getBoolean(out.columns.indexOf("base|type|water|river")))
    assert(!rows(0).getBoolean(out.columns.indexOf("base|type|water"))) // class NOT null → IS NULL fails
    assert(rows(1).getBoolean(out.columns.indexOf("base|type|water")))
    // exactly one true per row for a partitioning vocabulary
    rows.foreach { r =>
      val trues = out.columns.drop(1).count(c => r.getBoolean(out.columns.indexOf(c)))
      assert(trues == 1)
    }
  }

  test("F2 pivot: combos aliased by null-stop naming merge into ONE column (OR)") {
    // (a, NULL, x) and (a, NULL, NULL) both name to `p|a` — they must
    // produce a single column true for either combo, not two duplicate
    // names that break downstream by-name resolution
    val df = Seq(
      ("1", "a", null, "x"), ("2", "a", null, null), ("3", "b", "q", "r"))
      .toDF("id", "h1", "h2", "h3")
    val out = WideForm.pivotHierarchy(df, Seq("id"), Seq("p"),
      Seq("h1", "h2", "h3"),
      vocabulary = Some(Seq(
        Seq(Some("a"), None, Some("x")),
        Seq(Some("a"), None, None),
        Seq(Some("b"), Some("q"), Some("r")))))
    assert(out.columns.length == out.columns.distinct.length, "duplicate column names")
    assert(out.columns.toSet == Set("id", "p|a", "p|b|q|r"))
    val rows = out.orderBy($"id").collect()
    assert(rows(0).getBoolean(out.columns.indexOf("p|a")))  // matches first combo
    assert(rows(1).getBoolean(out.columns.indexOf("p|a")))  // matches second combo
    assert(!rows(2).getBoolean(out.columns.indexOf("p|a")))
    assert(rows(2).getBoolean(out.columns.indexOf("p|b|q|r")))
  }

  test("U2 combine: unionByName + COALESCE(false) for missing boolean columns") {
    val a = Seq(("1", true)).toDF("id", "x|p")
    val b = Seq(("2", true)).toDF("id", "x|q")
    val got = WideForm.combineWide(Seq(a, b), nonBoolCols = Set("id"))
      .orderBy($"id").collect()
    assert(got.map(_.getBoolean(1)).toSeq == Seq(true, false)) // x|p
    assert(got.map(_.getBoolean(2)).toSeq == Seq(false, true)) // x|q
  }

  test("F3 POI category pivot + P6 quality filter (PoiWideForm)") {
    val df = Seq(
      ("a", 0.99, "museum", Seq("cafe")),
      ("b", 0.50, "museum", Seq[String]()), // below confidence → dropped
      ("c", 0.99, "cafe", Seq("museum", "bar")),
      ("d", 0.99, null.asInstanceOf[String], null.asInstanceOf[Seq[String]]))
      .toDF("id", "confidence", "p", "alt")
      .select($"id", $"confidence",
        when($"p".isNotNull, struct($"p".as("primary"), $"alt".as("alternate")))
          .otherwise(lit(null)).as("categories"))
    val wf = operators.PoiWideForm(categories = Seq("bar", "cafe", "museum"))
    val out = wf.pivot(df, Seq("id"), None).orderBy($"id")
    assert(out.columns.toSeq == Seq("id", "places|place|bar", "places|place|cafe", "places|place|museum"))
    val rows = out.collect().map(r => r.getString(0) ->
      (r.getBoolean(1), r.getBoolean(2), r.getBoolean(3))).toMap
    assert(rows == Map(
      "a" -> ((false, true, true)),   // primary museum + alternate cafe
      "c" -> ((true, true, true))))   // primary cafe + alternates museum, bar
    // primary-only variant ignores alternates
    val po = operators.PoiWideForm(categories = Seq("bar", "cafe", "museum"), primaryOnly = true)
    val rows2 = po.pivot(df, Seq("id"), None).orderBy($"id").collect()
      .map(r => r.getString(0) -> (r.getBoolean(1), r.getBoolean(2), r.getBoolean(3))).toMap
    assert(rows2 == Map("a" -> ((false, false, true)), "c" -> ((false, true, false))))
    // primary-only ⇒ exactly one true per row (reference row-sum invariant)
    rows2.values.foreach { case (x, y, z) => assert(Seq(x, y, z).count(identity) == 1) }
    // OBSERVED vocabulary derives from quality-FILTERED rows: a category
    // present only on a low-confidence row must not become a column
    val dirty = df.unionByName(Seq(("e", 0.10, "casino", Seq[String]()))
      .toDF("id", "confidence", "p", "alt")
      .select($"id", $"confidence",
        struct($"p".as("primary"), $"alt".as("alternate")).as("categories")))
    val observed = operators.PoiWideForm().pivot(dirty, Seq("id"), None)
    assert(!observed.columns.contains("places|place|casino"),
      s"low-confidence-only category leaked into the vocabulary: ${observed.columns.toSeq}")
    assert(observed.columns.toSet ==
      Set("id", "places|place|bar", "places|place|cafe", "places|place|museum"))
  }

  test("F3 POI release parity: categories.main rename + hierarchy-depth grouping") {
    // pre-2024-07-22.0 releases carry the primary category in
    // `categories.main` (wide_form.py:248-252) — the registry stamps the
    // release so the pivot resolves the right struct field
    val oldDef = operators.WideFormRegistry.definition("places", "place", "2024-06-13-beta.0")
      .asInstanceOf[operators.PoiWideForm]
    assert(oldDef.primaryField == "main")
    val newDef = operators.WideFormRegistry.definition("places", "place", "2024-09-18.0")
      .asInstanceOf[operators.PoiWideForm]
    assert(newDef.primaryField == "primary")

    val hier = Map(
      "sushi" -> Seq("eat_and_drink", "restaurant", "sushi"),
      "pizza" -> Seq("eat_and_drink", "restaurant", "pizza"),
      "museum" -> Seq("attractions", "museum"))
    def mk(primField: String) = Seq(
      ("a", 0.99, "sushi", Seq("museum")),
      ("b", 0.99, "pizza", Seq[String]()),
      ("c", 0.99, "zoo", Seq[String]())) // not in the hierarchy → own level-1
      .toDF("id", "confidence", "p", "alt")
      .select($"id", $"confidence",
        struct($"p".as(primField), $"alt".as("alternate")).as("categories"))

    // old release reads categories.main; depth None → max (leaf columns)
    val old = oldDef.copy(hierarchy = hier).pivot(mk("main"), Seq("id"), None)
    assert(old.columns.toSeq == Seq("id",
      "places|place|attractions|museum",
      "places|place|eat_and_drink|restaurant|pizza",
      "places|place|eat_and_drink|restaurant|sushi",
      "places|place|zoo"))

    // depth 1 groups member categories into ONE prefix column via OR
    // (wide_form.py:297-311, 412-436)
    val d1 = newDef.copy(hierarchy = hier).pivot(mk("primary"), Seq("id"), Some(1))
      .orderBy($"id")
    assert(d1.columns.toSeq == Seq("id",
      "places|place|attractions", "places|place|eat_and_drink", "places|place|zoo"))
    val rows = d1.collect().map(r =>
      r.getString(0) -> (r.getBoolean(1), r.getBoolean(2), r.getBoolean(3))).toMap
    assert(rows == Map(
      "a" -> ((true, true, false)),   // alternate museum → attractions; sushi → eat_and_drink
      "b" -> ((false, true, false)),  // pizza groups under eat_and_drink
      "c" -> ((false, false, true)))) // zoo = its own level-1 column

    // a release at/after the rename still resolves categories.primary
    val d2 = newDef.copy(hierarchy = hier).pivot(mk("primary"), Seq("id"), Some(2))
    assert(d2.columns.contains("places|place|eat_and_drink|restaurant"))
  }

  test("F4 bitset compress/decompress roundtrip") {
    val bools = Seq("b0", "b1", "b2")
    val df = Seq((1L, true, false, true), (2L, false, false, false))
      .toDF("id", "b0", "b1", "b2")
    val compressed = df.select($"id", operators.WideForm.compressBools(bools))
    val sizes = compressed.orderBy($"id").collect().map(_.getSeq[Int](1).toSeq).toSeq
    assert(sizes == Seq(Seq(0, 2), Seq()))
    val back = compressed.select(($"id" +: operators.WideForm.decompressBools($"column_indexes", bools)): _*)
    assert(back.orderBy($"id").collect().toSeq == df.orderBy($"id").collect().toSeq)
  }

  test("depth check: None→max, clip above, negative→error (HierarchyWideForm)") {
    assert(operators.WideForm.checkDepth("t", "y", Seq("a", "b"), None) == 2)
    assert(operators.WideForm.checkDepth("t", "y", Seq("a", "b"), Some(5)) == 2) // clipped
    assert(operators.WideForm.checkDepth("t", "y", Seq("a", "b"), Some(1)) == 1)
    intercept[operators.WideForm.NegativeHierarchyDepthError] {
      operators.WideForm.checkDepth("t", "y", Seq("a"), Some(-1))
    }
    // depth 0 → single all-true theme|type column
    val df = Seq(("1", "water", "river")).toDF("id", "subtype", "class")
    val out = operators.HierarchyWideForm("base", "water", Seq("subtype", "class"))
      .pivot(df, Seq("id"), Some(0))
    assert(out.columns.toSeq == Seq("id", "base|water"))
    assert(out.head().getBoolean(1))
  }

  test("P2 predicate compiler: DNF with nested columns") {
    val df = Seq(
      ("a", 0.99, "museum"), ("b", 0.5, "museum"), ("c", 0.99, "cafe"))
      .toDF("id", "confidence", "primary")
      .select($"id", $"confidence", struct($"primary").as("categories"))
    val pred = Pipeline.compileFilter(Seq(Seq(
      ("categories.primary", "==", "museum"), ("confidence", ">", 0.95))))
    assert(df.where(pred).select($"id").as[String].collect().toSeq == Seq("a"))
    val dnf = Pipeline.compileFilter(Seq(
      Seq(("id", "==", "b")), Seq(("id", "==", "c"))))
    assert(df.where(dnf).count() == 2)
  }

  test("P5 rectangle detection") {
    assert(Pipeline.isRectangle(Wkb.box(0, 0, 2, 1)))
    assert(Pipeline.isRectangle(Wkt.parse("POLYGON ((0 0, 2 0, 2 1, 0 1, 0 0))")))
    assert(!Pipeline.isRectangle(Wkt.parse("POLYGON ((0 0, 2 0, 1 1, 0 0))")))
    assert(!Pipeline.isRectangle(Wkt.parse("POLYGON ((0 0, 2 0, 2 1, 0 1.5, 0 0))")))
    assert(!Pipeline.isRectangle(Wkb.writePoint(1, 1)))
    // bowtie: same four corner VERTICES as the envelope but crossing
    // edges — vertex-set equality alone would wrongly skip the refine
    assert(!Pipeline.isRectangle(Wkt.parse("POLYGON ((0 0, 1 1, 1 0, 0 1, 0 0))")))
    // rotated traversal order (still a valid rectangle perimeter)
    assert(Pipeline.isRectangle(Wkt.parse("POLYGON ((2 0, 2 1, 0 1, 0 0, 2 0))")))
  }

  test("P1∧P3 composition: rectangle filter skips refine; non-rect applies it") {
    val feats = Seq((1L, 0.7, 0.6), (2L, 1.5, 1.5), (3L, 0.2, 0.1))
      .toDF("page_id", "lat", "lng")
      .withColumn("id", $"page_id".cast("string"))
      .withColumn("geometry", lit(Array[Byte](1)))
      .withColumn("bbox", struct($"lng".as("xmin"), $"lat".as("ymin"),
        $"lng".as("xmax"), $"lat".as("ymax")))
    // rectangle: pure bbox path
    val rect = Pipeline.convertGeometry(feats, "POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))")
    assert(rect.select($"page_id").as[Long].collect().toSet == Set(1L, 3L))
    // triangle (0,0)-(1,0)-(0,1): point (0.5,0.5) on hypotenuse-ish; (0.1,0.9) inside
    val tri = Pipeline.convertGeometry(feats, "POLYGON ((0 0, 1 0, 0 1, 0 0))")
    assert(tri.select($"page_id").as[Long].collect().toSet == Set(3L))
  }

  test("P4 projection: auto-adds id+geometry, schema order, MissingColumnError") {
    val df = Seq(("x", 1, 2, Array[Byte](1))).toDF("id", "a", "b", "geometry")
    val out = Pipeline.projectWithAutoKeys(df, Seq("b"))
    assert(out.columns.toSeq == Seq("id", "b", "geometry")) // schema order
    intercept[Pipeline.MissingColumnError] {
      Pipeline.projectWithAutoKeys(df, Seq("nope"))
    }
  }
}
