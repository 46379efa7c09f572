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

  test("U2 combine: unionByName + COALESCE(false) for missing boolean columns") {
    val a = Seq(("1", true)).toDF("id", "x|p")
    val b = Seq(("2", true)).toDF("id", "x|q")
    val got = WideForm.combineWide(Seq(a, b), nonBoolCols = Set("id"))
      .orderBy($"id").collect()
    assert(got.map(_.getBoolean(1)).toSeq == Seq(true, false)) // x|p
    assert(got.map(_.getBoolean(2)).toSeq == Seq(false, true)) // x|q
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
