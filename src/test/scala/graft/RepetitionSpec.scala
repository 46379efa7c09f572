package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, TextAnalysis => TA}

/** Gopher-style repetition signals (Rae et al. 2021 Table A1) against
  * hand-computed fixtures — real newlines, paragraphs and symbols (the
  * driver-gated d_repetition query synthesizes line structure because the
  * parquet fixture is single-line; THIS spec covers the natural units). */
class RepetitionSpec extends SparkTestBase {
  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column, text: String): Any =
    Seq(text).toDF("text").select(c.as("v")).collect()(0).get(0)

  test("textLines / textParagraphs split and drop empties") {
    val t = "aa bb\naa bb\ncc\n\ndd ee\n\ndd ee"
    assert(one(TA.textLines(col("text")), t) ===
      Seq("aa bb", "aa bb", "cc", "dd ee", "dd ee"))
    assert(one(TA.textParagraphs(col("text")), t) ===
      Seq("aa bb\naa bb\ncc", "dd ee", "dd ee"))
  }

  test("duplicate line / paragraph fractions (hand-computed)") {
    val t = "aa bb\naa bb\ncc\n\ndd ee\n\ndd ee"
    // lines: 5 total, 3 distinct -> (5-3)/5 = 0.4 -> 4000
    assert(one(TA.dupUnitFracE4(TA.textLines(col("text"))), t) === 4000L)
    // chars: all lines 5+5+2+5+5=22, distinct 5+2+5=12 -> 10/22 -> 4545
    assert(one(TA.dupUnitCharFracE4(TA.textLines(col("text"))), t) === 4545L)
    // paragraphs: 3 total, 2 distinct -> 1/3 -> 3333
    assert(one(TA.dupUnitFracE4(TA.textParagraphs(col("text"))), t) === 3333L)
  }

  test("no duplicates -> zero; empty -> zero (not NaN / error)") {
    assert(one(TA.dupUnitFracE4(TA.textLines(col("text"))), "a\nb\nc") === 0L)
    assert(one(TA.dupUnitFracE4(TA.textLines(col("text"))), "") === 0L)
    assert(one(TA.dupUnitCharFracE4(TA.textLines(col("text"))), "") === 0L)
  }

  test("topRunStats: most frequent element, ties to lex-smallest") {
    val df = Seq(Seq("z", "a", "z", "a")).toDF("arr")
    val r = df.select(TA.topRunStats(col("arr")).as("s"))
      .select(col("s.cnt"), col("s.value")).collect()(0)
    assert(r.getLong(0) === 2L && r.getString(1) === "a")
    val r2 = Seq(Seq("b", "c", "b", "b")).toDF("arr")
      .select(TA.topRunStats(col("arr")).as("s"))
      .select(col("s.cnt"), col("s.value")).collect()(0)
    assert(r2.getLong(0) === 3L && r2.getString(1) === "b")
  }

  test("ngramsAll keeps multiplicity (unlike Dedup.shingles)") {
    val df = Seq("a b a b a c").toDF("text")
      .select(Dedup.tokens(col("text")).as("tk"))
    assert(df.select(TA.ngramsAll(col("tk"), 2).as("g")).collect()(0)
      .getSeq[String](0) === Seq("a b", "b a", "a b", "b a", "a c"))
    // short doc -> empty, not error
    val s = Seq("a").toDF("text").select(Dedup.tokens(col("text")).as("tk"))
    assert(s.select(TA.ngramsAll(col("tk"), 2).as("g")).collect()(0)
      .getSeq[String](0).isEmpty)
  }

  test("top n-gram character fraction (hand-computed)") {
    // "a b a b a c": top 2-gram "a b" (count 2, ties "b a" -> lex smaller),
    // len("a b") = 3, text len 11 -> 10000*2*3/11 = 5454
    val df = Seq("a b a b a c").toDF("text").select(
      col("text"), length(col("text")).cast("long").as("tl"),
      Dedup.tokens(col("text")).as("tk"))
    assert(df.select(TA.topNgramCharFracE4(col("tk"), 2, col("tl")).as("v"))
      .collect()(0).getLong(0) === 5454L)
    // n larger than the doc -> 0
    assert(df.select(TA.topNgramCharFracE4(col("tk"), 7, col("tl")).as("v"))
      .collect()(0).getLong(0) === 0L)
  }

  test("symbol-to-word ratio counts #, …, and ... (hand-computed)") {
    // 3 symbols over 5 whitespace tokens -> 6000
    val v = Seq(("# hello ... world …", 5L)).toDF("text", "n")
      .select(TA.symbolWordRatioE4(col("text"), col("n")).as("v"))
      .collect()(0).getLong(0)
    assert(v === 6000L)
    // four dots = one '...' (non-overlapping), zero words -> 0 (guard)
    val z = Seq(("....", 0L)).toDF("text", "n")
      .select(TA.symbolWordRatioE4(col("text"), col("n")).as("v"))
      .collect()(0).getLong(0)
    assert(z === 0L)
  }

  test("tokenChunks: non-overlapping width-w windows, ragged tail") {
    val df = Seq("a b c d e").toDF("text").select(Dedup.tokens(col("text")).as("tk"))
    assert(df.select(TA.tokenChunks(col("tk"), 2).as("c")).collect()(0)
      .getSeq[String](0) === Seq("a b", "c d", "e"))
    val empty = Seq("  ").toDF("text").select(Dedup.tokens(col("text")).as("tk"))
    assert(empty.select(TA.tokenChunks(col("tk"), 2).as("c")).collect()(0)
      .getSeq[String](0).isEmpty)
  }

  test("permyriad floor division is exact at boundaries") {
    val df = Seq((1L, 3L), (1L, 2L), (0L, 5L), (5L, 0L), (3L, 3L))
      .toDF("num", "den")
    assert(df.select(TA.permyriad(col("num"), col("den")).as("v"))
      .collect().map(_.getLong(0)).toSeq === Seq(3333L, 5000L, 0L, 0L, 10000L))
  }

  test("Gopher mean word length / alpha-word / bullet / ellipsis (hand-computed)") {
    // tokens: "abcd" (4) "ee" (2) "fff" (3) "12" (0 alpha) — mean = 11/4
    val toks = Dedup.tokens(col("text"))
    assert(one(TA.meanWordLenE2(toks), "abcd ee, fff 12") === 275L)
    assert(one(TA.alphaWordFracE4(toks), "abcd ee, fff 12") === 7500L)
    // lines: bullet, plain, ellipsis-char, three-dot — 1/4 and 2/4
    val lines = TA.textLines(col("text"))
    val t = "• item one\nplain line\ntrails off…\nmore dots..."
    assert(one(TA.bulletLineFracE4(lines), t) === 2500L)
    assert(one(TA.ellipsisLineFracE4(lines), t) === 5000L)
    // dash bullet counts too; empty text → all zeros
    assert(one(TA.bulletLineFracE4(lines), "- dash bullet\nx") === 5000L)
    assert(one(TA.meanWordLenE2(toks), "") === 0L)
    assert(one(TA.bulletLineFracE4(lines), "") === 0L)
  }

  test("subwordCountPortable: tokens + non-overlapping boundary matches") {
    val c = TA.subwordCountPortable(col("text"))
    // 2 tokens + boundaries in "camelCase" (lC) and "v2go" (v2, 2g →
    // NON-overlapping: 'v2' consumes the 2, so '2g' can't match — 1 only)
    assert(one(c, "camelCase v2go") === 2L + 1L + 1L)
    // "a1b2c": a1 consumed, b2 consumed, trailing c unpaired → 2 matches
    assert(one(c, "a1b2c") === 1L + 2L)
    // pure lowercase text adds nothing
    assert(one(c, "plain words only") === 3L)
    assert(one(c, "") === 0L)
    // "Doc123Xy": c→1 boundary (c1), 3→X boundary (3X) → 2 matches
    assert(one(c, "Doc123Xy") === 1L + 2L)
  }
}
