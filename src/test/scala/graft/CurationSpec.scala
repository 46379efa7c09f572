package graft

import org.apache.spark.sql.functions._
import graft.operators.{Curation, Dedup, TextAnalysis}

/** PII redaction, C4-style filtering and paragraph-level dedup — the
  * round-5 curation transforms, against hand-computed fixtures. */
class CurationSpec extends SparkTestBase {
  import spark.implicits._

  test("redactPii: sequential semantics, hand-computed") {
    val df = Seq(
      (1L, "mail bob@x.com or sue@y.org from 10.0.0.7 call 555-123-4567 now"),
      // the IP inside the email's host is consumed BY the email match
      // host doesn't end in an alpha TLD → not an email, but IS an IP
      (2L, "ping admin@10.1.2.3 and 255.255.255.255"),
      (3L, "clean text, nothing personal here")
    ).toDF("id", "text")
    val out = df.select(col("id"), Curation.redactPii(col("text")).as("p"))
      .select(col("id"), col("p.redacted"), col("p.n_email"), col("p.n_ip"), col("p.n_phone"))
      .collect().sortBy(_.getLong(0))
    assert(out(0).getString(1) ==
      "mail <EMAIL> or <EMAIL> from <IP> call <PHONE> now")
    assert(out(0).getInt(2) == 2 && out(0).getInt(3) == 1 && out(0).getInt(4) == 1)
    // "admin@10.1.2.3" has no alpha TLD → no email match; both IPs redact
    assert(out(1).getString(1) == "ping admin@<IP> and <IP>")
    assert(out(1).getInt(2) == 0 && out(1).getInt(3) == 2)
    assert(out(2).getString(1) == "clean text, nothing personal here")
    assert(out(2).getInt(2) == 0 && out(2).getInt(3) == 0 && out(2).getInt(4) == 0)
  }

  test("c4Clean: line rules + document drops, hand-computed") {
    val good = "This line has five good words.\nshort one\nno terminal punct here at all\nAnother proper sentence right here!\nTiny.\n\nLast full line also keeps itself."
    val df = Seq(
      (1L, good),
      (2L, "Braces make it code { x }. More words ending properly here.\nAnd a third sentence appears now."),
      (3L, "Some Lorem Ipsum filler text here.\nMore sentences arrive directly after that.\nAnd then one more again."),
      (4L, "One sentence only with words.")
    ).toDF("id", "text")
    val out = df.select(col("id"), Curation.c4Clean(col("text"), minWords = 5, minSentences = 3).as("c"))
      .select(col("id"), col("c.clean_text"), col("c.n_kept"), col("c.n_total"), col("c.keep_doc"))
      .collect().sortBy(_.getLong(0))
    // doc 1: kept = lines 1, 4, 7 (terminal punct AND >= 5 words);
    //   "Tiny." fails the word count, "short one" fails both
    assert(out(0).getString(1) ==
      "This line has five good words.\nAnother proper sentence right here!\nLast full line also keeps itself.")
    assert(out(0).getInt(2) == 3 && out(0).getInt(3) == 6) // blank line not a line
    assert(out(0).getBoolean(4)) // 3 terminal marks >= 3, no brace, no lorem
    // doc 2: brace kills the document even though lines pass
    assert(!out(1).getBoolean(4))
    // doc 3: "lorem ipsum" (case-insensitive) kills the document
    assert(!out(2).getBoolean(4))
    // doc 4: lines fine but only 1 sentence < 3
    assert(out(3).getInt(2) == 1 && !out(3).getBoolean(4))
  }

  test("paraDedup keeps the global first occurrence, reassembles in order") {
    // units = 2-token chunks; "dup dup" appears in docs 1, 2 and twice in 3
    val df = Seq(
      (1L, "dup dup alpha beta"),
      (2L, "gamma delta dup dup"),
      (3L, "dup dup dup dup epsilon")
    ).toDF("doc_id", "text")
    val out = Dedup.paraDedup(df, "text", "doc_id",
        t => TextAnalysis.tokenChunks(Dedup.tokens(t), 2))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(out(0) == ((1L, "dup dup alpha beta", 2L, 2L)))
    assert(out(1) == ((2L, "gamma delta", 1L, 2L)))
    // doc 3: both "dup dup" chunks are repeats of doc 1's; tail "epsilon"
    // survives (odd token count → final 1-token chunk)
    assert(out(2) == ((3L, "epsilon", 1L, 3L)))
  }

  test("paraDedup plan: one shuffle on the unit hash, no window, no cartesian") {
    val df = Seq((1L, "a b c d")).toDF("doc_id", "text")
    val plan = Dedup.paraDedup(df, "text", "doc_id",
        t => TextAnalysis.tokenChunks(Dedup.tokens(t), 2))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), "survivor pick must be an aggregate, not a window")
    assert(!plan.contains("Cartesian"))
  }
}
