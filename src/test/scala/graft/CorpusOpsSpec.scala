package graft

import org.apache.spark.sql.functions._
import graft.operators.CorpusOps

/** Corpus-level curation operators: benchmark decontamination and
  * distinctive-term extraction, against hand-computed fixtures. */
class CorpusOpsSpec extends SparkTestBase {
  import spark.implicits._

  test("flagOverlap flags exactly the train docs sharing an n-gram") {
    val evalDocs = Seq(
      (100L, "the quick brown fox jumps over the lazy dog"),
      (101L, "pack my box with five dozen liquor jugs")
    ).toDF("doc_id", "text")
    val trainDocs = Seq(
      // shares "quick brown fox jumps" (one 4-shingle window, shifted)
      (1L, "a very quick brown fox jumps high today"),
      // shares nothing 4 tokens long (only 3-token overlap "my box with")
      (2L, "pack my box with care please"),
      // shares two distinct 4-shingles with eval 101
      (3L, "pack my box with five dozen eggs"),
      // disjoint
      (4L, "completely unrelated text about spark plans")
    ).toDF("doc_id", "text")
    val got = CorpusOps.flagOverlap(trainDocs, evalDocs, "text", "doc_id", n = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // doc 2: "pack my box with" IS a shared 4-shingle — count the windows:
    // eval 101 shingles include "pack my box with", "my box with five", …
    // doc 2 windows: "pack my box with", "my box with care", "box with care
    // please" → exactly one shared. doc 3 windows include "pack my box
    // with" and "my box with five" and "box with five dozen" → three.
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 3L))
  }

  test("flagOverlap is empty when nothing overlaps") {
    val e = Seq((9L, "alpha beta gamma delta")).toDF("doc_id", "text")
    val t = Seq((1L, "one two three four five")).toDF("doc_id", "text")
    assert(CorpusOps.flagOverlap(t, e, "text", "doc_id", 4).count() == 0)
  }

  test("topTerms ranks by (tf desc, df asc, term asc)") {
    val docs = Seq(
      (1L, "apple apple banana cherry"),   // tf: apple 2, banana 1, cherry 1
      (2L, "banana banana cherry"),        // tf: banana 2, cherry 1
      (3L, "cherry date")                  // tf: cherry 1, date 1
    ).toDF("doc_id", "text")
    // df: apple 1, banana 2, cherry 3, date 1
    val got = CorpusOps.topTerms(docs, "text", "doc_id", k = 2)
      .collect().map(r => (r.getLong(0), r.getInt(4)) -> (r.getString(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(got((1L, 1)) == ("apple", 2L, 1L))   // top tf
    assert(got((1L, 2)) == ("banana", 1L, 2L))  // tf tie 1: df 2 < cherry's 3
    assert(got((2L, 1)) == ("banana", 2L, 2L))
    assert(got((2L, 2)) == ("cherry", 1L, 3L))
    assert(got((3L, 1)) == ("date", 1L, 1L))    // tf tie: rarer term first
    assert(got((3L, 2)) == ("cherry", 1L, 3L))
  }

  test("topTerms carries no broadcast hint and survives the non-broadcast path") {
    val docs = Seq(
      (1L, "apple apple banana cherry"),
      (2L, "banana banana cherry"),
      (3L, "cherry date")
    ).toDF("doc_id", "text")
    val plan = CorpusOps.topTerms(docs, "text", "doc_id", k = 2)
    // the df table is unbounded-cardinality at corpus scale: a hard
    // broadcast() hint would override Spark's size check and OOM — the
    // plan must leave the join strategy to the optimizer/AQE
    def hasHint(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Boolean =
      p.collectFirst {
        case h: org.apache.spark.sql.catalyst.plans.logical.ResolvedHint => h
        case u: org.apache.spark.sql.catalyst.plans.logical.UnresolvedHint => u
      }.isDefined
    assert(!hasHint(plan.queryExecution.logical),
      "topTerms must not hard-broadcast the unbounded df table")
    val expected = plan.collect().map(_.toSeq).toSet
    // force the non-broadcast join path and prove results are identical
    val th = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val got = CorpusOps.topTerms(docs, "text", "doc_id", k = 2)
      val exec = got.queryExecution.executedPlan
      assert(!exec.toString.contains("BroadcastHashJoin"),
        "threshold -1 must actually exercise the non-broadcast path")
      assert(got.collect().map(_.toSeq).toSet == expected)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", th)
  }
}
