package graft

import graft.operators.AsOfJoin

class AsOfJoinSpec extends SparkTestBase {
  import spark.implicits._

  test("asof picks greatest right-time <= left-time; equal times match; no-match → null") {
    val left = Seq(
      (1L, 10L, 100L), (2L, 10L, 205L), (3L, 10L, 50L), // key 10
      (4L, 20L, 100L)                                    // key 20: no right rows
    ).toDF("event_id", "user_id", "ts_us")
    val right = Seq(
      (10L, 100L, 91L), // equal to left t=100 → matches (<=)
      (10L, 200L, 92L),
      (30L, 1L, 93L)
    ).toDF("user_id", "signup_us", "signup_id")
    val rows = AsOfJoin.asof(left, right, Seq("user_id"), "ts_us", "signup_us", Seq("signup_id"))
      .select($"event_id", $"asof_time", $"asof_signup_id")
      .collect().map(r => r.getLong(0) -> (Option(r.get(1)), Option(r.get(2)))).toMap
    assert(rows(1L) == ((Some(100L), Some(91L)))) // equal timestamp matches
    assert(rows(2L) == ((Some(200L), Some(92L)))) // latest prior
    assert(rows(3L) == ((None, None)))            // before any signup
    assert(rows(4L) == ((None, None)))            // key with no right rows
    // every left row emitted exactly once
    assert(rows.size == 4)
  }

  test("asof carries the matched row's NULL value (no fallback to an older row)") {
    val left = Seq((1L, 10L, 300L)).toDF("event_id", "user_id", "ts_us")
    val right = Seq(
      (10L, 100L, Some(91L)),
      (10L, 200L, None) // the asof match — its value is genuinely NULL
    ).toDF("user_id", "signup_us", "signup_id")
    val r = AsOfJoin.asof(left, right, Seq("user_id"), "ts_us", "signup_us", Seq("signup_id"))
      .select($"asof_time", $"asof_signup_id").head()
    assert(r.getLong(0) == 200L)
    assert(r.isNullAt(1), "matched row's NULL must not fall back to t=100's value")
  }

  test("asof on fractional time columns keeps sub-integer ordering") {
    // with a long cast both 1.2 and 1.9 truncate to 1 and the LATER right
    // row wins the tie-break — violating right-time <= left-time
    val left = Seq((1L, 10L, 1.2)).toDF("event_id", "user_id", "t")
    val right = Seq((10L, 0.5, 90L), (10L, 1.9, 91L)).toDF("user_id", "rt", "v")
    val r = AsOfJoin.asof(left, right, Seq("user_id"), "t", "rt", Seq("v"))
      .select($"asof_time", $"asof_v").head()
    assert(r.getDouble(0) == 0.5 && r.getLong(1) == 90L,
      s"expected the 0.5 row, got $r")
  }
}
