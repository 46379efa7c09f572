package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Sampling}

/** Deterministic sampling / per-key cap operators. */
class SamplingSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val rows = {
    val rnd = new scala.util.Random(5)
    (0L until 500L).map(i => (i, s"src${rnd.nextInt(7)}", rnd.nextInt(1000)))
  }
  private lazy val df = rows.toDF("id", "source", "score")

  test("hashBucket is stable, in-range, and roughly uniform") {
    val b = df.select(col("id"), Sampling.hashBucket(col("id"), 10).as("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(b.values.forall(x => x >= 0 && x < 10))
    val counts = b.values.groupBy(identity).map(_._2.size)
    assert(counts.min > 20, s"suspiciously skewed buckets: $counts") // ~50 expected
    // stable across evaluations
    val again = df.select(col("id"), Sampling.hashBucket(col("id"), 10).as("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(b == again)
  }

  test("hashSplit partitions every row into exactly one split") {
    val got = df.select(Sampling.hashSplit(col("id"), 1000, 50).as("s"))
      .groupBy("s").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.keySet == Set("train", "holdout"))
    assert(got.values.sum == 500)
    assert(got("holdout") > 5 && got("holdout") < 100) // ~25 expected at 5%
  }

  test("perKeyCap keeps at most k per key and salted == unsalted") {
    val ord = Dedup.hash60(col("id").cast("string"))
    val plain = Sampling.perKeyCap(df, "source", ord, "id", k = 9)
      .select("id").as[Long].collect().toSet
    val salted = Sampling.perKeyCap(df, "source", ord, "id", k = 9, salt = 8)
      .select("id").as[Long].collect().toSet
    assert(plain == salted)
    val perKey = Sampling.perKeyCap(df, "source", ord, "id", k = 9, salt = 8)
      .groupBy("source").count().collect().map(_.getLong(1))
    assert(perKey.forall(_ <= 9))
    // keys with fewer than k rows keep everything
    val small = Sampling.perKeyCap(df.limit(5), "source", ord, "id", k = 9, salt = 4)
    assert(small.count() == 5)
  }

  test("perKeyCap preserves the original schema") {
    val got = Sampling.perKeyCap(df, "source", col("score"), "id", k = 3, salt = 4)
    assert(got.columns.toSeq == Seq("id", "source", "score"))
  }

  test("stratifiedSample: exact rates, deterministic survivors, small keys kept whole") {
    val budget = 20L
    val got = Sampling.stratifiedSample(df, "source", "id", budget)
    // rate math: floor(10000 * budget / count_key), capped at 10000
    val counts = rows.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val rates = got.select(col("source"), col("rate_e4")).distinct()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rates.foreach { case (k, r) =>
      assert(r == math.min(10000L, 10000L * budget / counts(k)), s"key $k")
    }
    // survivors = exactly the rows whose hash bucket clears the key's rate
    val buckets = df.select(col("id"), Sampling.hashBucket(col("id"), 10000).as("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = rows.collect {
      case (id, src, _) if buckets(id) <
        math.min(10000L, 10000L * budget / counts(src)) => id
    }.toSet
    val ids = got.select("id").as[Long].collect().toSet
    assert(ids == expected)
    // a key with fewer rows than the budget keeps every row
    val tiny = Sampling.stratifiedSample(df.limit(8), "source", "id", budget)
    assert(tiny.count() == 8)
    // expected kept per key is near the budget for the big keys
    val kept = got.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    kept.foreach { case (k, n) =>
      if (counts(k) > budget) assert(n >= 8 && n <= 36, s"key $k kept $n of target $budget")
    }
  }
}
