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
}
