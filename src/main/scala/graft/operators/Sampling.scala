package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling / quota operators for training-data curation:
  * reproducible train-holdout splits (hash the id, never `rand()` — a
  * rerun or a late-arriving partition must land every row in the same
  * split) and per-key document caps (e.g. "at most K pages per source
  * domain"), the standard web-corpus balancing step.
  */
object Sampling {

  /** Deterministic bucket in [0, n): portable 60-bit md5 fold of the id,
    * mod n. Same value on every engine that has md5 (the DuckDB oracle
    * reproduces it exactly), stable across runs, uniform enough for split
    * assignment. Narrow projection — no shuffle. */
  def hashBucket(id: Column, n: Int): Column =
    pmod(Dedup.hash60(id.cast("string")), lit(n.toLong))

  /** Train/holdout split label: buckets [0, holdoutBuckets) of `nBuckets`
    * are "holdout", the rest "train". */
  def hashSplit(id: Column, nBuckets: Int, holdoutBuckets: Int): Column =
    when(hashBucket(id, nBuckets) < holdoutBuckets, lit("holdout"))
      .otherwise(lit("train"))

  /** Keep at most `k` rows per value of `keyCol`, chosen by the
    * deterministic total order (`orderCol` asc, `idCol` asc). Equivalent to
    * one row_number window per key, but SKEW-SAFE: with `salt > 1` a first
    * pass caps each of `salt` hash-shards of a key at k (so a hot key —
    * one domain with 10^9 pages — is capped by `salt` reducers in
    * parallel), and the final per-key window sees at most `salt * k` rows
    * per key instead of the key's full row count. Both passes are
    * streaming row_number windows (constant memory per reducer); the
    * per-shard top-k is a superset of the global top-k under the same
    * total order, so the result is identical to the unsalted window. */
  /** Stratified downsampling to an expected per-group row budget (the
    * corpus-rebalancing step behind per-language / per-domain mixture
    * control, cf. UniMax-style budget allocation): each group's keep-rate
    * is `min(1, budget / count_g)` in exact permyriad integers, and a row
    * survives iff its deterministic [[hashBucket]] (10000 buckets) falls
    * below the group's rate. Unlike [[perKeyCap]] this never shuffles the
    * FACT side: group counts are one map-side-combined aggregation, and
    * the survivor filter is a narrow projection after a keyed join of the
    * fact rows with the (group, rate) table — which stays UNhinted on
    * purpose (domains are unbounded at corpus scale; AQE broadcasts it
    * exactly when it is actually small, the `topTerms` lesson). Hash
    * sampling is exact-reproducible: reruns and late partitions keep the
    * same rows. Returns the surviving rows plus `rate_e4`. */
  def stratifiedSample(df: DataFrame, keyCol: String, idCol: String,
                       perKeyBudget: Long): DataFrame = {
    require(perKeyBudget > 0)
    val x = lit(10000L * perKeyBudget)
    val rates = df.groupBy(col(keyCol)).agg(count(lit(1)).as("_n"))
      .select(col(keyCol),
        least(lit(10000L),
          ((x - pmod(x, col("_n"))) / col("_n")).cast("long")).as("rate_e4"))
    df.join(rates, keyCol)
      .where(hashBucket(col(idCol), 10000) < col("rate_e4"))
  }

  def perKeyCap(df: DataFrame, keyCol: String, orderCol: Column, idCol: String,
                k: Int, salt: Int = 1): DataFrame = {
    val ord = Seq(orderCol.asc, col(idCol).asc)
    val preCapped =
      if (salt > 1) {
        val sharded = df.withColumn("_shard", pmod(xxhash64(col(idCol)), lit(salt.toLong)))
        sharded
          .withColumn("_rn", row_number().over(
            Window.partitionBy(col(keyCol), col("_shard")).orderBy(ord: _*)))
          .where(col("_rn") <= k)
          .drop("_shard", "_rn")
      } else df
    preCapped
      .withColumn("_rn", row_number().over(
        Window.partitionBy(col(keyCol)).orderBy(ord: _*)))
      .where(col("_rn") <= k)
      .drop("_rn")
  }
}
