package graft

import org.apache.spark.sql.functions._

/** Bucketed table layout — the co-location tool for repeated big joins at
  * 100 TB: both sides pre-hashed into the same bucket count on the join
  * key at WRITE time, so the join plans ZERO exchanges (no shuffle of
  * either side, ever again), and filters on the bucket key prune whole
  * buckets at file-listing level (SelectedBucketsCount). This is the
  * write-side complement of the Hilbert-sorted sink: SortedSink clusters
  * for SPATIAL predicates, bucketBy co-locates for KEY joins.
  */
class BucketedLayoutSpec extends SparkTestBase {
  import spark.implicits._

  private def withBucketTables[T](f: => T): T =
    try f
    finally {
      spark.sql("DROP TABLE IF EXISTS bkt_pages")
      spark.sql("DROP TABLE IF EXISTS bkt_meta")
    }

  test("same-bucketed join plans zero exchanges; key filter prunes buckets") {
    withBucketTables {
      val pages = (0L until 4000L).map(i => (i % 97, i, s"p$i"))
        .toDF("site_id", "page_id", "payload")
      val meta = (0L until 97L).map(i => (i, s"site$i"))
        .toDF("site_id", "site_name")
      pages.write.mode("overwrite").bucketBy(8, "site_id").sortBy("site_id")
        .format("parquet").saveAsTable("bkt_pages")
      meta.write.mode("overwrite").bucketBy(8, "site_id").sortBy("site_id")
        .format("parquet").saveAsTable("bkt_meta")

      val th = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      try {
        // force the sort-merge path: the point is that co-location removes
        // the shuffle even when nothing is broadcastable
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        val joined = spark.table("bkt_pages").join(spark.table("bkt_meta"), "site_id")
        val plan = joined.queryExecution.executedPlan.toString
        assert(!plan.contains("Exchange"),
          s"bucketed join must not shuffle either side:\n$plan")
        // correctness: identical to the plain (shuffled) join
        val expected = pages.join(meta, "site_id")
          .select("page_id", "site_name").as[(Long, String)].collect().toSet
        val got = joined.select("page_id", "site_name")
          .as[(Long, String)].collect().toSet
        assert(got == expected && got.size == 4000)
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", th)

      // bucket pruning: an equality filter on the bucket key reads ONE of
      // the 8 buckets at file-listing level. The planner auto-demotes
      // bucketed scans that feed no join (autoBucketedScan); pin it on so
      // the point-lookup path keeps the bucketed layout and prunes
      val abs = spark.conf.get("spark.sql.sources.bucketing.autoBucketedScan.enabled")
      try {
        spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
        val pruned = spark.table("bkt_pages").where(col("site_id") === 13L)
        val scan = pruned.queryExecution.executedPlan.toString
        assert(scan.contains("SelectedBucketsCount: 1 out of 8"),
          s"expected bucket pruning in scan:\n$scan")
        assert(pruned.count() == (0L until 4000L).count(_ % 97 == 13))
      } finally
        spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", abs)
    }
  }
}
