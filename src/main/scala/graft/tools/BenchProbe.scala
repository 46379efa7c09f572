package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.geofunctions._

/** Dev-only probe: isolate scan vs encode vs join vs tiles scaling. */
object BenchProbe {
  def session(cores: Int, gc: String): SparkSession = {
    val s = SparkSession.builder().master(s"local[$cores]")
      .appName(s"probe$cores")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.files.maxPartitionBytes", String.valueOf(24L * 1024 * 1024))
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR"); s
  }
  def t(body: => Unit): Double = { val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9 }
  def go(df: DataFrame): Unit = df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    // the bench's default materialized input (see Bench.materializeInput)
    val input = sys.env.getOrElse("SPARK_GRAFT_PROBE_INPUT",
      "/root/repo/target/bench_pages_rep768-_root_testdata_sf0.1")
    val sfDir = "/root/testdata/sf0.1"
    for (cores <- Seq(32, 8)) {
      val spark = session(cores, "")
      def pages = spark.read.parquet(input)
      val polys = graft.sources.DerivedTables.polygons(spark, sfDir)
      def scanOnly = pages.select(col("page_id"))
      def scanAll = pages
      def enc = pages.withColumn("c", cell_encode(col("lat"), col("lng"), 5))
      def joined = graft.operators.SpatialJoin.pointsInPolygons(pages, polys, res = 5)
      def flag = joined
        .withColumn("tx", tile_x(col("lng"), 12)).withColumn("ty", tile_y(col("lat"), 12))
      go(flag) // warm
      val r = Seq(
        "scan1col" -> Seq.fill(2)(t(go(scanOnly))).min,
        "scanAll" -> Seq.fill(2)(t(go(scanAll))).min,
        "encode" -> Seq.fill(2)(t(go(enc))).min,
        "join" -> Seq.fill(2)(t(go(joined))).min,
        "flagship" -> Seq.fill(2)(t(go(flag))).min)
      println(s"CORES=$cores " + r.map { case (k, v) => f"$k=$v%.2f" }.mkString(" "))
      spark.stop()
    }
  }
}
