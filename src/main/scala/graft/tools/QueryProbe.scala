package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only: time one SparkEntry query and print its physical plan. */
object QueryProbe {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fn = graft.SparkEntry.queries(name)
    // cold first (what the driver bench pays), then warm
    val tc0 = System.nanoTime()
    fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    val cold = (System.nanoTime() - tc0) / 1e9
    val t0 = System.nanoTime()
    val df = fn(spark, sfDir)
    df.write.format("noop").mode("overwrite").save()
    println(f"QUERY=$name COLD=$cold%.3f TIME=${(System.nanoTime() - t0) / 1e9}%.3f")
    println(df.queryExecution.executedPlan.toString.take(6000))
    spark.stop()
  }
}
