package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorExpressions

/** Native vector kernels: value parity vs Spark's interpreted HOFs, plus a
  * CODEGEN_ONLY regression gate — round 3 shipped a `doGenCode` whose
  * generated call site (`VectorExpressions.VecOps$.MODULE$`) Janino could
  * not resolve, so every projection containing these expressions silently
  * fell back to interpreted eval. `factoryMode=CODEGEN_ONLY` turns that
  * silent fallback into a hard failure. */
class VectorExpressionsSpec extends SparkTestBase {
  import spark.implicits._

  private def withCodegenOnly[A](body: => A): A = {
    val key = "spark.sql.codegen.factoryMode"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "CODEGEN_ONLY")
    try body
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  private lazy val vecs = {
    val rnd = new scala.util.Random(11)
    (0L until 40L).map(i => (i, Seq.fill(16)(rnd.nextInt(2000).toLong - 1000)))
  }

  test("vec_dot_long matches the zip_with/aggregate HOF under CODEGEN_ONLY") {
    withCodegenOnly {
      val df = vecs.toDF("id", "v")
      val pairs = df.as("a").crossJoin(df.as("b"))
        .where(col("a.id") < col("b.id"))
      val got = pairs.select(col("a.id"), col("b.id"),
          VectorExpressions.vec_dot_long(col("a.v"), col("b.v")).as("dot"))
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      val exp = pairs.select(col("a.id"), col("b.id"),
          aggregate(zip_with(col("a.v"), col("b.v"), (x, y) => x * y),
            lit(0L), (acc, x) => acc + x).as("dot"))
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      assert(got == exp && got.nonEmpty)
    }
  }

  test("vec_dot_long survives being a filter predicate under CODEGEN_ONLY") {
    withCodegenOnly {
      val df = vecs.toDF("id", "v")
      val n = df.where(VectorExpressions.vec_dot_long(col("v"), col("v")) > lit(0L))
        .count()
      assert(n == 40)
    }
  }

  test("nearest_centroids matches a driver-side reference under CODEGEN_ONLY") {
    val rnd = new scala.util.Random(12)
    val cents = (0L until 5L).map(i => i -> Seq.fill(16)(rnd.nextGaussian()))
    val ref = vecs.map { case (id, v) =>
      val vd = v.map(_.toDouble)
      val nb = math.sqrt(vd.map(x => x * x).sum)
      val best = cents.map { case (cid, c) =>
        val dot = c.zip(vd).map { case (a, b) => a * b }.sum
        val na = math.sqrt(c.map(x => x * x).sum)
        (-(dot / (na * nb)), cid)
      }.sorted.take(2).map(_._2)
      id -> best
    }.toMap
    withCodegenOnly {
      val got = vecs.toDF("id", "v")
        .select(col("id"),
          VectorExpressions.nearest_centroids(col("v"), cents, 2).as("nc"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq).toMap
      assert(got == ref)
    }
  }
}
