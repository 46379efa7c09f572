package graft

import graft.operators.RasterVector

class RasterVectorSpec extends SparkTestBase {
  import spark.implicits._

  test("vectorizeRuns merges exactly the maximal x-adjacent same-class runs") {
    // row 0: [0,1,2]=a (run), 4=a (gap), 5=b (class change)
    // row 1: 0=a, 1=b, 2=b  — class change mid-row
    val raster = Seq(
      (0L, 0L, "a", 10L), (1L, 0L, "a", 20L), (2L, 0L, "a", 30L),
      (4L, 0L, "a", 40L), (5L, 0L, "b", 50L),
      (0L, 1L, "a", 1L), (1L, 1L, "b", 2L), (2L, 1L, "b", 3L)
    ).toDF("tile_x", "tile_y", "klass", "v")
    val got = RasterVector.vectorizeRuns(raster, "tile_x", "tile_y", "klass", "v")
      .as[(Long, String, Long, Long, Long, Long)].collect().toSet
    val exp = Set(
      (0L, "a", 0L, 2L, 3L, 60L),
      (0L, "a", 4L, 4L, 1L, 40L),
      (0L, "b", 5L, 5L, 1L, 50L),
      (1L, "a", 0L, 0L, 1L, 1L),
      (1L, "b", 1L, 2L, 2L, 5L))
    assert(got == exp)
  }

  test("vectorizeRuns: a NULL-class tile breaks the run (null-safe compare regression)") {
    // x=0 'a', x=1 NULL, x=2 'a' — with a non-null-safe compare all three
    // merged into one class-'a' rectangle spanning the NULL tile
    val raster = Seq(
      (0L, 0L, Some("a"), 1L), (1L, 0L, None, 2L), (2L, 0L, Some("a"), 3L)
    ).toDF("tile_x", "tile_y", "klass", "v")
    val got = RasterVector.vectorizeRuns(raster, "tile_x", "tile_y", "klass", "v")
      .as[(Long, Option[String], Long, Long, Long, Long)].collect().toSet
    val exp = Set(
      (0L, Some("a"), 0L, 0L, 1L, 1L),
      (0L, None, 1L, 1L, 1L, 2L),
      (0L, Some("a"), 2L, 2L, 1L, 3L))
    assert(got == exp)
  }

  test("vectorizeRuns: every input tile lands in exactly one run (tile-count invariant)") {
    val rnd = new scala.util.Random(5)
    val raster = (for {
      y <- 0L until 16L; x <- 0L until 32L
      if rnd.nextDouble() < 0.7
    } yield (x, y, if (rnd.nextBoolean()) "hi" else "lo", rnd.nextInt(100).toLong))
      .toDF("tile_x", "tile_y", "klass", "v")
    val runs = RasterVector.vectorizeRuns(raster, "tile_x", "tile_y", "klass", "v")
    val nTiles = runs.agg(org.apache.spark.sql.functions.sum($"n_tiles")).as[Long].head()
    assert(nTiles == raster.count())
    // runs within a row never overlap
    val byRow = runs.select($"tile_y", $"x_min", $"x_max").as[(Long, Long, Long)]
      .collect().groupBy(_._1)
    byRow.values.foreach { rs =>
      val sorted = rs.sortBy(_._2)
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a._3 < b._2, s"overlapping runs $a $b")
        case _ =>
      }
    }
  }
}
