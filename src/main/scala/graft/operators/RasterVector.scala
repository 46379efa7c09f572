package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Raster → vector materialization — the reverse direction of the tile
  * raster queries (`s_tile_raster` aggregates vector points INTO a raster;
  * this turns a classified raster back into vector geometry), completing
  * the north rule's "raster↔vector tile materialization at fixed zoom
  * levels".
  *
  * The algorithm is run-length vectorization: within each tile row,
  * maximal runs of x-adjacent tiles with the same class collapse into one
  * vector rectangle (the standard first stage of raster polygonization;
  * full polygon dissolve would additionally union rectangles across rows —
  * composable from this output with a y-direction second pass).
  *
  * Scale shape: the input is the RASTER — at most 4^zoom rows, already
  * reduced from the 10^12-point source by the tile aggregation — so the
  * row-window shuffle is bounded by the grid size, never by the data, and
  * the partition key (tile row) is uniform by construction.
  */
object RasterVector {

  /** Collapse each tile row into maximal runs of x-adjacent, same-class
    * tiles (gaps-and-islands: a run starts where the previous tile is
    * absent, non-adjacent, or differently classed). Returns one row per
    * run: (yCol, classCol, x_min, x_max, n_tiles, value_sum). */
  def vectorizeRuns(raster: DataFrame, xCol: String, yCol: String,
                    classCol: String, valueCol: String): DataFrame = {
    val byRow = Window.partitionBy(col(yCol)).orderBy(col(xCol))
    val cum = byRow.rowsBetween(Window.unboundedPreceding, 0)
    raster
      .withColumn("_px", lag(col(xCol), 1).over(byRow))
      .withColumn("_pc", lag(col(classCol), 1).over(byRow))
      .withColumn("_new",
        // null-safe class compare: a NULL-class tile must break the run
        // (plain =!= yields NULL there, falling through to "same run" and
        // merging distinct runs across the null tile)
        when(col("_px").isNull || col(xCol) =!= col("_px") + 1 ||
          !(col(classCol) <=> col("_pc")), 1L).otherwise(0L))
      .withColumn("_run", sum(col("_new")).over(cum))
      .groupBy(col(yCol), col("_run"), col(classCol))
      .agg(min(col(xCol)).as("x_min"), max(col(xCol)).as("x_max"),
        count(lit(1)).as("n_tiles"), sum(col(valueCol)).as("value_sum"))
      .select(col(yCol), col(classCol), col("x_min"), col("x_max"),
        col("n_tiles"), col("value_sum"))
  }
}
