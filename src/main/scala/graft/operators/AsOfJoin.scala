package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — matches each left row to the single right row with the
  * greatest right-time ≤ left-time within the same key (SURVEY.md §2.3:
  * not present in the reference; an engine addition for event/page feeds).
  *
  * Implementation is the classic union-and-carry plan (no custom physical
  * operator needed): tag both sides, union by the (key, time) ordering,
  * carry the latest right row forward with `last(ignoreNulls)` over an
  * unbounded-preceding window, keep the left rows. One shuffle on the key
  * — the same exchange a sort-merge join would need, but without the
  * range-condition explosion of a naive `left.time >= right.time` join
  * (which is O(n·m) per key). Skew on hot keys is bounded by per-key data,
  * exactly like any windowed computation; salt upstream if a single key
  * exceeds a partition. */
object AsOfJoin {

  /** @param left      probe side (each row emitted once)
    * @param right     reference side (columns prefixed `asof_` in output)
    * @param keyCols   equality keys
    * @param leftTime  ordering column on the left
    * @param rightTime ordering column on the right
    * @param valueCols right columns to carry (besides the time)
    */
  /** Full-precision ordering key: timestamp columns compare at microsecond
    * precision (a bare cast("long") would truncate to whole seconds, letting
    * a right row LATER in the same second match — DuckDB's native ASOF, the
    * oracle, compares at full precision); numeric columns pass through. */
  private def orderKey(df: DataFrame, timeCol: String): Column =
    df.schema(timeCol).dataType match {
      case _: org.apache.spark.sql.types.TimestampType |
           _: org.apache.spark.sql.types.TimestampNTZType =>
        unix_micros(col(timeCol).cast("timestamp"))
      case _ => col(timeCol).cast("long")
    }

  def asof(left: DataFrame, right: DataFrame, keyCols: Seq[String],
           leftTime: String, rightTime: String,
           valueCols: Seq[String]): DataFrame = {
    val l = left
      .withColumn("_t", orderKey(left, leftTime))
      .withColumn("_isLeft", lit(1))
      .withColumn("_rt", lit(null).cast("long"))
      .withColumns(valueCols.map(c => s"_v_$c" -> lit(null).cast(right.schema(c).dataType.sql)).toMap)
    val r = right
      .select((keyCols.map(col) :+ col(rightTime)) ++ valueCols.map(col): _*)
      .withColumn("_t", orderKey(right, rightTime))
      .withColumn("_isLeft", lit(0))
      // asof_time output: micros for timestamp inputs, raw value otherwise
      .withColumn("_rt", orderKey(right, rightTime))
      .withColumns(valueCols.map(c => s"_v_$c" -> col(c)).toMap)
      .drop(rightTime +: valueCols: _*)
    val unioned = l.unionByName(r, allowMissingColumns = true)
    // right rows sort BEFORE left rows at the same instant (asof is <=)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("_t").asc, col("_isLeft").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val carried = unioned
      .withColumn("asof_time", last(col("_rt"), ignoreNulls = true).over(w))
      .withColumns(valueCols.map(c => s"asof_$c" -> last(col(s"_v_$c"), ignoreNulls = true).over(w)).toMap)
    carried.where(col("_isLeft") === 1)
      .drop(("_t" +: "_isLeft" +: "_rt" +: valueCols.map(c => s"_v_$c")): _*)
  }
}
