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
  /** Full-precision ordering key: timestamp/date columns compare at
    * microsecond precision (a bare cast("long") would truncate to whole
    * seconds, letting a right row LATER in the same second match —
    * DuckDB's native ASOF, the oracle, compares at full precision);
    * fractional numerics keep their fraction (casting them to long would
    * re-introduce the same truncation); integrals pass through. */
  private def orderKey(df: DataFrame, timeCol: String): Column = {
    import org.apache.spark.sql.types._
    df.schema(timeCol).dataType match {
      case _: TimestampType | _: TimestampNTZType | _: DateType =>
        unix_micros(col(timeCol).cast("timestamp"))
      case _: DoubleType | _: FloatType | _: DecimalType =>
        col(timeCol).cast("double")
      case _ => col(timeCol).cast("long")
    }
  }

  def asof(left: DataFrame, right: DataFrame, keyCols: Seq[String],
           leftTime: String, rightTime: String,
           valueCols: Seq[String]): DataFrame = {
    // The matched right row rides as ONE non-null struct (the struct is
    // non-null even when every carried value is null), so a matched row
    // with a genuinely-NULL value column is not confused with the left
    // placeholder — last(ignoreNulls) over per-column nullable carries
    // would skip back to an OLDER row's value for that column.
    val r = right
      .select((keyCols.map(col) :+ col(rightTime)) ++ valueCols.map(col): _*)
      .withColumn("_t", orderKey(right, rightTime))
      .withColumn("_isLeft", lit(0))
      // asof_time inside the struct: micros for timestamp inputs, raw otherwise
      .withColumn("_rv", struct(col("_t").as("_rt") +: valueCols.map(col): _*))
      .drop(rightTime +: valueCols: _*)
    val rvType = r.schema("_rv").dataType
    val l = left
      .withColumn("_t", orderKey(left, leftTime))
      .withColumn("_isLeft", lit(1))
      .withColumn("_rv", lit(null).cast(rvType))
    val unioned = l.unionByName(r, allowMissingColumns = true)
    // right rows sort BEFORE left rows at the same instant (asof is <=)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("_t").asc, col("_isLeft").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    unioned
      .withColumn("_carry", last(col("_rv"), ignoreNulls = true).over(w))
      .where(col("_isLeft") === 1)
      .withColumn("asof_time", col("_carry._rt"))
      .withColumns(valueCols.map(c => s"asof_$c" -> col(s"_carry.$c")).toMap)
      .drop("_t", "_isLeft", "_rv", "_carry")
  }
}
