package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window / time-series operators (SURVEY.md §2.5) — rolling means,
  * pct-change, forward/backward fill, linear interpolation, time
  * densification. All are built-in window expressions (whole-stage codegen
  * keeps them in one shuffle per partitioning).
  */
object WindowOps {

  /** groupby(entity).rolling(window=n, min_periods=m).mean() analogue
    * (/root/reference/lib/catalog/owid/catalog/core/tables.py:2013-2061;
    * covid usage cases_deaths.py:199). */
  def rollingMean(
      df: DataFrame,
      keys: Seq[String],
      orderCol: String,
      valueCols: Seq[String],
      window: Int,
      minPeriods: Int
  ): DataFrame = {
    val w = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col(orderCol))
      .rowsBetween(-(window - 1), 0)
    valueCols.foldLeft(df) { (d, c) =>
      d.withColumn(
        c + "_rolling",
        when(count(col(c)).over(w) >= minPeriods, avg(col(c)).over(w)))
    }
  }

  /** pct_change(periods=n) per group —
    * (/root/reference/lib/catalog/owid/catalog/core/indicators.py:400;
    * covid cases_deaths.py:210). */
  def pctChange(
      df: DataFrame,
      keys: Seq[String],
      orderCol: String,
      valueCol: String,
      periods: Int = 1
  ): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(orderCol))
    df.withColumn(
      valueCol + "_pct_change",
      col(valueCol) / lag(col(valueCol), periods).over(w) - 1)
  }

  /** Cumulative sum per group (covid running totals). */
  def cumsum(
      df: DataFrame,
      keys: Seq[String],
      orderCol: String,
      valueCol: String
  ): DataFrame = {
    val w = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, 0)
    df.withColumn(valueCol + "_cumsum", sum(col(valueCol)).over(w))
  }

  /** Forward fill within group — groupby(...).ffill()
    * (covid cases_deaths.py:66-67): last non-null value up to current row. */
  def ffill(
      df: DataFrame,
      keys: Seq[String],
      orderCol: String,
      valueCols: Seq[String]
  ): DataFrame = {
    val w = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, 0)
    valueCols.foldLeft(df)((d, c) =>
      d.withColumn(c, last(col(c), ignoreNulls = true).over(w)))
  }

  /** Backward fill within group (mirror of ffill). */
  def bfill(
      df: DataFrame,
      keys: Seq[String],
      orderCol: String,
      valueCols: Seq[String]
  ): DataFrame = {
    val w = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col(orderCol))
      .rowsBetween(0, Window.unboundedFollowing)
    valueCols.foldLeft(df)((d, c) =>
      d.withColumn(c, first(col(c), ignoreNulls = true).over(w)))
  }

  /** Linear interpolation of gaps per entity — `interpolate_table`
    * (/root/reference/etl/data_helpers/misc.py:77-124). Implemented as two
    * ignore-nulls window pairs (previous known value+time, next known
    * value+time) + the linear formula; interior gaps only (limit_area=
    * "inside" semantics, the reference default for series interpolation).
    */
  def interpolate(
      df: DataFrame,
      keys: Seq[String],
      timeCol: String,
      valueCol: String
  ): DataFrame = {
    val wPrev = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col(timeCol))
      .rowsBetween(Window.unboundedPreceding, 0)
    val wNext = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col(timeCol))
      .rowsBetween(0, Window.unboundedFollowing)
    val prevV = last(col(valueCol), ignoreNulls = true).over(wPrev)
    val prevT = last(when(col(valueCol).isNotNull, col(timeCol)), ignoreNulls = true).over(wPrev)
    val nextV = first(col(valueCol), ignoreNulls = true).over(wNext)
    val nextT = first(when(col(valueCol).isNotNull, col(timeCol)), ignoreNulls = true).over(wNext)
    val interpolated = prevV +
      (nextV - prevV) * (col(timeCol) - prevT).cast("double") /
      (nextT - prevT).cast("double")
    df.withColumn(
      valueCol,
      when(col(valueCol).isNotNull, col(valueCol))
        .when(prevV.isNotNull && nextV.isNotNull, interpolated)
        .otherwise(lit(null)))
  }

  /** Densify a time series per entity — `expand_time_column` method
    * "full_range_entity" (/root/reference/etl/data_helpers/misc.py:127-376):
    * one row per integer time in [min, max] of each entity, values NULL in
    * the gaps (combine with ffill/interpolate for the fill strategies).
    * Built with sequence+explode+left-join: no cross product, no driver loop.
    */
  def expandTimeColumn(
      df: DataFrame,
      keys: Seq[String],
      timeCol: String
  ): DataFrame = {
    val spine = df
      .groupBy(keys.map(col): _*)
      .agg(min(col(timeCol)).as("__t0"), max(col(timeCol)).as("__t1"))
      .select(
        (keys.map(col) :+
          explode(sequence(col("__t0"), col("__t1"))).as(timeCol)): _*)
    spine.join(df, keys :+ timeCol, "left")
  }

  /** One row per time unit in [start, end), value scaled by 1/len when
    * requested — `explode_rows_by_time_range` (misc.py:379-436). */
  def explodeByTimeRange(
      df: DataFrame,
      startCol: String,
      endCol: String,
      outCol: String,
      valueCols: Seq[String],
      scale: Boolean
  ): DataFrame = {
    val len = (col(endCol) - col(startCol)).cast("double")
    val exploded = df.withColumn(
      outCol,
      explode(sequence(col(startCol), col(endCol) - 1)))
    val scaled =
      if (scale)
        valueCols.foldLeft(exploded)((d, c) => d.withColumn(c, col(c) / len))
      else exploded
    scaled.drop(startCol, endCol)
  }
}
