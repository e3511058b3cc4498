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

  /** Doubling time in periods — `pct_change_to_doubling_days`
    * (/root/reference/etl/steps/data/garden/covid/latest/cases_deaths.py:
    * 223-262): periods · ln(2) / ln(1 + pct_change) over an n-period lag,
    * NULL when the series is flat or shrinking (log ≤ 0). */
  def doublingTime(
      df: DataFrame,
      keys: Seq[String],
      orderCol: String,
      valueCol: String,
      periods: Int
  ): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(orderCol))
    val pct = col(valueCol) / lag(col(valueCol), periods).over(w) - 1
    df.withColumn(
      valueCol + "_doubling",
      when(pct > 0, lit(periods) * log(lit(2.0)) / log(lit(1.0) + pct)))
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
    * value+time) + the linear formula — one shuffle, stays in codegen.
    *
    * `limitDirection` / `limitArea` mirror pandas `Series.interpolate`
    * (the reference's transform at misc.py:118-121; defaults
    * limit_direction="both", limit_area=None at misc.py:82-83):
    *  - interior gaps (known point on both sides) interpolate linearly,
    *    time-weighted on `timeCol`;
    *  - leading gaps clamp to the first known value when direction allows
    *    "backward"; trailing gaps clamp to the last known value when
    *    direction allows "forward" (np.interp endpoint clamping);
    *  - limitArea "inside" keeps only interior fills, "outside" only the
    *    clamped edges.
    */
  def interpolate(
      df: DataFrame,
      keys: Seq[String],
      timeCol: String,
      valueCol: String,
      limitDirection: String = "both",
      limitArea: Option[String] = None
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
    val fillInside = limitArea.forall(_ == "inside")
    val fillOutside = limitArea.forall(_ == "outside")
    val forward = limitDirection == "forward" || limitDirection == "both"
    val backward = limitDirection == "backward" || limitDirection == "both"
    var out = when(col(valueCol).isNotNull, col(valueCol))
    if (fillInside)
      out = out.when(prevV.isNotNull && nextV.isNotNull, interpolated)
    if (fillOutside && forward) // trailing gap: clamp to last known
      out = out.when(prevV.isNotNull && nextV.isNull, prevV.cast("double"))
    if (fillOutside && backward) // leading gap: clamp to first known
      out = out.when(prevV.isNull && nextV.isNotNull, nextV.cast("double"))
    df.withColumn(valueCol, out.otherwise(lit(null)))
  }

  /** Densify a time series — the full `expand_time_column` method family
    * (/root/reference/etl/data_helpers/misc.py:127-376). Adds one row per
    * missing time; new rows carry NULL values, then `fillna` strategies are
    * applied in order. All distributed: sequence+explode+join spines, no
    * cross product, no driver loop.
    *
    * `method` (misc.py:146-151):
    *  - "full_range_entity": per-entity [min, max] spine;
    *  - "full_range": every observed key combo × the global [min, max]
    *    range (the reference's MultiIndex.from_product of per-dimension
    *    uniques × complete range, misc.py:263-283);
    *  - "observed": every observed key combo × every time observed anywhere;
    *  - "none": no densification (use with since/until only).
    *
    * `sinceTime`/`untilTime` (misc.py:286-335): extend each observed key
    * combo backwards to `sinceTime` / forwards to `untilTime` beyond its own
    * [min, max] — built directly from per-key bounds (equivalent to the
    * reference's product+bounds-merge+filter, without materializing the
    * product).
    *
    * `fillna` (misc.py:338-368): any of "interpolate" (interior-only, as the
    * reference hardcodes limit_area="inside" at misc.py:349), "ffill",
    * "bfill", "zero", applied left to right over every non-key column.
    */
  def expandTimeColumn(
      df: DataFrame,
      keys: Seq[String],
      timeCol: String,
      method: String = "full_range_entity",
      sinceTime: Option[Int] = None,
      untilTime: Option[Int] = None,
      fillna: Seq[String] = Nil
  ): DataFrame = {
    require(
      Set("full_range_entity", "full_range", "observed", "none")(method),
      s"expand_time_column: unknown method '$method'")
    val valueCols = df.columns.filterNot((keys :+ timeCol).contains).toSeq

    // key-combo spine: per-dimension distinct values crossed (the
    // reference's from_product). Dimension domains are small (entities,
    // sexes, age groups) — each distinct is one shuffle of a slim column.
    def keyCombos = keys
      .map(k => df.select(k).distinct())
      .reduce((a, b) => a.crossJoin(b))

    val densified = method match {
      case "none" => df
      case "full_range_entity" =>
        val spine = df
          .groupBy(keys.map(col): _*)
          .agg(min(col(timeCol)).as("__t0"), max(col(timeCol)).as("__t1"))
          .select(
            (keys.map(col) :+
              explode(sequence(col("__t0"), col("__t1"))).as(timeCol)): _*)
        spine.join(df, (keys :+ timeCol).toSeq, "left")
      case "full_range" =>
        val bounds = df.agg(
          min(col(timeCol)).as("__t0"), max(col(timeCol)).as("__t1"))
        val times = bounds.select(
          explode(sequence(col("__t0"), col("__t1"))).as(timeCol))
        keyCombos.crossJoin(times).join(df, (keys :+ timeCol).toSeq, "left")
      case "observed" =>
        val times = df.select(timeCol).distinct()
        keyCombos.crossJoin(times).join(df, (keys :+ timeCol).toSeq, "left")
    }

    // since/until extension beyond each key combo's own observed bounds
    val extended =
      if (sinceTime.isEmpty && untilTime.isEmpty) densified
      else {
        val bounds = densified
          .groupBy(keys.map(col): _*)
          .agg(min(col(timeCol)).as("__mn"), max(col(timeCol)).as("__mx"))
        def seqIf(from: Column, to: Column): Column =
          when(to >= from, sequence(from, to))
            .otherwise(array().cast("array<int>"))
        val before = sinceTime
          .map(s => seqIf(lit(s), col("__mn").cast("int") - 1))
          .getOrElse(array().cast("array<int>"))
        val after = untilTime
          .map(u => seqIf(col("__mx").cast("int") + 1, lit(u)))
          .getOrElse(array().cast("array<int>"))
        // explode must be top-level (no cast wrapping a generator)
        val extra = bounds
          .select((keys.map(col) :+
            explode(concat(before, after)).as("__t")): _*)
          .select((keys.map(col) :+
            col("__t").cast(densified.schema(timeCol).dataType).as(timeCol)): _*)
        densified.unionByName(extra, allowMissingColumns = true)
      }

    // fill strategies, applied in order over all value columns
    fillna.foldLeft(extended) { (d, strategy) =>
      strategy match {
        case "zero" =>
          valueCols.foldLeft(d)((dd, c) =>
            dd.withColumn(c, coalesce(col(c), lit(0).cast(dd.schema(c).dataType))))
        case "ffill" => ffill(d, keys, timeCol, valueCols)
        case "bfill" => bfill(d, keys, timeCol, valueCols)
        case "interpolate" =>
          valueCols.foldLeft(d)((dd, c) =>
            interpolate(dd, keys, timeCol, c, limitArea = Some("inside")))
        case other =>
          throw new IllegalArgumentException(s"fillna strategy: $other")
      }
    }
  }

  /** Alias capturing the reference's `fill_date_gaps` usage — densify the
    * date axis per entity (misc.py callers). */
  def fillDateGaps(df: DataFrame, keys: Seq[String], timeCol: String): DataFrame =
    expandTimeColumn(df, keys, timeCol, "full_range_entity")

  /** One row per time unit in [start, end), value scaled by 1/len when
    * requested — `explode_rows_by_time_range` (misc.py:379-436). Empty or
    * inverted ranges (end <= start) emit no rows — guarded, because Spark's
    * `sequence` auto-steps -1 for descending bounds and would fabricate
    * rows. */
  def explodeByTimeRange(
      df: DataFrame,
      startCol: String,
      endCol: String,
      outCol: String,
      valueCols: Seq[String],
      scale: Boolean
  ): DataFrame = {
    val len = (col(endCol) - col(startCol)).cast("double")
    val exploded = df
      .withColumn(
        outCol,
        explode(when(col(endCol) > col(startCol),
          sequence(col(startCol), col(endCol) - 1))))
    val scaled =
      if (scale)
        valueCols.foldLeft(exploded)((d, c) => d.withColumn(c, col(c) / len))
      else exploded
    scaled.drop(startCol, endCol)
  }
}
