package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Reshape operators — melt / pivot / long↔wide (SURVEY.md §2.9). */
object Reshape {

  /** wide→long — `melt`
    * (/root/reference/lib/catalog/owid/catalog/core/tables.py:2266-2325).
    * Uses Spark's native unpivot (codegen'd Expand, no shuffle). */
  def melt(
      df: DataFrame,
      idVars: Seq[String],
      valueVars: Seq[String],
      varName: String = "variable",
      valueName: String = "value"
  ): DataFrame =
    df.unpivot(
      idVars.map(col).toArray,
      valueVars.map(col).toArray,
      varName,
      valueName)

  /** long→wide — `pivot` (tables.py:2341-2414). `values` must be supplied
    * explicitly at scale (skips the extra distinct-scan job and keeps the
    * output schema deterministic). */
  def pivot(
      df: DataFrame,
      index: Seq[String],
      column: String,
      value: String,
      values: Seq[String]
  ): DataFrame =
    df.groupBy(index.map(col): _*)
      .pivot(column, values)
      .agg(first(col(value)))

  /** Grapher-style long→wide with deterministic `var__dim_value` column
    * names — `long_to_wide` + `_underscore_column_and_dimensions`
    * (/root/reference/etl/grapher/helpers.py:164-255). Dimension values are
    * underscored and joined with "__"; collisions raise (helpers.py:189-195).
    */
  def longToWide(
      df: DataFrame,
      entityCols: Seq[String],
      dimCols: Seq[String],
      valueCol: String,
      dimValues: Seq[Seq[String]]
  ): DataFrame = {
    // cartesian of observed dim values → deterministic output columns
    val combos = dimValues
      .foldLeft(Seq(Seq.empty[String]))((acc, vs) =>
        for { a <- acc; v <- vs } yield a :+ v)
    val names = combos.map(c =>
      (valueCol +: c.map(Names.underscore(_))).mkString("__"))
    require(names.distinct.size == names.size,
      s"long_to_wide column collision: $names")
    val key = concat_ws("__", dimCols.map(c => col(c)): _*)
    val comboKeys = combos.map(_.mkString("__"))
    val wide = df
      .withColumn("__dim", key)
      .groupBy(entityCols.map(col): _*)
      .pivot("__dim", comboKeys)
      .agg(first(col(valueCol)))
    comboKeys.zip(names).foldLeft(wide) { case (d, (k, n)) =>
      if (k == n) d else d.withColumnRenamed(k, n)
    }
  }

  /** Inverse fan-out: for each wide value column, the (entity, time, value)
    * long table with NULLs dropped — `_yield_wide_table`
    * (/root/reference/etl/grapher/helpers.py:31-123). Driver-side loop over
    * columns, each a pruned scan. */
  def yieldLongTables(
      df: DataFrame,
      entityCols: Seq[String],
      valueCols: Seq[String]
  ): Map[String, DataFrame] =
    valueCols.map { c =>
      c -> df
        .select((entityCols.map(col) :+ col(c).as("value")): _*)
        .where(col("value").isNotNull)
    }.toMap
}
