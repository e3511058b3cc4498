package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Grouped aggregation with NaN budgets and keyed roll-ups — Spark
  * re-expression of the reference's `groupby_agg`
  * (/root/reference/lib/datautils/owid/datautils/dataframes.py:310-482) and
  * region aggregation (/root/reference/etl/data_helpers/geo.py:268-533).
  *
  * Everything is single-pass column algebra over `groupBy(...).agg(...)` —
  * partial (map-side) aggregation applies, no UDAFs, codegen-friendly.
  */
object GroupOps {

  /** NaN-budget rules: a group's aggregate becomes NULL when
    *  - its null count exceeds `numAllowedNans`, or
    *  - its null fraction exceeds `fracAllowedNans`, or
    *  - its valid-value count is below `minNumValues`.
    * Mirrors dataframes.py:310-482 (`num_allowed_nans`, `frac_allowed_nans`,
    * `min_num_values`).
    */
  final case class NanBudget(
      numAllowedNans: Option[Long] = None,
      fracAllowedNans: Option[Double] = None,
      minNumValues: Option[Long] = None
  ) {
    def violated(c: String): Column = {
      val nulls = count(when(col(c).isNull, 1))
      val valid = count(col(c))
      val total = count(lit(1))
      val checks = Seq(
        numAllowedNans.map(n => nulls > n),
        fracAllowedNans.map(f => nulls / total.cast("double") > f),
        minNumValues.map(m => valid < m)
      ).flatten
      checks.reduceOption(_ || _).getOrElse(lit(false))
    }
  }

  /** groupBy + named aggs with NaN budget applied per value column in the
    * same pass (one shuffle). `aggFn` ∈ sum|mean|min|max|median|first|last|
    * count|count_distinct. */
  def groupbyAgg(
      df: DataFrame,
      keys: Seq[String],
      valueCols: Seq[String],
      aggFn: String = "sum",
      budget: NanBudget = NanBudget()
  ): DataFrame =
    groupbyAggMap(df, keys, valueCols.map(_ -> aggFn).toMap, budget)

  /** Per-column aggregation map — the reference's `groupby_agg` with a dict
    * of column→function (dataframes.py:310-482 `aggregations` argument).
    * Still one shuffle: every aggregate and its NaN-budget checks live in the
    * same `agg(...)` pass with map-side partial aggregation. */
  /** Named aggregate function → aggregate Column (the reference's string
    * aggregation dialect, dataframes.py:310-482 / geo.py `aggregations`). */
  private[graft] def baseAgg(c: String, fn: String): Column = fn match {
    case "sum"            => sum(col(c))
    case "mean"           => avg(col(c))
    case "min"            => min(col(c))
    case "max"            => max(col(c))
    case "median"         => median(col(c))
    case "first"          => first(col(c), ignoreNulls = true)
    case "last"           => last(col(c), ignoreNulls = true)
    case "count"          => count(col(c))
    case "count_distinct" => count_distinct(col(c))
    case other            => throw new IllegalArgumentException(s"agg: $other")
  }

  def groupbyAggMap(
      df: DataFrame,
      keys: Seq[String],
      aggregations: Map[String, String],
      budget: NanBudget = NanBudget()
  ): DataFrame = {
    // preserve input column order for the output schema
    val ordered = df.columns.filter(aggregations.contains).toSeq
    val aggs = ordered.map { c =>
      when(budget.violated(c), lit(null))
        .otherwise(baseAgg(c, aggregations(c)))
        .as(c)
    }
    df.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** pandas `groupby(keys).transform(fn)` — the TableGroupBy transform
    * wrapper (tables.py:1869-1971): the group aggregate broadcast back onto
    * every member row, as an unordered group window (one shuffle on keys,
    * no sort — WindowExec with an empty ordering is a hash window). */
  def groupTransform(
      df: DataFrame,
      keys: Seq[String],
      valueCol: String,
      fn: String
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(keys.map(col): _*)
    val e = fn match {
      case "sum"   => sum(col(valueCol))
      case "mean"  => avg(col(valueCol))
      case "min"   => min(col(valueCol))
      case "max"   => max(col(valueCol))
      case "count" => count(col(valueCol))
      case "size"  => count(lit(1))
      case other   => throw new IllegalArgumentException(s"transform: $other")
    }
    df.withColumn(s"${valueCol}_$fn", e.over(w))
  }

  /** Weighted mean Σ(v·w)/Σ(w) over rows where both value and weight are
    * non-null — `mean_weighted_by_<w>` (dataframes.py:278-307). Pure column
    * algebra, no UDAF. */
  def weightedMeanExpr(value: String, weight: String): Column = {
    val bothValid = col(value).isNotNull && col(weight).isNotNull
    val num = sum(when(bothValid, col(value) * col(weight)))
    val den = sum(when(bothValid, col(weight)))
    num / nullif(den, lit(0.0)) // zero total weight → NULL (not ANSI error)
  }

  /** Region roll-up (the reference's `add_region_aggregates`,
    * geo.py:268-533 / Regions.add_aggregates geo.py:2025):
    * given a members table (region, member), aggregate value columns of
    * member rows into one row per (region × groupKeys), NULL a region's
    * value when a must-have member is missing or null for that group, then
    * union the region rows back onto the original table (replacing any
    * pre-existing rows for those regions — the reference's delete+concat
    * pattern at geo.py:491-520, i.e. a keyed upsert).
    *
    * `members` is expected to be small (country lists) — broadcast join.
    *
    * `aggregations` is the per-column aggregation dict (geo.py:280/349
    * `aggregations` — any column absent from the map defaults to "sum",
    * matching geo.py:421-423) and `budget` the per-group NaN budget
    * (geo.py:275-277 `num_allowed_nans_per_year` /
    * `frac_allowed_nans_per_year` / `min_num_values_per_year`). Both are
    * evaluated in the SAME aggregation pass as the must-have presence
    * flags — still one shuffle, map-side partial aggregation intact.
    */
  def addRegionAggregates(
      df: DataFrame,
      entityCol: String,
      groupKeys: Seq[String],
      valueCols: Seq[String],
      members: DataFrame, // (region, member)
      mustHave: Map[String, Seq[String]] = Map.empty,
      aggregations: Map[String, String] = Map.empty,
      budget: NanBudget = NanBudget()
  ): DataFrame = {
    val joined = df.join(
      broadcast(members),
      df(entityCol) === members("member"),
      "inner")
    // Per-value-column must-have presence (geo.py:431-466
    // `_check_countries_must_have_data`): a region's aggregate for column c
    // is NULL when any must-have member lacks a non-null c in that group.
    // Each column is nulled independently, matching the reference's
    // per-column behaviour. Pure flag-max column algebra in the same
    // aggregation pass — no collect_set shuffle of values, one shuffle total.
    def presenceFor(c: String): Column = {
      val perRegion = mustHave.toSeq.map { case (region, entities) =>
        val flags = entities.map(e =>
          max(when(col("member") === e && col(c).isNotNull, 1).otherwise(0)))
        (region, flags.reduce(least(_, _)))
      }
      perRegion.foldLeft(lit(1)) { case (acc, (region, ok)) =>
        when(col("region") === region, ok).otherwise(acc)
      }
    }
    val aggCols = valueCols.map { c =>
      val value = baseAgg(c, aggregations.getOrElse(c, "sum"))
      val presenceOk =
        if (mustHave.isEmpty) lit(true) else presenceFor(c) === 1
      when(presenceOk && !budget.violated(c), value)
        .otherwise(lit(null)).as(c)
    }
    // group by the raw `region` column (presence expressions reference it as
    // a grouping column) and re-key to entityCol afterwards
    val regionRows = joined
      .groupBy((col("region") +: groupKeys.map(col)): _*)
      .agg(aggCols.head, aggCols.tail: _*)
      .withColumnRenamed("region", entityCol)
    val regions = members.select("region").distinct().collect().map(_.getString(0))
    val kept = df.filter(!col(entityCol).isin(regions.toSeq: _*))
    kept.unionByName(regionRows.select(kept.columns.map(col): _*))
  }

  /** value / population per entity-time — `add_per_capita`
    * (geo.py:2171, 3098). `population` is a small dim: broadcast. */
  def addPerCapita(
      df: DataFrame,
      population: DataFrame,
      on: Seq[String],
      valueCols: Seq[String],
      popCol: String = "population",
      suffix: String = "_per_capita"
  ): DataFrame = {
    val joined = df.join(broadcast(population), on, "left")
    valueCols
      .foldLeft(joined)((d, c) =>
        d.withColumn(c + suffix, col(c) / nullif(col(popCol), lit(0.0))))
      .drop(popCol)
  }
}
