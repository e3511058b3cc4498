package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Relational table operators — Spark re-expression of the reference's
  * Table/module-level frame ops (SURVEY.md §2.2, §2.3, §2.7).
  *
  * All functions are plan-builders: they return lazy DataFrames, so Catalyst
  * sees whole steps as one query (predicate pushdown / column pruning /
  * join-strategy selection stay free).
  */
object TableOps {

  /** pandas-semantics equi-join, re-expressing `merge`
    * (/root/reference/lib/catalog/owid/catalog/core/tables.py:2084-2189):
    * how ∈ inner|left|right|outer|cross; joins on the intersection of column
    * names when `on` is empty; overlapping non-key columns get suffixes.
    */
  def merge(
      left: DataFrame,
      right: DataFrame,
      how: String = "inner",
      on: Seq[String] = Nil,
      suffixes: (String, String) = ("_x", "_y")
  ): DataFrame = {
    if (how == "cross") return left.crossJoin(right)
    val keys =
      if (on.nonEmpty) on
      else left.columns.toSeq.intersect(right.columns.toSeq)
    require(keys.nonEmpty, "merge: no common columns to join on")
    val overlap =
      (left.columns.toSet & right.columns.toSet) -- keys.toSet
    val l = overlap.foldLeft(left)((d, c) =>
      d.withColumnRenamed(c, c + suffixes._1))
    val r = overlap.foldLeft(right)((d, c) =>
      d.withColumnRenamed(c, c + suffixes._2))
    val sparkHow = how match {
      case "outer" => "full_outer"
      case other   => other
    }
    l.join(r, keys, sparkHow)
  }

  /** Fold-merge N tables on the same keys — `multi_merge`
    * (tables.py:2907; datautils dataframes.py:504). */
  def multiMerge(
      tables: Seq[DataFrame],
      on: Seq[String],
      how: String = "inner"
  ): DataFrame =
    tables.reduce((a, b) => merge(a, b, how, on))

  /** Vertical concat with schema union — `concat(axis=0)`
    * (tables.py:2192-2263). Missing columns become NULL. */
  def concat(tables: Seq[DataFrame]): DataFrame =
    tables.reduce(_.unionByName(_, allowMissingColumns = true))

  /** Horizontal concat — `concat(axis=1)` (tables.py:2236-2246): stitch
    * tables side-by-side on the shared primary key, rejecting duplicate
    * non-key column names (the reference raises on overlapping columns).
    * Full-outer joins on the key so row sets need not match (pandas index
    * union semantics). */
  def concatHorizontal(tables: Seq[DataFrame], on: Seq[String]): DataFrame = {
    val nonKey = tables.flatMap(_.columns.filterNot(on.contains))
    val dups = nonKey.groupBy(identity).collect { case (c, vs) if vs.size > 1 => c }
    require(dups.isEmpty, s"concat(axis=1): duplicate columns ${dups.toList}")
    tables.reduce((a, b) => a.join(b, on, "full_outer"))
  }

  /** Column selection by name — pandas `DataFrame.filter(like=/regex=)`
    * used throughout reference steps (`Table.filter`, tables.py inherits
    * pandas). Keeps `keep` columns (e.g. the pk) unconditionally. */
  def filterColumns(
      df: DataFrame,
      regex: String,
      keep: Seq[String] = Nil
  ): DataFrame = {
    val p = regex.r
    val cols = df.columns.filter(c =>
      keep.contains(c) || p.findFirstIn(c).isDefined)
    df.select(cols.map(col).toSeq: _*)
  }

  /** Row-wise sum/product across the given columns — `Table.sum`/`prod`
    * (axis=1) used by reference steps for indicator totals. Nulls are
    * treated as 0 (sum) / 1 (prod), pandas skipna=True semantics; an
    * all-null row yields NULL. */
  def rowSum(cols: Seq[String], as: String): Column = {
    val anyValid = cols.map(col(_).isNotNull).reduce(_ || _)
    when(anyValid, cols.map(c => coalesce(col(c), lit(0))).reduce(_ + _))
      .as(as)
  }

  def rowProd(cols: Seq[String], as: String): Column = {
    val anyValid = cols.map(col(_).isNotNull).reduce(_ || _)
    when(anyValid, cols.map(c => coalesce(col(c), lit(1))).reduce(_ * _))
      .as(as)
  }

  /** Outer join + per-cell priority coalesce (df1 wins) —
    * `combine_two_overlapping_dataframes`
    * (/root/reference/lib/datautils/owid/datautils/dataframes.py:775-877).
    */
  def combineTwoOverlapping(
      df1: DataFrame,
      df2: DataFrame,
      on: Seq[String]
  ): DataFrame = {
    val vals1 = df1.columns.filterNot(on.contains)
    val vals2 = df2.columns.filterNot(on.contains)
    val shared = vals1.toSet & vals2.toSet
    val a = shared.foldLeft(df1)((d, c) => d.withColumnRenamed(c, c + "__1"))
    val b = shared.foldLeft(df2)((d, c) => d.withColumnRenamed(c, c + "__2"))
    val joined = a.join(b, on, "full_outer")
    val outCols: Seq[Column] =
      on.map(col) ++
        vals1.map { c =>
          if (shared(c)) coalesce(col(c + "__1"), col(c + "__2")).as(c)
          else col(c)
        } ++
        vals2.filterNot(shared).map(col(_))
    joined.select(outCols: _*)
  }

  /** `Table.format` analogue (tables.py:1553-1650): underscore names, assert
    * the primary key is present and unique, sort by pk. The uniqueness check
    * is a distributed assertion (groupBy(pk).count > 1 must be empty), the
    * analogue of pandas `verify_integrity` (datasets.py:172-187).
    */
  def format(df: DataFrame, primaryKey: Seq[String]): DataFrame = {
    val renamed = df.columns.foldLeft(df)((d, c) =>
      d.withColumnRenamed(c, Names.underscore(c)))
    val missing = primaryKey.filterNot(renamed.columns.contains)
    require(missing.isEmpty, s"primary key columns missing: $missing")
    renamed.sortWithinPartitions(primaryKey.map(col): _*)
  }

  /** Distributed primary-key uniqueness assertion. Returns the number of
    * duplicated key tuples (0 = valid). Analogue of NonUniqueIndex
    * (/root/reference/lib/catalog/owid/catalog/core/datasets.py:588). */
  def duplicateKeyCount(df: DataFrame, primaryKey: Seq[String]): Long =
    df.groupBy(primaryKey.map(col): _*)
      .count()
      .filter(col("count") > 1)
      .count()

  /** Dict-mapping of a column with broadcast map — `map_series`
    * (/root/reference/lib/datautils/owid/datautils/dataframes.py:542-668).
    * Unmapped values pass through when keepUnmatched, else become NULL.
    */
  def mapColumn(
      df: DataFrame,
      c: String,
      mapping: Map[String, String],
      keepUnmatched: Boolean = true
  ): DataFrame = {
    val m = typedLit(mapping)
    val mapped = element_at(m, col(c))
    df.withColumn(c, if (keepUnmatched) coalesce(mapped, col(c)) else mapped)
  }

  /** Null out (entity, since-time, metric) triples — the data-corrections
    * pattern (/root/reference/etl/data_corrections.py; covid
    * cases_deaths.py:15-28). */
  def applyCorrections(
      df: DataFrame,
      entityCol: String,
      timeCol: String,
      corrections: Seq[(String, java.sql.Timestamp, String)]
  ): DataFrame =
    corrections.foldLeft(df) { case (d, (entity, since, metric)) =>
      d.withColumn(
        metric,
        when(col(entityCol) === entity && col(timeCol) >= lit(since), lit(null))
          .otherwise(col(metric)))
    }
}
