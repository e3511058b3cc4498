package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the operator coverage surface (SURVEY.md §2): each entry is
  * a Spark implementation over the driver testdata with a matching DuckDB
  * oracle in `oracleSql` (column names aligned; decimals/rounding used so
  * value hashes match bit-for-bit).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001: the full CDC merge-apply
    * engine replaying the events table into a lake table and reading back
    * the final state (driver smoke-checks rows>0). */
  def entry(spark: SparkSession): DataFrame =
    CdcQuery.qCdcMerge(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Queries.all.map { case (k, (fn, _)) => k -> fn } ++
      TrainQueries.all.map { case (k, (fn, _)) => k -> fn } ++
      CdcQuery.all.map { case (k, (fn, _)) => k -> fn }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a weaker rows-only check. */
  def oracleSql: Map[String, String] =
    (Queries.all.map { case (k, (_, sql)) => k -> sql } ++
      TrainQueries.all.map { case (k, (_, sql)) => k -> sql } ++
      CdcQuery.all.map { case (k, (_, sql)) => k -> sql })
      .filter(_._2.nonEmpty)
}
