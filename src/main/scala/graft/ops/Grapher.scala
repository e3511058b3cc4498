package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Grapher publish adaptation — the reference's grapher-channel pipeline
  * (/root/reference/etl/grapher/helpers.py): entity-id resolution, table
  * adaptation, and the per-variable table fan-out. The reference resolves
  * entities against a MySQL dim table; here the entities dim is a DataFrame
  * (id, name, code) — same semantics, lake-native.
  */
object Grapher {

  /** Resolve country names/codes to entity ids against the entities dim —
    * `country_to_entity_id` (helpers.py:354-400). The dim is small
    * (countries of the world): broadcast join, no shuffle of the data side.
    *
    * `createEntities = true` assigns new ids to unmatched names,
    * deterministically: maxId + dense rank of the new name (the analogue of
    * inserting into the entities table). With false, unmatched rows fail the
    * post-join assertion (one slim count, mirrored from the reference's
    * "Some countries have not been mapped" assert). */
  def countryToEntityId(
      df: DataFrame,
      entities: DataFrame, // (id long, name string, code string)
      countryCol: String = "country",
      by: String = "name",
      createEntities: Boolean = false
  ): DataFrame = {
    require(by == "name" || by == "code", s"by: $by")
    val dim0 = entities.select(
      col("id").cast("long").as("__eid"), col(by).as("__ekey"))
    val dim =
      if (!createEntities) dim0
      else {
        // new names get ids above the current max, ordered by name —
        // deterministic. Driver-side like the reference's entity inserts
        // (helpers.py:389-395): the set is bounded by entity cardinality
        // (countries), never by row count.
        val spark = df.sparkSession
        import spark.implicits._
        val maxId = dim0.agg(coalesce(max(col("__eid")), lit(0L)))
          .collect()(0).getLong(0)
        val fresh = df.select(col(countryCol).as("__ekey")).distinct()
          .join(dim0, Seq("__ekey"), "left_anti")
          .as[String].collect().sorted
          .zipWithIndex.map { case (n, i) => (maxId + i + 1, n) }
        dim0.unionByName(fresh.toSeq.toDF("__eid", "__ekey"))
      }
    val joined = df.join(broadcast(dim), df(countryCol) === dim("__ekey"), "left")
    val unmatched = joined.filter(col("__eid").isNull)
      .select(countryCol).distinct().limit(20).collect().map(_.getString(0))
    require(unmatched.isEmpty,
      s"Some countries have not been mapped: ${unmatched.toSeq.sorted}")
    joined.withColumnRenamed("__eid", "entityId").drop("__ekey")
  }

  /** Garden → grapher table adaptation — `_adapt_table_for_grapher`
    * (helpers.py:425-475): unique-title assertion is the caller's metadata
    * concern; here: require (country, year), resolve entityId, attach
    * entityCode/entityName, drop the raw country column. */
  def adaptTableForGrapher(
      df: DataFrame,
      entities: DataFrame
  ): DataFrame = {
    require(df.columns.contains("country") && df.columns.contains("year"),
      "Table must have columns country and year.")
    require(!df.columns.contains("entity_id") && !df.columns.contains("entityId"),
      "Table must not have column entity_id.")
    val withId = countryToEntityId(df, entities, "country", "name",
      createEntities = true)
    val codes = entities.select(
      col("id").cast("long").as("entityId"),
      col("code").as("entityCode"), col("name").as("entityName"))
    // left join: entities created on the fly have no code row; keep name
    withId
      .join(broadcast(codes), Seq("entityId"), "left")
      .withColumn("entityName", coalesce(col("entityName"), col("country")))
      .drop("country")
  }

  /** The reference's `long_to_wide_tables` (helpers.py:270-300) re-expressed
    * for a distributed sink: ONE partitioned write of the long table (no
    * driver loop over variables — `partitionBy(variable)` splits at write
    * time), where each partition directory IS the per-variable table. The
    * repartition bounds file counts to one per (variable) regardless of
    * input parallelism. Variable names must be valid underscored
    * identifiers (the reference validates each). */
  def writeLongAsWideTables(
      long: DataFrame, // columns: idCols..., variable, value
      outDir: String
  ): Unit = {
    require(Seq("variable", "value").forall(long.columns.contains),
      "long table needs `variable` and `value` columns")
    long
      .repartition(col("variable"))
      .write.mode("overwrite").partitionBy("variable").parquet(outDir)
  }

  /** Read back one variable's wide table from the partitioned fan-out:
    * idCols + a column named after the variable (helpers.py:285-295). */
  def readWideTable(
      spark: SparkSession,
      outDir: String,
      variable: String
  ): DataFrame = {
    require(Names.isValid(variable), s"invalid variable name: $variable")
    spark.read.parquet(s"$outDir/variable=$variable")
      .withColumnRenamed("value", variable)
  }
}
