package graft.ops

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import scala.jdk.CollectionConverters._

/** Country harmonization — the reference's most-used garden-step operation,
  * `harmonize_countries` (/root/reference/etl/data_helpers/geo.py:536-628):
  * map raw country names to harmonized ones via a countries mapping file,
  * optionally drop an excluded list, and report the three diagnostic sets
  * the reference warns about (unmatched names in the data, unused mapping
  * keys, unknown excluded names).
  *
  * Scale shape: the rename itself is a broadcast literal-map lookup in the
  * scan stage (no shuffle, stays in codegen — TableOps.mapColumn). The
  * diagnostics need the distinct set of country names — ONE slim aggregation
  * over a single low-cardinality string column (bounded by the number of
  * countries in the world, not by row count), collected only when a warning
  * flag asks for it.
  */
object Geo {

  /** Diagnostics mirroring geo.py's three warning paths. */
  final case class HarmonizeReport(
      unmatched: Seq[String],      // in data, not in mapping (geo.py warn_on_missing_countries)
      unusedMappings: Seq[String], // mapping keys never seen in data (warn_on_unused_countries)
      unknownExcluded: Seq[String] // excluded names not present in data (warn_on_unknown_excluded_countries)
  )

  /** Harmonize `countryCol` using `mapping`; rows whose raw name is in
    * `excluded` are dropped first (geo.py:598-610). Unmapped names pass
    * through unchanged, or become NULL when `makeMissingNan`
    * (map_series semantics, dataframes.py:542-668). */
  def harmonizeCountries(
      df: DataFrame,
      mapping: Map[String, String],
      excluded: Seq[String] = Nil,
      countryCol: String = "country",
      makeMissingNan: Boolean = false
  ): DataFrame = {
    val base =
      if (excluded.isEmpty) df
      else df.filter(!col(countryCol).isin(excluded: _*))
    TableOps.mapColumn(base, countryCol, mapping,
      keepUnmatched = !makeMissingNan)
  }

  /** Compute the three diagnostic sets with one distinct-aggregation over
    * the country column (the collect is bounded by country cardinality).
    * Split from `harmonizeCountries` so pipelines that don't want the extra
    * job skip it entirely. */
  def harmonizeReport(
      df: DataFrame,
      mapping: Map[String, String],
      excluded: Seq[String] = Nil,
      countryCol: String = "country"
  ): HarmonizeReport = {
    val seen = df.select(col(countryCol)).distinct()
      .collect().map(_.getString(0)).toSet
    HarmonizeReport(
      unmatched = (seen -- mapping.keySet -- excluded).toSeq.sorted,
      unusedMappings = (mapping.keySet -- seen).toSeq.sorted,
      unknownExcluded = (excluded.toSet -- seen).toSeq.sorted)
  }

  // ------------------------------------------------------------- file codecs

  private val jackson = new ObjectMapper()

  /** Load a countries mapping file — the reference's `<step>.countries.json`
    * ({"raw name": "Harmonized Name", ...}); duplicate keys are a file bug
    * the reference warns on (load_json(warn_on_duplicated_keys=True)) —
    * here they fail fast. */
  def loadCountriesJson(json: String): Map[String, String] = {
    val n = jackson.readTree(json)
    val pairs = n.properties().asScala.map(e => e.getKey -> e.getValue.asText()).toSeq
    require(pairs.map(_._1).distinct.size == pairs.size,
      "duplicate keys in countries mapping")
    pairs.toMap
  }

  /** Load an excluded-countries file (JSON array of raw names). */
  def loadExcludedJson(json: String): Seq[String] = {
    val n = jackson.readTree(json)
    n.elements().asScala.map(_.asText()).toSeq
  }
}
