package graft

import graft.ops.Grapher

/** Grapher adaptation tests mirroring /root/reference/etl/grapher/helpers.py
  * (country_to_entity_id, _adapt_table_for_grapher, long_to_wide_tables). */
class GrapherSpec extends SparkSpec {
  import spark.implicits._

  lazy val entities = Seq(
    (1L, "United States", "USA"),
    (2L, "France", "FRA"),
    (3L, "Germany", "DEU")
  ).toDF("id", "name", "code")

  test("countryToEntityId resolves by name; unmatched raises") {
    val df = Seq(("United States", 2020, 1.0), ("France", 2020, 2.0))
      .toDF("country", "year", "v")
    val out = Grapher.countryToEntityId(df, entities)
    val m = out.select("country", "entityId").as[(String, Long)].collect().toMap
    assert(m == Map("United States" -> 1L, "France" -> 2L))
    val bad = Seq(("Atlantis", 2020, 1.0)).toDF("country", "year", "v")
    intercept[IllegalArgumentException] {
      Grapher.countryToEntityId(bad, entities)
    }
  }

  test("createEntities assigns deterministic new ids above max") {
    val df = Seq(("Atlantis", 1.0), ("France", 2.0), ("Wakanda", 3.0))
      .toDF("country", "v")
    val out = Grapher.countryToEntityId(df, entities, createEntities = true)
    val m = out.select("country", "entityId").as[(String, Long)].collect().toMap
    assert(m("France") == 2L)
    assert(m("Atlantis") == 4L) // maxId 3 + rank 1 (alphabetical)
    assert(m("Wakanda") == 5L)
  }

  test("adaptTableForGrapher swaps country for entityId/Code/Name") {
    val df = Seq(("France", 2020, 5.0), ("Newland", 2021, 6.0))
      .toDF("country", "year", "v")
    val out = Grapher.adaptTableForGrapher(df, entities)
    assert(!out.columns.contains("country"))
    val rows = out.select("entityId", "entityCode", "entityName", "year")
      .as[(Long, Option[String], String, Int)].collect().toSet
    assert(rows.contains((2L, Some("FRA"), "France", 2020)))
    // created entity: no code, name kept from the raw column
    assert(rows.exists { case (id, code, name, _) =>
      id > 3L && code.isEmpty && name == "Newland" })
  }

  test("long fan-out: partitionBy write + per-variable wide read-back") {
    val long = Seq(
      ("usa", 2020, "gdp", 100.0), ("usa", 2020, "pop", 5.0),
      ("fra", 2020, "gdp", 50.0)
    ).toDF("country", "year", "variable", "value")
    val out = tmpDir("grapher-wide")
    Grapher.writeLongAsWideTables(long, out)
    val gdp = Grapher.readWideTable(spark, out, "gdp")
    assert(gdp.columns.toSet == Set("country", "year", "gdp"))
    assert(gdp.count() == 2)
    val pop = Grapher.readWideTable(spark, out, "pop")
    assert(pop.select("pop").as[Double].collect().toSeq == Seq(5.0))
    intercept[IllegalArgumentException] {
      Grapher.readWideTable(spark, out, "Bad Name")
    }
  }
}
