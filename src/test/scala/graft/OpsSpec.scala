package graft

import graft.ops._
import org.apache.spark.sql.functions._

/** Operator-library unit tests mirroring the reference's table-op suites
  * (/root/reference/lib/catalog/tests/test_tables.py: merge variants
  * :413-618, concat :131-178, groupby :991-1126). */
class OpsSpec extends SparkSpec {
  import spark.implicits._

  lazy val t1 = Seq(
    ("usa", 2020, 100.0, 10.0), ("usa", 2021, 110.0, 11.0),
    ("fra", 2020, 50.0, 5.0), ("fra", 2021, 55.0, 5.5)
  ).toDF("country", "year", "gdp", "population")

  lazy val t2 = Seq(
    ("usa", 2020, 1.0), ("usa", 2021, 2.0), ("deu", 2020, 3.0)
  ).toDF("country", "year", "energy")

  test("merge: inner on default (common) keys") {
    val m = TableOps.merge(t1, t2)
    assert(m.count() == 2)
    assert(m.columns.toSet == Set("country", "year", "gdp", "population", "energy"))
  }

  test("merge: left/outer row multiplicity") {
    assert(TableOps.merge(t1, t2, "left").count() == 4)
    assert(TableOps.merge(t1, t2, "outer").count() == 5)
    assert(TableOps.merge(t1, t2, "cross").count() == 12)
  }

  test("merge: overlapping non-key columns get suffixes") {
    val a = Seq(("usa", 1.0)).toDF("country", "v")
    val b = Seq(("usa", 2.0)).toDF("country", "v")
    val m = TableOps.merge(a, b, "inner", Seq("country"))
    assert(m.columns.toSet == Set("country", "v_x", "v_y"))
    val r = m.collect()(0)
    assert(r.getAs[Double]("v_x") == 1.0 && r.getAs[Double]("v_y") == 2.0)
  }

  test("multiMerge folds on shared keys") {
    val t3 = Seq(("usa", 2020, 7.0)).toDF("country", "year", "co2")
    val m = TableOps.multiMerge(Seq(t1, t2, t3), Seq("country", "year"), "left")
    assert(m.count() == 4)
    assert(m.columns.contains("co2"))
  }

  test("concat: schema union with nulls for missing columns") {
    val c = TableOps.concat(Seq(t1.select("country", "year", "gdp"), t2))
    assert(c.count() == 7)
    assert(c.columns.toSet == Set("country", "year", "gdp", "energy"))
    assert(c.filter($"energy".isNull).count() == 4)
  }

  test("combineTwoOverlapping: df1 wins per cell") {
    val a = Seq(("usa", Some(1.0)), ("fra", None)).toDF("k", "v")
    val b = Seq(("usa", 9.0), ("fra", 2.0), ("deu", 3.0)).toDF("k", "v")
    val got = TableOps.combineTwoOverlapping(a, b, Seq("k"))
      .as[(String, Option[Double])].collect().toMap
    assert(got == Map("usa" -> Some(1.0), "fra" -> Some(2.0), "deu" -> Some(3.0)))
  }

  test("format: underscores names, asserts pk presence; dup detection") {
    val messy = Seq((1, 2.0)).toDF("Country Name", "GDP (current US$)")
    val f = TableOps.format(messy, Seq("country_name"))
    assert(f.columns.toSeq == Seq("country_name", "gdp_current_us"))
    intercept[IllegalArgumentException] {
      TableOps.format(messy, Seq("nope"))
    }
    assert(TableOps.duplicateKeyCount(t1, Seq("country", "year")) == 0)
    assert(TableOps.duplicateKeyCount(t1, Seq("country")) == 2)
  }

  test("mapColumn: mapped, passthrough, and strict modes") {
    val df = Seq("usa", "fra", "xxx").toDF("c")
    val m = Map("usa" -> "United States", "fra" -> "France")
    val kept = TableOps.mapColumn(df, "c", m).as[String].collect().toSet
    assert(kept == Set("United States", "France", "xxx"))
    val strict = TableOps.mapColumn(df, "c", m, keepUnmatched = false)
      .as[Option[String]].collect().toSet
    assert(strict == Set(Some("United States"), Some("France"), None))
  }

  test("repack: narrow-cast round-trip is lossless") {
    val df = Seq(
      (1L, 100.5, 3.0), (127L, -4.25, 200.0), (-5L, 0.0, 1000000.0)
    ).toDF("i", "f", "whole")
    val r = Repack.repack(df)
    assert(r.schema("i").dataType.typeName == "byte")
    assert(r.schema("f").dataType.typeName == "float")
    assert(r.schema("whole").dataType.typeName == "integer")
    val back = Repack.toSafeTypes(r)
    assert(back.as[(Long, Double, Double)].collect().toSet ==
      df.as[(Long, Double, Double)].collect().toSet)
  }

  test("checksums: order-invariant and content-sensitive") {
    val a = Seq((1, "x"), (2, "y")).toDF("k", "v")
    val b = Seq((2, "y"), (1, "x")).toDF("k", "v").repartition(3)
    val c = Seq((1, "x"), (2, "z")).toDF("k", "v")
    assert(Checksums.tableChecksum(a, Seq("k", "v")) ==
      Checksums.tableChecksum(b, Seq("k", "v")))
    assert(Checksums.tableChecksum(a, Seq("k", "v")) !=
      Checksums.tableChecksum(c, Seq("k", "v")))
  }

  test("filterColumns selects by regex, keeps pinned columns") {
    val df = Seq((1, 2.0, 3.0, "x")).toDF("id", "gdp_2020", "gdp_2021", "note")
    val out = TableOps.filterColumns(df, "^gdp_", keep = Seq("id"))
    assert(out.columns.toSeq == Seq("id", "gdp_2020", "gdp_2021"))
  }

  test("rowSum/rowProd skip nulls; all-null row yields NULL") {
    val df = Seq[(Option[Double], Option[Double])](
      (Some(2.0), Some(3.0)), (Some(2.0), None), (None, None))
      .toDF("a", "b")
    val out = df.select(
        TableOps.rowSum(Seq("a", "b"), "s"),
        TableOps.rowProd(Seq("a", "b"), "p"))
      .as[(Option[Double], Option[Double])].collect()
    assert(out(0) == ((Some(5.0), Some(6.0))))
    assert(out(1) == ((Some(2.0), Some(2.0)))) // null treated as 0 / 1
    assert(out(2) == ((None, None)))
  }

  test("concatHorizontal stitches on pk, rejects duplicate columns") {
    val a = Seq((1, 10.0)).toDF("k", "x")
    val b = Seq((1, 20.0), (2, 30.0)).toDF("k", "y")
    val out = TableOps.concatHorizontal(Seq(a, b), Seq("k")).orderBy("k")
    assert(out.columns.toSeq == Seq("k", "x", "y"))
    assert(out.count() == 2) // index union (full outer)
    intercept[IllegalArgumentException] {
      TableOps.concatHorizontal(Seq(a, a), Seq("k"))
    }
  }

  test("intersect/except: native set ops behave on keyed frames") {
    val a = Seq(1, 2, 3).toDF("k")
    val b = Seq(2, 3, 4).toDF("k")
    assert(a.intersect(b).as[Int].collect().sorted.toSeq == Seq(2, 3))
    assert(a.except(b).as[Int].collect().toSeq == Seq(1))
  }

  test("yieldLongTables: one pruned long frame per value column") {
    val wide = Seq(("usa", 2020, Some(1.0), None: Option[Double]))
      .toDF("c", "y", "gdp", "pop")
    val out = Reshape.yieldLongTables(wide, Seq("c", "y"), Seq("gdp", "pop"))
    assert(out.keySet == Set("gdp", "pop"))
    assert(out("gdp").columns.toSeq == Seq("c", "y", "value"))
    assert(out("gdp").count() == 1)
    assert(out("pop").count() == 0) // nulls dropped
  }

  test("harmonizeCountries + report: mapping, excluded, diagnostics") {
    val df = Seq("United States", "USA!", "Atlantis", "France")
      .toDF("country")
    val mapping = Map("USA!" -> "United States", "Unused" -> "X")
    val out = Geo.harmonizeCountries(df, mapping, excluded = Seq("Atlantis"))
      .as[String].collect().sorted
    assert(out.toSeq == Seq("France", "United States", "United States"))
    val nan = Geo.harmonizeCountries(df, mapping, excluded = Seq("Atlantis"),
        makeMissingNan = true)
      .as[Option[String]].collect().flatten.sorted
    assert(nan.toSeq == Seq("United States")) // unmapped → null
    val rep = Geo.harmonizeReport(df, mapping,
      excluded = Seq("Atlantis", "Ghost"))
    assert(rep.unmatched == Seq("France", "United States"))
    assert(rep.unusedMappings == Seq("Unused"))
    assert(rep.unknownExcluded == Seq("Ghost"))
  }

  test("names: underscore rules match the reference surface") {
    assert(Names.underscore("GDP (current US$)") == "gdp_current_us")
    assert(Names.underscore("Côte d'Ivoire") == "cote_divoire")
    assert(Names.underscore("camelCaseName", camelToSnake = true) == "camel_case_name")
    assert(Names.underscore("95% conf. interval") == "_95pct_conf_interval")
    assert(Names.underscore("a  +  b") == "a_plus_b")
    assert(Names.isValid("gdp_2020") && !Names.isValid("2020_gdp"))
    intercept[IllegalArgumentException] {
      Names.underscoreAll(Seq("A B", "a_b"))
    }
    assert(Names.underscoreAll(Seq("A B", "a_b"), collision = "rename") ==
      Seq("a_b", "a_b_1"))
  }
}
