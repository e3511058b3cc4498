package graft

import graft.ops._
import org.apache.spark.sql.functions._

/** Grouped-aggregation and window-op unit tests mirroring the reference's
  * groupby_agg NaN-budget suite (/root/reference/lib/datautils/owid/
  * datautils/dataframes.py:310-482 tests) and misc interpolation/expansion
  * (/root/reference/etl/data_helpers/misc.py:77-376). */
class GroupWindowSpec extends SparkSpec {
  import spark.implicits._

  lazy val gaps = Seq[(String, Int, Option[Double])](
    ("usa", 2000, Some(10.0)), ("usa", 2001, None), ("usa", 2002, None),
    ("usa", 2003, Some(40.0)), ("usa", 2005, Some(60.0)),
    ("fra", 2000, None), ("fra", 2001, Some(5.0)), ("fra", 2002, None)
  ).toDF("country", "year", "v")

  test("groupbyAgg: numAllowedNans nulls the violating group") {
    val out = GroupOps.groupbyAgg(gaps, Seq("country"), Seq("v"), "sum",
        GroupOps.NanBudget(numAllowedNans = Some(1)))
      .as[(String, Option[Double])].collect().toMap
    assert(out("usa").isEmpty) // 2 nulls > 1 allowed
    assert(out("fra").isEmpty) // 2 nulls > 1 allowed
    val loose = GroupOps.groupbyAgg(gaps, Seq("country"), Seq("v"), "sum",
        GroupOps.NanBudget(numAllowedNans = Some(2)))
      .as[(String, Option[Double])].collect().toMap
    assert(loose("usa").contains(110.0) && loose("fra").contains(5.0))
  }

  test("groupbyAgg: fracAllowedNans and minNumValues rules") {
    val frac = GroupOps.groupbyAgg(gaps, Seq("country"), Seq("v"), "mean",
        GroupOps.NanBudget(fracAllowedNans = Some(0.5)))
      .as[(String, Option[Double])].collect().toMap
    assert(frac("usa").isDefined) // 2/5 = 0.4 <= 0.5
    assert(frac("fra").isEmpty)   // 2/3 > 0.5
    val minv = GroupOps.groupbyAgg(gaps, Seq("country"), Seq("v"), "max",
        GroupOps.NanBudget(minNumValues = Some(2)))
      .as[(String, Option[Double])].collect().toMap
    assert(minv("usa").contains(60.0) && minv("fra").isEmpty)
  }

  test("weighted mean ignores rows with null value or weight") {
    val df = Seq[(String, Option[Double], Option[Double])](
      ("a", Some(10.0), Some(1.0)), ("a", Some(20.0), Some(3.0)),
      ("a", None, Some(9.0)), ("a", Some(99.0), None)
    ).toDF("k", "v", "w")
    val got = df.groupBy("k")
      .agg(GroupOps.weightedMeanExpr("v", "w").as("wm"))
      .as[(String, Double)].collect().head._2
    assert(math.abs(got - (10 * 1 + 20 * 3) / 4.0) < 1e-12)
  }

  test("region aggregates: roll-up, replace semantics, must-have nulling") {
    val df = Seq(
      ("usa", 2020, 10.0), ("can", 2020, 5.0), ("fra", 2020, 3.0),
      ("north_america", 2020, 999.0) // stale region row must be replaced
    ).toDF("country", "year", "v")
    val members = Seq(
      ("north_america", "usa"), ("north_america", "can"),
      ("europe", "fra"), ("europe", "deu")
    ).toDF("region", "member")
    val out = GroupOps.addRegionAggregates(df, "country", Seq("year"),
        Seq("v"), members,
        mustHave = Map("europe" -> Seq("deu")))
      .as[(String, Int, Option[Double])].collect()
      .map(r => r._1 -> r._3).toMap
    assert(out("north_america").contains(15.0)) // stale 999 replaced
    assert(out("europe").isEmpty) // deu missing → nulled
    assert(out("usa").contains(10.0))
  }

  test("region aggregates: NaN budget per year (geo.py num_allowed_nans_per_year)") {
    // mirrors test_geo.py:1390-1446 (add_regions_to_table nan-budget cases):
    // Europe = {France, Italy, Spain}; Spain 2021 a is null; countries with
    // NO row for a year do not count as nans
    val df = Seq[(String, Int, Option[Double], Option[Double])](
      ("France", 2020, Some(1.0), Some(7.0)), ("France", 2021, Some(2.0), Some(8.0)),
      ("Italy", 2021, Some(3.0), Some(9.0)), ("Italy", 2022, Some(4.0), Some(10.0)),
      ("Spain", 2021, None, Some(11.0)), ("Spain", 2022, Some(6.0), Some(12.0))
    ).toDF("country", "year", "a", "b")
    val members = Seq(("Europe", "France"), ("Europe", "Italy"), ("Europe", "Spain"))
      .toDF("region", "member")
    def run(allowed: Long) = GroupOps
      .addRegionAggregates(df, "country", Seq("year"), Seq("a", "b"), members,
        budget = GroupOps.NanBudget(numAllowedNans = Some(allowed)))
      .filter($"country" === "Europe")
      .as[(String, Int, Option[Double], Option[Double])].collect()
      .map(r => r._2 -> ((r._3, r._4))).toMap
    val zero = run(0)
    assert(zero(2020) == ((Some(1.0), Some(7.0)))) // absent countries ≠ nans
    assert(zero(2021) == ((None, Some(28.0))))     // Spain's null a trips budget 0
    assert(zero(2022) == ((Some(10.0), Some(22.0))))
    val one = run(1)
    assert(one(2021) == ((Some(5.0), Some(28.0)))) // 1 nan now allowed
  }

  test("region aggregates: per-column aggregation dict (geo.py aggregations)") {
    // mirrors test_geo.py:692-720 replace_region_with_custom_aggregations:
    // var_01 summed, var_02 averaged, must-have member missing → both nulled
    val df = Seq[(String, Int, Option[Double], Option[Double])](
      ("Country 1", 2020, Some(1.0), Some(10.0)), ("Country 1", 2021, Some(2.0), Some(20.0)),
      ("Country 2", 2020, Some(3.0), Some(30.0))
    ).toDF("country", "year", "var_01", "var_02")
    val members = Seq(("Region 1", "Country 1"), ("Region 1", "Country 2"))
      .toDF("region", "member")
    val out = GroupOps
      .addRegionAggregates(df, "country", Seq("year"), Seq("var_01", "var_02"),
        members,
        mustHave = Map("Region 1" -> Seq("Country 1", "Country 2")),
        aggregations = Map("var_01" -> "sum", "var_02" -> "mean"),
        budget = GroupOps.NanBudget(numAllowedNans = Some(0)))
      .filter($"country" === "Region 1")
      .as[(String, Int, Option[Double], Option[Double])].collect()
      .map(r => r._2 -> ((r._3, r._4))).toMap
    assert(out(2020) == ((Some(1.0 + 3.0), Some((10.0 + 30.0) / 2))))
    assert(out(2021) == ((None, None))) // Country 2 has no 2021 row → must-have fails
  }

  test("per capita divides by joined population") {
    val pop = Seq(("usa", 2020, 4.0)).toDF("country", "year", "population")
    val df = Seq(("usa", 2020, 100.0)).toDF("country", "year", "gdp")
    val out = GroupOps.addPerCapita(df, pop, Seq("country", "year"), Seq("gdp"))
    assert(out.select("gdp_per_capita").as[Double].collect().head == 25.0)
    assert(!out.columns.contains("population"))
  }

  test("rollingMean honors window and minPeriods") {
    val df = (1 to 10).map(i => ("a", i, i.toDouble)).toDF("k", "t", "v")
    val out = WindowOps.rollingMean(df, Seq("k"), "t", Seq("v"), window = 3,
        minPeriods = 3)
      .orderBy("t").select("v_rolling").as[Option[Double]].collect()
    assert(out(0).isEmpty && out(1).isEmpty)
    assert(out(2).contains(2.0) && out(9).contains(9.0))
  }

  test("pctChange and cumsum") {
    val df = Seq(("a", 1, 100.0), ("a", 2, 110.0), ("a", 3, 55.0))
      .toDF("k", "t", "v")
    val pct = WindowOps.pctChange(df, Seq("k"), "t", "v")
      .orderBy("t").select("v_pct_change").as[Option[Double]].collect()
    assert(pct(0).isEmpty)
    assert(math.abs(pct(1).get - 0.1) < 1e-12)
    assert(math.abs(pct(2).get + 0.5) < 1e-12)
    val cum = WindowOps.cumsum(df, Seq("k"), "t", "v")
      .orderBy("t").select("v_cumsum").as[Double].collect()
    assert(cum.toSeq == Seq(100.0, 210.0, 265.0))
  }

  test("ffill/bfill fill within group only") {
    val out = WindowOps.ffill(gaps, Seq("country"), "year", Seq("v"))
      .orderBy("country", "year").as[(String, Int, Option[Double])].collect()
    val fra = out.filter(_._1 == "fra").map(_._3)
    assert(fra.toSeq == Seq(None, Some(5.0), Some(5.0))) // leading gap stays
    val usa = out.filter(_._1 == "usa").map(_._3)
    assert(usa.toSeq == Seq(Some(10.0), Some(10.0), Some(10.0), Some(40.0), Some(60.0)))
  }

  test("interpolate: linear interior fill, time-weighted") {
    val out = WindowOps.interpolate(gaps, Seq("country"), "year", "v",
        limitArea = Some("inside"))
      .orderBy("country", "year").as[(String, Int, Option[Double])].collect()
    val usa = out.filter(_._1 == "usa").map(_._3)
    assert(usa.toSeq == Seq(Some(10.0), Some(20.0), Some(30.0), Some(40.0), Some(60.0)))
    val fra = out.filter(_._1 == "fra").map(_._3)
    assert(fra.toSeq == Seq(None, Some(5.0), None)) // edges stay null
  }

  test("interpolate: limit_direction/limit_area clamp edges like pandas") {
    // default (both, None): leading/trailing gaps clamp to nearest known
    val both = WindowOps.interpolate(gaps, Seq("country"), "year", "v")
      .orderBy("country", "year").as[(String, Int, Option[Double])].collect()
    assert(both.filter(_._1 == "fra").map(_._3).toSeq ==
      Seq(Some(5.0), Some(5.0), Some(5.0)))
    // forward only: leading gap stays null, trailing clamps
    val fwd = WindowOps.interpolate(gaps, Seq("country"), "year", "v",
        limitDirection = "forward")
      .orderBy("country", "year").as[(String, Int, Option[Double])].collect()
    assert(fwd.filter(_._1 == "fra").map(_._3).toSeq ==
      Seq(None, Some(5.0), Some(5.0)))
    // outside only: interior gaps stay null, edges clamp
    val outside = WindowOps.interpolate(gaps, Seq("country"), "year", "v",
        limitArea = Some("outside"))
      .orderBy("country", "year").as[(String, Int, Option[Double])].collect()
    assert(outside.filter(_._1 == "usa").map(_._3).toSeq ==
      Seq(Some(10.0), None, None, Some(40.0), Some(60.0)))
  }

  test("expandTimeColumn densifies per entity") {
    val out = WindowOps.expandTimeColumn(
        gaps.filter($"v".isNotNull), Seq("country"), "year")
      .orderBy("country", "year")
      .as[(String, Int, Option[Double])].collect()
    assert(out.count(_._1 == "usa") == 6) // 2000..2005
    assert(out.filter(_._1 == "usa").map(_._2).toSeq == (2000 to 2005))
    assert(out.count(_._1 == "fra") == 1)
  }

  test("explodeByTimeRange scales values by range length") {
    val df = Seq((1L, 2000, 2002, 10.0)).toDF("id", "y0", "y1", "v")
    val out = WindowOps.explodeByTimeRange(df, "y0", "y1", "yr", Seq("v"), scale = true)
      .orderBy("yr").as[(Long, Double, Int)].collect()
    assert(out.map(_._3).toSeq == Seq(2000, 2001))
    assert(out.forall(_._2 == 5.0))
  }

  test("explodeByTimeRange: empty/inverted ranges emit no rows") {
    val df = Seq((1L, 2000, 2000, 10.0), (2L, 2005, 2001, 8.0),
      (3L, 2000, 2001, 6.0)).toDF("id", "y0", "y1", "v")
    val out = WindowOps.explodeByTimeRange(df, "y0", "y1", "yr", Seq("v"), scale = false)
      .select("id").as[Long].collect()
    assert(out.toSeq == Seq(3L)) // only the valid 1-year range survives
  }

  test("expandTimeColumn: full_range / observed / until + fillna strategies") {
    val df = Seq(("usa", 2000, Some(1.0)), ("usa", 2002, Some(3.0)),
      ("fra", 2001, Some(5.0))).toDF("country", "year", "v")
    // full_range: every entity covers the GLOBAL range 2000..2002
    val fr = WindowOps.expandTimeColumn(df, Seq("country"), "year",
        method = "full_range", fillna = Seq("zero"))
      .orderBy("country", "year").as[(String, Int, Option[Double])].collect()
    assert(fr.count(_._1 == "fra") == 3)
    assert(fr.filter(_._1 == "fra").map(_._3).toSeq ==
      Seq(Some(0.0), Some(5.0), Some(0.0)))
    // observed: entity x observed-times only
    val ob = WindowOps.expandTimeColumn(df, Seq("country"), "year",
        method = "observed")
      .orderBy("country", "year").as[(String, Int, Option[Double])].collect()
    assert(ob.filter(_._1 == "fra").map(_._2).toSeq == Seq(2000, 2001, 2002))
    // until + ffill: extend to 2004 forward-filled
    val un = WindowOps.expandTimeColumn(df, Seq("country"), "year",
        method = "full_range_entity", untilTime = Some(2004),
        fillna = Seq("interpolate", "ffill"))
      .orderBy("country", "year").as[(String, Int, Option[Double])].collect()
    val usa = un.filter(_._1 == "usa").map(_._3)
    assert(usa.toSeq == Seq(Some(1.0), Some(2.0), Some(3.0), Some(3.0), Some(3.0)))
    // since extension backwards, left null without fill
    val si = WindowOps.expandTimeColumn(df, Seq("country"), "year",
        method = "none", sinceTime = Some(1999))
      .orderBy("country", "year").as[(String, Int, Option[Double])].collect()
    assert(si.filter(_._1 == "fra").map(_._2).toSeq == Seq(1999, 2000, 2001))
    assert(si.filter(t => t._1 == "fra" && t._2 < 2001).forall(_._3.isEmpty))
  }

  test("groupTransform broadcasts the group aggregate to member rows") {
    val df = Seq(("a", 1.0), ("a", 3.0), ("b", 5.0)).toDF("k", "v")
    val out = GroupOps.groupTransform(df, Seq("k"), "v", "sum")
      .select("k", "v_sum").as[(String, Double)].collect().toSet
    assert(out == Set(("a", 4.0), ("b", 5.0)))
    val m = GroupOps.groupTransform(df, Seq("k"), "v", "size")
      .filter($"k" === "a").select("v_size").as[Long].head()
    assert(m == 2L)
  }

  test("groupbyAggMap: per-column aggregation in one pass") {
    val df = Seq(("a", 1.0, 10.0), ("a", 3.0, 20.0), ("b", 5.0, 7.0))
      .toDF("k", "x", "y")
    val out = GroupOps.groupbyAggMap(df, Seq("k"),
        Map("x" -> "sum", "y" -> "max"))
      .orderBy("k").as[(String, Double, Double)].collect()
    assert(out.toSeq == Seq(("a", 4.0, 20.0), ("b", 5.0, 7.0)))
  }

  test("doublingTime: periods*ln2/ln(1+pct); null for flat/shrinking") {
    val df = Seq(("a", 1, 100.0), ("a", 2, 200.0), ("a", 3, 200.0))
      .toDF("k", "t", "v")
    val out = WindowOps.doublingTime(df, Seq("k"), "t", "v", periods = 1)
      .orderBy("t").select("v_doubling").as[Option[Double]].collect()
    assert(out(0).isEmpty) // no lag
    assert(math.abs(out(1).get - 1.0) < 1e-12) // doubled in 1 period
    assert(out(2).isEmpty) // flat → null
  }

  test("reshape: melt→pivot round-trip") {
    val wide = Seq(("usa", 2020, 1.0, 2.0)).toDF("c", "y", "gdp", "pop")
    val long = Reshape.melt(wide, Seq("c", "y"), Seq("gdp", "pop"))
    assert(long.count() == 2)
    val back = Reshape.pivot(long, Seq("c", "y"), "variable", "value",
      Seq("gdp", "pop"))
    assert(back.columns.toSet == Set("c", "y", "gdp", "pop"))
    assert(back.select("gdp", "pop").as[(Double, Double)].collect().head == ((1.0, 2.0)))
  }

  test("longToWide builds var__dim names and rejects collisions") {
    val long = Seq(
      ("usa", 2020, "male", 1.0), ("usa", 2020, "female", 2.0)
    ).toDF("c", "y", "sex", "deaths")
    val wide = Reshape.longToWide(long, Seq("c", "y"), Seq("sex"), "deaths",
      Seq(Seq("male", "female")))
    assert(wide.columns.toSet == Set("c", "y", "deaths__male", "deaths__female"))
    intercept[IllegalArgumentException] {
      Reshape.longToWide(long, Seq("c", "y"), Seq("sex"), "deaths",
        Seq(Seq("x y", "x_y"))) // collides after underscore
    }
  }
}
