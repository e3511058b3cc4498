package graft

import graft.meta.MetaTable
import graft.model.{TableMeta, VariableMeta}
import org.apache.spark.sql.functions._

/** Metadata-propagation tests mirroring the reference's core suite
  * (/root/reference/lib/catalog/tests/test_tables.py: metadata through
  * rename/merge/concat/arithmetic, metadata combination on shared columns).
  */
class MetaTableSpec extends SparkSpec {
  import spark.implicits._

  val gdpMeta = VariableMeta(title = Some("GDP"), unit = Some("USD"))
  def base = MetaTable(
    Seq(("usa", 2020, 100.0), ("fra", 2020, 50.0)).toDF("country", "year", "gdp"),
    TableMeta("t1", primaryKey = Seq("country", "year"),
      fields = Map("gdp" -> gdpMeta)))

  test("select/filter/rename keep surviving metadata") {
    val s = base.select("country", "gdp")
    assert(s.meta.fields == Map("gdp" -> gdpMeta))
    val f = base.filter(col("year") === 2020)
    assert(f.meta.fields("gdp") == gdpMeta)
    val r = base.withColumnRenamed("gdp", "gdp_usd")
    assert(r.meta.fields.keySet == Set("gdp_usd"))
    assert(r.df.columns.contains("gdp_usd"))
  }

  test("underscore renames columns, pk and field keys together") {
    val messy = MetaTable(
      Seq((1, 2.0)).toDF("Country Name", "GDP (current US$)"),
      TableMeta("t", primaryKey = Seq("Country Name"),
        fields = Map("GDP (current US$)" -> gdpMeta)))
    val u = messy.underscore()
    assert(u.df.columns.toSeq == Seq("country_name", "gdp_current_us"))
    assert(u.meta.primaryKey == Seq("country_name"))
    assert(u.meta.fields.keySet == Set("gdp_current_us"))
  }

  test("merge combines shared-column metadata: equal kept, conflicts dropped") {
    val other = MetaTable(
      Seq(("usa", 2020, 1.0, 7.0)).toDF("country", "year", "energy", "gdp"),
      TableMeta("t2", fields = Map(
        "energy" -> VariableMeta(title = Some("Energy")),
        "gdp" -> VariableMeta(title = Some("GDP"), unit = Some("EUR")))))
    val m = base.merge(other, "inner", Seq("country", "year"))
    assert(m.df.columns.toSet ==
      Set("country", "year", "gdp_x", "gdp_y", "energy"))
    // unsuffixed columns keep (combined) metadata; suffixed overlap columns
    // lose theirs (name no longer matches — the caller re-attaches)
    assert(m.meta.fields.get("energy").flatMap(_.title).contains("Energy"))
    assert(!m.meta.fields.contains("gdp"))
  }

  test("concat combines metadata across sides") {
    val other = MetaTable(
      Seq(("deu", 2020, 60.0)).toDF("country", "year", "gdp"),
      TableMeta("t3", fields = Map(
        "gdp" -> VariableMeta(title = Some("GDP"), unit = Some("EUR")))))
    val c = base.concat(other)
    assert(c.df.count() == 3)
    val gdp = c.meta.fields("gdp")
    assert(gdp.title.contains("GDP")) // agrees
    assert(gdp.unit.isEmpty)          // USD vs EUR conflict dropped
  }

  test("derived columns start fresh; processing log accumulates") {
    val d = base
      .withColumn("gdp_2x", col("gdp") * 2)
      .logStep("doubled gdp")
    assert(d.meta.fields("gdp_2x").title.isEmpty)
    assert(d.meta.fields("gdp").processingLog == List("doubled gdp"))
    assert(d.df.select("gdp_2x").as[Double].collect().sorted.toSeq == Seq(100.0, 200.0))
  }

  test("arithmetic combines metadata automatically (indicators.py:278-405)") {
    val mt = MetaTable(
      Seq(("usa", 10.0, 2.0), ("fra", 20.0, 4.0)).toDF("country", "energy", "pop"),
      TableMeta("t", fields = Map(
        "energy" -> VariableMeta(title = Some("Energy"), unit = Some("TWh")),
        "pop" -> VariableMeta(title = Some("Population"), unit = Some("people"),
          description = Some("people counted")))))
    // + keeps the unique non-null value per field; conflicting titles drop
    val sum = mt.binaryOp("both", "energy", "pop", "+")
    assert(sum.meta.fields("both").title.isEmpty)    // Energy vs Population
    assert(sum.meta.fields("both").unit.isEmpty)     // TWh vs people
    assert(sum.meta.fields("both").description.contains("people counted")) // unique non-null kept
    assert(sum.df.select("both").as[Double].collect().sorted.toSeq == Seq(12.0, 24.0))
    // division never inherits a field the numerator lacks (indicators.py:570)
    val ratio = mt.binaryOp("per_capita", "energy", "pop", "/")
    assert(ratio.meta.fields("per_capita").description.isEmpty)
    assert(ratio.meta.fields("per_capita").processingLog.exists(_.contains("/")))
    assert(ratio.df.select("per_capita").as[Double].collect().sorted.toSeq == Seq(5.0, 5.0))
    // agreeing unit survives multiplication
    val mt2 = MetaTable(
      Seq((1.0, 2.0)).toDF("a", "b"),
      TableMeta("t2", fields = Map(
        "a" -> VariableMeta(unit = Some("m")), "b" -> VariableMeta(unit = Some("m")))))
    assert(mt2.binaryOp("ab", "a", "b", "*").meta.fields("ab").unit.contains("m"))
  }

  test("combineVariable is commutative and keeps agreement only") {
    val a = VariableMeta(title = Some("x"), unit = Some("u"))
    val b = VariableMeta(title = Some("x"), unit = Some("v"))
    val ab = MetaTable.combineVariable(a, b)
    val ba = MetaTable.combineVariable(b, a)
    assert(ab == ba)
    assert(ab.title.contains("x") && ab.unit.isEmpty)
  }

  test("division display: conflicts drop; numerator-missing never inherits (indicators.py:564-600)") {
    val x = VariableMeta(display = Map("unit" -> "a"))
    val y = VariableMeta(display = Map("unit" -> "b"))
    // two DIFFERENT non-empty displays → dropped, for division too
    assert(MetaTable.combineVariableOp(x, y, "/").display.isEmpty)
    assert(MetaTable.combineVariableOp(x, y, "+").display.isEmpty)
    // division's special case: only a MISSING numerator display forces None
    assert(MetaTable.combineVariableOp(x, VariableMeta(), "/").display == Map("unit" -> "a"))
    assert(MetaTable.combineVariableOp(VariableMeta(), y, "/").display.isEmpty)
    // non-division still inherits the unique non-empty side
    assert(MetaTable.combineVariableOp(VariableMeta(), y, "+").display == Map("unit" -> "b"))
    // equal displays always kept
    assert(MetaTable.combineVariableOp(x, x.copy(), "/").display == Map("unit" -> "a"))
  }
}
