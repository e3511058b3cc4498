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
    // the unmapped-country assert fires lazily at action time (raise_error
    // in the projection — no eager plan-build job)
    val e = intercept[Exception] {
      Grapher.countryToEntityId(bad, entities).collect()
    }
    assert(e.getMessage.contains("have not been mapped"))
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

  test("dated table → days-since-zeroDay year + display metadata (helpers.py:618-689)") {
    import graft.meta.MetaTable
    import graft.model.{TableMeta, VariableMeta}
    val mt = MetaTable(
      Seq(
        ("France", "2023-01-15", 1.0), ("France", "2023-01-10", 2.0),
        ("United States", "2023-02-10", 3.0)
      ).toDF("country", "date", "cases"),
      TableMeta("t", fields = Map("cases" ->
        VariableMeta(title = Some("Cases"), unit = Some("cases")))))
    val out = Grapher.adaptTableWithDatesForGrapher(mt, timeInterval = "week")
    assert(!out.df.columns.contains("date") && out.df.columns.contains("year"))
    val byCountry = out.df.select("country", "year")
      .as[(String, Int)].collect().groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq)
    assert(byCountry("France") == Seq(0, 5))          // zeroDay = 2023-01-10
    assert(byCountry("United States") == Seq(31))
    val d = out.meta.fields("cases").display
    assert(d("zeroDay") == "2023-01-10" && d("timeInterval") == "week")
    assert(out.meta.fields("cases").unit.contains("cases")) // other meta intact

    // composed path: MetaTable adapt auto-routes `date`, keeps metadata,
    // resolves entities; duplicate titles raise
    val adapted = Grapher.adaptTableForGrapher(mt, entities)
    assert(adapted.df.columns.contains("entityId") && adapted.df.columns.contains("year"))
    assert(adapted.meta.fields("cases").display("zeroDay") == "2023-01-10")
    val dupTitles = mt.copy(meta = mt.meta.copy(fields = Map(
      "a" -> VariableMeta(title = Some("T")), "b" -> VariableMeta(title = Some("T")))))
    intercept[IllegalArgumentException] {
      Grapher.adaptTableForGrapher(dupTitles, entities)
    }
  }

  test("per-combo fan-out renders metadata and enforces unique names/titles") {
    import graft.meta.MetaTable
    import graft.model.{TableMeta, VariableMeta}
    val mt = MetaTable(
      Seq(
        (1L, 2020, "male", Some(10.0)), (1L, 2020, "female", Some(11.0)),
        (2L, 2020, "male", None), (2L, 2020, "female", Some(12.0))
      ).toDF("entityId", "year", "sex", "deaths"),
      TableMeta("t", fields = Map("deaths" -> VariableMeta(
        title = Some("Deaths"),
        unit = Some("deaths"),
        description = Some(
          "Deaths among {% if sex == 'male' %}men{% else %}women{% endif %}")))))
    val out = Grapher.yieldWideTablesWithMeta(
      mt, Seq("entityId", "year"), Seq("sex"), Seq("deaths"))
    assert(out.map(_._1) == Seq("deaths__sex_female", "deaths__sex_male"))
    val byName = out.map(t => t._1 -> t).toMap
    // non-Jinja title gets the "Title - Dim: value" default, then renders
    assert(byName("deaths__sex_male")._3.title.contains("Deaths - Sex: male"))
    assert(byName("deaths__sex_male")._3.description.contains("Deaths among men"))
    assert(byName("deaths__sex_female")._3.description.contains("Deaths among women"))
    // null rows dropped from the emitted long table
    assert(byName("deaths__sex_male")._2.count() == 1)
    assert(byName("deaths__sex_female")._2.columns.toSeq ==
      Seq("entityId", "year", "deaths__sex_female"))
    // duplicate rendered titles raise: a Jinja title that ignores the dim
    val dup = mt.copy(meta = mt.meta.copy(fields = Map("deaths" ->
      VariableMeta(title = Some("{{ ignored }}Same")))))
    intercept[IllegalArgumentException] {
      Grapher.yieldWideTablesWithMeta(dup, Seq("entityId", "year"), Seq("sex"), Seq("deaths"))
    }
  }

  test("end-to-end publish: rollup → grapher adapt → rendered fan-out → partitioned write") {
    import org.apache.spark.sql.functions.{col, lit}
    import graft.meta.MetaTable
    import graft.model.{TableMeta, VariableMeta}
    import graft.ops.GroupOps
    // garden table: (country, year, sex) → deaths, with templated metadata
    val garden = Seq(
      ("France", 2020, "male", 10.0), ("France", 2020, "female", 11.0),
      ("Germany", 2020, "male", 20.0), ("Germany", 2020, "female", 21.0)
    ).toDF("country", "year", "sex", "deaths")
    val members = Seq(("Europe", "France"), ("Europe", "Germany"))
      .toDF("region", "member")
    val rolled = GroupOps.addRegionAggregates(
      garden, "country", Seq("year", "sex"), Seq("deaths"), members)
    val mt = MetaTable(rolled, TableMeta("deaths_table", fields = Map(
      "deaths" -> VariableMeta(title = Some("Deaths"), unit = Some("deaths"),
        description = Some(
          "Deaths among {% if sex == 'male' %}men{% else %}women{% endif %}")))))
    // publish adaptation: entities resolved (Europe created on the fly)
    val adapted = Grapher.adaptTableForGrapher(mt, entities)
    assert(adapted.df.columns.toSet ==
      Set("entityId", "entityCode", "entityName", "year", "sex", "deaths"))
    // per-combo fan-out with rendered metadata
    val fanned = Grapher.yieldWideTablesWithMeta(
      adapted, Seq("entityId", "year"), Seq("sex"), Seq("deaths"))
    assert(fanned.map(_._1) == Seq("deaths__sex_female", "deaths__sex_male"))
    assert(fanned.forall(_._3.unit.contains("deaths")))
    assert(fanned.find(_._1 == "deaths__sex_male").get
      ._3.description.contains("Deaths among men"))
    // one partitioned write of the union; per-variable read-back intact
    val long = fanned.map { case (name, df, _) =>
      df.select(col("entityId"), col("year"),
        lit(name).as("variable"), col(name).as("value"))
    }.reduce(_ unionByName _)
    val out = tmpDir("grapher-e2e")
    Grapher.writeLongAsWideTables(long, out)
    val male = Grapher.readWideTable(spark, out, "deaths__sex_male")
    val byEntity = male.select("entityId", "deaths__sex_male")
      .as[(Long, Double)].collect().toMap
    // Europe row rolled up (10+20), member rows preserved
    val europeId = adapted.df.filter($"entityName" === "Europe")
      .select("entityId").as[Long].head()
    assert(byEntity(europeId) == 30.0)
    assert(byEntity(2L) == 10.0) // France
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

  test("fan-out job count is constant in combos × columns (one aggregation pass)") {
    import graft.meta.MetaTable
    import graft.model.{TableMeta, VariableMeta}
    // 3 dim values × 4 value columns; v3 all-null (must be skipped with NO
    // per-(combo,column) isEmpty job — the one-pass count aggregation)
    val rows = for { e <- 1 to 5; s <- Seq("a", "b", "c") } yield
      (e.toLong, 2020, s, Some(1.0 * e), Some(2.0), None: Option[Double], Some(4.0))
    val mt = MetaTable(rows.toDF("entityId", "year", "sex", "v1", "v2", "v3", "v4"),
      TableMeta("t"))
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val out = Grapher.yieldWideTablesWithMeta(
        mt, Seq("entityId", "year"), Seq("sex"), Seq("v1", "v2", "v3", "v4"))
      assert(out.size == 9) // 3 combos × (4 cols − all-null v3)
      // listener events are async: poll until the count is stable
      var last = jobs.get(); var stable = 0; var waited = 0
      while (stable < 400 && waited < 5000) {
        Thread.sleep(100); waited += 100
        if (jobs.get() == last) stable += 100
        else { last = jobs.get(); stable = 0 }
      }
      // ONE aggregation pass (AQE may add a sub-job) — the old shape ran
      // 1 distinct + 12 isEmpty jobs here
      assert(jobs.get() <= 3, s"expected ≤3 jobs, saw ${jobs.get()}")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("publish: one write for all variables, ghost cleanup, idempotent") {
    import graft.meta.MetaTable
    import graft.model.{TableMeta, VariableMeta}
    val garden = Seq(
      ("France", 2020, 1.5, 67.0), ("Germany", 2020, 3.5, 83.0)
    ).toDF("country", "year", "gdp", "pop")
    val mt = MetaTable(garden, TableMeta("t", fields = Map(
      "gdp" -> VariableMeta(title = Some("GDP")),
      "pop" -> VariableMeta(title = Some("Population")))))
    val out = tmpDir("grapher-pub")
    val names1 = Grapher.publish(mt, entities, out)
    assert(names1.toSet == Set("gdp", "pop"))
    val gdp = Grapher.readWideTable(spark, out, "gdp")
    assert(gdp.select("gdp").as[Double].collect().toSet == Set(1.5, 3.5))
    // per-variable metadata sidecar round-trips
    val (meta, _) = graft.sources.TableIO.readSidecar(spark, s"$out/_meta/variable=gdp")
    assert(meta.fields("gdp").title.contains("GDP"))
    // re-publish with pop removed → its dir is a GHOST and must be deleted
    val mt2 = MetaTable(garden.drop("pop"), TableMeta("t", fields = Map(
      "gdp" -> VariableMeta(title = Some("GDP")))))
    assert(Grapher.publish(mt2, entities, out) == Seq("gdp"))
    val fs = new org.apache.hadoop.fs.Path(out)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$out/variable=pop")))
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$out/variable=gdp")))
    // idempotent: publishing again converges to the same state
    Grapher.publish(mt2, entities, out)
    assert(Grapher.readWideTable(spark, out, "gdp").count() == 2)
    // indicator upgrade map between two published versions (sidecar-driven)
    val outOld = tmpDir("grapher-pub-old")
    Grapher.publish(mt, entities, outOld) // the (gdp, pop) version
    val um = graft.graph.UpgradeMap.betweenPublishDirs(spark, outOld, out)
    assert(um.mapped == Map("gdp" -> "gdp"))
    assert(um.removed == Seq("pop") && um.added.isEmpty)
  }

  test("publish: checksum gate — unchanged skips, one changed column rewrites one dir") {
    import graft.meta.MetaTable
    import graft.model.{TableMeta, VariableMeta}
    def mtOf(df: org.apache.spark.sql.DataFrame, gdpTitle: String) =
      MetaTable(df, TableMeta("t", fields = Map(
        "gdp" -> VariableMeta(title = Some(gdpTitle)),
        "pop" -> VariableMeta(title = Some("Population")))))
    val garden = Seq(
      ("France", 2020, 1.5, 67.0), ("Germany", 2020, 3.5, 83.0)
    ).toDF("country", "year", "gdp", "pop")
    val out = tmpDir("grapher-gate")
    val fs = new org.apache.hadoop.fs.Path(out)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def dataFiles(v: String): Map[String, Long] = {
      val p = new org.apache.hadoop.fs.Path(s"$out/variable=$v")
      fs.listStatus(p).filter(_.isFile).filterNot(_.getPath.getName.startsWith("_"))
        .map(st => st.getPath.toString -> st.getModificationTime).toMap
    }

    val r1 = Grapher.publishDetailed(mtOf(garden, "GDP"), entities, out)
    assert(r1.written.toSet == Set("gdp", "pop") && r1.skipped.isEmpty)
    val before = Map("gdp" -> dataFiles("gdp"), "pop" -> dataFiles("pop"))

    // identical republish: checksum-gated, ZERO data files rewritten
    val r2 = Grapher.publishDetailed(mtOf(garden, "GDP"), entities, out)
    assert(r2.written.isEmpty && r2.metaOnly.isEmpty)
    assert(r2.skipped.toSet == Set("gdp", "pop"))
    assert(dataFiles("gdp") == before("gdp") && dataFiles("pop") == before("pop"))

    // one changed column: exactly that variable's dir is rewritten
    val garden2 = Seq(
      ("France", 2020, 9.9, 67.0), ("Germany", 2020, 3.5, 83.0)
    ).toDF("country", "year", "gdp", "pop")
    val r3 = Grapher.publishDetailed(mtOf(garden2, "GDP"), entities, out)
    assert(r3.written == Seq("gdp") && r3.skipped == Seq("pop"))
    assert(dataFiles("pop") == before("pop"), "pop dir must be untouched")
    assert(Grapher.readWideTable(spark, out, "gdp")
      .select("gdp").as[Double].collect().toSet == Set(9.9, 3.5))

    // metadata-only edit: sidecar re-stamped, zero data IO
    val gdpAfter = dataFiles("gdp")
    val r4 = Grapher.publishDetailed(mtOf(garden2, "GDP v2"), entities, out)
    assert(r4.metaOnly == Seq("gdp") && r4.written.isEmpty)
    assert(dataFiles("gdp") == gdpAfter)
    val (meta, _) = graft.sources.TableIO.readSidecar(spark, s"$out/_meta/variable=gdp")
    assert(meta.fields("gdp").title.contains("GDP v2"))
  }
}
