package graft

import graft.ops.Diff

/** datadiff harness tests with planted differences (mirrors the verdict
  * categories of /root/reference/etl/datadiff.py and the tolerance modes of
  * compare_tables, misc.py:484-663). */
class DiffSpec extends SparkSpec {
  import spark.implicits._

  lazy val old = Seq(
    ("usa", 2020, 100.0, "a"),
    ("usa", 2021, 110.0, "a"),
    ("fra", 2020, 50.0, "b"),
    ("deu", 2020, 70.0, "c") // removed in new
  ).toDF("country", "year", "v", "s")

  lazy val neu = Seq(
    ("usa", 2020, 100.0, "a"),        // equal
    ("usa", 2021, 110.000000001, "a"), // within tolerance → equal
    ("fra", 2020, 55.0, "b"),          // changed (v)
    ("esp", 2020, 30.0, "d")           // added
  ).toDF("country", "year", "v", "s")

  test("rowDiff classifies added/removed/changed/equal with tolerance") {
    val diff = Diff.rowDiff(old, neu, Seq("country", "year"))
    val byKey = diff.select("country", "year", "_status")
      .as[(String, Int, String)].collect()
      .map { case (c, y, s) => (c, y) -> s }.toMap
    assert(byKey(("usa", 2020)) == "equal")
    assert(byKey(("usa", 2021)) == "equal") // 1e-9 within are_equal tolerance
    assert(byKey(("fra", 2020)) == "changed")
    assert(byKey(("deu", 2020)) == "only_in_old")
    assert(byKey(("esp", 2020)) == "only_in_new")
    val changedCols = diff.filter($"country" === "fra")
      .select("_changed_cols").as[Seq[String]].head()
    assert(changedCols == Seq("v"))
    val s = Diff.summarize(diff)
    assert(s == Diff.DiffSummary(onlyInOld = 1, onlyInNew = 1, changed = 1, equal = 2))
    assert(!s.isEmpty)
  }

  test("bard_max metric tolerates proportional deviation") {
    // 50 vs 55: BARD = 5/105 ≈ 0.048 ≤ 0.1 → equal under bard_max
    val diff = Diff.rowDiff(old, neu, Seq("country", "year"),
      Diff.Tolerance(metric = "bard_max", bardMax = 0.1))
    val fra = diff.filter($"country" === "fra")
      .select("_status").as[String].head()
    assert(fra == "equal")
  }

  test("string columns compare null-safe exact; nulls equal nulls") {
    val a = Seq((1, Option("x")), (2, None: Option[String])).toDF("k", "s")
    val b = Seq((1, Option("y")), (2, None: Option[String])).toDF("k", "s")
    val diff = Diff.rowDiff(a, b, Seq("k"))
    val m = diff.select("k", "_status").as[(Int, String)].collect().toMap
    assert(m(1) == "changed" && m(2) == "equal")
  }

  test("schemaDiff reports added/removed/type-changed columns") {
    val a = Seq((1, 1.0, "x")).toDF("k", "v", "gone")
    val b = Seq((1, 1, "y")).toDF("k", "v", "fresh")
    val sd = Diff.schemaDiff(a, b)
    assert(sd.addedColumns == Seq("fresh"))
    assert(sd.removedColumns == Seq("gone"))
    assert(sd.typeChanged == Seq(("v", "double", "int")))
    assert(Diff.schemaDiff(a, a).isEmpty)
  }

  test("diffSnapshots compares two lake snapshots by time travel") {
    val dir = tmpDir("lake-diff") + "/pages"
    val table = cdc.Engine.createPagesTable(dir, 2)
    def evd(lsn: Long, op: String, url: String, text: String) =
      graft.model.ChangeEvent(lsn, op, url,
        new java.sql.Timestamp(0), Array.emptyByteArray, text, "en")
    cdc.MergeApply(spark, table,
      Seq(evd(1, "I", "u1", "a"), evd(2, "I", "u2", "b")).toDS.toDF, 0L)
    cdc.MergeApply(spark, table,
      Seq(evd(3, "U", "u2", "B"), evd(4, "I", "u3", "c"),
        evd(5, "D", "u1", null)).toDS.toDF, 1L)
    val diff = Diff.diffSnapshots(spark, table, 1L, 2L)
    val m = diff.select("url", "_status").as[(String, String)].collect().toMap
    assert(m("u1") == "only_in_old")
    assert(m("u2") == "changed")
    assert(m("u3") == "only_in_new")
  }
}
