package graft

/** Driver-contract smoke: entry() returns rows on sf0.001 and every
  * registered query has a runnable function; oracle keys ⊆ query keys. */
class EntrySpec extends SparkSpec {

  test("entry() produces rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracle keys are a subset of query keys; all names are distinct") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(o.subsetOf(q))
    assert(q.size == Queries.all.size + TrainQueries.all.size + CdcQuery.all.size)
  }

  test("every query runs on sf0.001 and returns a readable schema") {
    val bad = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try { fn(spark, "/root/testdata/sf0.001").limit(1).collect(); None }
      catch { case e: Throwable => Some(s"$name: ${e.getMessage.take(100)}") }
    }
    assert(bad.isEmpty, bad.mkString("\n"))
  }

  test("repeated CDC queries register scratch paths, not JVM shutdown hooks") {
    val before = CdcQuery.registeredScratchCount
    CdcQuery.qCdcMerge(spark, "/root/testdata/sf0.001").limit(1).collect()
    CdcQuery.qCdcMerge(spark, "/root/testdata/sf0.001").limit(1).collect()
    // each invocation adds one path to the ONE static hook's registry —
    // the registry grows, the JVM hook set does not (one Thread total)
    assert(CdcQuery.registeredScratchCount == before + 2)
  }
}
