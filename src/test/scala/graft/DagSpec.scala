package graft

import graft.graph.{Step, StepDag}
import org.apache.spark.sql.functions._

/** Step-DAG tests mirroring the reference's engine suite
  * (/root/reference/tests/test_steps.py: topo order :141-226, dirty
  * propagation :106-120). */
class DagSpec extends SparkSpec {
  import spark.implicits._

  def mkDag(store: String, codeB: String = "v1"): StepDag = {
    var runsA = 0
    new StepDag(Seq(
      Step("data/a", Nil, "v1", (s, _) => {
        import s.implicits._
        Seq(("k1", 1.0), ("k2", 2.0)).toDF("k", "v")
      }),
      Step("data/b", Seq("data/a"), codeB, (_, in) =>
        in("data/a").withColumn("v", col("v") * 10)),
      Step("data/c", Seq("data/b"), "v1", (_, in) =>
        in("data/b").groupBy("k").agg(sum("v").as("v")))
    ), store)
  }

  test("topological order and regex subgraph selection") {
    val dag = mkDag(tmpDir("dag1"))
    assert(dag.topoOrder() == Seq("data/a", "data/b", "data/c"))
    assert(dag.select("data/b") == Set("data/a", "data/b")) // upstream closure
    assert(dag.select("data/b", downstream = true) ==
      Set("data/a", "data/b", "data/c"))
  }

  test("dirty-only execution: second run skips everything") {
    val store = tmpDir("dag2")
    val dag = mkDag(store)
    val r1 = dag.run(spark)
    assert(r1.executed == Seq("data/a", "data/b", "data/c"))
    val r2 = dag.run(spark)
    assert(r2.executed.isEmpty && r2.skipped.size == 3)
    val out = dag.table("data/c").read(spark)
      .as[(String, Double)].collect().toMap
    assert(out == Map("k1" -> 10.0, "k2" -> 20.0))
  }

  test("code change marks the step and its downstream dirty") {
    val store = tmpDir("dag3")
    mkDag(store).run(spark)
    val dag2 = mkDag(store, codeB = "v2") // b's code changed
    val r = dag2.run(spark)
    assert(r.skipped == Seq("data/a"))
    assert(r.executed == Seq("data/b", "data/c")) // Merkle cascade
  }

  test("incremental step: consumes the change feed, matches full recompute") {
    import graft.graph.IncrementalSpec
    val store = tmpDir("dag-inc")
    // external CDC table, ingested outside the DAG (MOR commits)
    def evd(lsn: Long, op: String, url: String, text: String) =
      graft.model.ChangeEvent(lsn, op, url,
        new java.sql.Timestamp(0), Array.emptyByteArray, text, "en")
    val srcDir = s"$store/pages"
    val src = cdc.Engine.createPagesTable(srcDir, 4)
    cdc.MergeApply(spark, src,
      (1 to 40).map(i => evd(i.toLong, "U", s"u${i % 10}", s"w " * (i % 5 + 1))).toDS.toDF,
      0L, stepId = "cdc_ingest")

    var fullRuns = 0
    val tokenCount = Step("derived/tokens", Seq("pages"), "v1",
      run = (s, in) => {
        fullRuns += 1
        in("pages").select(col("url"),
          org.apache.spark.sql.functions.size(split(col("text"), " ")).cast("long").as("n_tok"),
          col("_lsn")) // per-row LWW seed (exact under out-of-order splits)
      },
      incremental = Some(IncrementalSpec.one("pages") { (s, feed, _) =>
        feed.select(
          col("_lsn").as("lsn"), col("_op").as("op"), col("url"),
          org.apache.spark.sql.functions.size(split(col("text"), " ")).cast("long").as("n_tok"))
      }))
    val dag = new StepDag(Seq(Step.external("pages"), tokenCount), store)

    // first build: full path (no output yet); external step never executes
    val r1 = dag.run(spark)
    assert(r1.executed == Seq("derived/tokens") && r1.skipped == Seq("pages"))
    assert(fullRuns == 1)
    // no upstream movement → clean
    assert(dag.run(spark).executed.isEmpty)

    // upstream moves: update u3, delete u7, insert u99 → INCREMENTAL path
    cdc.MergeApply(spark, src,
      Seq(evd(100, "U", "u3", "a b c"), evd(101, "D", "u7", ""),
        evd(102, "U", "u99", "x y")).toDS.toDF,
      1L, stepId = "cdc_ingest")
    val r2 = dag.run(spark)
    assert(r2.executed == Seq("derived/tokens"))
    assert(fullRuns == 1) // run() NOT invoked — change feed consumed instead
    val out = dag.table("derived/tokens").read(spark)
      .select("url", "n_tok").as[(String, Long)].collect().toMap
    assert(out("u3") == 3L && out("u99") == 2L)
    assert(!out.contains("u7")) // delete propagated as tombstone
    // incremental state ≡ full recompute over the current upstream
    val expected = src.read(spark)
      .select(col("url"), org.apache.spark.sql.functions.size(split(col("text"), " ")).cast("long").as("n_tok"))
      .as[(String, Long)].collect().toMap
    assert(out == expected)
    // converged again
    assert(dag.run(spark).executed.isEmpty)

    // a code change falls back to the FULL path
    val dag2 = new StepDag(Seq(Step.external("pages"),
      tokenCount.copy(codeVersion = "v2")), store)
    val r3 = dag2.run(spark)
    assert(r3.executed == Seq("derived/tokens") && fullRuns == 2)
  }

  test("continuous materialized view: stream onBatch keeps the derived step in sync") {
    import graft.cdc.{Engine, EventGen}
    import graft.graph.IncrementalSpec
    val store = tmpDir("dag-stream")
    val cfg = EventGen.Config(nEvents = 6000, nUrls = 400, seed = 31, parallelism = 4)
    val walDir = tmpDir("dag-wal")
    EventGen.writeWalSegments(spark, cfg, walDir, 3)
    val src = Engine.createPagesTable(s"$store/pages", numBuckets = 4)

    var fullRuns = 0
    val tokens = Step("derived/tokens", Seq("pages"), "v1",
      run = (_, in) => { fullRuns += 1
        in("pages").select(col("url"),
          org.apache.spark.sql.functions.size(split(col("text"), " ")).cast("long").as("n_tok"),
          col("_lsn")) },
      incremental = Some(IncrementalSpec.one("pages") { (_, feed, _) =>
        feed.select(
          col("_lsn").as("lsn"), col("_op").as("op"), col("url"),
          org.apache.spark.sql.functions.size(split(col("text"), " ")).cast("long").as("n_tok"))
      }))
    val dag = new StepDag(Seq(graft.graph.Step.external("pages"), tokens), store)

    // every micro-batch commit triggers dag maintenance: the first batch is
    // the full seed build, every later batch is a change-feed increment
    val q = Engine.runStream(spark, walDir, tmpDir("dag-ckpt"), src,
      maxFilesPerTrigger = Some(4), compactEvery = 0,
      onBatch = _ => dag.run(spark))
    q.awaitTermination()

    assert(fullRuns == 1) // seeded once, then maintained incrementally
    val out = dag.table("derived/tokens").read(spark)
      .select("url", "n_tok").as[(String, Long)].collect().toMap
    val expected = src.read(spark)
      .select(col("url"),
        org.apache.spark.sql.functions.size(split(col("text"), " ")).cast("long").as("n_tok"))
      .as[(String, Long)].collect().toMap
    assert(out == expected && out.nonEmpty)
  }

  test("cycles and missing deps are rejected") {
    val bad = new StepDag(Seq(
      Step("x", Seq("y"), "v", (_, _) => null),
      Step("y", Seq("x"), "v", (_, _) => null)), tmpDir("dag4"))
    intercept[IllegalArgumentException] { bad.topoOrder() }
    val missing = new StepDag(Seq(
      Step("x", Seq("nope"), "v", (_, _) => null)), tmpDir("dag5"))
    intercept[IllegalArgumentException] { missing.topoOrder() }
  }
}
