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
