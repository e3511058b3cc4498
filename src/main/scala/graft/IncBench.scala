package graft

import graft.graph.{IncrementalSpec, Step, StepDag}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Incremental-recompute evidence: a derived step over a large CDC table,
  * timed as (a) full build, (b) incremental consumption of a TINY change
  * batch via the change feed. The ratio is the point of the architecture —
  * downstream cost tracks the CHANGE volume, not the table size (at 100 TB
  * the full path is off the table entirely). Prints one JSON line.
  *
  * Env: SPARK_GRAFT_INC_EVENTS (default 500k), SPARK_GRAFT_INC_CHANGES
  * (default 100), SPARK_GRAFT_CPUS. */
object IncBench {

  /** (full-build sec, incremental sec, derived rows) for a token-count step
    * over a fresh CDC table of `nEvents`, then a `nChanges`-event change. */
  def measure(spark: SparkSession, store: String,
      nEvents: Long, nChanges: Int): (Double, Double, Long) = {
    val cfg = cdc.EventGen.Config(
      nEvents = nEvents, nUrls = math.max(1000L, nEvents / 10),
      nDomains = 200, seed = 42, skew = 2.0, parallelism = 32)
    val src = cdc.Engine.createPagesTable(s"$store/pages", numBuckets = 32)
    cdc.MergeApply(spark, src, cdc.EventGen.events(spark, cfg).toDF, 0L,
      stepId = "cdc_ingest")

    // the full build propagates the per-row upstream `_lsn` (the exact LWW
    // seed under arbitrary batch splits — see IncrementalSpec scaladoc)
    val tokens = Step("derived/tokens", Seq("pages"), "v1",
      run = (_, in) => in("pages").select(col("url"),
        size(split(col("text"), " ")).cast("long").as("n_tok"), col("_lsn")),
      incremental = Some(IncrementalSpec.one("pages") { (_, feed, _) =>
        feed.select(
          col("_lsn").as("lsn"), col("_op").as("op"), col("url"),
          size(split(col("text"), " ")).cast("long").as("n_tok"))
      }))
    val dag = new StepDag(Seq(Step.external("pages"), tokens), store,
      numBuckets = 32)

    val t0 = System.nanoTime()
    dag.run(spark)
    val fullSec = (System.nanoTime() - t0) / 1e9

    val changes = cdc.EventGen.events(spark,
      cfg.copy(nEvents = nChanges.toLong)).toDF
      .withColumn("lsn", col("lsn") + nEvents)
    cdc.MergeApply(spark, src, changes, 1L, stepId = "cdc_ingest")
    val t1 = System.nanoTime()
    val r = dag.run(spark)
    val incSec = (System.nanoTime() - t1) / 1e9
    require(r.executed == Seq("derived/tokens"), s"unexpected: $r")
    (fullSec, incSec, dag.table("derived/tokens").read(spark).count())
  }

  def main(args: Array[String]): Unit = {
    val nEvents = sys.env.getOrElse("SPARK_GRAFT_INC_EVENTS", "500000").toLong
    val nChanges = sys.env.getOrElse("SPARK_GRAFT_INC_CHANGES", "100").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(32, Runtime.getRuntime.availableProcessors()).toString)
    val localDir =
      if (new java.io.File("/dev/shm").isDirectory) "/dev/shm/spark-local"
      else sys.props("java.io.tmpdir")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.local.dir", localDir)
      .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val storeRoot =
      if (new java.io.File("/dev/shm").isDirectory) "/dev/shm" else "/tmp"
    val store = java.nio.file.Files
      .createTempDirectory(java.nio.file.Paths.get(storeRoot), "incbench").toString
    try {
      val (fullSec, incSec, rows) = measure(spark, store, nEvents, nChanges)
      println(s"""{"metric":"incremental_recompute","base_events":$nEvents,"change_events":$nChanges,"derived_rows":$rows,"full_build_sec":${f"$fullSec%.3f"},"incremental_sec":${f"$incSec%.3f"},"speedup":${f"${fullSec / incSec}%.1f"}}""")
    } finally {
      val p = new org.apache.hadoop.fs.Path(store)
      p.getFileSystem(new org.apache.hadoop.conf.Configuration()).delete(p, true)
      spark.stop()
    }
  }
}
