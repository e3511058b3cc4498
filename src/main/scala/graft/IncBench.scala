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

  /** Multi-upstream (fact ⋈ fact) incremental evidence: a derived step over
    * TWO CDC tables (each `nEvents/2`), maintained incrementally when only
    * ONE side moves — the shape a real pipeline hits first. Returns
    * (full-build sec, incremental sec for a one-sided `nChanges` change). */
  def measureMulti(spark: SparkSession, store: String,
      nEvents: Long, nChanges: Int): (Double, Double) = {
    val half = nEvents / 2
    def mkSrc(name: String, seed: Long) = {
      val cfg = cdc.EventGen.Config(
        nEvents = half, nUrls = math.max(1000L, half / 10),
        nDomains = 200, seed = seed, skew = 2.0, parallelism = 32)
      val src = cdc.Engine.createPagesTable(s"$store/$name", numBuckets = 32)
      cdc.MergeApply(spark, src, cdc.EventGen.events(spark, cfg).toDF, 0L,
        stepId = "cdc_ingest")
      (src, cfg)
    }
    val (a, cfgA) = mkSrc("pages_a", 7)
    val (b, _) = mkSrc("pages_b", 11)
    def tok(side: String)(df: org.apache.spark.sql.DataFrame) = df.select(
      concat(lit(side), lit(":"), col("url")).as("url"),
      size(split(col("text"), " ")).cast("long").as("n_tok"), col("_lsn"))
    def tokFeed(side: String)(feed: org.apache.spark.sql.DataFrame) = feed.select(
      col("_lsn").as("lsn"), col("_op").as("op"),
      concat(lit(side), lit(":"), col("url")).as("url"),
      size(split(col("text"), " ")).cast("long").as("n_tok"))
    val union = Step("derived/all_tokens", Seq("pages_a", "pages_b"), "v1",
      run = (_, in) => tok("a")(in("pages_a")).unionByName(tok("b")(in("pages_b"))),
      incremental = Some(IncrementalSpec(Seq("pages_a", "pages_b"),
        (_, feeds, _) => tokFeed("a")(feeds("pages_a"))
          .unionByName(tokFeed("b")(feeds("pages_b"))))))
    val dag = new StepDag(Seq(Step.external("pages_a"),
      Step.external("pages_b"), union), store, numBuckets = 32)
    val t0 = System.nanoTime()
    dag.run(spark)
    val fullSec = (System.nanoTime() - t0) / 1e9
    // only side A moves: B's feed is empty, A's is O(changes)
    val changes = cdc.EventGen.events(spark,
      cfgA.copy(nEvents = nChanges.toLong)).toDF
      .withColumn("lsn", col("lsn") + half)
    cdc.MergeApply(spark, a, changes, 1L, stepId = "cdc_ingest")
    val t1 = System.nanoTime()
    val r = dag.run(spark)
    val incSec = (System.nanoTime() - t1) / 1e9
    require(r.executed == Seq("derived/all_tokens"), s"unexpected: $r")
    (fullSec, incSec)
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
