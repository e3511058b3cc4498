package graft

import graft.cdc.{Engine, EventGen, MergeApply}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Skew evidence (north_star: hot popular-domain keys): merge-apply
  * throughput on a UNIFORM batch vs a FLOOD batch where 50% of all events
  * hit ONE url — the pathological hot key. The broadcast dedup shape bounds
  * hot keys structurally (hash-agg partial aggregation collapses the flood
  * to ≤1 slim row per input partition before any shuffle), so flood
  * throughput should be ≈ flat vs uniform; the auto-salt memo additionally
  * engages the two-stage reduction for subsequent batches. Prints one JSON
  * line with both timings + the engaged-salt flag. */
object SkewBench {
  def main(args: Array[String]): Unit = {
    val nEvents = sys.env.getOrElse("SPARK_GRAFT_CDC_EVENTS", "1000000").toLong
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

    val benchRoot = if (new java.io.File("/dev/shm").isDirectory) "/dev/shm" else "/tmp"
    val store = java.nio.file.Files
      .createTempDirectory(java.nio.file.Paths.get(benchRoot), "skewbench").toString
    try {
      val cfg = EventGen.Config(nEvents = nEvents, nUrls = nEvents / 20,
        nDomains = 200, seed = 42, skew = 2.0, parallelism = 32)
      // materialize both batches as parquet (the WAL shape) outside the
      // timings — 2x3 GB of cached rows would evict under the bench heap
      val gen = EventGen.events(spark, cfg).toDF
      gen.write.mode("overwrite").parquet(s"$store/uniform-wal")
      gen.withColumn("url",
          when(pmod(col("lsn"), lit(2)) === 0, lit("https://hot.example/flood"))
            .otherwise(col("url")))
        .write.mode("overwrite").parquet(s"$store/flood-wal")
      val uniform = spark.read.parquet(s"$store/uniform-wal")
      val flood = spark.read.parquet(s"$store/flood-wal")

      def run(name: String, df: org.apache.spark.sql.DataFrame, warm: Boolean): Double = {
        val t = Engine.createPagesTable(s"$store/$name", numBuckets = 32)
        if (warm) { // JIT warm-up table, not timed
          val w = Engine.createPagesTable(s"$store/warm-$name", 32)
          MergeApply(spark, w, df, 0L)
        }
        val t0 = System.nanoTime()
        MergeApply(spark, t, df, 0L)
        (System.nanoTime() - t0) / 1e9
      }
      val uniformSec = run("uniform", uniform, warm = true)
      val floodSec = run("flood", flood, warm = false)
      val floodDir = s"$store/flood"
      // the flood batch's observed duplication engages auto-salt for the
      // table's NEXT batch
      val engaged = MergeApply.saltAutoEngaged(floodDir)
      val flood2Sec = { // second flood batch: runs the salted plan
        val t = new graft.lake.LakeTable(floodDir)
        val b2 = flood.withColumn("lsn", col("lsn") + nEvents)
        val t0 = System.nanoTime()
        MergeApply(spark, t, b2, 1L)
        (System.nanoTime() - t0) / 1e9
      }
      println(
        s"""{"metric":"skew_flood","events":$nEvents,"uniform_sec":${f"$uniformSec%.3f"},""" +
        s""""flood_sec":${f"$floodSec%.3f"},"flood_salted_sec":${f"$flood2Sec%.3f"},""" +
        s""""auto_salt_engaged":$engaged,"flood_over_uniform":${f"${floodSec / uniformSec}%.3f"}}""")
    } finally {
      val p = new org.apache.hadoop.fs.Path(store)
      p.getFileSystem(new org.apache.hadoop.conf.Configuration()).delete(p, true)
      spark.stop()
    }
  }
}
