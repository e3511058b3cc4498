package graft

import graft.cdc.Engine
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-decomposed scaling evidence: which PART of the merge pipeline
  * stops scaling from 8 → 32 cores? Times three nested shapes per level in
  * one JVM (sessions alternate like ScalingBench so each pair shares a host
  * window):
  *
  *   probe    — scan → extractText → length sum (pure per-row compute)
  *   dedup    — scan → slim max-LSN agg → broadcast semi join → winners
  *              extracted → noop sink (ALL merge compute, no write)
  *   write    — dedup + bucket repartition + sorted zstd parquet write
  *              (the full merge data path minus commit bookkeeping)
  *
  * The point: if probe AND dedup scale ≥0.8 while write does not, the
  * non-scaling residue is exactly the single-machine sink (one shared
  * bus/FS absorbing every byte) — the component a real cluster distributes
  * across per-executor NVMe. Prints one JSON line.
  *
  * Usage: ScaleDecomp --wal <walDir>  (env: SPARK_GRAFT_SCALING_LO/HI,
  * SPARK_GRAFT_DECOMP_ROUNDS)
  */
object ScaleDecomp {

  private def newSession(cpus: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.local.dir", BenchEnv.sparkLocalDir(1000000L))
      .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  def main(args: Array[String]): Unit = {
    val argMap = args.sliding(2, 2).collect {
      case Array(k, v) if k.startsWith("--") => k.drop(2) -> v
    }.toMap
    val wal = argMap.getOrElse("wal",
      sys.error("ScaleDecomp requires --wal <walDir>"))
    val lo = sys.env.getOrElse("SPARK_GRAFT_SCALING_LO", "8").toInt
    val hi = sys.env.getOrElse("SPARK_GRAFT_SCALING_HI", "32").toInt
    val rounds = sys.env.getOrElse("SPARK_GRAFT_DECOMP_ROUNDS", "2").toInt
    val out = s"${BenchEnv.benchRoot(1000000L)}/decomp-scratch"

    final case class Sample(cpus: Int, probe: Double, dedup: Double, write: Double)
    val samples = scala.collection.mutable.ArrayBuffer.empty[Sample]

    for (r <- 0 to rounds; cpus <- if (r % 2 == 0) Seq(lo, hi) else Seq(hi, lo)) {
      val spark = newSession(cpus)
      try {
        val df = spark.read.schema(Engine.eventSchema)
          .option("recursiveFileLookup", "true").parquet(wal)
        def time(f: => Unit): Double = {
          val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
        }
        def probe(): Unit = df
          .select(functions.TextExtract.extract_text(col("html")).as("t"))
          .agg(sum(length(col("t")))).collect()
        // the merge-apply compute shape (MergeApply.dedupBatch + winner
        // extraction), terminated in a noop sink; --join picks the semi-join
        // strategy: broadcast (engine default), shuffle_hash, auto (AQE), or
        // hashed (broadcast on xxhash64(url,lsn) — ~8 B/key instead of the
        // full url string, shrinking the driver-built broadcast ~10×;
        // collision-admitted extra rows are harmless on the MOR path because
        // reads reconcile by max-LSN per key)
        val joinHint = argMap.getOrElse("join", "broadcast")
        def winners = {
          if (joinHint == "hashed") {
            val maxH = df.groupBy(col("url")).agg(max(col("lsn")).as("lsn"))
              .select(xxhash64(col("url"), col("lsn")).as("__wh"))
            df.withColumn("__wh", xxhash64(col("url"), col("lsn")))
              .join(broadcast(maxH), Seq("__wh"), "left_semi")
              .drop("__wh")
              .withColumn("text", functions.TextExtract.extract_text(col("html")))
          } else {
            val maxL = df.groupBy(col("url")).agg(max(col("lsn")).as("lsn"))
            val rhs = if (joinHint == "auto") maxL else maxL.hint(joinHint)
            df.join(rhs, Seq("url", "lsn"), "left_semi")
              .withColumn("text", functions.TextExtract.extract_text(col("html")))
          }
        }
        def dedup(): Unit =
          winners.write.format("noop").mode("overwrite").save()
        def write(): Unit = winners
          .withColumn("_bucket", pmod(xxhash64(col("url")), lit(32)).cast("int"))
          .repartition(col("_bucket")).sortWithinPartitions(col("url"))
          .write.mode("overwrite").option("compression", cdc.MergeApply.lakeCodec)
          .partitionBy("_bucket").parquet(out)
        probe(); dedup(); write() // warm (JIT + page cache), not recorded
        val s = Sample(cpus, time(probe()), time(dedup()), time(write()))
        if (r > 0) samples += s
        System.err.println(f"[decomp r$r cpus=$cpus] probe ${s.probe}%.2f s, " +
          f"dedup-noop ${s.dedup}%.2f s, dedup+write ${s.write}%.2f s")
        val p = new org.apache.hadoop.fs.Path(out)
        p.getFileSystem(new org.apache.hadoop.conf.Configuration()).delete(p, true)
      } finally spark.stop()
    }

    def eff(f: Sample => Double): (Double, Double, Double) = {
      val l = samples.filter(_.cpus == lo).map(f).min
      val h = samples.filter(_.cpus == hi).map(f).min
      (l, h, l / h / (hi.toDouble / lo))
    }
    val (pl, ph, pe) = eff(_.probe)
    val (dl, dh, de) = eff(_.dedup)
    val (wl, wh, we) = eff(_.write)
    println(
      f"""{"metric":"scale_decomp","lo_cpus":$lo,"hi_cpus":$hi,""" +
        f""""probe_sec":[$pl%.2f,$ph%.2f],"probe_eff":$pe%.3f,""" +
        f""""dedup_sec":[$dl%.2f,$dh%.2f],"dedup_eff":$de%.3f,""" +
        f""""write_sec":[$wl%.2f,$wh%.2f],"write_eff":$we%.3f}""")
  }
}
