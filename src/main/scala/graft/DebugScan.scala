package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch scaling probe: which stage scales with cores? (not part of the
  * driver contract)
  *
  * Usage: DebugScan --wal <walDir> [--out <scratchDir>]
  * (paths are required args, not hardcoded cache keys — a stale hardcoded
  * key silently measures nothing after a cache-key change) */
object DebugScan {
  def main(args: Array[String]): Unit = {
    val argMap = args.sliding(2, 2).collect {
      case Array(k, v) if k.startsWith("--") => k.drop(2) -> v
    }.toMap
    val wal = argMap.getOrElse("wal",
      sys.error("DebugScan requires --wal <walDir> (a WAL written by Bench/EventGen)"))
    val out = argMap.getOrElse("out",
      sys.props("java.io.tmpdir") + "/graft-debugscan")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.local.dir", BenchEnv.sparkLocalDir(1000000L))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): Unit = {
      // twice: second is warm
      f
      val t0 = System.nanoTime(); f
      println(f"[scan $cpus] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    val df = spark.read.schema(cdc.Engine.eventSchema)
      .option("recursiveFileLookup", "true").parquet(wal)
    time("scan+decode html bytes") {
      df.agg(sum(length(col("html")))).collect()
    }
    time("scan+extractText") {
      df.select(functions.TextExtract.extract_text(col("html")).as("t"))
        .agg(sum(length(col("t")))).collect()
    }
    time("dedup agg slim") {
      df.groupBy("url").agg(max("lsn")).agg(count(lit(1))).collect()
    }
    time("full dedup semi join + noop write") {
      val maxL = df.groupBy(col("url")).agg(max(col("lsn")).as("lsn"))
      df.join(maxL.hint("shuffle_hash"), Seq("url", "lsn"), "left_semi")
        .write.format("noop").mode("overwrite").save()
    }
    time("parquet rewrite (flat)") {
      df.write.mode("overwrite").parquet(s"$out/scan-rewrite")
    }
    time("pure payload repartition + noop") {
      df.repartition(pmod(xxhash64(col("url")), lit(32)))
        .write.format("noop").mode("overwrite").save()
    }
    time("broadcast semi + noop") {
      val maxL = df.groupBy(col("url")).agg(max(col("lsn")).as("lsn"))
      df.join(broadcast(maxL), Seq("url", "lsn"), "left_semi")
        .write.format("noop").mode("overwrite").save()
    }
    time("broadcast semi + repart + parquet") {
      val maxL = df.groupBy(col("url")).agg(max(col("lsn")).as("lsn"))
      df.join(broadcast(maxL), Seq("url", "lsn"), "left_semi")
        .withColumn("_bucket", pmod(xxhash64(col("url")), lit(32)).cast("int"))
        .repartition(col("_bucket")).sortWithinPartitions("url")
        .write.partitionBy("_bucket").mode("overwrite")
        .parquet(s"$out/scan-rewrite2")
    }
    spark.stop()
  }
}
