package graft

import graft.cdc._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for the merge-apply stages (not part of the driver
  * contract). */
object DebugMerge {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[debug] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }

    val n = 125000L
    val cfg = EventGen.Config(nEvents = n, nUrls = 50000, nDomains = 200,
      seed = 42, parallelism = cpus.toInt)
    val dir = java.nio.file.Files.createTempDirectory("dbg").toString

    time("gen+write wal") {
      EventGen.events(spark, cfg).write.parquet(s"$dir/wal")
    }
    val batch = spark.read.schema(Engine.eventSchema).parquet(s"$dir/wal")
    time("read count") { batch.count() }
    time("gen only (noop write)") {
      EventGen.events(spark, cfg).write.format("noop").mode("overwrite").save()
    }
    val payload = struct(col("lsn"), col("op"), col("warc_ts"), col("html"),
      col("text"), col("lang"))
    val dedup = batch.groupBy(col("url")).agg(max_by(payload, col("lsn")).as("e"))
    println("=== max_by plan ===")
    println(dedup.queryExecution.executedPlan.toString.take(1200))
    time("dedup noop") { dedup.write.format("noop").mode("overwrite").save() }
    val maxLsn = batch.groupBy(col("url")).agg(max(col("lsn")).as("lsn"))
    val dedupJoin = batch.join(maxLsn, Seq("url", "lsn"), "left_semi")
    println("=== join-dedup plan ===")
    println(dedupJoin.queryExecution.executedPlan.toString.take(1200))
    time("dedup-join noop") { dedupJoin.write.format("noop").mode("overwrite").save() }
    time("dedup-join noop x2") { dedupJoin.write.format("noop").mode("overwrite").save() }
    time("dedup noop x2") { dedup.write.format("noop").mode("overwrite").save() }
    time("dedup+write parquet flat") {
      dedup.select(col("url"), col("e.*")).write.parquet(s"$dir/flat")
    }
    val withBucket = dedup.select(col("url"), col("e.*"))
      .withColumn("_bucket", pmod(xxhash64(col("url")), lit(32)).cast("int"))
    time("dedup+write partitionBy no-repart") {
      withBucket.sortWithinPartitions("_bucket", "url")
        .write.partitionBy("_bucket").parquet(s"$dir/pb1")
    }
    time("dedup+write partitionBy repart") {
      withBucket.repartition(col("_bucket"))
        .sortWithinPartitions("url")
        .write.partitionBy("_bucket").parquet(s"$dir/pb2")
    }
    // replicate MOR pipeline pieces
    locally {
      import org.apache.spark.sql.Observation
      val obs1 = Observation("o1")
      val obs2 = Observation("o2")
      val observed = batch.observe(obs1, min(col("lsn")).as("a"),
        max(col("lsn")).as("b"), count(lit(1)).as("c"))
      val dd = observed.groupBy(col("url")).agg(max_by(payload, col("lsn")).as("e"))
        .select(col("url"), col("e.*"))
        .withColumn("_deleted", col("op") === "D")
        .withColumn("_bucket", pmod(xxhash64(col("url")), lit(32)).cast("int"))
        .observe(obs2, count(lit(1)).as("rows"))
      time("MOR-shaped write with observes") {
        dd.repartition(col("_bucket")).sortWithinPartitions("url")
          .write.partitionBy("_bucket").parquet(s"$dir/pb3")
      }
      time("obs.get") { (obs1.get, obs2.get) }
    }
    val t = time("create table") {
      Engine.createPagesTable(s"$dir/pages", 32)
    }
    time("merge MOR batch0") {
      MergeApply(spark, t, batch, 0L, mode = MergeApply.MergeOnRead)
    }
    time("merge MOR batch1 (dup events)") {
      MergeApply(spark, t, batch.withColumn("lsn", col("lsn") + n), 1L,
        mode = MergeApply.MergeOnRead)
    }
    time("compact") { MergeApply.compact(spark, t) }
    time("read reconciled") { t.read(spark).write.format("noop").mode("overwrite").save() }
    spark.stop()
  }
}
