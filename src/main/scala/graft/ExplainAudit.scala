package graft

import org.apache.spark.sql.SparkSession

/** Plan audit: dumps `explain(formatted)` for representative queries so
  * pushdown/pruning/broadcast/codegen properties can be inspected and
  * regressions caught (run: tools/run_main.sh graft.ExplainAudit <sfDir>). */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val picks = Seq("q_scan_filter", "q1_agg", "q_join_agg", "q_semi_join",
      "q_rolling", "q_dedup_exact", "q_ann_topk",
      "q_simhash_pairs", "q_dup_clusters", "q_contamination")
    for (name <- picks) {
      println(s"\n======== $name ========")
      SparkEntry.queries(name)(spark, dir).explain("formatted")
    }

    println("\n======== merge-apply MOR write plan ========")
    // the dedup + delta-write plan (what each micro-batch executes)
    import org.apache.spark.sql.functions._
    val events = cdc.EventGen.events(spark,
      cdc.EventGen.Config(nEvents = 10000, nUrls = 1000, parallelism = 4)).toDF
    val maxL = events.groupBy(col("url")).agg(max(col("lsn")).as("lsn"))
    events.join(maxL.hint("broadcast"), Seq("url", "lsn"), "left_semi")
      .withColumn("_bucket", pmod(xxhash64(col("url")), lit(32)).cast("int"))
      .repartition(col("_bucket"))
      .explain("formatted")

    println("\n======== MOR read reconciliation plan (base >> delta) ========")
    // regression gate: the read of a MOR table must reconcile ONLY delta
    // keys — no aggregate over the whole base table, and the aggregate/
    // broadcast side must derive from the delta scan, not the base scan
    val dir2 = java.nio.file.Files.createTempDirectory("audit-mor").toString + "/pages"
    val t = cdc.Engine.createPagesTable(dir2, 4)
    cdc.MergeApply(spark, t, events.limit(5000), 0L, stepId = "audit")
    cdc.MergeApply.compact(spark, t)
    cdc.MergeApply(spark, t,
      events.limit(50).withColumn("lsn", col("lsn") + 1000000L), 1L, stepId = "audit")
    t.read(spark).explain("formatted")
    spark.stop()
  }
}
