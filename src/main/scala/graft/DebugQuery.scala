package graft

import org.apache.spark.sql.SparkSession

/** Time one registered query in isolation (profiling tool):
  * tools/run_main.sh graft.DebugQuery <name> [sfDir] [runs] [--explain]. */
object DebugQuery {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val runs = args.lift(2).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.local.dir",
        if (new java.io.File("/dev/shm").isDirectory) "/dev/shm/spark-local"
        else sys.props("java.io.tmpdir"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries(name)
    if (args.contains("--explain")) fn(spark, dir).explain("formatted")
    // job/stage/task counts per run — the cheap empirical check that a
    // plan-level change (e.g. an exchange-reuse point) actually reduced
    // the executed stage count, which explain() alone cannot show under AQE
    val jobs = new java.util.concurrent.atomic.AtomicInteger()
    val stages = new java.util.concurrent.atomic.AtomicInteger()
    val tasks = new java.util.concurrent.atomic.AtomicInteger()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobs.incrementAndGet()
        override def onStageCompleted(
            s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          stages.incrementAndGet()
          tasks.addAndGet(s.stageInfo.numTasks)
        }
      })
    for (i <- 1 to runs) {
      jobs.set(0); stages.set(0); tasks.set(0)
      val t0 = System.nanoTime()
      fn(spark, dir).write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(200) // listener drain
      System.err.println(f"[debug-query] $name run $i: $sec%.3f s " +
        f"(jobs=${jobs.get()} stages=${stages.get()} tasks=${tasks.get()})")
    }
    spark.stop()
  }
}
