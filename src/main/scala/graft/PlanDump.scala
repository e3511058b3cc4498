package graft

import org.apache.spark.sql.SparkSession

/** Dump `explain("formatted")` for every declared query to one file each —
  * the per-round plan evidence (plans/r<NN>/<query>_<tag>.txt). Unlike
  * [[ExplainAudit]] (stdout, fixed subset), this writes the whole registry
  * so before/after plan diffs can be committed per optimization round.
  *
  * Usage: tools/run_main.sh graft.PlanDump <sfDir> <outDir> <tag> [q1,q2,...]
  * Note: q_cdc_merge / q_change_feed execute their merge batches while the
  * DataFrame is being built; their dumped plan is the final read/feed plan.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val outDir = args.lift(1).getOrElse("plans/tmp")
    val tag = args.lift(2).getOrElse("before")
    val only: Option[Set[String]] = args.lift(3).map(_.split(",").toSet)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter(q => only.forall(_.contains(q._1)))
      .foreach { case (name, fn) =>
        try {
          val df = fn(spark, dir)
          val plan = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          java.nio.file.Files.writeString(
            java.nio.file.Paths.get(s"$outDir/${name}_$tag.txt"), plan)
          System.err.println(s"[plandump] $name -> $outDir/${name}_$tag.txt")
        } catch {
          case e: Throwable =>
            System.err.println(s"[plandump] $name FAILED: ${e.getMessage}")
        }
      }
    spark.stop()
  }
}
