package graft

import graft.cdc.{Engine, MergeApply}
import org.apache.spark.sql.SparkSession

/** Scratch A/B for the copy-on-write replay (not part of the driver
  * contract): replays the cached WAL segments in CoW mode under two join
  * strategies, alternated so each pair shares a host window.
  *
  * Usage: DebugCow --wal <walDir> [--rounds N]
  */
object DebugCow {
  def main(args: Array[String]): Unit = {
    val argMap = args.sliding(2, 2).collect {
      case Array(k, v) if k.startsWith("--") => k.drop(2) -> v
    }.toMap
    val wal = argMap.getOrElse("wal", sys.error("DebugCow requires --wal"))
    val rounds = argMap.get("rounds").map(_.toInt).getOrElse(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.local.dir", BenchEnv.sparkLocalDir(2000000L))
      .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val segs = new java.io.File(wal).listFiles()
      .filter(_.getName.startsWith("segment-")).map(_.toString).sorted.toSeq
    val scratch = BenchEnv.benchRoot(2000000L) + "/debug-cow"
    def replay(strategy: String): Double = {
      System.setProperty("graft.cow.join", strategy)
      val dir = java.nio.file.Files
        .createTempDirectory(java.nio.file.Paths.get(scratch), "cow")
        .toString + "/pages"
      val t = Engine.createPagesTable(dir, numBuckets = 32)
      val t0 = System.nanoTime()
      Engine.replaySegments(spark, segs, t, mode = MergeApply.CopyOnWrite)
      val s = (System.nanoTime() - t0) / 1e9
      val p = new org.apache.hadoop.fs.Path(new java.io.File(dir).getParent)
      p.getFileSystem(new org.apache.hadoop.conf.Configuration()).delete(p, true)
      s
    }
    new java.io.File(scratch).mkdirs()
    replay("merge") // warm-up (JIT + codegen), not recorded
    for (r <- 1 to rounds; s <- Seq("merge", "shuffle_hash")) {
      val sec = replay(s)
      println(f"[cow $r] $s: $sec%.3f s")
    }
    spark.stop()
  }
}
