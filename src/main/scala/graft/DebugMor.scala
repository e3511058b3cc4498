package graft

import graft.cdc.{Engine, MergeApply}
import org.apache.spark.sql.SparkSession

/** Scratch A/B for the merge-on-read replay under SparkContext-level conf
  * (not part of the driver contract): replays the cached WAL segments in
  * MOR mode, recreating the session per round so context-fixed knobs
  * (shuffle/io codec) can alternate inside one host window.
  *
  * Usage: DebugMor --wal <walDir> [--rounds N] [--key spark.io.compression.codec]
  *        [--vals lz4,zstd]
  */
object DebugMor {
  def main(args: Array[String]): Unit = {
    val argMap = args.sliding(2, 2).collect {
      case Array(k, v) if k.startsWith("--") => k.drop(2) -> v
    }.toMap
    val wal = argMap.getOrElse("wal", sys.error("DebugMor requires --wal"))
    val rounds = argMap.get("rounds").map(_.toInt).getOrElse(2)
    val key = argMap.getOrElse("key", "spark.io.compression.codec")
    val vals = argMap.getOrElse("vals", "lz4,zstd").split(",").toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")

    def newSession(v: String): SparkSession = {
      val s = SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.local.dir", BenchEnv.sparkLocalDir(2000000L))
        .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
        .config("spark.sql.parquet.compression.codec", MergeApply.lakeCodec)
        .config("spark.hadoop.parquet.compression.codec.zstd.level",
          sys.env.getOrElse("SPARK_GRAFT_ZSTD_LEVEL", "3"))
        .config("spark.ui.enabled", "false")
        .config(key, v)
        .getOrCreate()
      s.sparkContext.setLogLevel("WARN")
      s
    }

    val segs = new java.io.File(wal).listFiles()
      .filter(_.getName.startsWith("segment-")).map(_.toString).sorted.toSeq
    val scratch = BenchEnv.benchRoot(2000000L) + "/debug-mor"
    new java.io.File(scratch).mkdirs()

    def replay(spark: SparkSession): Double = {
      val dir = java.nio.file.Files
        .createTempDirectory(java.nio.file.Paths.get(scratch), "mor")
        .toString + "/pages"
      val t = Engine.createPagesTable(dir, numBuckets = 32)
      val t0 = System.nanoTime()
      Engine.replaySegments(spark, segs, t, mode = MergeApply.MergeOnRead)
      MergeApply.compact(spark, t)
      val s = (System.nanoTime() - t0) / 1e9
      val p = new org.apache.hadoop.fs.Path(new java.io.File(dir).getParent)
      p.getFileSystem(new org.apache.hadoop.conf.Configuration()).delete(p, true)
      s
    }

    // warm-up round (JIT + codegen), not recorded
    locally {
      val s = newSession(vals.head); replay(s); s.stop()
    }
    for (r <- 1 to rounds; v <- vals) {
      val s = newSession(v)
      val sec = replay(s)
      s.stop()
      println(f"[mor $r] $key=$v: $sec%.3f s")
    }
  }
}
