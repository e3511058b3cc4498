package graft

/** Shared bench-harness plumbing: working-dir selection, WAL cache hygiene,
  * and crash-proof partial-result output.
  *
  * Motivation (round-4 postmortem): the driver's bench run was SIGKILLed and
  * left NO artifact because (a) the JSON printed only at the very end, (b)
  * 36 GiB of orphaned WAL caches had accumulated on /dev/shm (tmpfs = RAM,
  * so the debris directly starved the next process), and (c) Bench and
  * ScalingBench used different cache-key schemes so old caches were never
  * reused OR deleted. This object fixes all three: one key scheme, a startup
  * vacuum that keeps only the current key, a free-space check that falls
  * back to java.io.tmpdir when tmpfs is tight, and a section-by-section
  * partial JSON file so a kill at any point leaves every already-measured
  * number parseable.
  */
object BenchEnv {

  /** Unified WAL cache key — BOTH Bench and ScalingBench use this, so a
    * scaling session reuses the bench WAL at the same config and vice
    * versa, and the vacuum can recognize every cache this code writes. */
  def walKey(nEvents: Long, nBatches: Int, minWords: Int, maxWords: Int): String =
    s"graft-bench-wal-$nEvents-$nBatches-w$minWords-$maxWords-p64"

  /** Rough bytes of HEADROOM a bench run needs beyond what already exists:
    * per-run table copies + shuffle blocks ≈ 2× the WAL's ~1.3 KB/event
    * (the WAL itself is cached and already counted in used space — a 4×
    * multiplier here once pushed a 16M-event run to silent disk fallback
    * while 75 GB of tmpfs sat free, collapsing merge rates 4×). */
  def workingSetBytes(nEvents: Long): Long = nEvents * 1300L * 2

  /** Bench root: tmpfs when it exists AND has headroom for the working set
    * (a real cluster does IO on per-executor NVMe; tmpfs locally removes the
    * single-disk bottleneck the same way) — otherwise java.io.tmpdir. Never
    * pick a RAM disk the job would then OOM-kill the host through. */
  def benchRoot(nEvents: Long): String =
    sys.env.get("SPARK_GRAFT_BENCH_DIR").getOrElse {
      val shm = new java.io.File("/dev/shm")
      if (shm.isDirectory && shm.getUsableSpace > workingSetBytes(nEvents))
        "/dev/shm/graft-bench"
      else sys.props("java.io.tmpdir") + "/graft-bench"
    }

  /** spark.local.dir (shuffle blocks): same policy, smaller footprint.
    * Before choosing, purge shuffle debris that SIGKILLed sessions leave
    * behind (a killed run cleans nothing; 30 GB of orphaned blockmgr dirs
    * on tmpfs is RAM stolen from the next run — measured round 5). */
  def sparkLocalDir(nEvents: Long): String = {
    val shm = new java.io.File("/dev/shm")
    vacuumLocalDir("/dev/shm/spark-local")
    vacuumLocalDir(sys.props("java.io.tmpdir") + "/spark-local")
    if (shm.isDirectory && shm.getUsableSpace > workingSetBytes(nEvents))
      "/dev/shm/spark-local"
    else sys.props("java.io.tmpdir") + "/spark-local"
  }

  /** Delete blockmgr-* / spark-* subdirs older than 2 h — crashed sessions'
    * shuffle blocks. A live session's dirs are younger (our runs are <1 h);
    * Spark recreates anything it needs. */
  private def vacuumLocalDir(root: String): Unit = {
    val dir = new java.io.File(root)
    if (!dir.isDirectory) return
    val cutoff = System.currentTimeMillis() - 2L * 60 * 60 * 1000
    Option(dir.listFiles()).getOrElse(Array.empty).foreach { f =>
      val n = f.getName
      if ((n.startsWith("blockmgr-") || n.startsWith("spark-")) &&
          f.lastModified() < cutoff) {
        System.err.println(s"[bench] vacuuming orphaned shuffle dir ${f.getAbsolutePath}")
        val p = new org.apache.hadoop.fs.Path(f.getAbsolutePath)
        p.getFileSystem(new org.apache.hadoop.conf.Configuration()).delete(p, true)
      }
    }
  }

  /** Delete every cache/scratch dir under `root` that is not the WAL cache
    * for the CURRENT config: old-key WAL caches (including the legacy
    * `wal-` scheme ScalingBench used through round 4) and any warm-, mor-,
    * cow-, incb-, incm-prefixed temp dirs a crashed previous run left
    * behind. tmpfs debris is RAM taken from the next process. */
  def vacuum(root: String, keepWalKey: String): Unit = {
    val dir = new java.io.File(root)
    if (!dir.isDirectory) return
    // age-bounded: scratch dirs (per-run tables) die after 1 h — a
    // concurrent bench's ACTIVE mor/warm dir must survive another process's
    // startup vacuum; other-config WAL caches die after 3 h — a session
    // alternating configs (bench at 2M, scaling at 16M) keeps both caches
    // warm, while dead configs can never accumulate across days again
    // (round-4 postmortem: 36 GiB of orphaned caches on tmpfs). The current
    // key is always kept.
    val scratchAgeMs = 60L * 60 * 1000
    val walAgeMs = 3L * 60 * 60 * 1000
    val now = System.currentTimeMillis()
    val stale = Option(dir.listFiles()).getOrElse(Array.empty).filter { f =>
      val n = f.getName
      val isWal = n.startsWith("graft-bench-wal-") || n.startsWith("wal-")
      val isScratch =
        n.startsWith("warm") || n.startsWith("mor") || n.startsWith("cow") ||
        n.startsWith("incb") || n.startsWith("incm") || n.startsWith("scalewarm")
      (isWal && n != keepWalKey && now - f.lastModified() > walAgeMs) ||
        (isScratch && now - f.lastModified() > scratchAgeMs)
    }
    stale.foreach { f =>
      System.err.println(s"[bench] vacuuming stale cache ${f.getAbsolutePath}")
      val p = new org.apache.hadoop.fs.Path(f.getAbsolutePath)
      p.getFileSystem(new org.apache.hadoop.conf.Configuration()).delete(p, true)
    }
  }

  /** Crash-proof incremental JSON: `put` sections as they complete; every
    * `flush` atomically rewrites the partial file, so a SIGKILL at any point
    * leaves the latest complete sections on disk. `render` returns the same
    * JSON for the final stdout line — one source of truth. */
  final class Partial(path: String) {
    private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root: com.fasterxml.jackson.databind.node.ObjectNode =
      mapper.createObjectNode()

    def flush(): Unit = {
      val tmp = java.nio.file.Paths.get(path + ".tmp")
      java.nio.file.Files.write(tmp,
        (mapper.writeValueAsString(root) + "\n")
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      java.nio.file.Files.move(tmp, java.nio.file.Paths.get(path),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    }

    def render: String = mapper.writeValueAsString(root)
  }
}
