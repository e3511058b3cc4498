package graft

import graft.cdc.{Engine, MergeApply}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The whole CDC engine under the DuckDB correctness gate: the driver's
  * `events` table is interpreted as a change log (event_id = LSN,
  * 'error' = delete, everything else = upsert of that user's page), replayed
  * through the real lake-table merge-apply in two batches, and the final
  * table state is read back. The oracle is the independent SQL reduction
  * (last event per key wins; trailing delete = absent).
  */
object CdcQuery {

  /** ONE static JVM shutdown hook draining a registry of scratch paths —
    * per-invocation hooks would accumulate a Thread in the JVM hook set on
    * every query run (unbounded in a long-lived bench/verify session). */
  private val scratchPaths =
    new java.util.concurrent.ConcurrentLinkedQueue[java.nio.file.Path]()
  private[graft] def registeredScratchCount: Int = scratchPaths.size()
  private lazy val hookInstalled: Boolean = {
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      import java.nio.file.{Files, Path}
      import java.util.Comparator
      var p = scratchPaths.poll()
      while (p != null) {
        if (Files.exists(p))
          Files.walk(p).sorted(Comparator.reverseOrder[Path]())
            .forEach(x => Files.deleteIfExists(x))
        p = scratchPaths.poll()
      }
    }))
    true
  }

  /** tmpfs scratch when present: these queries measure the engine's compute
    * path, not the sandbox's single shared disk. Cleanup at JVM exit (the
    * returned frames are lazy — callers act on them later). */
  private def newScratch(prefix: String): java.nio.file.Path = {
    val scratchRoot =
      if (new java.io.File("/dev/shm").isDirectory) java.nio.file.Paths.get("/dev/shm")
      else java.nio.file.Paths.get(sys.props("java.io.tmpdir"))
    val scratch = java.nio.file.Files.createTempDirectory(scratchRoot, prefix)
    require(hookInstalled)
    scratchPaths.add(scratch)
    scratch
  }

  def toChangeEvents(events: DataFrame): DataFrame =
    events.select(
      col("event_id").as("lsn"),
      when(col("event_type") === "error", "D").otherwise("U").as("op"),
      concat(lit("u"), col("user_id").cast("string")).as("url"),
      col("ts").as("warc_ts"),
      lit(null).cast("binary").as("html"),
      col("props").as("text"),
      col("event_type").as("lang"))

  def qCdcMerge(spark: SparkSession, dir: String): DataFrame = {
    val ce = toChangeEvents(Queries.t(spark, dir, "events"))
    // split by LSN parity — no driver collect/extra scan; the tombstone+LWW
    // merge converges to the same final state under ANY batch split
    // (CdcSpec's arbitrary-split property), so a non-contiguous split is
    // also a stronger exercise of the engine than a contiguous one
    val scratch = newScratch("cdc-query")
    val tableDir = scratch.toString + "/pages"
    val table = Engine.createPagesTable(tableDir, numBuckets = 8)
    MergeApply(spark, table, ce.filter(pmod(col("lsn"), lit(2)) === 0), batchId = 0L)
    MergeApply(spark, table, ce.filter(pmod(col("lsn"), lit(2)) === 1), batchId = 1L)

    table.read(spark)
      .select("url", "warc_ts", "text", "lang", "_lsn")
      .orderBy("url")
  }

  val qCdcMergeSql: String =
    """SELECT 'u' || CAST(user_id AS VARCHAR) AS url, ts AS warc_ts,
      |  props AS text, event_type AS lang, event_id AS _lsn
      |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
      |        ORDER BY event_id DESC) AS rn FROM events)
      |WHERE rn = 1 AND event_type <> 'error'
      |ORDER BY url""".stripMargin

  /** The incremental change feed under the gate: replay the same two
    * parity-split batches, then read EVERY change the table applied via
    * `changesBetween` over the full window. The oracle recomputes each
    * batch's per-key LWW winner independently — the feed must contain
    * exactly those rows (tombstones included). */
  def qChangeFeed(spark: SparkSession, dir: String): DataFrame = {
    val ce = toChangeEvents(Queries.t(spark, dir, "events"))
    val scratch = newScratch("cdc-feed")
    val table = Engine.createPagesTable(scratch.toString + "/pages", numBuckets = 8)
    MergeApply(spark, table, ce.filter(pmod(col("lsn"), lit(2)) === 0), batchId = 0L)
    MergeApply(spark, table, ce.filter(pmod(col("lsn"), lit(2)) === 1), batchId = 1L)
    table.changesBetween(spark, 0L, table.metadata.currentSnapshotId.get)
      .select(col("url"), col("text"), col("lang"),
        col("_lsn"), col("_op"))
      .orderBy("_lsn")
  }

  val qChangeFeedSql: String =
    """WITH ce AS (
      |  SELECT event_id AS lsn,
      |    CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
      |    'u' || CAST(user_id AS VARCHAR) AS url,
      |    props AS text, event_type AS lang, event_id % 2 AS b
      |  FROM events),
      |w AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY url, b
      |        ORDER BY lsn DESC) AS rn FROM ce)
      |SELECT url, text, lang, lsn AS _lsn, op AS _op
      |FROM w WHERE rn = 1 ORDER BY _lsn""".stripMargin

  val all: Map[String, ((SparkSession, String) => DataFrame, String)] = Map(
    "q_cdc_merge" -> ((qCdcMerge _, qCdcMergeSql)),
    "q_change_feed" -> ((qChangeFeed _, qChangeFeedSql))
  )
}
