package graft.lake

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Catalog index over a directory of lake tables — the reference's catalog
  * reindex (/root/reference/etl/reindex.py:32-39, `Dataset.index`
  * datasets.py:426): one row per table with its current snapshot, row
  * deltas, schema version and lineage — assembled purely from the
  * manifests, no data files touched.
  */
object Catalog {

  final case class TableEntry(
      table: String,
      currentSnapshotId: Long,
      snapshots: Int,
      schemaVersion: Int,
      numBuckets: Int,
      files: Int,
      deltaFiles: Int,
      lastBatchId: Long,
      lastLsnMax: Long
  )

  def listTables(storeDir: String): Seq[String] = {
    val root = new Path(storeDir)
    val fs = root.getFileSystem(new Configuration())
    if (!fs.exists(root)) return Nil
    fs.listStatus(root).toSeq
      .filter(_.isDirectory)
      .map(_.getPath)
      .filter(p => fs.exists(new Path(p, "metadata/version-hint.text")))
      .map(_.getName)
      .sorted
  }

  /** Build the index frame (driver-side manifest reads → small DataFrame). */
  def index(spark: SparkSession, storeDir: String): DataFrame = {
    import spark.implicits._
    listTables(storeDir).map { name =>
      val t = new LakeTable(s"$storeDir/$name")
      val m = t.metadata
      val snap = m.currentSnapshot
      val files = snap.map(t.filesOf).getOrElse(Nil)
      TableEntry(
        table = name,
        currentSnapshotId = m.currentSnapshotId.getOrElse(-1L),
        snapshots = m.snapshots.size,
        schemaVersion = m.currentSchemaVersion,
        numBuckets = m.numBuckets,
        files = files.size,
        deltaFiles = files.count(_.kind == "delta"),
        lastBatchId = snap.map(_.batchId).getOrElse(-1L),
        lastLsnMax = snap.map(_.lsnMax).getOrElse(-1L))
    }.toDS.toDF
  }
}
