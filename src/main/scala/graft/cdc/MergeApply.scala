package graft.cdc

import graft.lake._
import org.apache.spark.sql.{DataFrame, Observation, SparkSession}
import org.apache.spark.sql.functions._

/** The merge-apply stage (north_rule core): apply one micro-batch of change
  * events to a lake table with last-writer-wins per key, exactly-once.
  *
  * Semantics reproduced from the reference:
  *  - LWW per key per batch = the reference's "last full rebuild wins" per
  *    variable (/root/reference/etl/steps/__init__.py:999-1129) expressed as
  *    a max-by-LSN reduction;
  *  - exactly-once = checksum-gated idempotent upsert
  *    (/root/reference/etl/grapher/to_db.py:209-220) expressed as
  *    batchId-in-manifest dedup — a replayed batch is a committed no-op;
  *  - delete events = ghost cleanup (to_db.py:416) expressed as merge-time
  *    row drops guarded by `source.lsn > target._lsn`;
  *  - late events (lower LSN than the applied row) are discarded by the same
  *    guard — the reference's full-recompute subsumption, made incremental.
  *
  * Scale design (local[32] here, 1000 executors in production):
  *  - **dedup is `groupBy(key).agg(max_by(...))`, not a window**: declarative
  *    aggregation gets map-side partial aggregation, so a hot url collapses
  *    to ≤1 row per input partition before the shuffle — bounded skew by
  *    construction. An explicit two-stage salted variant is available for
  *    pathological cases (`saltBuckets` > 0) per the north_star's "salted
  *    repartitioning before the merge-apply stage".
  *  - **copy-on-write touches only hot buckets**: the join reads only target
  *    files whose bucket appears in the batch (manifest file pruning);
  *    untouched files carry forward into the new snapshot without IO.
  *  - **stats ride the write** via `Observation` — no second pass.
  */
object MergeApply {

  final case class MergeStats(
      batchId: Long,
      snapshotId: Long,
      skipped: Boolean,
      inserted: Long,
      updated: Long,
      deleted: Long,
      keptLate: Long
  )

  /** Apply `batch` (schema: lsn long, op string, <key>, value columns of the
    * table's current schema) to `table`. Returns stats; a batchId already in
    * the snapshot log is skipped (exactly-once).
    */
  def apply(
      spark: SparkSession,
      table: LakeTable,
      batch: DataFrame,
      batchId: Long,
      stepId: String = "merge-apply",
      saltBuckets: Int = 0
  ): MergeStats = {
    val meta = table.metadata
    if (meta.committedBatchIds.contains(batchId))
      return MergeStats(batchId, meta.currentSnapshotId.getOrElse(-1L),
        skipped = true, 0, 0, 0, 0)

    val key = meta.bucketColumn
    val cur = meta.currentSchema
    val valueCols: Seq[String] =
      cur.fields.map(_.name).filterNot(n => n == key || n == "_lsn")
    val b = meta.numBuckets

    // ---- source-side LWW dedup (skew-safe by partial aggregation) --------
    val obsSrc = Observation(s"src-$batchId")
    val observedBatch = batch.observe(
      obsSrc,
      min(col("lsn")).as("lsnMin"),
      max(col("lsn")).as("lsnMax"),
      count(lit(1)).as("events"))

    val payload = struct((col("lsn") +: col("op") +: valueCols.map(col)): _*)
    val deduped =
      if (saltBuckets > 1) {
        // explicit two-stage salted reduction: spread a pathological hot key
        // over `saltBuckets` reducers first, then reduce the survivors
        observedBatch
          .groupBy(col(key), pmod(xxhash64(col("lsn")), lit(saltBuckets)).as("__salt"))
          .agg(max_by(payload, col("lsn")).as("__e"))
          .groupBy(col(key))
          .agg(max_by(col("__e"), col("__e.lsn")).as("__e"))
      } else {
        observedBatch.groupBy(col(key)).agg(max_by(payload, col("lsn")).as("__e"))
      }
    val srcCols = Seq(
      col(key),
      col("__e.lsn").as("__s_lsn"),
      col("__e.op").as("__s_op")
    ) ++ valueCols.map(c => col(s"__e.$c").as(s"__s_$c"))
    val source = deduped.select(srcCols: _*)

    // ---- touched-bucket pruning ------------------------------------------
    val touched: Set[Int] = source
      .select(pmod(xxhash64(col(key)), lit(b)).cast("int").as("bkt"))
      .distinct()
      .collect()
      .map(_.getInt(0))
      .toSet

    val target = table.read(spark, Some(touched))

    // ---- merge: full outer join + action classification ------------------
    val joined = target.join(source, Seq(key), "full_outer")
    val srcWins = col("__s_lsn").isNotNull &&
      (col("_lsn").isNull || col("__s_lsn") > col("_lsn"))
    val action = when(!srcWins || col("__s_lsn").isNull,
        when(col("_lsn").isNotNull && col("__s_lsn").isNotNull, lit("late"))
          .otherwise(lit("keep")))
      .when(col("__s_op") === "D",
        when(col("_lsn").isNotNull, lit("delete")).otherwise(lit("noop")))
      .when(col("_lsn").isNotNull, lit("update"))
      .otherwise(lit("insert"))

    val obsMerge = Observation(s"merge-$batchId")
    val classified = joined
      .withColumn("_action", action)
      .observe(
        obsMerge,
        sum(when(col("_action") === "insert", 1).otherwise(0)).as("inserted"),
        sum(when(col("_action") === "update", 1).otherwise(0)).as("updated"),
        sum(when(col("_action") === "delete", 1).otherwise(0)).as("deleted"),
        sum(when(col("_action") === "late", 1).otherwise(0)).as("late"))

    val fromSource = col("_action").isin("insert", "update")
    val outCols = Seq(col(key)) ++
      valueCols.map(c =>
        when(fromSource, col(s"__s_$c")).otherwise(col(c)).as(c)) ++
      Seq(
        when(fromSource, col("__s_lsn")).otherwise(col("_lsn")).as("_lsn"),
        pmod(xxhash64(col(key)), lit(b)).cast("int").as("_bucket"))

    val result = classified
      .filter(col("_action").isin("keep", "late", "insert", "update"))
      .select(outCols: _*)

    // ---- copy-on-write: rewrite only touched buckets ----------------------
    val snapId = meta.currentSnapshotId.getOrElse(0L) + 1
    val snapDirRel = s"data/snap-$snapId"
    result
      .repartition(col("_bucket"))
      .sortWithinPartitions(col(key))
      .write
      .partitionBy("_bucket")
      .parquet(table.absolute(snapDirRel))

    val newFiles = table.listDataFiles(snapDirRel, cur.schemaVersion, spark)
    val carried = meta.currentSnapshot
      .map(_.files.filterNot(f => touched.contains(f.bucket)))
      .getOrElse(Nil)

    val srcRow = obsSrc.get
    val mergeRow = obsMerge.get
    def g(m: Map[String, Any], k: String): Long = m.get(k) match {
      case Some(null)       => 0L
      case Some(l: Long)    => l
      case Some(i: Int)     => i.toLong
      case _                => 0L
    }
    val snap = Snapshot(
      snapshotId = snapId,
      parentId = meta.currentSnapshotId,
      stepId = stepId,
      batchId = batchId,
      lsnMin = g(srcRow, "lsnMin"),
      lsnMax = g(srcRow, "lsnMax"),
      rowsInserted = g(mergeRow, "inserted"),
      rowsUpdated = g(mergeRow, "updated"),
      rowsDeleted = g(mergeRow, "deleted"),
      schemaVersion = cur.schemaVersion,
      files = carried ++ newFiles)

    table.commit(meta.copy(
      version = meta.version + 1,
      currentSnapshotId = Some(snapId),
      snapshots = meta.snapshots :+ snap))

    MergeStats(batchId, snapId, skipped = false,
      snap.rowsInserted, snap.rowsUpdated, snap.rowsDeleted, g(mergeRow, "late"))
  }
}
