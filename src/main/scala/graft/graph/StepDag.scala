package graft.graph

import graft.lake.LakeTable
import graft.ops.Checksums
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The step DAG (SURVEY.md §7.1 module `graph`) — the reference's compute
  * graph (/root/reference/etl/steps/__init__.py:52 `DAG`, dag/main.yml)
  * re-expressed as a registry of Dataset transforms compiled through
  * Catalyst.
  *
  * Semantics reproduced:
  *  - topological execution (`to_dependency_order`, steps/__init__.py:101);
  *  - content-addressed dirtiness: a step's input checksum hashes its code
  *    version + each upstream output's snapshot id — outputs are pure
  *    functions of inputs (`DataStep.checksum_input`,
  *    steps/__init__.py:565-587); a step re-runs only when that checksum
  *    differs from the one stored in its output table's lineage
  *    (`is_dirty`, steps/__init__.py:512-532);
  *  - `--force` / `--only` / `--dry-run` flags (command.py:49-163);
  *  - subgraph filtering by regex + downstream closure
  *    (`filter_to_subgraph`, steps/__init__.py:112-172).
  *
  * Each step's body builds ONE lazy DataFrame from its inputs, so Catalyst
  * sees the whole step as a single query (predicate pushdown, column
  * pruning, join planning all apply across the step).
  */
final case class Step(
    id: String,
    deps: Seq[String],
    codeVersion: String, // the reference's code-file checksum analogue
    run: (SparkSession, Map[String, DataFrame]) => DataFrame,
    incremental: Option[IncrementalSpec] = None
)

object Step {
  /** An externally-ingested table (e.g. the CDC engine's pages table):
    * participates in dependency resolution and input checksums — downstream
    * steps go dirty when its snapshot advances — but is never built by the
    * DAG (the reference's snapshot:// source-step analogue). */
  def external(id: String): Step = Step(id, Nil, "external", null)
}

/** Downstream INCREMENTAL recompute — the CDC payoff the reference lacks
  * (it re-runs whole steps): when only `changeDep` moved since the step's
  * last build, the step consumes `changeDep`'s CHANGE FEED
  * (LakeTable.changesBetween — cost O(changes), never the base table) and
  * LWW merge-applies the mapped change events into its output table.
  *
  * `mapChanges(spark, feed, otherDeps)` receives the feed (upstream rows +
  * `_op`/`_snapshot_id`) and full frames of the OTHER deps (dimension
  * lookups), and must return change events shaped
  * `(lsn long, op 'U'|'D', <key>, value columns of the step's output)` —
  * a deleted upstream key maps to a 'D' event. Any other change (code
  * version, another dep, first build) falls back to the full `run` +
  * rewrite, so incremental is purely an optimization, never a semantics
  * change. */
final case class IncrementalSpec(
    changeDep: String,
    mapChanges: (SparkSession, DataFrame, Map[String, DataFrame]) => DataFrame
)

final case class RunReport(
    executed: Seq[String],
    skipped: Seq[String],
    order: Seq[String]
)

class StepDag(steps: Seq[Step], storeDir: String, numBuckets: Int = 8) {
  private val byId = steps.map(s => s.id -> s).toMap
  require(byId.size == steps.size, "duplicate step ids")

  /** Kahn topological order; fails on cycles or missing deps. */
  def topoOrder(subset: Set[String] = byId.keySet): Seq[String] = {
    val ids = subset
    ids.flatMap(id => byId(id).deps.filterNot(d => ids.contains(d)))
      .headOption.foreach(d => throw new IllegalArgumentException(s"missing dep: $d"))
    val inDeg = scala.collection.mutable.Map(
      ids.toSeq.map(id => id -> byId(id).deps.count(ids.contains)): _*)
    val ready = scala.collection.mutable.PriorityQueue(
      inDeg.filter(_._2 == 0).keys.toSeq: _*)(Ordering[String].reverse)
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    while (ready.nonEmpty) {
      val id = ready.dequeue()
      out += id
      for (s <- ids if byId(s).deps.contains(id)) {
        inDeg(s) -= 1
        if (inDeg(s) == 0) ready.enqueue(s)
      }
    }
    if (out.size != ids.size)
      throw new IllegalArgumentException(
        s"cycle among: ${ids -- out.toSet}")
    out.toSeq
  }

  /** Regex include + downstream closure (filter_to_subgraph analogue). */
  def select(includeRegex: String, downstream: Boolean = false): Set[String] = {
    val re = includeRegex.r
    var sel = byId.keySet.filter(id => re.findFirstIn(id).isDefined)
    // upstream closure (dependencies always included, like the reference)
    var grew = true
    while (grew) {
      val next = sel ++ sel.flatMap(byId(_).deps)
      grew = next.size != sel.size; sel = next
    }
    if (downstream) {
      grew = true
      while (grew) {
        val next = sel ++ byId.keySet.filter(id =>
          byId(id).deps.exists(sel.contains))
        grew = next.size != sel.size; sel = next
      }
      // re-close upstream for newly added downstream steps
      grew = true
      while (grew) {
        val next = sel ++ sel.flatMap(byId(_).deps)
        grew = next.size != sel.size; sel = next
      }
    }
    sel
  }

  def tableDir(id: String): String = s"$storeDir/${id.replace('/', '_')}"
  def table(id: String): LakeTable = new LakeTable(tableDir(id))

  /** A step's input checksum: code version + upstream snapshot ids
    * (checksum_input analogue — Merkle through the DAG because upstream
    * snapshot ids themselves advance only when their inputs changed). */
  private def inputChecksum(id: String): String =
    inputChecksumPinned(id, Map.empty)

  /** Input checksum with some deps PINNED to given snapshot ids — used to
    * test whether ONLY the incremental change-dep moved (pin it to the
    * stored snapshot: equality with the stored checksum means nothing else
    * changed). */
  private def inputChecksumPinned(id: String, pin: Map[String, Long]): String = {
    val s = byId(id)
    val parts = s.codeVersion +: s.deps.sorted.map { d =>
      val sid = pin.getOrElse(d, {
        val t = table(d)
        if (t.exists) t.metadata.currentSnapshotId.getOrElse(-1L) else -1L
      })
      s"$d=$sid"
    }
    Checksums.md5Hex(parts.mkString("|"))
  }

  def isDirty(id: String): Boolean = {
    val t = table(id)
    if (!t.exists || t.metadata.currentSnapshotId.isEmpty) return true
    val stored = t.metadata.currentSnapshot.flatMap(_.inputChecksum)
    !stored.contains(inputChecksum(id))
  }

  /** Execute (dirty steps only unless force), in topo order. Each step's
    * output is committed to its lake table with the input checksum recorded
    * in the snapshot lineage — the `source_checksum` stamp
    * (steps/__init__.py:501-504). */
  def run(
      spark: SparkSession,
      includeRegex: String = ".*",
      force: Boolean = false,
      dryRun: Boolean = false,
      downstream: Boolean = false
  ): RunReport = {
    val order = topoOrder(select(includeRegex, downstream))
    val executed = scala.collection.mutable.ArrayBuffer.empty[String]
    val skipped = scala.collection.mutable.ArrayBuffer.empty[String]
    for (id <- order) {
      val s = byId(id)
      val dirty = s.run != null && (force || isDirty(id))
      if (!dirty) skipped += id
      else if (!dryRun) {
        if (!runIncrementalIfPossible(spark, id)) {
          val inputs = s.deps.map(d => d -> table(d).read(spark)).toMap
          val out = s.run(spark, inputs)
          writeOutput(spark, id, out)
        }
        executed += id
      } else executed += id
    }
    RunReport(executed.toSeq, skipped.toSeq, order)
  }

  /** Incremental path: applies when the step has an IncrementalSpec, its
    * output exists, and pinning the change-dep to the PREVIOUSLY-consumed
    * snapshot reproduces the stored input checksum (proving code + all
    * other deps are unchanged — only the change-dep moved). Consumes the
    * change feed and LWW merge-applies the mapped events. Returns false →
    * caller takes the full-rebuild path. */
  private def runIncrementalIfPossible(spark: SparkSession, id: String): Boolean = {
    val s = byId(id)
    val inc = s.incremental.getOrElse(return false)
    val t = table(id)
    if (!t.exists || t.metadata.currentSnapshotId.isEmpty) return false
    val cur = t.metadata.currentSnapshot.get
    val lastConsumed = cur.inputSnapshots.get(inc.changeDep).getOrElse(return false)
    val stored = cur.inputChecksum.getOrElse(return false)
    if (inputChecksumPinned(id, Map(inc.changeDep -> lastConsumed)) != stored)
      return false // something besides the change-dep moved → full rebuild
    val upstream = table(inc.changeDep)
    val to = upstream.metadata.currentSnapshotId.getOrElse(return false)
    val feed = upstream.changesBetween(spark, lastConsumed, to)
    val others = s.deps.filterNot(_ == inc.changeDep)
      .map(d => d -> table(d).read(spark)).toMap
    val events = inc.mapChanges(spark, feed, others)
    graft.cdc.MergeApply(spark, t, events,
      batchId = to, stepId = s"step:$id",
      inputSnapshots = s.deps.map(d =>
        d -> table(d).metadata.currentSnapshotId.getOrElse(-1L)).toMap,
      inputChecksum = Some(inputChecksum(id)))
    true
  }

  private def writeOutput(spark: SparkSession, id: String, df0: DataFrame): Unit = {
    import graft.lake._
    import org.apache.spark.sql.functions._
    val t = table(id)
    val isIncremental = byId(id).incremental.isDefined
    // incremental steps' outputs are LWW tables (merge-apply target): the
    // full build seeds every row at LSN 0, not deleted
    val df =
      if (isIncremental)
        df0.withColumn("_lsn", lit(0L)).withColumn("_deleted", lit(false))
      else df0
    if (!t.exists) {
      val fields = df.schema.fields.zipWithIndex.map { case (f, i) =>
        LakeField(i + 1, f.name, f.dataType.sql.toLowerCase, f.nullable)
      }
      t.create(fields.toSeq, numBuckets, df.columns.head,
        lwwColumn = if (isIncremental) Some("_lsn") else None,
        tombstoneColumn = if (isIncremental) Some("_deleted") else None)
    }
    val meta = t.metadata
    val snapId = meta.currentSnapshotId.getOrElse(0L) + 1
    val snapDirRel = s"data/snap-$snapId"
    df.withColumn("_bucket",
        pmod(xxhash64(col(meta.bucketColumn)), lit(meta.numBuckets)).cast("int"))
      .repartition(col("_bucket"))
      .write.mode("overwrite").partitionBy("_bucket") // clobber crash debris (self-healing)
      .parquet(t.absolute(snapDirRel))
    val files = t.listDataFiles(snapDirRel, meta.currentSchemaVersion, spark)
    val snap = Snapshot(
      snapshotId = snapId, parentId = meta.currentSnapshotId,
      stepId = id, batchId = snapId,
      lsnMin = -1, lsnMax = -1,
      rowsInserted = 0, rowsUpdated = 0, rowsDeleted = 0,
      schemaVersion = meta.currentSchemaVersion,
      files = files,
      inputSnapshots = byId(id).deps.map(d =>
        d -> (if (table(d).exists)
          table(d).metadata.currentSnapshotId.getOrElse(-1L) else -1L)).toMap,
      inputChecksum = Some(inputChecksum(id)))
    t.commit(meta.copy(version = meta.version + 1,
      currentSnapshotId = Some(snapId), snapshots = meta.snapshots :+ snap))
  }
}
