package graft.graph

import graft.lake.LakeTable
import graft.ops.Checksums
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** The step DAG (SURVEY.md §7.1 module `graph`) — the reference's compute
  * graph (/root/reference/etl/steps/__init__.py:52 `DAG`, dag/main.yml)
  * re-expressed as a registry of Dataset transforms compiled through
  * Catalyst.
  *
  * Semantics reproduced:
  *  - topological execution (`to_dependency_order`, steps/__init__.py:101);
  *  - content-addressed dirtiness: a step's input checksum hashes its code
  *    version + metadata version + each upstream output's snapshot id —
  *    outputs are pure functions of inputs (`DataStep.checksum_input`,
  *    steps/__init__.py:565-587); a step re-runs only when that checksum
  *    differs from the one stored in its output table's lineage
  *    (`is_dirty`, steps/__init__.py:512-532);
  *  - INSTANT metadata-only updates (steps/__init__.py:623-665): when ONLY
  *    the metadata version moved, the output's sidecar is re-stamped and a
  *    metadata-only snapshot committed — zero data files rewritten;
  *  - `--force` / `--only` / `--dry-run` flags (command.py:49-163);
  *  - subgraph filtering by regex + downstream closure
  *    (`filter_to_subgraph`, steps/__init__.py:112-172);
  *  - SUBSET dev filtering (config.py:266, steps/__init__.py:581-584): a
  *    row-filter expression applied to every external input read, pushed
  *    into the scans by Catalyst. Part of the input checksum, so toggling
  *    it re-runs the affected steps.
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
    incremental: Option[IncrementalSpec] = None,
    // output-table metadata (title/units/...) + its version stamp — the
    // analogue of the step's metadata yaml. Bumping ONLY metaVersion takes
    // the INSTANT path: sidecar re-stamp, no data rewrite.
    meta: Option[graft.model.TableMeta] = None,
    metaVersion: String = "",
    // `data-private://` semantics (steps/__init__.py:248-249): the output is
    // stamped non-public and the step is excluded from runs unless
    // includePrivate; a PUBLIC step may never depend on a private one
    isPrivate: Boolean = false
)

object Step {
  /** An externally-ingested table (e.g. the CDC engine's pages table):
    * participates in dependency resolution and input checksums — downstream
    * steps go dirty when its snapshot advances — but is never built by the
    * DAG (the reference's snapshot:// source-step analogue). */
  def external(id: String, isPrivate: Boolean = false): Step =
    Step(id, Nil, "external", null, isPrivate = isPrivate)
}

/** Downstream INCREMENTAL recompute — the CDC payoff the reference lacks
  * (it re-runs whole steps): when only `changeDeps` moved since the step's
  * last build, the step consumes each change-dep's CHANGE FEED
  * (LakeTable.changesBetween — cost O(changes), never the base table) and
  * LWW merge-applies the mapped change events into its output table.
  *
  * `mapChanges(spark, feeds, otherDeps)` receives one feed per change-dep
  * (upstream rows + `_op`/`_snapshot_id`; EMPTY frame for a dep that did
  * not move) and full frames of the OTHER deps (dimension lookups), and
  * must return change events shaped
  * `(lsn long, op 'U'|'D', <key>, value columns of the step's output)` —
  * a deleted upstream key maps to a 'D' event. Any other change (code or
  * metadata version, a non-feed dep, first build) falls back to the full
  * `run` + rewrite, so incremental is purely an optimization, never a
  * semantics change.
  *
  * LWW seeding contract: on a FULL build, each output row is seeded with
  * the step's own `_lsn` column when `run` provides one (per-row upstream
  * LSN — for 1:1 transforms `col("_lsn")`, for aggregations
  * `max(col("_lsn"))` over contributing rows), else with the change-deps'
  * high-watermark LSN. The per-row form is exact under ARBITRARY
  * out-of-order batch splits; the watermark fallback is exact when the
  * upstream WAL commits LSN-monotonic batches (the binlog contract). */
final case class IncrementalSpec(
    changeDeps: Seq[String],
    mapChanges: (SparkSession, Map[String, DataFrame], Map[String, DataFrame]) => DataFrame
)

object IncrementalSpec {
  /** Single change-dep convenience (the common shape). */
  def one(changeDep: String)(
      mapChanges: (SparkSession, DataFrame, Map[String, DataFrame]) => DataFrame
  ): IncrementalSpec =
    IncrementalSpec(Seq(changeDep),
      (s: SparkSession, feeds: Map[String, DataFrame], others: Map[String, DataFrame]) =>
        mapChanges(s, feeds(changeDep), others))
}

final case class RunReport(
    executed: Seq[String],
    skipped: Seq[String],
    order: Seq[String],
    // continue-on-failure bookkeeping (command.py:779-827): steps whose body
    // threw (id -> first error line), and steps skipped because an upstream
    // failed — both stay dirty, independent branches keep building
    failed: Seq[(String, String)] = Nil,
    skippedDownstreamOfFailed: Seq[String] = Nil,
    // wall seconds per executed step (command.py:921 execution-time ledger)
    durations: Map[String, Double] = Map.empty
)

class StepDag(steps: Seq[Step], storeDir: String, numBuckets: Int = 8,
    // SUBSET dev filter (config.py:266): SQL boolean expression applied to
    // every EXTERNAL input read (missing columns → the filter is skipped
    // for that table). Dev-mode only; part of the input checksum.
    subset: Option[String] = None) {
  private val byId = steps.map(s => s.id -> s).toMap
  require(byId.size == steps.size, "duplicate step ids")
  /** Public/private exclusivity (command.py:997-1002 `_validate_private_steps`):
    * a public step depending on a private one would leak private data into a
    * public output. Like the reference, this is enforced per RUN and only
    * when private steps are NOT requested — `includePrivate` unlocks such a
    * DAG ("Use --private flag"), so a reference-valid private pipeline stays
    * constructible. */
  private def validatePrivateDeps(): Unit = {
    val bad = for {
      s <- steps if !s.isPrivate
      d <- s.deps if byId.get(d).exists(_.isPrivate)
    } yield s"${s.id} -> $d"
    require(bad.isEmpty,
      s"public steps may not depend on private steps (run with includePrivate " +
        s"to allow): ${bad.mkString(", ")}")
  }

  /** dep → dependents index, built once — graph walks (topoOrder, select)
    * are O(V+E) against it instead of scanning every step per dequeue /
    * per closure round (the previous spelling was O(V²·d̄): tens of
    * millions of Seq.contains calls at the reference's ~2,700-step DAG). */
  private val dependentsOf: Map[String, Seq[String]] =
    steps.flatMap(s => s.deps.map(_ -> s.id))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap

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
      for (s <- dependentsOf.getOrElse(id, Nil) if ids.contains(s)) {
        inDeg(s) -= 1
        if (inDeg(s) == 0) ready.enqueue(s)
      }
    }
    if (out.size != ids.size)
      throw new IllegalArgumentException(
        s"cycle among: ${ids -- out.toSet}")
    out.toSeq
  }

  /** Regex include + downstream closure (filter_to_subgraph analogue).
    * Worklist BFS over the dep / dependents indexes — O(V+E), not a
    * grow-until-fixed-point loop re-scanning the selection each round. */
  def select(includeRegex: String, downstream: Boolean = false): Set[String] = {
    val re = includeRegex.r
    val seed = byId.keySet.filter(id => re.findFirstIn(id).isDefined)
    def closure(start: Set[String], next: String => Seq[String]): Set[String] = {
      val seen = scala.collection.mutable.Set.empty[String] ++ start
      val work = scala.collection.mutable.ArrayDeque.empty[String] ++ start
      while (work.nonEmpty) {
        val id = work.removeHead()
        for (n <- next(id) if !seen.contains(n)) { seen += n; work += n }
      }
      seen.toSet
    }
    // upstream closure (dependencies always included, like the reference)
    val up = closure(seed, id => byId(id).deps)
    if (!downstream) up
    else {
      val down = closure(up, id => dependentsOf.getOrElse(id, Nil))
      // re-close upstream for newly added downstream steps
      closure(down, id => byId(id).deps)
    }
  }

  def tableDir(id: String): String = s"$storeDir/${id.replace('/', '_')}"
  def table(id: String): LakeTable = new LakeTable(tableDir(id))

  /** The output table's metadata sidecar (written by full builds, INSTANT
    * commits re-stamp it in place). */
  def tableMeta(spark: SparkSession, id: String): Option[graft.model.TableMeta] =
    scala.util.Try(
      graft.sources.TableIO.readSidecar(spark, s"${tableDir(id)}/metadata")._1).toOption

  private def currentSnapshotIdOf(d: String): Long = {
    val t = table(d)
    if (t.exists) t.metadata.currentSnapshotId.getOrElse(-1L) else -1L
  }

  /** The DATA half of a step's input checksum from EXPLICIT upstream
    * snapshot ids: code version + subset filter + each dep's id (Merkle
    * through the DAG because upstream snapshot ids themselves advance only
    * when their inputs changed). */
  private def dataChecksumFrom(s: Step, ids: Map[String, Long]): String = {
    val parts = (s.codeVersion + subset.fold("")("|subset=" + _)) +:
      s.deps.sorted.map(d => s"$d=${ids(d)}")
    Checksums.md5Hex(parts.mkString("|"))
  }

  /** Composite stored checksum: `<dataChecksum>:<metaChecksum>`. A data-part
    * mismatch re-runs the step; a meta-part-only mismatch takes the INSTANT
    * path (steps/__init__.py:623-665). */
  private def checksumFrom(s: Step, ids: Map[String, Long]): String =
    s"${dataChecksumFrom(s, ids)}:${Checksums.md5Hex(s.metaVersion)}"

  private def currentDepIds(s: Step): Map[String, Long] =
    s.deps.map(d => d -> currentSnapshotIdOf(d)).toMap

  private def inputChecksum(id: String): String = {
    val s = byId(id)
    checksumFrom(s, currentDepIds(s))
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
      downstream: Boolean = false,
      // --continue-on-failure (command.py:779-827): a failing step marks its
      // downstream skipped-and-still-dirty; independent branches keep
      // building; the report carries every failure instead of the first
      // exception killing a 1000-step nightly build
      continueOnFailure: Boolean = false,
      // private steps excluded unless requested (the reference's --private)
      includePrivate: Boolean = false
  ): RunReport = {
    if (!includePrivate) validatePrivateDeps()
    val selected = select(includeRegex, downstream)
      .filter(id => includePrivate || !byId(id).isPrivate)
    val order = topoOrder(selected)
    val executed = scala.collection.mutable.ArrayBuffer.empty[String]
    val skipped = scala.collection.mutable.ArrayBuffer.empty[String]
    val failed = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    val blocked = scala.collection.mutable.ArrayBuffer.empty[String]
    val dead = scala.collection.mutable.Set.empty[String] // failed or blocked
    val durations = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    for (id <- order) {
      val s = byId(id)
      if (s.deps.exists(dead.contains)) {
        // an upstream failed this run: building against its stale output
        // would stamp a lineage that marks the failure consumed — skip, stay
        // dirty, keep walking the independent branches
        blocked += id; dead += id
      } else {
        val dirty = s.run != null && (force || isDirty(id))
        if (!dirty) skipped += id
        else if (!dryRun) {
          val t0 = System.nanoTime()
          try {
            if (!runInstantIfPossible(spark, id) && !runIncrementalIfPossible(spark, id)) {
              // capture every dep's snapshot id ONCE, before the step body
              // builds its plans: a dep committing between plan-build and
              // write must appear as next run's work, never silently stamped
              // consumed in this run's lineage
              val ids = currentDepIds(s)
              val inputs = s.deps.map(d => d -> readInput(spark, d)).toMap
              val out = s.run(spark, inputs)
              writeOutput(spark, id, out, ids)
            }
            executed += id
            durations(id) = (System.nanoTime() - t0) / 1e9
          } catch {
            case scala.util.control.NonFatal(e) if continueOnFailure =>
              val msg = Option(e.getMessage).getOrElse(e.getClass.getName)
                .linesIterator.next().take(300)
              System.err.println(s"[graft] step $id FAILED ($msg); continuing")
              failed += id -> msg; dead += id
          }
        } else executed += id
      }
    }
    if (durations.nonEmpty) writeExecutionTimes(durations.toMap)
    RunReport(executed.toSeq, skipped.toSeq, order, failed.toSeq, blocked.toSeq,
      durations.toMap)
  }

  // ------------------------------------------------ execution-time ledger
  // (command.py:921-952 `.execution_time.json`): per-step wall seconds,
  // merged across runs, used to estimate how long a pending build will take.

  private def executionTimeFile = s"$storeDir/.execution_time.json"

  /** Stored per-step wall seconds from previous runs (merged, persistent). */
  def executionTimes: Map[String, Double] = {
    val f = new java.io.File(executionTimeFile)
    if (!f.exists()) Map.empty
    else {
      val n = new com.fasterxml.jackson.databind.ObjectMapper().readTree(f)
      val out = scala.collection.mutable.Map.empty[String, Double]
      n.properties().forEach(e => out(e.getKey) = e.getValue.asDouble())
      out.toMap
    }
  }

  private def writeExecutionTimes(fresh: Map[String, Double]): Unit = {
    val merged = executionTimes ++ fresh
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val n = mapper.createObjectNode()
    merged.toSeq.sortBy(_._1).foreach { case (k, v) =>
      n.put(k, math.rint(v * 1000) / 1000.0)
    }
    new java.io.File(storeDir).mkdirs()
    java.nio.file.Files.write(java.nio.file.Paths.get(executionTimeFile),
      mapper.writerWithDefaultPrettyPrinter().writeValueAsBytes(n))
  }

  /** Recorded time for `id`, falling back to another VERSION of the same
    * step (`_get_execution_time`, command.py:940-952 — the version is the
    * second-to-last `/` segment of a step id like channel/ns/version/name). */
  def estimatedTime(id: String): Option[Double] = {
    val times = executionTimes
    times.get(id).orElse {
      def ident(s: String) = {
        val parts = s.split('/')
        if (parts.length >= 2) (parts.dropRight(2) :+ parts.last).mkString("/")
        else s
      }
      times.collectFirst { case (k, v) if ident(k) == ident(id) => v }
    }
  }

  /** ETA for the steps a `run` with these arguments would execute: total
    * known seconds + how many pending steps have no recorded time. */
  def eta(includeRegex: String = ".*", force: Boolean = false,
      downstream: Boolean = false, includePrivate: Boolean = false
  ): (Double, Int) = {
    if (!includePrivate) validatePrivateDeps()
    val pending = topoOrder(select(includeRegex, downstream)
        .filter(id => includePrivate || !byId(id).isPrivate))
      .filter(id => byId(id).run != null && (force || isDirty(id)))
    val known = pending.flatMap(estimatedTime)
    (known.sum, pending.size - known.size)
  }

  /** External-input read with the SUBSET dev filter applied when its
    * columns resolve (config.py:266 — regex/row dev filters pushed into
    * the scan by Catalyst). */
  private def readInput(spark: SparkSession, d: String): DataFrame = {
    val df = table(d).read(spark)
    subset match {
      case Some(expr) =>
        try df.filter(org.apache.spark.sql.functions.expr(expr))
        catch { case _: org.apache.spark.sql.AnalysisException => df }
      case None => df
    }
  }

  /** INSTANT path (steps/__init__.py:623-665): output exists, the DATA part
    * of the checksum is unchanged, only the metadata version moved →
    * re-stamp the sidecar and commit a metadata-only snapshot that carries
    * every data file forward. Zero data IO; downstream steps still see a
    * new snapshot id (metadata edits cascade, as in the reference). */
  private def runInstantIfPossible(spark: SparkSession, id: String): Boolean = {
    val s = byId(id)
    val t = table(id)
    if (!t.exists || t.metadata.currentSnapshotId.isEmpty) return false
    val cur = t.metadata.currentSnapshot.get
    val stored = cur.inputChecksum.getOrElse(return false)
    val ids = currentDepIds(s)
    if (!stored.startsWith(dataChecksumFrom(s, ids) + ":")) return false
    val fresh = checksumFrom(s, ids)
    if (stored == fresh) return false // not dirty at all (caller guards)
    s.meta.foreach(m =>
      graft.sources.TableIO.writeSidecar(s"${tableDir(id)}/metadata",
        if (s.isPrivate) m.copy(isPublic = false) else m, "lake"))
    val meta = t.metadata
    val snapId = meta.currentSnapshotId.get + 1
    val snap = graft.lake.Snapshot(
      snapshotId = snapId, parentId = meta.currentSnapshotId,
      stepId = id, batchId = snapId,
      lsnMin = -1, lsnMax = -1,
      rowsInserted = 0, rowsUpdated = 0, rowsDeleted = 0,
      schemaVersion = cur.schemaVersion,
      files = t.filesOf(cur), // carried forward — no data rewrite
      inputSnapshots = ids,
      inputChecksum = Some(fresh))
    t.commit(meta.copy(version = meta.version + 1,
      currentSnapshotId = Some(snapId), snapshots = meta.snapshots :+ snap))
    true
  }

  /** Incremental path: applies when the step has an IncrementalSpec, its
    * output exists, and pinning every change-dep to the PREVIOUSLY-consumed
    * snapshot reproduces the stored input checksum (proving code, metadata
    * and all other deps are unchanged — only change-deps moved). Consumes
    * each moved dep's change feed and LWW merge-applies the mapped events.
    * Returns false → caller takes the full-rebuild path; any feed failure
    * (retention window exceeded, upstream rebuilt/CoW-committed) degrades
    * to false as well — incremental is an optimization, never a crash. */
  private def runIncrementalIfPossible(spark: SparkSession, id: String): Boolean = {
    val s = byId(id)
    val inc = s.incremental.getOrElse(return false)
    val t = table(id)
    if (!t.exists || t.metadata.currentSnapshotId.isEmpty) return false
    val cur = t.metadata.currentSnapshot.get
    val stored = cur.inputChecksum.getOrElse(return false)
    val lastConsumed: Map[String, Long] = inc.changeDeps.map { d =>
      d -> cur.inputSnapshots.getOrElse(d, return false)
    }.toMap
    // capture EVERY dep's snapshot id exactly once: the same ids drive the
    // gate, the feed windows, and the committed lineage — a concurrent
    // upstream commit after this point is simply the next run's work, never
    // silently marked consumed (the re-read race the lineage must not have)
    val otherIds: Map[String, Long] = s.deps.filterNot(inc.changeDeps.contains)
      .map(d => d -> currentSnapshotIdOf(d)).toMap
    val changeToIds: Map[String, Long] = inc.changeDeps.map { d =>
      val t2 = table(d)
      d -> (if (t2.exists) t2.metadata.currentSnapshotId.getOrElse(return false)
            else return false)
    }.toMap
    if (checksumFrom(s, lastConsumed ++ otherIds) != stored)
      return false // something besides the change-deps moved → full rebuild
    try {
      val feeds: Map[String, DataFrame] = inc.changeDeps.map { d =>
        d -> table(d).changesBetween(spark, lastConsumed(d), changeToIds(d))
      }.toMap
      val others = s.deps.filterNot(inc.changeDeps.contains)
        .map(d => d -> readInput(spark, d)).toMap
      val events = inc.mapChanges(spark, feeds, others)
      val consumed = changeToIds ++ otherIds
      graft.cdc.MergeApply(spark, t, events,
        // sum of consumed change-dep snapshot ids: strictly increasing
        // whenever any feed moved — a monotone batchId for the ledger
        batchId = changeToIds.values.sum, stepId = s"step:$id",
        inputSnapshots = consumed,
        inputChecksum = Some(checksumFrom(s, consumed)))
      true
    } catch {
      case scala.util.control.NonFatal(e) =>
        // e.g. change window beyond the retained log, or an upstream full
        // rebuild / CoW commit whose added files are not deltas — the
        // documented contract degrades to a full rebuild, it never kills a
        // dag.run (or the streaming query driving it via onBatch)
        System.err.println(
          s"[graft] incremental path for step $id unavailable " +
            s"(${e.getClass.getSimpleName}: ${e.getMessage}); full rebuild")
        false
    }
  }

  /** High-watermark LSN across the change-deps' retained snapshot logs —
    * the full-build seed when the step does not propagate `_lsn` itself. */
  private def seedLsn(s: Step): Long =
    s.incremental.map(_.changeDeps.flatMap { d =>
      val t = table(d)
      if (t.exists) t.metadata.snapshots.map(_.lsnMax) else Nil
    }).getOrElse(Nil).foldLeft(0L)(math.max)

  private def writeOutput(spark: SparkSession, id: String, df0: DataFrame,
      depIds: Map[String, Long]): Unit = {
    import graft.lake._
    import org.apache.spark.sql.functions._
    val t = table(id)
    val step = byId(id)
    val isIncremental = step.incremental.isDefined
    // incremental steps' outputs are LWW tables (merge-apply target). The
    // full build seeds each row's LSN with the step's own `_lsn` column when
    // provided (per-row upstream LSN — exact under out-of-order feeds), else
    // the change-deps' high-watermark (exact under LSN-monotonic commits).
    // Never 0: a seed below already-reflected events would let a stale feed
    // event overwrite newer seeded state.
    val df =
      if (isIncremental) {
        val seeded =
          if (df0.columns.contains("_lsn")) df0
          else df0.withColumn("_lsn", lit(seedLsn(step)))
        if (seeded.columns.contains("_deleted")) seeded
        else seeded.withColumn("_deleted", lit(false))
      } else df0
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
    graft.cdc.MergeApply.repartitionByBucket(
        df.withColumn("_bucket",
          pmod(xxhash64(col(meta.bucketColumn)), lit(meta.numBuckets)).cast("int")),
        meta.numBuckets)
      .write.mode("overwrite").option("compression", graft.cdc.MergeApply.lakeCodec)
          .partitionBy("_bucket") // clobber crash debris (self-healing)
      .parquet(t.absolute(snapDirRel))
    val files = t.listDataFiles(snapDirRel, meta.currentSchemaVersion, spark)
    val ids = depIds // captured by the caller BEFORE the step body ran
    val snap = Snapshot(
      snapshotId = snapId, parentId = meta.currentSnapshotId,
      stepId = id, batchId = snapId,
      lsnMin = -1, lsnMax = -1,
      rowsInserted = 0, rowsUpdated = 0, rowsDeleted = 0,
      schemaVersion = meta.currentSchemaVersion,
      files = files,
      inputSnapshots = ids,
      inputChecksum = Some(checksumFrom(step, ids)))
    t.commit(meta.copy(version = meta.version + 1,
      currentSnapshotId = Some(snapId), snapshots = meta.snapshots :+ snap))
    // private steps stamp their output non-public (DataStepPrivate,
    // tests/test_steps.py:240-245) — even when the step declares no meta
    val sidecarMeta =
      if (step.isPrivate)
        Some(step.meta.getOrElse(graft.model.TableMeta(shortName = id))
          .copy(isPublic = false))
      else step.meta
    sidecarMeta.foreach(m =>
      graft.sources.TableIO.writeSidecar(s"${tableDir(id)}/metadata", m, "lake"))
  }
}
