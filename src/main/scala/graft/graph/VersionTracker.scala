package graft.graph

/** Dataset version tracking + indicator-upgrade mapping — the
  * behavior-relevant core of the reference's VersionTracker
  * (/root/reference/etl/version_tracker.py:272): step ids follow the
  * `channel/namespace/version/name` convention; the tracker groups steps
  * into version families, derives each step's update state, exposes
  * dependency/usage closures, and runs the DAG sanity checks.
  *
  * `UpgradeMap` is the indicator-upgrader core
  * (version_tracker.py:592-644 + the wizard's variable mapping): between
  * two published versions of a dataset it maps variable short names
  * old → new and surfaces the unmatched remainder on both sides — the
  * driver-side, bounded-size operation the reference performs against its
  * MySQL variables table, here against grapher publish outputs or the
  * steps' declared columns.
  */
object VersionTracker {

  /** Parsed step id. `version` is "latest", a date, or a number — ordering
    * follows the reference: "latest" sorts above any concrete version
    * (version_tracker.py:408-414). */
  final case class StepId(channel: String, namespace: String,
      version: String, name: String) {
    def family: (String, String, String) = (channel, namespace, name)
    def render: String = s"$channel/$namespace/$version/$name"
  }

  def parse(id: String): Option[StepId] = id.split('/') match {
    case Array(c, ns, v, n) => Some(StepId(c, ns, v, n))
    case _                  => None
  }

  /** "latest" > any concrete version; concrete versions compare as strings
    * (ISO dates / zero-padded numbers sort correctly). */
  val versionOrdering: Ordering[String] = (a: String, b: String) =>
    if (a == b) 0
    else if (a == "latest") 1
    else if (b == "latest") -1
    else a.compareTo(b)

  sealed trait UpdateState
  case object Latest extends UpdateState      // newest version of its family
  case object Outdated extends UpdateState    // a newer version exists, still used
  case object Archivable extends UpdateState  // outdated and nothing active uses it
  case object Unversioned extends UpdateState // id does not follow the convention
}

final class VersionTracker(steps: Seq[Step]) {
  import VersionTracker._

  private val byId = steps.map(s => s.id -> s).toMap
  require(byId.size == steps.size, "duplicate step ids")
  private val parsed: Map[String, StepId] =
    steps.flatMap(s => parse(s.id).map(s.id -> _)).toMap
  private val families: Map[(String, String, String), Seq[String]] =
    parsed.toSeq.groupBy(_._2.family).view
      .mapValues(_.map(_._1).sortBy(id => parsed(id).version)(versionOrdering))
      .toMap

  // ---- version families ----------------------------------------------------

  /** All versions of the step's family, oldest → newest
    * (get_all_step_versions, version_tracker.py:404). */
  def allVersions(id: String): Seq[String] =
    parsed.get(id).map(p => families(p.family)).getOrElse(Seq(id))

  def latestVersion(id: String): String = allVersions(id).last

  /** Strictly newer / older versions of the same family
    * (get_forward/backward_step_versions, :408-414). */
  def forwardVersions(id: String): Seq[String] =
    allVersions(id).dropWhile(_ != id).drop(1)
  def backwardVersions(id: String): Seq[String] =
    allVersions(id).takeWhile(_ != id)

  // ---- dependency / usage closures ----------------------------------------

  def directDependencies(id: String): Seq[String] = byId(id).deps

  def directUsages(id: String): Seq[String] =
    steps.filter(_.deps.contains(id)).map(_.id).sorted

  private def closure(start: String, next: String => Seq[String]): Seq[String] = {
    val seen = scala.collection.mutable.LinkedHashSet.empty[String]
    def go(id: String): Unit = next(id).foreach { d =>
      if (!seen.contains(d)) { seen += d; go(d) }
    }
    go(start)
    seen.toSeq
  }

  /** Transitive dependencies (get_all_step_dependencies, :368). */
  def allDependencies(id: String): Seq[String] =
    closure(id, directDependencies)

  /** Transitive usages (get_all_step_usages, :377). */
  def allUsages(id: String): Seq[String] = closure(id, directUsages)

  // ---- update state --------------------------------------------------------

  /** A step is Latest when no newer family version exists; Outdated when a
    * newer one exists but something still uses this one; Archivable when
    * outdated and unused (_add_steps_update_state, :506-590). */
  def updateState(id: String): UpdateState =
    if (!parsed.contains(id)) Unversioned
    else if (forwardVersions(id).isEmpty) Latest
    else if (directUsages(id).nonEmpty) Outdated
    else Archivable

  def archivableSteps: Seq[String] =
    steps.map(_.id).filter(updateState(_) == Archivable).sorted

  // ---- sanity checks -------------------------------------------------------

  /** Every declared dependency exists
    * (check_that_active_dependencies_are_defined, :923). */
  def missingDependencies: Seq[(String, String)] =
    steps.flatMap(s => s.deps.filterNot(byId.contains).map(s.id -> _)).sorted

  /** Steps that are outdated with no usages — candidates for archival
    * (check_that_all_active_steps_are_necessary, :936). */
  def unnecessarySteps: Seq[String] = archivableSteps
}

/** Variable mapping between two dataset versions — the indicator-upgrade
  * core: exact short-name matches map directly; the unmatched remainder on
  * both sides is surfaced for manual mapping (the reference's wizard flow).
  * Inputs are the two versions' variable short-name sets (e.g. from
  * `Grapher.publish` return values or `_meta/variable=*` listings) —
  * bounded, driver-side. */
final case class UpgradeMap(
    mapped: Map[String, String],     // old shortName → new shortName
    removed: Seq[String],            // in old only
    added: Seq[String]               // in new only
)

object UpgradeMap {
  def between(oldVars: Seq[String], newVars: Seq[String]): UpgradeMap = {
    val o = oldVars.toSet; val n = newVars.toSet
    UpgradeMap(
      mapped = (o & n).map(v => v -> v).toMap,
      removed = (o -- n).toSeq.sorted,
      added = (n -- o).toSeq.sorted)
  }

  /** Upgrade map between two `Grapher.publish` outputs, read from their
    * `_meta/variable=*` sidecar listings (driver-side, bounded by variable
    * cardinality — the wizard's two-dataset comparison). */
  def betweenPublishDirs(
      spark: org.apache.spark.sql.SparkSession,
      oldDir: String, newDir: String): UpgradeMap = {
    def vars(dir: String): Seq[String] = {
      val p = new org.apache.hadoop.fs.Path(s"$dir/_meta")
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (!fs.exists(p)) Nil
      else fs.listStatus(p).toSeq.filter(_.isDirectory).map(_.getPath.getName)
        .filter(_.startsWith("variable=")).map(_.stripPrefix("variable="))
    }
    between(vars(oldDir), vars(newDir))
  }
}
