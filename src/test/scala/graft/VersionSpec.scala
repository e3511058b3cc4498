package graft

import graft.graph.{Step, UpgradeMap, VersionTracker}

/** VersionTracker behavior vs /root/reference/etl/version_tracker.py:
  * family grouping, "latest" ordering, update states, closures, checks,
  * and the indicator-upgrade variable mapping. */
class VersionSpec extends SparkSpec {
  import VersionTracker._

  def s(id: String, deps: String*): Step = Step(id, deps, "v", null)

  val steps = Seq(
    s("snapshot/who/2023-01-01/gho"),
    s("snapshot/who/2024-01-01/gho"),
    s("garden/who/2023-01-01/gho", "snapshot/who/2023-01-01/gho"),
    s("garden/who/2024-01-01/gho", "snapshot/who/2024-01-01/gho"),
    s("garden/who/latest/gho", "snapshot/who/2024-01-01/gho"),
    s("grapher/who/2024-01-01/gho", "garden/who/latest/gho"),
    s("adhoc-step") // unversioned id
  )
  val vt = new VersionTracker(steps)

  test("families order versions with latest above dates; forward/backward split") {
    assert(vt.allVersions("garden/who/2023-01-01/gho") == Seq(
      "garden/who/2023-01-01/gho", "garden/who/2024-01-01/gho",
      "garden/who/latest/gho"))
    assert(vt.latestVersion("garden/who/2023-01-01/gho") == "garden/who/latest/gho")
    assert(vt.forwardVersions("garden/who/2024-01-01/gho") == Seq("garden/who/latest/gho"))
    assert(vt.backwardVersions("garden/who/2024-01-01/gho") == Seq("garden/who/2023-01-01/gho"))
  }

  test("update states: latest / outdated / archivable / unversioned") {
    assert(vt.updateState("garden/who/latest/gho") == Latest)
    // 2023 snapshot is outdated AND still used by garden 2023 → Outdated
    assert(vt.updateState("snapshot/who/2023-01-01/gho") == Outdated)
    // garden 2023/2024 are outdated with no usages → Archivable
    assert(vt.updateState("garden/who/2023-01-01/gho") == Archivable)
    assert(vt.updateState("garden/who/2024-01-01/gho") == Archivable)
    assert(vt.updateState("adhoc-step") == Unversioned)
    assert(vt.archivableSteps == Seq(
      "garden/who/2023-01-01/gho", "garden/who/2024-01-01/gho"))
  }

  test("dependency/usage closures and sanity checks") {
    assert(vt.allDependencies("grapher/who/2024-01-01/gho") ==
      Seq("garden/who/latest/gho", "snapshot/who/2024-01-01/gho"))
    assert(vt.allUsages("snapshot/who/2024-01-01/gho").toSet ==
      Set("garden/who/2024-01-01/gho", "garden/who/latest/gho",
        "grapher/who/2024-01-01/gho"))
    assert(vt.missingDependencies.isEmpty)
    val broken = new VersionTracker(steps :+ s("garden/x/latest/y", "nope/missing/1/z"))
    assert(broken.missingDependencies == Seq("garden/x/latest/y" -> "nope/missing/1/z"))
  }

  test("indicator upgrade map: exact matches map, remainder surfaced") {
    val m = UpgradeMap.between(
      Seq("deaths__sex_male", "deaths__sex_female", "cases"),
      Seq("deaths__sex_male", "deaths__sex_female", "hospitalizations"))
    assert(m.mapped.keySet == Set("deaths__sex_male", "deaths__sex_female"))
    assert(m.removed == Seq("cases") && m.added == Seq("hospitalizations"))
  }
}
