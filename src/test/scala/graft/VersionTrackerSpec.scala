package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.dag.{Dag, VersionTracker}
import graft.dag.VersionTracker._

/** DAG lifecycle validation goldens mirroring the reference's
  * VersionTracker failure classes (`etl/version_tracker.py`, tests
  * `tests/test_version_tracker.py`): missing dependencies, archived
  * dependencies in the active dag, unused/archivable steps, and the
  * latest-version update states.
  */
class VersionTrackerSpec extends AnyFunSuite {

  private def d(ns: String, v: String, n: String) = s"data://garden/$ns/$v/$n"
  private def snap(ns: String, v: String, n: String) = s"snapshot://$ns/$v/$n"

  test("parseStep: data, private, snapshot, etag, and versionless forms") {
    val a = parseStep("data://garden/energy/2023-01-26/primary_energy")
    assert(a.channel == "garden" && a.namespace == "energy" &&
      a.version == "2023-01-26" && a.name == "primary_energy" &&
      a.kind == "public" && a.identifier == "garden/energy/primary_energy")
    val p = parseStep("data-private://meadow/who/2023-05-04/gho")
    assert(p.kind == "private" && p.stepType == "data" &&
      p.identifier == "meadow/who/gho")
    val s = parseStep("snapshot://energy/2023-01-01/coal.csv")
    assert(s.channel == "snapshot" && s.version == "2023-01-01" &&
      s.identifier == "snapshot/energy/coal.csv")
    val e = parseStep("etag://raw.githubusercontent.com/owid/x.json")
    assert(e.channel == "etag" && e.version == "latest")
    // versionless (the engine's simple dag form) parses leniently as latest
    val v = parseStep("data://garden/demo/table")
    assert(v.version == "latest" && v.identifier == "garden/demo/table")
  }

  test("failure class 1: active dependency defined nowhere is an ERROR naming step and users") {
    val active = Dag(Map(
      d("ns", "2023-01-01", "a") -> Set(d("ns", "2023-01-01", "deleted_dep")),
      d("ns", "2023-01-01", "b") -> Set(d("ns", "2023-01-01", "deleted_dep"))))
    val r = analyze(active)
    assert(!r.isValid)
    assert(r.missingDependencies == Map(d("ns", "2023-01-01", "deleted_dep") ->
      Set(d("ns", "2023-01-01", "a"), d("ns", "2023-01-01", "b"))))
    val err = intercept[IllegalArgumentException](requireValid(active))
    assert(err.getMessage.contains("Missing dependencies in the dag"))
    assert(err.getMessage.contains("deleted_dep"))
    assert(err.getMessage.contains(d("ns", "2023-01-01", "a")))
    assert(err.getMessage.contains("accidentally deleted"))
  }

  test("failure class 2: active step depending on an ARCHIVED step is an ERROR") {
    val archivedStep = d("ns", "2022-01-01", "old")
    val active = Dag(Map(d("ns", "2023-01-01", "user") -> Set(archivedStep)))
    val archive = Dag(Map(archivedStep -> Set.empty[String]))
    val r = analyze(active, archive)
    assert(!r.isValid && r.missingDependencies.isEmpty)
    assert(r.archivedDependencies == Map(archivedStep -> Set(d("ns", "2023-01-01", "user"))))
    val err = intercept[IllegalArgumentException](requireValid(active, archive))
    assert(err.getMessage.contains("Archived dependencies"))
    assert(err.getMessage.contains("un-archive"))
  }

  test("failure class 3: unused and archivable steps are WARNED, not errored") {
    val oldV = d("ns", "2022-01-01", "ds") // superseded, nothing uses it
    val newV = d("ns", "2023-01-01", "ds") // latest, used by grapher step
    val grapher = d("grapher_ns", "2023-01-01", "ds_g")
    val dangling = d("other", "2023-01-01", "fresh") // latest, unused
    val active = Dag(Map(
      oldV -> Set.empty[String], newV -> Set.empty[String],
      grapher -> Set(newV), dangling -> Set.empty[String]))
    val r = analyze(active, externallyUsed = Set(grapher))
    assert(r.isValid)
    assert(r.archivableSteps == Set(oldV))
    assert(r.unusedSteps == Set(dangling)) // grapher suppressed via externallyUsed
    assert(r.warnings.exists(_.contains("can safely be archived")))
    assert(r.warnings.exists(_.contains("not yet used")))
    // requireValid does NOT throw on warnings
    requireValid(active, externallyUsed = Set(grapher))
    // without the external-usage declaration, the terminal step is flagged
    assert(analyze(active).unusedSteps == Set(dangling, grapher))
  }

  test("update states: outdated, minor (stale data dep), major (stale snapshot dep)") {
    val snapOld = snap("energy", "2022-01-01", "coal")
    val snapNew = snap("energy", "2023-01-01", "coal")
    val active = Dag(Map(
      snapOld -> Set.empty[String], snapNew -> Set.empty[String],
      d("e", "2022-06-01", "use") -> Set(snapOld),              // outdated version
      d("e", "2023-06-01", "use") -> Set(snapOld),              // latest but stale SNAPSHOT dep
      d("f", "2023-06-01", "clean") -> Set(snapNew),            // all latest
      d("g", "2023-06-01", "minor") -> Set(d("e", "2022-06-01", "use")))) // stale DATA dep
    val st = analyze(active).updateStates
    assert(st(d("e", "2022-06-01", "use")) == Outdated)
    assert(st(d("e", "2023-06-01", "use")) == MajorUpdate)
    assert(st(d("f", "2023-06-01", "clean")) == UpToDate)
    assert(st(d("g", "2023-06-01", "minor")) == MinorUpdate)
    assert(st(snapOld) == Outdated && st(snapNew) == UpToDate)
  }

  test("versionless dag (engine simple form) still gets missing/archived checks") {
    val active = Dag(Map(
      "data://garden/demo/table" -> Set("data://meadow/demo/raw"),
      "data://meadow/demo/raw" -> Set.empty[String]))
    val r = requireValid(active)
    assert(r.updateStates.values.forall(_ == UpToDate))
    val broken = Dag(Map("data://garden/demo/table" -> Set("data://meadow/demo/gone")))
    assert(!analyze(broken).isValid)
  }
}
