package graft.dag

/** DAG lifecycle validation — the engine's analogue of the reference's
  * `VersionTracker` (`etl/version_tracker.py`, tests
  * `tests/test_version_tracker.py`): given the ACTIVE dag and the ARCHIVE
  * dag, sanity-check the step ecosystem before anything runs.
  *
  * Error classes (reference `check_that_active_dependencies_are_defined` /
  * `check_that_active_dependencies_are_not_archived`,
  * version_tracker.py:985-1005):
  *   1. an active step depends on a step defined NOWHERE — a deleted or
  *      typo'd dependency;
  *   2. an active step depends on a step that only exists in the ARCHIVE
  *      dag — either un-archive the dependency or archive the user.
  *
  * Warning classes (reference `check_that_all_active_steps_are_necessary`,
  * version_tracker.py:1007-1026, DB-less criterion):
  *   3. ARCHIVABLE — an active step that is not the latest version of its
  *      identifier and has no active usages (nothing depends on it, no
  *      declared external usage);
  *   4. UNUSED — the latest version of its identifier, but nothing uses it
  *      yet.
  *
  * Update states per active step mirror the reference's `UpdateState`
  * (version_tracker.py:42-50, 578-613): OUTDATED (a newer active version
  * of the same identifier exists), MAJOR_UPDATE (latest, but a SNAPSHOT
  * dependency has a newer version), MINOR_UPDATE (latest, but a data
  * dependency has a newer version), UP_TO_DATE otherwise.
  *
  * All checks are driver-side graph algebra over the step-URI structure —
  * no Spark jobs; the dag is metadata, never data.
  */
object VersionTracker {

  /** Parsed step URI — the reference's `extract_step_attributes`
    * (`etl/steps/__init__.py:261-337`): `prefix://channel/namespace/
    * version/name` for data steps, `prefix://namespace/version/name` for
    * snapshot/walden ingests, `etag/github` specials. `identifier` is the
    * version-independent identity used for latest-version resolution.
    * A root that doesn't match any known arity parses LENIENTLY as its own
    * identifier with version "latest" (versionless dags still get the
    * missing/archived checks; latest-version logic treats them as latest).
    */
  final case class StepAttributes(step: String, stepType: String, kind: String,
                                  channel: String, namespace: String,
                                  version: String, name: String, identifier: String)

  def parseStep(step: String): StepAttributes = {
    val (prefixFull, root) = step.indexOf("://") match {
      case -1 => ("data", step)
      case i => (step.substring(0, i), step.substring(i + 3))
    }
    val kind = if (prefixFull.contains("private")) "private" else "public"
    val prefix = prefixFull.split("-")(0)
    val parts = root.split("/")
    if (prefix == "etag" || prefix == "github")
      StepAttributes(step, prefix, kind, "etag", "etag", "latest", root, root)
    else if ((prefix == "snapshot" || prefix == "walden") && parts.length == 3)
      StepAttributes(step, prefix, kind, prefix, parts(0), parts(1), parts(2),
        s"$prefix/${parts(0)}/${parts(2)}")
    else if (parts.length == 4)
      StepAttributes(step, prefix, kind, parts(0), parts(1), parts(2), parts(3),
        s"${parts(0)}/${parts(1)}/${parts(3)}")
    else // lenient: no version structure — own identifier, always "latest"
      StepAttributes(step, prefix, kind,
        parts.headOption.getOrElse(root), "", "latest", root, root)
  }

  sealed trait UpdateState
  case object UpToDate extends UpdateState
  case object Outdated extends UpdateState
  case object MinorUpdate extends UpdateState
  case object MajorUpdate extends UpdateState

  /** @param missingDependencies missing step → the active steps using it
    * @param archivedDependencies archived step → the active steps using it
    * @param archivableSteps active, not latest version, no usages
    * @param unusedSteps active, latest version, no usages
    * @param updateStates per active step (reference UpdateState analogue)
    */
  final case class Report(missingDependencies: Map[String, Set[String]],
                          archivedDependencies: Map[String, Set[String]],
                          archivableSteps: Set[String],
                          unusedSteps: Set[String],
                          updateStates: Map[String, UpdateState]) {
    def errors: Seq[String] = {
      def fmt(kind: String, m: Map[String, Set[String]], solution: String) =
        if (m.isEmpty) Nil
        else Seq((s"$kind in the dag:" +:
          m.toSeq.sortBy(_._1).map { case (miss, users) =>
            s"* Missing step\n    $miss\n  is a dependency of the following active steps:" +
              users.toSeq.sorted.map(u => s"\n    $u").mkString
          }).mkString("\n") + s"\n\nSolution: $solution")
      fmt("Missing dependencies", missingDependencies,
        "Check if you may have accidentally deleted those missing steps.") ++
      fmt("Archived dependencies", archivedDependencies,
        "Either archive the active steps or un-archive the archive steps.")
    }
    def warnings: Seq[String] =
      (if (archivableSteps.isEmpty) Nil
       else Seq("Some active steps can safely be archived:" +
         archivableSteps.toSeq.sorted.map(s => s"\n    $s").mkString)) ++
      (if (unusedSteps.isEmpty) Nil
       else Seq("Some active steps are not yet used, and could potentially be archived:" +
         unusedSteps.toSeq.sorted.map(s => s"\n    $s").mkString))
    def isValid: Boolean = missingDependencies.isEmpty && archivedDependencies.isEmpty
  }

  /** Analyze the active dag against the archive dag.
    *
    * @param externallyUsed steps consumed outside the dag (the reference's
    *        charts / explorers / external channels) — they are never
    *        flagged archivable/unused even with no in-dag usages
    */
  def analyze(active: Dag, archive: Dag = Dag(Map.empty),
              externallyUsed: Set[String] = Set.empty): Report = {
    val activeSteps = active.deps.keySet
    val archiveSteps = archive.deps.keySet
    val attrs = (activeSteps ++ activeSteps.flatMap(active.deps(_)))
      .map(s => s -> parseStep(s)).toMap

    // error classes: dependencies that resolve nowhere / only in archive
    val danglers = for {
      step <- activeSteps.toSeq
      dep <- active.deps(step) if !activeSteps.contains(dep)
    } yield (dep, step)
    val (archived, missing) = danglers.partition { case (dep, _) => archiveSteps.contains(dep) }
    def group(xs: Seq[(String, String)]) =
      xs.groupBy(_._1).map { case (d, us) => d -> us.map(_._2).toSet }

    // latest version per identifier among ACTIVE steps ("latest" sorts
    // above ISO dates lexically, matching the reference's versions[-1])
    val latest: Map[String, String] = activeSteps.toSeq.map(attrs)
      .groupBy(_.identifier).map { case (id, ss) => id -> ss.map(_.version).max }
    def isLatest(s: String): Boolean = {
      val a = attrs(s); latest(a.identifier) == a.version
    }

    val usages = active.reverse.deps // step → steps that depend on it
    def unusedHere(s: String): Boolean =
      usages.getOrElse(s, Set.empty).isEmpty && !externallyUsed.contains(s)
    val archivable = activeSteps.filter(s => !isLatest(s) && unusedHere(s))
    val unused = activeSteps.filter(s => isLatest(s) && unusedHere(s))

    val states = activeSteps.map { s =>
      val st =
        if (!isLatest(s)) Outdated
        else {
          val deps = active.deps(s).filter(activeSteps.contains).map(attrs)
          val stale = deps.filterNot(d => latest(d.identifier) == d.version)
          if (stale.exists(d => d.stepType == "snapshot" || d.stepType == "walden")) MajorUpdate
          else if (stale.nonEmpty) MinorUpdate
          else UpToDate
        }
      s -> (st: UpdateState)
    }.toMap

    Report(group(missing), group(archived), archivable, unused, states)
  }

  /** Analyze and THROW on the error classes (reference `apply_sanity_checks`
    * with `errors="raise"`), reference-style messages naming every missing
    * step and its users.
    */
  def requireValid(active: Dag, archive: Dag = Dag(Map.empty),
                   externallyUsed: Set[String] = Set.empty): Report = {
    val r = analyze(active, archive, externallyUsed)
    if (!r.isValid) throw new IllegalArgumentException(r.errors.mkString("\n\n"))
    r
  }
}
