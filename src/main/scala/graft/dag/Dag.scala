package graft.dag

import java.nio.charset.StandardCharsets
import java.security.MessageDigest
import scala.collection.mutable

/** The reference's compute-graph layer, Spark-side: a DAG of named steps
  * with Merkle-checksum incrementality and parallel execution of
  * topologically-ready steps.
  *
  * Reference: owid-etl `compile_steps`/`filter_to_subgraph`/`traverse`/
  * `reverse_graph` (`etl/steps/__init__.py:55-213`), `DataStep.is_dirty` +
  * `checksum_input` Merkle pruning (`etl/steps/__init__.py:478-535`),
  * parallel topological pump (`etl/command.py:422-494`).
  *
  * In this engine the heavy lifting inside a step is a Spark job (e.g. a
  * LakeTable build); the DAG itself is driver-side Scala. Checksums follow
  * the reference's rule: a step's input checksum = hash of (its own code/
  * config version + the OUTPUT checksums of its dependencies), so a change
  * anywhere upstream dirties exactly the downstream cone.
  */
final case class Dag(deps: Map[String, Set[String]]) {

  /** All nodes (steps + bare dependencies). */
  lazy val nodes: Set[String] = deps.keySet ++ deps.values.flatten

  /** Dependency-first topological order; deterministic (lexicographic among
    * ready nodes). Cycles raise. (`compile_steps` → TopologicalSorter.)
    */
  def topoSort: Seq[String] = {
    val indeg = mutable.Map.empty[String, Int].withDefaultValue(0)
    val out = mutable.Map.empty[String, mutable.Set[String]]
    nodes.foreach(n => indeg.getOrElseUpdate(n, 0))
    for ((n, ds) <- deps; d <- ds) {
      out.getOrElseUpdate(d, mutable.Set.empty) += n
      indeg(n) += 1
    }
    val ready = mutable.PriorityQueue.empty[String](Ordering[String].reverse)
    indeg.foreach { case (n, d) => if (d == 0) ready.enqueue(n) }
    val order = mutable.ArrayBuffer.empty[String]
    while (ready.nonEmpty) {
      val n = ready.dequeue()
      order += n
      out.getOrElse(n, mutable.Set.empty).toSeq.sorted.foreach { m =>
        indeg(m) -= 1
        if (indeg(m) == 0) ready.enqueue(m)
      }
    }
    require(order.size == nodes.size, "cycle detected in DAG")
    order.toSeq
  }

  /** Reverse the edge direction (`reverse_graph`, steps/__init__.py:131). */
  def reverse: Dag = {
    val rev = mutable.Map.empty[String, mutable.Set[String]]
    nodes.foreach(n => rev.getOrElseUpdate(n, mutable.Set.empty))
    for ((n, ds) <- deps; d <- ds) rev(d) += n
    Dag(rev.view.mapValues(_.toSet).toMap)
  }

  /** BFS over dependencies from `starts` (`traverse`, steps/__init__.py:103). */
  def traverse(starts: Set[String]): Set[String] = {
    val seen = mutable.Set.empty[String]
    val queue = mutable.Queue(starts.toSeq.sorted: _*)
    while (queue.nonEmpty) {
      val n = queue.dequeue()
      if (seen.add(n)) deps.getOrElse(n, Set.empty).toSeq.sorted.foreach(queue.enqueue)
    }
    seen.toSet
  }

  /** Subgraph containing `selected`, all their upstream deps, and (if
    * `downstream`) everything that depends on them
    * (`filter_to_subgraph`, steps/__init__.py:143-191).
    */
  def filterToSubgraph(pattern: String, downstream: Boolean = false): Dag = {
    val re = pattern.r
    val selected = nodes.filter(n => re.findFirstIn(n).isDefined)
    val withDown = if (downstream) selected ++ reverse.traverse(selected) else selected
    val keep = traverse(withDown)
    Dag(keep.map(n => n -> (deps.getOrElse(n, Set.empty) & keep)).toMap)
  }

  /** Auto-generate a `grapher://` twin for every `data://grapher/...`
    * step, each depending on its data step — the reference's dynamic
    * grapher-step rule (`etl/command.py:618-625` `_grapher_steps`;
    * `private` extends the match to `data-private://grapher/`).
    */
  def withGrapherTwins(includePrivate: Boolean = false): Dag = {
    val matchRe = if (includePrivate) "^(data|data-private)://grapher/".r
                  else "^data://grapher/".r
    val schemeRe = "^(data|data-private)://".r // only the scheme is rewritten
    val twins = deps.keys.collect {
      case s if matchRe.findPrefixOf(s).isDefined =>
        schemeRe.replaceFirstIn(s, "grapher://") -> Set(s)
    }.toMap
    // an EXPLICITLY defined grapher:// step keeps its declared dependency
    // edges — overwriting it with the auto-twin would silently drop them
    // (the exact edge-loss fromYaml's loud duplicate check guards against)
    Dag(deps ++ twins.view.filterKeys(k => !deps.contains(k)).toMap)
  }
}

object Dag {

  /** Load a DAG from YAML with recursive `include:` resolution — the
    * reference's dag format (`etl/steps/__init__.py:152-191` `load_dag`/
    * `_load_dag`/`_parse_dag_yaml`, `dag/main.yml`):
    *
    * {{{
    *   steps:
    *     data://garden/demo/table:
    *       - data://meadow/demo/raw
    *     data://meadow/demo/raw:
    *   include:
    *     - dag/extra.yml
    * }}}
    *
    * Include paths resolve against `baseDir` (the reference resolves
    * against its repo root); a step defined in two files is a LOUD
    * duplicate, naming the file — silently letting the later definition
    * win would drop dependency edges.
    */
  def fromYaml(file: String, baseDir: Option[String] = None): Dag = {
    val base = baseDir.getOrElse(
      Option(java.nio.file.Paths.get(file).toAbsolutePath.getParent)
        .map(_.toString).getOrElse("."))
    Dag(loadYamlDag(java.nio.file.Paths.get(file), java.nio.file.Paths.get(base),
      Map.empty, List.empty))
  }

  private def loadYamlDag(file: java.nio.file.Path, base: java.nio.file.Path,
                          prev: Map[String, Set[String]],
                          stack: List[java.nio.file.Path]): Map[String, Set[String]] = {
    import scala.jdk.CollectionConverters._
    require(java.nio.file.Files.exists(file), s"DAG file not found: $file")
    // cycle guard on the ACTIVE include chain: two step-less index files
    // including each other would otherwise recurse to StackOverflowError
    // with no diagnostic (a diamond re-include NOT on the chain still
    // falls through to the loud duplicate-step check)
    val canon = file.toAbsolutePath.normalize
    require(!stack.contains(canon),
      s"include cycle detected: ${(canon :: stack).reverse.mkString(" -> ")}")
    val yaml = new org.yaml.snakeyaml.Yaml(new org.yaml.snakeyaml.constructor.SafeConstructor(
      new org.yaml.snakeyaml.LoaderOptions()))
    val doc = Option(yaml.load[java.util.Map[String, Object]](
      java.nio.file.Files.newBufferedReader(file)))
      .getOrElse(java.util.Collections.emptyMap[String, Object]())
    val steps: Map[String, Set[String]] = Option(doc.get("steps")) match {
      case Some(m: java.util.Map[_, _]) => m.asScala.map { case (k, v) =>
        val ds: Set[String] = v match {
          case null => Set.empty
          case l: java.util.List[_] => l.asScala.map(_.toString).toSet
          case other => throw new IllegalArgumentException(
            s"DAG $file: step '$k' has non-list dependencies: $other")
        }
        k.toString -> ds
      }.toMap
      case None => Map.empty
      case Some(other) => throw new IllegalArgumentException(
        s"DAG $file: 'steps' must be a mapping, got: $other")
    }
    val dup = prev.keySet & steps.keySet
    require(dup.isEmpty,
      s"duplicate steps detected in DAG $file: ${dup.toSeq.sorted.mkString(", ")}")
    var acc = steps ++ prev
    Option(doc.get("include")).foreach {
      case l: java.util.List[_] =>
        l.asScala.foreach(inc =>
          acc = loadYamlDag(base.resolve(inc.toString), base, acc, canon :: stack))
      case other => throw new IllegalArgumentException(
        s"DAG $file: 'include' must be a list of file paths, got: $other")
    }
    acc
  }
}

/** Incremental runner with Merkle checksums. `codeVersion(step)` plays the
  * role of the reference's step-file md5; `store` persists output
  * checksums between runs (the dataset's recorded `source_checksum`).
  */
final class IncrementalRunner(
    dag: Dag,
    codeVersion: String => String,
    store: mutable.Map[String, String] // step -> committed input-checksum
) {

  private def md5(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes(StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString

  /** Merkle input checksum: own code version + dependency checksums
    * (`checksum_input`, steps/__init__.py:513-535). Memoized per run.
    */
  def checksumInput(step: String, memo: mutable.Map[String, String] = mutable.Map.empty): String =
    memo.getOrElseUpdate(step, {
      val depSums = dag.deps.getOrElse(step, Set.empty).toSeq.sorted
        .map(d => checksumInput(d, memo))
      md5((codeVersion(step) +: depSums).mkString("\n"))
    })

  /** A step is dirty iff it has no recorded checksum or the recorded one
    * differs from the recomputed Merkle input (`is_dirty`,
    * steps/__init__.py:478-494).
    */
  def isDirty(step: String, memo: mutable.Map[String, String] = mutable.Map.empty): Boolean =
    !store.get(step).contains(checksumInput(step, memo))

  def selectDirty(): Seq[String] = {
    val memo = mutable.Map.empty[String, String]
    dag.topoSort.filter(isDirty(_, memo))
  }

  /** Run all dirty steps in dependency order, parallelizing steps whose
    * dependencies are complete (`exec_graph_parallel`,
    * etl/command.py:422-494) — steps run as concurrent driver threads, so
    * their inner Spark jobs interleave on the shared scheduler.
    * Returns the steps that executed.
    */
  def run(exec: String => Unit, workers: Int = 4): Seq[String] = {
    val memo = mutable.Map.empty[String, String]
    val dirty = dag.topoSort.filter(isDirty(_, memo)).toSet
    if (dirty.isEmpty) return Nil
    val remainingDeps = mutable.Map(dirty.toSeq.map(n =>
      n -> (dag.deps.getOrElse(n, Set.empty) & dirty)): _*)
    val done = mutable.Set.empty[String]
    val ran = mutable.ArrayBuffer.empty[String]
    val pool = java.util.concurrent.Executors.newFixedThreadPool(workers)
    val lock = new Object
    try {
      while (lock.synchronized(done.size < dirty.size)) {
        val ready = lock.synchronized {
          val r = remainingDeps.collect { case (n, ds) if ds.isEmpty => n }.toSeq.sorted
          r.foreach(remainingDeps.remove)
          r
        }
        if (ready.isEmpty) Thread.sleep(5)
        else {
          val futures = ready.map { n =>
            pool.submit(new Runnable {
              def run(): Unit = {
                exec(n)
                lock.synchronized {
                  // commit point AFTER successful execution — checksum-written-last
                  store(n) = checksumInput(n, memo)
                  done += n
                  ran += n
                  remainingDeps.keys.foreach(k =>
                    remainingDeps(k) = remainingDeps(k) - n)
                }
              }
            })
          }
          futures.foreach(_.get())
        }
      }
      ran.toSeq
    } finally pool.shutdown()
  }
}
