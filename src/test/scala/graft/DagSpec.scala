package graft

import scala.collection.mutable
import org.scalatest.funsuite.AnyFunSuite
import graft.dag.{Dag, IncrementalRunner}

/** DAG + Merkle incrementality semantics — mirrors owid-etl's engine unit
  * tests (tests/test_steps.py:57-131: topological order, dirty
  * propagation, code-change dirties downstream cone).
  */
class DagSpec extends AnyFunSuite {

  private val dag = Dag(Map(
    "garden/a" -> Set("meadow/a"),
    "meadow/a" -> Set("snapshot/a"),
    "garden/b" -> Set("meadow/a", "snapshot/b"),
    "grapher/a" -> Set("garden/a")
  ))

  test("topoSort is dependency-first and deterministic") {
    val order = dag.topoSort
    def idx(s: String) = order.indexOf(s)
    assert(idx("snapshot/a") < idx("meadow/a"))
    assert(idx("meadow/a") < idx("garden/a"))
    assert(idx("garden/a") < idx("grapher/a"))
    assert(order == dag.topoSort)
  }

  test("cycle detection") {
    intercept[IllegalArgumentException](Dag(Map("a" -> Set("b"), "b" -> Set("a"))).topoSort)
  }

  test("filterToSubgraph keeps upstream; downstream flag adds dependents") {
    val up = dag.filterToSubgraph("garden/a")
    assert(up.nodes == Set("garden/a", "meadow/a", "snapshot/a"))
    val down = dag.filterToSubgraph("meadow/a", downstream = true)
    assert(down.nodes.contains("grapher/a") && down.nodes.contains("garden/b"))
  }

  test("merkle dirtiness: code change dirties exactly the downstream cone") {
    val code = mutable.Map[String, String]().withDefaultValue("v1")
    val store = mutable.Map.empty[String, String]
    val runner = new IncrementalRunner(dag, code(_), store)
    val ran1 = runner.run(_ => ())
    assert(ran1.toSet == dag.nodes) // first run: everything dirty
    assert(runner.selectDirty().isEmpty) // converged
    code("meadow/a") = "v2" // upstream change
    val dirty = runner.selectDirty().toSet
    assert(dirty == Set("meadow/a", "garden/a", "garden/b", "grapher/a"))
    assert(!dirty.contains("snapshot/a") && !dirty.contains("snapshot/b"))
    val ran2 = runner.run(_ => ())
    assert(ran2.toSet == dirty)
    assert(runner.selectDirty().isEmpty)
  }

  test("YAML DAG loading: recursive include resolution, loud duplicates, grapher auto-twins, dependency-first compile order") {
    val dir = java.nio.file.Files.createTempDirectory("dagyaml")
    def write(rel: String, content: String): Unit = {
      val p = dir.resolve(rel)
      java.nio.file.Files.createDirectories(p.getParent)
      java.nio.file.Files.write(p, content.getBytes("UTF-8"))
    }
    try {
      write("main.yml",
        """steps:
          |  data://garden/demo/table:
          |    - data://meadow/demo/raw
          |    - snapshot://demo/raw.csv
          |  data://meadow/demo/raw:
          |    - snapshot://demo/raw.csv
          |include:
          |  - sub/extra.yml
          |""".stripMargin)
      write("sub/extra.yml",
        """steps:
          |  data://grapher/demo/chart_input:
          |    - data://garden/demo/table
          |include:
          |  - sub/leaf.yml
          |""".stripMargin)
      write("sub/leaf.yml",
        """steps:
          |  data://garden/demo/other:
          |""".stripMargin)
      val dag = Dag.fromYaml(dir.resolve("main.yml").toString)
      assert(dag.deps.keySet == Set(
        "data://garden/demo/table", "data://meadow/demo/raw",
        "data://grapher/demo/chart_input", "data://garden/demo/other"))
      assert(dag.deps("data://grapher/demo/chart_input") == Set("data://garden/demo/table"))
      assert(dag.deps("data://garden/demo/other").isEmpty)
      // compile order: every step after all its dependencies (the
      // reference's to_dependency_order contract)
      val order = dag.topoSort
      for ((step, ds) <- dag.deps; d <- ds)
        assert(order.indexOf(d) < order.indexOf(step), s"$d must precede $step")
      // auto-twin rule: data://grapher/... gains a grapher:// step whose
      // only dependency is the data step; scheme-only rewrite
      val twinned = dag.withGrapherTwins()
      assert(twinned.deps("grapher://grapher/demo/chart_input") ==
        Set("data://grapher/demo/chart_input"))
      assert(!twinned.deps.contains("grapher://garden/demo/table"))
      // a duplicate step across files is LOUD, naming the file
      write("dup.yml",
        """steps:
          |  data://meadow/demo/raw:
          |include:
          |  - main.yml
          |""".stripMargin)
      val e = intercept[IllegalArgumentException](
        Dag.fromYaml(dir.resolve("dup.yml").toString))
      assert(e.getMessage.contains("duplicate steps") &&
        e.getMessage.contains("data://meadow/demo/raw"), e.getMessage)
      // a missing include is loud too
      write("badinc.yml", "include:\n  - nope/missing.yml\n")
      assert(intercept[IllegalArgumentException](
        Dag.fromYaml(dir.resolve("badinc.yml").toString))
        .getMessage.contains("not found"))
      // an include CYCLE between step-less index files is a loud
      // diagnostic, not a StackOverflowError
      write("cyc_a.yml", "include:\n  - cyc_b.yml\n")
      write("cyc_b.yml", "include:\n  - cyc_a.yml\n")
      assert(intercept[IllegalArgumentException](
        Dag.fromYaml(dir.resolve("cyc_a.yml").toString))
        .getMessage.contains("include cycle"))
      // an EXPLICITLY defined grapher:// step keeps its declared extra
      // dependency edges — the auto-twin must not overwrite it
      val explicit = Dag(Map(
        "data://grapher/demo/x" -> Set.empty[String],
        "grapher://grapher/demo/x" ->
          Set("data://grapher/demo/x", "data://garden/extra")))
      assert(explicit.withGrapherTwins().deps("grapher://grapher/demo/x") ==
        Set("data://grapher/demo/x", "data://garden/extra"))
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }

  test("parallel run respects dependency order") {
    val order = java.util.Collections.synchronizedList(new java.util.ArrayList[String]())
    val runner = new IncrementalRunner(dag, _ => "v1", mutable.Map.empty)
    runner.run(n => { order.add(n); Thread.sleep(5) }, workers = 4)
    val seq = order.toArray.map(_.toString).toSeq
    assert(seq.indexOf("meadow/a") > seq.indexOf("snapshot/a"))
    assert(seq.indexOf("grapher/a") > seq.indexOf("garden/a"))
  }
}
