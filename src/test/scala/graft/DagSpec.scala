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

  test("parallel run respects dependency order") {
    val order = java.util.Collections.synchronizedList(new java.util.ArrayList[String]())
    val runner = new IncrementalRunner(dag, _ => "v1", mutable.Map.empty)
    runner.run(n => { order.add(n); Thread.sleep(5) }, workers = 4)
    val seq = order.toArray.map(_.toString).toSeq
    assert(seq.indexOf("meadow/a") > seq.indexOf("snapshot/a"))
    assert(seq.indexOf("grapher/a") > seq.indexOf("garden/a"))
  }
}
