package graft

import org.apache.spark.sql.functions._
import graft.ops.GraphOps

/** Connected components (large-star/small-star) vs a brute-force
  * transitive-closure reference on adversarial shapes: chains (diameter
  * stress), stars, cliques, merged components, random graphs.
  */
class GraphOpsSpec extends SparkSpec {
  import spark.implicits._

  /** Driver-side union-find reference. */
  private def reference(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  private def run(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    val df = pairs.toDF("key_a", "key_b")
    GraphOps.connectedComponents(df).as[(Long, Long)].collect().toMap
  }

  test("connected components: chain, star, clique, merge shapes match union-find") {
    val chain = (1L to 12L).sliding(2).map(s => (s(0), s(1))).toSeq
    assert(run(chain) == reference(chain))

    val star = (2L to 9L).map(v => (1L, v))
    assert(run(star) == reference(star))

    val clique = for (a <- 10L to 14L; b <- (a + 1) to 14L) yield (a, b)
    assert(run(clique) == reference(clique))

    // two chains merged by a single cross edge, plus an isolated pair
    val merged = Seq((1L, 2L), (2L, 3L), (10L, 11L), (11L, 12L), (3L, 12L), (50L, 51L))
    assert(run(merged) == reference(merged))

    // reversed/duplicated/self-loop edges normalize away
    val messy = Seq((5L, 4L), (4L, 5L), (5L, 5L), (4L, 3L))
    assert(run(messy) == reference(messy.filter { case (a, b) => a != b }))
  }

  test("connected components: random graphs match union-find") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 3) {
      val n = 60
      val edges = Seq.fill(70)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      assert(run(edges) == reference(edges), s"trial $trial")
    }
  }

  test("cluster assignments coalesce singletons; representatives survive") {
    val docs = (1L to 10L).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 8L)).toDF("key_a", "key_b")

    val assign = GraphOps.clusterAssignments(docs, "doc_id", pairs)
      .as[(Long, Long)].collect().toMap
    assert(assign == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 5L,
      6L -> 6L, 7L -> 7L, 8L -> 7L, 9L -> 9L, 10L -> 10L))

    val kept = GraphOps.keepClusterRepresentatives(docs, "doc_id", pairs)
      .as[Long].collect().sorted
    assert(kept.toSeq == Seq(1L, 4L, 5L, 6L, 7L, 9L, 10L))
  }

  test("leakageSafeSplit: no near-dup cluster ever straddles a split") {
    val docs = (1L to 200L).toDF("doc_id")
    // 40 clusters of 3 + chains + singletons
    val pairs = ((0 until 40).flatMap { c =>
      val base = c * 5L + 1
      Seq((base, base + 1), (base + 1, base + 2))
    }).toDF("key_a", "key_b")
    val out = graft.ops.GraphOps.leakageSafeSplit(docs, "doc_id", pairs,
      Seq(("train", 80), ("val", 10), ("test", 10)))
      .select("cluster_id", "split").as[(Long, String)].collect()
    val byCluster = out.groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    assert(byCluster.values.forall(_.size == 1), "a cluster straddled splits")
    // all three labels appear across the 200 docs
    assert(out.map(_._2).toSet == Set("train", "val", "test"))
  }

  test("leakageSafeSplitFromClusters == pair-graph split; missing keys fall back to singleton") {
    val docs = (1L to 200L).toDF("doc_id")
    val pairs = ((0 until 40).flatMap { c =>
      val base = c * 5L + 1
      Seq((base, base + 1), (base + 1, base + 2))
    }).toDF("key_a", "key_b")
    val splits = Seq(("train", 80), ("val", 10), ("test", 10))
    val viaPairs = GraphOps.leakageSafeSplit(docs, "doc_id", pairs, splits)
      .select("doc_id", "cluster_id", "split").as[(Long, Long, String)].collect().sorted.toSeq
    // a maintained map (different key-column name: positional match)
    val cm = GraphOps.clusterAssignments(docs, "doc_id", pairs)
      .withColumnRenamed("doc_id", "key")
    val viaMap = GraphOps.leakageSafeSplitFromClusters(docs, "doc_id", cm, splits)
      .select("doc_id", "cluster_id", "split").as[(Long, Long, String)].collect().sorted.toSeq
    assert(viaMap == viaPairs)
    // docs absent from the map become singleton clusters (their own id)
    val partial = cm.filter(col("key") <= 100L)
    val viaPartial = GraphOps.leakageSafeSplitFromClusters(docs, "doc_id", partial, splits)
      .select("doc_id", "cluster_id").as[(Long, Long)].collect().toMap
    assert((101L to 200L).forall(k => viaPartial(k) == k))
  }

  test("empty pair set: no components, assignments all singleton") {
    val docs = (1L to 3L).toDF("doc_id")
    val empty = Seq.empty[(Long, Long)].toDF("key_a", "key_b")
    assert(GraphOps.connectedComponents(empty).count() == 0)
    val assign = GraphOps.clusterAssignments(docs, "doc_id", empty)
      .as[(Long, Long)].collect().toMap
    assert(assign == Map(1L -> 1L, 2L -> 2L, 3L -> 3L))
  }
}
